"""Llava-OneVision: anyres_max packing (incl. bilinear downscale) and
pooled video features vs HF; greedy E2E (reference
vllm/model_executor/models/llava_onevision.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMAGE_TOKEN, VIDEO_TOKEN = 30, 31
S = 24
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=S, patch_size=8)
TEXT_CFG = dict(model_type="qwen2", vocab_size=128, hidden_size=48,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512, rms_norm_eps=1e-6,
                tie_word_embeddings=False)
GRID = [[S, 2 * S], [2 * S, S]]
CFG = {"architectures": ["LlavaOnevisionForConditionalGeneration"],
       "vision_config": VISION_CFG, "text_config": TEXT_CFG,
       "image_token_index": IMAGE_TOKEN, "video_token_index": VIDEO_TOKEN,
       "image_grid_pinpoints": GRID, "vision_aspect_ratio": "anyres_max_1",
       "vision_feature_layer": -1,
       "vision_feature_select_strategy": "full", "eos_token_id": None}

ORIG = (20, 30)
FRAMES = 3


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(81)
    cfg = transformers.LlavaOnevisionConfig(
        vision_config=VISION_CFG, text_config=TEXT_CFG,
        image_token_index=IMAGE_TOKEN, video_token_index=VIDEO_TOKEN,
        image_grid_pinpoints=GRID, vision_aspect_ratio="anyres_max_1",
        vision_feature_layer=-1, vision_feature_select_strategy="full")
    return transformers.LlavaOnevisionForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _model_params(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    return model, model.load_hf_state_dict(_sd(hf_model))


def test_anyres_max_packing_matches_hf(hf_model):
    model, params = _model_params(hf_model)
    rng = np.random.default_rng(0)
    crops = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    ours = model.assemble_image_features(params, crops,
                                         {"image_size": ORIG})
    with torch.no_grad():
        # This transformers version packs inside get_image_features.
        feats = hf_model.model.get_image_features(
            torch.from_numpy(crops)[None],
            image_sizes=torch.tensor([ORIG]),
            vision_feature_layer=-1,
            vision_feature_select_strategy="full")
    theirs = (feats[0] if isinstance(feats, (list, tuple))
              else feats).float().numpy()
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    # Bilinear resize halves differ slightly between jax.image and torch.
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-2)


def test_video_features_match_hf(hf_model):
    model, params = _model_params(hf_model)
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((FRAMES, 3, S, S)).astype(np.float32)
    ours = model.assemble_image_features(params, frames, {"video": True})
    with torch.no_grad():
        vf = hf_model.model.get_video_features(
            torch.from_numpy(frames)[None],
            vision_feature_layer=-1,
            vision_feature_select_strategy="full")[0]
        nl = hf_model.model.image_newline[None]
        theirs = torch.cat([vf.reshape(-1, 48), nl], dim=0).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-2)


def test_onevision_video_greedy_matches_hf(hf_model):
    model, params = _model_params(hf_model)
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((FRAMES, 3, S, S)).astype(np.float32)
    n = model.assemble_image_features(params, frames,
                                      {"video": True}).shape[0]

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, 5, VIDEO_TOKEN, 17, 23]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"video": frames})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [1, 5] + [VIDEO_TOKEN] * n + [17, 23]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.from_numpy(frames)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
