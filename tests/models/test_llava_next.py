"""Llava-Next anyres: packed-feature parity vs HF pack_image_features and
greedy E2E vs HF LlavaNextForConditionalGeneration.

Reference analog: vllm/model_executor/models/llava_next.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMAGE_TOKEN = 30
S = 24          # crop size
VISION_CFG = {
    "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 3,
    "num_attention_heads": 4, "image_size": S, "patch_size": 8,
    "projection_dim": 32, "num_channels": 3,
}
TEXT_CFG = {
    "vocab_size": 128, "hidden_size": 48, "intermediate_size": 96,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False,
}
GRID = [(S, 2 * S), (2 * S, S), (2 * S, 2 * S)]
CFG = {
    "architectures": ["LlavaNextForConditionalGeneration"],
    "text_config": TEXT_CFG, "vision_config": VISION_CFG,
    "image_token_index": IMAGE_TOKEN, "image_grid_pinpoints": GRID,
    "vision_feature_layer": -2,
    "vision_feature_select_strategy": "default", "eos_token_id": None,
}


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    torch.manual_seed(21)
    cfg = LlavaNextConfig(
        vision_config=CLIPVisionConfig(**VISION_CFG),
        text_config=LlamaConfig(**TEXT_CFG),
        image_token_index=IMAGE_TOKEN,
        image_grid_pinpoints=[list(g) for g in GRID],
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    return LlavaNextForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# Original 20 x 30: best fit (24, 48) -> 1x2 crop grid, 3 crops total
# (base + 2); aspect mismatch (1.5 vs 2.0) triggers horizontal unpadding.
ORIG = (20, 30)
CROPS = 3


def _pix(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((CROPS, 3, S, S)).astype(np.float32)


def test_packed_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    pix = _pix(0)
    ours = model.assemble_image_features(params, pix, ORIG)

    with torch.no_grad():
        # This transformers version packs inside get_image_features
        # (returns the per-image packed list).
        feats = hf_model.model.get_image_features(
            torch.from_numpy(pix)[None],
            image_sizes=torch.tensor([ORIG]),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
    theirs = (feats[0] if isinstance(feats, (list, tuple))
              else feats).float().numpy()
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_llava_next_greedy_matches_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    pix = _pix(1)
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    n = model.assemble_image_features(params, pix, ORIG).shape[0]

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, 5, IMAGE_TOKEN, 17, 23]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix,
                                          "image_size": ORIG})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [1, 5] + [IMAGE_TOKEN] * n + [17, 23]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(pix)[None],
            image_sizes=torch.tensor([ORIG]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0][len(ids):].tolist()
    assert ours == theirs
