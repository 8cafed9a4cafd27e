"""Llava-Next-Video: pooled video feature parity + greedy E2E vs HF
(reference vllm/model_executor/models/llava_next_video.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMAGE_TOKEN, VIDEO_TOKEN = 30, 31
S = 24
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
CFG = {
    "architectures": ["LlavaNextVideoForConditionalGeneration"],
    "text_config": TEXT_CFG, "vision_config": VISION_CFG,
    "image_token_index": IMAGE_TOKEN, "video_token_index": VIDEO_TOKEN,
    "image_grid_pinpoints": [[S, 2 * S], [2 * S, S]],
    "spatial_pool_mode": "average", "spatial_pool_stride": 3,
    "vision_feature_layer": -2,
    "vision_feature_select_strategy": "default", "eos_token_id": None,
}
# 3x3 patch grid pooled by stride 3 -> 1 token per frame.
TOK_PER_FRAME = 1
FRAMES = 4


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextVideoConfig,
                              LlavaNextVideoForConditionalGeneration)
    torch.manual_seed(71)
    cfg = LlavaNextVideoConfig(
        vision_config=CLIPVisionConfig(**VISION_CFG),
        text_config=LlamaConfig(**TEXT_CFG),
        image_token_index=IMAGE_TOKEN, video_token_index=VIDEO_TOKEN,
        image_grid_pinpoints=[[S, 2 * S], [2 * S, S]],
        spatial_pool_mode="average", spatial_pool_stride=3,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    return LlavaNextVideoForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_video_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((FRAMES, 3, S, S)).astype(np.float32)
    ours = model.assemble_image_features(params, frames, {"video": True})
    with torch.no_grad():
        feats = hf_model.model.get_video_features(
            torch.from_numpy(frames)[None],
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        theirs = feats[0].reshape(-1, 48).numpy()
    assert ours.shape == (FRAMES * TOK_PER_FRAME, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_llava_next_video_greedy_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((FRAMES, 3, S, S)).astype(np.float32)
    n = FRAMES * TOK_PER_FRAME

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
