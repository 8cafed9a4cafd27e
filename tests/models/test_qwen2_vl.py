"""Qwen2-VL: vision tower + M-RoPE parity and greedy E2E vs HF
Qwen2VLForConditionalGeneration (reference
vllm/model_executor/models/qwen2_vl.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG, VID, VS = 100, 101, 102
VISION_CFG = dict(depth=2, embed_dim=32, hidden_size=48, num_heads=4,
                  in_chans=3, patch_size=4, spatial_merge_size=2,
                  temporal_patch_size=2, mlp_ratio=2)
TEXT_KW = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=128,
               rope_theta=10000.0, rms_norm_eps=1e-6,
               tie_word_embeddings=False)
MROPE = {"type": "mrope", "mrope_section": [2, 2, 2]}

CFG = {"architectures": ["Qwen2VLForConditionalGeneration"],
       "vision_config": VISION_CFG, "rope_scaling": MROPE,
       "image_token_id": IMG, "video_token_id": VID,
       "vision_start_token_id": VS, "eos_token_id": None, **TEXT_KW}

GRID = (1, 4, 4)            # 16 patches -> 4 merged tokens
N_TOKENS = 4
PATCH_IN = 3 * 2 * 4 * 4    # 96


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(61)
    cfg = transformers.Qwen2VLConfig(
        vision_config=VISION_CFG, rope_scaling=dict(MROPE),
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VS, **TEXT_KW)
    return transformers.Qwen2VLForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _patches(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((16, PATCH_IN)).astype(np.float32)


def test_vision_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    px = _patches(0)
    ours = model.assemble_image_features(
        params, px, {"image_grid_thw": GRID})
    with torch.no_grad():
        theirs = hf_model.model.visual(
            torch.from_numpy(px),
            grid_thw=torch.tensor([GRID])).numpy()
    assert ours.shape == (N_TOKENS, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_mrope_positions_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    ids = [1, VS] + [IMG] * N_TOKENS + [5, 9, 17]
    pos3, delta = model.compute_mrope(ids, [GRID])
    with torch.no_grad():
        want, want_delta = hf_model.model.get_rope_index(
            torch.tensor([ids]), image_grid_thw=torch.tensor([GRID]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long))
    np.testing.assert_array_equal(pos3, want[:, 0, :].numpy())
    assert delta == int(want_delta[0])


def test_qwen2_vl_greedy_matches_hf(hf_model):
    px = _patches(1)
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, VS, IMG, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": px,
                                          "image_grid_thw": GRID})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [1, VS] + [IMG] * N_TOKENS + [5, 9, 17]
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(px),
            image_grid_thw=torch.tensor([GRID]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs


def test_qwen2_vl_text_only_matches_hf(hf_model):
    """No image: M-RoPE degenerates to standard rope end to end."""
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, 5, 9, 17, 23, 42]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8))
    ours = list(outs[0].outputs[0].token_ids)
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones(1, len(prompt), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    assert ours == out[0].tolist()[-8:]
