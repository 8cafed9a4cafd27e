"""Mllama (Llama-3.2 Vision): vision-feature parity and greedy E2E
token parity vs HF MllamaForConditionalGeneration (reference
vllm/model_executor/models/mllama.py), text-only included."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

V = 120
IMG = 124                 # lives in the 8 extra embedding rows
S, PS, NT = 16, 8, 2
P1 = (S // PS) ** 2 + 1   # 5 -> padded to 8 inside the encoder
VIS = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=4,
           num_global_layers=2, attention_heads=4, image_size=S,
           patch_size=PS, max_num_tiles=NT,
           intermediate_layers_indices=[1, 3],
           vision_output_dim=32 * 3, norm_eps=1e-5,
           supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]])
TEXT = dict(vocab_size=V, hidden_size=48, intermediate_size=96,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0,
            rope_scaling={"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 64},
            rms_norm_eps=1e-5, max_position_embeddings=256,
            cross_attention_layers=[1, 3], tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=2, pad_token_id=0)
CFG = {"architectures": ["MllamaForConditionalGeneration"],
       "model_type": "mllama", "vision_config": VIS, "text_config": TEXT,
       "image_token_index": IMG, "eos_token_id": None}
ASPECT_ID = 2             # [1, 2] -> 2 tiles


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(140)
    cfg = transformers.MllamaConfig(
        vision_config=VIS, text_config=TEXT, image_token_index=IMG)
    cfg.vision_config._attn_implementation = "eager"
    cfg.text_config._attn_implementation = "eager"
    return transformers.MllamaForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _tiles(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((NT, 3, S, S)).astype(np.float32)


def test_vision_cross_states_match_hf(hf_model):
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    tiles = _tiles(0)
    ours = np.asarray(model.encode_vision(params, jnp.asarray(tiles),
                                          ASPECT_ID))
    with torch.no_grad():
        px = torch.from_numpy(tiles)[None, None]     # [1, 1, T, 3, S, S]
        aid = torch.tensor([[ASPECT_ID]])
        amask = torch.ones(1, 1, NT, dtype=torch.long)
        vm = hf_model.model.vision_model if hasattr(
            hf_model, "model") and hasattr(hf_model.model,
                                           "vision_model") \
            else hf_model.vision_model
        out = vm(pixel_values=px, aspect_ratio_ids=aid,
                 aspect_ratio_mask=amask).last_hidden_state
        proj = (hf_model.model.multi_modal_projector
                if hasattr(hf_model, "model")
                and hasattr(hf_model.model, "multi_modal_projector")
                else hf_model.multi_modal_projector)
        want = proj(out).reshape(-1, TEXT["hidden_size"]).numpy()
    assert ours.shape == want.shape == (NT * P1, TEXT["hidden_size"])
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def _hf_generate(hf_model, ids, tiles, n):
    kw = {}
    if tiles is not None:
        L = len(ids)
        kw = dict(
            pixel_values=torch.from_numpy(tiles)[None, None],
            aspect_ratio_ids=torch.tensor([[ASPECT_ID]]),
            aspect_ratio_mask=torch.ones(1, 1, NT, dtype=torch.long),
            cross_attention_mask=torch.ones(1, L, 1, NT,
                                            dtype=torch.long))
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None, **kw)
    return out[0].tolist()[len(ids):]


def test_mllama_text_only_greedy_matches_hf(hf_model):
    llm = LLM(hf_config=CFG, dtype="float32", max_model_len=128,
              num_device_blocks=8, seed=0, max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _sd(hf_model))
    ids = [1, 5, 9, 33, 77, 2, 4, 100]
    n = 8
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=n,
                            ignore_eos=True))
    assert list(outs[0].outputs[0].token_ids) == \
        _hf_generate(hf_model, ids, None, n)


def test_mllama_image_greedy_matches_hf(hf_model):
    llm = LLM(hf_config=CFG, dtype="float32", max_model_len=128,
              num_device_blocks=8, seed=0, max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _sd(hf_model))
    tiles = _tiles(1)
    ids = [IMG, 5, 9, 33, 77]          # image token leads the prompt
    n = 8
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=n,
                            ignore_eos=True),
                        multi_modal_data={"image": tiles,
                                          "aspect_ratio_id": ASPECT_ID})
    assert list(outs[0].outputs[0].token_ids) == \
        _hf_generate(hf_model, ids, tiles, n)


def test_mllama_batched_image_and_text(hf_model):
    llm = LLM(hf_config=CFG, dtype="float32", max_model_len=128,
              num_device_blocks=8, seed=0, max_num_seqs=4,
              num_scheduler_steps=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _sd(hf_model))
    tiles = _tiles(2)
    img_ids = [IMG, 7, 11, 13]
    txt_ids = [3, 6, 10, 15, 21]
    outs = llm.generate(
        prompt_token_ids=[img_ids, txt_ids],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
        multi_modal_data=[{"image": tiles,
                           "aspect_ratio_id": ASPECT_ID}, None])
    assert list(outs[0].outputs[0].token_ids) == \
        _hf_generate(hf_model, img_ids, tiles, 6)
    assert list(outs[1].outputs[0].token_ids) == \
        _hf_generate(hf_model, txt_ids, None, 6)
