"""Chameleon: VQ-VAE image tokenization parity + per-head q/k LayerNorm
trunk parity + greedy E2E vs HF ChameleonForConditionalGeneration
(reference vllm/model_executor/models/chameleon.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

RES = 16
VQ_CFG = dict(embed_dim=8, num_embeddings=16, latent_channels=8,
              base_channels=32, channel_multiplier=[1, 2],
              num_res_blocks=1, attn_resolutions=[8], resolution=RES,
              in_channels=3, double_latent=False)
# IMGIMG names: digits mapped to letters (0->A ...), trailing Z.
VOCAB_MAP = {"<image>": 120}
for code in range(16):
    name = "IMGIMG" + "".join(chr(ord("A") + int(d)) for d in str(code)) \
        + "Z"
    VOCAB_MAP[name] = 60 + code

CFG = {"architectures": ["ChameleonForConditionalGeneration"],
       "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 256,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": False, "vq_config": VQ_CFG,
       "vocabulary_map": VOCAB_MAP, "eos_token_id": None}

# latent grid: 16 -> one downsample -> 8x8 = 64 image tokens
N_IMG_TOKENS = 64


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(91)
    cfg = transformers.ChameleonConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, vq_config=VQ_CFG,
        vocabulary_map=VOCAB_MAP)
    return transformers.ChameleonForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_vq_image_tokens_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, RES, RES)).astype(np.float32)
    ours = model.encode_image_tokens(params, pix)
    with torch.no_grad():
        theirs = hf_model.model.get_image_tokens(
            torch.from_numpy(pix)[None])[0].tolist()
    assert len(ours) == N_IMG_TOKENS
    assert ours == theirs


def test_text_logits_match_hf(hf_model):
    """Per-head q/k LayerNorm trunk parity on a text-only prompt."""
    from vllm_paged_compression_tpu.models.registry import build_model
    from vllm_paged_compression_tpu.ops.attention import prefill_attention
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    ids = [1, 5, 9, 33, 77, 2, 4, 100]
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).logits[0].float().numpy()
    scale = model.arch.attn_scale
    h, _ = model.forward_hidden(
        params, jnp.asarray(ids), jnp.arange(len(ids)),
        lambda q, k, v, s: (prefill_attention(q, k, v, scale,
                                              len(ids)), s))
    ours = np.asarray(model.logits(params, h))
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_chameleon_greedy_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, RES, RES)).astype(np.float32)

    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, 5, 120, 9, 17]     # <image> placeholder id 120
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    with torch.no_grad():
        img_ids = hf_model.model.get_image_tokens(
            torch.from_numpy(pix)[None])[0].tolist()
        ids = [1, 5] + img_ids + [9, 17]
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
