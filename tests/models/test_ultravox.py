"""Ultravox: whisper encoder + flipped-SwiGLU stacking projector vs a
hand-built torch reference (no HF Ultravox class; the encoder is checked
against transformers' WhisperEncoder directly).

Reference analog: vllm/model_executor/models/ultravox.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

AUDIO_TOKEN = 100
MEL, MSP, SF = 8, 16, 4
AUDIO_CFG = dict(d_model=32, encoder_layers=2, encoder_attention_heads=4,
                 encoder_ffn_dim=64, num_mel_bins=MEL,
                 max_source_positions=MSP)
TEXT_CFG = dict(model_type="llama", vocab_size=128, hidden_size=48,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, rms_norm_eps=1e-5,
                tie_word_embeddings=False)
HID = 40        # projector hidden (must be even for swiglu)

CFG = {"architectures": ["UltravoxModel"],
       "audio_config": AUDIO_CFG, "text_config": TEXT_CFG,
       "audio_token_index": AUDIO_TOKEN, "stack_factor": SF,
       "projector_act": "swiglu", "hidden_size": HID,
       "eos_token_id": None}

N_TOKENS = MSP // SF    # 4


def _whisper_encoder():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder
    cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_mel_bins=MEL, max_source_positions=MSP)
    torch.manual_seed(111)
    return WhisperEncoder(cfg).eval()


@pytest.fixture(scope="module")
def torch_parts():
    enc = _whisper_encoder()
    torch.manual_seed(112)
    din = 32 * SF
    ln_pre = torch.nn.RMSNorm(din, eps=1e-6)
    lin1 = torch.nn.Linear(din, HID, bias=False)
    lin2 = torch.nn.Linear(HID // 2, 48, bias=False)
    ln_post = torch.nn.RMSNorm(48, eps=1e-6)
    with torch.no_grad():
        ln_pre.weight.add_(torch.randn(din) * 0.1)
        ln_post.weight.add_(torch.randn(48) * 0.1)
    return enc, ln_pre, lin1, lin2, ln_post


def _state_dict(torch_parts):
    enc, ln_pre, lin1, lin2, ln_post = torch_parts
    sd = {f"audio_tower.{k}": v.detach().numpy()
          for k, v in enc.state_dict().items()}
    sd["multi_modal_projector.ln_pre.weight"] = \
        ln_pre.weight.detach().numpy()
    sd["multi_modal_projector.linear_1.weight"] = \
        lin1.weight.detach().numpy()
    sd["multi_modal_projector.linear_2.weight"] = \
        lin2.weight.detach().numpy()
    sd["multi_modal_projector.ln_post.weight"] = \
        ln_post.weight.detach().numpy()
    # Language tower: random HF llama.
    hf_cfg = transformers.LlamaConfig(**{k: v for k, v in TEXT_CFG.items()
                                         if k != "model_type"})
    torch.manual_seed(113)
    lm = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd.update({f"language_model.{k}": v.detach().numpy()
               for k, v in lm.state_dict().items()})
    return sd


def test_ultravox_features_match_torch(torch_parts):
    enc, ln_pre, lin1, lin2, ln_post = torch_parts
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_state_dict(torch_parts))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((MEL, 2 * MSP)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(mel)))

    with torch.no_grad():
        h = enc(torch.from_numpy(mel)[None]).last_hidden_state[0]
        h = h.reshape(MSP // SF, SF * 32)
        h = ln_pre(h)
        h = lin1(h)
        half = HID // 2
        h = h[:, :half] * torch.nn.functional.silu(h[:, half:])
        h = ln_post(lin2(h))
    assert ours.shape == (N_TOKENS, 48)
    np.testing.assert_allclose(ours, h.numpy(), rtol=3e-4, atol=3e-4)


def test_ultravox_e2e_generation(torch_parts):
    model = build_model(CFG, dtype=jnp.float32)
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              params=model.load_hf_state_dict(_state_dict(torch_parts)))
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((MEL, 2 * MSP)).astype(np.float32)
    outs = llm.generate(prompt_token_ids=[[AUDIO_TOKEN, 2, 5, 9]],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"audio": mel})
    assert len(outs[0].outputs[0].token_ids) == 8
