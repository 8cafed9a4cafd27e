"""Qwen2-Audio: encoder feature parity vs HF and greedy E2E vs HF
Qwen2AudioForConditionalGeneration (reference
vllm/model_executor/models/qwen2_audio.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

AUDIO_TOKEN = 100
MEL, MSP = 8, 20          # mel bins, max_source_positions
AUDIO_CFG = dict(d_model=32, encoder_layers=2, encoder_attention_heads=4,
                 encoder_ffn_dim=64, num_mel_bins=MEL,
                 max_source_positions=MSP)
TEXT_CFG = dict(model_type="qwen2", vocab_size=128, hidden_size=48,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, rms_norm_eps=1e-6,
                tie_word_embeddings=False)

CFG = {"architectures": ["Qwen2AudioForConditionalGeneration"],
       "audio_config": AUDIO_CFG, "text_config": TEXT_CFG,
       "audio_token_index": AUDIO_TOKEN, "eos_token_id": None}

N_TOKENS = MSP // 2        # 10


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(41)
    cfg = transformers.Qwen2AudioConfig(
        audio_config=AUDIO_CFG, text_config=TEXT_CFG,
        audio_token_index=AUDIO_TOKEN)
    return transformers.Qwen2AudioForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _mel(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((MEL, 2 * MSP)).astype(np.float32)


def test_audio_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    mel = _mel(0)
    ours = np.asarray(model.encode_image(params, jnp.asarray(mel)))
    with torch.no_grad():
        enc = hf_model.audio_tower(torch.from_numpy(mel)[None]
                                   ).last_hidden_state
        theirs = hf_model.multi_modal_projector(enc)[0].numpy()
    assert ours.shape == (N_TOKENS, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_qwen2_audio_greedy_matches_hf(hf_model):
    mel = _mel(1)
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    text = [2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[[AUDIO_TOKEN] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"audio": mel})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [AUDIO_TOKEN] * N_TOKENS + text
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.from_numpy(mel)[None],
            feature_attention_mask=torch.ones(1, 2 * MSP,
                                              dtype=torch.long),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
