"""BART encoder-decoder serving: greedy E2E parity vs HF
BartForConditionalGeneration.generate (reference
vllm/model_executor/models/bart.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG_KW = dict(vocab_size=128, d_model=32, encoder_layers=2,
              decoder_layers=2, encoder_attention_heads=4,
              decoder_attention_heads=4, encoder_ffn_dim=64,
              decoder_ffn_dim=64, max_position_embeddings=64,
              pad_token_id=0, bos_token_id=1, eos_token_id=2,
              decoder_start_token_id=2, forced_bos_token_id=None,
              scale_embedding=False, activation_function="gelu")

SRC = [5, 17, 9, 33, 42, 8]


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(131)
    return transformers.BartForConditionalGeneration(
        transformers.BartConfig(**CFG_KW)).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _cfg():
    return {"architectures": ["BartForConditionalGeneration"],
            **CFG_KW, "eos_token_id": None}


def test_prefill_first_token_matches_hf(hf_model):
    model = build_model(_cfg(), dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    pools = model.make_state_pools(4, 32)
    toks = np.zeros(16, np.int32)
    toks[:len(SRC)] = SRC
    last, pools = model.forward_prefill(
        params, jnp.asarray(toks), jnp.int32(len(SRC)), jnp.int32(1),
        pools)
    ours = np.asarray(model.logits(params, last))[0]
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor([SRC]),
            decoder_input_ids=torch.tensor(
                [[CFG_KW["decoder_start_token_id"]]])
        ).logits[0, -1].float().numpy()
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_bart_greedy_matches_hf_generate(hf_model):
    model = build_model(_cfg(), dtype=jnp.float32)
    llm = LLM(hf_config=_cfg(), dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0, max_num_seqs=4,
              params=model.load_hf_state_dict(_sd(hf_model)))
    n = 10
    outs = llm.generate(prompt_token_ids=[SRC],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=n,
                            ignore_eos=True))
    ours = list(outs[0].outputs[0].token_ids)
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([SRC]),
            attention_mask=torch.ones(1, len(SRC), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None)
    # HF output starts with decoder_start_token_id.
    theirs = out[0].tolist()[1:1 + n]
    assert ours == theirs


def test_bart_batched_serving(hf_model):
    model = build_model(_cfg(), dtype=jnp.float32)
    llm = LLM(hf_config=_cfg(), dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0, max_num_seqs=4,
              num_scheduler_steps=4,
              params=model.load_hf_state_dict(_sd(hf_model)))
    prompts = [[5, 17, 9], [33, 42], [8, 7, 6, 5, 4]]
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=6,
                            ignore_eos=True))
    assert all(len(o.outputs[0].token_ids) == 6 for o in outs)
    # Each batched result matches its solo HF generate.
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            want = hf_model.generate(
                input_ids=torch.tensor([p]),
                attention_mask=torch.ones(1, len(p), dtype=torch.long),
                max_new_tokens=6, do_sample=False,
                eos_token_id=None)[0].tolist()[1:7]
        assert list(o.outputs[0].token_ids) == want


def test_florence2_language_model_greedy(hf_model):
    """Florence2 = BART under a language_model. prefix with an untied
    lm_head (reference florence2.py); wrap the HF BART checkpoint into
    that naming and check greedy tokens are unchanged."""
    sd = {"language_model." + k: v for k, v in _sd(hf_model).items()}
    cfg = {"architectures": ["Florence2ForConditionalGeneration"],
           "text_config": dict(CFG_KW), "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0, max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(sd)
    assert "lm_head" in llm.engine.params
    n = 10
    outs = llm.generate(prompt_token_ids=[SRC],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=n,
                            ignore_eos=True))
    ours = list(outs[0].outputs[0].token_ids)
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([SRC]),
            attention_mask=torch.ones(1, len(SRC), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None)
    assert ours == out[0].tolist()[1:1 + n]
