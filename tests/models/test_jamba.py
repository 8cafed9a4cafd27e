"""Jamba (hybrid Mamba/attention/MoE): HF parity + full-engine serving
(reference vllm/model_executor/models/jamba.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
           num_hidden_layers=4, num_attention_heads=4,
           num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
           expert_layer_period=2, expert_layer_offset=1,
           attn_layer_period=4, attn_layer_offset=2,
           mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
           use_mamba_kernels=False, tie_word_embeddings=False,
           rms_norm_eps=1e-6)

IDS = [3, 77, 15, 42, 9, 88, 21, 5]


def _hf(seed=70):
    cfg = transformers.JambaConfig(**CFG)
    torch.manual_seed(seed)
    return cfg, transformers.JambaForCausalLM(cfg).eval()


def _build(cfg):
    d = cfg.to_dict()
    d["architectures"] = ["JambaForCausalLM"]
    return build_model(d, dtype=jnp.float32)


def _params(model, hf):
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return model.load_hf_state_dict(sd)


class TestParity:
    def test_layer_schedule(self):
        cfg, hf = _hf()
        model = _build(cfg)
        a = model.arch
        # period 4, offset 2 -> layer 2 is attention; period 2, offset 1
        # -> layers 1, 3 are MoE.
        assert [a.is_attn(i) for i in range(4)] == [False, False, True,
                                                    False]
        assert [a.is_moe(i) for i in range(4)] == [False, True, False,
                                                   True]
        assert a.num_attn_layers == 1 and a.num_mamba_layers == 3

    def test_prefill_logits_match_hf(self):
        cfg, hf = _hf()
        with torch.no_grad():
            want = hf(torch.tensor([IDS])).logits[0].float().numpy()
        model = _build(cfg)
        params = _params(model, hf)
        pools = model.make_state_pools(4, 32)
        toks = np.zeros(16, np.int32)
        toks[:len(IDS)] = IDS
        # forward_prefill returns only the LAST hidden; recompute the full
        # sequence by prefilling each prefix length (cheap at test size).
        got = []
        for n in range(1, len(IDS) + 1):
            last, _ = model.forward_prefill(
                params, jnp.asarray(toks), jnp.int32(n), jnp.int32(1),
                pools)
            got.append(np.asarray(model.logits(params, last))[0])
        np.testing.assert_allclose(np.stack(got), want, rtol=3e-4,
                                   atol=3e-4)

    def test_decode_steps_match_prefill(self):
        """Stepwise decode over the same tokens reproduces the prefill
        logits (validates conv/ssm/KV state handoff + position counter)."""
        cfg, hf = _hf(71)
        model = _build(cfg)
        params = _params(model, hf)
        pools = model.make_state_pools(4, 32)
        slots = jnp.asarray([2], jnp.int32)
        got = []
        for tok in IDS:
            h, pools = model.forward_decode_step(
                params, jnp.asarray([tok]), slots, pools)
            got.append(np.asarray(model.logits(params, h))[0])
        with torch.no_grad():
            want = hf(torch.tensor([IDS])).logits[0].float().numpy()
        np.testing.assert_allclose(np.stack(got), want, rtol=3e-4,
                                   atol=3e-4)


class TestEngine:
    def test_greedy_matches_hf_generate(self):
        cfg, hf = _hf(72)
        d = cfg.to_dict()
        d["architectures"] = ["JambaForCausalLM"]
        d["eos_token_id"] = None
        model = _build(cfg)
        llm = LLM(hf_config=d, dtype="float32", max_model_len=64,
                  num_device_blocks=8, seed=0,
                  params=_params(model, hf))
        prompt = IDS
        n = 12
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                           ignore_eos=True))
        got = outs[0].outputs[0].token_ids
        with torch.no_grad():
            want = hf.generate(torch.tensor([prompt]), max_new_tokens=n,
                               do_sample=False).numpy()[0][len(prompt):]
        assert list(got) == list(want)

    def test_continuous_batching(self):
        cfg, _hf2 = _hf(73)
        d = cfg.to_dict()
        d["architectures"] = ["JambaForCausalLM"]
        d["eos_token_id"] = None
        llm = LLM(hf_config=d, dtype="float32", max_model_len=64,
                  num_device_blocks=8, seed=0, max_num_seqs=4)
        prompts = [[1, 5, 9], [22, 41, 3, 17, 8], [90, 2], [7] * 10]
        outs = llm.generate(
            prompt_token_ids=prompts,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                           ignore_eos=True))
        assert all(len(o.outputs[0].token_ids) == 8 for o in outs)


class TestClassification:
    def test_jamba_seq_classification_matches_hf(self):
        """JambaForSequenceClassification (reference jamba.py:600): LAST
        pooling + score head, served through engine.classify()."""
        cfg = transformers.JambaConfig(**{**CFG, "num_labels": 3,
                                          "pad_token_id": 0})
        torch.manual_seed(74)
        hf = transformers.JambaForSequenceClassification(cfg).eval()
        with torch.no_grad():
            want = hf(torch.tensor([IDS])).logits[0].float().numpy()

        d = cfg.to_dict()
        d["architectures"] = ["JambaForSequenceClassification"]
        model = build_model(d, dtype=jnp.float32)
        assert model.arch.head_type == "cls" and model.arch.num_labels == 3
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        llm = LLM(hf_config=d, dtype="float32", max_model_len=64,
                  num_device_blocks=8, seed=0,
                  params=model.load_hf_state_dict(sd))
        (got,) = llm.engine.classify([IDS])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        with pytest.raises(ValueError):
            llm.engine.add_request(prompt_token_ids=IDS)
