"""Mamba (selective state space) models: HF parity + full-engine serving
(reference vllm/model_executor/models/mamba.py + mamba_cache.py and
csrc/mamba kernels, SURVEY C12)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = dict(vocab_size=128, hidden_size=64, state_size=8,
           num_hidden_layers=2, conv_kernel=4, expand=2,
           time_step_rank=8, use_bias=False, use_conv_bias=True)


def _hf(seed=50):
    cfg = transformers.MambaConfig(**CFG)
    torch.manual_seed(seed)
    return cfg, transformers.MambaForCausalLM(cfg).eval()


def _params(model, hf):
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return model.load_hf_state_dict(sd)


IDS = [3, 77, 15, 42, 9, 88, 21]


class TestParity:
    def test_stepwise_decode_matches_hf(self):
        cfg, hf = _hf()
        with torch.no_grad():
            want = hf(torch.tensor([IDS])).logits[0].numpy()
        d = cfg.to_dict(); d["architectures"] = ["MambaForCausalLM"]
        model = build_model(d, dtype=jnp.float32)
        params = _params(model, hf)
        a = model.arch
        pools = (jnp.zeros((a.num_layers, 4, a.d_inner, a.d_conv - 1),
                           jnp.float32),
                 jnp.zeros((a.num_layers, 4, a.d_inner, a.d_state),
                           jnp.float32))
        slots = jnp.asarray([1], jnp.int32)
        got = []
        for tok in IDS:
            h, pools = model.forward_decode_step(
                params, jnp.asarray([tok]), slots, pools)
            got.append(np.asarray(model.logits(params, h))[0])
        np.testing.assert_allclose(np.stack(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_prefill_states_match_stepwise(self):
        cfg, hf = _hf(51)
        d = cfg.to_dict(); d["architectures"] = ["MambaForCausalLM"]
        model = build_model(d, dtype=jnp.float32)
        params = _params(model, hf)
        a = model.arch
        zero = lambda s: jnp.zeros(s, jnp.float32)  # noqa: E731
        shape_c = (a.num_layers, 4, a.d_inner, a.d_conv - 1)
        shape_s = (a.num_layers, 4, a.d_inner, a.d_state)
        pools = (zero(shape_c), zero(shape_s))
        slots = jnp.asarray([2], jnp.int32)
        for tok in IDS:
            h_step, pools = model.forward_decode_step(
                params, jnp.asarray([tok]), slots, pools)
        toks = jnp.asarray(IDS + [0] * 5, jnp.int32)     # padded
        pools2 = (zero(shape_c), zero(shape_s))
        last, pools2 = model.forward_prefill(
            params, toks, jnp.int32(len(IDS)), jnp.int32(2), pools2)
        np.testing.assert_allclose(np.asarray(last)[0],
                                   np.asarray(h_step)[0],
                                   rtol=2e-4, atol=2e-4)
        for got, want in zip(pools2, pools):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)


class TestEngine:
    def _llm(self, **kw):
        cfg = transformers.MambaConfig(**CFG).to_dict()
        cfg["architectures"] = ["MambaForCausalLM"]
        cfg["eos_token_id"] = None
        return LLM(hf_config=cfg, dtype="float32", max_model_len=128,
                   max_num_seqs=4, seed=0, **kw)

    def test_greedy_matches_hf_generate(self):
        cfg, hf = _hf(52)
        with torch.no_grad():
            want = hf.generate(torch.tensor([IDS]), max_new_tokens=12,
                               do_sample=False)[0][len(IDS):].tolist()
        d = cfg.to_dict(); d["architectures"] = ["MambaForCausalLM"]
        d["eos_token_id"] = None
        model = build_model(d, dtype=jnp.float32)
        params = _params(model, hf)
        llm = LLM(hf_config=d, dtype="float32", max_model_len=128,
                  max_num_seqs=4, seed=0, num_scheduler_steps=4,
                  params=params)
        out = llm.generate(prompt_token_ids=[list(IDS)],
                           sampling_params=SamplingParams(
                               temperature=0.0, max_tokens=12,
                               ignore_eos=True))[0]
        assert list(out.outputs[0].token_ids) == want

    def test_continuous_batching(self):
        llm = self._llm(num_scheduler_steps=4)
        prompts = [list(range(1, 9)), list(range(20, 30)),
                   list(range(40, 45)), list(range(60, 75))]
        outs = llm.generate(prompt_token_ids=prompts,
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=16,
                                ignore_eos=True))
        assert all(len(o.outputs[0].token_ids) == 16 for o in outs)
        # Batched outputs must match solo runs (state-slot isolation).
        llm2 = self._llm(num_scheduler_steps=4)
        for prompt, out in zip(prompts, outs):
            solo = llm2.engine
            rid = solo.add_request(
                prompt_token_ids=prompt,
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=16,
                                               ignore_eos=True))
            final = None
            while solo.has_unfinished_requests():
                for o in solo.step():
                    if o.finished:
                        final = o
            assert list(final.outputs[0].token_ids) == \
                list(out.outputs[0].token_ids), rid

    def test_rejects_paged_only_features(self):
        with pytest.raises(ValueError, match="not supported with Mamba"):
            self._llm(enable_paged_eviction=True, evict_method="global",
                      cache_budget=128, block_size=16)


def test_falcon_mamba_logits_match_hf():
    """FalconMamba = Mamba + weightless RMS on dt/B/C (HF
    modeling_falcon_mamba rms_forward)."""
    cfg = transformers.FalconMambaConfig(
        vocab_size=128, hidden_size=64, state_size=8,
        num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=8,
        use_bias=False, use_conv_bias=True, mixer_rms_eps=1e-6)
    torch.manual_seed(53)
    hf = transformers.FalconMambaForCausalLM(cfg).eval()
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).logits[0].numpy()
    d = cfg.to_dict(); d["architectures"] = ["FalconMambaForCausalLM"]
    model = build_model(d, dtype=jnp.float32)
    assert model.arch.mixer_rms_eps == 1e-6
    params = _params(model, hf)
    a = model.arch
    pools = (jnp.zeros((a.num_layers, 4, a.d_inner, a.d_conv - 1),
                       jnp.float32),
             jnp.zeros((a.num_layers, 4, a.d_inner, a.d_state),
                       jnp.float32))
    slots = jnp.asarray([0], jnp.int32)
    got = []
    for tok in IDS:
        h, pools = model.forward_decode_step(params, jnp.asarray([tok]),
                                             slots, pools)
        got.append(np.asarray(model.logits(params, h))[0])
    np.testing.assert_allclose(np.stack(got), want, rtol=3e-4, atol=3e-4)


class TestMambaTP:
    def test_tp2_matches_single(self):
        """Mamba under tensor parallelism (d_inner sharded over "model")
        must be token-identical to the single-device engine; the conftest
        provides the 8-device CPU mesh."""
        def gen(tp):
            cfg = transformers.MambaConfig(**CFG).to_dict()
            cfg["architectures"] = ["MambaForCausalLM"]
            cfg["eos_token_id"] = None
            llm = LLM(hf_config=cfg, dtype="float32", max_model_len=128,
                      max_num_seqs=4, seed=0, num_scheduler_steps=4,
                      tensor_parallel_size=tp)
            prompts = [list(range(1, 9)), list(range(20, 30))]
            outs = llm.generate(prompt_token_ids=prompts,
                                sampling_params=SamplingParams(
                                    temperature=0.0, max_tokens=12,
                                    ignore_eos=True))
            return [list(o.outputs[0].token_ids) for o in outs]

        assert gen(2) == gen(1)

    def test_rejects_dp_and_uneven_pp(self):
        # PP is supported since round 3 (tests/parallel/test_pipeline.py
        # TestMambaPipeline); DP replicas and layer counts that do not
        # split evenly over stages still reject.
        cfg = transformers.MambaConfig(**CFG).to_dict()
        cfg["architectures"] = ["MambaForCausalLM"]
        cfg["eos_token_id"] = None
        with pytest.raises(ValueError, match="data parallelism"):
            LLM(hf_config=cfg, dtype="float32", max_model_len=128,
                max_num_seqs=4, seed=0, data_parallel_size=2)
        with pytest.raises(ValueError, match="num_layers"):
            LLM(hf_config=cfg, dtype="float32", max_model_len=128,
                max_num_seqs=4, seed=0, pipeline_parallel_size=8)
