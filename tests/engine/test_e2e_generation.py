"""End-to-end generation tests through the LLM API on tiny models (CPU).

Reference analog: tests/basic_correctness/ — greedy continuations through
the full engine (paged cache + continuous batching) must match a plain
full-context forward with the same weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.llama import LlamaArch, LlamaModel
from vllm_paged_compression_tpu.ops.attention import prefill_attention
from vllm_paged_compression_tpu.sampling_params import SamplingParams

TINY_LLAMA_CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def tiny_llm(**kw):
    return LLM(hf_config=TINY_LLAMA_CFG, dtype="float32", block_size=4,
               max_model_len=256, num_device_blocks=128, seed=0,
               max_num_seqs=8, **kw)


def oracle_continuation(llm, prompt_ids, n_tokens):
    """Greedy continuation via repeated full-context forward (no paging)."""
    model = llm.engine.model
    params = llm.engine.params
    scale = model.arch.head_dim ** -0.5
    ids = list(prompt_ids)
    out = []
    for _ in range(n_tokens):
        t = len(ids)
        h, _ = model.forward_hidden(
            params, jnp.array(ids), jnp.arange(t),
            lambda q, k, v, s: (prefill_attention(q, k, v, scale, t), s))
        tok = int(jnp.argmax(model.logits(params, h)[-1]))
        out.append(tok)
        ids.append(tok)
    return out


class TestGreedyParity:
    def test_single_request_matches_oracle(self):
        llm = tiny_llm()
        prompt = [1, 17, 33, 5, 99, 2, 8, 61, 40, 7]
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=12))
        got = outs[0].outputs[0].token_ids
        expect = oracle_continuation(llm, prompt, 12)
        assert got == expect

    def test_batched_requests_match_oracle(self):
        llm = tiny_llm()
        prompts = [[1, 5, 9, 13], [2, 4, 6, 8, 10, 12, 14],
                   [100, 90, 80, 70, 60, 50, 40, 30, 20, 10, 5]]
        outs = llm.generate(
            prompt_token_ids=prompts,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
        for p, o in zip(prompts, outs):
            assert o.outputs[0].token_ids == oracle_continuation(llm, p, 8), \
                f"mismatch for prompt {p}"

    def test_continuous_batching_joins_mid_flight(self):
        """Requests added while others decode must not perturb them."""
        llm = tiny_llm()
        eng = llm.engine
        p1 = [1, 17, 33, 5, 99, 2, 8, 61]
        p2 = [9, 9, 3, 1, 44]
        eng.add_request(request_id="a", prompt_token_ids=p1,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=10))
        # a prefills + decodes a few steps alone
        for _ in range(4):
            eng.step()
        eng.add_request(request_id="b", prompt_token_ids=p2,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=10))
        finals = {}
        while eng.has_unfinished_requests():
            for out in eng.step():
                if out.finished:
                    finals[out.request_id] = out
        assert finals["a"].outputs[0].token_ids == \
            oracle_continuation(llm, p1, 10)
        assert finals["b"].outputs[0].token_ids == \
            oracle_continuation(llm, p2, 10)


class TestSamplingE2E:
    def test_seeded_sampling_deterministic(self):
        llm = tiny_llm()
        sp = SamplingParams(temperature=0.8, seed=7, max_tokens=10)
        a = llm.generate(prompt_token_ids=[[1, 2, 3, 4]],
                         sampling_params=sp)[0].outputs[0].token_ids
        b = llm.generate(prompt_token_ids=[[1, 2, 3, 4]],
                         sampling_params=sp)[0].outputs[0].token_ids
        assert a == b

    def test_stop_token(self):
        llm = tiny_llm()
        base = llm.generate(
            prompt_token_ids=[[1, 2, 3, 4]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=10)
        )[0].outputs[0].token_ids
        stop_at = base[3]
        out = llm.generate(
            prompt_token_ids=[[1, 2, 3, 4]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=10,
                                           stop_token_ids=[stop_at]))[0]
        first = base.index(stop_at)
        assert out.outputs[0].token_ids == base[:first + 1]
        assert out.outputs[0].finish_reason == "stop"


class TestEvictionE2E:
    @pytest.mark.parametrize("method,selection", [
        ("streamingLLM", "l2"),
        ("streamingLLM-1", "l2"),
        ("local", "l2"),
        ("global", "l2"),
        ("global", "random"),
        ("inverse_key_l2", "l2"),
    ])
    def test_long_generation_stays_within_budget(self, method, selection):
        budget = 16  # tiny: block 4 => sink + 2 middle + tail
        llm = tiny_llm(enable_paged_eviction=True, evict_method=method,
                       cache_budget=budget,
                       topk_blocks=2 if method == "local" else -1,
                       evict_selection=selection)
        prompt = list(np.arange(40) % 128)
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=30))
        assert len(outs[0].outputs[0].token_ids) == 30
        # All pages were released at finish.
        assert llm.engine.scheduler.allocator.num_allocated_blocks == 0

    def test_kv_len_bounded_during_decode(self):
        budget = 16
        llm = tiny_llm(enable_paged_eviction=True,
                       evict_method="streamingLLM", cache_budget=budget)
        eng = llm.engine
        eng.add_request(request_id="a",
                        prompt_token_ids=list(np.arange(40) % 128),
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=40))
        seq = eng.scheduler.waiting[0]
        max_kv = 0
        while eng.has_unfinished_requests():
            eng.step()
            if seq.block_table is not None:
                max_kv = max(max_kv, seq.block_table.num_kv_slots)
        assert max_kv <= budget + 4  # budget + one block transient

    def test_evict_freq_relaxes_the_pin(self):
        # evict_freq 2: only every other page boundary evicts, so the
        # working set grows ~1 page per 2 generated pages instead of
        # staying pinned at the budget (the old README --evict-freq
        # surface, README.md:36-45).
        budget = 16
        peaks = {}
        for freq in (1, 2):
            llm = tiny_llm(enable_paged_eviction=True,
                           evict_method="streamingLLM",
                           cache_budget=budget, evict_freq=freq)
            eng = llm.engine
            eng.add_request(request_id="a",
                            prompt_token_ids=list(np.arange(40) % 128),
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=40))
            seq = eng.scheduler.waiting[0]
            mx = 0
            while eng.has_unfinished_requests():
                eng.step()
                if seq.block_table is not None:
                    mx = max(mx, seq.block_table.num_kv_slots)
            peaks[freq] = mx
        assert peaks[1] <= budget + 4
        # 40 generated tokens = ~10 boundaries; half skipped => ~5 extra
        # pages over the pinned case.
        assert peaks[2] > peaks[1] + 2 * 4, peaks

    def test_eviction_reduces_pool_pressure(self):
        prompt = [int(x) for x in np.arange(64) % 128]
        kw = dict(prompt_token_ids=prompt,
                  sampling_params=SamplingParams(temperature=0.0,
                                                 max_tokens=20))
        llm_full = tiny_llm()
        llm_ev = tiny_llm(enable_paged_eviction=True,
                          evict_method="streamingLLM", cache_budget=16)
        peak_full, peak_ev = [], []
        for llm, peaks in ((llm_full, peak_full), (llm_ev, peak_ev)):
            eng = llm.engine
            eng.add_request(request_id="x", **kw)
            while eng.has_unfinished_requests():
                eng.step()
                peaks.append(eng.scheduler.allocator.num_allocated_blocks)
        assert max(peak_ev) < max(peak_full)


class TestMultiStepDecode:
    """K chained device steps must produce exactly the same tokens as K
    single steps, for every eviction method (the reference cannot combine
    multi-step with eviction at all, arg_utils.py:1255-1257)."""

    @pytest.mark.parametrize("method,selection", [
        (None, None),
        ("streamingLLM", "l2"),
        ("streamingLLM-1", "l2"),
        ("global", "l2"),
        ("local", "random"),
        ("inverse_key_l2", "l2"),
    ])
    def test_multistep_matches_single_step(self, method, selection):
        kw = {}
        if method is not None:
            kw = dict(enable_paged_eviction=True, evict_method=method,
                      cache_budget=16,
                      topk_blocks=2 if method == "local" else -1,
                      evict_selection=selection)
        prompts = [[(7 * i + j) % 128 for j in range(20 + 3 * i)]
                   for i in range(3)]
        sp = SamplingParams(temperature=0.0, max_tokens=24)
        single = tiny_llm(num_scheduler_steps=1, **kw).generate(
            prompt_token_ids=prompts, sampling_params=sp)
        multi = tiny_llm(num_scheduler_steps=6, **kw).generate(
            prompt_token_ids=prompts, sampling_params=sp)
        for s, m in zip(single, multi):
            assert s.outputs[0].token_ids == m.outputs[0].token_ids

    def test_multistep_with_sampling_deterministic(self):
        sp = SamplingParams(temperature=0.9, seed=3, max_tokens=17)
        single = tiny_llm(num_scheduler_steps=1).generate(
            prompt_token_ids=[[1, 2, 3, 4, 5]], sampling_params=sp)
        multi = tiny_llm(num_scheduler_steps=8).generate(
            prompt_token_ids=[[1, 2, 3, 4, 5]], sampling_params=sp)
        assert single[0].outputs[0].token_ids == \
            multi[0].outputs[0].token_ids

    def test_multistep_stop_truncates(self):
        llm1 = tiny_llm(num_scheduler_steps=1)
        base = llm1.generate(
            prompt_token_ids=[[1, 2, 3, 4]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=12)
        )[0].outputs[0].token_ids
        stop_at = base[2]
        first = base.index(stop_at)
        out = tiny_llm(num_scheduler_steps=8).generate(
            prompt_token_ids=[[1, 2, 3, 4]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=12,
                                           stop_token_ids=[stop_at]))[0]
        assert out.outputs[0].token_ids == base[:first + 1]


class TestWindowChaining:
    """Device-chained decode windows (VPC_WINDOW_CHAIN=1) must be token-
    identical to synchronous per-window execution, including across stop
    boundaries (max_tokens staggered so sequences finish mid-chain)."""

    def _run(self, monkeypatch, chain: bool):
        monkeypatch.setenv("VPC_WINDOW_CHAIN", "1" if chain else "0")
        llm = tiny_llm(enable_paged_eviction=True, evict_method="global",
                       cache_budget=16, num_scheduler_steps=4)
        prompts = [[1, 17, 33, 5, 99, 2, 8, 61, 40, 7],
                   [9, 3, 3, 12, 50]]
        outs = []
        for i, p in enumerate(prompts):
            llm.engine.add_request(
                prompt_token_ids=p,
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=10 + 7 * i))
        got = {}
        while llm.engine.has_unfinished_requests():
            for out in llm.engine.step():
                got[out.request_id] = out.outputs[0].token_ids
        return got

    def test_chain_matches_sync(self, monkeypatch):
        sync = self._run(monkeypatch, chain=False)
        chained = self._run(monkeypatch, chain=True)
        assert sync == chained
        assert sorted(len(v) for v in sync.values()) == [10, 17]


class TestLogprobs:
    """SamplingParams.logprobs: per-token top-L dicts + cumulative score
    (reference vllm/outputs.py Logprob surface)."""

    def test_greedy_logprobs_match_oracle(self):
        import jax
        import jax.numpy as jnp
        llm = tiny_llm()
        prompt = [1, 17, 33, 5, 99, 2, 8, 61]
        n = 6
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                           logprobs=4))
        co = outs[0].outputs[0]
        assert co.logprobs is not None and len(co.logprobs) == n
        # Oracle: recompute log-softmax at every position.
        model, params = llm.engine.model, llm.engine.params
        scale = model.arch.head_dim ** -0.5
        ids = list(prompt)
        cum = 0.0
        for step, tok in enumerate(co.token_ids):
            t = len(ids)
            h, _ = model.forward_hidden(
                params, jnp.array(ids), jnp.arange(t),
                lambda q, k, v, s: (prefill_attention(q, k, v, scale, t),
                                    s))
            lp = jax.nn.log_softmax(
                model.logits(params, h)[-1].astype(jnp.float32))
            top_v, top_i = jax.lax.top_k(lp, 4)
            d = co.logprobs[step]
            assert tok in d
            np.testing.assert_allclose(d[tok], float(lp[tok]), atol=1e-3)
            for j in range(4):
                assert int(top_i[j]) in d
                np.testing.assert_allclose(d[int(top_i[j])],
                                           float(top_v[j]), atol=1e-3)
            cum += float(lp[tok])
            ids.append(tok)
        np.testing.assert_allclose(co.cumulative_logprob, cum, atol=1e-2)


    def test_logprobs_under_chunked_prefill_and_prefix_cache(self):
        # The context-prefill program (chunked prefill / prefix-cache
        # suffix) must emit the first generated token's logprob row just
        # like the plain prefill (reference: logprobs are engine-wide).
        prompt = list(range(1, 40))
        sp = SamplingParams(temperature=0.0, max_tokens=5, logprobs=3)

        def rows(llm, pr=prompt):
            out = llm.generate(prompt_token_ids=[pr],
                               sampling_params=sp)[0].outputs[0]
            assert out.logprobs is not None and len(out.logprobs) == 5
            return out.token_ids, out.logprobs

        base_t, base_l = rows(tiny_llm())
        ck_t, ck_l = rows(tiny_llm(enable_chunked_prefill=True,
                                   max_num_batched_tokens=16))
        assert ck_t == base_t
        for d1, d2 in zip(base_l, ck_l):
            assert set(d1) == set(d2)
            for t in d1:
                np.testing.assert_allclose(d1[t], d2[t], atol=1e-3)
        # Prefix cache: second request shares the first 36 tokens.
        llm = tiny_llm(enable_prefix_caching=True)
        rows(llm)
        pc_t, pc_l = rows(llm, prompt[:36] + [77, 78])
        assert len(pc_l) == 5 and pc_t

    def test_logprobs_off_by_default(self):
        llm = tiny_llm()
        outs = llm.generate(
            prompt_token_ids=[[1, 2, 3]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=3))
        assert outs[0].outputs[0].logprobs is None


class TestSamplingExtras:
    def test_n_parallel_samples(self):
        llm = tiny_llm()
        outs = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99]],
            sampling_params=SamplingParams(temperature=0.9, n=3, seed=7,
                                           max_tokens=8))
        assert len(outs) == 1
        cos = outs[0].outputs
        assert [c.index for c in cos] == [0, 1, 2]
        assert all(len(c.token_ids) == 8 for c in cos)
        # distinct derived seeds should give at least two distinct samples
        assert len({tuple(c.token_ids) for c in cos}) >= 2

    def test_min_p_masks_tail(self):
        # min_p=1.0 keeps only the argmax -> deterministic even at temp>0.
        llm = tiny_llm()
        sp_minp = SamplingParams(temperature=1.0, min_p=1.0, seed=3,
                                 max_tokens=8)
        sp_greedy = SamplingParams(temperature=0.0, max_tokens=8)
        a = llm.generate(prompt_token_ids=[[1, 17, 33, 5, 99]],
                         sampling_params=sp_minp)[0].outputs[0].token_ids
        b = llm.generate(prompt_token_ids=[[1, 17, 33, 5, 99]],
                         sampling_params=sp_greedy)[0].outputs[0].token_ids
        assert list(a) == list(b)
