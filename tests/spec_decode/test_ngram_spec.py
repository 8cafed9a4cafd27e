"""ngram speculative decoding: proposer unit tests + token-exactness vs
plain decoding (greedy spec decode must never change the output).
"""

import numpy as np
import pytest

from vllm_paged_compression_tpu.spec_decode.ngram import propose_ngram

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def test_propose_ngram_finds_repeat():
    toks = [1, 2, 3, 9, 9, 1, 2, 3]
    # tail 3-gram [1,2,3] occurred at position 0, followed by [9, 9, 1].
    assert propose_ngram(toks, 3, 3, 1) == [9, 9, 1]


def test_propose_ngram_fallback():
    assert propose_ngram([5, 6, 7], 2, 3, 2) == [7, 7]


def test_propose_ngram_prefers_longest_match():
    toks = [4, 1, 2, 8, 1, 2, 3, 7, 1, 2, 3]
    # 3-gram [1,2,3] matches at 4..6 (-> 7); the 2-gram would match at 1.
    assert propose_ngram(toks, 1, 3, 1) == [7]


def _gen(llm, prompts, n=40):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=n)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    return [o.outputs[0].token_ids for o in outs]


def _llm(**kw):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    base = dict(hf_config=CFG, dtype="float32", block_size=16,
                max_model_len=1024, num_device_blocks=128, seed=0,
                max_num_seqs=8)
    base.update(kw)
    return LLM(**base)


def test_spec_decode_token_identical():
    # Repetitive prompts make ngram proposals frequently correct; random
    # prompts make them frequently wrong — both must yield exactly the
    # plain greedy continuation.
    prompts = [
        ([7, 8, 9, 10] * 12)[:47],
        list(np.random.default_rng(0).integers(1, 128, 50)),
        [3, 3, 3, 3, 3, 3, 3, 3],
    ]
    want = _gen(_llm(), prompts)
    got = _gen(_llm(speculative_config={"num_speculative_tokens": 4}),
               prompts)
    assert got == want


def test_spec_decode_respects_max_tokens():
    llm = _llm(speculative_config={"num_speculative_tokens": 8})
    outs = _gen(llm, [[7, 8, 9] * 10], n=5)
    assert len(outs[0]) == 5


def test_spec_accepts_eviction_combo():
    """Round 5 superset: the blanket rejection (reference parity,
    llm_engine.py:1182) was lifted — see TestSpecWithEviction below."""
    llm = _llm(speculative_config={"num_speculative_tokens": 4},
               enable_paged_eviction=True, evict_method="global",
               cache_budget=128)
    assert llm.engine.config.speculative is not None


# ---- rejection sampler (ops/sampling.rejection_sample) -------------------

def test_rejection_sample_greedy_equals_argmax_match():
    """One-hot target distributions reduce rejection sampling to exact
    argmax-match verification."""
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.ops.sampling import rejection_sample
    v, k = 16, 3
    # Target argmaxes per position: [5, 9, 2, 7]; proposals [5, 9, 3].
    argmaxes = [5, 9, 2, 7]
    probs = np.zeros((1, k + 1, v), np.float32)
    for j, a in enumerate(argmaxes):
        probs[0, j, a] = 1.0
    proposals = np.array([[5, 9, 3]], np.int32)
    toks, n_acc = rejection_sample(jnp.asarray(probs),
                                   jnp.asarray(proposals),
                                   jnp.asarray([7], jnp.int32),
                                   jnp.asarray([0], jnp.int32))
    assert int(n_acc[0]) == 2             # 5, 9 accepted; 3 != 2 rejected
    assert [int(x) for x in np.asarray(toks)[0][:3]] == [5, 9, 2]


def test_rejection_sample_all_accepted_gets_bonus():
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.ops.sampling import rejection_sample
    v, k = 8, 2
    probs = np.zeros((1, k + 1, v), np.float32)
    probs[0, 0, 1] = 1.0
    probs[0, 1, 2] = 1.0
    probs[0, 2, 3] = 1.0                  # bonus position
    proposals = np.array([[1, 2]], np.int32)
    toks, n_acc = rejection_sample(jnp.asarray(probs),
                                   jnp.asarray(proposals),
                                   jnp.asarray([7], jnp.int32),
                                   jnp.asarray([0], jnp.int32))
    assert int(n_acc[0]) == 2
    assert [int(x) for x in np.asarray(toks)[0]] == [1, 2, 3]


def test_rejection_sample_matches_target_distribution():
    """Spec sampling must be UNBIASED: the marginal distribution of the
    first emitted token equals the target distribution regardless of the
    proposal (Leviathan et al. guarantee)."""
    import jax
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.ops.sampling import rejection_sample
    v, k, n_trials = 4, 1, 4000
    target = np.array([0.5, 0.25, 0.125, 0.125], np.float32)
    probs = np.zeros((n_trials, k + 1, v), np.float32)
    probs[:, 0] = target
    probs[:, 1] = target
    proposals = np.zeros((n_trials, k), np.int32)   # always propose 0
    seeds = np.arange(n_trials, dtype=np.int32)
    toks, n_acc = jax.jit(rejection_sample)(
        jnp.asarray(probs), jnp.asarray(proposals),
        jnp.asarray(seeds), jnp.zeros(n_trials, jnp.int32))
    toks = np.asarray(toks)
    first = toks[np.arange(n_trials), 0]
    freq = np.bincount(first, minlength=v) / n_trials
    np.testing.assert_allclose(freq, target, atol=0.03)


# ---- draft-model proposer -------------------------------------------------

DRAFT_CFG = {**CFG, "num_hidden_layers": 1, "hidden_size": 32,
             "intermediate_size": 64}


def test_draft_spec_decode_token_identical():
    """Greedy output with a draft-model proposer must match plain
    decoding exactly (bad proposals only cost acceptance rate)."""
    prompts = [[1, 17, 33, 5, 99, 2, 8, 61, 40, 7], [9, 3, 3, 12, 50]]
    base = _gen(_llm(), prompts, n=24)
    spec = _gen(_llm(speculative_config=dict(
        method="draft", num_speculative_tokens=3,
        draft_hf_config=DRAFT_CFG, draft_window=32)), prompts, n=24)
    assert base == spec


def test_spec_decode_sampled_runs_and_is_seeded():
    """Stochastic spec decode: completes, deterministic per seed."""
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    prompts = [[1, 17, 33, 5, 99, 2, 8], [9, 3, 3, 12, 50]]
    sp = SamplingParams(temperature=0.8, top_p=0.95, seed=1234,
                        max_tokens=16)

    def run():
        llm = _llm(speculative_config=dict(method="ngram",
                                           num_speculative_tokens=3))
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        return [list(o.outputs[0].token_ids) for o in outs]

    a, b = run(), run()
    assert a == b
    assert all(len(t) == 16 for t in a)


class TestTypicalAcceptance:
    def test_semantics_unit(self):
        import jax.numpy as jnp
        import numpy as np
        from vllm_paged_compression_tpu.ops.sampling import (
            typical_acceptance_sample)
        v = 8
        # Row 0: proposals match a peaked target -> all accepted, bonus =
        # argmax.  Row 1: first proposal has ~zero mass under a peaked
        # target -> rejected at position 0, recovery = argmax.
        peak = np.full(v, 1e-6, np.float32)
        peak[3] = 1.0
        peak /= peak.sum()
        off = np.full(v, 1e-6, np.float32)
        off[5] = 1.0
        off /= off.sum()
        probs = np.stack([
            np.stack([peak, peak, peak]),
            np.stack([off, peak, peak]),
        ])                                       # [2, k+1=3, V]
        proposals = np.array([[3, 3], [3, 3]], np.int32)
        toks, n_acc = typical_acceptance_sample(jnp.asarray(probs),
                                                jnp.asarray(proposals))
        toks, n_acc = np.asarray(toks), np.asarray(n_acc)
        assert n_acc[0] == 2 and list(toks[0]) == [3, 3, 3]
        assert n_acc[1] == 0 and toks[1][0] == 5

    def test_high_entropy_accepts_loosely(self):
        import jax.numpy as jnp
        import numpy as np
        from vllm_paged_compression_tpu.ops.sampling import (
            typical_acceptance_sample)
        v = 64
        uniform = np.full((1, 2, v), 1.0 / v, np.float32)
        proposals = np.array([[7]], np.int32)
        # H(uniform) = log 64 -> alpha*exp(-H) = 0.3/64 < 1/64 = p:
        # a uniform target accepts any proposal.
        toks, n_acc = typical_acceptance_sample(jnp.asarray(uniform),
                                                jnp.asarray(proposals))
        assert int(np.asarray(n_acc)[0]) == 1

    def test_e2e_with_engine(self):
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
                  max_model_len=256, num_device_blocks=128, seed=0,
                  speculative_config={
                      "num_speculative_tokens": 4,
                      "acceptance_method": "typical_acceptance_sampler"})
        outs = llm.generate(
            prompt_token_ids=[[5, 6, 7, 5, 6, 7, 5, 6]],
            sampling_params=SamplingParams(temperature=0.8, seed=3,
                                           max_tokens=24,
                                           ignore_eos=True))
        assert len(outs[0].outputs[0].token_ids) == 24


class TestSpecWithEviction:
    """Spec decode x paged eviction (superset — the reference asserts
    the combination away, vllm/engine/llm_engine.py:1182): rejected
    drafts roll back before the page-boundary eviction check, and the
    accepted tokens fire exactly the evictions plain decoding would."""

    def _evict_kw(self, method, selection="l2"):
        kw = dict(enable_paged_eviction=True, evict_method=method,
                  evict_selection=selection, cache_budget=128)
        if method == "local":
            kw["topk_blocks"] = 3
        return kw

    @pytest.mark.parametrize("method,selection", [
        ("streamingLLM", "l2"),
        ("global", "l2"),
        ("local", "l2"),
        ("global", "random"),
    ])
    def test_token_identical_vs_plain_eviction(self, method, selection):
        prompts = [
            ([7, 8, 9, 10] * 40)[:150],
            list(np.random.default_rng(1).integers(1, 128, 160)),
        ]
        kw = self._evict_kw(method, selection)
        want = _gen(_llm(**kw), prompts, n=60)
        got = _gen(_llm(speculative_config={"num_speculative_tokens": 4},
                        **kw), prompts, n=60)
        assert got == want

    def test_pages_freed_on_eviction(self):
        llm = _llm(speculative_config={"num_speculative_tokens": 4},
                   **self._evict_kw("streamingLLM"))
        alloc = llm.engine.scheduler.allocator
        free0 = alloc.num_free_blocks
        _gen(llm, [list(range(1, 150))], n=60)
        # Everything returns to the pool after the request finishes.
        assert alloc.num_free_blocks == free0

    def test_zero_write_methods_rejected(self):
        with pytest.raises(ValueError, match="zero-write"):
            _llm(speculative_config={"num_speculative_tokens": 4},
                 **self._evict_kw("streamingLLM-1"))

    def test_long_draft_rejected(self):
        with pytest.raises(ValueError, match="block_size"):
            _llm(speculative_config={"num_speculative_tokens": 16},
                 **self._evict_kw("streamingLLM"))
