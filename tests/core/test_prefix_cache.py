"""Prefix caching: content-addressed page reuse + LRU reclaim
(reference tests/core/block/test_prefix_caching_block.py analog), plus
chunked prefill / prefix-skip end-to-end correctness.
"""

import numpy as np

from vllm_paged_compression_tpu.core.prefix_cache import (
    PrefixCachingAllocator, hash_chain)

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 512,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def test_hash_chain_full_pages_only():
    assert len(hash_chain(list(range(31)), 16)) == 1
    assert len(hash_chain(list(range(32)), 16)) == 2
    h1 = hash_chain([1, 2, 3, 4], 4)
    h2 = hash_chain([1, 2, 3, 4, 9], 4)
    assert h1[0] == h2[0]
    assert hash_chain([5, 2, 3, 4], 4)[0] != h1[0]


def test_acquire_register_free_park_cycle():
    alloc = PrefixCachingAllocator(8)
    toks = list(range(48))              # 3 full pages
    hashes = hash_chain(toks, 16)
    assert alloc.lookup(hashes) == []

    pages = alloc.allocate(3)
    alloc.register(hashes, pages)       # creator's reference
    assert alloc.lookup(hashes) == pages

    shared = alloc.acquire(hashes)      # second sequence
    assert shared == pages
    alloc.free(pages)                   # creator leaves; still referenced
    assert alloc.lookup(hashes) == pages
    alloc.free(shared)                  # last ref: pages park, stay cached
    assert alloc.lookup(hashes) == pages
    # Parked pages count as free and are reclaimed LRU when needed.
    assert alloc.num_free_blocks == 8
    got = alloc.allocate(7)             # forces reclaim of parked pages
    assert len(got) == 7
    assert alloc.lookup(hashes) != pages or len(alloc.lookup(hashes)) < 3


def test_lru_reclaim_order():
    alloc = PrefixCachingAllocator(4)
    a = alloc.allocate(1)
    alloc.register(hash_chain(list(range(16)), 16), a)
    b = alloc.allocate(1)
    alloc.register(hash_chain(list(range(100, 116)), 16), b)
    alloc.free(a)   # parked first -> LRU oldest
    alloc.free(b)
    alloc.allocate(3)  # needs 1 reclaim: must take a, keep b
    assert alloc.lookup(hash_chain(list(range(100, 116)), 16)) == b
    assert alloc.lookup(hash_chain(list(range(16)), 16)) == []


def _llm(**kw):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    base = dict(hf_config=CFG, dtype="float32", block_size=16,
                max_model_len=512, num_device_blocks=64, seed=0,
                max_num_seqs=8)
    base.update(kw)
    return LLM(**base)


def _gen(llm, prompts, n=24):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=n)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    return [o.outputs[0].token_ids for o in outs]


def test_chunked_prefill_token_identical():
    prompts = [list(range(1, 101)), [3] * 77]
    want = _gen(_llm(), prompts)
    got = _gen(_llm(enable_chunked_prefill=True, max_num_batched_tokens=32),
               prompts)
    assert got == want


def test_prefix_cache_token_identical_and_hits():
    shared = list(np.random.default_rng(0).integers(1, 128, 64))
    p1 = shared + [5, 6, 7]
    p2 = shared + [9, 10, 11, 12]
    want = _gen(_llm(), [p1]) + _gen(_llm(), [p2])
    llm = _llm(enable_prefix_caching=True)
    # Sequential requests: p2 arrives after p1's pages are registered
    # (identical prompts in the SAME batch can't share yet — registration
    # happens after the prefill writes, as in the reference).
    got = _gen(llm, [p1]) + _gen(llm, [p2])
    assert got == want
    alloc = llm.engine.scheduler.allocator
    assert alloc.hits >= 4      # p2 reused shared's 4 full pages

    # A later identical-prefix request reuses parked pages after p1/p2
    # finished (their refs dropped -> parked, contents intact).
    got3 = _gen(llm, [p1])
    assert got3[0] == want[0]


def test_prefix_cache_with_chunked_prefill():
    shared = list(np.random.default_rng(1).integers(1, 128, 80))
    p1 = shared + [5, 6]
    p2 = shared + [9, 10, 11]
    want = _gen(_llm(), [p1, p2])
    got = _gen(_llm(enable_prefix_caching=True, enable_chunked_prefill=True,
                    max_num_batched_tokens=48), [p1, p2])
    assert got == want


class TestParallelSamplingSharing:
    """n>1 parallel sampling shares prompt KV through the prefix cache
    (reference mechanism: CoW fork, vllm/core/block_manager.py +
    block/prefix_caching_block.py; here siblings defer one pass on the
    prefilling owner, then adopt its registered pages)."""

    def test_n4_single_prompt_prefill_and_refcount_release(self):
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        cfg = {
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": 128, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 512, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-5, "tie_word_embeddings": True,
            "eos_token_id": None,
        }
        llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
                  max_model_len=256, num_device_blocks=64, seed=0,
                  max_num_seqs=8, enable_prefix_caching=True)
        eng = llm.engine
        spans = []
        orig = eng.runner.run_prefill

        def spy(params, caches, scores, sp):
            spans.append((sp.chunk_start, sp.chunk_end))
            return orig(params, caches, scores, sp)

        eng.runner.run_prefill = spy
        prompt = list(range(1, 41))     # 40 tokens = 2 full pages + tail
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.7, n=4, seed=3,
                                           max_tokens=4))
        assert len(outs[0].outputs) == 4
        # Exactly ONE full prompt prefill; the three siblings recompute
        # only the tail partial page (page-granular sharing).
        assert spans.count((0, 40)) == 1, spans
        assert spans.count((32, 40)) == 3, spans
        assert len(spans) == 4, spans
        # All references released: shared pages parked, none leaked.
        alloc = eng.scheduler.allocator
        assert not alloc._refs, alloc._refs
        assert alloc.num_free_blocks == 64
        assert alloc.hit_rate() > 0

    def test_different_prompts_not_deferred(self):
        """Deferral only triggers for identical prompts: two distinct
        prompts admit in the same pass."""
        from vllm_paged_compression_tpu.config import (CacheConfig,
                                                       SchedulerConfig)
        from vllm_paged_compression_tpu.core.scheduler import Scheduler
        from vllm_paged_compression_tpu.core.sequence import Sequence
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        sched = Scheduler(SchedulerConfig(max_num_seqs=8,
                                          max_num_batched_tokens=512,
                                          max_model_len=128),
                          CacheConfig(block_size=4,
                                      enable_prefix_caching=True), 64)
        sp = SamplingParams(max_tokens=2, temperature=0.0)
        a = Sequence("a", list(range(1, 20)), sp)
        b = Sequence("b", list(range(1, 20)), sp)      # identical to a
        c = Sequence("c", list(range(50, 70)), sp)     # different
        for s in (a, b, c):
            sched.add_seq(s)
        out = sched.schedule()
        ids = [p.seq.request_id for p in out.prefills]
        assert "a" in ids and "c" in ids and "b" not in ids, ids
