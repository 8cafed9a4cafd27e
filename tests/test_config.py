"""Config validation tests (reference PagedEvictConfig._verify_args,
vllm/config.py:957-991)."""

import pytest

from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                               PagedEvictConfig,
                                               SchedulerConfig)


class TestPagedEvictConfig:
    def test_defaults_valid(self):
        cfg = PagedEvictConfig()
        cfg.verify(block_size=16)

    def test_small_budget_allowed_in_core(self):
        # The reference's >=128 floor is enforced at the CLI layer only.
        PagedEvictConfig(cache_budget=64).verify(block_size=16)

    def test_budget_three_blocks(self):
        with pytest.raises(ValueError):
            PagedEvictConfig(cache_budget=128).verify(block_size=64)

    def test_budget_block_multiple(self):
        with pytest.raises(ValueError):
            PagedEvictConfig(cache_budget=130).verify(block_size=16)

    def test_local_needs_topk(self):
        with pytest.raises(ValueError):
            PagedEvictConfig(evict_method="local",
                             topk_blocks=1).verify(block_size=16)
        PagedEvictConfig(evict_method="local",
                         topk_blocks=3).verify(block_size=16)

    def test_global_forces_topk(self):
        cfg = PagedEvictConfig(evict_method="global", topk_blocks=5)
        cfg.verify(block_size=16)
        assert cfg.topk_blocks == -1

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            PagedEvictConfig(evict_method="h2o").verify(block_size=16)

    def test_percentage_now_defined(self):
        # Round 4: the percentage type is implemented (per-request
        # budgets, tests/engine/test_percentage_prune.py); the default
        # 1024 is invalid as a percent.
        with pytest.raises(ValueError, match="1, 100"):
            PagedEvictConfig(cache_prune_type="percentage").verify(16)
        PagedEvictConfig(cache_prune_type="percentage",
                         cache_budget=50).verify(16)

    def test_frees_pages(self):
        assert PagedEvictConfig(evict_method="streamingLLM").frees_pages
        assert PagedEvictConfig(evict_method="global").frees_pages
        assert not PagedEvictConfig(
            evict_method="inverse_key_l2").frees_pages


class TestEngineConfig:
    def test_chunked_prefill_with_eviction_allowed(self):
        # Round 4 superset: the combination the fork/upstream reject
        # (arg_utils.py:1185) is defined single-stage; round 5 adds the
        # staged PP final-chunk prune wave (_prefill_ctx_prune_pp), so
        # PP no longer rejects it either.
        cfg = EngineConfig(
            cache=CacheConfig(paged_evict=PagedEvictConfig()),
            scheduler=SchedulerConfig(enable_chunked_prefill=True))
        cfg.verify()
        from vllm_paged_compression_tpu.config import ParallelConfig
        cfg2 = EngineConfig(
            cache=CacheConfig(paged_evict=PagedEvictConfig()),
            scheduler=SchedulerConfig(enable_chunked_prefill=True),
            parallel=ParallelConfig(pipeline_parallel_size=2))
        cfg2.verify()

    def test_hash_stable_and_sensitive(self):
        a = EngineConfig()
        b = EngineConfig()
        assert a.compute_hash() == b.compute_hash()
        b.cache.block_size = 32
        assert a.compute_hash() != b.compute_hash()
