"""Budget-bounded pool sizing must leave admission headroom above the
scheduler's watermark (round-5 deadlock fix).

Before the fix, CacheEngine sized an eviction-bounded pool at
``budget_pages + 10`` while the scheduler's admission gate reserved
``int(0.01 * pool)`` free pages — so any budget past ~16k tokens made
the watermark (1% of pool) exceed the 10-page margin and a prompt that
prunes to exactly the budget waited forever (hit live by the 128k
BASELINE-config-#5 sweep rows: 4096 required pages vs a 4106-page pool
and a 41-page watermark).  The reference aborts such requests with
AllocStatus.NEVER (vllm/core/block_manager.py); here the pool is
deliberately budget-sized, so the pool grows by the watermark instead.
"""

import types

from vllm_paged_compression_tpu.config import (CacheConfig, PagedEvictConfig,
                                               SchedulerConfig)
from vllm_paged_compression_tpu.core.paging import (
    num_required_blocks_after_prune)
from vllm_paged_compression_tpu.core.scheduler import Scheduler
from vllm_paged_compression_tpu.core.sequence import Sequence
from vllm_paged_compression_tpu.runner.cache_engine import CacheEngine
from vllm_paged_compression_tpu.sampling_params import SamplingParams


def _sized_pool(input_len: int, budget: int, block_size: int = 16) -> tuple:
    evict = PagedEvictConfig(enabled=True, evict_method="global",
                             cache_budget=budget)
    cache = CacheConfig(block_size=block_size, paged_evict=evict)
    sched = SchedulerConfig(max_num_seqs=1,
                            max_num_batched_tokens=input_len + 512,
                            max_model_len=input_len + 512)
    cfg = types.SimpleNamespace(cache=cache, scheduler=sched)
    arch = types.SimpleNamespace(num_layers=2, num_kv_heads=2, head_dim=64)
    model = types.SimpleNamespace(
        arch=arch, architecture="llama",
        param_bytes=lambda: 64 << 20)
    eng = CacheEngine(cfg, model)
    return eng, cache, sched, evict


def test_watermark_headroom_reserved_on_budget_bounded_pool():
    # 128k prompt, 64k budget: 4096 required pages.  The pool must admit
    # it through the watermark gate.
    input_len, budget = 131072, 65536
    eng, cache, sched, evict = _sized_pool(input_len, budget)
    required, _ = num_required_blocks_after_prune(input_len, evict, 16,
                                                 budget)
    s = Scheduler(sched, cache, eng.num_pages)
    assert eng.num_pages - required >= s.watermark_blocks, (
        f"pool {eng.num_pages} leaves {eng.num_pages - required} free "
        f"below the {s.watermark_blocks}-page watermark")


def test_128k_prompt_admitted_not_deadlocked():
    input_len, budget = 131072, 65536
    eng, cache, sched, evict = _sized_pool(input_len, budget)
    s = Scheduler(sched, cache, eng.num_pages)
    seq = Sequence("r0", list(range(input_len)),
                   SamplingParams(max_tokens=8, temperature=0.0))
    s.add_seq(seq)
    out = s.schedule()
    assert [p.seq.request_id for p in out.prefills] == ["r0"]
    assert seq.block_table is not None


def test_short_budget_sizing_unchanged_class():
    # The classic short row (1024/512) still sizes to a small pool:
    # watermark reserve must not balloon it.
    eng, *_ = _sized_pool(1024, 512)
    assert eng.num_pages <= 64
