"""Scheduler behavior tests (reference analog: tests/core/test_scheduler.py):
FCFS admission, pruned-size admission under eviction, token budget, decode
slot claiming, eviction flags, preemption by recompute."""

from vllm_paged_compression_tpu.config import (CacheConfig, PagedEvictConfig,
                                               SchedulerConfig)
from vllm_paged_compression_tpu.core.scheduler import Scheduler
from vllm_paged_compression_tpu.core.sequence import Sequence, SequenceStatus
from vllm_paged_compression_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=64, block_size=4, evict=None, **kw):
    cache = CacheConfig(block_size=block_size, paged_evict=evict)
    sched_cfg = SchedulerConfig(max_num_seqs=kw.pop("max_num_seqs", 8),
                                max_num_batched_tokens=kw.pop(
                                    "max_num_batched_tokens", 512),
                                max_model_len=kw.pop("max_model_len", 512),
                                **kw)
    return Scheduler(sched_cfg, cache, num_blocks)


def make_seq(rid, prompt_len, max_tokens=64):
    return Sequence(rid, list(range(prompt_len)),
                    SamplingParams(max_tokens=max_tokens, temperature=0.0))


class TestPrefillAdmission:
    def test_fcfs_admits_in_order(self):
        s = make_scheduler()
        seqs = [make_seq(f"r{i}", 8) for i in range(3)]
        for q in seqs:
            s.add_seq(q)
        out = s.schedule()
        assert [p.seq.request_id for p in out.prefills] == ["r0", "r1", "r2"]
        assert all(p.seq.status == SequenceStatus.RUNNING
                   for p in out.prefills)
        assert all(p.seq.block_table is not None for p in out.prefills)

    def test_token_budget_limits_batch(self):
        s = make_scheduler(max_num_batched_tokens=16, max_model_len=16)
        for i in range(4):
            s.add_seq(make_seq(f"r{i}", 8))
        out = s.schedule()
        assert len(out.prefills) == 2  # 8 + 8 fills the 16-token budget

    def test_blocks_gate_admission(self):
        # 8 pages of 4 slots, watermark 1 page: a 24-token prompt takes 6
        # pages; the second identical prompt must wait.
        s = make_scheduler(num_blocks=8, watermark=0.125)
        s.add_seq(make_seq("a", 24))
        s.add_seq(make_seq("b", 24))
        out = s.schedule()
        assert len(out.prefills) == 1
        assert s.num_waiting == 1

    def test_pruned_size_admission_under_eviction(self):
        # budget 16, bs 4: a 64-token prompt stores only 16 tokens => 4 pages,
        # so it fits a tiny 6-page pool that couldn't hold the full prompt.
        ev = PagedEvictConfig(enabled=True, evict_method="streamingLLM",
                              cache_budget=16)
        s = make_scheduler(num_blocks=6, evict=ev)
        s.add_seq(make_seq("a", 64))
        out = s.schedule()
        assert len(out.prefills) == 1
        assert out.prefills[0].stored_len == 16
        assert out.prefills[0].seq.block_table.num_pages == 4

    def test_priority_policy_orders_by_priority(self):
        s = make_scheduler(policy="priority")
        lo = make_seq("lo", 8)
        lo.priority = 10
        hi = make_seq("hi", 8)
        hi.priority = 0
        s.add_seq(lo)
        s.add_seq(hi)
        out = s.schedule()
        assert out.prefills[0].seq.request_id == "hi"


class TestDecodeWindow:
    def _prefilled(self, s, rid="a", prompt_len=8):
        seq = make_seq(rid, prompt_len)
        s.add_seq(seq)
        out = s.schedule()
        assert out.prefills
        seq.append_token(1000)  # simulated first sampled token
        return seq

    def test_single_step_plan_claims_slot_and_position(self):
        s = make_scheduler(block_size=4)
        seq = self._prefilled(s, prompt_len=8)
        plans, k, pre = s.plan_decode_window(1)
        assert k == 1 and not pre
        plan = plans[0]
        # Input token is the sampled one at logical position 8; a new page
        # was reserved at the block boundary.
        assert plan.positions == [8]
        assert plan.new_pages[0] >= 0
        assert plan.slots == [plan.new_pages[0] * 4 + 0]
        # Table untouched until commit.
        assert seq.block_table.num_pages == 2
        s.commit_window(plans, 1, [[-1]])
        assert seq.block_table.num_pages == 3
        assert seq.block_table.num_kv_slots == 9

    def test_window_eviction_schedule(self):
        ev = PagedEvictConfig(enabled=True, evict_method="streamingLLM",
                              cache_budget=16)
        s = make_scheduler(block_size=4, evict=ev)
        seq = self._prefilled(s, prompt_len=18)  # logical 19 after sample
        plans, k, _ = s.plan_decode_window(8)
        assert k == 8
        plan = plans[0]
        for i in range(k):
            logical = 19 + i
            assert plan.evict[i] == (logical > 16 and logical % 4 == 0)
            if plan.evict[i]:
                assert plan.victims[i] == 1
        kv_before = seq.block_table.num_kv_slots
        s.commit_window(plans, k, [[-1]] * k)
        seq.output_token_ids.extend([1] * k)
        # kv stays bounded: grew by 8 minus 4 per eviction.
        n_evicts = sum(plan.evict[:k])
        assert seq.block_table.num_kv_slots == kv_before + 8 - 4 * n_evicts

    def test_window_truncates_when_pool_dry(self):
        s = make_scheduler(num_blocks=5, block_size=4, watermark=0.01)
        seq = self._prefilled(s, "a", prompt_len=7)   # 2 pages, 3 free
        plans, k, pre = s.plan_decode_window(32)
        # Steps 1..13 fit (3 new pages); the window truncates when dry.
        assert 0 < k < 32
        assert not pre
        s.commit_window(plans, k, [[-1]] * k)

    def test_pool_dry_truncation_buckets_to_pow2(self):
        # A pool-dry truncation is a compile-time window shape: K must
        # floor to a power of two (arbitrary Ks were one fresh XLA
        # compile each — the evict-off offered-load compile storm).
        s = make_scheduler(num_blocks=5, block_size=4, watermark=0.01)
        seq = self._prefilled(s, "a", prompt_len=7)   # 2 pages, 3 free
        plans, k, pre = s.plan_decode_window(32)
        assert 0 < k < 32
        assert k & (k - 1) == 0, k
        s.commit_window(plans, k, [[-1]] * k)

    def test_pool_dry_replan_replays_random_victims(self):
        # The pow2 re-plan must draw the SAME host victims as a direct
        # plan at the floored K (RNG state restored before re-planning).
        ev = PagedEvictConfig(evict_method="global", cache_budget=12,
                              selection="random")
        a = make_scheduler(num_blocks=7, block_size=4, evict=ev,
                           watermark=0.01)
        seq = make_seq("a", 12, max_tokens=64)
        a.add_seq(seq)
        a.schedule()
        seq.prefill_pos = seq.num_prompt_tokens
        seq.append_token(1)
        plans, k, _ = a.plan_decode_window(32)   # truncates + re-plans
        assert 0 < k < 32 and k & (k - 1) == 0
        ev2 = PagedEvictConfig(evict_method="global", cache_budget=12,
                               selection="random")
        b = make_scheduler(num_blocks=7, block_size=4, evict=ev2,
                           watermark=0.01)
        seq2 = make_seq("a", 12, max_tokens=64)
        b.add_seq(seq2)
        b.schedule()
        seq2.prefill_pos = seq2.num_prompt_tokens
        seq2.append_token(1)
        plans2, k2, _ = b.plan_decode_window(k)  # direct plan at K
        assert k2 == k
        assert plans[0].victims == plans2[0].victims

    def test_preemption_when_first_step_impossible(self):
        s = make_scheduler(num_blocks=5, block_size=4, watermark=0.01)
        a = self._prefilled(s, "a", prompt_len=8)   # 2 pages
        b = self._prefilled(s, "b", prompt_len=8)   # 2 pages; 1 free
        # Both need a page at their next boundary.  a gets the free page,
        # b's first step fails -> b preempted by recompute.
        plans, k, pre = s.plan_decode_window(1)
        assert pre and pre[0] is b
        assert b.status == SequenceStatus.PREEMPTED
        assert b.block_table is None
        assert [p.seq for p in plans] == [a]
        s.commit_window(plans, k, [[-1]])

    def test_streamingllm1_zero_slots_in_plan(self):
        ev = PagedEvictConfig(enabled=True, evict_method="streamingLLM-1",
                              cache_budget=16)
        s = make_scheduler(block_size=4, evict=ev)
        seq = self._prefilled(s, prompt_len=17)  # logical 18
        plans, k, _ = s.plan_decode_window(8)
        plan = plans[0]
        saw_zero = saw_evict = False
        pages_sim = list(seq.block_table.pages)
        for i in range(k):
            logical = 18 + i
            if logical > 16 and logical % 4 != 0:
                assert plan.zero_slots[i] >= 0
                saw_zero = True
            if plan.evict[i]:
                saw_evict = True
        assert saw_zero and saw_evict


class TestFinish:
    def test_finish_releases_pages(self):
        s = make_scheduler()
        seq = make_seq("a", 8)
        s.add_seq(seq)
        s.schedule()
        used = s.allocator.num_allocated_blocks
        assert used > 0
        s.finish_seq(seq, SequenceStatus.FINISHED_STOPPED)
        assert s.allocator.num_allocated_blocks == 0
        assert not s.has_unfinished()

    def test_abort_waiting(self):
        s = make_scheduler()
        seq = make_seq("a", 8)
        s.add_seq(seq)
        assert s.abort("a")
        assert not s.has_unfinished()


class TestCanAdmitNext:
    """can_admit_next gates the engine's drop-to-single-step-windows:
    a full pool with a deep backlog must NOT pin windows at k=1
    (round-4 64->256 offered-load throughput drop)."""

    def test_empty_queues(self):
        s = make_scheduler()
        assert not s.can_admit_next()

    def test_admittable_head(self):
        s = make_scheduler()
        s.add_seq(make_seq("r0", 8))
        assert s.can_admit_next()

    def test_pool_full_blocks(self):
        # Small pool: admit until the watermark blocks the backlog head.
        s = make_scheduler(num_blocks=8, block_size=4)
        for i in range(4):
            s.add_seq(make_seq(f"r{i}", 12))
            s.schedule()
        assert s.num_running >= 1 and s.num_waiting >= 1
        assert not s.can_admit_next()
        # Finishing one frees its pages: the head becomes admittable.
        victim = next(iter(s.running))
        s.finish_seq(victim, SequenceStatus.FINISHED_STOPPED)
        assert s.can_admit_next()

    def test_slot_cap_blocks(self):
        s = make_scheduler(max_num_seqs=1)
        s.add_seq(make_seq("r0", 8))
        s.schedule()
        s.add_seq(make_seq("r1", 8))
        assert not s.can_admit_next()
