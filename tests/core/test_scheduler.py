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


class TestDecode:
    def _prefilled(self, s, rid="a", prompt_len=8):
        seq = make_seq(rid, prompt_len)
        s.add_seq(seq)
        out = s.schedule()
        assert out.prefills
        # Simulate the sampled first token.
        seq.append_token(1000)
        return seq

    def test_decode_claims_slot_and_position(self):
        s = make_scheduler(block_size=4)
        seq = self._prefilled(s, prompt_len=8)
        out = s.schedule()
        assert len(out.decodes) == 1
        d = out.decodes[0]
        # Input token is the sampled one at logical position 8.
        assert d.position == 8
        assert d.kv_len == 9
        # Slot crossed a block boundary into a fresh page.
        assert d.slot == seq.block_table.pages[2] * 4 + 0

    def test_evict_flag_fires_at_boundary_past_budget(self):
        ev = PagedEvictConfig(enabled=True, evict_method="streamingLLM",
                              cache_budget=16)
        s = make_scheduler(block_size=4, evict=ev)
        seq = self._prefilled(s, prompt_len=18)  # stored 16+2... > budget
        # Walk decode steps until logical length hits a block boundary > 16.
        fired = []
        for _ in range(8):
            out = s.schedule()
            d = out.decodes[0]
            fired.append((seq.get_len(), d.evict))
            if d.evict:
                s.free_pruned_block(seq, 1)
            seq.append_token(1)
        for logical, ev_fired in fired:
            assert ev_fired == (logical > 16 and logical % 4 == 0)
        assert any(f for _, f in fired)

    def test_preemption_by_recompute_when_pool_dry(self):
        s = make_scheduler(num_blocks=5, block_size=4, watermark=0.01)
        a = self._prefilled(s, "a", prompt_len=7)   # 2 pages
        b = self._prefilled(s, "b", prompt_len=7)   # 2 pages -> pool full
        # Drive decodes until someone needs a new page.
        preempted_seen = False
        for _ in range(4):
            out = s.schedule()
            if out.preempted:
                preempted_seen = True
                break
            for d in out.decodes:
                d.seq.append_token(1)
        assert preempted_seen
        # Latest arrival (b) was preempted and waits for recompute with its
        # generated tokens folded into the prompt.
        assert b.status == SequenceStatus.PREEMPTED
        assert s.num_waiting == 1
        assert b.block_table is None
        assert a in s.running

    def test_streamingllm1_zero_slot(self):
        ev = PagedEvictConfig(enabled=True, evict_method="streamingLLM-1",
                              cache_budget=16)
        s = make_scheduler(block_size=4, evict=ev)
        seq = self._prefilled(s, prompt_len=17)
        saw_zero, saw_evict = False, False
        for _ in range(10):
            out = s.schedule()
            d = out.decodes[0]
            logical = seq.get_len()
            if logical > 16 and logical % 4 != 0:
                assert d.zero_slot == seq.block_table.pages[1] * 4 \
                    + (logical % 4 - 1)
                saw_zero = True
            if d.evict:
                s.free_pruned_block(seq, 1)
                saw_evict = True
            seq.append_token(1)
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
