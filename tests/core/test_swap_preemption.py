"""Preemption-by-swap scheduler behavior (reference analog: the swapped
queue + PreemptionMode.SWAP of vllm/core/scheduler.py:696,1572-1625).

The scheduler owns the swapped queue and page accounting; the device copies
happen through engine-installed hooks, faked here with a host-side dict.
"""

from vllm_paged_compression_tpu.config import (CacheConfig, SchedulerConfig)
from vllm_paged_compression_tpu.core.scheduler import Scheduler
from vllm_paged_compression_tpu.core.sequence import (Sequence,
                                                      SequenceStatus)
from vllm_paged_compression_tpu.sampling_params import SamplingParams


def make_swap_scheduler(num_blocks=5, block_size=4, accept=True, **kw):
    cache = CacheConfig(block_size=block_size)
    cfg = SchedulerConfig(max_num_seqs=kw.pop("max_num_seqs", 8),
                          max_num_batched_tokens=512, max_model_len=512,
                          preemption_mode="swap", **kw)
    s = Scheduler(cfg, cache, num_blocks)
    store = {}

    def swap_out(seq):
        if not accept:
            return False
        kv_len = seq.block_table.num_kv_slots
        store[seq.request_id] = kv_len
        seq.swapped_kv_len = kv_len
        seq.swap_payload = ("kv", None, kv_len, 0)
        seq.block_table.free()
        seq.block_table = None
        return True

    def swap_in(seq):
        assert seq.block_table is not None
        assert seq.block_table.num_kv_slots == store.pop(seq.request_id)
        seq.swap_payload = None

    s.swap_out_fn = swap_out
    s.swap_in_fn = swap_in
    return s, store


def prefilled(s, rid, prompt_len=8):
    seq = Sequence(rid, list(range(prompt_len)),
                   SamplingParams(max_tokens=64, temperature=0.0))
    s.add_seq(seq)
    out = s.schedule()
    assert any(p.seq is seq for p in out.prefills)
    seq.append_token(1000)
    return seq


class TestSwapPreemption:
    def test_pressure_swaps_out_latest_arrival(self):
        s, store = make_swap_scheduler()
        a = prefilled(s, "a")   # 2 pages
        b = prefilled(s, "b")   # 2 pages; 1 free
        # Both need a page at the kv=8 boundary; only one is free.
        plans, k, pre = s.plan_decode_window(1)
        assert pre == [b]
        assert b.status == SequenceStatus.SWAPPED
        assert b in s.swapped and s.num_waiting == 0
        assert b.block_table is None
        # Generation state preserved (unlike recompute, which folds the
        # outputs back into the prompt).
        assert b.output_token_ids == [1000]
        assert b.swapped_kv_len == 8 and "b" in store
        assert s.num_swap_outs == 1
        assert [p.seq for p in plans] == [a]
        s.commit_window(plans, k, [[-1]])

    def test_swapped_resumes_when_pool_recovers(self):
        s, store = make_swap_scheduler()
        a = prefilled(s, "a")
        b = prefilled(s, "b")
        plans, k, _ = s.plan_decode_window(1)
        s.commit_window(plans, k, [[-1]])
        assert b in s.swapped
        s.finish_seq(a, SequenceStatus.FINISHED_STOPPED)
        out = s.schedule()
        assert not out.prefills
        assert b.status == SequenceStatus.RUNNING
        assert b in s.running and not s.swapped
        assert b.block_table is not None
        assert b.block_table.num_kv_slots == 8
        assert b.block_table.num_pages == 2
        assert b.swap_payload is None and not store
        assert s.num_swap_ins == 1
        # And b can decode again right away.
        plans, k, pre = s.plan_decode_window(1)
        assert k == 1 and not pre and plans[0].seq is b

    def test_swap_resumes_before_new_prefills(self):
        s, _ = make_swap_scheduler(num_blocks=5)
        a = prefilled(s, "a")
        b = prefilled(s, "b")
        plans, k, pre = s.plan_decode_window(1)
        assert b in s.swapped
        s.commit_window(plans, k, [[-1]])
        c = Sequence("c", list(range(8)), SamplingParams(max_tokens=4))
        s.add_seq(c)
        s.finish_seq(a, SequenceStatus.FINISHED_STOPPED)
        out = s.schedule()
        # b resumed first; c admitted only if pages remain after b.
        assert b in s.running
        assert all(p.seq is not b for p in out.prefills)

    def test_full_host_budget_falls_back_to_recompute(self):
        s, _ = make_swap_scheduler(accept=False)
        prefilled(s, "a")
        b = prefilled(s, "b")
        s.plan_decode_window(1)
        assert b.status == SequenceStatus.PREEMPTED
        assert not s.swapped and s.num_waiting == 1
        assert b.output_token_ids == []   # folded into the prompt
        assert b.num_prompt_tokens == 9

    def test_abort_swapped_sequence(self):
        s, _ = make_swap_scheduler()
        prefilled(s, "a")
        b = prefilled(s, "b")
        s.plan_decode_window(1)
        assert b in s.swapped
        assert s.abort("b")
        assert not s.swapped
        assert b.status == SequenceStatus.FINISHED_ABORTED
        assert not s.has_unfinished() or s.num_running == 1
