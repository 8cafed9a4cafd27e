"""Continuous-batching scheduler.

TPU-native re-design of the reference Scheduler (vllm/core/scheduler.py:322):
FCFS or priority policy, token-budget-bounded prefill admission with
pruned-size sizing (reference can_allocate, vllm/core/block_manager.py:122-140),
watermark-gated admission, and preemption by recompute when the page pool runs
dry (reference :1572-1625).  Chunked prefill is intentionally absent in round 1
— the reference disables it under paged eviction anyway
(vllm/engine/arg_utils.py:1185, torch_cuda_sdpa.py:877).

Differences from the reference, deliberate:

- No swapped queue / CPU swap tier: preemption always recomputes.  On TPU the
  host↔device transfer for swapping pages through PCIe-less ICI topologies is
  rarely a win over recompute at eviction-bounded context lengths.
- A step schedules either prefills or decodes, never both (matches the
  reference's default non-chunked mode, scheduler.py:1262).
- The scheduler owns slot claiming for decode steps so the runner sees a
  fully-resolved batch description (the reference splits this between
  scheduler, block manager, and the attention metadata builder).
"""

from __future__ import annotations

import random
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

from ..config import CacheConfig, SchedulerConfig
from .block_allocator import BlockAllocator
from .block_table import BlockTable
from .paging import decode_evicts_now, num_required_blocks_after_prune
from .sequence import Sequence, SequenceStatus


@dataclass
class ScheduledPrefill:
    seq: Sequence
    prompt_len: int          # logical prompt length fed to the model
    stored_len: int          # pruned KV length that will be written


@dataclass
class ScheduledDecode:
    seq: Sequence
    slot: int                # flat slot id for the new token's KV write
    position: int            # rope/logical position of the input token
    kv_len: int              # physical KV len incl. the new token, pre-evict
    evict: bool              # whether a block eviction fires this step
    zero_slot: int = -1      # flat slot to overwrite with zeros (or -1)


@dataclass
class SchedulerOutput:
    prefills: list[ScheduledPrefill] = field(default_factory=list)
    decodes: list[ScheduledDecode] = field(default_factory=list)
    preempted: list[Sequence] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.prefills and not self.decodes


class Scheduler:
    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig, num_blocks: int):
        self.config = scheduler_config
        self.cache_config = cache_config
        self.evict = cache_config.paged_evict
        self.block_size = cache_config.block_size
        self.allocator = BlockAllocator(num_blocks)
        self.waiting: deque[Sequence] = deque()
        self.running: list[Sequence] = []
        self.watermark_blocks = max(
            1, int(scheduler_config.watermark * num_blocks))
        self.num_preemptions = 0

    # ---- queue management ----------------------------------------------

    def add_seq(self, seq: Sequence) -> None:
        max_len = self.config.max_model_len
        if seq.num_prompt_tokens > max_len:
            raise ValueError(
                f"prompt ({seq.num_prompt_tokens} tokens) exceeds "
                f"max_model_len ({max_len})")
        self.waiting.append(seq)

    def abort(self, request_id: str) -> bool:
        for q in (self.waiting, self.running):
            for seq in list(q):
                if seq.request_id == request_id:
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self._release(seq)
                    q.remove(seq)
                    return True
        return False

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def kv_usage(self) -> float:
        return self.allocator.usage()

    # ---- the step -------------------------------------------------------

    def schedule(self) -> SchedulerOutput:
        out = SchedulerOutput()
        if self.waiting and len(self.running) < self.config.max_num_seqs:
            self._schedule_prefills(out)
            if out.prefills:
                return out
        self._schedule_decodes(out)
        return out

    def _sorted_waiting(self) -> deque[Sequence]:
        if self.config.policy == "priority":
            return deque(sorted(self.waiting,
                                key=lambda s: (s.priority, s.arrival_time)))
        return self.waiting

    def _schedule_prefills(self, out: SchedulerOutput) -> None:
        budget_tokens = self.config.max_num_batched_tokens
        queue = self._sorted_waiting()
        admitted: list[Sequence] = []
        for seq in list(queue):
            if len(self.running) + len(admitted) >= self.config.max_num_seqs:
                break
            if len(admitted) >= self.config.max_prefill_seqs:
                break
            prompt_len = seq.num_prompt_tokens
            if prompt_len > budget_tokens:
                break
            if self.evict is not None and self.evict.enabled:
                blocks, stored = num_required_blocks_after_prune(
                    prompt_len, self.evict, self.block_size)
            else:
                blocks, stored = (-(-prompt_len // self.block_size),
                                  prompt_len)
            if not self.allocator.can_allocate(blocks, self.watermark_blocks):
                break  # FCFS head-of-line: don't starve the head request
            table = BlockTable(self.block_size, self.allocator)
            table.allocate_prompt(stored)
            seq.block_table = table
            seq.status = SequenceStatus.RUNNING
            admitted.append(seq)
            budget_tokens -= prompt_len
            out.prefills.append(
                ScheduledPrefill(seq, prompt_len, stored))
        for seq in admitted:
            self.waiting.remove(seq)
            self.running.append(seq)

    def _schedule_decodes(self, out: SchedulerOutput) -> None:
        # Claim a slot for every running sequence; preempt from the back of
        # the running list (latest arrival first, reference scheduler.py:1572)
        # when the pool can't supply a boundary page.
        for seq in list(self.running):
            if seq not in self.running:
                continue  # was preempted below
            table = seq.block_table
            assert table is not None
            while table.blocks_needed_for_append() > 0 and \
                    not self.allocator.can_allocate(1):
                victim = self._pick_preemption_victim()
                self._preempt(victim)
                out.preempted.append(victim)
                if victim is seq:
                    break
            if seq not in self.running:
                continue
            logical_post = seq.get_len()  # incl. the token written this step
            evict_fires = (
                self.evict is not None
                and decode_evicts_now(logical_post, self.evict,
                                      self.block_size))
            slot = table.append_slot()
            kv_len = table.num_kv_slots
            zero_slot = self._zero_slot_for(seq, logical_post)
            out.decodes.append(
                ScheduledDecode(seq=seq, slot=slot,
                                position=logical_post - 1,
                                kv_len=kv_len, evict=evict_fires,
                                zero_slot=zero_slot))

    def _zero_slot_for(self, seq: Sequence, logical_post: int) -> int:
        """Slot-zeroing side writes for streamingLLM-1 / inverse_key_l2.

        streamingLLM-1 (torch_cuda_sdpa.py:1395-1401): between block
        boundaries past the budget, zero slot (logical_post % bs - 1) of the
        block right after the sink.
        inverse_key_l2 (torch_cuda_sdpa.py:1444-1454): every step past the
        budget, zero a random slot of a random middle block.
        """
        if self.evict is None or not self.evict.enabled:
            return -1
        if logical_post <= self.evict.cache_budget:
            return -1
        bs = self.block_size
        pages = seq.block_table.pages
        if self.evict.evict_method == "streamingLLM-1":
            if logical_post % bs != 0 and len(pages) > 2:
                return pages[1] * bs + (logical_post % bs - 1)
        elif self.evict.evict_method == "inverse_key_l2":
            if len(pages) > 2:
                rnd = getattr(self, "_zero_rng", None)
                if rnd is None:
                    rnd = self._zero_rng = random.Random(
                        self.evict.random_seed)
                block_idx = rnd.randint(1, len(pages) - 2)
                slot_idx = rnd.randint(0, bs - 1)
                return pages[block_idx] * bs + slot_idx
        return -1

    # ---- preemption -----------------------------------------------------

    def _pick_preemption_victim(self) -> Sequence:
        # Latest arrival (or lowest priority) goes first, possibly the very
        # sequence being scheduled (reference scheduler.py:1572-1625).
        if self.config.policy == "priority":
            return max(self.running,
                       key=lambda s: (s.priority, s.arrival_time))
        return max(self.running, key=lambda s: s.arrival_time)

    def _preempt(self, seq: Sequence) -> None:
        self.running.remove(seq)
        seq.reset_for_recompute()
        self.waiting.appendleft(seq)
        self.num_preemptions += 1

    # ---- post-step feedback --------------------------------------------

    def free_pruned_block(self, seq: Sequence, victim_table_idx: int) -> int:
        """Apply a decode-time eviction decision: splice the victim page out
        of the table and return it to the pool (reference feedback loop,
        llm_engine.py:1179-1193 → scheduler.py:1879-1889 →
        block_manager.py:540-543)."""
        assert seq.block_table is not None
        return seq.block_table.free_pruned_block(victim_table_idx)

    def finish_seq(self, seq: Sequence, status: SequenceStatus) -> None:
        seq.status = status
        if seq in self.running:
            self.running.remove(seq)
        self._release(seq)

    def _release(self, seq: Sequence) -> None:
        if seq.block_table is not None:
            seq.block_table.free()
            seq.block_table = None
