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
    # Chunked prefill / prefix-cache skip (reference _schedule_chunked_prefill
    # scheduler.py:1167 + prefix caching; both off under eviction):
    chunk_start: int = 0     # first prompt position computed this call
    chunk_end: int = 0       # one past the last position (0 => prompt_len)
    is_last: bool = True     # sample a token after this chunk
    # Chunked prefill x eviction (a genuine superset — both the fork and
    # upstream reject the combination, arg_utils.py:1185): chunks write
    # full pages; the FINAL chunk scores the whole prompt, compacts the
    # keep set into the leading pages, and the engine shrinks the table.
    prune_on_last: bool = False

    def __post_init__(self):
        if self.chunk_end == 0:
            self.chunk_end = self.prompt_len


@dataclass
class SchedulerOutput:
    prefills: list[ScheduledPrefill] = field(default_factory=list)
    preempted: list[Sequence] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.prefills


@dataclass
class SeqWindowPlan:
    """K decode steps for one sequence, fully pre-planned.

    Every field is host-predictable before any token value is known: slot
    positions depend only on kv lengths and the *last* page, eviction firing
    depends only on logical lengths, and page appends are reserved up front.
    The one unknown — which middle page an in-graph L2 victim selection
    removes — does not influence any planned field; the host replays the
    fetched victims at commit time (``Scheduler.commit_window``).
    """

    seq: Sequence
    positions: list[int]
    slots: list[int]
    evict: list[bool]
    victims: list[int]        # host decision per step; -1 = device selects
    zero_slots: list[int]     # -1 = none
    fill_pages: list[int]     # -1 = none (page that becomes full this step)
    new_pages: list[int]      # -1 = none (pre-reserved page appended)
    steps: list[int]          # sampling step counters


@dataclass
class SpecStepPlan:
    """One speculative step for one sequence: the k proposals plus slots
    and positions for the k+1 in-flight KV rows."""

    seq: Sequence
    proposals: list[int]
    slots: list[int]
    positions: list[int]
    base_kv: int


class Scheduler:
    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig, num_blocks: int):
        self.config = scheduler_config
        self.cache_config = cache_config
        self.evict = cache_config.paged_evict
        self.block_size = cache_config.block_size
        if cache_config.enable_prefix_caching:
            from .prefix_cache import PrefixCachingAllocator
            self.allocator: BlockAllocator = PrefixCachingAllocator(
                num_blocks)
        else:
            self.allocator = BlockAllocator(num_blocks)
        self.prefix_caching = cache_config.enable_prefix_caching
        # Parallel-sampling prompt sharing (reference mechanism: CoW
        # fork, vllm/core/block_manager.py + block/prefix_caching_block.
        # py; here the prefix cache IS the sharing substrate): maps a
        # prompt's full-page hash-chain tail -> the sequence currently
        # prefilling it.  Identical prompts arriving while the owner is
        # mid-prefill are deferred one pass instead of re-prefilling,
        # then admit against the registered pages (one prefill per
        # prompt, tail page + last token only for siblings).
        self._prefill_chain_owner: dict = {}
        self.waiting: deque[Sequence] = deque()
        self.running: list[Sequence] = []
        # Preemption-by-swap tier (reference swapped queue,
        # core/scheduler.py:696 _schedule_swapped): sequences whose KV
        # lives in host memory until the pool frees up.  The device copies
        # are done by engine-installed hooks — the scheduler only owns the
        # queue and the page accounting.
        self.swapped: deque[Sequence] = deque()
        self.swap_out_fn = None   # Sequence -> bool (False: no host space)
        self.swap_in_fn = None    # Sequence -> None (table pre-allocated)
        self.num_swap_outs = 0
        self.num_swap_ins = 0
        self.watermark_blocks = max(
            1, int(scheduler_config.watermark * num_blocks))
        self.num_preemptions = 0
        # End state of the most recently planned decode window
        # ({request_id: sim}); feed back as ``resume=`` to chain windows.
        self.last_window_sim = None

    # ---- queue management ----------------------------------------------

    def add_seq(self, seq: Sequence) -> None:
        max_len = self.config.max_model_len
        if seq.num_prompt_tokens > max_len:
            raise ValueError(
                f"prompt ({seq.num_prompt_tokens} tokens) exceeds "
                f"max_model_len ({max_len})")
        if self.evict is not None and self.evict.enabled:
            from ..config import resolve_evict_budget
            seq.evict_budget = resolve_evict_budget(
                self.evict, seq.num_prompt_tokens, self.block_size)
        self.waiting.append(seq)

    def abort(self, request_id: str) -> bool:
        for q in (self.waiting, self.running, self.swapped):
            for seq in list(q):
                if seq.request_id == request_id:
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self._release(seq)
                    q.remove(seq)
                    return True
        return False

    def admit_prefilled(self, seq: Sequence) -> None:
        """Move a waiting sequence whose prompt KV arrived externally
        (disaggregated prefill, kv_transfer/) straight into decode."""
        self.waiting.remove(seq)
        seq.status = SequenceStatus.RUNNING
        self.running.append(seq)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_swapped(self) -> int:
        return len(self.swapped)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def kv_usage(self) -> float:
        return self.allocator.usage()

    # ---- the step -------------------------------------------------------

    def schedule(self) -> SchedulerOutput:
        """Prefill admission.  Decode work is planned separately via
        ``plan_decode_window`` (single-step == a window of 1)."""
        out = SchedulerOutput()
        if self.swapped:
            # Swapped sequences resume before new prompts are admitted
            # (reference ordering: _schedule_running/_swapped/_prefills,
            # core/scheduler.py:1262).
            self._schedule_swapped()
        if self.waiting and len(self.running) < self.config.max_num_seqs:
            self._schedule_prefills(out)
        return out

    def _schedule_swapped(self) -> None:
        queue = list(self.swapped)
        if self.config.policy == "priority":
            queue.sort(key=lambda s: (s.priority, s.arrival_time))
        for seq in queue:
            if len(self.running) >= self.config.max_num_seqs:
                break
            n = -(-seq.swapped_kv_len // self.block_size)
            # Watermark headroom doubles as swap hysteresis: a victim is
            # only brought back once the pool has comfortably recovered.
            if not self.allocator.can_allocate(n, self.watermark_blocks):
                break
            table = BlockTable(self.block_size, self.allocator)
            table.allocate_prompt(seq.swapped_kv_len)
            seq.block_table = table
            self.swap_in_fn(seq)
            assert seq.swap_payload is None, "swap-in hook must consume"
            seq.status = SequenceStatus.RUNNING
            self.swapped.remove(seq)
            self.running.append(seq)
            self.num_swap_ins += 1

    def can_admit_next(self) -> bool:
        """True when a waiting (or swapped) sequence could actually be
        admitted right now — a free slot AND pool headroom.  The engine
        drops to single-step decode windows only in that case: a full
        pool with a deep backlog must NOT disable multi-step windows
        (round-4 finding: the 64->256 offered-load sustained-throughput
        drop was every window running at k=1 because the backlog never
        emptied).  Under the priority policy the FCFS head is used as an
        approximation — the check gates a latency/throughput trade, not
        correctness."""
        if len(self.running) >= self.config.max_num_seqs:
            return False
        if self.swapped:
            seq = next(iter(self.swapped))
            n = -(-seq.swapped_kv_len // self.block_size)
            if self.allocator.can_allocate(n, self.watermark_blocks):
                return True
        if not self.waiting:
            return False
        seq = self.waiting[0]
        if seq.block_table is not None:
            return True        # mid-chunk prompt: already holds pages
        prompt_len = seq.num_prompt_tokens
        if (self.evict is not None and self.evict.enabled
                and not self.config.enable_chunked_prefill):
            blocks, _ = num_required_blocks_after_prune(
                prompt_len, self.evict, self.block_size, seq.evict_budget)
        else:
            blocks = -(-prompt_len // self.block_size)
        if self.prefix_caching:
            from .prefix_cache import hash_chain
            hashes = hash_chain(seq.prompt_token_ids, self.block_size)
            usable = min(len(self.allocator.lookup(hashes)),
                         (prompt_len - 1) // self.block_size)
            blocks -= usable
        return self.allocator.can_allocate(blocks, self.watermark_blocks)

    def _sorted_waiting(self) -> deque[Sequence]:
        if self.config.policy == "priority":
            return deque(sorted(self.waiting,
                                key=lambda s: (s.priority, s.arrival_time)))
        return self.waiting

    def _schedule_prefills(self, out: SchedulerOutput) -> None:
        budget_tokens = self.config.max_num_batched_tokens
        chunked = self.config.enable_chunked_prefill
        bs = self.block_size
        queue = self._sorted_waiting()
        admitted: list[Sequence] = []
        for seq in list(queue):
            if len(self.running) + len(admitted) >= self.config.max_num_seqs:
                break
            if len(out.prefills) >= self.config.max_prefill_seqs:
                break
            if budget_tokens <= 0:
                break
            prompt_len = seq.num_prompt_tokens
            if seq.block_table is None:
                # ---- admission: size + allocate the whole (stored) prompt.
                if not chunked and prompt_len > budget_tokens:
                    break
                if (self.evict is not None and self.evict.enabled
                        and not chunked):
                    blocks, stored = num_required_blocks_after_prune(
                        prompt_len, self.evict, self.block_size,
                        seq.evict_budget)
                else:
                    # Chunked x eviction allocates the FULL prompt
                    # transiently; the final-chunk prune shrinks it.
                    blocks, stored = (-(-prompt_len // bs), prompt_len)
                cached_pages: list[int] = []
                if self.prefix_caching:
                    from .prefix_cache import hash_chain
                    hashes = hash_chain(seq.prompt_token_ids, bs)
                    chain_key = hashes[-1] if hashes else None
                    owner = (self._prefill_chain_owner.get(chain_key)
                             if chain_key is not None else None)
                    if owner is not None and owner is not seq:
                        if (owner.block_table is not None
                                and not owner.prefix_registered
                                and not owner.is_finished()):
                            # Identical prompt mid-prefill: defer one
                            # pass; admit next pass via the cache
                            # (bounded — the owner is actively running).
                            continue
                        del self._prefill_chain_owner[chain_key]
                    # Keep at least the last prompt token uncached so the
                    # first-token logits are computed.
                    usable = min(len(self.allocator.lookup(hashes)),
                                 (prompt_len - 1) // bs)
                    cached_pages = self.allocator.acquire(hashes[:usable])
                fresh = blocks - len(cached_pages)
                if not self.allocator.can_allocate(fresh,
                                                   self.watermark_blocks):
                    if cached_pages:
                        self.allocator.free(cached_pages)
                    break  # FCFS head-of-line: don't starve the head request
                table = BlockTable(bs, self.allocator)
                table.allocate_prompt(stored, prefix_pages=cached_pages)
                seq.block_table = table
                seq.prefill_pos = len(cached_pages) * bs
                if (self.prefix_caching and hashes
                        and len(cached_pages) < (prompt_len - 1) // bs):
                    # This seq computes fresh prompt pages: make it the
                    # owner identical later arrivals defer on.
                    self._prefill_chain_owner.setdefault(hashes[-1], seq)
            else:
                stored = seq.block_table.num_kv_slots

            # ---- emit one chunk (the whole remainder when not chunking).
            start = seq.prefill_pos
            remaining = prompt_len - start
            size = min(remaining, budget_tokens) if chunked else remaining
            if chunked and size < remaining:
                # Non-final chunks end on a page boundary so the next
                # chunk's cache writes stay page-granular.
                size -= size % bs
                if size <= 0:
                    break
            end = start + size
            is_last = end == prompt_len
            budget_tokens -= size
            seq.prefill_pos = end
            out.prefills.append(ScheduledPrefill(
                seq, prompt_len, stored, chunk_start=start, chunk_end=end,
                is_last=is_last,
                prune_on_last=bool(chunked and self.evict is not None
                                   and self.evict.enabled)))
            if is_last:
                seq.status = SequenceStatus.RUNNING
                admitted.append(seq)
            else:
                break  # finish this prompt's chunks before admitting more
        for seq in admitted:
            self.waiting.remove(seq)
            self.running.append(seq)

    def shrink_after_prefill_prune(self, seq: Sequence) -> None:
        """Post-final-chunk accounting for chunked prefill x eviction:
        the device program has compacted each layer's keep set into the
        leading pages; free the rest and adopt the pruned KV length."""
        assert self.evict is not None and self.evict.enabled
        _, stored = num_required_blocks_after_prune(
            seq.num_prompt_tokens, self.evict, self.block_size,
            seq.evict_budget)
        seq.block_table.shrink_to(stored)

    def register_prefix(self, seq: Sequence) -> None:
        """Publish the prompt's full pages for content-addressed reuse
        (called by the engine after the prompt's KV is fully written)."""
        if not self.prefix_caching:
            return
        from .prefix_cache import hash_chain
        table = seq.block_table
        if table is None:
            return
        hashes = hash_chain(seq.prompt_token_ids, self.block_size)
        self.allocator.register(hashes, table.pages[:len(hashes)])
        seq.prefix_registered = True
        if hashes and self._prefill_chain_owner.get(hashes[-1]) is seq:
            del self._prefill_chain_owner[hashes[-1]]

    # ---- decode window planning ----------------------------------------

    def plan_decode_window(self, max_steps: int = 1, resume=None
                           ) -> tuple[list[SeqWindowPlan], int,
                                      list[Sequence]]:
        """Pre-plan up to ``max_steps`` decode steps for every running
        sequence.  Returns (plans, K, preempted).

        The device chains the K steps without host contact; the host applies
        the resulting state transitions afterwards via ``commit_window``.
        New pages are reserved from the allocator here; if the pool runs dry
        mid-window the window truncates at that step, and if even the first
        step cannot be supplied, the latest-arrival sequence is preempted by
        recompute (reference scheduler.py:1572-1625) and planning restarts.

        ``resume``: the ``last_window_sim`` of a still-in-flight window —
        plan the NEXT window from that window's simulated end state instead
        of the committed tables (device-chained windows, zero host sync).
        In resume mode nothing is preempted: the caller falls back to a
        synchronous window on allocation pressure.  After every successful
        plan, ``self.last_window_sim`` holds {request_id: end state}.
        """
        preempted: list[Sequence] = []
        while True:
            seqs = list(self.running)
            if not seqs:
                return [], 0, preempted
            if resume is not None and any(
                    s.request_id not in resume for s in seqs):
                return [], 0, preempted
            k_cap = max_steps
            for seq in seqs:
                mt = seq.params.max_tokens
                pending = (resume[seq.request_id]["pending"]
                           if resume is not None else 0)
                if mt is not None:
                    k_cap = min(k_cap, max(
                        mt - seq.num_output_tokens - pending, 1))
            if 2 < k_cap < max_steps:
                # Bucket partial windows to powers of two: the window
                # program's K is a compile-time shape, and staggered
                # lanes otherwise produce dozens of distinct K values
                # (one fresh XLA compile each — BATCH_r04/r05 whole-run
                # pollution).  Flooring only shortens the window; the
                # remainder rides the next one.
                k_cap = 1 << (k_cap.bit_length() - 1)
            plans, k_done, dry = self._try_plan(seqs, k_cap, resume)
            if k_done > 0:
                return plans, k_done, preempted
            if resume is not None:
                return [], 0, preempted
            assert dry, "empty window without allocation pressure"
            victim = self._pick_preemption_victim()
            self._preempt(victim)
            preempted.append(victim)

    def _try_plan(self, seqs: list[Sequence], k_cap: int, resume=None):
        bs = self.block_size
        # Snapshot the host victim/zero RNG streams: a pool-dry
        # truncation below re-plans from scratch at a bucketed K, and
        # the replay must draw the same victims.
        _vr = getattr(self, "_victim_rng", None)
        _zr = getattr(self, "_zero_rng", None)
        _vr_state = _vr.getstate() if _vr is not None else None
        _zr_state = _zr.getstate() if _zr is not None else None
        sim = []
        steps0 = []
        for seq in seqs:
            if resume is not None:
                st = resume[seq.request_id]
                sim.append({"kv": st["kv"], "pages": list(st["pages"]),
                            "logical": st["logical"]})
                steps0.append(st["steps0"])
            else:
                t = seq.block_table
                sim.append({"kv": t.num_kv_slots, "pages": list(t.pages),
                            "logical": seq.get_len()})
                steps0.append(seq.num_output_tokens)
                assert t.num_kv_slots > 0, "decode before prefill"
        plans = [SeqWindowPlan(seq, [], [], [], [], [], [], [], [])
                 for seq in seqs]
        reserved: list[int] = []
        k_done = 0
        dry = False
        for k in range(k_cap):
            need = sum(1 for st in sim if st["kv"] % bs == 0)
            if not self.allocator.can_allocate(need):
                dry = True
                break
            for seq, st, plan, s0 in zip(seqs, sim, plans, steps0):
                # get_len() already counts this step's input token (its KV
                # is written now); step k advances it by k.
                logical_post = st["logical"] + k
                new_page = -1
                if st["kv"] % bs == 0:
                    new_page = self.allocator.allocate(1)[0]
                    reserved.append(new_page)
                    st["pages"].append(new_page)
                slot = st["pages"][st["kv"] // bs] * bs + st["kv"] % bs
                st["kv"] += 1
                fill = slot // bs if st["kv"] % bs == 0 else -1
                evict_fires = (
                    self.evict is not None
                    and decode_evicts_now(logical_post, self.evict, bs,
                                          seq.evict_budget))
                victim = -1
                if evict_fires:
                    victim = self._host_victim(len(st["pages"]))
                    # Planning mirror: pop a placeholder middle entry (the
                    # identity of an L2-selected victim does not affect any
                    # planned field — only middle-page order).
                    st["pages"].pop(victim if victim > 0 else 1)
                    st["kv"] -= bs
                zero = self._zero_slot(st["pages"], logical_post,
                                       seq.evict_budget)
                # M-RoPE (Qwen2-VL): decode rope positions shift by the
                # per-sequence delta (image spans compress the position
                # space); zero for every other family.
                plan.positions.append(logical_post - 1
                                      + getattr(seq, "mrope_delta", 0))
                plan.slots.append(slot)
                plan.evict.append(evict_fires)
                plan.victims.append(victim)
                plan.zero_slots.append(zero)
                plan.fill_pages.append(fill)
                plan.new_pages.append(new_page)
                plan.steps.append(s0 + k)
            k_done = k + 1
        if dry and k_done > 2 and (k_done & (k_done - 1)) != 0:
            # Pool-dry truncation produced an arbitrary window length —
            # a compile-time shape, so every distinct K under allocation
            # pressure would be a fresh XLA compile (the evict-off
            # offered=64/256 BATCH rows' compile storm).  Re-plan at the
            # pow2 floor: same demand prefix, so the shorter plan cannot
            # go dry earlier.
            self.allocator.free(reserved)
            if _vr_state is not None:
                self._victim_rng.setstate(_vr_state)
            if _zr_state is not None:
                self._zero_rng.setstate(_zr_state)
            return self._try_plan(seqs, 1 << (k_done.bit_length() - 1),
                                  resume)
        if k_done == 0 and reserved:
            self.allocator.free(reserved)
        if k_done > 0:
            pending0 = {s.request_id:
                        (resume[s.request_id]["pending"]
                         if resume is not None else 0) for s in seqs}
            self.last_window_sim = {
                seq.request_id: {
                    "kv": st["kv"], "pages": list(st["pages"]),
                    "logical": st["logical"] + k_done,
                    "steps0": s0 + k_done,
                    "pending": pending0[seq.request_id] + k_done,
                }
                for seq, st, s0 in zip(seqs, sim, steps0)}
        return plans, k_done, dry

    def _host_victim(self, num_pages: int) -> int:
        """Host-side victim table index, or -1 to defer to the device's
        L2 argmin.  streamingLLM always evicts the block after the sink
        (torch_cuda_sdpa.py:1404); random mode reproduces the reference's
        shipped seeded randint (:1502-1515)."""
        ev = self.evict
        assert ev is not None
        if ev.evict_method in ("streamingLLM", "streamingLLM-1"):
            return 1
        if ev.selection == "random":
            rng = getattr(self, "_victim_rng", None)
            if rng is None:
                rng = self._victim_rng = random.Random(ev.random_seed)
            if ev.evict_method == "local":
                hi = min(1 + ev.topk_blocks, num_pages - 1)
            else:
                hi = num_pages - 1
            return rng.randint(1, max(hi - 1, 1))
        return -1

    def _zero_slot(self, pages: list[int], logical_post: int,
                   budget: int = None) -> int:
        """Slot-zeroing side writes (streamingLLM-1 between boundaries,
        torch_cuda_sdpa.py:1395-1401; inverse_key_l2 every step past budget,
        :1444-1454)."""
        ev = self.evict
        if ev is None or not ev.enabled:
            return -1
        if budget is None:
            from ..config import resolve_evict_budget
            budget = resolve_evict_budget(ev, logical_post,
                                          self.block_size)
        if logical_post <= budget or len(pages) <= 2:
            return -1
        bs = self.block_size
        if ev.evict_method == "streamingLLM-1":
            if logical_post % bs != 0:
                return pages[1] * bs + (logical_post % bs - 1)
        elif ev.evict_method == "inverse_key_l2":
            rng = getattr(self, "_zero_rng", None)
            if rng is None:
                rng = self._zero_rng = random.Random(ev.random_seed)
            block_idx = rng.randint(1, len(pages) - 2)
            slot_idx = rng.randint(0, bs - 1)
            return pages[block_idx] * bs + slot_idx
        return -1

    def commit_window(self, plans: list[SeqWindowPlan], k: int,
                      victims_dev) -> None:
        """Apply the window's state transitions to the authoritative block
        tables.  ``victims_dev`` is the device's [K, B] victim output (used
        where the plan deferred selection)."""
        for b, plan in enumerate(plans):
            table = plan.seq.block_table
            for step in range(k):
                if plan.new_pages[step] >= 0:
                    table.pages.append(plan.new_pages[step])
                table.num_kv_slots += 1
                if plan.evict[step]:
                    v = plan.victims[step]
                    if v < 0:
                        v = int(victims_dev[step][b])
                    assert 0 < v < len(table.pages) - 1, \
                        f"victim {v} not a middle block of {len(table.pages)}"
                    page = table.pages.pop(v)
                    self.allocator.free([page])
                    table.num_kv_slots -= self.block_size

    # ---- speculative decoding (reference vllm/spec_decode/, C16) --------

    def plan_spec_step(self, k: int, ngram_max: int, ngram_min: int,
                       proposals=None):
        """Plan one speculative step for all running sequences: proposals
        + slots for the k+1 in-flight KV rows.  Returns (plans,
        preempted).  ``proposals``: optional {request_id: [k tokens]}
        from an external proposer (draft model); missing entries fall
        back to ngram lookup."""
        from ..spec_decode.ngram import propose_ngram
        preempted: list[Sequence] = []
        bs = self.block_size
        while True:
            seqs = list(self.running)
            if not seqs:
                return [], preempted
            need = 0
            for seq in seqs:
                t = seq.block_table
                need += max(0, -(-(t.num_kv_slots + k + 1) // bs)
                            - len(t.pages))
            if self.allocator.can_allocate(need):
                break
            victim = self._pick_preemption_victim()
            self._preempt(victim)
            preempted.append(victim)
        plans = []
        for seq in seqs:
            t = seq.block_table
            kv = t.num_kv_slots
            grow = -(-(kv + k + 1) // bs) - len(t.pages)
            if grow > 0:
                t.pages.extend(self.allocator.allocate(grow))
            slots = [t.pages[(kv + j) // bs] * bs + (kv + j) % bs
                     for j in range(k + 1)]
            if proposals is not None and seq.request_id in proposals:
                props = list(proposals[seq.request_id])[:k]
                props += [props[-1] if props else 0] * (k - len(props))
            else:
                history = seq.prompt_token_ids + seq.output_token_ids
                props = propose_ngram(history, k, ngram_max, ngram_min)
            positions = [seq.get_len() - 1 + j
                         + getattr(seq, "mrope_delta", 0)
                         for j in range(k + 1)]
            plans.append(SpecStepPlan(seq=seq, proposals=props,
                                      slots=slots, positions=positions,
                                      base_kv=kv))
        return plans, preempted

    def commit_spec(self, plan: "SpecStepPlan", n_appended: int,
                    page_scores=None) -> list[int]:
        """Advance the physical KV by the number of inputs whose rows
        became valid (rejected proposals' rows sit past kv_len and will be
        overwritten — free rollback).

        Under paged eviction this also fires the page-boundary evictions
        the decode-window planner would have fired for the ACCEPTED
        tokens — after rollback, so rejected drafts never trigger one
        (spec x eviction superset; the reference asserts the combination
        away, llm_engine.py:1182).  ``page_scores``: host copy of the
        device score array, needed only for L2 selection.  Returns the
        page ids that became full (callers refresh their L2 scores —
        window semantics: eviction decisions precede this step's fill
        updates, exact for num_speculative_tokens + 1 <= block_size,
        which config.verify enforces)."""
        seq = plan.seq
        t = seq.block_table
        bs = self.block_size
        fills = [t.pages[(plan.base_kv + j) // bs]
                 for j in range(n_appended)
                 if (plan.base_kv + j + 1) % bs == 0]
        t.num_kv_slots = plan.base_kv + n_appended
        if (self.evict is not None and self.evict.enabled
                and self.evict.frees_pages):
            logical0 = seq.get_len()
            for j in range(n_appended):
                logical_post = logical0 + j
                if not decode_evicts_now(logical_post, self.evict, bs,
                                         seq.evict_budget):
                    continue
                used = -(-t.num_kv_slots // bs)
                victim = self._host_victim(used)
                if victim < 0:
                    victim = self._l2_victim_host(t.pages, used,
                                                  page_scores)
                assert 0 < victim < used - 1, (victim, used)
                page = t.pages.pop(victim)
                self.allocator.free([page])
                t.num_kv_slots -= bs
        return fills

    def _l2_victim_host(self, pages: list[int], used: int,
                        page_scores) -> int:
        """Host mirror of ops.eviction.select_victims for the spec path:
        argmin page score over the middle table positions ([1, 1+topk)
        for local, [1, used-1) for global), first-min tie-break like
        jnp.argmin."""
        import numpy as np
        assert page_scores is not None, \
            "L2 eviction in a spec step needs the fetched score array"
        ev = self.evict
        hi = used - 1
        if ev.evict_method == "local" and ev.topk_blocks > 0:
            hi = min(1 + ev.topk_blocks, hi)
        cand = np.asarray(page_scores)[np.asarray(pages[1:hi])]
        return 1 + int(np.argmin(cand))

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
        if (self.config.preemption_mode == "swap"
                and self.swap_out_fn is not None
                and self.swap_out_fn(seq)):
            # KV preserved on host: generation state stays intact and the
            # sequence resumes mid-decode (reference PreemptionMode.SWAP).
            seq.status = SequenceStatus.SWAPPED
            seq.num_preemptions += 1
            self.swapped.append(seq)
            self.num_swap_outs += 1
        else:
            # Swap declined (no host space / no hooks): recompute.
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
