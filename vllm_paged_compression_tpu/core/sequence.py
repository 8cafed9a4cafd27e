"""Request/sequence lifecycle state.

Host-side analog of the reference's Sequence/SequenceGroup machinery
(vllm/sequence.py).  One request == one sequence in round 1 (the fork's
eviction feedback loop also assumes 1 seq/group, SURVEY F9); parallel
sampling (n>1) forks sequences that share a prompt but each own a block
table.
"""

from __future__ import annotations

import enum
import time
from typing import Optional

from ..sampling_params import SamplingParams
from .block_table import BlockTable


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH = enum.auto()
    FINISHED_ABORTED = enum.auto()

    @property
    def is_finished(self) -> bool:
        return self in (SequenceStatus.FINISHED_STOPPED,
                        SequenceStatus.FINISHED_LENGTH,
                        SequenceStatus.FINISHED_ABORTED)


FINISH_REASON = {
    SequenceStatus.FINISHED_STOPPED: "stop",
    SequenceStatus.FINISHED_LENGTH: "length",
    SequenceStatus.FINISHED_ABORTED: "abort",
}


class Sequence:
    def __init__(self, request_id: str, prompt_token_ids: list[int],
                 sampling_params: SamplingParams,
                 arrival_time: Optional[float] = None,
                 priority: int = 0,
                 eos_token_id: Optional[int] = None):
        self.request_id = request_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.output_token_ids: list[int] = []
        # Generated tokens folded into prompt_token_ids by
        # preemption-recompute (still part of the user-visible output).
        self.folded_output_token_ids: list[int] = []
        self.params = sampling_params
        self.arrival_time = arrival_time if arrival_time is not None \
            else time.monotonic()
        self.priority = priority
        self.eos_token_id = eos_token_id
        self.status = SequenceStatus.WAITING
        self.block_table: Optional[BlockTable] = None
        # Prompt tokens whose KV is already in cache (cached prefix +
        # completed prefill chunks); prompt positions below this are not
        # recomputed.
        self.prefill_pos = 0
        # Prompt pages published to the prefix cache (register_prefix);
        # siblings deferred on this sequence (parallel sampling) admit
        # once it flips.
        self.prefix_registered = False
        # Per-sequence eviction token budget (percentage prune type);
        # None = use the engine-wide PagedEvictConfig.cache_budget.
        self.evict_budget = None
        # LoRA adapter device slot (0 = no adapter).
        self.lora_slot = 0
        # Multimodal: pixel tensor [3, H, W] and the contiguous
        # placeholder span start in the (expanded) prompt.
        self.pixel_values = None
        self.mm_feats = None
        self.mm_start = -1
        self.mrope_positions = None   # [3, L] prompt streams (Qwen2-VL)
        self.mrope_delta = 0          # decode position shift (M-RoPE)
        # Prompt adapter: device slot + virtual-prefix length.
        self.pa_slot = 0
        self.pa_len = 0
        # Per-generated-token {token_id: logprob} dicts (when
        # params.logprobs is set) + cumulative chosen-token logprob.
        self.logprobs: list[dict] = []
        self.cumulative_logprob = 0.0
        # Timing for metrics (TTFT/TPOT, reference engine/metrics.py).
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None
        self.num_preemptions = 0
        # Incremental detokenization state (reference
        # transformers_utils/detokenizer.py): output_text grows by the
        # newly-decoded delta each step; the two offsets index into
        # output_token_ids (prefix = start of the re-decode window,
        # read = tokens already emitted as text).
        self.output_text = ""
        self._detok_prefix_len = 0
        self._detok_read_len = 0
        # Preemption-by-swap state: host-side KV payload (set by the
        # engine's swap-out hook) and the physical KV length to restore.
        self.swap_payload = None
        self.swapped_kv_len = 0
        # Guided decoding: per-request FSM cursor (guided/fsm.GuidedState);
        # advanced on every appended token.
        self.guided = None

    # ---- lengths --------------------------------------------------------

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        """TOTAL generated tokens, including any folded into the prompt
        by preemption-recompute — max_tokens/min_tokens accounting and
        sampling-step counters must survive preemption."""
        return len(self.folded_output_token_ids) + len(self.output_token_ids)

    @property
    def all_output_token_ids(self) -> list:
        """User-visible output: tokens generated before any
        preemption-recompute (folded into the prompt for replay) plus
        the post-resume tail.  ``output_token_ids`` alone is the
        physical view (tokens NOT yet represented in prompt_token_ids)."""
        if self.folded_output_token_ids:
            return self.folded_output_token_ids + self.output_token_ids
        return self.output_token_ids

    def get_len(self) -> int:
        """Logical length (prompt + generated)."""
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    @property
    def kv_len(self) -> int:
        """Physical KV slots currently held (shrinks under eviction)."""
        assert self.block_table is not None
        return self.block_table.num_kv_slots

    # ---- lifecycle ------------------------------------------------------

    def append_token(self, token_id: int) -> None:
        self.output_token_ids.append(token_id)
        if self.first_token_time is None:
            self.first_token_time = time.monotonic()
        if self.guided is not None:
            self.guided.advance(token_id)

    def reset_for_recompute(self) -> None:
        """Preemption by recompute: drop the KV, fold generated tokens into
        the prompt so the next prefill replays everything (reference
        scheduler preemption, core/scheduler.py:1572-1625).

        The folded tokens stay user-visible via folded_output_token_ids
        (without this, a preempted request silently lost its
        pre-preemption output and restarted its max_tokens budget —
        caught by the chain-recall harness's truncated outputs)."""
        if self.block_table is not None:
            self.block_table.free()
            self.block_table = None
        self.folded_output_token_ids = (self.folded_output_token_ids
                                        + self.output_token_ids)
        self.prompt_token_ids = self.prompt_token_ids + self.output_token_ids
        self.output_token_ids = []
        # Incremental detokenizer offsets index output_token_ids, which
        # just emptied; output_text keeps everything already emitted and
        # future deltas decode from the fresh tail.
        self._detok_prefix_len = 0
        self._detok_read_len = 0
        self.prefill_pos = 0
        self.status = SequenceStatus.PREEMPTED
        self.num_preemptions += 1

    def is_finished(self) -> bool:
        return self.status.is_finished
