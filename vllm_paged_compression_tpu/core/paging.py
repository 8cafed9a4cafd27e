"""Pure pruned-prompt sizing math.

Re-derivation of the reference's admission/pre-allocation arithmetic:

- ``pruned_prompt_len``        ~ KVCachePruner.get_pruned_length
  (vllm/attention/kvcache_prunner.py:284-326)
- ``prompt_slices``            ~ the first/middle/last slicing used by
  prune_prompt (kvcache_prunner.py:76-165)
- ``num_required_blocks_after_prune``
  ~ get_num_required_blocks_after_prune_promt
  (vllm/core/page_evict_kv_util.py:6-36)

All functions are host-side integer math shared by the scheduler (admission
sizing), the block table (allocation), and the model runner (static shapes for
the jitted prefill).
"""

from __future__ import annotations

from typing import NamedTuple

from ..config import PagedEvictConfig


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class PromptSlices(NamedTuple):
    """Token-index layout of a prompt about to be pruned.

    ``[0, first_end)`` is the sink slice (kept verbatim),
    ``[first_end, middle_end)`` is the prunable middle,
    ``[middle_end, q_len)`` is the tail slice (last full block + remainder,
    kept verbatim).  Matches kvcache_prunner.py:78-87.
    """

    q_len: int
    first_end: int
    middle_end: int

    @property
    def num_middle(self) -> int:
        return self.middle_end - self.first_end

    @property
    def num_last(self) -> int:
        return self.q_len - self.middle_end


def prompt_slices(q_len: int, block_size: int,
                  initial_blocks: int = 1) -> PromptSlices:
    remainder = q_len % block_size
    first_end = initial_blocks * block_size
    middle_end = q_len - block_size - remainder
    return PromptSlices(q_len, first_end, middle_end)


def middle_keep_tokens(evict: PagedEvictConfig, block_size: int,
                       budget: int = None) -> int:
    """Middle tokens retained when pruning fires: budget minus the sink block
    and one tail block (kvcache_prunner.py:94, page_evict_kv_util.py:25-28).
    ``budget`` overrides evict.cache_budget (percentage prune type
    resolves a per-sequence token budget)."""
    if budget is None:
        from ..config import resolve_evict_budget
        budget = resolve_evict_budget(evict, 0, block_size)
    keep = budget - evict.initial_blocks * block_size - block_size
    return max(keep, 0)


def pruned_prompt_len(q_len: int, evict: PagedEvictConfig,
                      block_size: int, budget: int = None) -> int:
    """Length of the stored prompt KV after prefill pruning.

    == q_len when the prompt fits in the budget; otherwise
    sink + min(middle, middle_keep) + tail (kvcache_prunner.py:284-326).
    """
    if budget is None:
        # Percentage mode resolves from the prompt length itself —
        # never treat a percent as a token count.
        from ..config import resolve_evict_budget
        budget = resolve_evict_budget(evict, q_len, block_size)
    if not evict.enabled or q_len <= budget:
        return q_len
    s = prompt_slices(q_len, block_size, evict.initial_blocks)
    keep = min(s.num_middle,
               middle_keep_tokens(evict, block_size, budget))
    return s.first_end + keep + s.num_last


def num_required_blocks_after_prune(q_len: int, evict: PagedEvictConfig,
                                    block_size: int, budget: int = None
                                    ) -> tuple[int, int]:
    """(num_blocks, num_tokens) the block manager must reserve for a prompt.

    Mirrors get_num_required_blocks_after_prune_promt
    (page_evict_kv_util.py:6-36).  NOTE the reference uses a strict ``<`` on
    the budget check here but ``<=`` in the pruner; for q_len == budget both
    agree because middle_keep == num_middle at that point.
    """
    n = pruned_prompt_len(q_len, evict, block_size, budget)
    return cdiv(n, block_size), n


def decode_evicts_now(logical_len: int, evict: PagedEvictConfig,
                      block_size: int, budget: int = None) -> bool:
    """Whether a decode step whose post-append logical length is
    ``logical_len`` triggers a block eviction.

    Reference: seq_len > budget and seq_len % block_size == 0, for the
    page-freeing methods (torch_cuda_sdpa.py:1390-1407, 1489-1515;
    model_runner.py:530-547 pre-decrements seq_kv_len on exactly this
    condition).
    """
    if not evict.enabled or not evict.frees_pages:
        return False
    if budget is None:
        from ..config import resolve_evict_budget
        budget = resolve_evict_budget(evict, logical_len, block_size)
    if logical_len <= budget or logical_len % block_size != 0:
        return False
    freq = getattr(evict, "evict_freq", 1)
    if freq <= 1:
        return True
    # evict_freq N: only every Nth boundary past the budget fires (the
    # first one always does), so the working set grows (N-1)/N pages per
    # generated page instead of staying pinned at the budget — the old
    # README's --evict-freq semantics (README.md:36-45), which the
    # reference's code dropped (vllm/config.py:969).
    nb = (logical_len - budget) // block_size
    return (nb - 1) % freq == 0
