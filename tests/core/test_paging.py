"""Pruned-prompt sizing math vs. hand-computed reference values.

Oracle values follow KVCachePruner.get_pruned_length
(reference vllm/attention/kvcache_prunner.py:284-326) and
get_num_required_blocks_after_prune_promt (vllm/core/page_evict_kv_util.py:6-36).
"""

import pytest

from vllm_paged_compression_tpu.config import PagedEvictConfig
from vllm_paged_compression_tpu.core.paging import (
    decode_evicts_now, num_required_blocks_after_prune, prompt_slices,
    pruned_prompt_len)


def make_evict(method="streamingLLM", budget=64, topk=3):
    return PagedEvictConfig(enabled=True, evict_method=method,
                            cache_budget=budget,
                            topk_blocks=topk if method == "local" else -1)


class TestPromptSlices:
    def test_exact_block_multiple(self):
        s = prompt_slices(q_len=128, block_size=16)
        assert s.first_end == 16
        # tail = one whole block (remainder 0)
        assert s.middle_end == 128 - 16
        assert s.num_middle == 96
        assert s.num_last == 16

    def test_with_remainder(self):
        s = prompt_slices(q_len=100, block_size=16)  # remainder 4
        assert s.first_end == 16
        assert s.middle_end == 100 - 16 - 4  # last block + remainder kept
        assert s.num_last == 20


class TestPrunedPromptLen:
    @pytest.mark.parametrize("method", ["streamingLLM", "streamingLLM-1",
                                        "local", "global", "inverse_key_l2"])
    def test_under_budget_unchanged(self, method):
        ev = make_evict(method, budget=64)
        assert pruned_prompt_len(50, ev, 16) == 50
        assert pruned_prompt_len(64, ev, 16) == 64

    def test_over_budget_exact_blocks(self):
        # q_len 128, budget 64, bs 16: sink 16 + middle_keep (64-32=32) + tail 16
        ev = make_evict(budget=64)
        assert pruned_prompt_len(128, ev, 16) == 16 + 32 + 16

    def test_over_budget_with_remainder(self):
        # q_len 100, budget 64, bs 16: sink 16 + keep 32 + tail 20 = 68
        ev = make_evict(budget=64)
        assert pruned_prompt_len(100, ev, 16) == 68

    def test_middle_smaller_than_keep(self):
        # q_len 80 > budget 64; middle = 80-16-16 = 48 > keep 32 -> prunes
        ev = make_evict(budget=64)
        assert pruned_prompt_len(80, ev, 16) == 16 + 32 + 16
        # q_len 65: remainder 1, middle = 65-16-16-1 = 32 == keep -> no change
        assert pruned_prompt_len(65, ev, 16) == 65

    def test_result_bounded_by_budget_plus_tail(self):
        ev = make_evict(budget=64)
        for q in range(65, 400):
            n = pruned_prompt_len(q, ev, 16)
            # stored <= budget + remainder (tail keeps block + remainder)
            assert n <= 64 + 16
            assert n >= 48


class TestRequiredBlocks:
    def test_matches_pruned_len(self):
        ev = make_evict(budget=64)
        blocks, tokens = num_required_blocks_after_prune(128, ev, 16)
        assert tokens == 64
        assert blocks == 4

    def test_remainder_rounds_up(self):
        ev = make_evict(budget=64)
        blocks, tokens = num_required_blocks_after_prune(100, ev, 16)
        assert tokens == 68
        assert blocks == 5


class TestDecodeEvictsNow:
    def test_fires_only_past_budget_on_boundary(self):
        ev = make_evict(budget=64)
        assert not decode_evicts_now(64, ev, 16)   # == budget: no
        assert not decode_evicts_now(70, ev, 16)   # off-boundary: no
        assert decode_evicts_now(80, ev, 16)       # > budget, boundary: yes
        assert decode_evicts_now(96, ev, 16)

    def test_evict_freq_skips_boundaries(self):
        # evict_freq N: the first boundary past the budget fires, then
        # every Nth — the working set grows (N-1)/N pages per page.
        ev = make_evict(budget=64)
        ev.evict_freq = 2
        assert decode_evicts_now(80, ev, 16)        # boundary 1: fires
        assert not decode_evicts_now(96, ev, 16)    # boundary 2: skipped
        assert decode_evicts_now(112, ev, 16)       # boundary 3: fires
        assert not decode_evicts_now(128, ev, 16)
        ev3 = make_evict(budget=64)
        ev3.evict_freq = 3
        assert decode_evicts_now(80, ev3, 16)
        assert not decode_evicts_now(96, ev3, 16)
        assert not decode_evicts_now(112, ev3, 16)
        assert decode_evicts_now(128, ev3, 16)

    def test_evict_freq_validation(self):
        import pytest
        ev = make_evict(budget=64)
        ev.evict_freq = 0
        with pytest.raises(ValueError, match="evict_freq"):
            ev.verify(16)

    def test_inverse_key_l2_never_frees(self):
        ev = make_evict("inverse_key_l2", budget=64)
        assert not decode_evicts_now(80, ev, 16)

    def test_disabled(self):
        ev = PagedEvictConfig(enabled=False)
        assert not decode_evicts_now(8000, ev, 16)
