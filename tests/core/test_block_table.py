"""Block allocator + block table unit tests (reference analogs:
tests/core/block/test_block_table.py, test_naive_block.py)."""

import pytest

from vllm_paged_compression_tpu.core.block_allocator import BlockAllocator
from vllm_paged_compression_tpu.core.block_table import BlockTable


class TestBlockAllocator:
    def test_alloc_free_roundtrip(self):
        a = BlockAllocator(8)
        pages = a.allocate(5)
        assert len(set(pages)) == 5
        assert a.num_free_blocks == 3
        a.free(pages[:2])
        assert a.num_free_blocks == 5
        assert a.usage() == 3 / 8

    def test_exhaustion_raises(self):
        a = BlockAllocator(2)
        a.allocate(2)
        with pytest.raises(RuntimeError):
            a.allocate(1)

    def test_double_free_raises(self):
        a = BlockAllocator(2)
        p = a.allocate(1)
        a.free(p)
        with pytest.raises(ValueError):
            a.free(p)

    def test_watermark(self):
        a = BlockAllocator(10)
        assert a.can_allocate(9, watermark_blocks=1)
        assert not a.can_allocate(10, watermark_blocks=1)


class TestBlockTable:
    def test_prompt_allocation_rounds_up(self):
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=10)
        assert t.num_pages == 3
        assert t.num_kv_slots == 10

    def test_append_slots_and_boundary_growth(self):
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=7)  # 2 pages, 1 free slot in last
        assert t.blocks_needed_for_append() == 0
        s = t.append_slot()
        assert s == t.pages[1] * 4 + 3
        assert t.num_kv_slots == 8
        # Next append crosses a block boundary.
        assert t.blocks_needed_for_append() == 1
        s = t.append_slot()
        assert t.num_pages == 3
        assert s == t.pages[2] * 4 + 0

    def test_free_pruned_block_splices_and_returns_page(self):
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=16)  # 4 pages
        pages_before = list(t.pages)
        free_before = a.num_free_blocks
        victim = t.free_pruned_block(1)
        assert victim == pages_before[1]
        assert t.pages == [pages_before[0]] + pages_before[2:]
        assert t.num_kv_slots == 12
        assert a.num_free_blocks == free_before + 1

    def test_free_pruned_block_rejects_sink_and_last(self):
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=16)
        with pytest.raises(AssertionError):
            t.free_pruned_block(0)
        with pytest.raises(AssertionError):
            t.free_pruned_block(3)

    def test_release_returns_all(self):
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=16)
        t.free()
        assert a.num_free_blocks == 16
        assert t.num_pages == 0

    def test_eviction_then_append_reuses_boundary_phase(self):
        """After evicting a middle block, physical len stays congruent to the
        logical len mod block_size, so appends keep landing at the right
        offsets (fork's dual-counter behavior, block_table.py:48-68)."""
        a = BlockAllocator(16)
        t = BlockTable(block_size=4, allocator=a)
        t.allocate_prompt(num_stored_tokens=12)  # 3 full pages
        t.append_slot()  # grows page 4, kv=13
        t.free_pruned_block(1)  # kv=9
        assert t.num_kv_slots == 9
        s = t.append_slot()  # offset 9 % 4 = 1 in table idx 2 (old page 4)
        assert s == t.pages[2] * 4 + 1
