"""Per-sequence logical→physical page table with dual token counters.

TPU-native equivalent of the reference BlockTable
(vllm/core/block/block_table.py) including the fork's eviction extensions:

- the physical-slot counter ``num_kv_slots`` (reference ``_num_cached_slots``,
  block_table.py:48-68,119-127); the *logical* token count (reference
  ``_num_full_slots``) lives on ``Sequence`` — splitting the dual counters
  across the two owners removes the reference's cross-object syncing.
- ``free_pruned_block`` splices one page out of the table and returns it
  (reference free_prunned_blocks, block_manager.py:540-543 +
  block_table.py:462-466 + BlockList.remove, block/common.py:292).
- prompt allocation sized by the *pruned* length
  (block_table.py:317-323).

Unlike the reference there is no per-block object graph or copy-on-write
machinery here: a table is a plain list of page ids, and physical page
contents never move on eviction — the paged-attention kernel reads through
the table, so removing an entry *is* the compaction.
"""

from __future__ import annotations

from .block_allocator import BlockAllocator
from .paging import cdiv


class BlockTable:
    def __init__(self, block_size: int, allocator: BlockAllocator):
        self.block_size = block_size
        self._allocator = allocator
        self.pages: list[int] = []
        # Physical KV slots occupied (shrinks on eviction).  The logical
        # token count is Sequence.get_len().
        self.num_kv_slots = 0

    # ---- allocation -----------------------------------------------------

    def allocate_prompt(self, num_stored_tokens: int,
                        prefix_pages=None) -> None:
        """Reserve pages for a (possibly pruned) prompt.

        ``num_stored_tokens`` is the pruned KV length actually written
        (reference block_table.py:317-323 truncates token_ids to the pruned
        length before allocating).  ``prefix_pages`` are already-referenced
        cached pages adopted at the front (prefix caching).
        """
        assert not self.pages, "prompt already allocated"
        prefix = list(prefix_pages) if prefix_pages else []
        n = cdiv(num_stored_tokens, self.block_size) - len(prefix)
        assert n >= 0, "cached prefix longer than the stored prompt"
        self.pages = prefix + self._allocator.allocate(n)
        self.num_kv_slots = num_stored_tokens

    def append_slot(self) -> int:
        """Claim the slot for one new decode token; grows the table by one
        page at block boundaries.  Returns the flat slot id
        (page_id * block_size + offset) for the cache-write scatter
        (reference slot mapping, torch_cuda_sdpa.py:565-598)."""
        offset = self.num_kv_slots % self.block_size
        if offset == 0:
            self.pages.append(self._allocator.allocate(1)[0])
        slot = self.pages[self.num_kv_slots // self.block_size] \
            * self.block_size + offset
        self.num_kv_slots += 1
        return slot

    def blocks_needed_for_append(self) -> int:
        return 1 if self.num_kv_slots % self.block_size == 0 else 0

    # ---- eviction -------------------------------------------------------

    def free_pruned_block(self, table_idx: int) -> int:
        """Remove the page at position ``table_idx`` (a *table* index, not a
        page id), return it to the allocator, and shrink the physical slot
        count by one block.  The pages after it shift left — exactly the
        reference's _create_updated_block_tables (torch_cuda_sdpa.py:1562-1586)
        made authoritative."""
        assert 0 < table_idx < len(self.pages) - 1, \
            f"victim must be a middle block, got {table_idx} of {len(self.pages)}"
        page = self.pages.pop(table_idx)
        self._allocator.free([page])
        self.num_kv_slots -= self.block_size
        return page

    def shrink_to(self, num_stored_tokens: int) -> None:
        """Free every page beyond ceil(stored/bs) and reset the physical
        slot count — the block-accounting half of the final-chunk prune
        (chunked prefill x eviction: chunks write full pages, the last
        chunk compacts the keep set into the leading pages)."""
        keep = cdiv(num_stored_tokens, self.block_size)
        assert keep <= len(self.pages), (keep, len(self.pages))
        if keep < len(self.pages):
            self._allocator.free(self.pages[keep:])
            self.pages = self.pages[:keep]
        self.num_kv_slots = num_stored_tokens

    # ---- release --------------------------------------------------------

    def free(self) -> None:
        if self.pages:
            self._allocator.free(self.pages)
        self.pages = []
        self.num_kv_slots = 0

    # ---- views ----------------------------------------------------------

    @property
    def num_pages(self) -> int:
        return len(self.pages)
