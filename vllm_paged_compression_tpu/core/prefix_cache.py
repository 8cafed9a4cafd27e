"""Content-addressed prefix caching over the physical page pool.

TPU-native re-design of the reference's prefix-caching allocator
(vllm/core/block/prefix_caching_block.py + the LRU Evictor,
vllm/core/evictor.py:14): full pages are keyed by the hash chain of their
token content; a new prompt reuses the longest cached chain of full pages
and skips recomputing their KV (via the chunked/context prefill program).

Design differences from the reference, deliberate:

- No per-block object graph: a cached page is (page_id, refcount, hash) in
  two dicts.  Physical contents live in the device pool and never move.
- Freeing a sequence decrements refcounts; zero-ref cached pages are NOT
  returned to the free list — they park in an LRU dict (insertion-ordered)
  with contents intact, reusable by hash until the pool needs space, at
  which point the least-recently-parked page is evicted (reference
  LRUEvictor semantics).
- Mutual exclusion with paged eviction is enforced at config level (the
  reference equally never combines them: eviction rewrites page contents,
  which would poison content addressing).
"""

from __future__ import annotations

import hashlib
from typing import Optional

from .block_allocator import BlockAllocator


def _page_hash(prev_hash: Optional[bytes], tokens) -> bytes:
    h = hashlib.blake2b(digest_size=16)
    h.update(prev_hash or b"\x00")
    h.update(b",".join(str(int(t)).encode() for t in tokens))
    return h.digest()


def hash_chain(token_ids, block_size: int) -> list[bytes]:
    """Hashes of every *full* page prefix of a token sequence."""
    out: list[bytes] = []
    prev: Optional[bytes] = None
    for start in range(0, len(token_ids) - block_size + 1, block_size):
        prev = _page_hash(prev, token_ids[start:start + block_size])
        out.append(prev)
    return out


class PrefixCachingAllocator(BlockAllocator):
    """BlockAllocator + content-addressed reuse of full prompt pages.

    API used by the scheduler:
      lookup(hashes)           -> cached page ids for the longest prefix
      acquire(hashes)          -> same, but takes references
      register(hashes, pages)  -> publish freshly written pages
      free(pages)              -> deref cached pages / free fresh ones
    """

    def __init__(self, num_blocks: int):
        super().__init__(num_blocks)
        self._by_hash: dict[bytes, int] = {}
        self._refs: dict[int, int] = {}          # page -> refcount
        self._hash_of: dict[int, bytes] = {}
        self._parked: dict[int, bytes] = {}      # LRU: zero-ref cached pages
        self.hits = 0
        self.queries = 0

    # ---- cache lookup ----------------------------------------------------

    def lookup(self, hashes: list[bytes]) -> list[int]:
        pages = []
        for h in hashes:
            p = self._by_hash.get(h)
            if p is None:
                break
            pages.append(p)
        self.queries += len(hashes)
        self.hits += len(pages)
        return pages

    def acquire(self, hashes: list[bytes]) -> list[int]:
        """Take references on the longest cached prefix; un-parks pages."""
        pages = self.lookup(hashes)
        for p in pages:
            self._refs[p] = self._refs.get(p, 0) + 1
            if p in self._parked:
                del self._parked[p]
                self._allocated.add(p)
        return pages

    def register(self, hashes: list[bytes], pages: list[int]) -> None:
        """Publish freshly written full pages (they must be allocated and
        referenced by the registering sequence's table)."""
        for h, p in zip(hashes, pages):
            if h in self._by_hash:
                continue    # already cached (by a racing identical prompt)
            self._by_hash[h] = p
            self._hash_of[p] = h
            self._refs[p] = self._refs.get(p, 0) + 1

    # ---- allocation with LRU reclaim ------------------------------------

    def _reclaim(self, n: int) -> None:
        while len(self._free) < n and self._parked:
            page, _ = next(iter(self._parked.items()))
            self._evict_parked(page)

    def _evict_parked(self, page: int) -> None:
        h = self._parked.pop(page)
        del self._by_hash[h]
        del self._hash_of[page]
        self._refs.pop(page, None)
        self._free.append(page)

    @property
    def num_free_blocks(self) -> int:
        # Parked pages are reclaimable on demand.
        return len(self._free) + len(self._parked)

    def can_allocate(self, n: int, watermark_blocks: int = 0) -> bool:
        return self.num_free_blocks - n >= watermark_blocks

    def allocate(self, n: int = 1) -> list[int]:
        self._reclaim(n)
        return super().allocate(n)

    def free(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p in self._hash_of and p in self._refs:
                self._refs[p] -= 1
                if self._refs[p] <= 0:
                    # Park with contents intact (LRU tail = oldest).
                    del self._refs[p]
                    self._allocated.discard(p)
                    self._parked[p] = self._hash_of[p]
            else:
                super().free([p])

    def hit_rate(self) -> float:
        return self.hits / self.queries if self.queries else 0.0
