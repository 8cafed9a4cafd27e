"""Physical KV-page allocator.

TPU-native replacement for the reference's allocator stack
(vllm/core/block/naive_block.py, cpu_gpu_block_allocator.py).  On TPU the
physical pages live inside one preallocated device array per layer, so the
allocator is pure host bookkeeping: a free list of page indices.  There is no
CPU swap tier in round 1 (preemption is by recompute, which the reference also
defaults to for eviction workloads); the interface leaves room for one.
"""

from __future__ import annotations


class BlockAllocator:
    """O(1) alloc/free over a fixed pool of physical page ids [0, num_blocks).

    Page id 0 is a valid page like any other; padded entries in device block
    tables use index 0 with a length mask, never a sentinel, so gathers stay
    in-bounds (XLA clamps, but we never rely on it).
    """

    def __init__(self, num_blocks: int):
        if num_blocks <= 0:
            raise ValueError("num_blocks must be positive")
        self.num_blocks = num_blocks
        # LIFO free list: reusing recently freed pages keeps the working set
        # of the device array hot.
        self._free: list[int] = list(range(num_blocks - 1, -1, -1))
        self._allocated: set[int] = set()

    @property
    def num_free_blocks(self) -> int:
        return len(self._free)

    @property
    def num_allocated_blocks(self) -> int:
        return len(self._allocated)

    def can_allocate(self, n: int, watermark_blocks: int = 0) -> bool:
        return len(self._free) - n >= watermark_blocks

    def allocate(self, n: int = 1) -> list[int]:
        if n > len(self._free):
            raise RuntimeError(
                f"Out of KV pages: requested {n}, free {len(self._free)}")
        pages = [self._free.pop() for _ in range(n)]
        self._allocated.update(pages)
        return pages

    def free(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p not in self._allocated:
                raise ValueError(f"Double free of page {p}")
            self._allocated.remove(p)
            self._free.append(p)

    def usage(self) -> float:
        return len(self._allocated) / self.num_blocks
