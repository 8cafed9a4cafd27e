from . import attention, cache, eviction, rope, sampling

__all__ = ["attention", "cache", "eviction", "rope", "sampling"]
