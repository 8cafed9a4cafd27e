"""Shared small utilities."""

from .logger import init_logger

__all__ = ["init_logger", "cdiv", "round_up"]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_bucket(x: int, buckets) -> int:
    """Smallest bucket >= x; buckets must be sorted ascending."""
    for b in buckets:
        if b >= x:
            return b
    raise ValueError(f"{x} exceeds largest bucket {buckets[-1]}")
