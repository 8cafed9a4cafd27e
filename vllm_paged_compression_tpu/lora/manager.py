"""Adapter slot management: host registry + device slot writes.

Reference analog: vllm/lora/worker_manager.py + models.py (LRU adapter
slots, deferred loading).  Here the device arrays are preallocated inside
``params["lora"]`` so activation/deactivation never retraces the step
programs — an adapter swap is a handful of ``.at[slot].set`` writes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import init_logger
from .models import LoRAConfig, LORA_TARGETS

logger = init_logger(__name__)


def empty_lora_params(arch, cfg: LoRAConfig, dtype=jnp.bfloat16) -> dict:
    """Preallocated adapter stacks: [L, S, in, r] / [L, S, r, out] per
    target projection (S = max_loras + 1; slot 0 = zero adapter)."""
    L = arch.num_layers
    S = cfg.max_loras + 1
    r = cfg.max_lora_rank
    qkv_out = (arch.num_heads + 2 * arch.num_kv_heads) * arch.head_dim
    dims = {
        "wqkv": (arch.hidden_size, qkv_out),
        "wo": (arch.num_heads * arch.head_dim, arch.hidden_size),
        "w_gate_up": (arch.hidden_size, 2 * arch.intermediate_size),
        "w_down": (arch.intermediate_size, arch.hidden_size),
    }
    out = {}
    for name in cfg.targets:
        din, dout = dims[name]
        out[f"A_{name}"] = jnp.zeros((L, S, din, r), dtype)
        out[f"B_{name}"] = jnp.zeros((L, S, r, dout), dtype)
    out["scale"] = jnp.zeros((S,), jnp.float32)
    return out


class LoRAManager:
    """lora_int_id -> device slot; loads adapter weight dicts into slots."""

    def __init__(self, arch, cfg: LoRAConfig, dtype=jnp.bfloat16):
        self.arch = arch
        self.cfg = cfg
        self.dtype = dtype
        self._slot_of: dict[int, int] = {}
        self._free = list(range(cfg.max_loras, 0, -1))  # slots 1..max

    def slot_of(self, lora_int_id: Optional[int]) -> int:
        if not lora_int_id:
            return 0
        return self._slot_of[lora_int_id]

    def add_adapter(self, lora_params: dict, lora_int_id: int,
                    tensors: dict, scaling: float) -> dict:
        """Write an adapter into a free slot.

        ``tensors``: {target: (A [L, in, r], B [L, r, out])} numpy arrays
        with r <= max_lora_rank (zero-padded to the slot rank).  Returns
        the updated lora params tree.
        """
        if lora_int_id in self._slot_of:
            return lora_params
        if not self._free:
            raise RuntimeError(
                f"all {self.cfg.max_loras} LoRA slots in use "
                "(evict one with remove_adapter)")
        slot = self._free.pop()
        self._slot_of[lora_int_id] = slot
        rmax = self.cfg.max_lora_rank
        for name, (a, b) in tensors.items():
            a = np.asarray(a)
            b = np.asarray(b)
            r = a.shape[-1]
            if r > rmax:
                raise ValueError(f"adapter rank {r} > max_lora_rank {rmax}")
            if r < rmax:
                a = np.pad(a, ((0, 0), (0, 0), (0, rmax - r)))
                b = np.pad(b, ((0, 0), (0, rmax - r), (0, 0)))
            lora_params = dict(lora_params)
            lora_params[f"A_{name}"] = lora_params[f"A_{name}"].at[
                :, slot].set(jnp.asarray(a, self.dtype))
            lora_params[f"B_{name}"] = lora_params[f"B_{name}"].at[
                :, slot].set(jnp.asarray(b, self.dtype))
        lora_params = dict(lora_params)
        lora_params["scale"] = lora_params["scale"].at[slot].set(scaling)
        logger.info("LoRA adapter %d loaded into slot %d", lora_int_id, slot)
        return lora_params

    def remove_adapter(self, lora_params: dict, lora_int_id: int) -> dict:
        slot = self._slot_of.pop(lora_int_id, None)
        if slot is None:
            return lora_params
        self._free.append(slot)
        lora_params = dict(lora_params)
        lora_params["scale"] = lora_params["scale"].at[slot].set(0.0)
        return lora_params
