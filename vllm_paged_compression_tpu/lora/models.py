"""LoRA request/config types and the in-graph application math."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

# Projection leaves that accept LoRA deltas (llama-family layout).
LORA_TARGETS = ("wqkv", "wo", "w_gate_up", "w_down")


@dataclass
class LoRAConfig:
    """Engine-level knobs (reference vllm/config.py LoRAConfig)."""

    max_loras: int = 4          # concurrently-resident adapters
    max_lora_rank: int = 16
    targets: tuple = LORA_TARGETS

    def verify(self) -> None:
        if self.max_loras < 1:
            raise ValueError("max_loras must be >= 1")
        if self.max_lora_rank < 1:
            raise ValueError("max_lora_rank must be >= 1")


@dataclass
class LoRARequest:
    """Per-request adapter handle (reference vllm/lora/request.py)."""

    lora_name: str
    lora_int_id: int            # > 0; 0 is reserved for "no adapter"


def lora_delta(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
               idx, scale: jnp.ndarray) -> jnp.ndarray:
    """y_delta = scale[idx] * (x @ A[idx]) @ B[idx].

    a: [S, in, r], b: [S, r, out] (S = max_loras + 1, slot 0 zeros),
    scale: [S].  ``idx`` is a traced scalar (prefill: one sequence) or a
    [T] vector (decode batch: per-token adapter).
    """
    if idx.ndim == 0:
        u = jnp.dot(x, a[idx], preferred_element_type=jnp.float32)
        y = jnp.dot(u.astype(x.dtype), b[idx],
                    preferred_element_type=jnp.float32)
        return (y * scale[idx]).astype(x.dtype)
    a_sel = a[idx]                                  # [T, in, r]
    b_sel = b[idx]                                  # [T, r, out]
    u = jnp.einsum("td,tdr->tr", x.astype(jnp.float32),
                   a_sel.astype(jnp.float32))
    y = jnp.einsum("tr,tro->to", u, b_sel.astype(jnp.float32))
    return (y * scale[idx][:, None]).astype(x.dtype)
