"""Prompt adapters: per-request learned soft-prompt prefixes.

Reference analog: vllm/prompt_adapter/ (PEFT prompt-tuning adapters whose
virtual-token embeddings are prepended to the prompt, with worker-side
slot management).  TPU-native re-design mirrors the LoRA manager
(lora/manager.py): one preallocated device table
``params["prompt_adapters"]`` of shape [slots, max_tokens, hidden] so
adapter swaps are slot writes and never retrace the prefill programs.
A request with an adapter gets ``n`` placeholder tokens prepended to its
prompt; the prefill program overwrites those embedding rows with the
adapter's virtual-token embeddings (masked static-width splice).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..utils import init_logger

logger = init_logger(__name__)


@dataclass
class PromptAdapterConfig:
    max_prompt_adapters: int = 4
    max_prompt_adapter_tokens: int = 16

    def verify(self) -> None:
        if self.max_prompt_adapters < 1:
            raise ValueError("max_prompt_adapters must be >= 1")
        if self.max_prompt_adapter_tokens < 1:
            raise ValueError("max_prompt_adapter_tokens must be >= 1")


@dataclass
class PromptAdapterRequest:
    prompt_adapter_int_id: int


def empty_prompt_adapter_params(arch, cfg: PromptAdapterConfig,
                                dtype=jnp.bfloat16) -> jnp.ndarray:
    """[slots+1, max_tokens, hidden]; slot 0 is the zero adapter."""
    return jnp.zeros((cfg.max_prompt_adapters + 1,
                      cfg.max_prompt_adapter_tokens, arch.hidden_size),
                     dtype)


class PromptAdapterManager:
    """adapter_int_id -> device slot; loads embedding tables into slots."""

    def __init__(self, arch, cfg: PromptAdapterConfig, dtype=jnp.bfloat16):
        self.arch = arch
        self.cfg = cfg
        self.dtype = dtype
        self._slot_of: dict[int, int] = {}
        self._len_of: dict[int, int] = {}
        self._free = list(range(cfg.max_prompt_adapters, 0, -1))

    def slot_of(self, adapter_id: Optional[int]) -> tuple[int, int]:
        if not adapter_id:
            return 0, 0
        return self._slot_of[adapter_id], self._len_of[adapter_id]

    def add_adapter(self, table: jnp.ndarray, adapter_id: int,
                    embeddings: np.ndarray) -> jnp.ndarray:
        """embeddings [n, hidden] with n <= max_prompt_adapter_tokens."""
        if adapter_id in self._slot_of:
            return table
        if not self._free:
            raise RuntimeError("no free prompt-adapter slots "
                               f"(max {self.cfg.max_prompt_adapters})")
        n, d = embeddings.shape
        if n > self.cfg.max_prompt_adapter_tokens:
            raise ValueError(
                f"adapter has {n} virtual tokens > "
                f"max_prompt_adapter_tokens "
                f"{self.cfg.max_prompt_adapter_tokens}")
        if d != self.arch.hidden_size:
            raise ValueError(f"adapter hidden {d} != model hidden "
                             f"{self.arch.hidden_size}")
        slot = self._free.pop()
        self._slot_of[adapter_id] = slot
        self._len_of[adapter_id] = n
        row = np.zeros((self.cfg.max_prompt_adapter_tokens, d), np.float32)
        row[:n] = embeddings
        logger.info("prompt adapter %d -> slot %d (%d tokens)",
                    adapter_id, slot, n)
        return table.at[slot].set(jnp.asarray(row, table.dtype))

    def remove_adapter(self, table: jnp.ndarray,
                       adapter_id: int) -> jnp.ndarray:
        slot = self._slot_of.pop(adapter_id, None)
        self._len_of.pop(adapter_id, None)
        if slot is None:
            return table
        self._free.append(slot)
        return table.at[slot].set(0.0)
