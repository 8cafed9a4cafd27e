"""Offline checkpoint loading: HF config.json + safetensors shards.

Reference analog: vllm/model_executor/model_loader/ (safetensors path only;
GGUF/bitsandbytes/tensorizer are out of scope for a zero-egress TPU image).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np


def load_hf_config(model_path: str) -> dict:
    with open(os.path.join(model_path, "config.json")) as f:
        return json.load(f)


def iter_safetensors(model_path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, array) from every *.safetensors shard in the directory."""
    from safetensors import safe_open
    files = sorted(f for f in os.listdir(model_path)
                   if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors shards in {model_path}")
    for fname in files:
        with safe_open(os.path.join(model_path, fname), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_state_dict(model_path: str) -> dict[str, np.ndarray]:
    return dict(iter_safetensors(model_path))


def torch_state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    """Convert a torch state dict (CPU) to numpy — used by parity tests that
    instantiate a random-weight HF model without any checkpoint files."""
    out = {}
    for name, tensor in state_dict.items():
        out[name] = tensor.detach().to("cpu").float().numpy()
    return out
