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


# ---- quantized checkpoint formats (reference: the dequant halves of
# vllm/model_executor/layers/quantization/{awq,gptq,fp8}.py — here the
# weights are dequantized at load time into the standard HF layout and can
# then be re-quantized to the engine's int8 scheme via quantization="int8").


def _unpack_int4(packed: np.ndarray, axis: int) -> np.ndarray:
    """Unpack 8 4-bit values from each int32 along ``axis`` (low nibble
    first — both AWQ and GPTQ pack little-endian within the int32)."""
    p = packed.astype(np.uint32)[..., None]
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    nibbles = (p >> shifts) & 0xF                    # [..., 8]
    nibbles = np.moveaxis(nibbles, -1, axis + 1 if axis >= 0
                          else len(packed.shape) + axis + 1)
    shape = list(packed.shape)
    shape[axis] *= 8
    return nibbles.reshape(shape).astype(np.int32)


# AutoAWQ packs output channels within an int32 in the order
# [0, 2, 4, 6, 1, 3, 5, 7]; this is its inverse (AWQ_REVERSE_ORDER).
_AWQ_REVERSE = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def _dequant_awq(qweight, qzeros, scales) -> np.ndarray:
    """AWQ GEMM format: qweight int32 [in, out/8], qzeros int32
    [in/g, out/8], scales [in/g, out].  Returns fp32 [out, in] (HF
    layout)."""
    def unpack_out(x):
        n = _unpack_int4(x, axis=-1)            # [..., out] packed order
        n = n.reshape(*x.shape, 8)[..., _AWQ_REVERSE]
        return n.reshape(x.shape[0], -1)
    iw = unpack_out(qweight)                    # [in, out]
    iz = unpack_out(qzeros)                     # [in/g, out]
    group = qweight.shape[0] // qzeros.shape[0]
    zeros = np.repeat(iz, group, axis=0)        # [in, out]
    s = np.repeat(np.asarray(scales, np.float32), group, axis=0)
    return ((iw - zeros) * s).T.astype(np.float32)


def _dequant_gptq(qweight, qzeros, scales, g_idx=None,
                  sym_no_offset: bool = False) -> np.ndarray:
    """GPTQ format: qweight int32 [in/8, out] (8 input rows per int32),
    qzeros int32 [in/g, out/8], scales [in/g, out], optional g_idx [in]
    (act-order).  GPTQ v1 stores zeros offset by -1 (the dequant adds 1);
    gptq_v2 checkpoints don't (``sym_no_offset``).  Returns fp32 [out, in].
    """
    iw = _unpack_int4(qweight, axis=0)          # [in, out]
    iz = _unpack_int4(qzeros, axis=-1)          # [in/g, out]
    if not sym_no_offset:
        iz = iz + 1
    in_features = iw.shape[0]
    if g_idx is None:
        group = in_features // qzeros.shape[0]
        g_idx = np.arange(in_features) // group
    g_idx = np.asarray(g_idx, np.int64)
    s = np.asarray(scales, np.float32)[g_idx]   # [in, out]
    z = iz[g_idx]                               # [in, out]
    return ((iw - z) * s).T.astype(np.float32)


def dequantize_checkpoint(tensors: dict, quant_config: dict) -> dict:
    """Rewrite an AWQ / GPTQ / fp8 checkpoint into plain fp32 ``*.weight``
    tensors in the standard HF layout; all other entries pass through."""
    method = (quant_config.get("quant_method") or "").lower()
    if method in ("awq", "gptq"):
        bits = quant_config.get("bits", 4)
        if bits != 4:
            raise NotImplementedError(f"{method} with bits={bits}")
        sym_no_offset = (quant_config.get("checkpoint_format") == "gptq_v2")
        out = {}
        for name, v in tensors.items():
            if name.endswith(".qweight"):
                base = name[:-len(".qweight")]
                if method == "awq":
                    w = _dequant_awq(v, tensors[base + ".qzeros"],
                                     tensors[base + ".scales"])
                else:
                    w = _dequant_gptq(v, tensors[base + ".qzeros"],
                                      tensors[base + ".scales"],
                                      tensors.get(base + ".g_idx"),
                                      sym_no_offset)
                out[base + ".weight"] = w
            elif name.endswith((".qzeros", ".scales", ".g_idx")):
                continue
            else:
                out[name] = v
        return out
    if method in ("fp8", "compressed-tensors", "compressed_tensors"):
        # fp8 (vllm layers/quantization/fp8.py) and compressed-tensors
        # int8/fp8 weight schemes (layers/quantization/
        # compressed_tensors/): weights ship as .weight (int8 or
        # float8) + .weight_scale (per-tensor scalar or per-output-
        # channel); symmetric, so dequant is a multiply.  Activation /
        # kv-cache scales (.input_scale, .k_scale, .v_scale) are
        # calibration hints — dropped (we re-derive scales online).
        fmt = (quant_config.get("format") or "").lower()
        if "pack" in fmt:
            raise NotImplementedError(
                "compressed-tensors pack-quantized (int4) checkpoints")
        out = {}
        drop = (".weight_scale", ".input_scale", ".weight_zero_point",
                ".input_zero_point", ".k_scale", ".v_scale",
                ".output_scale")
        for name, v in tensors.items():
            if name.endswith(drop):
                continue
            scale = tensors.get(name + "_scale")
            if name.endswith(".weight") and scale is not None:
                w = np.asarray(v).astype(np.float32)
                s = np.asarray(scale, np.float32)
                if s.ndim == 0:
                    pass                   # per-tensor
                elif s.ndim == 1:          # per-output-channel
                    s = s[:, None]
                out[name] = w * s
            else:
                out[name] = v
        return out
    raise NotImplementedError(f"quantization_config method {method!r} "
                              "(supported: awq, gptq, fp8, "
                              "compressed-tensors)")


def torch_state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    """Convert a torch state dict (CPU) to numpy — used by parity tests that
    instantiate a random-weight HF model without any checkpoint files."""
    out = {}
    for name, tensor in state_dict.items():
        out[name] = tensor.detach().to("cpu").float().numpy()
    return out


# ---- sharded-state save/load (reference: Worker.save_sharded_state,
# vllm/worker/worker.py:166-176 + model_loader ShardedStateLoader): dump
# the ENGINE-RESIDENT params tree — already quantized/packed — so a
# later boot skips checkpoint dequant + re-quantization entirely.

_SHARDED_MANIFEST = "vpc_sharded_state.json"


def _flatten_params(tree, prefix=""):
    """Yield (name, host_array, typed_nodes) leaves; typed_nodes collects
    {prefix: wrapper_class_name} for NamedTuple quant wrappers and list
    nodes so load reconstructs the exact tree without guessing."""
    typed: dict[str, str] = {}

    def walk(node, pfx):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from walk(v, f"{pfx}{k}/")
        elif isinstance(node, (list, tuple)) and not hasattr(node,
                                                            "_fields"):
            typed[pfx.rstrip("/")] = "list"
            for i, v in enumerate(node):
                yield from walk(v, f"{pfx}{i}/")
        elif hasattr(node, "_fields"):          # quant wrappers
            typed[pfx.rstrip("/")] = type(node).__name__
            for k in node._fields:
                yield from walk(getattr(node, k), f"{pfx}{k}/")
        elif node is None:
            typed[pfx.rstrip("/")] = "none"
        else:
            # ascontiguousarray is load-bearing: np.asarray of a jax
            # array can be a non-contiguous VIEW (e.g. an lm_head built
            # as a transpose), and safetensors' numpy writer serializes
            # the raw buffer without honoring strides — a non-contiguous
            # leaf would round-trip transposed/garbled.
            yield pfx[:-1], np.ascontiguousarray(np.asarray(node))

    return walk(tree, prefix), typed


def save_sharded_state(params, path: str, weight_dtype=None,
                       max_size: int = 4 * 1024 ** 3) -> None:
    """Write the engine's params tree under ``path`` as safetensors
    shards + a manifest.  ``max_size`` splits shards (bytes)."""
    import json as _json
    import os

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    it, typed = _flatten_params(params)
    shard: dict = {}
    shard_bytes = 0
    shards = []

    def flush():
        nonlocal shard, shard_bytes
        if not shard:
            return
        fname = f"sharded-{len(shards):05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        shards.append(fname)
        shard = {}
        shard_bytes = 0

    for name, arr in it:
        if shard_bytes + arr.nbytes > max_size and shard:
            flush()
        shard[name] = arr
        shard_bytes += arr.nbytes
    flush()
    with open(os.path.join(path, _SHARDED_MANIFEST), "w") as f:
        _json.dump({"format": 1, "shards": shards,
                    "typed_nodes": typed,
                    "weight_dtype": weight_dtype}, f, indent=1)


def is_sharded_state_dir(path: str) -> bool:
    import os
    return os.path.isfile(os.path.join(path, _SHARDED_MANIFEST))


def load_sharded_state(path: str):
    """-> (params_tree of jnp arrays, weight_dtype)."""
    import json as _json
    import os

    import jax.numpy as jnp

    with open(os.path.join(path, _SHARDED_MANIFEST)) as f:
        man = _json.load(f)
    from safetensors import safe_open
    leaves: dict[str, np.ndarray] = {}
    for fname in man["shards"]:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for name in f.keys():
                leaves[name] = f.get_tensor(name)
    root: dict = {}
    for name, arr in leaves.items():
        node = root
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    typed = man.get("typed_nodes", {})
    # Seed intermediate nodes for None-only paths so a parent with no
    # tensor siblings (all-None wrapper fields, None list tails) still
    # exists for rebuild to populate.
    for name, t in typed.items():
        if t != "none" or not name:
            continue
        node = root
        for p2 in name.split("/")[:-1]:
            node = node.setdefault(p2, {})

    none_nodes = {k for k, v in typed.items() if v == "none"}

    def rebuild(node, pfx):
        if not isinstance(node, dict):
            return node
        built = {k: rebuild(v, f"{pfx}{k}/") for k, v in node.items()}
        # restore None leaves recorded at save time (e.g. optional
        # wrapper fields) so typed reconstruction sees every field
        for k in none_nodes:
            head, _, leaf = k.rpartition("/")
            if head == pfx.rstrip("/") and leaf not in built:
                built[leaf] = None
        t = typed.get(pfx.rstrip("/"))
        if t == "list":
            return [built[str(i)] for i in range(len(built))]
        if t and t != "list":
            from ..ops.quant import QuantizedWeight
            from ..ops.pallas.int4_matmul import (PackedInt4,
                                                  QuantizedWeight4)
            cls = {"QuantizedWeight4": QuantizedWeight4,
                   "PackedInt4": PackedInt4,
                   "QuantizedWeight": QuantizedWeight}[t]
            return cls(**built)
        return built

    return rebuild(root, ""), man.get("weight_dtype")
