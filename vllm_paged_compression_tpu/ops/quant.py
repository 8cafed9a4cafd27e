"""Weight quantization: int8 per-output-channel, symmetric.

TPU-native analog of the reference's tpu_int8 scheme
(vllm/model_executor/layers/quantization/tpu_int8.py — per-channel symmetric
int8 with bf16 dequant in the matmul).  A QuantizedWeight is a pytree leaf
pair (q: int8 [in, out], s: f32 [out]); ``matmul`` dispatches on it so model
code stays dtype-agnostic.  The win on HBM-bound decode is the halved weight
read; XLA fuses the int8->bf16 convert into the matmul operand load.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    q: jnp.ndarray       # int8, [..., in_features, out_features]
    s: jnp.ndarray       # f32 scales, [..., out_features]


def quantize_weight(w, axis: int = -2) -> QuantizedWeight:
    """Symmetric per-output-channel quantization over the contraction axis.

    ``axis`` is the in-features axis (reduced by the matmul); scales are
    per remaining (output) channel.  numpy input stays on host (and is
    uploaded as int8 + f32 scales) so a large bf16 tree never touches HBM;
    jax input quantizes on device.
    """
    import numpy as np
    if isinstance(w, np.ndarray):
        wf = w.astype(np.float32, copy=False)
        absmax = np.max(np.abs(wf), axis=axis, keepdims=True)
        scale = absmax / 127.0
        q = np.clip(np.round(wf / np.maximum(scale, 1e-12)),
                    -127, 127).astype(np.int8)
        return QuantizedWeight(q=jnp.asarray(q),
                               s=jnp.asarray(
                                   np.squeeze(scale, axis=axis)))
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)),
                 -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, s=jnp.squeeze(scale, axis=axis))


def matmul(x: jnp.ndarray,
           w: Union[jnp.ndarray, QuantizedWeight]) -> jnp.ndarray:
    """y = x @ w with transparent int8/int4 dequant."""
    if isinstance(w, QuantizedWeight):
        y = jnp.dot(x, w.q.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * w.s).astype(x.dtype)
    from .pallas.int4_matmul import (PackedInt4, QuantizedWeight4,
                                     StackedInt4View, int4_matmul,
                                     int4_matmul_view)
    if isinstance(w, (QuantizedWeight4, PackedInt4)):
        return int4_matmul(x, w)
    if isinstance(w, StackedInt4View):
        return int4_matmul_view(x, w)
    return x @ w


class QuantKV(NamedTuple):
    """Quantized KV-cache pool leaf: int8 (or fp8) values + per-(token,
    kv-head) f32 scales.

    TPU-native successor of the reference's fp8 KV cache
    (vllm/model_executor/layers/quantization/kv_cache.py:63-73 — which used
    checkpoint-calibrated per-tensor scales and could NOT combine with paged
    eviction, torch_cuda_sdpa.py:769-772).  Here scales are computed online
    per written row, dequant fuses into the attention kernels, and eviction
    scoring reads the quantized pages directly — the combination works.

    q: [..., page_size, Hkv, head_dim] int8/fp8
    s: [..., page_size, Hkv] f32
    """

    q: jnp.ndarray
    s: jnp.ndarray


def quantize_kv_rows(x: jnp.ndarray, qdtype=jnp.int8):
    """Per-(token, head) symmetric quantization over head_dim.

    x: [N, Hkv, d] -> (q [N, Hkv, d] qdtype, s [N, Hkv] f32).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    if qdtype == jnp.int8:
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(xf / jnp.maximum(scale, 1e-12)[..., None]),
                     -127, 127).astype(jnp.int8)
    else:  # fp8 e4m3: max normal 448
        scale = absmax / 448.0
        q = (xf / jnp.maximum(scale, 1e-12)[..., None]).astype(qdtype)
    return q, scale


def dequantize_kv(kv: QuantKV) -> jnp.ndarray:
    return kv.q.astype(jnp.float32) * kv.s[..., None]


def quantize_params_tree(params, leaf_names: tuple[str, ...],
                         model_dtype=jnp.bfloat16, bits: int = 8,
                         group: int = None):
    """Quantize the named leaves of a model params dict.  Projection
    weights ([..., in, out]) quantize over the in-features axis; the
    ``embed`` table ([V, D], consumed by gather) quantizes per row and
    stays int8 even at bits=4 (gathers read rows, not columns).
    Unnamed numpy leaves are uploaded in ``model_dtype``.  ``group``
    overrides the int4 group size (pass the checkpoint's own group so
    re-quantizing a dequantized GPTQ/AWQ checkpoint stays within half its
    original quantization step)."""
    import numpy as np

    def one(k, v):
        if k == "embed":
            return quantize_weight(v, axis=-1)
        if bits == 4:
            from .pallas.int4_matmul import (pack_int4_scales,
                                             quantize_weight_int4)
            return pack_int4_scales(quantize_weight_int4(v, group=group))
        return quantize_weight(v, axis=-2)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in leaf_names and not isinstance(v, dict):
                    out[k] = one(k, v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, np.ndarray):
            return jnp.asarray(node, model_dtype)
        return node
    return walk(params)
