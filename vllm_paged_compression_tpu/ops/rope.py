"""Rotary position embeddings, HF-Llama-compatible (rotate_half convention).

TPU-native analog of the reference's rotary_embedding custom op
(vllm/model_executor/layers/rotary_embedding.py + csrc/pos_encoding_kernels.cu):
here it is pure jnp — XLA fuses the elementwise math into the surrounding
projections, so no custom kernel is warranted.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32, scaling: dict | None = None,
                 interleaved: bool = False):
    """cos/sin tables for given integer positions, shape [T, head_dim].

    Matches transformers' LlamaRotaryEmbedding: inv_freq over even dims,
    duplicated (not interleaved) across the two halves.  ``scaling`` supports
    the llama3 rope-scaling dict (rope_type "llama3") and plain "linear".
    ``interleaved`` lays the table out for the GPT-J/GPT-NeoX-interleaved
    convention instead: each frequency repeated over an adjacent (even, odd)
    dim pair (transformers' rotate_every_two models: GPT-J, Cohere).
    """
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    attention_scaling = 1.0
    if scaling:
        rope_type = scaling.get("rope_type", scaling.get("type", ""))
        if rope_type == "llama3":
            inv_freq = _llama3_scale_inv_freq(inv_freq, scaling)
        elif rope_type == "linear":
            inv_freq = inv_freq / float(scaling["factor"])
        elif rope_type == "yarn":
            inv_freq, attention_scaling = _yarn_scale_inv_freq(
                inv_freq, scaling, head_dim, theta)
        elif rope_type not in ("", "default"):
            raise NotImplementedError(f"rope scaling type {rope_type!r}")
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [T, d/2]
    if interleaved:
        emb = jnp.repeat(freqs, 2, axis=-1)                      # [T, d]
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)           # [T, d]
    cos = jnp.cos(emb) * attention_scaling
    sin = jnp.sin(emb) * attention_scaling
    return cos.astype(dtype), sin.astype(dtype)


def mrope_cos_sin(positions3: jnp.ndarray, head_dim: int, theta: float,
                  sections: list[int], dtype=jnp.float32):
    """Multimodal rotary tables (Qwen2-VL M-RoPE, HF
    apply_multimodal_rotary_pos_emb): three position streams [3, T]
    (temporal/height/width) each own a slice of the frequency dims —
    ``sections`` sums to head_dim // 2.  With all three streams equal this
    reduces exactly to standard rope, which is why decode steps can use
    the 1D path with a per-sequence position delta (vllm
    mrope_position_delta)."""
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions3.astype(jnp.float32)[..., None] * inv_freq  # [3,T,d/2]
    parts, off = [], 0
    for i, s in enumerate(sections):
        parts.append(freqs[i, :, off:off + s])
        off += s
    comb = jnp.concatenate(parts, axis=-1)                        # [T, d/2]
    emb = jnp.concatenate([comb, comb], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _llama3_scale_inv_freq(inv_freq, scaling):
    """Llama-3.1 NTK-by-parts frequency scaling (transformers
    modeling_rope_utils._compute_llama3_parameters)."""
    factor = float(scaling["factor"])
    low_freq_factor = float(scaling["low_freq_factor"])
    high_freq_factor = float(scaling["high_freq_factor"])
    old_context_len = float(scaling["original_max_position_embeddings"])
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2 * jnp.pi / inv_freq
    scaled = inv_freq / factor
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor)
    smoothed = (1 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen > low_freq_wavelen, scaled, inv_freq)
    is_medium = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return jnp.where(is_medium, smoothed, out)


def _yarn_scale_inv_freq(inv_freq, scaling, head_dim: int, theta: float):
    """YaRN NTK-by-parts scaling + attention factor (transformers
    modeling_rope_utils._compute_yarn_parameters; the mscale/mscale_all_dim
    variant is DeepSeek V2's)."""
    import math
    factor = float(scaling["factor"])
    attention_factor = scaling.get("attention_factor")
    mscale = scaling.get("mscale")
    mscale_all_dim = scaling.get("mscale_all_dim")
    orig_max = float(scaling.get("original_max_position_embeddings",
                                 scaling.get("max_position_embeddings",
                                             2048)))
    beta_fast = float(scaling.get("beta_fast") or 32)
    beta_slow = float(scaling.get("beta_slow") or 1)

    def get_mscale(scale, ms=1.0):
        if scale <= 1:
            return 1.0
        return 0.1 * ms * math.log(scale) + 1.0

    if attention_factor is None:
        if mscale and mscale_all_dim:
            attention_factor = (get_mscale(factor, mscale)
                                / get_mscale(factor, mscale_all_dim))
        else:
            attention_factor = get_mscale(factor)

    def correction_dim(num_rot):
        return (head_dim * math.log(orig_max / (num_rot * 2 * math.pi))
                ) / (2 * math.log(theta))

    low = correction_dim(beta_fast)
    high = correction_dim(beta_slow)
    if scaling.get("truncate", True):
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, head_dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(head_dim // 2, dtype=jnp.float32) - low)
        / (high - low), 0, 1)
    extrapolation_factor = 1.0 - ramp
    inv_freq = (inv_freq / factor * (1 - extrapolation_factor)
                + inv_freq * extrapolation_factor)
    return inv_freq, float(attention_factor)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rotate_every_two(x):
    # (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray, rot_dim: int | None = None,
               interleaved: bool = False):
    """Apply rotary embedding. q/k: [T, heads, head_dim]; cos/sin: [T, rot_dim].

    Computed in fp32 and cast back: matches the reference CUDA op's internal
    float accumulation.  ``rot_dim`` < head_dim rotates only the leading dims
    (partial rotary: GPT-NeoX rotary_pct, Phi/StableLM
    partial_rotary_factor); ``interleaved`` uses the GPT-J rotate-every-two
    pairing instead of the Llama rotate-half convention.
    """
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    rotate = _rotate_every_two if interleaved else _rotate_half

    def rot(x):
        if rot_dim is not None and rot_dim < x.shape[-1]:
            xr, x_pass = x[..., :rot_dim], x[..., rot_dim:]
        else:
            xr, x_pass = x, None
        xf = xr.astype(jnp.float32)
        out = (xf * cos + rotate(xf) * sin).astype(x.dtype)
        if x_pass is not None:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rot(q), rot(k)
