"""Mamba (S6 selective state space) causal LM.

TPU-native analog of the reference's Mamba support
(vllm/model_executor/models/mamba.py + csrc/mamba/ selective-scan and
causal-conv CUDA kernels, SURVEY C12).  Design differences:

- No custom kernels: prefill runs the SSM recurrence as one
  ``lax.associative_scan`` over time (log-depth, MXU-friendly) and the
  causal depthwise conv as an unrolled k-tap shift-multiply — both fuse
  under XLA.  Decode steps are closed-form single-token updates.
- Serving state is two pools indexed by a per-sequence *state slot*
  (conv window [d_inner, k-1] and SSM state [d_inner, d_state] per
  layer), allocated through the same page allocator as paged KV — with
  ``block_size == max_model_len`` every sequence owns exactly one page,
  whose index doubles as its state slot.  The reference manages this
  with a dedicated MambaCacheManager (vllm/model_executor/models/
  mamba_cache.py); here it collapses into the existing paging.

Exact math mirrors HF ``transformers`` MambaMixer (slow path): x/z from
in_proj, causal conv + SiLU, dt/B/C from x_proj, softplus dt,
A = -exp(A_log), h' = exp(dt*A) h + dt*B*x, y = C.h + D*x, gated by
SiLU(z), out_proj.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class MambaArch:
    vocab_size: int = 50280
    hidden_size: int = 768
    d_inner: int = 1536
    d_state: int = 16
    d_conv: int = 4
    dt_rank: int = 48
    num_layers: int = 24
    layer_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    use_conv_bias: bool = True
    use_bias: bool = False        # in/out projection biases
    # engine-compat attrs (state pools are sized separately)
    num_kv_heads: int = 1
    head_dim: int = 1
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 1 << 20   # no positional encoding
    # FalconMamba: weightless RMS on dt/B/C after x_proj (HF
    # modeling_falcon_mamba rms_forward, mixer_rms_eps).
    mixer_rms_eps: float | None = None

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MambaArch":
        hidden = cfg["hidden_size"]
        inner = cfg.get("intermediate_size") or 2 * hidden
        dt_rank = cfg.get("time_step_rank")
        if dt_rank in (None, "auto"):
            dt_rank = -(-hidden // 16)
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            d_inner=inner,
            d_state=cfg.get("state_size", 16),
            d_conv=cfg.get("conv_kernel", 4),
            dt_rank=dt_rank,
            num_layers=cfg["num_hidden_layers"],
            layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            use_conv_bias=cfg.get("use_conv_bias", True),
            use_bias=cfg.get("use_bias", False),
            mixer_rms_eps=cfg.get("mixer_rms_eps")
            if "FalconMambaForCausalLM" in (cfg.get("architectures") or [])
            or "mixer_rms_eps" in cfg else None,
        )


def _wrms(x, eps):
    """Weightless RMS (FalconMamba rms_forward)."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype))


class MambaModel:
    architecture = "mamba"

    def __init__(self, arch: MambaArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    # ---- params ----------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a = self.arch
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape):
            key_box[0], sub = jax.random.split(key_box[0])
            arr = jax.random.normal(sub, shape, self.dtype) * 0.02
            return np.asarray(arr) if as_numpy else arr

        ones = (np.ones if as_numpy
                else lambda sh: jnp.ones(sh, self.dtype))
        L, D, I = a.num_layers, a.hidden_size, a.d_inner
        layers = {
            "in_proj": w(L, D, 2 * I),
            "conv_w": w(L, a.d_conv, I),          # [k, d_inner] taps
            "conv_b": w(L, I),
            "x_proj": w(L, I, a.dt_rank + 2 * a.d_state),
            "dt_w": w(L, a.dt_rank, I),
            "dt_b": w(L, I),
            "A_log": ones((L, I, a.d_state)),
            "Dskip": ones((L, I)),
            "out_proj": w(L, I, D),
            "norm": ones((L, D)),
        }
        params = {"embed": w(a.vocab_size, D), "layers": layers,
                  "final_norm": ones((D,))}
        if not a.tie_word_embeddings:
            params["lm_head"] = w(D, a.vocab_size)
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a = self.arch

        def t(name):
            return np.asarray(tensors[name])

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        acc = {k: [] for k in ("in_proj", "conv_w", "conv_b", "x_proj",
                               "dt_w", "dt_b", "A_log", "Dskip",
                               "out_proj", "norm")}
        for i in range(a.num_layers):
            p = f"backbone.layers.{i}."
            acc["in_proj"].append(t(p + "mixer.in_proj.weight").T)
            # HF conv1d weight [d_inner, 1, k] -> [k, d_inner] taps.
            acc["conv_w"].append(
                t(p + "mixer.conv1d.weight")[:, 0, :].T)
            acc["conv_b"].append(
                t(p + "mixer.conv1d.bias") if a.use_conv_bias
                else np.zeros(a.d_inner, np.float32))
            acc["x_proj"].append(t(p + "mixer.x_proj.weight").T)
            acc["dt_w"].append(t(p + "mixer.dt_proj.weight").T)
            acc["dt_b"].append(t(p + "mixer.dt_proj.bias"))
            acc["A_log"].append(t(p + "mixer.A_log"))
            acc["Dskip"].append(t(p + "mixer.D"))
            acc["out_proj"].append(t(p + "mixer.out_proj.weight").T)
            acc["norm"].append(t(p + "norm.weight"))

        params = {
            "embed": leaf(t("backbone.embeddings.weight")),
            "layers": {k: leaf(np.stack(v)) for k, v in acc.items()},
            "final_norm": leaf(t("backbone.norm_f.weight")),
        }
        if not a.tie_word_embeddings and "lm_head.weight" in tensors:
            params["lm_head"] = leaf(t("lm_head.weight").T)
        return params

    # ---- mixer math ------------------------------------------------------

    def _ssm_params(self, lp, x):
        """x [T, I] (post-conv) -> (dA [T, I, S], dBx [T, I, S],
        C [T, S], Dskip, pre-computed in fp32)."""
        a = self.arch
        xf = x.astype(jnp.float32)
        proj = xf @ lp["x_proj"].astype(jnp.float32)
        dt = proj[:, :a.dt_rank]
        B = proj[:, a.dt_rank:a.dt_rank + a.d_state]
        C = proj[:, a.dt_rank + a.d_state:]
        dt, B, C = self._dtbc_norm(lp, dt, B, C)
        dt = jax.nn.softplus(dt @ lp["dt_w"].astype(jnp.float32)
                             + lp["dt_b"].astype(jnp.float32))  # [T, I]
        A = -jnp.exp(lp["A_log"].astype(jnp.float32))           # [I, S]
        dA = jnp.exp(dt[:, :, None] * A[None])                  # [T, I, S]
        dBx = (dt * xf)[:, :, None] * B[:, None, :]             # [T, I, S]
        return dA, dBx, C, xf

    def _dtbc_norm(self, lp, dt, B, C):
        """dt/B/C normalization variants: FalconMamba's weightless RMS
        (mixer_rms_eps) or Jamba's weighted dt/b/c RMSNorms (HF
        modeling_jamba JambaMambaMixer.dt_layernorm etc.)."""
        a = self.arch
        if "dt_norm" in lp:
            dt = _rms(dt, lp["dt_norm"].astype(jnp.float32),
                      a.rms_norm_eps)
            B = _rms(B, lp["b_norm"].astype(jnp.float32), a.rms_norm_eps)
            C = _rms(C, lp["c_norm"].astype(jnp.float32), a.rms_norm_eps)
        elif a.mixer_rms_eps is not None:
            dt = _wrms(dt, a.mixer_rms_eps)
            B = _wrms(B, a.mixer_rms_eps)
            C = _wrms(C, a.mixer_rms_eps)
        return dt, B, C

    def _conv_tap(self, lp, window):
        """window [T, k, I] of the last k pre-conv inputs -> conv out
        [T, I] (+bias, SiLU)."""
        out = jnp.einsum("tki,ki->ti", window.astype(jnp.float32),
                         lp["conv_w"].astype(jnp.float32))
        return jax.nn.silu(out + lp["conv_b"].astype(jnp.float32))

    def _mixer_prefill(self, lp, h, length):
        """Full-prompt mixer: returns (out [T, D], conv_state [I, k-1],
        ssm_state [I, S]) at position length-1."""
        a = self.arch
        t = h.shape[0]
        proj = h @ lp["in_proj"]        # use_bias=False in shipped mambas
        x_in, z = proj[:, :a.d_inner], proj[:, a.d_inner:]
        # Zero padded positions so they can't leak into conv/ssm states.
        valid = (jnp.arange(t) < length)[:, None]
        x_in = jnp.where(valid, x_in, 0)
        padded = jnp.concatenate(
            [jnp.zeros((a.d_conv - 1, a.d_inner), x_in.dtype), x_in],
            axis=0)
        window = jnp.stack(
            [padded[j:j + t] for j in range(a.d_conv)], axis=1)  # [T,k,I]
        x = self._conv_tap(lp, window)                           # [T, I]
        x = jnp.where(valid, x, 0)

        dA, dBx, C, xf = self._ssm_params(lp, x)
        dA = jnp.where(valid[:, :, None], dA, 1.0)   # padded: identity

        def combine(e1, e2):
            a1, b1 = e1
            a2, b2 = e2
            return a2 * a1, a2 * b1 + b2

        states = jax.lax.associative_scan(combine, (dA, dBx))[1]  # [T,I,S]
        y = jnp.einsum("tis,ts->ti", states, C)
        y = y + lp["Dskip"].astype(jnp.float32) * xf
        y = y * jax.nn.silu(z.astype(jnp.float32))
        out = y.astype(h.dtype) @ lp["out_proj"]

        ssm_state = states[length - 1]                           # [I, S]
        # State = the k-1 pre-conv inputs ending at position length-1
        # (padded[j] holds x_in[j - (k-1)]).
        conv_state = jax.lax.dynamic_slice(
            padded, (length, 0), (a.d_conv - 1, a.d_inner)).T    # [I, k-1]
        return out, conv_state, ssm_state

    def _mixer_step(self, lp, h, conv_state, ssm_state):
        """One decode step: h [B, D], conv_state [B, I, k-1],
        ssm_state [B, I, S] -> (out [B, D], new states)."""
        a = self.arch
        proj = h @ lp["in_proj"]
        x_in, z = proj[:, :a.d_inner], proj[:, a.d_inner:]
        window = jnp.concatenate(
            [conv_state, x_in.astype(conv_state.dtype)[:, :, None]],
            axis=2)                                              # [B,I,k]
        x = jnp.einsum("bik,ki->bi", window.astype(jnp.float32),
                       lp["conv_w"].astype(jnp.float32))
        x = jax.nn.silu(x + lp["conv_b"].astype(jnp.float32))
        new_conv = window[:, :, 1:]

        xf = x
        projx = xf @ lp["x_proj"].astype(jnp.float32)
        dt = projx[:, :a.dt_rank]
        B = projx[:, a.dt_rank:a.dt_rank + a.d_state]
        C = projx[:, a.dt_rank + a.d_state:]
        dt, B, C = self._dtbc_norm(lp, dt, B, C)
        dt = jax.nn.softplus(dt @ lp["dt_w"].astype(jnp.float32)
                             + lp["dt_b"].astype(jnp.float32))   # [B, I]
        A = -jnp.exp(lp["A_log"].astype(jnp.float32))            # [I, S]
        dA = jnp.exp(dt[:, :, None] * A[None])
        new_ssm = (dA * ssm_state.astype(jnp.float32)
                   + (dt * xf)[:, :, None] * B[:, None, :])
        y = jnp.einsum("bis,bs->bi", new_ssm, C)
        y = y + lp["Dskip"].astype(jnp.float32) * xf
        y = y * jax.nn.silu(z.astype(jnp.float32))
        out = y.astype(h.dtype) @ lp["out_proj"]
        return out, new_conv.astype(conv_state.dtype), \
            new_ssm.astype(ssm_state.dtype)

    # ---- full forwards ---------------------------------------------------

    def embed(self, params, tokens):
        return params["embed"][tokens]

    def forward_prefill_layers(self, params, h, length, slot, pools):
        """Prompt forward through ``params["layers"]`` only (no embed /
        final norm): writes the final per-layer states to ``slot`` of
        (conv_pool, ssm_pool) and returns (hidden [T, D], pools).  Under
        pipeline parallelism the layer stack and pools are this stage's
        local slices and ``slot`` may be the trash slot (inactive wave
        ticks)."""
        a = self.arch
        conv_pool, ssm_pool = pools

        def layer_fn(h, lp):
            res = h
            x = _rms(h, lp["norm"], a.layer_norm_eps)
            out, conv_state, ssm_state = self._mixer_prefill(
                lp, x, length)
            return res + out, (conv_state, ssm_state)

        h, (conv_states, ssm_states) = jax.lax.scan(
            layer_fn, h, params["layers"])
        conv_pool = conv_pool.at[:, slot].set(
            conv_states.astype(conv_pool.dtype))
        ssm_pool = ssm_pool.at[:, slot].set(
            ssm_states.astype(ssm_pool.dtype))
        return h, (conv_pool, ssm_pool)

    def forward_prefill(self, params, tokens, length, slot, pools):
        """Prompt forward: writes the final per-layer states to ``slot``
        of (conv_pool, ssm_pool) and returns (last_hidden [1, D], pools)."""
        a = self.arch
        h = self.embed(params, tokens)
        h, pools = self.forward_prefill_layers(params, h, length, slot,
                                               pools)
        h = _rms(h, params["final_norm"], a.layer_norm_eps)
        last = h[length - 1][None]
        return last, pools

    def forward_decode_layers(self, params, h, slots, pools):
        """One batched decode step through the (possibly stage-local)
        layer stack: h [B, D], slots [B] -> (hidden [B, D], pools) with
        per-layer state gather/scatter at ``slots``."""
        a = self.arch
        conv_pool, ssm_pool = pools

        def layer_fn(carry, lp):
            h, conv_pool, ssm_pool, lay = carry
            res = h
            x = _rms(h, lp["norm"], a.layer_norm_eps)
            conv_state = conv_pool[lay][slots]                  # [B,I,k-1]
            ssm_state = ssm_pool[lay][slots]                    # [B,I,S]
            out, new_conv, new_ssm = self._mixer_step(
                lp, x, conv_state, ssm_state)
            conv_pool = conv_pool.at[lay, slots].set(new_conv)
            ssm_pool = ssm_pool.at[lay, slots].set(new_ssm)
            return (res + out, conv_pool, ssm_pool, lay + 1), None

        (h, conv_pool, ssm_pool, _), _ = jax.lax.scan(
            layer_fn, (h, conv_pool, ssm_pool, 0), params["layers"])
        return h, (conv_pool, ssm_pool)

    def forward_decode_step(self, params, tokens, slots, pools):
        """One batched decode step: tokens [B], slots [B] -> (hidden
        [B, D], pools) with per-layer state gather/scatter at ``slots``."""
        a = self.arch
        h = self.embed(params, tokens)
        h, pools = self.forward_decode_layers(params, h, slots, pools)
        h = _rms(h, params["final_norm"], a.layer_norm_eps)
        return h, pools

    def logits(self, params, hidden):
        if self.arch.tie_word_embeddings or "lm_head" not in params:
            return hidden @ params["embed"].T
        return hidden @ params["lm_head"]

    # ---- sizing ----------------------------------------------------------

    def param_bytes(self) -> int:
        a = self.arch
        per_layer = (2 * a.hidden_size * a.d_inner * 2
                     + a.d_inner * (a.d_conv + 1 + a.dt_rank
                                    + 2 * a.d_state)
                     + a.dt_rank * a.d_inner
                     + a.d_inner * a.d_state + a.d_inner + a.hidden_size)
        total = a.vocab_size * a.hidden_size \
            + a.num_layers * per_layer + a.hidden_size
        return total * jnp.dtype(self.dtype).itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return 0

    def state_bytes_per_seq(self, dtype=jnp.float32) -> int:
        a = self.arch
        per_layer = a.d_inner * (a.d_conv - 1 + a.d_state)
        return a.num_layers * per_layer * jnp.dtype(dtype).itemsize
