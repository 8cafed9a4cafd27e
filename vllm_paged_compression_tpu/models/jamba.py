"""Jamba: hybrid Mamba / attention / MoE causal LM (reference
vllm/model_executor/models/jamba.py; HF modeling_jamba).

Layer schedule (jamba.py:292-293 / JambaConfig): layer i is ATTENTION iff
``i % attn_layer_period == attn_layer_offset`` (else a Mamba mixer), and
its feed-forward is an ``num_experts``-way MoE iff ``i %
expert_layer_period == expert_layer_offset`` (else a dense gated MLP).
Attention has NO positional encoding (no rope, jamba.py:157-230); MoE
routing is softmax-then-topk WITHOUT renormalization (jamba.py:62-72,
renormalize=False); the Mamba mixer adds weighted dt/B/C RMSNorms
(JambaMambaMixer dt/b/c_layernorm).

Serving design: rides the engine's state-model path (architecture ==
"mamba": one state slot per sequence, block_size == max_model_len).  The
per-slot state is FOUR pools — Mamba conv/SSM states for the mamba layers
plus K/V rows of max_model_len for the attention layers — and a position
counter, all opaque to the runner (the reference threads this through
MambaCacheManager + regular paged KV; here a sequence's whole hybrid state
lives at one slot index).

The layer stack is an unrolled Python loop over per-layer param dicts
(four layer kinds; a homogeneous ``lax.scan`` does not apply).  Compile
cost grows with depth — acceptable for Jamba's 32 layers; a period-block
scan (all period-8 blocks are identical in kind) is the round-2
optimization if compile latency warrants it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mamba import MambaArch, MambaModel, _rms


@dataclass
class JambaArch:
    vocab_size: int = 65536
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    # layer schedule
    attn_layer_period: int = 8
    attn_layer_offset: int = 4
    expert_layer_period: int = 2
    expert_layer_offset: int = 1
    num_experts: int = 16
    num_experts_per_tok: int = 2
    # mamba mixer
    d_state: int = 16
    d_conv: int = 4
    d_inner: int = 8192
    dt_rank: int = 256
    use_conv_bias: bool = True
    # engine-compat attrs
    max_position_embeddings: int = 1 << 18
    num_labels: int = 0
    head_type: str = "none"

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "JambaArch":
        hidden = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        inner = cfg.get("mamba_expand", 2) * hidden
        dt_rank = cfg.get("mamba_dt_rank")
        if dt_rank in (None, "auto"):
            dt_rank = -(-hidden // 16)
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attn_layer_period=cfg.get("attn_layer_period", 8),
            attn_layer_offset=cfg.get("attn_layer_offset", 4),
            expert_layer_period=cfg.get("expert_layer_period", 2),
            expert_layer_offset=cfg.get("expert_layer_offset", 1),
            num_experts=cfg.get("num_experts", 16),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            d_state=cfg.get("mamba_d_state", 16),
            d_conv=cfg.get("mamba_d_conv", 4),
            d_inner=inner,
            dt_rank=dt_rank,
            use_conv_bias=cfg.get("mamba_conv_bias", True),
        )

    def is_attn(self, i: int) -> bool:
        return i % self.attn_layer_period == self.attn_layer_offset

    def is_moe(self, i: int) -> bool:
        return (self.num_experts > 1
                and i % self.expert_layer_period == self.expert_layer_offset)

    @property
    def num_attn_layers(self) -> int:
        return sum(self.is_attn(i) for i in range(self.num_layers))

    @property
    def num_mamba_layers(self) -> int:
        return self.num_layers - self.num_attn_layers

    @property
    def layer_norm_eps(self) -> float:
        """Alias: the shared state-model PP bodies read
        ``arch.layer_norm_eps`` (parallel/pipeline.py)."""
        return self.rms_norm_eps


class JambaModel:
    architecture = "mamba"     # rides the engine's state-model path

    def __init__(self, arch: JambaArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype
        # Internal mixer-math host: MambaModel's _mixer_prefill/_mixer_step
        # read only the dims below (+ per-layer lp dicts).
        self._mamba = MambaModel(MambaArch(
            hidden_size=arch.hidden_size, d_inner=arch.d_inner,
            d_state=arch.d_state, d_conv=arch.d_conv,
            dt_rank=arch.dt_rank, rms_norm_eps=arch.rms_norm_eps,
            use_conv_bias=arch.use_conv_bias), dtype=dtype)

    # ---- params ----------------------------------------------------------

    def _layer_shapes(self, i: int) -> dict:
        a = self.arch
        shapes = {"input_norm": (a.hidden_size,),
                  "pre_ff_norm": (a.hidden_size,)}
        if a.is_attn(i):
            qkv = (a.num_heads + 2 * a.num_kv_heads) * a.head_dim
            shapes.update({
                "wqkv": (a.hidden_size, qkv),
                "wo": (a.num_heads * a.head_dim, a.hidden_size),
            })
        else:
            shapes.update({
                "in_proj": (a.hidden_size, 2 * a.d_inner),
                "conv_w": (a.d_conv, a.d_inner),
                "conv_b": (a.d_inner,),
                "x_proj": (a.d_inner, a.dt_rank + 2 * a.d_state),
                "dt_w": (a.dt_rank, a.d_inner),
                "dt_b": (a.d_inner,),
                "A_log": (a.d_inner, a.d_state),
                "Dskip": (a.d_inner,),
                "out_proj": (a.d_inner, a.hidden_size),
                "dt_norm": (a.dt_rank,),
                "b_norm": (a.d_state,),
                "c_norm": (a.d_state,),
            })
        if a.is_moe(i):
            shapes.update({
                "router": (a.hidden_size, a.num_experts),
                "w_gate_up": (a.num_experts, a.hidden_size,
                              2 * a.intermediate_size),
                "w_down": (a.num_experts, a.intermediate_size,
                           a.hidden_size),
            })
        else:
            shapes.update({
                "w_gate_up": (a.hidden_size, 2 * a.intermediate_size),
                "w_down": (a.intermediate_size, a.hidden_size),
            })
        return shapes

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a = self.arch
        key_box = [jax.random.PRNGKey(seed)]

        def w(shape):
            key_box[0], sub = jax.random.split(key_box[0])
            arr = jax.random.normal(sub, shape, self.dtype) * 0.02
            return np.asarray(arr) if as_numpy else arr

        ones = (np.ones if as_numpy
                else lambda sh: jnp.ones(sh, self.dtype))
        layer_list = []
        for i in range(a.num_layers):
            lp = {}
            for name, shape in self._layer_shapes(i).items():
                lp[name] = (ones(shape) if "norm" in name
                            or name in ("A_log", "Dskip") else w(shape))
            layer_list.append(lp)
        params = {"embed": w((a.vocab_size, a.hidden_size)),
                  "layer_list": layer_list,
                  "final_norm": ones((a.hidden_size,))}
        if a.head_type == "cls":
            params["score"] = w((a.hidden_size, a.num_labels))
        if not a.tie_word_embeddings:
            params["lm_head"] = w((a.hidden_size, a.vocab_size))
        return params

    def head_forward(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        """Classification head (reference jamba.py:600
        JambaForSequenceClassification: score linear, LAST pooling)."""
        return (hidden.astype(jnp.float32)
                @ params["score"].astype(jnp.float32))

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a = self.arch

        def t(name):
            return np.asarray(tensors[name])

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        layer_list = []
        for i in range(a.num_layers):
            p = f"model.layers.{i}."
            lp = {"input_norm": leaf(t(p + "input_layernorm.weight")),
                  "pre_ff_norm": leaf(t(p + "pre_ff_layernorm.weight"))}
            if a.is_attn(i):
                lp["wqkv"] = leaf(np.concatenate([
                    t(p + "self_attn.q_proj.weight").T,
                    t(p + "self_attn.k_proj.weight").T,
                    t(p + "self_attn.v_proj.weight").T], axis=1))
                lp["wo"] = leaf(t(p + "self_attn.o_proj.weight").T)
            else:
                m = p + "mamba."
                lp.update({
                    "in_proj": leaf(t(m + "in_proj.weight").T),
                    "conv_w": leaf(t(m + "conv1d.weight")[:, 0, :].T),
                    "conv_b": leaf(t(m + "conv1d.bias")
                                   if a.use_conv_bias
                                   else np.zeros(a.d_inner, np.float32)),
                    "x_proj": leaf(t(m + "x_proj.weight").T),
                    "dt_w": leaf(t(m + "dt_proj.weight").T),
                    "dt_b": leaf(t(m + "dt_proj.bias")),
                    "A_log": leaf(t(m + "A_log")),
                    "Dskip": leaf(t(m + "D")),
                    "out_proj": leaf(t(m + "out_proj.weight").T),
                    "dt_norm": leaf(t(m + "dt_layernorm.weight")),
                    "b_norm": leaf(t(m + "b_layernorm.weight")),
                    "c_norm": leaf(t(m + "c_layernorm.weight")),
                })
            f = p + "feed_forward."
            if a.is_moe(i):
                lp["router"] = leaf(t(f + "router.weight").T)
                lp["w_gate_up"] = leaf(np.stack([
                    np.concatenate([
                        t(f + f"experts.{e}.gate_proj.weight").T,
                        t(f + f"experts.{e}.up_proj.weight").T], axis=1)
                    for e in range(a.num_experts)]))
                lp["w_down"] = leaf(np.stack([
                    t(f + f"experts.{e}.down_proj.weight").T
                    for e in range(a.num_experts)]))
            else:
                lp["w_gate_up"] = leaf(np.concatenate([
                    t(f + "gate_proj.weight").T,
                    t(f + "up_proj.weight").T], axis=1))
                lp["w_down"] = leaf(t(f + "down_proj.weight").T)
            layer_list.append(lp)

        params = {"embed": leaf(t("model.embed_tokens.weight")),
                  "layer_list": layer_list,
                  "final_norm": leaf(t("model.final_layernorm.weight"))}
        if a.head_type == "cls":
            params["score"] = leaf(t("score.weight").T)
        if not a.tie_word_embeddings:
            if "lm_head.weight" in tensors:
                params["lm_head"] = leaf(t("lm_head.weight").T)
            else:
                # Pooling-task checkpoints ship no lm_head.
                params["lm_head"] = leaf(t("model.embed_tokens.weight").T)
        return params

    # ---- state pools -----------------------------------------------------

    def make_state_pools(self, num_slots: int, max_len: int):
        """Per-slot hybrid state: Mamba conv/SSM pools (mamba-layer-major)
        + attention K/V rows of ``max_len`` (attn-layer-major) + a
        position counter."""
        a = self.arch
        lm, la = a.num_mamba_layers, max(a.num_attn_layers, 1)
        kv_shape = (la, num_slots, max_len, a.num_kv_heads, a.head_dim)
        return (jnp.zeros((lm, num_slots, a.d_inner, a.d_conv - 1),
                          jnp.float32),
                jnp.zeros((lm, num_slots, a.d_inner, a.d_state),
                          jnp.float32),
                jnp.zeros(kv_shape, self.dtype),
                jnp.zeros(kv_shape, self.dtype),
                jnp.zeros((num_slots,), jnp.int32))

    # ---- layer pieces ----------------------------------------------------

    def _ffn(self, lp, x):
        a = self.arch
        act = jax.nn.silu
        if "router" in lp:
            # Softmax over ALL logits then topk, NO renormalization
            # (jamba.py:62-72 renormalize=False; HF JambaSparseMoeBlock).
            probs = jax.nn.softmax(
                (x @ lp["router"]).astype(jnp.float32), axis=-1)
            rw, topi = jax.lax.top_k(probs, a.num_experts_per_tok)
            combine = jnp.sum(
                jax.nn.one_hot(topi, a.num_experts, dtype=jnp.float32)
                * rw[..., None], axis=-2)                        # [T, E]
            gu = jnp.einsum("td,edf->etf", x, lp["w_gate_up"])
            gate = gu[..., :a.intermediate_size]
            up = gu[..., a.intermediate_size:]
            h_e = jnp.einsum("etf,efd->etd", act(gate) * up, lp["w_down"])
            return jnp.einsum("etd,te->td", h_e.astype(jnp.float32),
                              combine).astype(x.dtype)
        gu = x @ lp["w_gate_up"]
        gate = gu[..., :a.intermediate_size]
        up = gu[..., a.intermediate_size:]
        return (act(gate) * up) @ lp["w_down"]

    def _qkv(self, lp, x):
        a = self.arch
        t = x.shape[0]
        qkv = x @ lp["wqkv"]
        q_sz = a.num_heads * a.head_dim
        kv_sz = a.num_kv_heads * a.head_dim
        q = qkv[:, :q_sz].reshape(t, a.num_heads, a.head_dim)
        k = qkv[:, q_sz:q_sz + kv_sz].reshape(t, a.num_kv_heads, a.head_dim)
        v = qkv[:, q_sz + kv_sz:].reshape(t, a.num_kv_heads, a.head_dim)
        return q, k, v

    # ---- full forwards ---------------------------------------------------

    def forward_prefill(self, params, tokens, length, slot, pools):
        """Prompt forward for ONE sequence: writes final mamba states, the
        prompt's K/V rows, and the position counter at ``slot``."""
        from ..ops.attention import prefill_attention
        a = self.arch
        conv_pool, ssm_pool, k_pool, v_pool, pos_pool = pools
        h = params["embed"][tokens]
        t = tokens.shape[0]
        valid = (jnp.arange(t) < length)[:, None, None]
        scale = a.head_dim ** -0.5
        mi = ai = 0
        for i, lp in enumerate(params["layer_list"]):
            res = h
            x = _rms(h, lp["input_norm"], a.rms_norm_eps)
            if a.is_attn(i):
                q, k, v = self._qkv(lp, x)
                out = prefill_attention(q, k, v, scale, length)
                out = out.reshape(t, a.num_heads * a.head_dim) @ lp["wo"]
                k_pool = k_pool.at[ai, slot, :t].set(
                    jnp.where(valid, k, 0).astype(k_pool.dtype))
                v_pool = v_pool.at[ai, slot, :t].set(
                    jnp.where(valid, v, 0).astype(v_pool.dtype))
                ai += 1
            else:
                out, conv_state, ssm_state = self._mamba._mixer_prefill(
                    lp, x, length)
                conv_pool = conv_pool.at[mi, slot].set(
                    conv_state.astype(conv_pool.dtype))
                ssm_pool = ssm_pool.at[mi, slot].set(
                    ssm_state.astype(ssm_pool.dtype))
                mi += 1
            h = res + out
            res = h
            x = _rms(h, lp["pre_ff_norm"], a.rms_norm_eps)
            h = res + self._ffn(lp, x)
        pos_pool = pos_pool.at[slot].set(length)
        h = _rms(h, params["final_norm"], a.rms_norm_eps)
        last = h[length - 1][None]
        return last, (conv_pool, ssm_pool, k_pool, v_pool, pos_pool)

    def forward_decode_step(self, params, tokens, slots, pools):
        """One batched decode step: tokens [B], slots [B]."""
        a = self.arch
        conv_pool, ssm_pool, k_pool, v_pool, pos_pool = pools
        h = params["embed"][tokens]                          # [B, D]
        b = tokens.shape[0]
        pos = pos_pool[slots]                                # [B]
        iota_b = jnp.arange(b)
        scale = a.head_dim ** -0.5
        groups = a.num_heads // a.num_kv_heads
        max_len = k_pool.shape[2]
        key_mask = jnp.arange(max_len)[None] <= pos[:, None]  # [B, T]
        mi = ai = 0
        for i, lp in enumerate(params["layer_list"]):
            res = h
            x = _rms(h, lp["input_norm"], a.rms_norm_eps)
            if a.is_attn(i):
                q, k, v = self._qkv(lp, x)                   # [B, 1?]..
                # single-token: q [B, H, d], k/v [B, Hkv, d]
                k_pool = k_pool.at[ai, slots, pos].set(
                    k.astype(k_pool.dtype))
                v_pool = v_pool.at[ai, slots, pos].set(
                    v.astype(v_pool.dtype))
                keys = k_pool[ai][slots]                     # [B, T, Hkv, d]
                vals = v_pool[ai][slots]
                qg = q.reshape(b, a.num_kv_heads, groups, a.head_dim)
                scores = jnp.einsum(
                    "bhgd,bthd->bhgt", qg.astype(jnp.float32),
                    keys.astype(jnp.float32)) * scale
                scores = jnp.where(key_mask[:, None, None, :], scores,
                                   -1e30)
                probs = jax.nn.softmax(scores, axis=-1)
                out = jnp.einsum("bhgt,bthd->bhgd", probs,
                                 vals.astype(jnp.float32))
                out = out.reshape(b, a.num_heads * a.head_dim).astype(
                    h.dtype) @ lp["wo"]
                ai += 1
            else:
                conv_state = conv_pool[mi][slots]
                ssm_state = ssm_pool[mi][slots]
                out, new_conv, new_ssm = self._mamba._mixer_step(
                    lp, x, conv_state, ssm_state)
                conv_pool = conv_pool.at[mi, slots].set(new_conv)
                ssm_pool = ssm_pool.at[mi, slots].set(new_ssm)
                mi += 1
            h = res + out
            res = h
            x = _rms(h, lp["pre_ff_norm"], a.rms_norm_eps)
            h = res + self._ffn(lp, x)
        pos_pool = pos_pool.at[slots].set(pos + 1)
        h = _rms(h, params["final_norm"], a.rms_norm_eps)
        return h, (conv_pool, ssm_pool, k_pool, v_pool, pos_pool)

    def logits(self, params, hidden):
        if self.arch.tie_word_embeddings or "lm_head" not in params:
            return hidden @ params["embed"].T
        return hidden @ params["lm_head"]

    def embed(self, params, tokens):
        return params["embed"][tokens]

    # ---- pipeline parallelism: period-block form -------------------------
    # Layer kinds depend only on the position within an
    # lcm(attn_layer_period, expert_layer_period) block, so all blocks are
    # structurally identical: layer_list restacks into per-POSITION leaves
    # [num_blocks, ...] whose leading axis shards over "pipe" (each stage
    # owns a contiguous run of whole blocks), and the layer-major state
    # pools slice evenly over "pipe" because every block contributes the
    # same number of mamba/attn layers.  The engine's shared state-model
    # PP bodies (parallel/pipeline.py pp_decode_window_body_mamba /
    # pp_prefill_wave_mamba) then drive Jamba unchanged via the
    # forward_*_layers contracts below.  The reference runs Jamba PP by
    # partitioning layers across stage processes
    # (vllm/model_executor/models/jamba.py get_pp_group / make_layers).

    @property
    def pp_block_len(self) -> int:
        from math import lcm
        a = self.arch
        return lcm(a.attn_layer_period, max(a.expert_layer_period, 1))

    def to_block_form(self, params: dict) -> dict:
        """Restack ``layer_list`` (length num_layers) into ``block_list``:
        one dict per block POSITION, leaves stacked [num_blocks, ...].
        One-time transform at engine build when PP is on."""
        L = self.pp_block_len
        lst = params["layer_list"]
        assert len(lst) % L == 0, (len(lst), L)
        nb = len(lst) // L
        blocks = []
        for p in range(L):
            keys = lst[p].keys()
            blocks.append({k: jnp.stack([lst[b * L + p][k]
                                         for b in range(nb)])
                           for k in keys})
        out = {k: v for k, v in params.items() if k != "layer_list"}
        out["block_list"] = blocks
        return out

    def from_block_form(self, params: dict) -> dict:
        """Invert ``to_block_form`` so sharded-state dumps from a PP
        engine are layer-form and reload under any parallel layout."""
        L = self.pp_block_len
        blocks = params["block_list"]
        nb = next(iter(blocks[0].values())).shape[0]
        lst = [{k: v[b] for k, v in blocks[p].items()}
               for b in range(nb) for p in range(L)]
        out = {k: v for k, v in params.items() if k != "block_list"}
        out["layer_list"] = lst
        return out

    def forward_prefill_layers(self, params, h, length, slot, pools):
        """Prompt forward through this stage's local blocks (block-form
        params, no embed / final norm): writes final mamba states, the
        prompt's K/V rows, and the position counter at ``slot`` (the
        trash slot on inactive wave ticks).  Returns (hidden, pools)."""
        from ..ops.attention import prefill_attention
        a = self.arch
        conv_pool, ssm_pool, k_pool, v_pool, pos_pool = pools
        t = h.shape[0]
        valid = (jnp.arange(t) < length)[:, None, None]
        scale = a.head_dim ** -0.5
        L = self.pp_block_len
        nb_local = params["block_list"][0]["input_norm"].shape[0]
        mi = ai = 0
        for b in range(nb_local):
            for p in range(L):
                lp = {k: v[b] for k, v in params["block_list"][p].items()}
                res = h
                x = _rms(h, lp["input_norm"], a.rms_norm_eps)
                if a.is_attn(p):
                    q, k, v = self._qkv(lp, x)
                    out = prefill_attention(q, k, v, scale, length)
                    out = out.reshape(t, a.num_heads * a.head_dim) \
                        @ lp["wo"]
                    k_pool = k_pool.at[ai, slot, :t].set(
                        jnp.where(valid, k, 0).astype(k_pool.dtype))
                    v_pool = v_pool.at[ai, slot, :t].set(
                        jnp.where(valid, v, 0).astype(v_pool.dtype))
                    ai += 1
                else:
                    out, conv_state, ssm_state = self._mamba._mixer_prefill(
                        lp, x, length)
                    conv_pool = conv_pool.at[mi, slot].set(
                        conv_state.astype(conv_pool.dtype))
                    ssm_pool = ssm_pool.at[mi, slot].set(
                        ssm_state.astype(ssm_pool.dtype))
                    mi += 1
                h = res + out
                res = h
                x = _rms(h, lp["pre_ff_norm"], a.rms_norm_eps)
                h = res + self._ffn(lp, x)
        pos_pool = pos_pool.at[slot].set(length)
        return h, (conv_pool, ssm_pool, k_pool, v_pool, pos_pool)

    def forward_decode_layers(self, params, h, slots, pools):
        """One batched decode step through this stage's local blocks
        (block-form params): h [B, D], slots [B] -> (hidden, pools).
        The position counter is replicated across stages; every stage
        advances each real slot exactly once per step (microbatches
        partition the batch), so copies stay bit-identical without
        synchronization.  Writes steered to the trash slot land at its
        stale counter and are dropped or harmlessly overwritten."""
        a = self.arch
        conv_pool, ssm_pool, k_pool, v_pool, pos_pool = pools
        b_sz = h.shape[0]
        pos = pos_pool[slots]
        scale = a.head_dim ** -0.5
        groups = a.num_heads // a.num_kv_heads
        max_len = k_pool.shape[2]
        key_mask = jnp.arange(max_len)[None] <= pos[:, None]  # [B, T]
        L = self.pp_block_len
        nb_local = params["block_list"][0]["input_norm"].shape[0]
        mi = ai = 0
        for blk in range(nb_local):
            for p in range(L):
                lp = {k: v[blk]
                      for k, v in params["block_list"][p].items()}
                res = h
                x = _rms(h, lp["input_norm"], a.rms_norm_eps)
                if a.is_attn(p):
                    q, k, v = self._qkv(lp, x)
                    k_pool = k_pool.at[ai, slots, pos].set(
                        k.astype(k_pool.dtype))
                    v_pool = v_pool.at[ai, slots, pos].set(
                        v.astype(v_pool.dtype))
                    keys = k_pool[ai][slots]            # [B, T, Hkv, d]
                    vals = v_pool[ai][slots]
                    qg = q.reshape(b_sz, a.num_kv_heads, groups,
                                   a.head_dim)
                    scores = jnp.einsum(
                        "bhgd,bthd->bhgt", qg.astype(jnp.float32),
                        keys.astype(jnp.float32)) * scale
                    scores = jnp.where(key_mask[:, None, None, :],
                                       scores, -1e30)
                    probs = jax.nn.softmax(scores, axis=-1)
                    out = jnp.einsum("bhgt,bthd->bhgd", probs,
                                     vals.astype(jnp.float32))
                    out = out.reshape(
                        b_sz, a.num_heads * a.head_dim).astype(
                        h.dtype) @ lp["wo"]
                    ai += 1
                else:
                    conv_state = conv_pool[mi][slots]
                    ssm_state = ssm_pool[mi][slots]
                    out, new_conv, new_ssm = self._mamba._mixer_step(
                        lp, x, conv_state, ssm_state)
                    conv_pool = conv_pool.at[mi, slots].set(new_conv)
                    ssm_pool = ssm_pool.at[mi, slots].set(new_ssm)
                    mi += 1
                h = res + out
                res = h
                x = _rms(h, lp["pre_ff_norm"], a.rms_norm_eps)
                h = res + self._ffn(lp, x)
        pos_pool = pos_pool.at[slots].set(pos + 1)
        return h, (conv_pool, ssm_pool, k_pool, v_pool, pos_pool)

    # ---- sizing ----------------------------------------------------------

    def param_bytes(self) -> int:
        a = self.arch
        total = a.vocab_size * a.hidden_size * 2 + a.hidden_size
        for i in range(a.num_layers):
            for shape in self._layer_shapes(i).values():
                n = 1
                for s in shape:
                    n *= s
                total += n
        return total * jnp.dtype(self.dtype).itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return 0

    def state_bytes_per_seq(self, dtype=jnp.float32,
                            max_len: int | None = None) -> int:
        a = self.arch
        mamba = a.num_mamba_layers * a.d_inner * (a.d_conv - 1 + a.d_state
                                                  ) * jnp.dtype(dtype
                                                                ).itemsize
        ml = max_len or 4096
        kv = (max(a.num_attn_layers, 1) * 2 * ml * a.num_kv_heads
              * a.head_dim * jnp.dtype(self.dtype).itemsize)
        return mamba + kv
