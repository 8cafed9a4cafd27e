"""BART encoder-decoder serving (reference
vllm/model_executor/models/bart.py; math mirrors HF modeling_bart).

TPU-native serving design: encoder-decoder requests ride the engine's
state-model path (one state slot per sequence, like Mamba/Jamba).  A
sequence's slot holds the per-decoder-layer CROSS-attention K/V (computed
once from the encoder output at prefill), the decoder's growing
SELF-attention K/V rows, the source length and a decoder position
counter.  ``forward_prefill`` runs the encoder over the prompt (= source
text) and decodes ONE step from ``decoder_start_token_id``;
``forward_decode_step`` appends one decoder token per sequence.  The
reference threads this through an encoder_seq_lens-aware scheduler and a
dual-cache attention backend; here it collapses into the existing
state-slot machinery.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .vision import layer_norm


@dataclass
class BartArch:
    vocab_size: int = 50265
    d_model: int = 768
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    pos_offset: int = 2
    scale_embedding: bool = False
    decoder_start_token_id: int = 2
    act: str = "gelu"
    # engine-compat attrs
    num_kv_heads: int = 1
    head_dim: int = 1
    rms_norm_eps: float = 1e-5
    num_labels: int = 0
    head_type: str = "none"

    @property
    def num_layers(self) -> int:
        return self.decoder_layers

    @property
    def hidden_size(self) -> int:
        return self.d_model

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "BartArch":
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            encoder_layers=cfg.get("encoder_layers", 6),
            decoder_layers=cfg.get("decoder_layers", 6),
            num_heads=cfg.get("decoder_attention_heads", 12),
            ffn_dim=cfg.get("decoder_ffn_dim", 3072),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            1024),
            scale_embedding=cfg.get("scale_embedding", False),
            decoder_start_token_id=cfg.get("decoder_start_token_id", 2),
            act=cfg.get("activation_function", "gelu"),
        )

    @property
    def hd(self) -> int:
        return self.d_model // self.num_heads


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class BartModel:
    architecture = "mamba"      # rides the state-slot serving path

    def __init__(self, arch: BartArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    # ---- params ----------------------------------------------------------

    def _layer_names(self, cross: bool):
        names = ["sa_q_w", "sa_q_b", "sa_k_w", "sa_k_b", "sa_v_w",
                 "sa_v_b", "sa_o_w", "sa_o_b", "sa_ln_w", "sa_ln_b",
                 "fc1_w", "fc1_b", "fc2_w", "fc2_b", "ffn_ln_w",
                 "ffn_ln_b"]
        if cross:
            names += ["ca_q_w", "ca_q_b", "ca_k_w", "ca_k_b", "ca_v_w",
                      "ca_v_b", "ca_o_w", "ca_o_b", "ca_ln_w", "ca_ln_b"]
        return names

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a = self.arch
        rng = np.random.default_rng(seed)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

        d, f = a.d_model, a.ffn_dim

        def stack(n, cross):
            out = {}
            for name in self._layer_names(cross):
                if name.endswith("ln_w"):
                    out[name] = ones(n, d)
                elif name.endswith("_b") or "ln" in name:
                    width = f if name == "fc1_b" else d
                    out[name] = zeros(n, width)
                elif name == "fc1_w":
                    out[name] = w(n, d, f)
                elif name == "fc2_w":
                    out[name] = w(n, f, d)
                else:
                    out[name] = w(n, d, d)
            return out

        params = {
            "shared": w(a.vocab_size, d),
            "enc_pos": w(a.max_position_embeddings + a.pos_offset, d),
            "dec_pos": w(a.max_position_embeddings + a.pos_offset, d),
            "enc_ln_w": ones(d), "enc_ln_b": zeros(d),
            "dec_ln_w": ones(d), "dec_ln_b": zeros(d),
            "enc_layers": stack(a.encoder_layers, False),
            "dec_layers": stack(a.decoder_layers, True),
            "logits_bias": zeros(a.vocab_size),
        }
        if not as_numpy:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, self.dtype), params)
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a = self.arch
        if any(k.startswith("language_model.") for k in tensors):
            # Florence2 (reference florence2.py:194-264): the BART
            # language model lives under "language_model." with its own
            # lm_head; vision-tower weights are skipped (the reference
            # does the same, :257-264).
            tensors = {k[len("language_model."):]: v
                       for k, v in tensors.items()
                       if k.startswith("language_model.")}

        def t(name):
            return np.asarray(tensors[name])

        def stack(prefix, n, cross):
            acc = {k: [] for k in self._layer_names(cross)}
            for i in range(n):
                p = f"{prefix}.layers.{i}."
                acc["sa_q_w"].append(t(p + "self_attn.q_proj.weight").T)
                acc["sa_q_b"].append(t(p + "self_attn.q_proj.bias"))
                acc["sa_k_w"].append(t(p + "self_attn.k_proj.weight").T)
                acc["sa_k_b"].append(t(p + "self_attn.k_proj.bias"))
                acc["sa_v_w"].append(t(p + "self_attn.v_proj.weight").T)
                acc["sa_v_b"].append(t(p + "self_attn.v_proj.bias"))
                acc["sa_o_w"].append(t(p + "self_attn.out_proj.weight").T)
                acc["sa_o_b"].append(t(p + "self_attn.out_proj.bias"))
                acc["sa_ln_w"].append(t(p + "self_attn_layer_norm.weight"))
                acc["sa_ln_b"].append(t(p + "self_attn_layer_norm.bias"))
                acc["fc1_w"].append(t(p + "fc1.weight").T)
                acc["fc1_b"].append(t(p + "fc1.bias"))
                acc["fc2_w"].append(t(p + "fc2.weight").T)
                acc["fc2_b"].append(t(p + "fc2.bias"))
                acc["ffn_ln_w"].append(t(p + "final_layer_norm.weight"))
                acc["ffn_ln_b"].append(t(p + "final_layer_norm.bias"))
                if cross:
                    acc["ca_q_w"].append(
                        t(p + "encoder_attn.q_proj.weight").T)
                    acc["ca_q_b"].append(t(p + "encoder_attn.q_proj.bias"))
                    acc["ca_k_w"].append(
                        t(p + "encoder_attn.k_proj.weight").T)
                    acc["ca_k_b"].append(t(p + "encoder_attn.k_proj.bias"))
                    acc["ca_v_w"].append(
                        t(p + "encoder_attn.v_proj.weight").T)
                    acc["ca_v_b"].append(t(p + "encoder_attn.v_proj.bias"))
                    acc["ca_o_w"].append(
                        t(p + "encoder_attn.out_proj.weight").T)
                    acc["ca_o_b"].append(
                        t(p + "encoder_attn.out_proj.bias"))
                    acc["ca_ln_w"].append(
                        t(p + "encoder_attn_layer_norm.weight"))
                    acc["ca_ln_b"].append(
                        t(p + "encoder_attn_layer_norm.bias"))
            return {k: np.stack(v) for k, v in acc.items()}

        params = {
            "shared": t("model.shared.weight"),
            "enc_pos": t("model.encoder.embed_positions.weight"),
            "dec_pos": t("model.decoder.embed_positions.weight"),
            "enc_ln_w": t("model.encoder.layernorm_embedding.weight"),
            "enc_ln_b": t("model.encoder.layernorm_embedding.bias"),
            "dec_ln_w": t("model.decoder.layernorm_embedding.weight"),
            "dec_ln_b": t("model.decoder.layernorm_embedding.bias"),
            "enc_layers": stack("model.encoder", a.encoder_layers, False),
            "dec_layers": stack("model.decoder", a.decoder_layers, True),
            "logits_bias": (np.asarray(tensors["final_logits_bias"]
                                       ).reshape(-1)
                            if "final_logits_bias" in tensors
                            else np.zeros(a.vocab_size, np.float32)),
        }
        if "lm_head.weight" in tensors:
            # Florence2 ships an untied lm_head (florence2.py:104-112;
            # the logits path uses the raw weight).
            params["lm_head"] = t("lm_head.weight").T
        if not as_numpy:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, self.dtype), params)
        return params

    # ---- state pools -------------------------------------------------------

    def make_state_pools(self, num_slots: int, max_len: int):
        a = self.arch
        kv = (a.decoder_layers, num_slots, max_len, a.num_heads, a.hd)
        return (jnp.zeros(kv, self.dtype),      # cross K
                jnp.zeros(kv, self.dtype),      # cross V
                jnp.zeros(kv, self.dtype),      # decoder self K
                jnp.zeros(kv, self.dtype),      # decoder self V
                jnp.zeros((num_slots,), jnp.int32),   # src len
                jnp.zeros((num_slots,), jnp.int32))   # decoder position

    # ---- attention helpers --------------------------------------------------

    def _mha(self, q, k, v, mask):
        """q [*, H, hd], k/v [T, H, hd] (or batched), mask over T."""
        a = self.arch
        s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (a.hd ** -0.5)
        s = jnp.where(mask[None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
        return o.reshape(q.shape[0], a.d_model)

    def _embed_encoder(self, params, tokens):
        a = self.arch
        t = tokens.shape[0]
        scale = (a.d_model ** 0.5) if a.scale_embedding else 1.0
        h = params["shared"][tokens] * scale \
            + params["enc_pos"][jnp.arange(t) + a.pos_offset]
        return layer_norm(h, params["enc_ln_w"], params["enc_ln_b"])

    def _embed_decoder(self, params, tok, step):
        a = self.arch
        h = (params["shared"][tok]
             * ((a.d_model ** 0.5) if a.scale_embedding else 1.0)
             + params["dec_pos"][step + a.pos_offset])
        return layer_norm(h[None], params["dec_ln_w"],
                          params["dec_ln_b"])[0]

    def _encoder_layers(self, params, h, length):
        """Encoder stack on already-embedded input ``h`` [t, D]."""
        a = self.arch
        t = h.shape[0]
        valid = jnp.arange(t) < length

        def layer(h, lp):
            res = h
            q = (h @ lp["sa_q_w"] + lp["sa_q_b"]).reshape(t, a.num_heads,
                                                          a.hd)
            k = (h @ lp["sa_k_w"] + lp["sa_k_b"]).reshape(t, a.num_heads,
                                                          a.hd)
            v = (h @ lp["sa_v_w"] + lp["sa_v_b"]).reshape(t, a.num_heads,
                                                          a.hd)
            o = self._mha(q, k, v, valid).astype(h.dtype)
            h = layer_norm(res + (o @ lp["sa_o_w"] + lp["sa_o_b"]),
                           lp["sa_ln_w"], lp["sa_ln_b"])
            res = h
            x = _gelu(h @ lp["fc1_w"] + lp["fc1_b"])
            h = layer_norm(res + (x @ lp["fc2_w"] + lp["fc2_b"]),
                           lp["ffn_ln_w"], lp["ffn_ln_b"])
            return h, None

        h, _ = jax.lax.scan(layer, h, params["enc_layers"])
        return h                                         # [t, D]

    def _encoder(self, params, tokens, length):
        return self._encoder_layers(params,
                                    self._embed_encoder(params, tokens),
                                    length)

    def _decoder_step(self, params, tok, slot_state, step):
        """One decoder token.  ``slot_state`` = per-layer views
        (cross_k/v [Ld, T, H, hd], self_k/v [Ld, T, H, hd]), step = current
        decoder position.  Returns (hidden [D], new self K/V rows
        [Ld, H, hd] each)."""
        h = self._embed_decoder(params, tok, step)
        return self._decoder_layers(params, h, slot_state, step)

    def _decoder_layers(self, params, h, slot_state, step):
        """Decoder stack on an already-embedded hidden ``h`` [D] — under
        pipeline parallelism ``params["dec_layers"]`` and the slot_state
        views are this stage's local slices."""
        a = self.arch
        ck, cv, sk, sv, src_len = slot_state
        max_len = sk.shape[1]

        cross_mask = jnp.arange(max_len) < src_len
        self_mask = jnp.arange(max_len) <= step

        def layer(carry, xs):
            h, li = carry
            lp = xs
            res = h
            q = (h @ lp["sa_q_w"] + lp["sa_q_b"]).reshape(1, a.num_heads,
                                                          a.hd)
            k_new = (h @ lp["sa_k_w"] + lp["sa_k_b"]).reshape(a.num_heads,
                                                              a.hd)
            v_new = (h @ lp["sa_v_w"] + lp["sa_v_b"]).reshape(a.num_heads,
                                                              a.hd)
            keys = jax.lax.dynamic_update_index_in_dim(
                sk[li], k_new.astype(sk.dtype), step, axis=0)
            vals = jax.lax.dynamic_update_index_in_dim(
                sv[li], v_new.astype(sv.dtype), step, axis=0)
            o = self._mha(q, keys, vals, self_mask)[0].astype(h.dtype)
            h = layer_norm((res + (o @ lp["sa_o_w"] + lp["sa_o_b"]))[None],
                           lp["sa_ln_w"], lp["sa_ln_b"])[0]
            res = h
            q = (h @ lp["ca_q_w"] + lp["ca_q_b"]).reshape(1, a.num_heads,
                                                          a.hd)
            o = self._mha(q, ck[li], cv[li], cross_mask)[0].astype(h.dtype)
            h = layer_norm((res + (o @ lp["ca_o_w"] + lp["ca_o_b"]))[None],
                           lp["ca_ln_w"], lp["ca_ln_b"])[0]
            res = h
            x = _gelu(h @ lp["fc1_w"] + lp["fc1_b"])
            h = layer_norm((res + (x @ lp["fc2_w"] + lp["fc2_b"]))[None],
                           lp["ffn_ln_w"], lp["ffn_ln_b"])[0]
            return (h, li + 1), (k_new, v_new)

        (h, _), (k_rows, v_rows) = jax.lax.scan(
            layer, (h, 0), params["dec_layers"])
        return h, k_rows, v_rows

    # ---- serving interface ---------------------------------------------------

    def forward_prefill(self, params, tokens, length, slot, pools):
        """Prompt = SOURCE text: run the encoder, cache cross K/V, decode
        one step from decoder_start_token_id."""
        a = self.arch
        ck, cv, sk, sv, srcl, pos = pools
        t = tokens.shape[0]
        enc = self._encoder(params, tokens, length)       # [t, D]

        def cross_kv(lp):
            k = (enc @ lp["ca_k_w"] + lp["ca_k_b"]).reshape(
                t, a.num_heads, a.hd)
            v = (enc @ lp["ca_v_w"] + lp["ca_v_b"]).reshape(
                t, a.num_heads, a.hd)
            return k, v

        ks, vs = jax.vmap(cross_kv)(params["dec_layers"])  # [Ld, t, H, hd]
        ck = jax.lax.dynamic_update_slice(
            ck, ks.astype(ck.dtype)[:, None], (0, slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, vs.astype(cv.dtype)[:, None], (0, slot, 0, 0, 0))
        srcl = srcl.at[slot].set(length)

        slot_state = (ck[:, slot], cv[:, slot], sk[:, slot], sv[:, slot],
                      srcl[slot])
        h, k_rows, v_rows = self._decoder_step(
            params, jnp.int32(a.decoder_start_token_id), slot_state,
            jnp.int32(0))
        sk = sk.at[:, slot, 0].set(k_rows.astype(sk.dtype))
        sv = sv.at[:, slot, 0].set(v_rows.astype(sv.dtype))
        pos = pos.at[slot].set(1)
        return h[None], (ck, cv, sk, sv, srcl, pos)

    def forward_decode_step(self, params, tokens, slots, pools):
        ck, cv, sk, sv, srcl, pos = pools
        steps = pos[slots]                                 # [B]

        def one(tok, slot, step):
            state = (ck[:, slot], cv[:, slot], sk[:, slot], sv[:, slot],
                     srcl[slot])
            return self._decoder_step(params, tok, state, step)

        h, k_rows, v_rows = jax.vmap(one)(tokens, slots, steps)
        # k_rows [B, Ld, H, hd] -> scatter at (layer, slot, step), flat
        # indices row-major over (B, Ld).
        b = tokens.shape[0]
        ld = sk.shape[0]
        li = jnp.tile(jnp.arange(ld), b)
        si = jnp.repeat(slots, ld)
        ti = jnp.repeat(steps, ld)
        sk = sk.at[li, si, ti].set(
            k_rows.reshape(b * ld, *k_rows.shape[2:]).astype(sk.dtype))
        sv = sv.at[li, si, ti].set(
            v_rows.reshape(b * ld, *v_rows.shape[2:]).astype(sv.dtype))
        pos = pos.at[slots].set(steps + 1)
        return h, (ck, cv, sk, sv, srcl, pos)

    def logits(self, params, hidden):
        if "lm_head" in params:
            return hidden @ params["lm_head"] + params["logits_bias"]
        return hidden @ params["shared"].T + params["logits_bias"]

    # ---- pipeline parallelism --------------------------------------------
    # The decoder stack is homogeneous and already layer-stacked
    # (dec_layers), so it shards over "pipe" as-is; the encoder + embeds
    # replicate, and the encoder runs ONCE per prefill (every stage
    # computes the identical replicated pass before the wave scan,
    # pp_prefill_precompute).  The wave's hidden then carries the [t, D]
    # ENCODER OUTPUT rows plus 8 trailing rows, row t holding the
    # decoder-start hidden as it hops stages; each stage projects its
    # local layers' cross-KV from the shipped rows.  Reference analog:
    # vllm/model_executor/models/bart.py decoder layers under
    # get_pp_group partitioning.

    PP_EXTRA_ROWS = 8

    def embed(self, params, tokens):
        """Wave input: encoder-input embedding rows + 8 extra rows, row
        t = the embedded decoder start token (position 0)."""
        a = self.arch
        src = self._embed_encoder(params, tokens)
        dstart = self._embed_decoder(
            params, jnp.int32(a.decoder_start_token_id), jnp.int32(0))
        pad = jnp.zeros((self.PP_EXTRA_ROWS - 1, src.shape[1]), src.dtype)
        return jnp.concatenate([src, dstart[None], pad])

    def pp_embed_decode(self, params, tokens, slots, pools):
        """Decode-step embedding: token + decoder position from the
        per-slot counter (the shared PP body's embed hook)."""
        steps = pools[5][slots]
        return jax.vmap(lambda tok, s: self._embed_decoder(params, tok, s)
                        )(tokens, steps)

    def pp_final_hidden(self, params, h):
        """No final norm after the decoder stack (per-layer norms only)."""
        return h

    def pp_prefill_last(self, h, q_len):
        """The decoder hidden rides at row t = len(h) - PP_EXTRA_ROWS."""
        return h[h.shape[0] - self.PP_EXTRA_ROWS][None]

    def pp_prefill_precompute(self, params, h, length):
        """Run the (replicated) encoder ONCE before the wave scan and ship
        the encoder OUTPUT in the wave's source rows, so each stage's tick
        projects cross-KV from it instead of re-running the whole encoder
        stack per tick (was ~pp encoder passes per device; advisor r4)."""
        t = h.shape[0] - self.PP_EXTRA_ROWS
        enc = self._encoder_layers(params, h[:t], length)
        return h.at[:t].set(enc.astype(h.dtype))

    def forward_prefill_layers(self, params, h, length, slot, pools):
        """One prefill wave tick: read the pre-encoded source rows (see
        pp_prefill_precompute), write THIS stage's cross-KV + first
        self-KV rows at ``slot`` (the trash slot when inactive), advance
        the decoder-start hidden through the local decoder layers at
        row t."""
        a = self.arch
        ck, cv, sk, sv, srcl, pos = pools
        t = h.shape[0] - self.PP_EXTRA_ROWS
        enc = h[:t]

        def cross_kv(lp):
            k = (enc @ lp["ca_k_w"] + lp["ca_k_b"]).reshape(
                t, a.num_heads, a.hd)
            v = (enc @ lp["ca_v_w"] + lp["ca_v_b"]).reshape(
                t, a.num_heads, a.hd)
            return k, v

        ks, vs = jax.vmap(cross_kv)(params["dec_layers"])
        ck = jax.lax.dynamic_update_slice(
            ck, ks.astype(ck.dtype)[:, None], (0, slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, vs.astype(cv.dtype)[:, None], (0, slot, 0, 0, 0))
        srcl = srcl.at[slot].set(length)
        slot_state = (ck[:, slot], cv[:, slot], sk[:, slot], sv[:, slot],
                      srcl[slot])
        hdec, k_rows, v_rows = self._decoder_layers(
            params, h[t], slot_state, jnp.int32(0))
        sk = sk.at[:, slot, 0].set(k_rows.astype(sk.dtype))
        sv = sv.at[:, slot, 0].set(v_rows.astype(sv.dtype))
        pos = pos.at[slot].set(1)
        return h.at[t].set(hdec), (ck, cv, sk, sv, srcl, pos)

    def forward_decode_layers(self, params, h, slots, pools):
        """One batched decode step through the local decoder layers:
        h [B, D] (already embedded via pp_embed_decode), slots [B]."""
        ck, cv, sk, sv, srcl, pos_pool = pools
        steps = pos_pool[slots]

        def one(hi, slot, step):
            state = (ck[:, slot], cv[:, slot], sk[:, slot], sv[:, slot],
                     srcl[slot])
            return self._decoder_layers(params, hi, state, step)

        h2, k_rows, v_rows = jax.vmap(one)(h, slots, steps)
        b = h.shape[0]
        ld = sk.shape[0]
        li = jnp.tile(jnp.arange(ld), b)
        si = jnp.repeat(slots, ld)
        ti = jnp.repeat(steps, ld)
        sk = sk.at[li, si, ti].set(
            k_rows.reshape(b * ld, *k_rows.shape[2:]).astype(sk.dtype))
        sv = sv.at[li, si, ti].set(
            v_rows.reshape(b * ld, *v_rows.shape[2:]).astype(sv.dtype))
        pos_pool = pos_pool.at[slots].set(steps + 1)
        return h2, (ck, cv, sk, sv, srcl, pos_pool)

    # ---- sizing ----------------------------------------------------------

    def param_bytes(self) -> int:
        a = self.arch
        enc = a.encoder_layers * (4 * a.d_model ** 2
                                  + 2 * a.d_model * a.ffn_dim)
        dec = a.decoder_layers * (8 * a.d_model ** 2
                                  + 2 * a.d_model * a.ffn_dim)
        total = a.vocab_size * a.d_model + enc + dec
        return total * jnp.dtype(self.dtype).itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return 0

    def state_bytes_per_seq(self, dtype=jnp.float32,
                            max_len: int | None = None) -> int:
        a = self.arch
        ml = max_len or 1024
        return (4 * a.decoder_layers * ml * a.d_model
                * jnp.dtype(self.dtype).itemsize)
