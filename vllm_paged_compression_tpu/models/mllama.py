"""Mllama (Llama-3.2-11B/90B-Vision): gated two-stage vision encoder +
a Llama decoder with interleaved cross-attention layers, served on the
engine's state-slot path.

Reference: vllm/model_executor/models/mllama.py (+ HF modeling_mllama,
which the tests compare against token-exactly):

- Vision: conv patches (no bias), per-tile gated aspect-ratio embedding,
  CLS token, gated positional embedding (learned + per-aspect tile
  table), pre-LN, patch-axis padding to a multiple of 8, a LOCAL
  encoder whose per-layer inputs are collected, post-LN, a second
  gated aspect embedding, a GLOBAL gated encoder, then features =
  [global output | intermediate states (stacked feature-major)] and a
  biased linear projector into the text hidden size.
- Text: Llama layers except every layer in ``cross_attention_layers``
  is a cross-attention block: per-head RMS q-norm / k-norm, no rope,
  output and MLP gated by tanh scalars; rows before the image token
  (and all rows of image-less sequences) take the identity path —
  exactly HF's full_text_row_masked_out semantics for a single
  leading image.  Embedding has vocab_size + 8 rows (the image
  special tokens); lm_head covers vocab_size.

Serving design: like BART/Jamba, one state slot per sequence holds the
self-attention K/V rows, the CROSS K/V (computed once from the vision
states at prefill, k-norm already applied — HF caches the same), the
vision length, the image-token position, and the decode position.
Image intake: ``multi_modal_data={"image": tiles [T, 3, S, S],
"aspect_ratio_id": k}``; the host-side ``encode_cross_states`` runs the
vision tower at admission, and the decoder prompt keeps its single
<|image|> token (no span expansion).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rope import apply_rope, rope_cos_sin
from .llama import rms_norm
from .vision import layer_norm


@dataclass
class MllamaVisionArch:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_global_layers: int = 8
    num_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    max_num_tiles: int = 4
    max_aspect_ratio_id: int = 8
    intermediate_layers_indices: tuple = (3, 7, 15, 23, 30)
    norm_eps: float = 1e-5
    act: str = "gelu"

    @classmethod
    def from_hf_config(cls, vc: dict) -> "MllamaVisionArch":
        return cls(
            hidden_size=vc.get("hidden_size", 1280),
            intermediate_size=vc.get("intermediate_size", 5120),
            num_layers=vc.get("num_hidden_layers", 32),
            num_global_layers=vc.get("num_global_layers", 8),
            num_heads=vc.get("attention_heads",
                             vc.get("num_attention_heads", 16)),
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            max_num_tiles=vc.get("max_num_tiles", 4),
            max_aspect_ratio_id=vc.get("max_aspect_ratio_id", 8),
            intermediate_layers_indices=tuple(
                vc.get("intermediate_layers_indices") or (3, 7, 15, 23,
                                                          30)),
            norm_eps=vc.get("norm_eps", 1e-5),
            act=vc.get("hidden_act", "gelu"),
        )

    @property
    def p1(self) -> int:                     # patches + CLS
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def out_dim(self) -> int:
        return self.hidden_size * (1 + len(
            self.intermediate_layers_indices))


@dataclass
class MllamaTextArch:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 40
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: dict | None = None
    tie_word_embeddings: bool = False
    cross_layers: tuple = (3, 8, 13, 18, 23, 28, 33, 38)
    max_position_embeddings: int = 131072
    # engine-compat
    num_labels: int = 0
    head_type: str = "none"
    suppress_tokens = None

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MllamaTextArch":
        nh = cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=cfg.get("num_key_value_heads", nh),
            head_dim=cfg["hidden_size"] // nh,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 500000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            cross_layers=tuple(cfg.get("cross_attention_layers") or ()),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            131072),
        )

    def is_cross(self, i: int) -> bool:
        return i in self.cross_layers

    @property
    def layer_norm_eps(self) -> float:
        """Alias: the shared state-model PP bodies read
        ``arch.layer_norm_eps`` (parallel/pipeline.py)."""
        return self.rms_norm_eps


class MllamaModel:
    architecture = "mamba"          # state-slot serving path

    def __init__(self, text_arch: MllamaTextArch,
                 vision_arch: MllamaVisionArch, image_token_id: int,
                 dtype=jnp.bfloat16):
        self.arch = text_arch
        self.vision_arch = vision_arch
        self.image_token_id = image_token_id
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "MllamaModel":
        return cls(MllamaTextArch.from_hf_config(cfg["text_config"]),
                   MllamaVisionArch.from_hf_config(cfg["vision_config"]),
                   cfg.get("image_token_index", 128256), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def _text_layer_shapes(self, i: int):
        a = self.arch
        d = a.hidden_size
        q_sz = a.num_heads * a.head_dim
        kv_sz = a.num_kv_heads * a.head_dim
        shapes = {
            "wq": (d, q_sz), "wk": (d, kv_sz), "wv": (d, kv_sz),
            "wo": (q_sz, d),
            "input_norm": (d,), "post_norm": (d,),
            "w_gate_up": (d, 2 * a.intermediate_size),
            "w_down": (a.intermediate_size, d),
        }
        if a.is_cross(i):
            shapes.update({"q_norm": (a.head_dim,),
                           "k_norm": (a.head_dim,),
                           "gate_attn": (1,), "gate_mlp": (1,)})
        return shapes

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a, va = self.arch, self.vision_arch
        rng = np.random.default_rng(seed)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        layer_list = []
        for i in range(a.num_layers):
            lp = {}
            for k, shape in self._text_layer_shapes(i).items():
                if k.endswith("norm"):
                    lp[k] = np.ones(shape, np.float32)
                elif k.startswith("gate"):
                    lp[k] = np.zeros(shape, np.float32)
                else:
                    lp[k] = w(*shape)
            layer_list.append(lp)
        d, dv = a.hidden_size, va.hidden_size
        iv, p1, mt = va.intermediate_size, va.p1, va.max_num_tiles
        n_asp = va.max_aspect_ratio_id + 1

        def enc_layers(n, gated):
            out = {
                "ln1_w": np.ones((n, dv), np.float32),
                "ln1_b": np.zeros((n, dv), np.float32),
                "wq": w(n, dv, dv), "wk": w(n, dv, dv),
                "wv": w(n, dv, dv), "wo": w(n, dv, dv),
                "ln2_w": np.ones((n, dv), np.float32),
                "ln2_b": np.zeros((n, dv), np.float32),
                "fc1_w": w(n, dv, iv), "fc1_b": np.zeros((n, iv),
                                                         np.float32),
                "fc2_w": w(n, iv, dv), "fc2_b": np.zeros((n, dv),
                                                         np.float32),
            }
            if gated:
                out["gate_attn"] = np.zeros((n, 1), np.float32)
                out["gate_ffn"] = np.zeros((n, 1), np.float32)
            return out

        params = {
            "embed": w(a.vocab_size + 8, d),
            "final_norm": np.ones(d, np.float32),
            "lm_head": w(d, a.vocab_size),
            "layer_list": layer_list,
            "vision": {
                "patch_w": w(3 * va.patch_size ** 2, dv),
                "cls": w(dv),
                "pos": w(p1, dv), "pos_gate": np.zeros(1, np.float32),
                "tile_pos": w(n_asp, mt * p1 * dv),
                "pre_tile": w(n_asp, mt * dv),
                "pre_tile_gate": np.zeros(1, np.float32),
                "post_tile": w(n_asp, mt * dv),
                "post_tile_gate": np.zeros(1, np.float32),
                "ln_pre_w": np.ones(dv, np.float32),
                "ln_pre_b": np.zeros(dv, np.float32),
                "ln_post_w": np.ones(dv, np.float32),
                "ln_post_b": np.zeros(dv, np.float32),
                "local": enc_layers(va.num_layers, False),
                "global": enc_layers(va.num_global_layers, True),
            },
            "proj_w": w(va.out_dim, d),
            "proj_b": np.zeros(d, np.float32),
        }
        if not as_numpy:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, self.dtype), params)
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a, va = self.arch, self.vision_arch
        # Normalize both HF layouts ("model.vision_model.*" /
        # "vision_model.*", "language_model.model.*" /
        # "model.language_model.*", top-level or nested lm_head).
        norm = {}
        for k, v in tensors.items():
            if k.startswith("model."):
                k = k[len("model."):]
            if k.startswith("language_model.model."):
                k = "language_model." + k[len("language_model.model."):]
            norm[k] = v

        def t(name):
            return np.asarray(norm[name])

        layer_list = []
        for i in range(a.num_layers):
            p = f"language_model.layers.{i}."
            lp = {
                "input_norm": t(p + "input_layernorm.weight"),
                "post_norm": t(p + "post_attention_layernorm.weight"),
                "w_gate_up": np.concatenate(
                    [t(p + "mlp.gate_proj.weight").T,
                     t(p + "mlp.up_proj.weight").T], axis=1),
                "w_down": t(p + "mlp.down_proj.weight").T,
            }
            ap = p + ("cross_attn." if a.is_cross(i) else "self_attn.")
            for nm in ("q", "k", "v", "o"):
                lp[f"w{nm}"] = t(ap + f"{nm}_proj.weight").T
            if a.is_cross(i):
                lp["q_norm"] = t(ap + "q_norm.weight")
                lp["k_norm"] = t(ap + "k_norm.weight")
                lp["gate_attn"] = t(p + "cross_attn_attn_gate")
                lp["gate_mlp"] = t(p + "cross_attn_mlp_gate")
            layer_list.append(lp)

        def enc(prefix, n, gated):
            acc = {k: [] for k in
                   ("ln1_w", "ln1_b", "wq", "wk", "wv", "wo", "ln2_w",
                    "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")
                   + (("gate_attn", "gate_ffn") if gated else ())}
            for li in range(n):
                p = f"{prefix}.layers.{li}."
                acc["ln1_w"].append(t(p + "input_layernorm.weight"))
                acc["ln1_b"].append(t(p + "input_layernorm.bias"))
                for nm in ("q", "k", "v", "o"):
                    acc[f"w{nm}"].append(
                        t(p + f"self_attn.{nm}_proj.weight").T)
                acc["ln2_w"].append(
                    t(p + "post_attention_layernorm.weight"))
                acc["ln2_b"].append(
                    t(p + "post_attention_layernorm.bias"))
                acc["fc1_w"].append(t(p + "mlp.fc1.weight").T)
                acc["fc1_b"].append(t(p + "mlp.fc1.bias"))
                acc["fc2_w"].append(t(p + "mlp.fc2.weight").T)
                acc["fc2_b"].append(t(p + "mlp.fc2.bias"))
                if gated:
                    acc["gate_attn"].append(t(p + "gate_attn"))
                    acc["gate_ffn"].append(t(p + "gate_ffn"))
            return {k: np.stack(v) for k, v in acc.items()}

        vp = "vision_model."
        conv = t(vp + "patch_embedding.weight")
        vision = {
            "patch_w": conv.reshape(va.hidden_size, -1).T,
            "cls": t(vp + "class_embedding"),
            "pos": t(vp + "gated_positional_embedding.embedding"),
            "pos_gate": t(vp + "gated_positional_embedding.gate"),
            "tile_pos": t(
                vp + "gated_positional_embedding.tile_embedding.weight"),
            "pre_tile": t(
                vp + "pre_tile_positional_embedding.embedding.weight"),
            "pre_tile_gate": t(
                vp + "pre_tile_positional_embedding.gate"),
            "post_tile": t(
                vp + "post_tile_positional_embedding.embedding.weight"),
            "post_tile_gate": t(
                vp + "post_tile_positional_embedding.gate"),
            "ln_pre_w": t(vp + "layernorm_pre.weight"),
            "ln_pre_b": t(vp + "layernorm_pre.bias"),
            "ln_post_w": t(vp + "layernorm_post.weight"),
            "ln_post_b": t(vp + "layernorm_post.bias"),
            "local": enc(vp + "transformer", va.num_layers, False),
            "global": enc(vp + "global_transformer",
                          va.num_global_layers, True),
        }
        params = {
            "embed": t("language_model.embed_tokens.weight"),
            "final_norm": t("language_model.norm.weight"),
            "lm_head": (t("lm_head.weight").T
                        if "lm_head.weight" in norm else
                        t("language_model.embed_tokens.weight"
                          )[:a.vocab_size].T),
            "layer_list": layer_list,
            "vision": vision,
            "proj_w": t("multi_modal_projector.weight").T,
            "proj_b": t("multi_modal_projector.bias"),
        }
        if not as_numpy:
            params = jax.tree.map(
                lambda x: jnp.asarray(x, self.dtype), params)
        return params

    # ---- vision ---------------------------------------------------------

    def _encoder_stack(self, layers, h, key_valid, nh, gated,
                       collect=False):
        """Pre-norm ViT blocks over [L_tok, D].  Masking matches HF's
        _prepare_aspect_ratio_attention_mask exactly: the mask is the
        OUTER PRODUCT of the invalid-token vector with itself, so only
        invalid-query x invalid-key pairs are blocked (valid queries DO
        attend to the zero pad patches).  ``collect`` returns each
        layer's OUTPUT (HF MllamaVisionEncoder's hidden_states
        layout)."""
        va = self.vision_arch
        dv = va.hidden_size
        hd = dv // nh
        scale = hd ** -0.5
        act = (lambda x: jax.nn.gelu(x, approximate=False)) \
            if va.act == "gelu" else jax.nn.gelu
        n = jax.tree.leaves(layers)[0].shape[0]
        states = []
        for li in range(n):
            lp = jax.tree.map(lambda x: x[li], layers)
            x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], va.norm_eps)
            tq = x.shape[0]
            q = (x @ lp["wq"]).reshape(tq, nh, hd)
            k = (x @ lp["wk"]).reshape(tq, nh, hd)
            v = (x @ lp["wv"]).reshape(tq, nh, hd)
            s = jnp.einsum("qhd,khd->hqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            inv = ~key_valid
            s = jnp.where((inv[:, None] & inv[None, :])[None], -1e30, s)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("hqk,khd->qhd", p, v).reshape(tq, dv)
            o = o @ lp["wo"]
            if gated:
                o = jnp.tanh(lp["gate_attn"]) * o
            h = h + o
            x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], va.norm_eps)
            x = act(x @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] \
                + lp["fc2_b"]
            if gated:
                x = jnp.tanh(lp["gate_ffn"]) * x
            h = h + x
            if collect:
                states.append(h)          # HF collects layer OUTPUTS
        return h, states

    def encode_vision(self, params: dict, tiles: jnp.ndarray,
                      aspect_ratio_id) -> jnp.ndarray:
        """tiles [T, 3, S, S] + aspect id -> projected cross-attention
        states [T * p1, text_hidden] (HF MllamaVisionModel.forward +
        multi_modal_projector)."""
        va = self.vision_arch
        vis = params["vision"]
        ps = va.patch_size
        g = va.image_size // ps
        nt = tiles.shape[0]
        p1 = va.p1
        dv = va.hidden_size
        aid = jnp.asarray(aspect_ratio_id, jnp.int32)

        x = tiles.astype(self.dtype).reshape(nt, 3, g, ps, g, ps)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(
            nt, g * g, 3 * ps * ps)
        h = x @ vis["patch_w"]                          # [T, P, D]
        pre = vis["pre_tile"][aid].reshape(va.max_num_tiles, 1, dv)
        h = h + jnp.tanh(vis["pre_tile_gate"]) * pre[:nt]
        h = jnp.concatenate(
            [jnp.broadcast_to(vis["cls"][None, None], (nt, 1, dv)), h],
            axis=1)                                     # [T, p1, D]
        gate = jnp.tanh(vis["pos_gate"])
        h = h + (1.0 - gate) * vis["pos"][None]
        tile_pos = vis["tile_pos"][aid].reshape(va.max_num_tiles, p1, dv)
        h = h + gate * tile_pos[:nt]
        h = layer_norm(h, vis["ln_pre_w"], vis["ln_pre_b"], va.norm_eps)

        npad = (8 - p1 % 8) % 8
        if npad:
            h = jnp.pad(h, ((0, 0), (0, npad), (0, 0)))
        pp = p1 + npad
        key_valid = jnp.tile(jnp.arange(pp) < p1, nt)
        h = h.reshape(nt * pp, dv)
        h, states = self._encoder_stack(vis["local"], h, key_valid,
                                        va.num_heads, gated=False,
                                        collect=True)
        h = layer_norm(h, vis["ln_post_w"], vis["ln_post_b"],
                       va.norm_eps)
        h = h.reshape(nt, pp, dv)
        post = vis["post_tile"][aid].reshape(va.max_num_tiles, 1, dv)
        h = h + jnp.tanh(vis["post_tile_gate"]) * post[:nt]
        h, _ = self._encoder_stack(vis["global"], h.reshape(nt * pp, dv),
                                   key_valid, va.num_heads, gated=True)
        h = h.reshape(nt, pp, dv)[:, :p1]
        # intermediate states: stack feature-major then flatten (HF
        # torch.stack(dim=-1).reshape -> index d*K + k).
        inter = jnp.stack(
            [states[i].reshape(nt, pp, dv)[:, :p1]
             for i in va.intermediate_layers_indices], axis=-1)
        inter = inter.reshape(nt, p1, -1)
        feats = jnp.concatenate([h, inter], axis=-1)    # [T, p1, out_dim]
        out = feats.reshape(nt * p1, va.out_dim)
        return out @ params["proj_w"] + params["proj_b"]

    # ---- image intake (engine hooks) --------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        s = self.vision_arch.image_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s) \
                or pixel_values.shape[0] > self.vision_arch.max_num_tiles:
            raise ValueError(
                f"expected tiles [T<={self.vision_arch.max_num_tiles}, 3, "
                f"{s}, {s}], got {pixel_values.shape}")
        return pixel_values

    def encode_cross_states(self, params: dict, pixel_values,
                            mm_data: dict) -> jnp.ndarray:
        """Host-side vision encode at admission; the decoder prompt keeps
        its single <|image|> placeholder (cross attention, no splice)."""
        tiles = self.validate_image(np.asarray(pixel_values, np.float32))
        aid = int(mm_data.get("aspect_ratio_id", 1))
        return self.encode_vision(params, jnp.asarray(tiles), aid)

    # ---- serving state ----------------------------------------------------

    @property
    def max_vis_tokens(self) -> int:
        return self.vision_arch.max_num_tiles * self.vision_arch.p1

    def make_state_pools(self, num_slots: int, max_len: int):
        a = self.arch
        n_self = a.num_layers - len(a.cross_layers)
        n_cross = max(len(a.cross_layers), 1)
        kv = (n_self, num_slots, max_len, a.num_kv_heads, a.head_dim)
        ckv = (n_cross, num_slots, self.max_vis_tokens, a.num_kv_heads,
               a.head_dim)
        return (jnp.zeros(kv, self.dtype), jnp.zeros(kv, self.dtype),
                jnp.zeros(ckv, self.dtype), jnp.zeros(ckv, self.dtype),
                jnp.zeros((num_slots,), jnp.int32),    # vis len
                jnp.zeros((num_slots,), jnp.int32),    # image-token pos
                jnp.zeros((num_slots,), jnp.int32))    # decode position

    # ---- decoder pieces ---------------------------------------------------

    def _mlp(self, lp, x):
        a = self.arch
        gu = x @ lp["w_gate_up"]
        gate = gu[..., :a.intermediate_size]
        up = gu[..., a.intermediate_size:]
        return (jax.nn.silu(gate) * up) @ lp["w_down"]

    def _cross_attn(self, lp, x, ck, cv, vis_valid):
        """x [T, D] against cached (k-normed) cross K/V [V, Hkv, d];
        vis_valid [V] bool.  Returns gated-ready attention output."""
        a = self.arch
        t = x.shape[0]
        groups = a.num_heads // a.num_kv_heads
        q = (x @ lp["wq"]).reshape(t, a.num_heads, a.head_dim)
        q = rms_norm(q, lp["q_norm"], a.rms_norm_eps)
        qg = q.reshape(t, a.num_kv_heads, groups, a.head_dim)
        s = jnp.einsum("thgd,vhd->thgv", qg.astype(jnp.float32),
                       ck.astype(jnp.float32)) * (a.head_dim ** -0.5)
        s = jnp.where(vis_valid[None, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("thgv,vhd->thgd", p, cv.astype(jnp.float32))
        o = o.reshape(t, a.num_heads * a.head_dim).astype(x.dtype)
        return o @ lp["wo"]

    # ---- full forwards ----------------------------------------------------

    def forward_prefill(self, params, tokens, length, slot, pools,
                        cross_states=None, img_start=None):
        """Prompt forward for ONE sequence.  ``cross_states``
        [vis_len, D] (host-encoded) or None for text-only."""
        from ..ops.attention import prefill_attention
        a = self.arch
        sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool = pools
        t = tokens.shape[0]
        h = params["embed"][tokens]
        valid = (jnp.arange(t) < length)[:, None, None]
        cos, sin = rope_cos_sin(jnp.arange(t), a.head_dim, a.rope_theta,
                                scaling=a.rope_scaling)
        max_vis = self.max_vis_tokens
        if cross_states is not None:
            vis_len = jnp.int32(cross_states.shape[0])
            istart = jnp.int32(img_start if img_start is not None else 0)
            cs = jnp.zeros((max_vis, a.hidden_size), self.dtype)
            cs = jax.lax.dynamic_update_slice(
                cs, cross_states.astype(self.dtype), (0, 0))
        else:
            vis_len = jnp.int32(0)
            istart = jnp.int32(0)
            cs = None
        vis_valid = jnp.arange(max_vis) < vis_len
        # HF full_text_row_masked_out: rows strictly before the image
        # token take the identity path through cross layers.
        row_on = ((jnp.arange(t) >= istart)
                  & (vis_len > 0))[:, None].astype(h.dtype)

        si = ci = 0
        for i, lp in enumerate(params["layer_list"]):
            res = h
            x = rms_norm(h, lp["input_norm"], a.rms_norm_eps)
            if a.is_cross(i):
                if cs is not None:
                    k = (cs @ lp["wk"]).reshape(
                        max_vis, a.num_kv_heads, a.head_dim)
                    k = rms_norm(k, lp["k_norm"], a.rms_norm_eps)
                    v = (cs @ lp["wv"]).reshape(
                        max_vis, a.num_kv_heads, a.head_dim)
                    ck = ck.at[ci, slot].set(k.astype(ck.dtype))
                    cv = cv.at[ci, slot].set(v.astype(cv.dtype))
                    out = self._cross_attn(lp, x, k, v, vis_valid)
                    out = out * row_on
                    h = res + jnp.tanh(lp["gate_attn"]) * out
                    res = h
                    x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                    mlp = self._mlp(lp, x) * row_on
                    h = res + jnp.tanh(lp["gate_mlp"]) * mlp
                # text-only: identity (HF skips image-less cross layers)
                ci += 1
                continue
            q = (x @ lp["wq"]).reshape(t, a.num_heads, a.head_dim)
            k = (x @ lp["wk"]).reshape(t, a.num_kv_heads, a.head_dim)
            v = (x @ lp["wv"]).reshape(t, a.num_kv_heads, a.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            out = prefill_attention(q, k, v, a.head_dim ** -0.5, length)
            out = out.reshape(t, a.num_heads * a.head_dim) @ lp["wo"]
            sk = sk.at[si, slot, :t].set(
                jnp.where(valid, k, 0).astype(sk.dtype))
            sv = sv.at[si, slot, :t].set(
                jnp.where(valid, v, 0).astype(sv.dtype))
            si += 1
            h = res + out
            res = h
            x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
            h = res + self._mlp(lp, x)
        vlen_pool = vlen_pool.at[slot].set(vis_len)
        istart_pool = istart_pool.at[slot].set(istart)
        pos_pool = pos_pool.at[slot].set(length)
        h = rms_norm(h, params["final_norm"], a.rms_norm_eps)
        return h[length - 1][None], (sk, sv, ck, cv, vlen_pool,
                                     istart_pool, pos_pool)

    def forward_decode_step(self, params, tokens, slots, pools):
        a = self.arch
        sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool = pools
        b = tokens.shape[0]
        h = params["embed"][tokens]
        pos = pos_pool[slots]
        vis_len = vlen_pool[slots]
        iota_b = jnp.arange(b)
        groups = a.num_heads // a.num_kv_heads
        max_len = sk.shape[2]
        max_vis = ck.shape[2]
        key_mask = jnp.arange(max_len)[None] <= pos[:, None]
        vis_valid = jnp.arange(max_vis)[None] < vis_len[:, None]
        # decode rows are always past the image token; gate on presence.
        row_on = (vis_len > 0)[:, None].astype(h.dtype)
        cos, sin = rope_cos_sin(pos, a.head_dim, a.rope_theta,
                                scaling=a.rope_scaling)
        si = ci = 0
        for i, lp in enumerate(params["layer_list"]):
            res = h
            x = rms_norm(h, lp["input_norm"], a.rms_norm_eps)
            if a.is_cross(i):
                t1 = x.shape[0]
                q = (x @ lp["wq"]).reshape(t1, a.num_heads, a.head_dim)
                q = rms_norm(q, lp["q_norm"], a.rms_norm_eps)
                qg = q.reshape(b, a.num_kv_heads, groups, a.head_dim)
                keys = ck[ci][slots]                # [B, V, Hkv, d]
                vals = cv[ci][slots]
                s = jnp.einsum("bhgd,bvhd->bhgv",
                               qg.astype(jnp.float32),
                               keys.astype(jnp.float32)) \
                    * (a.head_dim ** -0.5)
                s = jnp.where(vis_valid[:, None, None, :], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                # image-less rows: renormalized garbage — zeroed below.
                o = jnp.einsum("bhgv,bvhd->bhgd", p,
                               vals.astype(jnp.float32))
                o = o.reshape(b, a.num_heads * a.head_dim).astype(
                    h.dtype) @ lp["wo"]
                h = res + jnp.tanh(lp["gate_attn"]) * (o * row_on)
                res = h
                x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                mlp = self._mlp(lp, x) * row_on
                h = res + jnp.tanh(lp["gate_mlp"]) * mlp
                ci += 1
                continue
            q = (x @ lp["wq"]).reshape(b, a.num_heads, a.head_dim)
            k = (x @ lp["wk"]).reshape(b, a.num_kv_heads, a.head_dim)
            v = (x @ lp["wv"]).reshape(b, a.num_kv_heads, a.head_dim)
            q, k = apply_rope(q, k, cos, sin)
            sk = sk.at[si, slots, pos].set(k.astype(sk.dtype))
            sv = sv.at[si, slots, pos].set(v.astype(sv.dtype))
            keys = sk[si][slots]
            vals = sv[si][slots]
            qg = q.reshape(b, a.num_kv_heads, groups, a.head_dim)
            s = jnp.einsum("bhgd,bthd->bhgt", qg.astype(jnp.float32),
                           keys.astype(jnp.float32)) \
                * (a.head_dim ** -0.5)
            s = jnp.where(key_mask[:, None, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhgt,bthd->bhgd", p,
                             vals.astype(jnp.float32))
            out = out.reshape(b, a.num_heads * a.head_dim).astype(
                h.dtype) @ lp["wo"]
            si += 1
            h = res + out
            res = h
            x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
            h = res + self._mlp(lp, x)
        pos_pool = pos_pool.at[slots].set(pos + 1)
        h = rms_norm(h, params["final_norm"], a.rms_norm_eps)
        return h, (sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool)

    def logits(self, params, hidden):
        return hidden @ params["lm_head"]

    # ---- pipeline parallelism: period-block form -------------------------
    # HF Llama-3.2-Vision places cross-attention layers on a regular
    # period (cross_attention_layers = [3, 8, 13, ...]), so layer kinds
    # are block-periodic exactly like Jamba's: layer_list restacks into
    # per-position leaves [num_blocks, ...] sharded over "pipe", and the
    # layer-major self-/cross-KV pools slice evenly (each block holds
    # period-1 self layers + 1 cross layer).  Host-encoded vision states
    # reach every stage's prefill wave tick via the replicated batch
    # (pp_prefill_wave_mamba's ``extra``).  Aperiodic cross lists raise
    # at engine build.  Reference analog: vllm/model_executor/models/
    # mllama.py decoder under PP partitioning.

    @property
    def pp_block_len(self) -> int:
        a = self.arch
        cross = sorted(a.cross_layers)
        if not cross:
            raise ValueError("Mllama PP needs cross-attention layers")
        period = (cross[1] - cross[0]) if len(cross) > 1 \
            else a.num_layers
        offset = cross[0] % period
        ok = (a.num_layers % period == 0
              and all((i % period == offset) == a.is_cross(i)
                      for i in range(a.num_layers)))
        if not ok:
            raise ValueError(
                f"Mllama PP needs a periodic cross-attention pattern, "
                f"got {cross} over {a.num_layers} layers")
        return period

    def to_block_form(self, params: dict) -> dict:
        """Restack ``layer_list`` into per-position ``block_list``
        leaves [num_blocks, ...] (one-time, engine build with PP on)."""
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

    def _pp_kind_cross(self, p: int) -> bool:
        a = self.arch
        period = self.pp_block_len
        return p % period == (sorted(a.cross_layers)[0] % period)

    def forward_prefill_layers(self, params, h, length, slot, pools,
                               cross_states=None, img_start=None):
        """Prompt forward through this stage's local blocks (block-form
        params): writes self-KV rows, cross-KV, and the per-slot
        counters at ``slot`` (trash slot on inactive wave ticks)."""
        from ..ops.attention import prefill_attention
        a = self.arch
        sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool = pools
        t = h.shape[0]
        valid = (jnp.arange(t) < length)[:, None, None]
        cos, sin = rope_cos_sin(jnp.arange(t), a.head_dim, a.rope_theta,
                                scaling=a.rope_scaling)
        max_vis = self.max_vis_tokens
        if cross_states is not None:
            vis_len = jnp.int32(cross_states.shape[0])
            istart = jnp.int32(img_start if img_start is not None else 0)
            cs = jnp.zeros((max_vis, a.hidden_size), self.dtype)
            cs = jax.lax.dynamic_update_slice(
                cs, cross_states.astype(self.dtype), (0, 0))
        else:
            vis_len = jnp.int32(0)
            istart = jnp.int32(0)
            cs = None
        vis_valid = jnp.arange(max_vis) < vis_len
        row_on = ((jnp.arange(t) >= istart)
                  & (vis_len > 0))[:, None].astype(h.dtype)
        L = self.pp_block_len
        nb_local = params["block_list"][0]["input_norm"].shape[0]
        si = ci = 0
        for b in range(nb_local):
            for p in range(L):
                lp = {k: v[b] for k, v in params["block_list"][p].items()}
                res = h
                x = rms_norm(h, lp["input_norm"], a.rms_norm_eps)
                if self._pp_kind_cross(p):
                    if cs is not None:
                        k = (cs @ lp["wk"]).reshape(
                            max_vis, a.num_kv_heads, a.head_dim)
                        k = rms_norm(k, lp["k_norm"], a.rms_norm_eps)
                        v = (cs @ lp["wv"]).reshape(
                            max_vis, a.num_kv_heads, a.head_dim)
                        ck = ck.at[ci, slot].set(k.astype(ck.dtype))
                        cv = cv.at[ci, slot].set(v.astype(cv.dtype))
                        out = self._cross_attn(lp, x, k, v, vis_valid)
                        out = out * row_on
                        h = res + jnp.tanh(lp["gate_attn"]) * out
                        res = h
                        x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                        mlp = self._mlp(lp, x) * row_on
                        h = res + jnp.tanh(lp["gate_mlp"]) * mlp
                    ci += 1
                    continue
                q = (x @ lp["wq"]).reshape(t, a.num_heads, a.head_dim)
                k = (x @ lp["wk"]).reshape(t, a.num_kv_heads, a.head_dim)
                v = (x @ lp["wv"]).reshape(t, a.num_kv_heads, a.head_dim)
                q, k = apply_rope(q, k, cos, sin)
                out = prefill_attention(q, k, v, a.head_dim ** -0.5,
                                        length)
                out = out.reshape(t, a.num_heads * a.head_dim) @ lp["wo"]
                sk = sk.at[si, slot, :t].set(
                    jnp.where(valid, k, 0).astype(sk.dtype))
                sv = sv.at[si, slot, :t].set(
                    jnp.where(valid, v, 0).astype(sv.dtype))
                si += 1
                h = res + out
                res = h
                x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                h = res + self._mlp(lp, x)
        vlen_pool = vlen_pool.at[slot].set(vis_len)
        istart_pool = istart_pool.at[slot].set(istart)
        pos_pool = pos_pool.at[slot].set(length)
        return h, (sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool)

    def forward_decode_layers(self, params, h, slots, pools):
        """One batched decode step through this stage's local blocks
        (block-form params): h [B, D] (embedded), slots [B]."""
        a = self.arch
        sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool = pools
        b_sz = h.shape[0]
        pos = pos_pool[slots]
        vis_len = vlen_pool[slots]
        groups = a.num_heads // a.num_kv_heads
        max_len = sk.shape[2]
        max_vis = ck.shape[2]
        key_mask = jnp.arange(max_len)[None] <= pos[:, None]
        vis_valid = jnp.arange(max_vis)[None] < vis_len[:, None]
        row_on = (vis_len > 0)[:, None].astype(h.dtype)
        cos, sin = rope_cos_sin(pos, a.head_dim, a.rope_theta,
                                scaling=a.rope_scaling)
        L = self.pp_block_len
        nb_local = params["block_list"][0]["input_norm"].shape[0]
        si = ci = 0
        for blk in range(nb_local):
            for p in range(L):
                lp = {k: v[blk]
                      for k, v in params["block_list"][p].items()}
                res = h
                x = rms_norm(h, lp["input_norm"], a.rms_norm_eps)
                if self._pp_kind_cross(p):
                    q = (x @ lp["wq"]).reshape(b_sz, a.num_heads,
                                               a.head_dim)
                    q = rms_norm(q, lp["q_norm"], a.rms_norm_eps)
                    qg = q.reshape(b_sz, a.num_kv_heads, groups,
                                   a.head_dim)
                    keys = ck[ci][slots]
                    vals = cv[ci][slots]
                    s = jnp.einsum("bhgd,bvhd->bhgv",
                                   qg.astype(jnp.float32),
                                   keys.astype(jnp.float32)) \
                        * (a.head_dim ** -0.5)
                    s = jnp.where(vis_valid[:, None, None, :], s, -1e30)
                    pr = jax.nn.softmax(s, axis=-1)
                    o = jnp.einsum("bhgv,bvhd->bhgd", pr,
                                   vals.astype(jnp.float32))
                    o = o.reshape(
                        b_sz, a.num_heads * a.head_dim).astype(
                        h.dtype) @ lp["wo"]
                    h = res + jnp.tanh(lp["gate_attn"]) * (o * row_on)
                    res = h
                    x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                    mlp = self._mlp(lp, x) * row_on
                    h = res + jnp.tanh(lp["gate_mlp"]) * mlp
                    ci += 1
                    continue
                q = (x @ lp["wq"]).reshape(b_sz, a.num_heads, a.head_dim)
                k = (x @ lp["wk"]).reshape(b_sz, a.num_kv_heads,
                                           a.head_dim)
                v = (x @ lp["wv"]).reshape(b_sz, a.num_kv_heads,
                                           a.head_dim)
                q, k = apply_rope(q, k, cos, sin)
                sk = sk.at[si, slots, pos].set(k.astype(sk.dtype))
                sv = sv.at[si, slots, pos].set(v.astype(sv.dtype))
                keys = sk[si][slots]
                vals = sv[si][slots]
                qg = q.reshape(b_sz, a.num_kv_heads, groups, a.head_dim)
                s = jnp.einsum("bhgd,bthd->bhgt",
                               qg.astype(jnp.float32),
                               keys.astype(jnp.float32)) \
                    * (a.head_dim ** -0.5)
                s = jnp.where(key_mask[:, None, None, :], s, -1e30)
                pr = jax.nn.softmax(s, axis=-1)
                out = jnp.einsum("bhgt,bthd->bhgd", pr,
                                 vals.astype(jnp.float32))
                out = out.reshape(
                    b_sz, a.num_heads * a.head_dim).astype(
                    h.dtype) @ lp["wo"]
                si += 1
                h = res + out
                res = h
                x = rms_norm(h, lp["post_norm"], a.rms_norm_eps)
                h = res + self._mlp(lp, x)
        pos_pool = pos_pool.at[slots].set(pos + 1)
        return h, (sk, sv, ck, cv, vlen_pool, istart_pool, pos_pool)

    def embed(self, params, token_ids):
        return params["embed"][token_ids]

    # ---- sizing -----------------------------------------------------------

    def param_bytes(self) -> int:
        a, va = self.arch, self.vision_arch
        text = a.vocab_size * a.hidden_size * 2
        for i in range(a.num_layers):
            for shape in self._text_layer_shapes(i).values():
                n = 1
                for s in shape:
                    n *= s
                text += n
        vis = (va.num_layers + va.num_global_layers) * (
            4 * va.hidden_size ** 2
            + 2 * va.hidden_size * va.intermediate_size)
        vis += va.out_dim * a.hidden_size
        return (text + vis) * jnp.dtype(self.dtype).itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return 0

    def state_bytes_per_seq(self, dtype=jnp.float32,
                            max_len: int | None = None) -> int:
        a = self.arch
        ml = max_len or 4096
        n_self = a.num_layers - len(a.cross_layers)
        n_cross = max(len(a.cross_layers), 1)
        row = a.num_kv_heads * a.head_dim * jnp.dtype(self.dtype).itemsize
        return 2 * row * (n_self * ml + n_cross * self.max_vis_tokens)
