"""Molmo (allenai/Molmo-7B-D/O, 72B): CLIP-style ViT with two-layer
feature concat + 2x2 attention pooling + SwiGLU projector, on an
OLMo-flavoured trunk served through the shared Llama machinery.

Reference: vllm/model_executor/models/molmo.py —
- ViT (:279-355): linear patch embedding over channel-LAST flattened
  patches, CLS token, learned positions, pre-LN, 23 pre-norm blocks with
  separate-bias q/k/v/o and quick-GELU MLP; features are the concat of
  hidden states at VIT_LAYERS = [-2, -9] (:52, :643-648), CLS dropped.
- 2x2 attention pooling (:144-224, :693-707): each 2x2 patch group is
  pooled by one cross-attention step whose query is the group mean.
- Projector (:464-504 MolmoMLP with input_dim=emb_dim): SwiGLU with
  intermediate = config.intermediate_size // 2 into the LLM hidden.
- Trunk (:356-588): fused att_proj qkv, optional FLAT q/k RMSNorm
  (attention_layer_norm -> our qk_norm_flat), rope, SwiGLU MLP whose
  checkpoint ff_proj chunks are (up, gate) (:843-845), RMS norms; the
  ``norm_after`` variant (:560-588) normalizes sublayer OUTPUTS — our
  ``postnorm`` flag.  Embedding = wte.embedding ++ wte.new_embedding
  (128 extra special-token rows, :1337-1350); lm_head is the top-level
  transformer.ff_out (or tied, :1140-1147); the extra 128 ids never
  receive probability mass (suppress_tokens).

Image intake: ``multi_modal_data={"image": crops}`` with crops
[N, 3, 336, 336] — crop 0 the resized global image, crops 1:
the (tiling_h x tiling_w) grid (pass ``"tiling": (th, tw)``; default
(N-1, 1)).  Features are assembled host-side in the reference prompt
layout (molmo.py:880-891): per section, rows of pooled patch features
each followed by the embedded im_col token, wrapped in im_start/im_end.
The reference processor's overlap-margin cropping happens upstream of
the crops we receive, so margins are the caller's concern.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel
from .vision import layer_norm, _VIT_ACTS

IM_PATCH_ID = 152066        # molmo.py:55-58
IM_START_ID = 152067
IM_END_ID = 152064
IM_COL_ID = 152065
ADDITIONAL_VOCAB = 128      # molmo.py:54
VIT_LAYERS = (-2, -9)       # molmo.py:52


@dataclass
class MolmoArch(LlamaArch):
    """Trunk flags for Molmo's OLMo-style decoder (molmo.py:356-588)."""
    weight_tying: bool = False

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MolmoArch":
        emb_size = (cfg.get("embedding_size") or cfg["vocab_size"])
        num_heads = cfg["num_attention_heads"]
        a = cls(
            vocab_size=emb_size + ADDITIONAL_VOCAB,
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"] // 2,
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=cfg.get("num_key_value_heads") or num_heads,
            head_dim=cfg["hidden_size"] // num_heads,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            4096),
        )
        a.qkv_bias = cfg.get("qkv_bias", False)
        a.qk_norm_flat = cfg.get("attention_layer_norm", False)
        a.postnorm = cfg.get("norm_after", False)
        a.weight_tying = cfg.get("weight_tying", False)
        a.tie_word_embeddings = a.weight_tying
        # The 128 wte.new_embedding rows are input-only special tokens;
        # keep them out of the output distribution (lm_head is padded
        # with zero rows when untied).
        a.suppress_tokens = tuple(range(emb_size,
                                        emb_size + ADDITIONAL_VOCAB))
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        inter = self.intermediate_size
        out = {}
        emb = new_emb = None
        for k, v in tensors.items():
            if k.startswith("model.vision_backbone."):
                continue                      # loaded by the vision side
            if k == "model.transformer.wte.embedding":
                emb = np.asarray(v)
                continue
            if k == "model.transformer.wte.new_embedding":
                new_emb = np.asarray(v)
                continue
            if k == "model.transformer.ln_f.weight":
                out["model.norm.weight"] = v
                continue
            if k == "model.transformer.ff_out.weight":
                out["lm_head.weight"] = v
                continue
            if not k.startswith("model.transformer.blocks."):
                out[k] = v
                continue
            rest = k[len("model.transformer.blocks."):]
            i, name = rest.split(".", 1)
            p = f"model.layers.{i}.self_attn."
            if name in ("att_proj.weight", "att_proj.bias"):
                v = np.asarray(v)
                sfx = name.split(".")[1]
                out[p + f"q_proj.{sfx}"] = v[:q_sz]
                out[p + f"k_proj.{sfx}"] = v[q_sz:q_sz + kv_sz]
                out[p + f"v_proj.{sfx}"] = v[q_sz + kv_sz:]
            elif name == "ff_proj.weight":
                # checkpoint rows are (up, gate) (molmo.py:843-845).
                v = np.asarray(v)
                out[f"model.layers.{i}.mlp.gate_proj.weight"] = v[inter:]
                out[f"model.layers.{i}.mlp.up_proj.weight"] = v[:inter]
            elif name == "attn_out.weight":
                out[p + "o_proj.weight"] = v
            elif name == "ff_out.weight":
                out[f"model.layers.{i}.mlp.down_proj.weight"] = v
            elif name in ("q_norm.weight", "k_norm.weight"):
                out[p + name] = v
            elif name == "attn_norm.weight":
                out[f"model.layers.{i}.input_layernorm.weight"] = v
            elif name == "ff_norm.weight":
                out[f"model.layers.{i}.post_attention_layernorm.weight"] \
                    = v
            else:
                out[k] = v
        if emb is not None:
            full = np.concatenate([emb, new_emb], axis=0) \
                if new_emb is not None else emb
            out["model.embed_tokens.weight"] = full
            if not self.weight_tying and "lm_head.weight" in out:
                head = np.asarray(out["lm_head.weight"])
                pad = self.vocab_size - head.shape[0]
                if pad > 0:
                    out["lm_head.weight"] = np.concatenate(
                        [head, np.zeros((pad, head.shape[1]),
                                        head.dtype)], axis=0)
        return out


@dataclass
class MolmoViTArch:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    ln_eps: float = 1e-5

    @classmethod
    def from_hf_config(cls, vc: dict) -> "MolmoViTArch":
        return cls(
            hidden_size=vc.get("image_emb_dim", 1024),
            intermediate_size=vc.get("image_mlp_dim", 4096),
            num_layers=vc.get("image_num_layers", 23),
            num_heads=vc.get("image_num_heads", 16),
            image_size=(vc.get("image_default_input_size")
                        or (336, 336))[0],
            patch_size=vc.get("image_patch_size", 14),
            ln_eps=vc.get("image_norm_eps", 1e-5),
        )

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


class MolmoModel:
    architecture = "llava"

    def __init__(self, text_arch: MolmoArch, vision_arch: MolmoViTArch,
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision_arch = vision_arch
        self.arch = text_arch
        self.image_token_id = IM_PATCH_ID
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "MolmoModel":
        return cls(MolmoArch.from_hf_config(cfg),
                   MolmoViTArch.from_hf_config(
                       cfg.get("vision_config") or {}), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self._init_vision(seed + 1, as_numpy)
        return params

    def _init_vision(self, seed: int, as_numpy: bool = False) -> dict:
        a, d = self.vision_arch, self.arch.hidden_size
        rng = np.random.default_rng(seed + 1)

        def w(*shape):
            x = rng.standard_normal(shape).astype(np.float32) * 0.02
            return x if as_numpy else jnp.asarray(x, self.dtype)

        def zeros(*shape):
            return (np.zeros(shape, np.float32) if as_numpy
                    else jnp.zeros(shape, self.dtype))

        def ones(*shape):
            return (np.ones(shape, np.float32) if as_numpy
                    else jnp.ones(shape, self.dtype))

        dv, i, L = a.hidden_size, a.intermediate_size, a.num_layers
        inter = self.arch.intermediate_size
        return {
            "patch_w": w(3 * a.patch_size ** 2, dv),
            "cls": w(dv), "pos": w(a.grid ** 2 + 1, dv),
            "pre_ln_w": ones(dv), "pre_ln_b": zeros(dv),
            "layers": {
                "ln1_w": ones(L, dv), "ln1_b": zeros(L, dv),
                "wq": w(L, dv, dv), "bq": zeros(L, dv),
                "wk": w(L, dv, dv), "bk": zeros(L, dv),
                "wv": w(L, dv, dv), "bv": zeros(L, dv),
                "wo": w(L, dv, dv), "bo": zeros(L, dv),
                "ln2_w": ones(L, dv), "ln2_b": zeros(L, dv),
                "fc1_w": w(L, dv, i), "fc1_b": zeros(L, i),
                "fc2_w": w(L, i, dv), "fc2_b": zeros(L, dv),
            },
            "pool_wq": w(2 * dv, dv), "pool_bq": zeros(dv),
            "pool_wk": w(2 * dv, dv), "pool_bk": zeros(dv),
            "pool_wv": w(2 * dv, dv), "pool_bv": zeros(dv),
            "pool_wo": w(dv, dv), "pool_bo": zeros(dv),
            "proj_gate": w(dv, inter), "proj_up": w(dv, inter),
            "proj_down": w(inter, d),
        }

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        params = self.language.load_hf_state_dict(tensors,
                                                  as_numpy=as_numpy)
        vp = "model.vision_backbone."
        if not any(k.startswith(vp) for k in tensors):
            # Text-only checkpoint slice: keep a synthetic vision side.
            params["vision"] = self._init_vision(0, as_numpy)
            return params

        def t(name):
            return np.asarray(tensors[vp + name])

        a = self.vision_arch
        L = a.num_layers
        names = ("ln1_w", "ln1_b", "wq", "bq", "wk", "bk", "wv", "bv",
                 "wo", "bo", "ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w",
                 "fc2_b")
        layers = {k: [] for k in names}
        for li in range(L):
            p = f"image_vit.transformer.resblocks.{li}."
            layers["ln1_w"].append(t(p + "attention_norm.weight"))
            layers["ln1_b"].append(t(p + "attention_norm.bias"))
            for nm in ("q", "k", "v", "o"):
                layers[f"w{nm}"].append(t(p + f"attention.w{nm}.weight").T)
                layers[f"b{nm}"].append(t(p + f"attention.w{nm}.bias"))
            layers["ln2_w"].append(t(p + "ffn_norm.weight"))
            layers["ln2_b"].append(t(p + "ffn_norm.bias"))
            layers["fc1_w"].append(t(p + "feed_forward.w1.weight").T)
            layers["fc1_b"].append(t(p + "feed_forward.w1.bias"))
            layers["fc2_w"].append(t(p + "feed_forward.w2.weight").T)
            layers["fc2_b"].append(t(p + "feed_forward.w2.bias"))
        vis = {
            "patch_w": t("image_vit.patch_embedding.weight").T,
            "cls": t("image_vit.class_embedding"),
            "pos": t("image_vit.positional_embedding"),
            "pre_ln_w": t("image_vit.pre_ln.weight"),
            "pre_ln_b": t("image_vit.pre_ln.bias"),
            "layers": {k: np.stack(v) for k, v in layers.items()},
            "proj_gate": t("image_projector.w1.weight").T,
            "proj_up": t("image_projector.w3.weight").T,
            "proj_down": t("image_projector.w2.weight").T,
        }
        for nm in ("q", "k", "v", "o"):
            vis[f"pool_w{nm}"] = t(f"image_pooling_2d.w{nm}.weight").T
            vis[f"pool_b{nm}"] = t(f"image_pooling_2d.w{nm}.bias")
        params["vision"] = jax.tree.map(
            lambda x: x if as_numpy else jnp.asarray(x, self.dtype), vis)
        return params

    # ---- image path -----------------------------------------------------

    def _encode_crop(self, vis: dict, px: jnp.ndarray) -> jnp.ndarray:
        """[3, S, S] -> pooled [g/2, g/2, d_model]."""
        a = self.vision_arch
        ps, g = a.patch_size, a.grid
        x = px.astype(self.dtype)
        # channel-LAST patch pixels: (h w) (dh dw c) — the Molmo
        # processor's patchify order the linear embedding was trained on.
        x = x.reshape(3, g, ps, g, ps)
        x = jnp.transpose(x, (1, 3, 2, 4, 0)).reshape(g * g,
                                                      ps * ps * 3)
        h = x @ vis["patch_w"]
        h = jnp.concatenate([vis["cls"][None], h], axis=0) + vis["pos"]
        h = layer_norm(h, vis["pre_ln_w"], vis["pre_ln_b"], a.ln_eps)

        nh, dv = a.num_heads, a.hidden_size
        hd = dv // nh
        scale = hd ** -0.5
        act = _VIT_ACTS["quick_gelu"]
        keep = sorted(x % a.num_layers for x in VIT_LAYERS)

        def attn(x, wq, bq, wk, bk, wv, bv, wo, bo, q_in=None):
            q_in = x if q_in is None else q_in
            tq, tk = q_in.shape[0], x.shape[0]
            q = (q_in @ wq + bq).reshape(tq, nh, hd)
            k = (x @ wk + bk).reshape(tk, nh, hd)
            v = (x @ wv + bv).reshape(tk, nh, hd)
            s = jnp.einsum("qhd,khd->hqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("hqk,khd->qhd", p, v).reshape(tq, dv)
            return o @ wo + bo

        feats = []
        for li in range(a.num_layers):
            lp = jax.tree.map(lambda x: x[li], vis["layers"])
            xn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], a.ln_eps)
            h = h + attn(xn, lp["wq"], lp["bq"], lp["wk"], lp["bk"],
                         lp["wv"], lp["bv"], lp["wo"], lp["bo"])
            xn = layer_norm(h, lp["ln2_w"], lp["ln2_b"], a.ln_eps)
            h = h + act(xn @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] \
                + lp["fc2_b"]
            if li in keep:
                feats.append(h)
        f = jnp.concatenate(feats[::-1], axis=-1)[1:]     # [-2 | -9], -CLS
        # 2x2 attention pooling (molmo.py:693-707).
        g2 = g // 2
        f = f.reshape(g2, 2, g2, 2, 2 * dv)
        groups = jnp.transpose(f, (0, 2, 1, 3, 4)).reshape(
            g2 * g2, 4, 2 * dv)

        def pool(group):
            q_in = jnp.mean(group, axis=0, keepdims=True)
            return attn(group, vis["pool_wq"], vis["pool_bq"],
                        vis["pool_wk"], vis["pool_bk"], vis["pool_wv"],
                        vis["pool_bv"], vis["pool_wo"], vis["pool_bo"],
                        q_in=q_in)[0]

        pooled = jax.vmap(pool)(groups)                   # [g2*g2, dv]
        y = (jax.nn.silu(pooled @ vis["proj_gate"])
             * (pooled @ vis["proj_up"])) @ vis["proj_down"]
        return y.reshape(g2, g2, -1)

    def assemble_image_features(self, params: dict, pixel_values,
                                mm_data: dict) -> jnp.ndarray:
        """crops [N, 3, S, S] -> feature block in the reference prompt
        layout (molmo.py:880-891): [global: start, rows+col, end]
        [joint: start, tiled rows+col, end].  Special-token rows come
        from the embedding table (the reference keeps those ids in
        input_ids; spliced embeddings are identical)."""
        s = self.vision_arch.image_size
        pixel_values = np.asarray(pixel_values, np.float32)
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected crops [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        n = pixel_values.shape[0]
        vis = params["vision"]
        pooled = jax.vmap(lambda px: self._encode_crop(vis, px))(
            jnp.asarray(pixel_values))                 # [N, g2, g2, d]
        col = self.language.embed(params,
                                  jnp.array([IM_COL_ID]))      # [1, d]
        start = self.language.embed(params, jnp.array([IM_START_ID]))
        end = self.language.embed(params, jnp.array([IM_END_ID]))

        def section(grid):                 # [H2, W2, d] -> rows + col
            h2, w2, d = grid.shape
            rows = jnp.concatenate(
                [grid, jnp.broadcast_to(col[None], (h2, 1, d))], axis=1)
            return jnp.concatenate([start, rows.reshape(-1, d), end])

        blocks = [section(pooled[0])]
        if n > 1:
            th, tw = mm_data.get("tiling") or (n - 1, 1)
            if th * tw != n - 1:
                raise ValueError(f"tiling {th}x{tw} != {n - 1} crops")
            g2, d = pooled.shape[1], pooled.shape[-1]
            tiles = pooled[1:].reshape(th, tw, g2, g2, d)
            joint = jnp.transpose(tiles, (0, 2, 1, 3, 4)).reshape(
                th * g2, tw * g2, d)
            blocks.append(section(joint))
        return jnp.concatenate(blocks, axis=0)

    # ---- delegation -----------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        a = self.vision_arch
        vis = a.num_layers * (4 * a.hidden_size ** 2
                              + 2 * a.hidden_size * a.intermediate_size)
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
