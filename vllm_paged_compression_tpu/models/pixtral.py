"""Pixtral (HF-format): variable-aspect RMS-norm ViT with meshgrid 2D
rope, served under the Llava composite.

Reference: vllm/model_executor/models/pixtral.py (the HF-format classes;
math mirrors HF modeling_pixtral).  The Mistral processor lays images out
as rows of patch tokens separated by [IMG_BREAK] and closed by [IMG_END];
``assemble_image_features`` reproduces that layout with the break/end
tokens' own embeddings so the engine's contiguous placeholder splice
applies (same trick as Fuyu's newline rows).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel, rms_norm
from .llava import LlavaModel


@dataclass
class PixtralVisionArch:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    head_dim: int = 64
    image_size: int = 1024        # max side
    patch_size: int = 16
    rope_theta: float = 10000.0
    ln_eps: float = 1e-5


class PixtralLlavaModel(LlavaModel):
    """Llava composite with a Pixtral tower; variable image sizes are
    assembled host-side."""

    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, vision: PixtralVisionArch,
                 image_token_id: int, break_token_id: int,
                 end_token_id: int, dtype=jnp.bfloat16):
        # Bypass LlavaModel.__init__ (different tower).
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.vision_arch = vision
        self.image_token_id = image_token_id
        self.break_token_id = break_token_id
        self.end_token_id = end_token_id
        self.dtype = dtype
        self._encode_jits = {}

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "PixtralLlavaModel":
        vc = cfg["vision_config"]
        text = LlamaArch.from_hf_config(cfg["text_config"])
        vision = PixtralVisionArch(
            hidden_size=vc.get("hidden_size", 1024),
            intermediate_size=vc.get("intermediate_size", 4096),
            num_layers=vc.get("num_hidden_layers", 24),
            num_heads=vc.get("num_attention_heads", 16),
            head_dim=vc.get("head_dim",
                            vc.get("hidden_size", 1024)
                            // vc.get("num_attention_heads", 16)),
            image_size=vc.get("image_size", 1024),
            patch_size=vc.get("patch_size", 16),
            rope_theta=vc.get("rope_theta", 10000.0))
        return cls(text, vision, cfg.get("image_token_index", 10),
                   cfg.get("image_break_token_index", 12),
                   cfg.get("image_end_token_index", 13), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        v = self.vision_arch
        rng = np.random.default_rng(seed + 1)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        d, hd, L = v.hidden_size, v.head_dim, v.num_layers
        vis = {
            "patch_w": w(3 * v.patch_size ** 2, d),
            "ln_pre": np.ones(d, np.float32),
            "layers": {
                "attn_norm": np.ones((L, d), np.float32),
                "wq": w(L, d, v.num_heads * hd),
                "wk": w(L, d, v.num_heads * hd),
                "wv": w(L, d, v.num_heads * hd),
                "wo": w(L, v.num_heads * hd, d),
                "ffn_norm": np.ones((L, d), np.float32),
                "w_gate": w(L, d, v.intermediate_size),
                "w_up": w(L, d, v.intermediate_size),
                "w_down": w(L, v.intermediate_size, d),
            },
            "proj1_w": w(d, self.arch.hidden_size),
            "proj1_b": np.zeros(self.arch.hidden_size, np.float32),
            "proj2_w": w(self.arch.hidden_size, self.arch.hidden_size),
            "proj2_b": np.zeros(self.arch.hidden_size, np.float32),
        }
        params["vision"] = (vis if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), vis))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        v = self.vision_arch
        norm, vis_sd = {}, {}
        for k, val in tensors.items():
            if k.startswith("model.language_model."):
                norm["model." + k[len("model.language_model."):]] = val
            elif k.startswith("language_model.model."):
                norm["model." + k[len("language_model.model."):]] = val
            elif k.startswith("language_model."):
                norm[k[len("language_model."):]] = val
            elif "vision_tower." in k:
                vis_sd[k.split("vision_tower.", 1)[1]] = val
            elif "multi_modal_projector." in k:
                vis_sd["proj." + k.split("multi_modal_projector.", 1)[1]] \
                    = val
            else:
                norm[k] = val
        params = self.language.load_hf_state_dict(norm, as_numpy=as_numpy)

        def t(name):
            return np.asarray(vis_sd[name])

        L = v.num_layers
        acc = {k: [] for k in ("attn_norm", "wq", "wk", "wv", "wo",
                               "ffn_norm", "w_gate", "w_up", "w_down")}
        for li in range(L):
            p = f"transformer.layers.{li}."
            acc["attn_norm"].append(t(p + "attention_norm.weight"))
            acc["wq"].append(t(p + "attention.q_proj.weight").T)
            acc["wk"].append(t(p + "attention.k_proj.weight").T)
            acc["wv"].append(t(p + "attention.v_proj.weight").T)
            acc["wo"].append(t(p + "attention.o_proj.weight").T)
            acc["ffn_norm"].append(t(p + "ffn_norm.weight"))
            acc["w_gate"].append(t(p + "feed_forward.gate_proj.weight").T)
            acc["w_up"].append(t(p + "feed_forward.up_proj.weight").T)
            acc["w_down"].append(t(p + "feed_forward.down_proj.weight").T)
        vis = {
            "patch_w": t("patch_conv.weight").reshape(
                v.hidden_size, -1).T,
            "ln_pre": t("ln_pre.weight"),
            "layers": {k: np.stack(x) for k, x in acc.items()},
            "proj1_w": t("proj.linear_1.weight").T,
            "proj1_b": t("proj.linear_1.bias"),
            "proj2_w": t("proj.linear_2.weight").T,
            "proj2_b": t("proj.linear_2.bias"),
        }
        params["vision"] = (vis if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), vis))
        return params

    # ---- tower ------------------------------------------------------------

    def _rope_table(self) -> np.ndarray:
        """Meshgrid frequency table [grid*grid, head_dim] (HF
        PixtralRotaryEmbedding: h rows take even freqs, w cols odd)."""
        v = self.vision_arch
        g = v.image_size // v.patch_size
        freqs = 1.0 / (v.rope_theta ** (
            np.arange(0, v.head_dim, 2, dtype=np.float64) / v.head_dim))
        fh = np.outer(np.arange(g), freqs[::2])
        fw = np.outer(np.arange(g), freqs[1::2])
        inv = np.concatenate(
            [np.repeat(fh[:, None, :], g, axis=1),
             np.repeat(fw[None, :, :], g, axis=0)], axis=-1
        ).reshape(-1, v.head_dim // 2)
        return np.concatenate([inv, inv], axis=-1).astype(np.float32)

    def _encode(self, vp, patches, pos_ids):
        """patches [n, 3*ps*ps] row-major, pos_ids [n] into the meshgrid
        table -> projected features [n, text_hidden]."""
        v = self.vision_arch
        nh, hd = v.num_heads, v.head_dim
        x = patches.astype(self.dtype) @ vp["patch_w"]
        x = rms_norm(x, vp["ln_pre"], v.ln_eps)
        emb = jnp.asarray(self._rope_table())[pos_ids]       # [n, hd]
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        scale = hd ** -0.5

        def rot(z):
            half = z.shape[-1] // 2
            return jnp.concatenate([-z[..., half:], z[..., :half]], -1)

        def layer(x, lp):
            res = x
            y = rms_norm(x, lp["attn_norm"], v.ln_eps)
            n = y.shape[0]
            q = (y @ lp["wq"]).reshape(n, nh, hd).astype(jnp.float32)
            k = (y @ lp["wk"]).reshape(n, nh, hd).astype(jnp.float32)
            vv = (y @ lp["wv"]).reshape(n, nh, hd).astype(jnp.float32)
            c, s = cos[:, None, :], sin[:, None, :]
            q = q * c + rot(q) * s
            k = k * c + rot(k) * s
            a = jnp.einsum("thd,shd->hts", q, k) * scale
            p = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, vv).reshape(n, nh * hd)
            x = res + o.astype(x.dtype) @ lp["wo"]
            res = x
            y = rms_norm(x, lp["ffn_norm"], v.ln_eps)
            y = jax.nn.silu(y @ lp["w_gate"]) * (y @ lp["w_up"])
            return res + y @ lp["w_down"], None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        y = jax.nn.gelu(x @ vp["proj1_w"] + vp["proj1_b"],
                        approximate=False)
        return y @ vp["proj2_w"] + vp["proj2_b"]

    def assemble_image_features(self, params, pixel_values, mm
                                ) -> np.ndarray:
        """[3, H, W] (multiples of patch_size) -> [h*(w+1), D]: patch
        rows each closed by the [IMG_BREAK] embedding, the final row by
        [IMG_END] (the Mistral processor layout)."""
        v = self.vision_arch
        ps = v.patch_size
        if (pixel_values.ndim != 3 or pixel_values.shape[0] != 3
                or pixel_values.shape[1] % ps or pixel_values.shape[2] % ps):
            raise ValueError(f"expected pixel_values [3, H, W] divisible "
                             f"by {ps}, got {pixel_values.shape}")
        h, w = pixel_values.shape[1] // ps, pixel_values.shape[2] // ps
        g = v.image_size // v.patch_size
        x = pixel_values.reshape(3, h, ps, w, ps)
        x = np.transpose(x, (1, 3, 0, 2, 4)).reshape(h * w, 3 * ps * ps)
        pos = (np.arange(h)[:, None] * g + np.arange(w)[None, :]).reshape(-1)
        key = (h, w)
        fn = self._encode_jits.get(key)
        if fn is None:
            fn = self._encode_jits[key] = jax.jit(
                lambda p, px, pid: self._encode(p["vision"], px, pid))
        feats = np.asarray(fn(params, jnp.asarray(x, np.float32),
                              jnp.asarray(pos)), np.float32)
        d = feats.shape[-1]
        brk = np.asarray(self.language.embed(
            params, jnp.asarray([self.break_token_id])), np.float32)
        end = np.asarray(self.language.embed(
            params, jnp.asarray([self.end_token_id])), np.float32)
        rows = feats.reshape(h, w, d)
        rows = np.concatenate(
            [rows, np.broadcast_to(brk[None], (h, 1, d))], axis=1)
        out = rows.reshape(h * (w + 1), d).copy()
        out[-1] = end[0]     # the LAST row closes with [IMG_END] instead
        return out

    def param_bytes(self) -> int:
        v = self.vision_arch
        vis = v.num_layers * (4 * v.hidden_size * v.num_heads * v.head_dim
                              + 3 * v.hidden_size * v.intermediate_size)
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)
