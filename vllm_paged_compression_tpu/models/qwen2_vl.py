"""Qwen2-VL: windowless 2D-rope ViT + patch merger + Qwen2 trunk with
M-RoPE (multimodal rotary: separate temporal/height/width position
streams).

Reference: vllm/model_executor/models/qwen2_vl.py; math mirrors HF
modeling_qwen2_vl.  TPU-native M-RoPE split: prompts with images carry
[3, T] position streams into the prefill jit (ops/rope.mrope_cos_sin);
decode steps use the standard 1D rope path shifted by a per-sequence
``mrope_delta`` (the three streams coincide for generated text, vllm's
mrope_position_delta trick), so the paged decode programs are untouched.

Inputs follow the HF processor contract: ``multi_modal_data={"image":
patches [np, C*tps*ps*ps], "image_grid_thw": (t, h, w)}`` — patches
arrive pre-flattened in the spatial-merge-grouped order.  Features are
assembled host-side (count = np / merge²; grid-dependent layout).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, Qwen2Arch
from .vision import layer_norm


@dataclass
class Qwen2VLVisionArch:
    depth: int = 32
    embed_dim: int = 1280
    out_hidden: int = 3584        # merger output = text hidden
    num_heads: int = 16
    in_chans: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: float = 4.0

    @property
    def patch_in(self) -> int:
        return (self.in_chans * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


class Qwen2VLModel:
    architecture = "llava"

    def __init__(self, text_arch: Qwen2Arch, vision: Qwen2VLVisionArch,
                 image_token_id: int, vision_start_token_id: int,
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.vision_arch = vision
        self.image_token_id = image_token_id
        self.vision_start_token_id = vision_start_token_id
        self.dtype = dtype
        self._encode_jits = {}

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "Qwen2VLModel":
        vc = cfg["vision_config"]
        text_cfg = cfg.get("text_config") or cfg
        text = Qwen2Arch.from_hf_config(text_cfg)
        rs = text_cfg.get("rope_scaling") or cfg.get("rope_scaling") or {}
        text.mrope_section = rs.get("mrope_section", [16, 24, 24])
        text.rope_scaling = None     # "mrope" type is handled natively
        vision = Qwen2VLVisionArch(
            depth=vc.get("depth", 32),
            embed_dim=vc.get("embed_dim", 1280),
            out_hidden=vc.get("hidden_size", text.hidden_size),
            num_heads=vc.get("num_heads", 16),
            in_chans=vc.get("in_chans", 3),
            patch_size=vc.get("patch_size", 14),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            mlp_ratio=vc.get("mlp_ratio", 4.0))
        return cls(text, vision, cfg.get("image_token_id", 151655),
                   cfg.get("vision_start_token_id", 151652), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        v = self.vision_arch
        rng = np.random.default_rng(seed + 1)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

        d, f, L = v.embed_dim, v.mlp_dim, v.depth
        m2 = v.spatial_merge_size ** 2
        vis = {
            "patch_w": w(v.patch_in, d),
            "blocks": {
                "ln1_w": ones(L, d), "ln1_b": zeros(L, d),
                "wqkv": w(L, d, 3 * d), "bqkv": zeros(L, 3 * d),
                "wo": w(L, d, d), "bo": zeros(L, d),
                "ln2_w": ones(L, d), "ln2_b": zeros(L, d),
                "fc1_w": w(L, d, f), "fc1_b": zeros(L, f),
                "fc2_w": w(L, f, d), "fc2_b": zeros(L, d),
            },
            "ln_q_w": ones(d), "ln_q_b": zeros(d),
            "m0_w": w(d * m2, d * m2), "m0_b": zeros(d * m2),
            "m1_w": w(d * m2, v.out_hidden), "m1_b": zeros(v.out_hidden),
        }
        params["vision"] = (vis if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), vis))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        v = self.vision_arch
        lang, vis_sd = {}, {}
        for k, val in tensors.items():
            if k.startswith("model.language_model."):
                lang["model." + k[len("model.language_model."):]] = val
            elif k.startswith("language_model."):
                lang[k[len("language_model."):]] = val
            elif k.startswith("model.visual."):
                vis_sd[k[len("model.visual."):]] = val
            elif k.startswith("visual."):
                vis_sd[k[len("visual."):]] = val
            elif k.startswith("model."):
                lang[k] = val
            else:
                lang[k] = val
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)

        def t(name):
            return np.asarray(vis_sd[name])

        L = v.depth
        acc = {k: [] for k in ("ln1_w", "ln1_b", "wqkv", "bqkv", "wo",
                               "bo", "ln2_w", "ln2_b", "fc1_w", "fc1_b",
                               "fc2_w", "fc2_b")}
        for li in range(L):
            p = f"blocks.{li}."
            acc["ln1_w"].append(t(p + "norm1.weight"))
            acc["ln1_b"].append(t(p + "norm1.bias"))
            acc["wqkv"].append(t(p + "attn.qkv.weight").T)
            acc["bqkv"].append(t(p + "attn.qkv.bias"))
            acc["wo"].append(t(p + "attn.proj.weight").T)
            acc["bo"].append(t(p + "attn.proj.bias"))
            acc["ln2_w"].append(t(p + "norm2.weight"))
            acc["ln2_b"].append(t(p + "norm2.bias"))
            acc["fc1_w"].append(t(p + "mlp.fc1.weight").T)
            acc["fc1_b"].append(t(p + "mlp.fc1.bias"))
            acc["fc2_w"].append(t(p + "mlp.fc2.weight").T)
            acc["fc2_b"].append(t(p + "mlp.fc2.bias"))
        vis = {
            # Conv3d kernel [D, C, tps, ps, ps] -> matmul (input patches
            # are flattened in the same (C, tps, ps, ps) order by the HF
            # processor).
            "patch_w": t("patch_embed.proj.weight").reshape(
                v.embed_dim, -1).T,
            "blocks": {k: np.stack(x) for k, x in acc.items()},
            "ln_q_w": t("merger.ln_q.weight"),
            "ln_q_b": t("merger.ln_q.bias"),
            "m0_w": t("merger.mlp.0.weight").T,
            "m0_b": t("merger.mlp.0.bias"),
            "m1_w": t("merger.mlp.2.weight").T,
            "m1_b": t("merger.mlp.2.bias"),
        }
        params["vision"] = (vis if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), vis))
        return params

    # ---- vision tower -----------------------------------------------------

    def _vision_pos_ids(self, grid) -> np.ndarray:
        """Per-patch (row, col) ids in the spatial-merge-grouped patch
        order (HF Qwen2VisionTransformer.rot_pos_emb)."""
        t, h, w = grid
        sm = self.vision_arch.spatial_merge_size
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(h // sm, sm, w // sm, sm).transpose(
            0, 2, 1, 3).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(h // sm, sm, w // sm, sm).transpose(
            0, 2, 1, 3).reshape(-1)
        return np.tile(np.stack([hp, wp], axis=-1), (t, 1))   # [t*h*w, 2]

    def _encode_vision(self, vp, patches, pos_ids):
        """patches [seq, patch_in], pos_ids [seq, 2] ->
        [seq / merge^2, out_hidden]."""
        v = self.vision_arch
        d = v.embed_dim
        nh = v.num_heads
        hd = d // nh
        x = patches.astype(self.dtype) @ vp["patch_w"]
        # 2D rotary: half the head dims rotate by row, half by col
        # (VisionRotaryEmbedding dim = hd // 2, inv_freq over hd // 4).
        inv_freq = 1.0 / (10000.0 ** (
            jnp.arange(0, hd // 2, 2, dtype=jnp.float32) / (hd // 2)))
        freqs = pos_ids.astype(jnp.float32)[..., None] * inv_freq
        rpe = freqs.reshape(freqs.shape[0], -1)                # [seq, hd/2]
        emb = jnp.concatenate([rpe, rpe], axis=-1)             # [seq, hd]
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        scale = hd ** -0.5

        def rot(z):
            half = z.shape[-1] // 2
            return jnp.concatenate([-z[..., half:], z[..., :half]], -1)

        def block(x, lp):
            res = x
            y = layer_norm(x, lp["ln1_w"], lp["ln1_b"], 1e-6)
            s = y.shape[0]
            qkv = (y @ lp["wqkv"] + lp["bqkv"]).reshape(s, 3, nh, hd)
            q, k, vv = (qkv[:, 0].astype(jnp.float32),
                        qkv[:, 1].astype(jnp.float32),
                        qkv[:, 2].astype(jnp.float32))
            c = cos[:, None, :]
            si = sin[:, None, :]
            q = q * c + rot(q) * si
            k = k * c + rot(k) * si
            a = jnp.einsum("thd,shd->hts", q, k) * scale
            p = jax.nn.softmax(a, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, vv).reshape(s, d)
            x = res + (o.astype(x.dtype) @ lp["wo"] + lp["bo"])
            res = x
            y = layer_norm(x, lp["ln2_w"], lp["ln2_b"], 1e-6)
            y = y @ lp["fc1_w"] + lp["fc1_b"]
            y = y * jax.nn.sigmoid(1.702 * y)            # quick_gelu
            return res + (y @ lp["fc2_w"] + lp["fc2_b"]), None

        x, _ = jax.lax.scan(block, x, vp["blocks"])
        x = layer_norm(x, vp["ln_q_w"], vp["ln_q_b"], 1e-6)
        m2 = v.spatial_merge_size ** 2
        x = x.reshape(-1, d * m2)
        x = jax.nn.gelu(x @ vp["m0_w"] + vp["m0_b"], approximate=False)
        return x @ vp["m1_w"] + vp["m1_b"]

    def assemble_image_features(self, params, pixel_values, mm) -> np.ndarray:
        grid = tuple(int(g) for g in (mm.get("image_grid_thw")
                                      if isinstance(mm, dict) else mm))
        v = self.vision_arch
        seq = int(np.prod(grid))
        if pixel_values.shape != (seq, v.patch_in):
            raise ValueError(
                f"expected patches [{seq}, {v.patch_in}] for grid {grid}, "
                f"got {pixel_values.shape}")
        fn = self._encode_jits.get(grid)
        if fn is None:
            fn = self._encode_jits[grid] = jax.jit(
                lambda p, px, pid: self._encode_vision(p["vision"], px,
                                                       pid))
        pos_ids = jnp.asarray(self._vision_pos_ids(grid))
        return np.asarray(fn(params, jnp.asarray(pixel_values), pos_ids),
                          np.float32)

    # ---- M-RoPE positions (HF Qwen2VLModel.get_rope_index) ----------------

    def compute_mrope(self, prompt_token_ids: list[int], grids: list
                      ) -> tuple[np.ndarray, int]:
        """Expanded prompt (image-token runs in place) + per-image (t,h,w)
        grids -> ([3, L] position streams, decode position delta)."""
        sm = self.vision_arch.spatial_merge_size
        ids = list(prompt_token_ids)
        n = len(ids)
        out = []
        st = 0
        gi = 0
        while gi < len(grids):
            try:
                ed = ids.index(self.image_token_id, st)
            except ValueError:
                break
            t, h, w = (int(x) for x in grids[gi])
            gi += 1
            lt, lh, lw = t, h // sm, w // sm
            st_idx = (out[-1].max() + 1) if out else 0
            text_len = ed - st
            out.append(np.broadcast_to(np.arange(text_len), (3, text_len))
                       + st_idx)
            ti = np.repeat(np.arange(lt), lh * lw)
            hi = np.tile(np.repeat(np.arange(lh), lw), lt)
            wi = np.tile(np.arange(lw), lt * lh)
            out.append(np.stack([ti, hi, wi]) + text_len + st_idx)
            st = ed + lt * lh * lw
        if st < n:
            st_idx = (out[-1].max() + 1) if out else 0
            out.append(np.broadcast_to(np.arange(n - st), (3, n - st))
                       + st_idx)
        pos3 = np.concatenate(out, axis=1).astype(np.int32)
        delta = int(pos3.max()) + 1 - n
        return pos3, delta

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        v = self.vision_arch
        vis = v.depth * (4 * v.embed_dim ** 2
                         + 2 * v.embed_dim * v.mlp_dim)
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
