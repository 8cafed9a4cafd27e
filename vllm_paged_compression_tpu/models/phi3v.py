"""Phi-3-Vision: CLIP ViT-L/14-336 + HD transform (2x2 patch merge,
sub-image grid with sub_GN row separators, glb_GN between sub and global
blocks) + 2-layer projector into a Phi-3 trunk.

Reference: vllm/model_executor/models/phi3v.py (Phi3HDImageEmbedding;
itself adapted from microsoft/Phi-3-vision image_embedding_phi3_v.py).
Inputs: ``multi_modal_data={"image": crops [1 + h_crop*w_crop, 3, 336,
336], "image_size": (h, w)}`` with crop 0 the global resize (the HF
processor layout); features are assembled host-side (sizes vary).
The hd_transform_order implemented is "sub_glb" (the only shipped one,
phi3v.py:229-231).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, Phi3Arch
from .vision import VisionArch, VisionTower

# vllm phi3v.py:57-67 — the vision tower config is hard-coded upstream.
_CLIP_LARGE_336 = dict(hidden_size=1024, intermediate_size=4096,
                       num_hidden_layers=24, num_attention_heads=16,
                       image_size=336, patch_size=14,
                       hidden_act="quick_gelu")
_IMAGE_TOKEN_ID = 32044     # vllm phi3v.py _IMAGE_TOKEN_ID


class Phi3VModel:
    architecture = "llava"

    def __init__(self, text_arch: Phi3Arch, vision_arch: VisionArch,
                 image_token_id: int, dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        vision_arch.projector = "none"
        self.vision = VisionTower(vision_arch, dtype=dtype)
        self.image_token_id = image_token_id
        self.dtype = dtype
        self._crop_jits = {}

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "Phi3VModel":
        text = Phi3Arch.from_hf_config(cfg)
        vc = cfg.get("vision_config") or _CLIP_LARGE_336
        vision = VisionArch.from_hf_config(vc, text.hidden_size)
        ip = cfg.get("img_processor") or {}
        vision.feature_layer = ip.get("layer_idx", -2)
        return cls(text, vision, cfg.get("image_token_id",
                                         _IMAGE_TOKEN_ID), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        rng = np.random.default_rng(seed + 2)
        c4 = 4 * self.vision.arch.hidden_size
        d = self.arch.hidden_size

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        extra = {
            "glb_GN": w(1, c4), "sub_GN": w(1, c4),
            "p0_w": w(c4, d), "p0_b": np.zeros(d, np.float32),
            "p1_w": w(d, d), "p1_b": np.zeros(d, np.float32),
        }
        if not as_numpy:
            extra = jax.tree.map(lambda x: jnp.asarray(x, self.dtype),
                                 extra)
        params.update(extra)
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        ve = "model.vision_embed_tokens."
        lang = {k: v for k, v in tensors.items() if not k.startswith(ve)}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        vis = {k[len(ve + "img_processor."):]: v for k, v in tensors.items()
               if k.startswith(ve + "img_processor.")}
        params["vision"] = self.vision.load_hf_state_dict(
            vis, vision_prefix="vision_model.")

        def t(name):
            return np.asarray(tensors[ve + name])

        leaf = (np.asarray if as_numpy
                else lambda x: jnp.asarray(x, self.dtype))
        params.update({
            "glb_GN": leaf(t("glb_GN").reshape(1, -1)),
            "sub_GN": leaf(t("sub_GN").reshape(1, -1)),
            "p0_w": leaf(t("img_projection.0.weight").T),
            "p0_b": leaf(t("img_projection.0.bias")),
            "p1_w": leaf(t("img_projection.2.weight").T),
            "p1_b": leaf(t("img_projection.2.bias")),
        })
        return params

    # ---- HD transform -----------------------------------------------------

    def _merge_2x2(self, feats: np.ndarray, h_crop: int, w_crop: int
                   ) -> np.ndarray:
        """[num_crops, s*s, C] -> [h_crop*s/2, w_crop*s/2, 4C] (reference
        reshape_hd_patches_2x2merge)."""
        n, length, c = feats.shape
        s = int(round(length ** 0.5))
        half = s // 2
        x = feats.reshape(n, half, 2, half, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, half * half, 4 * c)
        x = x.reshape(h_crop, w_crop, half, half, 4 * c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(h_crop * half,
                                               w_crop * half, 4 * c)
        return x

    def _add_newline(self, grid: np.ndarray, sub_gn: np.ndarray
                     ) -> np.ndarray:
        h, w, c4 = grid.shape
        nl = np.broadcast_to(sub_gn.reshape(1, 1, c4), (h, 1, c4))
        return np.concatenate([grid, nl], axis=1).reshape(-1, c4)

    def assemble_image_features(self, params, pixel_values, mm
                                ) -> np.ndarray:
        va = self.vision.arch
        s = va.image_size
        image_size = (mm.get("image_size") if isinstance(mm, dict)
                      else mm)
        if image_size is None:
            raise ValueError("phi3v needs multi_modal_data['image_size'] "
                             "= (h, w) (multiples of the crop size)")
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected crops [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        h_crop, w_crop = image_size[0] // s, image_size[1] // s
        if pixel_values.shape[0] != 1 + h_crop * w_crop:
            raise ValueError(
                f"need 1 global + {h_crop}x{w_crop} sub crops, got "
                f"{pixel_values.shape[0]}")
        nc = pixel_values.shape[0]
        fn = self._crop_jits.get(nc)
        if fn is None:
            fn = self._crop_jits[nc] = jax.jit(
                lambda p, px: jax.vmap(
                    lambda one: self.vision.encode(p["vision"], one))(px))
        feats = np.asarray(fn(params, jnp.asarray(pixel_values)),
                           np.float32)                   # [N, s', C]
        sub_gn = np.asarray(params["sub_GN"], np.float32)
        glb_gn = np.asarray(params["glb_GN"], np.float32)
        glb = self._add_newline(self._merge_2x2(feats[0:1], 1, 1), sub_gn)
        sub = self._add_newline(
            self._merge_2x2(feats[1:], h_crop, w_crop), sub_gn)
        # sub_glb order: [sub..., glb_GN, global...] (phi3v.py:262-266).
        emb = jnp.asarray(
            np.concatenate([sub, glb_gn.reshape(1, -1), glb], axis=0))
        x = emb @ jnp.asarray(params["p0_w"], jnp.float32) \
            + jnp.asarray(params["p0_b"], jnp.float32)
        x = jax.nn.gelu(x, approximate=False)   # torch nn.GELU (erf)
        x = x @ jnp.asarray(params["p1_w"], jnp.float32) \
            + jnp.asarray(params["p1_b"], jnp.float32)
        return np.asarray(x, np.float32)

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        a = self.vision.arch
        vis = a.num_layers * (4 * a.hidden_size ** 2
                              + 2 * a.hidden_size * a.intermediate_size)
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
