"""Llava-OneVision: SigLIP tower ("full" feature strategy — raw last
layer, no post-norm) + mlp2 projector + Qwen2 text tower; anyres_max_N
images (bilinear downscale when the spatial grid exceeds N crops) and a
pooled video path with one trailing newline row per video.

Reference: vllm/model_executor/models/llava_onevision.py; packing mirrors
HF modeling_llava_onevision (pack_image_features, apply_pooling).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .llama import Qwen2Arch
from .llava_next import LlavaNextModel, _unpad, select_best_resolution
from .vision import VisionArch


class LlavaOnevisionModel(LlavaNextModel):
    architecture = "llava"

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "LlavaOnevisionModel":
        text = Qwen2Arch.from_hf_config(cfg["text_config"])
        vision = VisionArch.from_hf_config(
            {"model_type": "siglip_vision_model", **cfg["vision_config"]},
            text.hidden_size)
        vision.post_ln_feature = False   # strategy "full" at layer -1
        model = cls(text, vision, cfg.get("image_token_index", 151646),
                    cfg.get("image_grid_pinpoints", [(384, 384)]),
                    dtype=dtype)
        model.video_token_id = cfg.get("video_token_index", 151647)
        ar = cfg.get("vision_aspect_ratio", "anyres_max_9")
        model.max_num_patches = int(ar.lstrip("anyres_max_"))
        return model

    def assemble_image_features(self, params, pixel_values, mm):
        if isinstance(mm, dict) and "video" in mm:
            return self._assemble_video(params, pixel_values)
        return self._assemble_anyres(params, pixel_values,
                                     mm.get("image_size")
                                     if isinstance(mm, dict) else mm)

    def _encode_crops(self, params, pixel_values) -> np.ndarray:
        nc = pixel_values.shape[0]
        fn = self._crop_encode_jits.get(nc)
        if fn is None:
            fn = self._crop_encode_jits[nc] = jax.jit(
                lambda p, px: jax.vmap(
                    lambda one: self.vision.encode(p["vision"], one))(px))
        return np.asarray(fn(params, jnp.asarray(pixel_values)),
                          np.float32)

    def _assemble_anyres(self, params, pixel_values, image_size
                         ) -> np.ndarray:
        va = self.vision.arch
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (
                3, va.image_size, va.image_size):
            raise ValueError(
                f"expected crops [N, 3, {va.image_size}, "
                f"{va.image_size}], got {pixel_values.shape}")
        feats = self._encode_crops(params, pixel_values)   # [N, s*s, D]
        side = va.image_size // va.patch_size
        d = feats.shape[-1]
        base = feats[0]
        nl = np.asarray(params["image_newline"], np.float32)
        if feats.shape[0] == 1:
            return np.concatenate([base, nl[None]], axis=0)
        if image_size is None:
            raise ValueError("anyres images need multi_modal_data["
                             "'image_size']")
        nph, npw = (s // va.image_size for s in select_best_resolution(
            tuple(image_size), self.grid_pinpoints))
        spatial = feats[1:].reshape(nph, npw, side, side, d)
        spatial = spatial.transpose(4, 0, 2, 1, 3).reshape(
            d, nph * side, npw * side)
        spatial = _unpad(spatial, tuple(image_size))
        # anyres_max_N: bilinear downscale when the unpadded grid holds
        # more than N crops' worth of tokens (HF pack_image_features).
        ch, cw = spatial.shape[1:]
        ratio = math.sqrt(ch * cw / (self.max_num_patches * side ** 2))
        if ratio > 1.1:
            spatial = np.asarray(jax.image.resize(
                jnp.asarray(spatial),
                (d, int(ch // ratio), int(cw // ratio)), "bilinear",
                antialias=False),    # torch interpolate doesn't antialias
                np.float32)
        nl_col = np.broadcast_to(nl[:, None, None],
                                 (d, spatial.shape[1], 1))
        spatial = np.concatenate([spatial, nl_col], axis=-1)
        spatial = spatial.reshape(d, -1).T
        return np.concatenate([base, spatial], axis=0)

    def _assemble_video(self, params, frames) -> np.ndarray:
        """frames [F, 3, S, S] -> [F * pooled + 1, D]: projector first,
        bilinear pool to ceil(side/2), one trailing newline per video
        (HF apply_pooling + the video branch of forward)."""
        va = self.vision.arch
        if frames.ndim != 4 or frames.shape[1:] != (3, va.image_size,
                                                    va.image_size):
            raise ValueError(f"expected video frames [F, 3, "
                             f"{va.image_size}, {va.image_size}], got "
                             f"{frames.shape}")
        f = frames.shape[0]
        side = va.image_size // va.patch_size
        pooled = -(-side // 2)
        key = ("video", f)
        fn = self._crop_encode_jits.get(key)
        if fn is None:
            def video_fn(p, px):
                feats = jax.vmap(lambda one: self.vision.encode(
                    p["vision"], one))(px)                 # [F, s*s, D]
                d = feats.shape[-1]
                x = feats.reshape(f, side, side, d)
                x = jnp.transpose(x, (0, 3, 1, 2))
                x = jax.image.resize(x, (f, d, pooled, pooled),
                                     "bilinear", antialias=False)
                return jnp.transpose(x, (0, 2, 3, 1)).reshape(
                    f * pooled * pooled, d)
            fn = self._crop_encode_jits[key] = jax.jit(video_fn)
        feats = np.asarray(fn(params, jnp.asarray(frames)), np.float32)
        nl = np.asarray(params["image_newline"], np.float32)
        return np.concatenate([feats, nl[None]], axis=0)
