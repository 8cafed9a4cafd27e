"""Llava-Next-Video: the Llava-Next anyres image path plus a video path —
per-frame tower features spatially pooled (vision_resampler) before the
projector, frames concatenated, no newline columns.

Reference: vllm/model_executor/models/llava_next_video.py; pooling
mirrors HF modeling_llava_next_video.LlavaNextVideoPooler (average/max,
``spatial_pool_stride``).  Inputs: ``multi_modal_data={"video": frames
[F, 3, S, S]}`` (and the image path via {"image", "image_size"} exactly
as Llava-Next).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llava_next import LlavaNextModel


class LlavaNextVideoModel(LlavaNextModel):
    architecture = "llava"

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "LlavaNextVideoModel":
        model = super().from_hf_config(cfg, dtype=dtype)
        model.video_token_id = cfg.get("video_token_index", 32000)
        model.spatial_pool_mode = cfg.get("spatial_pool_mode", "average")
        model.spatial_pool_stride = cfg.get("spatial_pool_stride", 2)
        if model.spatial_pool_mode not in ("average", "max"):
            raise NotImplementedError(
                "spatial_pool_mode must be average or max (the conv "
                "variant has no released checkpoints)")
        return model

    def assemble_image_features(self, params, pixel_values, mm):
        if isinstance(mm, dict) and "video" in mm:
            return self._assemble_video(params, pixel_values)
        return super().assemble_image_features(params, pixel_values, mm)

    def _assemble_video(self, params, frames) -> np.ndarray:
        """frames [F, 3, S, S] -> [F * pooled_tokens, text_hidden]."""
        va = self.vision.arch
        if frames.ndim != 4 or frames.shape[1:] != (3, va.image_size,
                                                    va.image_size):
            raise ValueError(f"expected video frames [F, 3, "
                             f"{va.image_size}, {va.image_size}], got "
                             f"{frames.shape}")
        f = frames.shape[0]
        st = self.spatial_pool_stride
        key = ("video", f)
        fn = self._crop_encode_jits.get(key)
        if fn is None:
            def video_fn(p, px):
                feats = jax.vmap(lambda one: self.vision.encode(
                    p["vision"], one, project=False))(px)   # [F, s*s, Dv]
                g = int(round(feats.shape[1] ** 0.5))
                d = feats.shape[-1]
                x = feats.reshape(f, g // st, st, g // st, st, d)
                if self.spatial_pool_mode == "average":
                    x = x.mean(axis=(2, 4))
                else:
                    x = x.max(axis=(2, 4))
                x = x.reshape(f * (g // st) ** 2, d)
                return self.vision.project(p["vision"], x)
            fn = self._crop_encode_jits[key] = jax.jit(video_fn)
        return np.asarray(fn(params, jnp.asarray(frames)), np.float32)
