"""Llava-Next (Llava 1.6) — anyres multi-crop vision-language model.

Reference: vllm/model_executor/models/llava_next.py; the crop/unpad math
mirrors HF modeling_llava_next (get_anyres_image_grid_shape, unpad_image,
pack_image_features).  Inputs: ``multi_modal_data={"image": crops
[num_crops, 3, S, S], "image_size": (orig_h, orig_w)}`` where crop 0 is
the base resize and crops 1..N tile the best-fit resolution.

The assembled feature length is data-dependent (unpadding), so features
are packed HOST-side at admission (engine ``assemble_image_features``)
and the prefill jit splices the precomputed block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel
from .llava import LlavaModel
from .vision import VisionArch


def select_best_resolution(original_size, possible_resolutions):
    """HF image_processing_llava_next.select_best_resolution."""
    oh, ow = original_size
    best, max_eff, min_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = h * w - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (h, w)
    return best


class LlavaNextModel(LlavaModel):
    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, vision_arch: VisionArch,
                 image_token_id: int, grid_pinpoints: list,
                 dtype=jnp.bfloat16):
        super().__init__(text_arch, vision_arch, image_token_id,
                         dtype=dtype)
        self.grid_pinpoints = [tuple(p) for p in grid_pinpoints]
        self._crop_encode_jits = {}

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "LlavaNextModel":
        text = LlamaArch.from_hf_config(cfg["text_config"])
        vision = VisionArch.from_hf_config(cfg["vision_config"],
                                           text.hidden_size)
        return cls(text, vision, cfg.get("image_token_index", 32000),
                   cfg.get("image_grid_pinpoints",
                           [(336, 672), (672, 336), (672, 672),
                            (1008, 336), (336, 1008)]),
                   dtype=dtype)

    # ---- params: + image_newline ----------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = super().init_params(seed, as_numpy=as_numpy)
        rng = np.random.default_rng(seed + 7)
        nl = rng.standard_normal(self.arch.hidden_size).astype(np.float32)
        params["image_newline"] = (nl if as_numpy
                                   else jnp.asarray(nl, self.dtype))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        nl = None
        for key in ("image_newline", "model.image_newline"):
            if key in tensors:
                nl = np.asarray(tensors[key])
        params = super().load_hf_state_dict(tensors, as_numpy=as_numpy)
        if nl is None:
            raise KeyError("image_newline missing from llava-next "
                           "checkpoint")
        params["image_newline"] = (nl if as_numpy
                                   else jnp.asarray(nl, self.dtype))
        return params

    # ---- anyres assembly (host) ------------------------------------------

    def assemble_image_features(self, params, pixel_values,
                                image_size) -> np.ndarray:
        """crops [num_crops, 3, S, S] + original (h, w) ->
        [n_tokens, text_hidden] packed features (HF pack_image_features:
        base crop + unpadded spatial grid with a newline column)."""
        if isinstance(image_size, dict):
            image_size = image_size.get("image_size")
        if image_size is None:
            raise ValueError("llava-next needs multi_modal_data["
                             "'image_size'] = (orig_h, orig_w)")
        va = self.vision.arch
        nc = pixel_values.shape[0]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (
                3, va.image_size, va.image_size):
            raise ValueError(
                f"expected crops [N, 3, {va.image_size}, "
                f"{va.image_size}], got {pixel_values.shape}")
        fn = self._crop_encode_jits.get(nc)
        if fn is None:
            fn = self._crop_encode_jits[nc] = jax.jit(
                lambda p, px: jax.vmap(
                    lambda one: self.vision.encode(p["vision"], one))(px))
        feats = np.asarray(fn(params, jnp.asarray(pixel_values)),
                           np.float32)                    # [N, s*s, D]
        side = va.image_size // va.patch_size
        d = feats.shape[-1]
        base = feats[0]
        nl = np.asarray(params["image_newline"], np.float32)
        if nc == 1:
            # Single-crop images still get one trailing newline row (HF
            # pack_image_features else-branch).
            return np.concatenate([base, nl[None]], axis=0)
        nph, npw = (s // va.image_size for s in select_best_resolution(
            tuple(image_size), self.grid_pinpoints))
        spatial = feats[1:].reshape(nph, npw, side, side, d)
        spatial = spatial.transpose(4, 0, 2, 1, 3).reshape(
            d, nph * side, npw * side)
        spatial = _unpad(spatial, tuple(image_size))
        nl_col = np.broadcast_to(nl[:, None, None],
                                 (d, spatial.shape[1], 1))
        spatial = np.concatenate([spatial, nl_col], axis=-1)
        spatial = spatial.reshape(d, -1).T                # [h*(w+1), D]
        return np.concatenate([base, spatial], axis=0)


def _unpad(tensor: np.ndarray, original_size) -> np.ndarray:
    """HF modeling_llava_next.unpad_image on [D, H, W]."""
    oh, ow = original_size
    ch, cw = tensor.shape[1:]
    if ow / oh > cw / ch:
        nh = int(round(oh * (cw / ow), 7))
        pad = (ch - nh) // 2
        return tensor[:, pad:ch - pad, :]
    nw = int(round(ow * (ch / oh), 7))
    pad = (cw - nw) // 2
    return tensor[:, :, pad:cw - pad]
