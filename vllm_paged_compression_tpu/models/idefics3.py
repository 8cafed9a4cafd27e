"""Idefics3 (SmolVLM family): SigLIP-style vision tower + pixel-shuffle
connector + Llama text tower.

Reference: vllm/model_executor/models/idefics3.py; the connector mirrors
HF modeling_idefics3.Idefics3Connector — pixel shuffle by
``scale_factor`` (seq / sf², dim * sf²) then an unbiased linear
modality projection.  Inputs: ``multi_modal_data={"image": crops}`` with
crops [N, 3, S, S] (or a single [3, S, S]); the placeholder expands to
N * (patches / sf²) tokens, matching the HF processor's layout of
per-crop image-token runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel
from .vision import VisionArch, VisionTower


class Idefics3Model:
    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, vision_arch: VisionArch,
                 image_token_id: int, scale_factor: int,
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision = VisionTower(vision_arch, dtype=dtype)
        self.arch = text_arch
        self.image_token_id = image_token_id
        self.scale_factor = scale_factor
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "Idefics3Model":
        text = LlamaArch.from_hf_config(cfg["text_config"])
        vision = VisionArch.from_hf_config(
            {"model_type": "siglip_vision_model", **cfg["vision_config"]},
            text.hidden_size)
        vision.projector = "none"
        return cls(text, vision, cfg.get("image_token_id", 128257),
                   cfg.get("scale_factor", 2), dtype=dtype)

    @property
    def tokens_per_crop(self) -> int:
        return self.vision.arch.num_patches // (self.scale_factor ** 2)

    # ---- params ---------------------------------------------------------

    def _pos_ids(self) -> np.ndarray:
        """HF Idefics3VisionEmbeddings bucketized position ids for a FULL
        square grid (patch_attention_mask all ones).  NOT a plain arange:
        fractional coords are scaled by (1 - 1e-6), so bucketize(right)
        maps patch i to bucket max(i - 1, 0) — replicated exactly (float32
        like torch) so checkpoint parity holds."""
        g = self.vision.arch.image_size // self.vision.arch.patch_size
        boundaries = np.arange(1 / g, 1.0, 1 / g, dtype=np.float32)
        fc = (np.arange(g, dtype=np.float32) / g
              * np.float32(1 - 1e-6))
        b = np.searchsorted(boundaries, fc, side="right")
        return (b[:, None] * g + b[None, :]).reshape(-1)

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        rng = np.random.default_rng(seed + 2)
        din = self.vision.arch.hidden_size * self.scale_factor ** 2
        w = rng.standard_normal((din, self.arch.hidden_size)).astype(
            np.float32) * 0.02
        params["connector_w"] = (w if as_numpy
                                 else jnp.asarray(w, self.dtype))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        lang = {}
        for k, v in tensors.items():
            if k.startswith("model.text_model."):
                lang["model." + k[len("model.text_model."):]] = v
            elif k.startswith("lm_head"):
                lang[k] = v
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        params["vision"] = self.vision.load_hf_state_dict(
            tensors, vision_prefix="model.vision_model.")
        # Pre-gather the bucketized full-grid position rows so the shared
        # SigLIP encode's plain `+ pos` matches HF Idefics3 exactly.
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        w = np.asarray(
            tensors["model.connector.modality_projection.proj.weight"]).T
        params["connector_w"] = (w if as_numpy
                                 else jnp.asarray(w, self.dtype))
        return params

    # ---- image path -----------------------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        s = self.vision.arch.image_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected crops [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        return pixel_values

    def num_image_tokens_for(self, pixel_values) -> int:
        return pixel_values.shape[0] * self.tokens_per_crop

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """crops [N, 3, S, S] -> [N * tokens_per_crop, text_hidden]."""
        sf = self.scale_factor
        feats = jax.vmap(
            lambda px: self.vision.encode(params["vision"], px))(
            pixel_values)                           # [N, seq, Dv]
        n, seq, d = feats.shape
        g = int(round(seq ** 0.5))
        # HF Idefics3Connector.pixel_shuffle: [g, g, D] -> [g/sf, g/sf,
        # D*sf^2] via the interleaved width-then-height fold.
        x = feats.reshape(n, g, g // sf, d * sf)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, g // sf, g // sf, d * sf * sf)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n * (seq // (sf * sf)), d * sf * sf)
        return x @ params["connector_w"]

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
