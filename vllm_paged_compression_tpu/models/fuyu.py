"""Fuyu-8B vision-language model: raw image patches linearly projected
straight into a Persimmon decoder (no vision tower).

Reference: vllm/model_executor/models/fuyu.py (+ persimmon.py).  The HF
Fuyu processor patchifies the image ((ph, pw, C)-flattened patches, HF
FuyuImageProcessor.patchify_image), projects each patch with
``vision_embed_tokens`` and splices them at placeholder positions, with a
NEWLINE token closing every patch row.  Here ``encode_image`` produces the
whole spliced block — projected patches plus the newline token's own
embedding at each row end — so the engine's contiguous placeholder splice
applies unchanged; images may be any size divisible by the patch size
(each distinct shape compiles its own prefill trace).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, PersimmonArch

_IMAGE_TOKEN_ID = 71011     # |SPEAKER| (vllm fuyu.py:_IMAGE_TOKEN_ID)
_NEWLINE_TOKEN_ID = 71019   # |NEWLINE| (vllm fuyu.py:_NEWLINE_TOKEN_ID)


class FuyuModel:
    architecture = "llava"

    def __init__(self, text_arch: PersimmonArch, patch_size: int,
                 image_token_id: int, newline_token_id: int,
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.patch_size = patch_size
        self.image_token_id = image_token_id
        self.newline_token_id = newline_token_id
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "FuyuModel":
        text = PersimmonArch.from_hf_config(cfg.get("text_config") or cfg)
        return cls(text, cfg.get("patch_size", 30),
                   cfg.get("image_token_id", _IMAGE_TOKEN_ID),
                   cfg.get("image_newline_id", _NEWLINE_TOKEN_ID),
                   dtype=dtype)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        rng = np.random.default_rng(seed + 1)
        pin = 3 * self.patch_size * self.patch_size
        d = self.arch.hidden_size
        w = rng.standard_normal((pin, d)).astype(np.float32) * 0.02
        b = np.zeros(d, np.float32)
        if not as_numpy:
            w, b = jnp.asarray(w, self.dtype), jnp.asarray(b, self.dtype)
        params["vision_w"], params["vision_b"] = w, b
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        norm = {}
        for k, v in tensors.items():
            # "model.language_model.*" (current HF) or
            # "language_model.model.*" (legacy) -> "model.*".
            if k.startswith("model.language_model."):
                norm["model." + k[len("model.language_model."):]] = v
            elif k.startswith("language_model.model."):
                norm["model." + k[len("language_model.model."):]] = v
            elif k.startswith("language_model."):
                norm[k[len("language_model."):]] = v
            elif k.startswith("model.vision_embed_tokens."):
                norm[k[len("model."):]] = v
            else:
                norm[k] = v
        lang = {k: v for k, v in norm.items()
                if k.startswith("model.") or k.startswith("lm_head")}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        leaf = (np.asarray if as_numpy
                else lambda x: jnp.asarray(x, self.dtype))
        params["vision_w"] = leaf(
            np.asarray(norm["vision_embed_tokens.weight"]).T)
        params["vision_b"] = leaf(
            np.asarray(norm["vision_embed_tokens.bias"]))
        return params

    # ---- image path -----------------------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        ps = self.patch_size
        if (pixel_values.ndim != 3 or pixel_values.shape[0] != 3
                or pixel_values.shape[1] % ps
                or pixel_values.shape[2] % ps):
            raise ValueError(
                f"expected pixel_values [3, H, W] with H, W divisible by "
                f"{ps}, got {pixel_values.shape}")
        return pixel_values

    def num_image_tokens_for(self, pixel_values) -> int:
        ps = self.patch_size
        nr, nc = pixel_values.shape[1] // ps, pixel_values.shape[2] // ps
        return nr * (nc + 1)        # + one NEWLINE per patch row

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """[3, H, W] -> [nrow*(ncol+1), D]: projected patches row-major
        with the NEWLINE token's embedding closing each row."""
        ps = self.patch_size
        _, h, w = pixel_values.shape
        nr, nc = h // ps, w // ps
        x = pixel_values.astype(self.dtype)
        # (ph, pw, C)-flattened patches (HF FuyuImageProcessor
        # patchify_image permutes channels LAST).
        x = x.reshape(3, nr, ps, nc, ps)
        x = jnp.transpose(x, (1, 3, 2, 4, 0)).reshape(nr * nc, ps * ps * 3)
        feats = x @ params["vision_w"] + params["vision_b"]   # [n, D]
        d = feats.shape[-1]
        nl = self.language.embed(
            params, jnp.asarray([self.newline_token_id]))     # [1, D]
        feats = feats.reshape(nr, nc, d)
        nl_rows = jnp.broadcast_to(nl[None], (nr, 1, d)).astype(feats.dtype)
        return jnp.concatenate([feats, nl_rows], axis=1).reshape(
            nr * (nc + 1), d)

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def forward_layers(self, params, *args, **kw):
        return self.language.forward_layers(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        pin = 3 * self.patch_size * self.patch_size
        return (self.language.param_bytes()
                + pin * self.arch.hidden_size
                * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
