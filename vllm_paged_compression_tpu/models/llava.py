"""Llava-family vision-language model: CLIP vision tower + projector +
Llama language tower.

TPU-native re-design of the reference's llava support
(vllm/model_executor/models/llava.py + vllm/multimodal/, SURVEY C17).
The reference routes image tensors through a MultiModalRegistry of input
mappers and merges embeddings inside the model's forward; here the
language model simply accepts pre-built ``input_embeds`` and the prefill
program splices projected patch features over the image-placeholder span
(a fixed-shape dynamic_update_slice — the placeholder span is contiguous
after HF-style expansion).
"""

from __future__ import annotations

import jax.numpy as jnp

from .llama import LlamaArch, LlamaModel
from .vision import VisionArch, VisionTower


class LlavaModel:
    """Composite model; delegates the language side to LlamaModel so every
    engine path (paged decode, eviction, spec decode) works unchanged."""

    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, vision_arch: VisionArch,
                 image_token_id: int, dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision = VisionTower(vision_arch, dtype=dtype)
        self.arch = text_arch              # engine sizes KV off this
        self.image_token_id = image_token_id
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "LlavaModel":
        text = LlamaArch.from_hf_config(cfg["text_config"])
        vision = VisionArch.from_hf_config(cfg["vision_config"],
                                           text.hidden_size)
        return cls(text, vision, cfg.get("image_token_index", 32000),
                   dtype=dtype)

    @property
    def num_image_tokens(self) -> int:
        return self.vision.arch.num_patches

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        # Normalize both HF layouts: legacy "language_model.model.*" /
        # "vision_tower.*" and current "model.language_model.*" /
        # "model.vision_tower.*" (+ top-level lm_head).
        norm = {}
        for k, v in tensors.items():
            if k.startswith("model.language_model."):
                norm["model." + k[len("model.language_model."):]] = v
            elif k.startswith("language_model."):
                norm[k[len("language_model."):]] = v
            elif k.startswith("model."):
                norm[k[len("model."):]] = v
            else:
                norm[k] = v
        lang = {k: v for k, v in norm.items()
                if k.startswith("model.") or k == "lm_head.weight"}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        params["vision"] = self.vision.load_hf_state_dict(norm)
        return params

    # ---- forward (delegation) --------------------------------------------

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """[3, H, W] -> [num_patches, hidden] projected features."""
        return self.vision.encode(params["vision"], pixel_values)

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def forward_layers(self, params, *args, **kw):
        return self.language.forward_layers(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        a = self.vision.arch
        per_layer = (4 * a.hidden_size ** 2
                     + 2 * a.hidden_size * a.intermediate_size)
        vis = (a.num_layers * per_layer
               + 3 * a.patch_size ** 2 * a.hidden_size
               + 2 * a.projector_hidden * max(a.hidden_size,
                                              a.projector_hidden))
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
