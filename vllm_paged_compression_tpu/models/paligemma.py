"""PaliGemma vision-language model: SigLIP tower + linear projector +
Gemma (or Gemma2) language tower.

Reference: vllm/model_executor/models/paligemma.py (+ siglip.py).
Differences from Llava captured here: SigLIP encoder style (no CLS, post
layernorm, tanh-GELU), a single linear projector whose output is scaled
by text_hidden**-0.5 (HF modeling_paligemma get_image_features), and a
prefix-LM attention pattern — prompt tokens (image + text) attend
bidirectionally (``mm_bidirectional_prompt`` consumed by the runner's
image-prefill program).
"""

from __future__ import annotations

import jax.numpy as jnp

from .llama import Gemma2Arch, GemmaArch
from .llava import LlavaModel
from .vision import VisionArch


class PaliGemmaModel(LlavaModel):
    architecture = "llava"
    mm_bidirectional_prompt = True

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "PaliGemmaModel":
        tc = dict(cfg["text_config"])
        arch_cls = (Gemma2Arch if tc.get("model_type") == "gemma2"
                    else GemmaArch)
        text = arch_cls.from_hf_config(tc)
        vision = VisionArch.from_hf_config(
            {"model_type": "siglip_vision_model", **cfg["vision_config"]},
            text.hidden_size)
        vision.projector = "linear"
        vision.proj_scale = float(text.hidden_size) ** -0.5
        return cls(text, vision, cfg.get("image_token_index", 257152),
                   dtype=dtype)
