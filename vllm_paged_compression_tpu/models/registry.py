"""Model registry: HF architecture string -> model class
(reference: vllm/model_executor/models/registry.py, lazy-load pattern)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

_REGISTRY: dict[str, Any] = {}


def register_model(hf_arch: str):
    def deco(cls):
        _REGISTRY[hf_arch] = cls
        return cls
    return deco


def _ensure_builtin():
    if _REGISTRY:
        return
    from .llama import (ArcticArch, Phi3SmallArch,
                        BaichuanArch, BloomArch, ChatGLMArch, Cohere2Arch,
                        CohereArch,
                        DbrxArch, DeciLMArch,
                        DeepseekV1Arch,
                        DeepseekV2Arch, DeepseekV3Arch,
                        ExaoneArch,
                        FalconArch, GPTBigCodeArch, JaisArch, MiniCPM3Arch,
                        MptArch, PersimmonArch, PhiMoEArch, TeleChat2Arch,
                        Gemma2Arch, GemmaArch, Glm4Arch, GlmArch,
                        GPTJArch, GPTNeoXArch, GraniteArch, GraniteMoeArch,
                        InternLM2Arch, InternLMArch, LlamaArch, LlamaModel,
                        MiniCPMArch,
                        MixtralArch, NemotronArch, Olmo2Arch, OlmoArch,
                        OlmoeArch,
                        OrionArch, Phi3Arch, PhiArch, Qwen2Arch,
                        Qwen2MoeArch, Qwen3Arch, Qwen3MoeArch, QwenV1Arch,
                        StableLmArch, Starcoder2Arch)
    from .opt import GPT2Arch, OPTArch, OPTModel
    _REGISTRY.update({
        "LlamaForCausalLM": (LlamaModel, LlamaArch),
        "MistralForCausalLM": (LlamaModel, LlamaArch),
        "MixtralForCausalLM": (LlamaModel, MixtralArch),
        "Qwen2ForCausalLM": (LlamaModel, Qwen2Arch),
        "Qwen3ForCausalLM": (LlamaModel, Qwen3Arch),
        "Qwen2MoeForCausalLM": (LlamaModel, Qwen2MoeArch),
        "Qwen3MoeForCausalLM": (LlamaModel, Qwen3MoeArch),
        "GemmaForCausalLM": (LlamaModel, GemmaArch),
        "Gemma2ForCausalLM": (LlamaModel, Gemma2Arch),
        "Phi3ForCausalLM": (LlamaModel, Phi3Arch),
        "PhiForCausalLM": (LlamaModel, PhiArch),
        "Starcoder2ForCausalLM": (LlamaModel, Starcoder2Arch),
        "StableLmForCausalLM": (LlamaModel, StableLmArch),
        "GPTNeoXForCausalLM": (LlamaModel, GPTNeoXArch),
        "GPTJForCausalLM": (LlamaModel, GPTJArch),
        "FalconForCausalLM": (LlamaModel, FalconArch),
        "RWForCausalLM": (LlamaModel, FalconArch),
        "CohereForCausalLM": (LlamaModel, CohereArch),
        "Cohere2ForCausalLM": (LlamaModel, Cohere2Arch),
        "BaichuanForCausalLM": (LlamaModel, BaichuanArch),
        "BaiChuanForCausalLM": (LlamaModel, BaichuanArch),
        "InternLM2ForCausalLM": (LlamaModel, InternLM2Arch),
        "OPTForCausalLM": (OPTModel, OPTArch),
        "GPT2LMHeadModel": (OPTModel, GPT2Arch),
        "OlmoForCausalLM": (LlamaModel, OlmoArch),
        "Olmo2ForCausalLM": (LlamaModel, Olmo2Arch),
        "GraniteForCausalLM": (LlamaModel, GraniteArch),
        "GraniteMoeForCausalLM": (LlamaModel, GraniteMoeArch),
        "NemotronForCausalLM": (LlamaModel, NemotronArch),
        "GlmForCausalLM": (LlamaModel, GlmArch),
        "Glm4ForCausalLM": (LlamaModel, Glm4Arch),
        "ExaoneForCausalLM": (LlamaModel, ExaoneArch),
        "SolarForCausalLM": (LlamaModel, LlamaArch),
        "OrionForCausalLM": (LlamaModel, OrionArch),
        "MiniCPMForCausalLM": (LlamaModel, MiniCPMArch),
        "DbrxForCausalLM": (LlamaModel, DbrxArch),
        "DeepseekForCausalLM": (LlamaModel, DeepseekV1Arch),
        "DeepseekV2ForCausalLM": (LlamaModel, DeepseekV2Arch),
        "DeepseekV3ForCausalLM": (LlamaModel, DeepseekV3Arch),
        # Llama-named checkpoint aliases (reference registry.py maps these
        # to the same llama/stablelm/mixtral impls).
        "LLaMAForCausalLM": (LlamaModel, LlamaArch),
        "AquilaForCausalLM": (LlamaModel, LlamaArch),
        "AquilaModel": (LlamaModel, LlamaArch),
        "XverseForCausalLM": (LlamaModel, LlamaArch),
        "InternLMForCausalLM": (LlamaModel, InternLMArch),
        "StableLMEpochForCausalLM": (LlamaModel, StableLmArch),
        "StablelmForCausalLM": (LlamaModel, StableLmArch),
        "QuantMixtralForCausalLM": (LlamaModel, MixtralArch),
        "QWenLMHeadModel": (LlamaModel, QwenV1Arch),
        "OlmoeForCausalLM": (LlamaModel, OlmoeArch),
        # ALiBi / learned-position families.
        "BloomForCausalLM": (LlamaModel, BloomArch),
        "MptForCausalLM": (LlamaModel, MptArch),
        "MPTForCausalLM": (LlamaModel, MptArch),
        "GPTBigCodeForCausalLM": (LlamaModel, GPTBigCodeArch),
        "JAISLMHeadModel": (LlamaModel, JaisArch),
        "PersimmonForCausalLM": (LlamaModel, PersimmonArch),
        "ChatGLMForCausalLM": (LlamaModel, ChatGLMArch),
        "ChatGLMModel": (LlamaModel, ChatGLMArch),
        "ChatGLMForConditionalGeneration": (LlamaModel, ChatGLMArch),
        "TeleChat2ForCausalLM": (LlamaModel, TeleChat2Arch),
        "MiniCPM3ForCausalLM": (LlamaModel, MiniCPM3Arch),
        "PhimoeForCausalLM": (LlamaModel, PhiMoEArch),
        "PhiMoEForCausalLM": (LlamaModel, PhiMoEArch),
        "DeciLMForCausalLM": (LlamaModel, DeciLMArch),
        "ArcticForCausalLM": (LlamaModel, ArcticArch),
        "Phi3SmallForCausalLM": (LlamaModel, Phi3SmallArch),
        # Bare-trunk / embedding variants (reference registry.py
        # _EMBEDDING_MODELS maps "*Model" names to the decoder impls; the
        # engine serves them through encode()).  GritLM is a Mistral
        # checkpoint served for both generate and embed
        # (vllm/model_executor/models/gritlm.py).
        "LlamaModel": (LlamaModel, LlamaArch),
        "MistralModel": (LlamaModel, LlamaArch),
        "Qwen2Model": (LlamaModel, Qwen2Arch),
        "Qwen2EmbeddingModel": (LlamaModel, Qwen2Arch),
        "Gemma2Model": (LlamaModel, Gemma2Arch),
        "GritLM": (LlamaModel, LlamaArch),
        # InternLM2-VE ("visual expert": a second MLP branch applied to
        # image tokens, vllm/model_executor/models/internlm2_ve.py) — the
        # text path is exactly InternLM2, which is what text-only serving
        # exercises.
        "InternLM2VEForCausalLM": (LlamaModel, InternLM2Arch),
    })


def supported_architectures() -> list[str]:
    _ensure_builtin()
    return sorted(set(_REGISTRY) | set(_BERT_ARCHS) | set(_POOLING_HEADS)
                  | {"LlavaForConditionalGeneration",
                     "MantisForConditionalGeneration",
                     "LlavaNextForConditionalGeneration",
                     "LlavaNextVideoForConditionalGeneration",
                     "LlavaOnevisionForConditionalGeneration",
                     "ChameleonForConditionalGeneration",
                     "PixtralForConditionalGeneration",
                     "Phi3VForCausalLM",
                     "PaliGemmaForConditionalGeneration",
                     "Blip2ForConditionalGeneration",
                     "Qwen2AudioForConditionalGeneration",
                     "UltravoxModel",
                     "Idefics3ForConditionalGeneration",
                     "InternVLChatModel", "H2OVLChatModel", "NVLM_D",
                     "MiniCPMV", "MolmoForCausalLM",
                     "AriaForConditionalGeneration",
                     "MllamaForConditionalGeneration",
                     "Qwen2VLForConditionalGeneration",
                     "FuyuForCausalLM",
                     "MambaForCausalLM", "FalconMambaForCausalLM",
                     "JambaForCausalLM", "JambaForSequenceClassification",
                     "BartForConditionalGeneration", "BartModel",
                     "Florence2ForConditionalGeneration"}
                  | set(_SPECULATIVE_ARCHS))


# Decoder trunks served as pooling-task models (reference qwen2_cls.py /
# qwen2_rm.py): arch name -> (base arch registry key, head_type).
_POOLING_HEADS = {
    "Qwen2ForSequenceClassification": ("Qwen2ForCausalLM", "cls"),
    "Qwen2ForRewardModel": ("Qwen2ForCausalLM", "reward"),
    "LlamaForSequenceClassification": ("LlamaForCausalLM", "cls"),
}


_BERT_ARCHS = {
    "BertModel": (False, False), "BertForMaskedLM": (False, False),
    "BertEmbeddingModel": (False, False),
    "RobertaModel": (True, False), "XLMRobertaModel": (True, False),
    "RobertaForMaskedLM": (True, False),
    "BertForSequenceClassification": (False, True),
    "RobertaForSequenceClassification": (True, True),
    "XLMRobertaForSequenceClassification": (True, True),
}


# Draft-model architectures (reference registry.py
# _SPECULATIVE_DECODING_MODELS): not servable standalone — they load
# through the speculative-decoding config (spec_decode/).
_SPECULATIVE_ARCHS = {
    "EAGLEModel": "eagle",
    "MedusaModel": "medusa",
    "MLPSpeculatorPreTrainedModel": "mlp_speculator",
}


def build_model(hf_config: dict, dtype=jnp.bfloat16):
    """Instantiate a model from an HF config dict (its ``architectures``
    field picks the class)."""
    _ensure_builtin()
    archs = hf_config.get("architectures") or []
    for name in archs:
        if name in _SPECULATIVE_ARCHS:
            raise ValueError(
                f"{name} is a draft-model architecture; serve it via "
                f"speculative decoding (speculative_method="
                f"'{_SPECULATIVE_ARCHS[name]}' + speculative_model "
                f"pointing at the checkpoint), not as a target model")
        if name in ("LlavaForConditionalGeneration",
                    "MantisForConditionalGeneration",
                    "PixtralForConditionalGeneration"):
            # Mantis shares the llava architecture (reference registry.py
            # maps it onto the llava impl); HF-format Pixtral is a llava
            # checkpoint with a pixtral vision tower.
            vc = hf_config.get("vision_config") or {}
            if (name == "PixtralForConditionalGeneration"
                    or vc.get("model_type") == "pixtral"):
                from .pixtral import PixtralLlavaModel
                return PixtralLlavaModel.from_hf_config(hf_config,
                                                        dtype=dtype)
            from .llava import LlavaModel
            return LlavaModel.from_hf_config(hf_config, dtype=dtype)
        if name == "PaliGemmaForConditionalGeneration":
            from .paligemma import PaliGemmaModel
            return PaliGemmaModel.from_hf_config(hf_config, dtype=dtype)
        if name == "FuyuForCausalLM":
            from .fuyu import FuyuModel
            return FuyuModel.from_hf_config(hf_config, dtype=dtype)
        if name == "LlavaNextForConditionalGeneration":
            from .llava_next import LlavaNextModel
            return LlavaNextModel.from_hf_config(hf_config, dtype=dtype)
        if name == "Blip2ForConditionalGeneration":
            from .blip2 import Blip2Model
            return Blip2Model.from_hf_config(hf_config, dtype=dtype)
        if name == "Qwen2AudioForConditionalGeneration":
            from .qwen2_audio import Qwen2AudioModel
            return Qwen2AudioModel.from_hf_config(hf_config, dtype=dtype)
        if name == "Idefics3ForConditionalGeneration":
            from .idefics3 import Idefics3Model
            return Idefics3Model.from_hf_config(hf_config, dtype=dtype)
        if name == "Qwen2VLForConditionalGeneration":
            from .qwen2_vl import Qwen2VLModel
            return Qwen2VLModel.from_hf_config(hf_config, dtype=dtype)
        if name == "LlavaNextVideoForConditionalGeneration":
            from .llava_next_video import LlavaNextVideoModel
            return LlavaNextVideoModel.from_hf_config(hf_config,
                                                      dtype=dtype)
        if name == "LlavaOnevisionForConditionalGeneration":
            from .llava_onevision import LlavaOnevisionModel
            return LlavaOnevisionModel.from_hf_config(hf_config,
                                                      dtype=dtype)
        if name == "ChameleonForConditionalGeneration":
            from .chameleon import ChameleonModel
            return ChameleonModel.from_hf_config(hf_config, dtype=dtype)
        if name == "UltravoxModel":
            from .ultravox import UltravoxModel
            return UltravoxModel.from_hf_config(hf_config, dtype=dtype)
        if name == "Phi3VForCausalLM":
            from .phi3v import Phi3VModel
            return Phi3VModel.from_hf_config(hf_config, dtype=dtype)
        if name == "MllamaForConditionalGeneration":
            from .mllama import MllamaModel
            return MllamaModel.from_hf_config(hf_config, dtype=dtype)
        if name == "AriaForConditionalGeneration":
            from .aria import AriaModel
            return AriaModel.from_hf_config(hf_config, dtype=dtype)
        if name == "MolmoForCausalLM":
            from .molmo import MolmoModel
            return MolmoModel.from_hf_config(hf_config, dtype=dtype)
        if name == "MiniCPMV":
            from .minicpmv import MiniCPMVModel
            return MiniCPMVModel.from_hf_config(hf_config, dtype=dtype)
        if name in ("InternVLChatModel", "H2OVLChatModel", "NVLM_D"):
            # One implementation covers all three (internvl.py); H2OVL
            # differs only in host-side MSAC tiling, NVLM-D in the mlp1
            # shape (selected by style).
            from .internvl import InternVLModel
            return InternVLModel.from_hf_config(
                hf_config, dtype=dtype,
                style="nvlm" if name == "NVLM_D" else "internvl")
        if name in ("MambaForCausalLM", "FalconMambaForCausalLM"):
            from .mamba import MambaArch, MambaModel
            return MambaModel(MambaArch.from_hf_config(hf_config),
                              dtype=dtype)
        if name in ("BartForConditionalGeneration", "BartModel"):
            from .bart import BartArch, BartModel
            return BartModel(BartArch.from_hf_config(hf_config),
                             dtype=dtype)
        if name == "Florence2ForConditionalGeneration":
            # Language-model-only, like the reference (florence2.py:200
            # "TODO: Add vision backbone" — vision weights skipped).
            from .bart import BartArch, BartModel
            return BartModel(
                BartArch.from_hf_config(hf_config.get("text_config")
                                        or hf_config), dtype=dtype)
        if name in ("JambaForCausalLM", "JambaForSequenceClassification"):
            from .jamba import JambaArch, JambaModel
            arch = JambaArch.from_hf_config(hf_config)
            if name.endswith("SequenceClassification"):
                arch.head_type = "cls"
                arch.num_labels = (len(hf_config.get("id2label") or [])
                                   or hf_config.get("num_labels") or 1)
            return JambaModel(arch, dtype=dtype)
        if name in _BERT_ARCHS:
            from .bert import BertArch, BertModel
            roberta, classifier = _BERT_ARCHS[name]
            arch = BertArch.from_hf_config(
                hf_config, roberta=roberta,
                num_labels=(len(hf_config.get("id2label") or [])
                            or (1 if classifier else 0))
                if classifier else 0)
            return BertModel(arch, dtype=dtype)
        if name in _POOLING_HEADS:
            base, head_type = _POOLING_HEADS[name]
            model_cls, arch_cls = _REGISTRY[base]
            arch = arch_cls.from_hf_config(hf_config)
            arch.head_type = head_type
            arch.num_labels = (len(hf_config.get("id2label") or [])
                               or hf_config.get("num_labels") or 1)
            return model_cls(arch, dtype=dtype)
        if name in _REGISTRY:
            model_cls, arch_cls = _REGISTRY[name]
            return model_cls(arch_cls.from_hf_config(hf_config), dtype=dtype)
    raise ValueError(
        f"No supported architecture in {archs}; "
        f"supported: {supported_architectures() + ['LlavaForConditionalGeneration']}")
