"""Registry coverage: every architecture the reference serves
(vllm/model_executor/models/registry.py — _TEXT_GENERATION_MODELS,
_EMBEDDING_MODELS, _CROSS_ENCODER_MODELS, _MULTIMODAL_MODELS,
_SPECULATIVE_DECODING_MODELS) resolves here too."""

import pytest

from vllm_paged_compression_tpu.models.registry import (
    build_model, supported_architectures)

REFERENCE_ARCHS = [
    "AquilaForCausalLM", "AquilaModel", "ArcticForCausalLM",
    "AriaForConditionalGeneration", "BaiChuanForCausalLM",
    "BaichuanForCausalLM", "BartForConditionalGeneration", "BartModel",
    "BertForSequenceClassification", "BertModel",
    "Blip2ForConditionalGeneration", "BloomForCausalLM",
    "ChameleonForConditionalGeneration",
    "ChatGLMForConditionalGeneration", "ChatGLMModel",
    "Cohere2ForCausalLM", "CohereForCausalLM", "DbrxForCausalLM",
    "DeciLMForCausalLM", "DeepseekForCausalLM", "DeepseekV2ForCausalLM",
    "EAGLEModel", "ExaoneForCausalLM", "FalconForCausalLM",
    "FalconMambaForCausalLM", "Florence2ForConditionalGeneration",
    "FuyuForCausalLM", "GPT2LMHeadModel", "GPTBigCodeForCausalLM",
    "GPTJForCausalLM", "GPTNeoXForCausalLM", "Gemma2ForCausalLM",
    "Gemma2Model", "GemmaForCausalLM", "GlmForCausalLM",
    "GraniteForCausalLM", "GraniteMoeForCausalLM", "GritLM",
    "H2OVLChatModel", "Idefics3ForConditionalGeneration",
    "InternLM2ForCausalLM", "InternLM2VEForCausalLM",
    "InternLMForCausalLM", "InternVLChatModel", "JAISLMHeadModel",
    "JambaForCausalLM", "JambaForSequenceClassification",
    "LLaMAForCausalLM", "LlamaForCausalLM", "LlamaModel",
    "LlavaForConditionalGeneration",
    "LlavaNextForConditionalGeneration",
    "LlavaNextVideoForConditionalGeneration",
    "LlavaOnevisionForConditionalGeneration",
    "MLPSpeculatorPreTrainedModel", "MPTForCausalLM",
    "MambaForCausalLM", "MantisForConditionalGeneration", "MedusaModel",
    "MiniCPM3ForCausalLM", "MiniCPMForCausalLM", "MiniCPMV",
    "MistralForCausalLM", "MistralModel", "MixtralForCausalLM",
    "MllamaForConditionalGeneration", "MolmoForCausalLM",
    "MptForCausalLM", "NVLM_D", "NemotronForCausalLM",
    "OPTForCausalLM", "Olmo2ForCausalLM", "OlmoForCausalLM",
    "OlmoeForCausalLM", "OrionForCausalLM",
    "PaliGemmaForConditionalGeneration", "PersimmonForCausalLM",
    "Phi3ForCausalLM", "Phi3SmallForCausalLM", "Phi3VForCausalLM",
    "PhiForCausalLM", "PhiMoEForCausalLM",
    "PixtralForConditionalGeneration", "QWenLMHeadModel",
    "QuantMixtralForCausalLM", "Qwen2AudioForConditionalGeneration",
    "Qwen2ForCausalLM", "Qwen2ForRewardModel",
    "Qwen2ForSequenceClassification", "Qwen2Model",
    "Qwen2MoeForCausalLM", "Qwen2VLForConditionalGeneration",
    "RWForCausalLM", "RobertaForMaskedLM",
    "RobertaForSequenceClassification", "RobertaModel",
    "SolarForCausalLM", "StableLMEpochForCausalLM",
    "StableLmForCausalLM", "Starcoder2ForCausalLM",
    "TeleChat2ForCausalLM", "UltravoxModel",
    "XLMRobertaForSequenceClassification", "XLMRobertaModel",
    "XverseForCausalLM",
]


def test_every_reference_architecture_is_supported():
    supported = set(supported_architectures())
    missing = [a for a in REFERENCE_ARCHS if a not in supported]
    assert not missing, f"unsupported reference architectures: {missing}"


def test_speculative_archs_point_at_spec_decode():
    for name in ("EAGLEModel", "MedusaModel",
                 "MLPSpeculatorPreTrainedModel"):
        with pytest.raises(ValueError, match="speculative"):
            build_model({"architectures": [name]})
