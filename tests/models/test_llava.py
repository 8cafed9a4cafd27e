"""Llava multimodal: vision-tower parity vs HF CLIP, and greedy E2E
parity vs HF LlavaForConditionalGeneration on a tiny random model.

Reference test-strategy analog: tests/models/decoder_only/vision_language/
(HF-vs-engine greedy comparison, SURVEY §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

IMAGE_TOKEN = 30          # inside the tiny vocab
VISION_CFG = {
    "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 3,
    "num_attention_heads": 4, "image_size": 24, "patch_size": 8,
    "projection_dim": 32, "num_channels": 3,
}
TEXT_CFG = {
    "vocab_size": 128, "hidden_size": 48, "intermediate_size": 96,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False,
}
LLAVA_CFG = {
    "architectures": ["LlavaForConditionalGeneration"],
    "text_config": TEXT_CFG, "vision_config": VISION_CFG,
    "image_token_index": IMAGE_TOKEN, "vision_feature_layer": -2,
    "vision_feature_select_strategy": "default",
    "eos_token_id": None,
}
NUM_PATCHES = (24 // 8) ** 2    # 9


def _hf_llava():
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    torch.manual_seed(0)
    cfg = LlavaConfig(
        vision_config=CLIPVisionConfig(**VISION_CFG),
        text_config=LlamaConfig(**TEXT_CFG),
        image_token_index=IMAGE_TOKEN,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    model = LlavaForConditionalGeneration(cfg).eval()
    return model


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_model():
    return _hf_llava()


def test_vision_tower_matches_hf(hf_model):
    """Projected patch features must match HF's get_image_features."""
    import torch
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(LLAVA_CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_state_dict_np(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(pix)))
    with torch.no_grad():
        feats = hf_model.get_image_features(torch.from_numpy(pix)[None])
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        theirs = feats.squeeze(0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_llava_greedy_matches_hf(hf_model):
    import torch
    prompt = [1, 5, 9, IMAGE_TOKEN, 17, 23, 42]
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)

    llm = LLM(hf_config=LLAVA_CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              params=None, max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _state_dict_np(hf_model))
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    # HF: expand the placeholder to NUM_PATCHES copies, greedy generate.
    expanded = (prompt[:3] + [IMAGE_TOKEN] * NUM_PATCHES + prompt[4:])
    ids = torch.tensor([expanded])
    with torch.no_grad():
        gen = hf_model.generate(
            input_ids=ids, pixel_values=torch.from_numpy(pix)[None],
            max_new_tokens=8, do_sample=False)
    theirs = gen[0, ids.shape[1]:].tolist()
    assert ours == theirs


def test_image_changes_output(hf_model):
    prompt = [1, 5, 9, IMAGE_TOKEN, 17, 23, 42]
    rng = np.random.default_rng(2)
    llm = LLM(hf_config=LLAVA_CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    outs = [
        llm.generate(prompt_token_ids=[prompt], sampling_params=sp,
                     multi_modal_data={"image": rng.standard_normal(
                         (3, 24, 24)).astype(np.float32) * 3})[0]
        for _ in range(2)]
    a, b = (list(o.outputs[0].token_ids) for o in outs)
    assert a != b


def test_rejects_image_for_text_model():
    cfg = {**TEXT_CFG, "architectures": ["LlamaForCausalLM"],
           "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=32, seed=0)
    with pytest.raises(ValueError, match="vision tower"):
        llm.generate(prompt_token_ids=[[1, 2, 3]],
                     sampling_params=SamplingParams(max_tokens=2),
                     multi_modal_data={"image": np.zeros((3, 24, 24),
                                                         np.float32)})
