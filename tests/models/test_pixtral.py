"""Pixtral (HF-format llava): tower parity vs HF PixtralVisionModel and
greedy E2E vs HF LlavaForConditionalGeneration with a pixtral tower
(reference vllm/model_executor/models/pixtral.py HF-format classes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG, BRK, END = 30, 31, 32
PS = 8
VISION_CFG = dict(model_type="pixtral", hidden_size=32,
                  intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, head_dim=8, image_size=32,
                  patch_size=PS, rope_theta=10000.0)
TEXT_CFG = dict(model_type="llama", vocab_size=128, hidden_size=48,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=256, rms_norm_eps=1e-5,
                tie_word_embeddings=False)
CFG = {"architectures": ["LlavaForConditionalGeneration"],
       "vision_config": VISION_CFG, "text_config": TEXT_CFG,
       "image_token_index": IMG, "image_break_token_index": BRK,
       "image_end_token_index": END,
       "vision_feature_layer": -1,
       "vision_feature_select_strategy": "full",
       "projector_hidden_act": "gelu", "eos_token_id": None}


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (LlavaConfig,
                              LlavaForConditionalGeneration)
    torch.manual_seed(101)
    cfg = LlavaConfig(
        vision_config=VISION_CFG, text_config=TEXT_CFG,
        image_token_index=IMG, vision_feature_layer=-1,
        vision_feature_select_strategy="full")
    return LlavaForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_pixtral_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    from vllm_paged_compression_tpu.models.pixtral import PixtralLlavaModel
    assert isinstance(model, PixtralLlavaModel)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 16, 24)).astype(np.float32)  # 2x3 grid
    ours = model.assemble_image_features(params, pix, {})
    with torch.no_grad():
        feats = hf_model.model.get_image_features(
            torch.from_numpy(pix)[None],
            image_sizes=torch.tensor([[16, 24]]),
            vision_feature_layer=-1,
            vision_feature_select_strategy="full")
        theirs = (feats[0] if isinstance(feats, (list, tuple))
                  else feats.squeeze(0)).float().numpy()
    # ours interleaves [IMG_BREAK]/[IMG_END] embedding rows; the patch
    # rows themselves must match the HF projected features row-major.
    patch_rows = [r * 4 + c for r in range(2) for c in range(3)]
    assert ours.shape == (2 * 4, 48)
    np.testing.assert_allclose(ours[patch_rows], theirs,
                               rtol=3e-4, atol=3e-4)


def test_pixtral_greedy_matches_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 16, 24)).astype(np.float32)
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    n = model.assemble_image_features(params, pix, {}).shape[0]   # 9

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [1, 5, IMG, 9, 17]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    # HF/Mistral layout: patch rows with [IMG_BREAK] after each row, the
    # final row closed by [IMG_END]; only [IMG] positions get features.
    ids = [1, 5] + [IMG] * 3 + [BRK] + [IMG] * 3 + [END] + [9, 17]
    assert len(ids) == 4 + n
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(pix)[None],
            image_sizes=torch.tensor([[16, 24]]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
