"""Idefics3: connector feature parity + greedy E2E vs HF
Idefics3ForConditionalGeneration (reference
vllm/model_executor/models/idefics3.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 100
S, SF = 24, 3
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=S, patch_size=8)
TEXT_CFG = dict(model_type="llama", vocab_size=128, hidden_size=48,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, rms_norm_eps=1e-5,
                tie_word_embeddings=False)
CFG = {"architectures": ["Idefics3ForConditionalGeneration"],
       "vision_config": VISION_CFG, "text_config": TEXT_CFG,
       "scale_factor": SF, "image_token_id": IMG, "eos_token_id": None}

TOK_PER_CROP = (S // 8) ** 2 // SF ** 2     # 9 patches / 9 = 1


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(51)
    cfg = transformers.Idefics3Config(
        vision_config=VISION_CFG, text_config=TEXT_CFG,
        scale_factor=SF, image_token_id=IMG)
    return transformers.Idefics3ForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_connector_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    crops = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(crops)))
    with torch.no_grad():
        vis = hf_model.model.vision_model(
            torch.from_numpy(crops)).last_hidden_state
        theirs = hf_model.model.connector(vis).flatten(0, 1).numpy()
    assert ours.shape == (2 * TOK_PER_CROP, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_idefics3_greedy_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    crops = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    n = 2 * TOK_PER_CROP

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    text = [2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[[IMG] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": crops})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [IMG] * n + text
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(crops)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
