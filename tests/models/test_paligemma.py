"""PaliGemma: SigLIP tower parity vs HF, and greedy E2E parity vs HF
PaliGemmaForConditionalGeneration (prefix-LM attention over the prompt).

Reference analog: vllm/model_executor/models/paligemma.py + siglip.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMAGE_TOKEN = 120
VISION_CFG = {
    "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 3,
    "num_attention_heads": 4, "image_size": 24, "patch_size": 8,
    "projection_dim": 48, "num_channels": 3,
}
TEXT_CFG = {
    "vocab_size": 128, "hidden_size": 48, "intermediate_size": 96,
    "num_hidden_layers": 2, "num_attention_heads": 4, "head_dim": 12,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rms_norm_eps": 1e-6, "model_type": "gemma",
}
NUM_PATCHES = (24 // 8) ** 2    # 9


def _cfg_dict():
    return {"architectures": ["PaliGemmaForConditionalGeneration"],
            "text_config": TEXT_CFG, "vision_config": VISION_CFG,
            "image_token_index": IMAGE_TOKEN,
            "projection_dim": 48, "eos_token_id": None}


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(11)
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(VISION_CFG, projection_dim=48),
        text_config=TEXT_CFG,
        image_token_index=IMAGE_TOKEN, projection_dim=48)
    return transformers.PaliGemmaForConditionalGeneration(cfg).eval()


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_siglip_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(_cfg_dict(), dtype=jnp.float32)
    assert model.vision.arch.style == "siglip"
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(pix)))
    with torch.no_grad():
        feats = hf_model.get_image_features(torch.from_numpy(pix)[None])
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        theirs = feats.squeeze(0).numpy()
    assert ours.shape == (NUM_PATCHES, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_paligemma_greedy_matches_hf(hf_model):
    # PaliGemma prompt layout: [image]*N + bos + text (prefix-LM).
    prompt = [IMAGE_TOKEN] + [2, 5, 9, 17, 23]
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)

    llm = LLM(hf_config=_cfg_dict(), dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    ids = ([IMAGE_TOKEN] * NUM_PATCHES) + [2, 5, 9, 17, 23]
    with torch.no_grad():
        want = hf_model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(pix)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = want[0][len(ids):].tolist()
    assert ours == theirs
