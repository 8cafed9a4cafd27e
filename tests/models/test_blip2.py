"""BLIP-2: Q-Former feature parity vs HF and greedy E2E vs HF
Blip2ForConditionalGeneration (queries prepended upstream == placeholder
splice here, since OPT's learned positions cover the spliced rows).

Reference analog: vllm/model_executor/models/blip2.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 100
NQ = 4
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=24, patch_size=8)
QFORMER_CFG = dict(vocab_size=30, hidden_size=24, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=48,
                   encoder_hidden_size=32, cross_attention_frequency=1)
TEXT_CFG = dict(model_type="opt", vocab_size=128, hidden_size=48,
                ffn_dim=96, num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=128, word_embed_proj_dim=48,
                do_layer_norm_before=True, activation_function="relu")

CFG = {"architectures": ["Blip2ForConditionalGeneration"],
       "vision_config": VISION_CFG, "qformer_config": QFORMER_CFG,
       "text_config": TEXT_CFG, "num_query_tokens": NQ,
       "image_token_index": IMG, "eos_token_id": None}


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(31)
    cfg = transformers.Blip2Config(
        vision_config=VISION_CFG, qformer_config=QFORMER_CFG,
        text_config=TEXT_CFG, num_query_tokens=NQ,
        image_token_index=IMG)
    return transformers.Blip2ForConditionalGeneration(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_qformer_features_match_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(pix)))
    with torch.no_grad():
        px = torch.from_numpy(pix)[None]
        img = hf_model.vision_model(px).last_hidden_state
        q = hf_model.query_tokens.expand(1, -1, -1)
        qo = hf_model.qformer(query_embeds=q, encoder_hidden_states=img
                              ).last_hidden_state
        theirs = hf_model.language_projection(qo)[0].numpy()
    assert ours.shape == (NQ, 48)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_blip2_greedy_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 24, 24)).astype(np.float32)

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    text = [2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[[IMG] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    ids = [IMG] * NQ + text
    with torch.no_grad():
        out = hf_model.generate(
            pixel_values=torch.from_numpy(pix)[None],
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False)
    theirs = out[0].tolist()[-8:]
    assert ours == theirs
