"""Fuyu: patch projection parity + greedy E2E vs HF FuyuForCausalLM
(reference vllm/model_executor/models/fuyu.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG, NL = 100, 101
PS = 8

CFG = {"architectures": ["FuyuForCausalLM"],
       "text_config": {
           "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "hidden_act": "relu2", "qk_layernorm": True,
           "partial_rotary_factor": 0.5, "rope_theta": 25000.0,
           "layer_norm_eps": 1e-5, "max_position_embeddings": 256,
           "tie_word_embeddings": False, "model_type": "persimmon"},
       "patch_size": PS, "num_channels": 3,
       "image_token_id": IMG, "image_newline_id": NL,
       "eos_token_id": None}


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(13)
    cfg = transformers.FuyuConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, patch_size=PS,
        max_position_embeddings=256, image_token_id=IMG)
    return transformers.FuyuForCausalLM(cfg).eval()


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _hf_patches(pix):
    """HF FuyuImageProcessor.patchify_image ordering: (ph, pw, C)."""
    t = torch.from_numpy(pix)[None]                        # [1, 3, H, W]
    p = t.unfold(2, PS, PS).unfold(3, PS, PS)
    p = p.contiguous().view(1, 3, -1, PS, PS)
    p = p.permute(0, 2, 3, 4, 1).reshape(1, -1, 3 * PS * PS)
    return p


def test_patch_projection_matches_hf(hf_model):
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_sd(hf_model))
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((3, 16, 24)).astype(np.float32)  # 2x3 grid
    ours = np.asarray(model.encode_image(params, jnp.asarray(pix)))
    # 2 rows of (3 patches + newline) = 8 rows
    assert ours.shape == (8, 64)
    with torch.no_grad():
        theirs = hf_model.model.vision_embed_tokens(
            _hf_patches(pix))[0].numpy()                   # [6, 64]
    # Patch rows (newline rows excluded) must match, row-major.
    np.testing.assert_allclose(ours[[0, 1, 2, 4, 5, 6]], theirs,
                               rtol=2e-4, atol=2e-4)
    # Newline rows carry the NEWLINE token's embedding.
    emb = np.asarray(model.embed(params, jnp.asarray([NL])))[0]
    np.testing.assert_allclose(ours[3], emb, rtol=1e-6, atol=1e-6)


def test_fuyu_greedy_matches_hf(hf_model):
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((3, 16, 16)).astype(np.float32)  # 2x2 grid
    nr, nc = 2, 2
    n_tokens = nr * (nc + 1)                                   # 6

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    llm.engine.params = llm.engine.model.load_hf_state_dict(_sd(hf_model))
    prompt = [IMG, 2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": pix})
    ours = list(outs[0].outputs[0].token_ids)

    # HF equivalent: patch placeholders row-major with NEWLINE per row,
    # image_patches_indices mapping placeholder positions to patch rows.
    ids, idxs, pi = [], [], 0
    for _ in range(nr):
        for _ in range(nc):
            ids.append(IMG)
            idxs.append(pi)
            pi += 1
        ids.append(NL)
        idxs.append(-1)
    ids += [2, 5, 9, 17]
    idxs += [-1] * 4
    assert len(ids) == n_tokens + 4
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor([ids]),
            image_patches=_hf_patches(pix),
            image_patches_indices=torch.tensor([idxs]),
            max_new_tokens=8, do_sample=False)
    theirs = out[0][len(ids):].tolist()
    assert ours == theirs
