"""Phi-3-Vision: HD transform vs an independent torch reference
implementation of vllm/model_executor/models/phi3v.py (no HF class —
Phi3V ships as remote code), + full-engine E2E."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 100
S = 16          # tiny crop size (analogous to 336)
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=3, num_attention_heads=4,
                  image_size=S, patch_size=4)   # 4x4=16 patches -> 2x2 HD
CFG = {"architectures": ["Phi3VForCausalLM"],
       "vocab_size": 128, "hidden_size": 48, "intermediate_size": 96,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 512,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": False,
       "vision_config": VISION_CFG,
       "img_processor": {"layer_idx": -2},
       "image_token_id": IMG, "eos_token_id": None}

# 2x1 sub-crop grid + global; side/2 = 2 HD rows per crop.
IMAGE_SIZE = (2 * S, S)
H_CROP, W_CROP = 2, 1


def _hf_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    torch.manual_seed(121)
    return CLIPVisionModel(CLIPVisionConfig(**VISION_CFG)).eval()


@pytest.fixture(scope="module")
def parts():
    clip = _hf_clip()
    torch.manual_seed(122)
    c4 = 4 * 32
    glb = torch.randn(1, 1, c4) * 0.1
    sub = torch.randn(1, 1, 1, c4) * 0.1
    p0 = torch.nn.Linear(c4, 48)
    p1 = torch.nn.Linear(48, 48)
    return clip, glb, sub, p0, p1


def _state_dict(parts):
    clip, glb, sub, p0, p1 = parts
    ve = "model.vision_embed_tokens."
    sd = {ve + "img_processor." + k: v.detach().numpy()
          for k, v in clip.state_dict().items()}
    sd[ve + "glb_GN"] = glb.detach().numpy()
    sd[ve + "sub_GN"] = sub.detach().numpy()
    sd[ve + "img_projection.0.weight"] = p0.weight.detach().numpy()
    sd[ve + "img_projection.0.bias"] = p0.bias.detach().numpy()
    sd[ve + "img_projection.2.weight"] = p1.weight.detach().numpy()
    sd[ve + "img_projection.2.bias"] = p1.bias.detach().numpy()
    # Phi-3 language tower (HF Phi3ForCausalLM ships fused projections).
    torch.manual_seed(123)
    hf = transformers.Phi3Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, pad_token_id=0)
    lm = transformers.Phi3ForCausalLM(hf).eval()
    sd.update({k: v.detach().numpy() for k, v in lm.state_dict().items()})
    return sd


def _torch_reference(parts, crops, image_size):
    """Independent torch implementation of Phi3HDImageEmbedding
    (phi3v.py:210-300, sub_glb order)."""
    clip, glb_gn, sub_gn, p0, p1 = parts
    half = (S // 4) // 2                       # 2

    def merge(feats, hc, wc):
        n, L, c = feats.shape
        s = int(L ** 0.5)
        x = feats.reshape(n, s // 2, 2, s // 2, 2, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(n, -1, 4 * c)
        x = x.reshape(1, hc, wc, s // 2, s // 2, 4 * c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(1, hc * (s // 2),
                                                wc * (s // 2), 4 * c)
        return x

    def newline(grid):
        n, h, w, c4 = grid.shape
        nl = sub_gn.expand(n, h, -1, -1)
        return torch.cat([grid, nl], dim=2).reshape(n, -1, c4)

    with torch.no_grad():
        out = clip(torch.from_numpy(crops), output_hidden_states=True)
        feats = out.hidden_states[-2][:, 1:]   # layer -2, drop CLS
        glb = newline(merge(feats[0:1], 1, 1))[0]
        sub = newline(merge(feats[1:], H_CROP, W_CROP))[0]
        emb = torch.cat([sub, glb_gn.squeeze(0), glb])
        return p1(torch.nn.functional.gelu(p0(emb))).numpy()


def test_hd_transform_matches_reference(parts):
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_state_dict(parts))
    rng = np.random.default_rng(0)
    crops = rng.standard_normal((1 + H_CROP * W_CROP, 3, S, S)).astype(
        np.float32)
    ours = model.assemble_image_features(params, crops,
                                         {"image_size": IMAGE_SIZE})
    want = _torch_reference(parts, crops, IMAGE_SIZE)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_phi3v_e2e_generation(parts):
    model = build_model(CFG, dtype=jnp.float32)
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0,
              params=model.load_hf_state_dict(_state_dict(parts)))
    rng = np.random.default_rng(1)
    crops = rng.standard_normal((1 + H_CROP * W_CROP, 3, S, S)).astype(
        np.float32)
    outs = llm.generate(prompt_token_ids=[[1, IMG, 5, 9]],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": crops,
                                          "image_size": IMAGE_SIZE})
    assert len(outs[0].outputs[0].token_ids) == 8
