"""MiniCPM-V 2.6: resampler + tower feature parity vs an independent
torch reference (HF Idefics2VisionTransformer + a torch Resampler2_5
replica of reference vllm minicpmv.py:122-216), and greedy E2E vs a
torch composition over HF Qwen2."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 100
S, Q = 24, 4
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=3, num_attention_heads=4,
                  image_size=S, patch_size=8)
D = 128
CFG = {"architectures": ["MiniCPMV"], "model_type": "minicpmv",
       "version": "2.6",
       "vocab_size": 128, "hidden_size": D, "intermediate_size": 96,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 128,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": False,
       "vision_config": VISION_CFG, "query_num": Q,
       "drop_vision_last_layer": True,
       "image_token_id": IMG, "eos_token_id": None}
G = S // 8


def _sincos_ref(embed_dim, h, w):
    # reference resampler.py:69-148, version (2, 5).
    def one(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    grid = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    return np.concatenate([one(embed_dim // 2, grid[0]),
                           one(embed_dim // 2, grid[1])], axis=-1)


class TorchResampler(torch.nn.Module):
    """Replica of minicpmv.py Resampler2_5 (keys carry 2D sincos pos)."""

    def __init__(self, num_queries, embed_dim, num_heads, kv_dim):
        super().__init__()
        self.query = torch.nn.Parameter(
            torch.randn(num_queries, embed_dim) * 0.02)
        self.kv_proj = torch.nn.Linear(kv_dim, embed_dim, bias=False)
        self.ln_q = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_kv = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_post = torch.nn.LayerNorm(embed_dim, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(embed_dim, num_heads)
        self.proj = torch.nn.Parameter(
            embed_dim ** -0.5 * torch.randn(embed_dim, embed_dim))

    def forward(self, x, grid):
        bs = x.shape[0]
        d = self.query.shape[1]
        pos = torch.from_numpy(
            _sincos_ref(d, grid, grid).reshape(grid * grid, -1)).float()
        pos = pos[:, None, :].expand(-1, bs, -1)
        x = self.ln_kv(self.kv_proj(x)).permute(1, 0, 2)
        q = self.ln_q(self.query)
        out = self.attn(q[:, None, :].expand(-1, bs, -1),
                        x + pos, x)[0].permute(1, 0, 2)
        return self.ln_post(out) @ self.proj


@pytest.fixture(scope="module")
def torch_parts():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig)
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer)
    torch.manual_seed(70)
    vc = Idefics2VisionConfig(**VISION_CFG)
    vc._attn_implementation = "eager"
    tower = Idefics2VisionTransformer(vc).eval()
    tower.encoder.layers = tower.encoder.layers[:-1]  # drop last layer
    torch.manual_seed(71)
    res = TorchResampler(Q, D, max(1, D // 128), 32).eval()
    torch.manual_seed(72)
    qwen = transformers.Qwen2ForCausalLM(transformers.Qwen2Config(
        vocab_size=128, hidden_size=D, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)).eval()
    return tower, res, qwen


def _full_sd(tower, res, qwen):
    sd = {"vpm." + k: v.detach().numpy()
          for k, v in tower.state_dict().items()}
    sd.update({"resampler." + k: v.detach().numpy()
               for k, v in res.state_dict().items()})
    sd.update({"llm." + k: v.detach().numpy()
               for k, v in qwen.state_dict().items()})
    return sd


def _torch_features(tower, res, slices):
    with torch.no_grad():
        feats = tower(torch.from_numpy(slices)).last_hidden_state
        return res(feats, G).flatten(0, 1).numpy()


def test_resampled_features_match_torch(torch_parts):
    tower, res, qwen = torch_parts
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_full_sd(tower, res, qwen))
    rng = np.random.default_rng(0)
    slices = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(slices)))
    want = _torch_features(tower, res, slices)
    assert ours.shape == (2 * Q, D)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_minicpmv_greedy_matches_torch_composition(torch_parts):
    tower, res, qwen = torch_parts
    rng = np.random.default_rng(1)
    slices = rng.standard_normal((1, 3, S, S)).astype(np.float32)
    n = Q

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _full_sd(tower, res, qwen))
    text = [2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[[IMG] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": slices})
    ours = list(outs[0].outputs[0].token_ids)

    feats = torch.from_numpy(_torch_features(tower, res, slices))
    ids = [IMG] * n + text
    with torch.no_grad():
        emb = qwen.get_input_embeddings()(torch.tensor(ids))
        emb[:n] = feats
        theirs = []
        for _ in range(8):
            logits = qwen(inputs_embeds=emb[None]).logits[0, -1]
            nxt = int(torch.argmax(logits))
            theirs.append(nxt)
            emb = torch.cat([emb, qwen.get_input_embeddings()(
                torch.tensor([nxt]))], dim=0)
    assert ours == theirs


def test_minicpmv25_llama_trunk_builds():
    cfg = dict(CFG, version="2.5")
    model = build_model(cfg, dtype=jnp.float32)
    assert type(model.arch).__name__ == "LlamaArch"
    p = model.init_params(seed=0)
    slices = np.zeros((1, 3, S, S), np.float32)
    out = model.encode_image(p, jnp.asarray(slices))
    assert out.shape == (Q, D)
    with pytest.raises(NotImplementedError):
        build_model(dict(CFG, version="2.0"), dtype=jnp.float32)
