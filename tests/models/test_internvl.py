"""InternVL family: InternViT + pixel-shuffle + mlp1 feature parity vs an
independent torch reference (the OpenGVLab remote code has no transformers
class — reference vllm/model_executor/models/intern_vit.py SDPA path +
internvl.py extract_feature), greedy E2E token parity vs a torch-side
composition over HF Qwen2, and the NVLM-D mlp1 variant."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 100
S = 16
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=3, num_attention_heads=4,
                  image_size=S, patch_size=4, norm_type="layer_norm",
                  qk_normalization=False, qkv_bias=True,
                  layer_norm_eps=1e-6, hidden_act="gelu")
TEXT_CFG = dict(model_type="qwen2", architectures=["Qwen2ForCausalLM"],
                vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                rope_theta=10000.0, rms_norm_eps=1e-5,
                tie_word_embeddings=False)
CFG = {"architectures": ["InternVLChatModel"],
       "vision_config": VISION_CFG, "text_config": TEXT_CFG,
       "select_layer": -1, "downsample_ratio": 0.5, "ps_version": "v2",
       "image_token_id": IMG, "eos_token_id": None}
G = S // 4                       # 4x4 patch grid
TOK_PER_TILE = (G * G) // 4      # pixel shuffle 0.5 -> 4 patches / token


class TorchInternViT(torch.nn.Module):
    """Independent reference implementation of intern_vit.py
    (InternSdpaAttention :214-280 + InternVisionEncoderLayer :311-376)."""

    def __init__(self, vc, rms=False, qk_norm=False):
        super().__init__()
        d, i = vc["hidden_size"], vc["intermediate_size"]
        L = vc["num_hidden_layers"]
        self.vc, self.rms, self.qk_norm = vc, rms, qk_norm
        self.cls = torch.nn.Parameter(torch.randn(1, 1, d))
        self.patch = torch.nn.Conv2d(3, d, vc["patch_size"],
                                     vc["patch_size"])
        n = (vc["image_size"] // vc["patch_size"]) ** 2 + 1
        self.pos = torch.nn.Parameter(torch.randn(1, n, d))
        mk_norm = ((lambda: transformers.models.llama.modeling_llama
                    .LlamaRMSNorm(d, eps=vc["layer_norm_eps"]))
                   if rms else
                   (lambda: torch.nn.LayerNorm(d,
                                               eps=vc["layer_norm_eps"])))
        self.layers = torch.nn.ModuleList()
        for _ in range(L):
            lay = torch.nn.Module()
            lay.norm1, lay.norm2 = mk_norm(), mk_norm()
            lay.qkv = torch.nn.Linear(d, 3 * d, bias=vc["qkv_bias"])
            lay.proj = torch.nn.Linear(d, d)
            if qk_norm:
                lay.q_norm = transformers.models.llama.modeling_llama \
                    .LlamaRMSNorm(d, eps=vc["layer_norm_eps"])
                lay.k_norm = transformers.models.llama.modeling_llama \
                    .LlamaRMSNorm(d, eps=vc["layer_norm_eps"])
            lay.fc1 = torch.nn.Linear(d, i)
            lay.fc2 = torch.nn.Linear(i, d)
            lay.ls1 = torch.nn.Parameter(torch.rand(d) + 0.5)
            lay.ls2 = torch.nn.Parameter(torch.rand(d) + 0.5)
            self.layers.append(lay)

    def forward(self, px):
        h = self.patch(px).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls.expand(px.shape[0], 1, -1), h], dim=1)
        h = h + self.pos
        nh = self.vc["num_attention_heads"]
        for lay in self.layers:
            x = lay.norm1(h)
            q, k, v = lay.qkv(x).chunk(3, dim=-1)
            if self.qk_norm:
                q, k = lay.q_norm(q), lay.k_norm(k)
            B, N, D = q.shape
            q = q.view(B, N, nh, D // nh).transpose(1, 2)
            k = k.view(B, N, nh, D // nh).transpose(1, 2)
            v = v.view(B, N, nh, D // nh).transpose(1, 2)
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(B, N, D)
            h = h + lay.proj(o) * lay.ls1
            h = h + lay.fc2(torch.nn.functional.gelu(
                lay.fc1(lay.norm2(h)))) * lay.ls2
        return h

    def state_dict_vllm(self):
        sd = {"vision_model.embeddings.class_embedding":
              self.cls.detach().numpy(),
              "vision_model.embeddings.patch_embedding.weight":
              self.patch.weight.detach().numpy(),
              "vision_model.embeddings.patch_embedding.bias":
              self.patch.bias.detach().numpy(),
              "vision_model.embeddings.position_embedding":
              self.pos.detach().numpy()}
        for li, lay in enumerate(self.layers):
            p = f"vision_model.encoder.layers.{li}."
            for name, mod in (("norm1", lay.norm1), ("norm2", lay.norm2),
                              ("attn.qkv", lay.qkv),
                              ("attn.proj", lay.proj),
                              ("mlp.fc1", lay.fc1), ("mlp.fc2", lay.fc2)):
                sd[p + name + ".weight"] = mod.weight.detach().numpy()
                if getattr(mod, "bias", None) is not None:
                    sd[p + name + ".bias"] = mod.bias.detach().numpy()
            if self.qk_norm:
                sd[p + "attn.q_norm.weight"] = \
                    lay.q_norm.weight.detach().numpy()
                sd[p + "attn.k_norm.weight"] = \
                    lay.k_norm.weight.detach().numpy()
            sd[p + "ls1"] = lay.ls1.detach().numpy()
            sd[p + "ls2"] = lay.ls2.detach().numpy()
        return sd


def _pixel_shuffle_torch(x, sf=0.5):
    # internvl.py:573-585, ps_version v2.
    n, w, h, c = x.shape
    x = x.view(n, w, int(h * sf), int(c / sf))
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.view(n, int(h * sf), int(w * sf), int(c / (sf * sf)))
    return x.permute(0, 2, 1, 3).contiguous()


def _mk_mlp1(style="internvl", seed=7):
    torch.manual_seed(seed)
    din = 4 * VISION_CFG["hidden_size"]
    mid = (TEXT_CFG["intermediate_size"] if style == "nvlm"
           else TEXT_CFG["hidden_size"])
    bias = style != "nvlm"
    return torch.nn.Sequential(
        torch.nn.LayerNorm(din),
        torch.nn.Linear(din, mid, bias=bias), torch.nn.GELU(),
        torch.nn.Linear(mid, TEXT_CFG["hidden_size"], bias=bias)).eval()


@pytest.fixture(scope="module")
def torch_parts():
    torch.manual_seed(60)
    vit = TorchInternViT(VISION_CFG).eval()
    mlp1 = _mk_mlp1()
    torch.manual_seed(61)
    qwen = transformers.Qwen2ForCausalLM(
        transformers.Qwen2Config(**{k: v for k, v in TEXT_CFG.items()
                                    if k != "architectures"})).eval()
    return vit, mlp1, qwen


def _full_sd(vit, mlp1, qwen):
    sd = vit.state_dict_vllm()
    for k, v in mlp1.state_dict().items():
        sd["mlp1." + k] = v.detach().numpy()
    for k, v in qwen.state_dict().items():
        sd["language_model." + k] = v.detach().numpy()
    return sd


def _torch_features(vit, mlp1, tiles):
    with torch.no_grad():
        feats = vit(torch.from_numpy(tiles))[:, 1:]
        g = int(feats.shape[1] ** 0.5)
        x = feats.reshape(feats.shape[0], g, g, -1)
        x = _pixel_shuffle_torch(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        return mlp1(x).flatten(0, 1).numpy()


def test_features_match_torch_reference(torch_parts):
    vit, mlp1, qwen = torch_parts
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_full_sd(vit, mlp1, qwen))
    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(tiles)))
    want = _torch_features(vit, mlp1, tiles)
    assert ours.shape == (3 * TOK_PER_TILE, TEXT_CFG["hidden_size"])
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_qk_norm_rms_tower_matches_torch_reference():
    vc = dict(VISION_CFG, norm_type="rms_norm", qk_normalization=True,
              qkv_bias=False)
    torch.manual_seed(62)
    vit = TorchInternViT(vc, rms=True, qk_norm=True).eval()
    from vllm_paged_compression_tpu.models.internvl import (
        InternViTArch, InternViTTower)
    tower = InternViTTower(InternViTArch.from_hf_config(vc),
                           dtype=jnp.float32)
    params = tower.load_hf_state_dict(vit.state_dict_vllm())
    rng = np.random.default_rng(1)
    px = rng.standard_normal((3, S, S)).astype(np.float32)
    ours = np.asarray(tower.encode(params, jnp.asarray(px)))
    with torch.no_grad():
        want = vit(torch.from_numpy(px)[None])[0, 1:].numpy()
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_internvl_greedy_matches_torch_composition(torch_parts):
    vit, mlp1, qwen = torch_parts
    rng = np.random.default_rng(2)
    tiles = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    n = 2 * TOK_PER_TILE

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _full_sd(vit, mlp1, qwen))
    text = [2, 5, 9, 17]
    outs = llm.generate(prompt_token_ids=[[IMG] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": tiles})
    ours = list(outs[0].outputs[0].token_ids)

    # torch composition: spliced inputs_embeds + greedy loop.
    feats = torch.from_numpy(_torch_features(vit, mlp1, tiles))
    ids = [IMG] * n + text
    with torch.no_grad():
        emb = qwen.get_input_embeddings()(torch.tensor(ids))
        emb[:n] = feats
        theirs = []
        for _ in range(8):
            logits = qwen(inputs_embeds=emb[None]).logits[0, -1]
            nxt = int(torch.argmax(logits))
            theirs.append(nxt)
            emb = torch.cat(
                [emb, qwen.get_input_embeddings()(
                    torch.tensor([nxt]))], dim=0)
    assert ours == theirs


def test_nvlm_mlp1_variant(torch_parts):
    vit, _, qwen = torch_parts
    mlp1 = _mk_mlp1(style="nvlm", seed=8)
    cfg = dict(CFG, architectures=["NVLM_D"])
    model = build_model(cfg, dtype=jnp.float32)
    params = model.load_hf_state_dict(_full_sd(vit, mlp1, qwen))
    rng = np.random.default_rng(3)
    tiles = rng.standard_normal((1, 3, S, S)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(tiles)))
    want = _torch_features(vit, mlp1, tiles)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_h2ovl_msac_tiling_shapes():
    from vllm_paged_compression_tpu.models.internvl import dynamic_tile
    img = np.random.default_rng(4).standard_normal(
        (3, 64, 96)).astype(np.float32)
    tiles = dynamic_tile(img, image_size=32, max_num=6)
    assert tiles.ndim == 4 and tiles.shape[1:] == (3, 32, 32)
    msac = dynamic_tile(img, image_size=32, max_num=6, msac=True)
    assert msac.shape[0] > tiles.shape[0]
