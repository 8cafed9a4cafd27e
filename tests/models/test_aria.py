"""Aria: projector + tower feature parity and greedy E2E vs an
independent torch composition (HF Idefics2 tower sans post-LN, a torch
replica of reference vllm aria.py's CrossAttention/FFN projector
(:129-249) and MoE trunk (:283-338) grafted onto HF Llama)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 9
S = 24
P = (S // 8) ** 2                 # 9 patches
QN = 4
VISION_CFG = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  image_size=S, patch_size=8)
D, I, E, TOPK, NSHARED = 48, 16, 4, 2, 2
TEXT_CFG = dict(model_type="llama", vocab_size=128, hidden_size=D,
                intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128, rope_theta=10000.0,
                rms_norm_eps=1e-5, tie_word_embeddings=False,
                moe_num_experts=E, moe_topk=TOPK,
                moe_intermediate_size=I, moe_num_shared_experts=NSHARED)
CFG = {"architectures": ["AriaForConditionalGeneration"],
       "vision_config": VISION_CFG, "text_config": TEXT_CFG,
       "projector_patch_to_query_dict": {str(P): QN},
       "image_token_index": IMG, "eos_token_id": None}


class TorchAriaMoE(torch.nn.Module):
    """Reference MoE math (aria.py:283-338 + FusedMoE softmax-topk)."""

    def __init__(self):
        super().__init__()
        self.router_weight = torch.nn.Parameter(torch.randn(E, D) * 0.2)
        self.fc1 = torch.nn.Parameter(torch.randn(E, D, 2 * I) * 0.1)
        self.fc2 = torch.nn.Parameter(torch.randn(E, I, D) * 0.1)
        self.gate = torch.nn.Linear(D, I * NSHARED, bias=False)
        self.up = torch.nn.Linear(D, I * NSHARED, bias=False)
        self.down = torch.nn.Linear(I * NSHARED, D, bias=False)

    def forward(self, x):
        probs = torch.softmax(x.float() @ self.router_weight.T, dim=-1)
        w, idx = torch.topk(probs, TOPK, dim=-1)
        w = (w / w.sum(-1, keepdim=True)).to(x.dtype)
        gu = torch.einsum("...d,edf->...ef", x, self.fc1)
        h = torch.nn.functional.silu(gu[..., :I]) * gu[..., I:]
        y = torch.einsum("...ef,efd->...ed", h, self.fc2)
        mask = torch.zeros(*probs.shape, dtype=x.dtype)
        mask.scatter_(-1, idx, w)
        sparse = torch.einsum("...ed,...e->...d", y.float(),
                              mask.float()).to(x.dtype)
        shared = self.down(
            torch.nn.functional.silu(self.gate(x)) * self.up(x))
        return sparse + shared


class TorchAriaProjector(torch.nn.Module):
    """Replica of aria.py CrossAttention + FFN (:129-249)."""

    def __init__(self, dv=32, nh=4):
        super().__init__()
        self.nh = nh
        self.query = torch.nn.Parameter(torch.randn(QN, dv) * 0.02)
        self.q_proj = torch.nn.Linear(dv, dv, bias=False)
        self.k_proj = torch.nn.Linear(dv, dv, bias=False)
        self.v_proj = torch.nn.Linear(dv, dv, bias=False)
        self.mha = torch.nn.MultiheadAttention(dv, nh)
        self.linear = torch.nn.Linear(dv, dv)
        self.layer_norm = torch.nn.LayerNorm(dv)
        self.ln_kv = torch.nn.LayerNorm(dv)
        self.ln_ffn = torch.nn.LayerNorm(dv)
        self.linear_in = torch.nn.Linear(dv, D, bias=False)
        self.linear_out = torch.nn.Linear(D, D, bias=False)

    def forward(self, x):                       # x [N, P, dv]
        n = x.shape[0]
        q = self.q_proj(self.layer_norm(self.query))
        q = q[:, None, :].expand(-1, n, -1)
        kv = self.ln_kv(x)
        k = self.k_proj(kv).permute(1, 0, 2)
        v = self.v_proj(kv).permute(1, 0, 2)
        o = self.mha(q, k, v)[0].permute(1, 0, 2)
        o = self.linear(o)
        o = self.ln_ffn(o)
        return self.linear_out(
            torch.nn.functional.gelu(self.linear_in(o),
                                     approximate="tanh"))


@pytest.fixture(scope="module")
def torch_parts():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig)
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer)
    torch.manual_seed(90)
    vc = Idefics2VisionConfig(**VISION_CFG)
    vc._attn_implementation = "eager"
    tower = Idefics2VisionTransformer(vc).eval()
    tower.post_layernorm = torch.nn.Identity()
    torch.manual_seed(91)
    proj = TorchAriaProjector().eval()
    torch.manual_seed(92)
    llama = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        **{k: v for k, v in TEXT_CFG.items()
           if not k.startswith("moe_") and k != "model_type"})).eval()
    moes = []
    for lay in llama.model.layers:
        moe = TorchAriaMoE()
        lay.mlp = moe
        moes.append(moe)
    return tower, proj, llama, moes


def _full_sd(tower, proj, llama, moes):
    sd = {"vision_tower.vision_model." + k: v.detach().numpy()
          for k, v in tower.state_dict().items()}
    mp = "multi_modal_projector."
    sd[mp + "query"] = proj.query.detach().numpy()
    for nm in ("q_proj", "k_proj", "v_proj", "linear"):
        lin = getattr(proj, nm)
        sd[mp + f"cross_attn.{nm}.weight"] = lin.weight.detach().numpy()
        if lin.bias is not None:
            sd[mp + f"cross_attn.{nm}.bias"] = lin.bias.detach().numpy()
    sd[mp + "cross_attn.multihead_attn.in_proj_weight"] = \
        proj.mha.in_proj_weight.detach().numpy()
    sd[mp + "cross_attn.multihead_attn.in_proj_bias"] = \
        proj.mha.in_proj_bias.detach().numpy()
    sd[mp + "cross_attn.multihead_attn.out_proj.weight"] = \
        proj.mha.out_proj.weight.detach().numpy()
    sd[mp + "cross_attn.multihead_attn.out_proj.bias"] = \
        proj.mha.out_proj.bias.detach().numpy()
    for nm in ("layer_norm", "ln_kv"):
        ln = getattr(proj, nm)
        sd[mp + f"cross_attn.{nm}.weight"] = ln.weight.detach().numpy()
        sd[mp + f"cross_attn.{nm}.bias"] = ln.bias.detach().numpy()
    sd[mp + "ln_ffn.weight"] = proj.ln_ffn.weight.detach().numpy()
    sd[mp + "ln_ffn.bias"] = proj.ln_ffn.bias.detach().numpy()
    sd[mp + "ffn.linear_in.weight"] = proj.linear_in.weight.detach().numpy()
    sd[mp + "ffn.linear_out.weight"] = \
        proj.linear_out.weight.detach().numpy()

    lsd = {k: v.detach().numpy() for k, v in llama.state_dict().items()}
    for i, moe in enumerate(moes):
        p = f"model.layers.{i}.mlp."
        for key in list(lsd):
            if key.startswith(p):
                del lsd[key]
        lsd[p + "router_weight"] = moe.router_weight.detach().numpy()
        lsd[p + "experts.fc1.weight"] = moe.fc1.detach().numpy()
        lsd[p + "experts.fc2.weight"] = moe.fc2.detach().numpy()
        lsd[p + "shared_experts.gate_proj.weight"] = \
            moe.gate.weight.detach().numpy()
        lsd[p + "shared_experts.up_proj.weight"] = \
            moe.up.weight.detach().numpy()
        lsd[p + "shared_experts.down_proj.weight"] = \
            moe.down.weight.detach().numpy()
    head = lsd.pop("lm_head.weight")
    sd.update({"language_model." + k: v for k, v in lsd.items()})
    sd["lm_head.weight"] = head
    return sd


def _torch_features(tower, proj, crops):
    with torch.no_grad():
        feats = tower(torch.from_numpy(crops)).last_hidden_state
        return proj(feats).flatten(0, 1).numpy()


def test_projector_features_match_torch(torch_parts):
    tower, proj, llama, moes = torch_parts
    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_full_sd(tower, proj, llama, moes))
    rng = np.random.default_rng(0)
    crops = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    ours = np.asarray(model.encode_image(params, jnp.asarray(crops)))
    want = _torch_features(tower, proj, crops)
    assert ours.shape == (2 * QN, D)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_aria_greedy_matches_torch_composition(torch_parts):
    tower, proj, llama, moes = torch_parts
    rng = np.random.default_rng(1)
    crops = rng.standard_normal((1, 3, S, S)).astype(np.float32)

    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        _full_sd(tower, proj, llama, moes))
    text = [2, 5, 9 + 8, 17]
    outs = llm.generate(prompt_token_ids=[[IMG] + text],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8),
                        multi_modal_data={"image": crops})
    ours = list(outs[0].outputs[0].token_ids)

    feats = torch.from_numpy(_torch_features(tower, proj, crops))
    ids = [IMG] * QN + text
    with torch.no_grad():
        emb = llama.get_input_embeddings()(torch.tensor(ids))
        emb[:QN] = feats
        theirs = []
        for _ in range(8):
            logits = llama(inputs_embeds=emb[None]).logits[0, -1]
            nxt = int(torch.argmax(logits))
            theirs.append(nxt)
            emb = torch.cat([emb, llama.get_input_embeddings()(
                torch.tensor([nxt]))], dim=0)
    assert ours == theirs
