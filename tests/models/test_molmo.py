"""Molmo: trunk checkpoint-layout conversion vs an equivalent HF Llama,
vision backbone parity vs an independent torch reference of
vllm/model_executor/models/molmo.py (ViT :279-355, 2x2 pooling
:693-707, SwiGLU projector :464-504), and engine E2E with assembled
image features."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.molmo import (
    IM_COL_ID, IM_END_ID, IM_PATCH_ID, IM_START_ID, MolmoModel)
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

V, D, EXTRA = 256, 64, 128
EMB_SIZE = V - EXTRA
S, PS = 16, 4                       # 4x4 grid -> 2x2 pooled
VIS = dict(image_emb_dim=32, image_mlp_dim=64, image_num_layers=10,
           image_num_heads=4, image_default_input_size=(S, S),
           image_patch_size=PS, image_norm_eps=1e-5)
CFG = {"architectures": ["MolmoForCausalLM"], "model_type": "molmo",
       "vocab_size": EMB_SIZE, "embedding_size": EMB_SIZE,
       "hidden_size": D, "intermediate_size": 256,  # //2 -> 128
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 256,
       "rope_theta": 10000.0, "layer_norm_eps": 1e-5,
       "qkv_bias": False, "norm_after": False,
       "attention_layer_norm": False, "weight_tying": False,
       "vision_config": VIS, "eos_token_id": None}


def _to_molmo_sd(hf_llama):
    """HF Llama state dict -> Molmo remote-code naming
    (molmo.py:1301-1327 inverted)."""
    sd = {k: v.detach().numpy() for k, v in hf_llama.state_dict().items()}
    out = {}
    emb = sd.pop("model.embed_tokens.weight")
    out["model.transformer.wte.embedding"] = emb[:EMB_SIZE]
    out["model.transformer.wte.new_embedding"] = emb[EMB_SIZE:]
    out["model.transformer.ln_f.weight"] = sd.pop("model.norm.weight")
    out["model.transformer.ff_out.weight"] = \
        sd.pop("lm_head.weight")[:EMB_SIZE]
    for i in range(CFG["num_hidden_layers"]):
        hp = f"model.layers.{i}."
        mp = f"model.transformer.blocks.{i}."
        out[mp + "att_proj.weight"] = np.concatenate([
            sd[hp + "self_attn.q_proj.weight"],
            sd[hp + "self_attn.k_proj.weight"],
            sd[hp + "self_attn.v_proj.weight"]])
        out[mp + "attn_out.weight"] = sd[hp + "self_attn.o_proj.weight"]
        out[mp + "ff_proj.weight"] = np.concatenate([
            sd[hp + "mlp.up_proj.weight"],
            sd[hp + "mlp.gate_proj.weight"]])          # (up, gate) rows
        out[mp + "ff_out.weight"] = sd[hp + "mlp.down_proj.weight"]
        out[mp + "attn_norm.weight"] = sd[hp + "input_layernorm.weight"]
        out[mp + "ff_norm.weight"] = \
            sd[hp + "post_attention_layernorm.weight"]
    return out


def test_molmo_trunk_conversion_matches_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(80)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()

    model = build_model(CFG, dtype=jnp.float32)
    params = model.load_hf_state_dict(_to_molmo_sd(hf))
    from vllm_paged_compression_tpu.ops.attention import prefill_attention

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, model.arch.attn_scale,
                                 q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(ids.shape[1]), attn)
    ours = np.asarray(model.logits(params, hidden))
    # first EMB_SIZE logits match HF; the 128 extra ids are suppressed.
    np.testing.assert_allclose(ours[:, :EMB_SIZE],
                               hf_logits[:, :EMB_SIZE],
                               rtol=3e-4, atol=3e-4)


class TorchMolmoVision(torch.nn.Module):
    """Independent replica of molmo.py's vision backbone."""

    def __init__(self, nl=10, dv=32, mlp=64, nh=4):
        super().__init__()
        self.nh = nh
        self.patch = torch.nn.Linear(3 * PS * PS, dv, bias=False)
        self.cls = torch.nn.Parameter(torch.randn(dv) * 0.02)
        self.pos = torch.nn.Parameter(
            torch.randn((S // PS) ** 2 + 1, dv) * 0.02)
        self.pre_ln = torch.nn.LayerNorm(dv)
        self.blocks = torch.nn.ModuleList()
        for _ in range(nl):
            b = torch.nn.Module()
            b.ln1, b.ln2 = torch.nn.LayerNorm(dv), torch.nn.LayerNorm(dv)
            for nm in ("wq", "wk", "wv", "wo"):
                setattr(b, nm, torch.nn.Linear(dv, dv))
            b.fc1 = torch.nn.Linear(dv, mlp)
            b.fc2 = torch.nn.Linear(mlp, dv)
            self.blocks.append(b)
        for nm in ("wq", "wk", "wv"):
            setattr(self, "pool_" + nm, torch.nn.Linear(2 * dv, dv))
        self.pool_wo = torch.nn.Linear(dv, dv)
        self.w1 = torch.nn.Linear(dv, 128, bias=False)   # gate
        self.w3 = torch.nn.Linear(dv, 128, bias=False)   # up
        self.w2 = torch.nn.Linear(128, D, bias=False)    # down

    def _attn(self, q_in, kv, wq, wk, wv, wo):
        nh = self.nh
        q, k, v = wq(q_in), wk(kv), wv(kv)
        B, Nq, Dv = q.shape
        hd = Dv // nh
        q = q.view(B, Nq, nh, hd).transpose(1, 2)
        k = k.view(B, kv.shape[1], nh, hd).transpose(1, 2)
        v = v.view(B, kv.shape[1], nh, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return wo(o.transpose(1, 2).reshape(B, Nq, Dv))

def test_molmo_vision_matches_torch_reference():
    # Rebuild the torch side functionally (quick_gelu MLP) to avoid the
    # class gymnastics above — straight-line reference math.
    torch.manual_seed(81)
    dv, mlp, nl, nh = 32, 64, 10, 4
    vision = TorchMolmoVision(nl, dv, mlp, nh).eval()

    def torch_forward(crops):
        n = crops.shape[0]
        g = S // PS
        x = crops.reshape(n, 3, g, PS, g, PS)
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(n, g * g, PS * PS * 3)
        h = vision.patch(x)
        h = torch.cat([vision.cls.expand(n, 1, -1), h], dim=1) \
            + vision.pos
        h = vision.pre_ln(h)
        hs = []
        for b in vision.blocks:
            xn = b.ln1(h)
            h = h + vision._attn(xn, xn, b.wq, b.wk, b.wv, b.wo)
            xn = b.fc1(b.ln2(h))
            h = h + b.fc2(xn * torch.sigmoid(1.702 * xn))  # quick_gelu
            hs.append(h)
        feats = torch.cat([hs[-2], hs[-9]], dim=-1)[:, 1:]
        g2 = g // 2
        f = feats.reshape(n, g2, 2, g2, 2, 2 * dv)
        groups = f.permute(0, 1, 3, 2, 4, 5).reshape(-1, 4, 2 * dv)
        q = groups.mean(1, keepdim=True)
        pooled = vision._attn(q, groups, vision.pool_wq, vision.pool_wk,
                              vision.pool_wv, vision.pool_wo)[:, 0]
        y = vision.w2(torch.nn.functional.silu(vision.w1(pooled))
                      * vision.w3(pooled))
        return y.reshape(n, g2 * g2, D)

    sd = {}
    sd["model.vision_backbone.image_vit.patch_embedding.weight"] = \
        vision.patch.weight.detach().numpy()
    sd["model.vision_backbone.image_vit.class_embedding"] = \
        vision.cls.detach().numpy()
    sd["model.vision_backbone.image_vit.positional_embedding"] = \
        vision.pos.detach().numpy()
    sd["model.vision_backbone.image_vit.pre_ln.weight"] = \
        vision.pre_ln.weight.detach().numpy()
    sd["model.vision_backbone.image_vit.pre_ln.bias"] = \
        vision.pre_ln.bias.detach().numpy()
    for i, b in enumerate(vision.blocks):
        p = f"model.vision_backbone.image_vit.transformer.resblocks.{i}."
        sd[p + "attention_norm.weight"] = b.ln1.weight.detach().numpy()
        sd[p + "attention_norm.bias"] = b.ln1.bias.detach().numpy()
        sd[p + "ffn_norm.weight"] = b.ln2.weight.detach().numpy()
        sd[p + "ffn_norm.bias"] = b.ln2.bias.detach().numpy()
        for nm in ("wq", "wk", "wv", "wo"):
            lin = getattr(b, nm)
            sd[p + f"attention.{nm}.weight"] = lin.weight.detach().numpy()
            sd[p + f"attention.{nm}.bias"] = lin.bias.detach().numpy()
        sd[p + "feed_forward.w1.weight"] = b.fc1.weight.detach().numpy()
        sd[p + "feed_forward.w1.bias"] = b.fc1.bias.detach().numpy()
        sd[p + "feed_forward.w2.weight"] = b.fc2.weight.detach().numpy()
        sd[p + "feed_forward.w2.bias"] = b.fc2.bias.detach().numpy()
    for nm in ("wq", "wk", "wv", "wo"):
        lin = getattr(vision, "pool_" + nm)
        sd[f"model.vision_backbone.image_pooling_2d.{nm}.weight"] = \
            lin.weight.detach().numpy()
        sd[f"model.vision_backbone.image_pooling_2d.{nm}.bias"] = \
            lin.bias.detach().numpy()
    for src, dst in (("w1", "w1"), ("w3", "w3"), ("w2", "w2")):
        sd[f"model.vision_backbone.image_projector.{dst}.weight"] = \
            getattr(vision, src).weight.detach().numpy()

    cfg = dict(CFG, vision_config=dict(VIS, image_num_layers=nl))
    model = MolmoModel.from_hf_config(cfg, dtype=jnp.float32)
    vis = model.load_hf_state_dict(
        {**sd, **_dummy_trunk_sd()})["vision"]

    rng = np.random.default_rng(0)
    crops = rng.standard_normal((2, 3, S, S)).astype(np.float32)
    ours = np.asarray(jnp.stack([
        model._encode_crop(vis, jnp.asarray(c)) for c in crops]))
    with torch.no_grad():
        want = torch_forward(torch.from_numpy(crops)).numpy()
    g2 = (S // PS) // 2
    np.testing.assert_allclose(ours.reshape(2, g2 * g2, D), want,
                               rtol=3e-4, atol=3e-4)


def _dummy_trunk_sd():
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False)
    torch.manual_seed(82)
    return _to_molmo_sd(transformers.LlamaForCausalLM(cfg).eval())


def test_molmo_e2e_generation():
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=64, seed=0)
    rng = np.random.default_rng(1)
    crops = rng.standard_normal((3, 3, S, S)).astype(np.float32)
    g2 = (S // PS) // 2
    # global section (g2 rows * (g2+1) + 2) + joint 2x1 tiling section.
    n_tok = (g2 * (g2 + 1) + 2) + (2 * g2 * (g2 + 1) + 2)
    outs = llm.generate(
        prompt_token_ids=[[1, IM_PATCH_ID, 5, 9]],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8),
        multi_modal_data={"image": crops, "tiling": (2, 1)})
    assert len(outs[0].outputs[0].token_ids) == 8
    # suppressed extra-vocab ids never get sampled.
    assert all(t < EMB_SIZE for t in outs[0].outputs[0].token_ids)
    feats = llm.engine.model.assemble_image_features(
        llm.engine.params, crops, {"tiling": (2, 1)})
    assert feats.shape == (n_tok, D)
    assert IM_COL_ID != IM_START_ID != IM_END_ID
