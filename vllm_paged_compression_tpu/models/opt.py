"""OPT-family decoder in functional JAX.

TPU-native re-design of the reference OPT implementation
(vllm/model_executor/models/opt.py).  Same injected-attention design as
LlamaModel; differences from Llama: learned positional embeddings (with the
OPT +2 offset), LayerNorm (with bias) instead of RMSNorm, biased projections,
ReLU MLP, tied lm_head.  Covers BASELINE config #1 (opt-125m parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class OPTArch:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    tie_word_embeddings: bool = True
    # variant knobs (GPT-2 reuses this module: same pre-LN + learned-pos
    # structure, different activation / offsets / checkpoint layout)
    hidden_act: str = "relu"      # gpt2: "gelu_tanh"
    pos_offset: int = 2           # HF OPTLearnedPositionalEmbedding; gpt2: 0
    hf_style: str = "opt"         # checkpoint key layout: "opt" | "gpt2"

    # OPT uses MHA only.
    @property
    def num_kv_heads(self) -> int:
        return self.num_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "OPTArch":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            ffn_dim=cfg["ffn_dim"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            do_layer_norm_before=cfg.get("do_layer_norm_before", True),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )


@dataclass
class GPT2Arch(OPTArch):
    """GPT-2 (reference vllm/model_executor/models/gpt2.py): pre-LN
    decoder with tanh-GELU MLP, no positional offset, Conv1D ([in, out])
    checkpoint weights, tied lm_head."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GPT2Arch":
        hidden = cfg.get("n_embd", cfg.get("hidden_size"))
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            ffn_dim=cfg.get("n_inner") or 4 * hidden,
            num_layers=cfg.get("n_layer", cfg.get("num_hidden_layers")),
            num_heads=cfg.get("n_head", cfg.get("num_attention_heads")),
            max_position_embeddings=cfg.get("n_positions", 1024),
            do_layer_norm_before=True,
            tie_word_embeddings=True,
            hidden_act="gelu_tanh",
            pos_offset=0,
            hf_style="gpt2",
        )


def layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


class OPTModel:
    architecture = "opt"

    def __init__(self, arch: OPTArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a = self.arch

        if as_numpy:
            rng = np.random.default_rng(seed)

            def w(*shape):
                return rng.standard_normal(shape, dtype=np.float32) * 0.02

            def zeros(*shape):
                return np.zeros(shape, np.float32)
        else:
            import jax
            key_box = [jax.random.PRNGKey(seed)]

            def w(*shape):
                key_box[0], sub = jax.random.split(key_box[0])
                return jax.random.normal(sub, shape, self.dtype) * 0.02

            def zeros(*shape):
                return jnp.zeros(shape, self.dtype)

        layers = {
            "wqkv": w(a.num_layers, a.hidden_size, 3 * a.hidden_size),
            "bqkv": zeros(a.num_layers, 3 * a.hidden_size),
            "wo": w(a.num_layers, a.hidden_size, a.hidden_size),
            "bo": zeros(a.num_layers, a.hidden_size),
            "attn_ln_w": jnp.ones((a.num_layers, a.hidden_size), self.dtype),
            "attn_ln_b": zeros(a.num_layers, a.hidden_size),
            "fc1_w": w(a.num_layers, a.hidden_size, a.ffn_dim),
            "fc1_b": zeros(a.num_layers, a.ffn_dim),
            "fc2_w": w(a.num_layers, a.ffn_dim, a.hidden_size),
            "fc2_b": zeros(a.num_layers, a.hidden_size),
            "final_ln_w": jnp.ones((a.num_layers, a.hidden_size),
                                   self.dtype),
            "final_ln_b": zeros(a.num_layers, a.hidden_size),
        }
        return {
            "embed": w(a.vocab_size, a.hidden_size),
            "embed_pos": w(a.max_position_embeddings + a.pos_offset,
                           a.hidden_size),
            "layers": layers,
            "final_ln_w": jnp.ones((a.hidden_size,), self.dtype),
            "final_ln_b": zeros(a.hidden_size),
        }

    def load_hf_state_dict(self, tensors: dict[str, np.ndarray],
                           as_numpy: bool = False) -> dict:
        if self.arch.hf_style == "gpt2":
            return self._load_gpt2_state_dict(tensors, as_numpy)
        a = self.arch

        def t(name):
            # transformers prefixes with model.decoder. for OPTForCausalLM
            for cand in (name, "model.decoder." + name, "decoder." + name):
                if cand in tensors:
                    return np.asarray(tensors[cand])
            raise KeyError(name)

        wqkv, bqkv, wo, bo = [], [], [], []
        alw, alb, f1w, f1b, f2w, f2b, flw, flb = ([] for _ in range(8))
        for i in range(a.num_layers):
            p = f"layers.{i}."
            wqkv.append(np.concatenate(
                [t(p + f"self_attn.{x}_proj.weight").T
                 for x in ("q", "k", "v")], axis=1))
            bqkv.append(np.concatenate(
                [t(p + f"self_attn.{x}_proj.bias") for x in ("q", "k", "v")]))
            wo.append(t(p + "self_attn.out_proj.weight").T)
            bo.append(t(p + "self_attn.out_proj.bias"))
            alw.append(t(p + "self_attn_layer_norm.weight"))
            alb.append(t(p + "self_attn_layer_norm.bias"))
            f1w.append(t(p + "fc1.weight").T)
            f1b.append(t(p + "fc1.bias"))
            f2w.append(t(p + "fc2.weight").T)
            f2b.append(t(p + "fc2.bias"))
            flw.append(t(p + "final_layer_norm.weight"))
            flb.append(t(p + "final_layer_norm.bias"))

        def stack(xs):
            arr = np.stack(xs)
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        return {
            "embed": leaf(t("embed_tokens.weight")),
            "embed_pos": leaf(t("embed_positions.weight")),
            "layers": {
                "wqkv": stack(wqkv), "bqkv": stack(bqkv),
                "wo": stack(wo), "bo": stack(bo),
                "attn_ln_w": stack(alw), "attn_ln_b": stack(alb),
                "fc1_w": stack(f1w), "fc1_b": stack(f1b),
                "fc2_w": stack(f2w), "fc2_b": stack(f2b),
                "final_ln_w": stack(flw), "final_ln_b": stack(flb),
            },
            "final_ln_w": leaf(t("final_layer_norm.weight")),
            "final_ln_b": leaf(t("final_layer_norm.bias")),
        }

    def _load_gpt2_state_dict(self, tensors, as_numpy: bool) -> dict:
        """HF GPT2LMHeadModel layout: Conv1D weights are already
        [in, out] — no transpose."""
        a = self.arch

        def t(name):
            for cand in (name, "transformer." + name):
                if cand in tensors:
                    return np.asarray(tensors[cand])
            raise KeyError(name)

        cols = {k: [] for k in ("wqkv", "bqkv", "wo", "bo", "attn_ln_w",
                                "attn_ln_b", "fc1_w", "fc1_b", "fc2_w",
                                "fc2_b", "final_ln_w", "final_ln_b")}
        for i in range(a.num_layers):
            p = f"h.{i}."
            cols["wqkv"].append(t(p + "attn.c_attn.weight"))
            cols["bqkv"].append(t(p + "attn.c_attn.bias"))
            cols["wo"].append(t(p + "attn.c_proj.weight"))
            cols["bo"].append(t(p + "attn.c_proj.bias"))
            cols["attn_ln_w"].append(t(p + "ln_1.weight"))
            cols["attn_ln_b"].append(t(p + "ln_1.bias"))
            cols["fc1_w"].append(t(p + "mlp.c_fc.weight"))
            cols["fc1_b"].append(t(p + "mlp.c_fc.bias"))
            cols["fc2_w"].append(t(p + "mlp.c_proj.weight"))
            cols["fc2_b"].append(t(p + "mlp.c_proj.bias"))
            cols["final_ln_w"].append(t(p + "ln_2.weight"))
            cols["final_ln_b"].append(t(p + "ln_2.bias"))

        def stack(xs):
            arr = np.stack(xs)
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        return {
            "embed": leaf(t("wte.weight")),
            "embed_pos": leaf(t("wpe.weight")),
            "layers": {k: stack(v) for k, v in cols.items()},
            "final_ln_w": leaf(t("ln_f.weight")),
            "final_ln_b": leaf(t("ln_f.bias")),
        }

    def embed(self, params, token_ids):
        """Token embedding WITHOUT positions (positions are added inside
        forward_hidden so spliced multimodal rows get them too, matching
        HF OPT's inputs_embeds path)."""
        return params["embed"][token_ids]

    def forward_hidden(self, params, token_ids, positions,
                       attn_fn: Callable, attn_state=None,
                       lora=None, lora_idx=None, state_mode: str = "scan",
                       input_embeds=None):
        """Same scan-over-layers contract as LlamaModel.forward_hidden
        (including the "carry" state mode for in-place KV pools)."""
        if lora is not None:
            raise NotImplementedError("LoRA targets llama-family models")
        a = self.arch
        t = token_ids.shape[0]
        # OPT's learned positional table is offset by 2 (HF
        # OPTLearnedPositionalEmbedding).
        tok = (input_embeds if input_embeds is not None
               else params["embed"][token_ids])
        h = tok + params["embed_pos"][positions + a.pos_offset]
        act = jax.nn.relu if a.hidden_act == "relu" else (
            lambda x: jax.nn.gelu(x, approximate=True))

        def layer_body(h, lp, state, layer_idx=None):
            res = h
            x = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"]) \
                if a.do_layer_norm_before else h
            qkv = x @ lp["wqkv"] + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, a.num_heads, a.head_dim)
            k = k.reshape(t, a.num_heads, a.head_dim)
            v = v.reshape(t, a.num_heads, a.head_dim)
            if layer_idx is None:
                attn_out, new_state = attn_fn(q, k, v, state)
            else:
                attn_out, new_state = attn_fn(q, k, v, state, layer_idx)
            attn_out = attn_out.reshape(t, a.hidden_size)
            h = res + attn_out @ lp["wo"] + lp["bo"]
            if not a.do_layer_norm_before:
                h = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"])

            res = h
            x = layer_norm(h, lp["final_ln_w"], lp["final_ln_b"]) \
                if a.do_layer_norm_before else h
            x = act(x @ lp["fc1_w"] + lp["fc1_b"])
            h = res + x @ lp["fc2_w"] + lp["fc2_b"]
            if not a.do_layer_norm_before:
                h = layer_norm(h, lp["final_ln_w"], lp["final_ln_b"])
            return h, new_state

        if state_mode == "carry":
            def layer_fn(carry, xs):
                h, state = carry
                lp, li = xs
                h, state = layer_body(h, lp, state, li)
                return (h, state), None

            (h, new_state), _ = jax.lax.scan(
                layer_fn, (h, attn_state),
                (params["layers"],
                 jnp.arange(a.num_layers, dtype=jnp.int32)))
        else:
            def layer_fn(h, xs):
                lp, state = xs
                return layer_body(h, lp, state)

            h, new_state = jax.lax.scan(layer_fn, h,
                                        (params["layers"], attn_state))
        if a.do_layer_norm_before:
            h = layer_norm(h, params["final_ln_w"], params["final_ln_b"])
        return h, new_state

    def logits(self, params, hidden):
        return hidden @ params["embed"].T

    def param_bytes(self) -> int:
        a = self.arch
        itemsize = jnp.dtype(self.dtype).itemsize
        per_layer = (4 * a.hidden_size ** 2 + 2 * a.hidden_size * a.ffn_dim
                     + 8 * a.hidden_size + a.ffn_dim)
        total = (a.vocab_size + a.max_position_embeddings + a.pos_offset) \
            * a.hidden_size + a.num_layers * per_layer
        return total * itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        a = self.arch
        return (2 * a.hidden_size * a.num_layers
                * jnp.dtype(kv_dtype).itemsize)
