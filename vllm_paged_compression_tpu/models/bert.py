"""BERT-family encoders: embeddings + cross-encoder scoring.

TPU-native analog of the reference's encoder model zoo
(vllm/model_executor/models/bert.py, roberta.py — BAAI/bge embedders, e5,
bge-reranker cross-encoders).  Encoder models are stateless (no paged
cache, no decode phase): one bucketed bidirectional forward per request,
so the engine serves them in encode-only mode.

Supported architectures: BertModel / BertForMaskedLM (embedding),
RobertaModel / XLMRobertaModel (position offset by pad_token_id + 1),
BertForSequenceClassification / XLMRobertaForSequenceClassification /
RobertaForSequenceClassification (cross-encoder rerankers).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import matmul


@dataclass
class BertArch:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    head_dim: int = 64
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    position_offset: int = 0      # roberta: pad_token_id + 1
    num_labels: int = 0           # >0: sequence-classification head
    # engine-compat attrs (encode-only models never allocate real pools)
    num_kv_heads: int = 1
    rms_norm_eps: float = 1e-12

    @classmethod
    def from_hf_config(cls, cfg: dict, num_labels: int = 0,
                       roberta: bool = False) -> "BertArch":
        heads = cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            head_dim=cfg["hidden_size"] // heads,
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            hidden_act=cfg.get("hidden_act", "gelu"),
            position_offset=(cfg.get("pad_token_id", 1) or 1) + 1
            if roberta else 0,
            num_labels=num_labels,
        )


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(
        x.dtype)


class BertModel:
    architecture = "bert"
    encode_only = True

    def __init__(self, arch: BertArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        a = self.arch
        key_box = [jax.random.PRNGKey(seed)]

        def w(*shape):
            key_box[0], sub = jax.random.split(key_box[0])
            arr = jax.random.normal(sub, shape, self.dtype) * 0.02
            return np.asarray(arr) if as_numpy else arr

        ones = (np.ones if as_numpy
                else lambda sh: jnp.ones(sh, self.dtype))
        zeros = (np.zeros if as_numpy
                 else lambda sh: jnp.zeros(sh, self.dtype))
        L, D, qkv = a.num_layers, a.hidden_size, 3 * a.hidden_size
        params = {
            "word_emb": w(a.vocab_size, D),
            "pos_emb": w(a.max_position_embeddings, D),
            "type_emb": w(a.type_vocab_size, D),
            "emb_ln_w": ones((D,)), "emb_ln_b": zeros((D,)),
            "layers": {
                "wqkv": w(L, D, qkv), "bqkv": w(L, qkv),
                "wo": w(L, D, D), "bo": w(L, D),
                "attn_ln_w": ones((L, D)), "attn_ln_b": zeros((L, D)),
                "w_up": w(L, D, a.intermediate_size),
                "b_up": w(L, a.intermediate_size),
                "w_down": w(L, a.intermediate_size, D),
                "b_down": w(L, D),
                "out_ln_w": ones((L, D)), "out_ln_b": zeros((L, D)),
            },
        }
        params["pooler_w"] = w(D, D)
        params["pooler_b"] = zeros((D,))
        if a.num_labels:
            params["cls_w"] = w(D, a.num_labels)
            params["cls_b"] = zeros((a.num_labels,))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a = self.arch
        # strip the model prefix (bert. / roberta.) if present
        pref = ""
        for cand in ("bert.", "roberta.", "xlm_roberta."):
            if any(k.startswith(cand) for k in tensors):
                pref = cand
                break

        def t(name):
            return np.asarray(tensors[pref + name])

        def opt(name):
            return (np.asarray(tensors[pref + name])
                    if pref + name in tensors else None)

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        acc = {k: [] for k in ("wqkv", "bqkv", "wo", "bo", "attn_ln_w",
                               "attn_ln_b", "w_up", "b_up", "w_down",
                               "b_down", "out_ln_w", "out_ln_b")}
        for i in range(a.num_layers):
            p = f"encoder.layer.{i}."
            acc["wqkv"].append(np.concatenate([
                t(p + "attention.self.query.weight").T,
                t(p + "attention.self.key.weight").T,
                t(p + "attention.self.value.weight").T], axis=1))
            acc["bqkv"].append(np.concatenate([
                t(p + "attention.self.query.bias"),
                t(p + "attention.self.key.bias"),
                t(p + "attention.self.value.bias")]))
            acc["wo"].append(t(p + "attention.output.dense.weight").T)
            acc["bo"].append(t(p + "attention.output.dense.bias"))
            acc["attn_ln_w"].append(
                t(p + "attention.output.LayerNorm.weight"))
            acc["attn_ln_b"].append(
                t(p + "attention.output.LayerNorm.bias"))
            acc["w_up"].append(t(p + "intermediate.dense.weight").T)
            acc["b_up"].append(t(p + "intermediate.dense.bias"))
            acc["w_down"].append(t(p + "output.dense.weight").T)
            acc["b_down"].append(t(p + "output.dense.bias"))
            acc["out_ln_w"].append(t(p + "output.LayerNorm.weight"))
            acc["out_ln_b"].append(t(p + "output.LayerNorm.bias"))

        params = {
            "word_emb": leaf(t("embeddings.word_embeddings.weight")),
            "pos_emb": leaf(t("embeddings.position_embeddings.weight")),
            "type_emb": leaf(
                t("embeddings.token_type_embeddings.weight")
                if pref + "embeddings.token_type_embeddings.weight"
                in tensors else
                np.zeros((a.type_vocab_size, a.hidden_size), np.float32)),
            "emb_ln_w": leaf(t("embeddings.LayerNorm.weight")),
            "emb_ln_b": leaf(t("embeddings.LayerNorm.bias")),
            "layers": {k: leaf(np.stack(v)) for k, v in acc.items()},
        }
        pw = opt("pooler.dense.weight")
        params["pooler_w"] = leaf(pw.T if pw is not None else np.zeros(
            (a.hidden_size, a.hidden_size), np.float32))
        pb = opt("pooler.dense.bias")
        params["pooler_b"] = leaf(pb if pb is not None else np.zeros(
            a.hidden_size, np.float32))
        if a.num_labels:
            if "classifier.weight" in tensors:       # BertForSeqCls
                params["cls_w"] = leaf(np.asarray(
                    tensors["classifier.weight"]).T)
                params["cls_b"] = leaf(np.asarray(
                    tensors["classifier.bias"]))
            else:                                    # Roberta head
                params["cls_dense_w"] = leaf(np.asarray(
                    tensors["classifier.dense.weight"]).T)
                params["cls_dense_b"] = leaf(np.asarray(
                    tensors["classifier.dense.bias"]))
                params["cls_w"] = leaf(np.asarray(
                    tensors["classifier.out_proj.weight"]).T)
                params["cls_b"] = leaf(np.asarray(
                    tensors["classifier.out_proj.bias"]))
        return params

    # ---- forward ---------------------------------------------------------

    def hidden_states(self, params, token_ids, length,
                      token_type_ids=None):
        """Bidirectional encoder: [T] ids (+ valid ``length``) ->
        [T, D] final hidden states; padded positions masked out of
        attention."""
        a = self.arch
        t = token_ids.shape[0]
        pos = jnp.arange(t) + a.position_offset
        tt = (token_type_ids if token_type_ids is not None
              else jnp.zeros(t, jnp.int32))
        h = (params["word_emb"][token_ids] + params["pos_emb"][pos]
             + params["type_emb"][tt])
        h = _ln(h, params["emb_ln_w"], params["emb_ln_b"],
                a.layer_norm_eps)
        valid = jnp.arange(t) < length
        bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
        scale = a.head_dim ** -0.5
        act = (jax.nn.gelu if a.hidden_act.startswith("gelu")
               else jax.nn.silu)

        def layer(h, lp):
            qkv = matmul(h, lp["wqkv"]) + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(t, a.num_heads, a.head_dim)
            k = k.reshape(t, a.num_heads, a.head_dim)
            v = v.reshape(t, a.num_heads, a.head_dim)
            scores = jnp.einsum("qhd,khd->hqk", q, k).astype(jnp.float32)
            scores = scores * scale + bias[None, None, :]
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(t, -1)
            attn = matmul(ctx, lp["wo"]) + lp["bo"]
            h = _ln(h + attn, lp["attn_ln_w"], lp["attn_ln_b"],
                    a.layer_norm_eps)
            up = act(matmul(h, lp["w_up"]) + lp["b_up"])
            down = matmul(up, lp["w_down"]) + lp["b_down"]
            h = _ln(h + down, lp["out_ln_w"], lp["out_ln_b"],
                    a.layer_norm_eps)
            return h, None

        h, _ = jax.lax.scan(layer, h, params["layers"])
        return h

    def encode_pooled(self, params, token_ids, length, pooling="mean",
                      normalize=True, token_type_ids=None):
        """Sentence embedding: mean (default, BGE/e5 convention) or cls
        pooling over valid positions, optionally L2-normalized."""
        h = self.hidden_states(params, token_ids, length, token_type_ids)
        t = h.shape[0]
        if pooling == "cls":
            pooled = h[0]
        elif pooling == "last":
            pooled = h[length - 1]
        else:
            mask = (jnp.arange(t) < length)[:, None]
            pooled = jnp.sum(jnp.where(mask, h, 0.0), axis=0) \
                / jnp.maximum(length, 1)
        pooled = pooled.astype(jnp.float32)
        if normalize:
            pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled), 1e-12)
        return pooled

    def classify(self, params, token_ids, length, token_type_ids=None):
        """Cross-encoder logits [num_labels] (HF BertForSequence-
        Classification: pooler-tanh -> classifier; Roberta variant:
        CLS -> dense-tanh -> out_proj)."""
        h = self.hidden_states(params, token_ids, length, token_type_ids)
        if "cls_dense_w" in params:
            x = jnp.tanh(h[0] @ params["cls_dense_w"]
                         + params["cls_dense_b"])
        else:
            x = jnp.tanh(h[0] @ params["pooler_w"] + params["pooler_b"])
        return (x @ params["cls_w"] + params["cls_b"]).astype(jnp.float32)

    def param_bytes(self) -> int:
        a = self.arch
        per_layer = 4 * a.hidden_size ** 2 \
            + 2 * a.hidden_size * a.intermediate_size
        total = (a.vocab_size + a.max_position_embeddings
                 + a.type_vocab_size) * a.hidden_size \
            + a.num_layers * per_layer
        return total * jnp.dtype(self.dtype).itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return 0
