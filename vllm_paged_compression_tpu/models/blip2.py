"""BLIP-2: ViT + Q-Former (32 learned queries, cross-attention to image
embeddings) + OPT language tower.

Reference: vllm/model_executor/models/blip2.py (+ blip.py); math mirrors
HF modeling_blip_2.  The Q-Former's projected query outputs form a FIXED
``num_query_tokens``-long block spliced over the image-placeholder span
(the reference prepends them to the text embeddings; placeholder splice
is positionally equivalent because OPT adds its learned positions to the
spliced rows, HF Blip2ForConditionalGeneration.generate).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .opt import OPTArch, OPTModel, layer_norm


@dataclass
class Blip2VisionArch:
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_layers: int = 39
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    ln_eps: float = 1e-5


@dataclass
class QFormerArch:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    encoder_hidden_size: int = 1408
    cross_attention_frequency: int = 2
    num_query_tokens: int = 32
    ln_eps: float = 1e-12


def _bert_attn(h_q, h_kv, wq, bq, wk, bk, wv, bv, num_heads):
    """BERT-style multi-head attention (no mask: queries/patches are
    bidirectional)."""
    tq, d = h_q.shape
    hd = d // num_heads
    q = (h_q @ wq + bq).reshape(tq, num_heads, hd)
    k = (h_kv @ wk + bk).reshape(-1, num_heads, hd)
    v = (h_kv @ wv + bv).reshape(-1, num_heads, hd)
    s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
    return o.reshape(tq, d).astype(h_q.dtype)


class Blip2Model:
    architecture = "llava"

    def __init__(self, text_arch: OPTArch, vision_arch: Blip2VisionArch,
                 qformer_arch: QFormerArch, image_token_id: int,
                 dtype=jnp.bfloat16):
        self.language = OPTModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.vision_arch = vision_arch
        self.qformer_arch = qformer_arch
        self.image_token_id = image_token_id
        self.dtype = dtype

        class _V:      # engine shape validation reads model.vision.arch
            arch = vision_arch
        self.vision = _V()

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "Blip2Model":
        vc, qc, tc = (cfg["vision_config"], cfg["qformer_config"],
                      cfg["text_config"])
        vision = Blip2VisionArch(
            hidden_size=vc["hidden_size"],
            intermediate_size=vc["intermediate_size"],
            num_layers=vc["num_hidden_layers"],
            num_heads=vc["num_attention_heads"],
            image_size=vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 14),
            ln_eps=vc.get("layer_norm_eps", 1e-5))
        qformer = QFormerArch(
            hidden_size=qc["hidden_size"],
            intermediate_size=qc["intermediate_size"],
            num_layers=qc["num_hidden_layers"],
            num_heads=qc["num_attention_heads"],
            encoder_hidden_size=qc.get("encoder_hidden_size",
                                       vc["hidden_size"]),
            cross_attention_frequency=qc.get("cross_attention_frequency",
                                             2),
            num_query_tokens=cfg.get("num_query_tokens", 32),
            ln_eps=qc.get("layer_norm_eps", 1e-12))
        text = OPTArch.from_hf_config(tc)
        # BLIP-2 has no placeholder token upstream (queries are prepended);
        # serve the reference behavior through a placeholder id so the
        # engine's splice applies (vllm blip2.py uses _IMAGE_TOKEN_ID
        # 50265 for the same purpose).
        return cls(text, vision, qformer,
                   cfg.get("image_token_index", 50265), dtype=dtype)

    @property
    def num_image_tokens(self) -> int:
        return self.qformer_arch.num_query_tokens

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        rng = np.random.default_rng(seed + 1)
        va, qa = self.vision_arch, self.qformer_arch

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

        d, i, L = va.hidden_size, va.intermediate_size, va.num_layers
        vis = {
            "patch_w": w(3 * va.patch_size ** 2, d), "patch_b": zeros(d),
            "cls": w(1, d), "pos": w(va.num_patches + 1, d),
            "post_ln_w": ones(d), "post_ln_b": zeros(d),
            "layers": {
                "ln1_w": ones(L, d), "ln1_b": zeros(L, d),
                "wqkv": w(L, d, 3 * d), "bqkv": zeros(L, 3 * d),
                "wo": w(L, d, d), "bo": zeros(L, d),
                "ln2_w": ones(L, d), "ln2_b": zeros(L, d),
                "fc1_w": w(L, d, i), "fc1_b": zeros(L, i),
                "fc2_w": w(L, i, d), "fc2_b": zeros(L, d),
            },
        }
        qd, qi = qa.hidden_size, qa.intermediate_size
        enc = qa.encoder_hidden_size
        qlayers = []
        for li in range(qa.num_layers):
            lp = {
                "sa_q": w(qd, qd), "sa_q_b": zeros(qd),
                "sa_k": w(qd, qd), "sa_k_b": zeros(qd),
                "sa_v": w(qd, qd), "sa_v_b": zeros(qd),
                "sa_o": w(qd, qd), "sa_o_b": zeros(qd),
                "sa_ln_w": ones(qd), "sa_ln_b": zeros(qd),
                "ffn_w1": w(qd, qi), "ffn_b1": zeros(qi),
                "ffn_w2": w(qi, qd), "ffn_b2": zeros(qd),
                "ffn_ln_w": ones(qd), "ffn_ln_b": zeros(qd),
            }
            if li % qa.cross_attention_frequency == 0:
                lp.update({
                    "ca_q": w(qd, qd), "ca_q_b": zeros(qd),
                    "ca_k": w(enc, qd), "ca_k_b": zeros(qd),
                    "ca_v": w(enc, qd), "ca_v_b": zeros(qd),
                    "ca_o": w(qd, qd), "ca_o_b": zeros(qd),
                    "ca_ln_w": ones(qd), "ca_ln_b": zeros(qd),
                })
            qlayers.append(lp)
        params["vision"] = vis
        params["qformer"] = {
            "query_tokens": w(qa.num_query_tokens, qd),
            "ln_w": ones(qd), "ln_b": zeros(qd),
            "layers": qlayers,
            "proj_w": w(qd, self.arch.hidden_size),
            "proj_b": zeros(self.arch.hidden_size),
        }
        if not as_numpy:
            for key in ("vision", "qformer"):
                params[key] = jax.tree.map(
                    lambda x: jnp.asarray(x, self.dtype), params[key])
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        va, qa = self.vision_arch, self.qformer_arch
        lang = {k[len("language_model."):]: v for k, v in tensors.items()
                if k.startswith("language_model.")}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)

        def t(name):
            return np.asarray(tensors[name])

        L = va.num_layers
        acc = {k: [] for k in ("ln1_w", "ln1_b", "wqkv", "bqkv", "wo",
                               "bo", "ln2_w", "ln2_b", "fc1_w", "fc1_b",
                               "fc2_w", "fc2_b")}
        for li in range(L):
            p = f"vision_model.encoder.layers.{li}."
            acc["ln1_w"].append(t(p + "layer_norm1.weight"))
            acc["ln1_b"].append(t(p + "layer_norm1.bias"))
            acc["wqkv"].append(t(p + "self_attn.qkv.weight").T)
            acc["bqkv"].append(t(p + "self_attn.qkv.bias"))
            acc["wo"].append(t(p + "self_attn.projection.weight").T)
            acc["bo"].append(t(p + "self_attn.projection.bias"))
            acc["ln2_w"].append(t(p + "layer_norm2.weight"))
            acc["ln2_b"].append(t(p + "layer_norm2.bias"))
            acc["fc1_w"].append(t(p + "mlp.fc1.weight").T)
            acc["fc1_b"].append(t(p + "mlp.fc1.bias"))
            acc["fc2_w"].append(t(p + "mlp.fc2.weight").T)
            acc["fc2_b"].append(t(p + "mlp.fc2.bias"))
        conv = t("vision_model.embeddings.patch_embedding.weight")
        vis = {
            "patch_w": conv.reshape(va.hidden_size, -1).T,
            "patch_b": t("vision_model.embeddings.patch_embedding.bias"),
            "cls": t("vision_model.embeddings.class_embedding"
                     ).reshape(1, -1),
            "pos": t("vision_model.embeddings.position_embedding"
                     ).reshape(-1, va.hidden_size),
            "post_ln_w": t("vision_model.post_layernorm.weight"),
            "post_ln_b": t("vision_model.post_layernorm.bias"),
            "layers": {k: np.stack(v) for k, v in acc.items()},
        }
        qlayers = []
        for li in range(qa.num_layers):
            p = f"qformer.encoder.layer.{li}."
            lp = {
                "sa_q": t(p + "attention.attention.query.weight").T,
                "sa_q_b": t(p + "attention.attention.query.bias"),
                "sa_k": t(p + "attention.attention.key.weight").T,
                "sa_k_b": t(p + "attention.attention.key.bias"),
                "sa_v": t(p + "attention.attention.value.weight").T,
                "sa_v_b": t(p + "attention.attention.value.bias"),
                "sa_o": t(p + "attention.output.dense.weight").T,
                "sa_o_b": t(p + "attention.output.dense.bias"),
                "sa_ln_w": t(p + "attention.output.LayerNorm.weight"),
                "sa_ln_b": t(p + "attention.output.LayerNorm.bias"),
                "ffn_w1": t(p + "intermediate_query.dense.weight").T,
                "ffn_b1": t(p + "intermediate_query.dense.bias"),
                "ffn_w2": t(p + "output_query.dense.weight").T,
                "ffn_b2": t(p + "output_query.dense.bias"),
                "ffn_ln_w": t(p + "output_query.LayerNorm.weight"),
                "ffn_ln_b": t(p + "output_query.LayerNorm.bias"),
            }
            if li % qa.cross_attention_frequency == 0:
                lp.update({
                    "ca_q": t(p + "crossattention.attention.query.weight"
                              ).T,
                    "ca_q_b": t(p + "crossattention.attention.query.bias"),
                    "ca_k": t(p + "crossattention.attention.key.weight").T,
                    "ca_k_b": t(p + "crossattention.attention.key.bias"),
                    "ca_v": t(p + "crossattention.attention.value.weight"
                              ).T,
                    "ca_v_b": t(p + "crossattention.attention.value.bias"),
                    "ca_o": t(p + "crossattention.output.dense.weight").T,
                    "ca_o_b": t(p + "crossattention.output.dense.bias"),
                    "ca_ln_w": t(p + "crossattention.output.LayerNorm"
                                 ".weight"),
                    "ca_ln_b": t(p + "crossattention.output.LayerNorm"
                                 ".bias"),
                })
            qlayers.append(lp)
        qf = {
            "query_tokens": t("query_tokens").reshape(
                qa.num_query_tokens, qa.hidden_size),
            "ln_w": t("qformer.layernorm.weight"),
            "ln_b": t("qformer.layernorm.bias"),
            "layers": qlayers,
            "proj_w": t("language_projection.weight").T,
            "proj_b": t("language_projection.bias"),
        }
        conv_fn = (np.asarray if as_numpy
                   else lambda x: jnp.asarray(x, self.dtype))
        params["vision"] = jax.tree.map(conv_fn, vis)
        params["qformer"] = jax.tree.map(conv_fn, qf)
        return params

    # ---- image path -----------------------------------------------------

    def _vision_encode(self, vp, pixel_values) -> jnp.ndarray:
        """[3, S, S] -> image embeds [num_patches + 1, Dv] (post-norm,
        CLS kept — the Q-Former cross-attends over everything)."""
        a = self.vision_arch
        ps = a.patch_size
        g = a.image_size // ps
        x = pixel_values.astype(self.dtype)
        x = x.reshape(3, g, ps, g, ps)
        x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(g * g, 3 * ps * ps)
        h = x @ vp["patch_w"] + vp["patch_b"]
        h = jnp.concatenate([vp["cls"].astype(h.dtype), h], axis=0)
        h = h + vp["pos"]
        nh, d = a.num_heads, a.hidden_size
        hd = d // nh
        scale = hd ** -0.5

        def layer_fn(h, lp):
            res = h
            x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], a.ln_eps)
            qkv = x @ lp["wqkv"] + lp["bqkv"]
            t = qkv.shape[0]
            # HF Blip2Attention: fused qkv viewed [T, 3, H, hd].
            qkv = qkv.reshape(t, 3, nh, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            s = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, v.astype(jnp.float32))
            h = res + (o.reshape(t, d).astype(h.dtype) @ lp["wo"]
                       + lp["bo"])
            res = h
            x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], a.ln_eps)
            x = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"],
                            approximate=False)
            return res + (x @ lp["fc2_w"] + lp["fc2_b"]), None

        h, _ = jax.lax.scan(layer_fn, h, vp["layers"])
        return layer_norm(h, vp["post_ln_w"], vp["post_ln_b"], a.ln_eps)

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """[3, S, S] -> [num_query_tokens, text_hidden] projected
        Q-Former outputs."""
        qa = self.qformer_arch
        img = self._vision_encode(params["vision"], pixel_values)
        qp = params["qformer"]
        h = layer_norm(qp["query_tokens"], qp["ln_w"], qp["ln_b"],
                       qa.ln_eps)
        for lp in qp["layers"]:
            # BERT post-norm self attention over the queries.
            attn = _bert_attn(h, h, lp["sa_q"], lp["sa_q_b"], lp["sa_k"],
                              lp["sa_k_b"], lp["sa_v"], lp["sa_v_b"],
                              qa.num_heads)
            h = layer_norm(h + (attn @ lp["sa_o"] + lp["sa_o_b"]),
                           lp["sa_ln_w"], lp["sa_ln_b"], qa.ln_eps)
            if "ca_q" in lp:
                attn = _bert_attn(h, img, lp["ca_q"], lp["ca_q_b"],
                                  lp["ca_k"], lp["ca_k_b"], lp["ca_v"],
                                  lp["ca_v_b"], qa.num_heads)
                h = layer_norm(h + (attn @ lp["ca_o"] + lp["ca_o_b"]),
                               lp["ca_ln_w"], lp["ca_ln_b"], qa.ln_eps)
            x = jax.nn.gelu(h @ lp["ffn_w1"] + lp["ffn_b1"],
                            approximate=False)
            h = layer_norm(h + (x @ lp["ffn_w2"] + lp["ffn_b2"]),
                           lp["ffn_ln_w"], lp["ffn_ln_b"], qa.ln_eps)
        return h @ qp["proj_w"] + qp["proj_b"]

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        va, qa = self.vision_arch, self.qformer_arch
        vis = va.num_layers * (4 * va.hidden_size ** 2
                               + 2 * va.hidden_size * va.intermediate_size)
        qf = qa.num_layers * (6 * qa.hidden_size ** 2
                              + 2 * qa.hidden_size * qa.intermediate_size
                              + 2 * qa.hidden_size
                              * qa.encoder_hidden_size)
        return (self.language.param_bytes()
                + (vis + qf) * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)


# convenience for VisionArch-style num_patches
Blip2VisionArch.num_patches = property(
    lambda self: (self.image_size // self.patch_size) ** 2)
