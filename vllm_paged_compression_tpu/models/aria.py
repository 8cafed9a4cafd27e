"""Aria (rhymes-ai/Aria): Idefics2-style SigLIP tower (post-LN removed)
+ cross-attention projector with resolution-keyed learned queries + a
Llama-MoE trunk with grouped shared experts.

Reference: vllm/model_executor/models/aria.py —
- Vision (:56-127): Idefics2VisionTransformer whose post-layernorm is
  identity; features are the raw last layer.
- Projector (:129-249): queries[:query_num] (query_num =
  projector_patch_to_query_dict[num_patches]) are LayerNorm-ed,
  q/k/v-projected, passed through an nn.MultiheadAttention (a SECOND
  in-projection — kept faithfully), out-projected, then linear (+bias),
  then ln_ffn + FFN(gelu_new) into the text hidden size.
- Trunk (:283-436): Llama layers whose MLP is an 8-expert top-2 MoE
  (softmax-then-topk, renormalized — FusedMoE defaults) with PRE-PACKED
  expert tensors fc1 [E, D, 2I] / fc2 [E, I, D] plus a dense
  ``shared_experts`` gated MLP of width moe_intermediate_size *
  moe_num_shared_experts.

Image intake: ``multi_modal_data={"image": crops}`` with crops
[N, 3, S, S]; each crop maps to ``patch_to_query[num_patches]`` tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel
from .vision import VisionArch, VisionTower, layer_norm


class AriaArch(LlamaArch):
    """Trunk flags for Aria's Llama-MoE (aria.py:283-357)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "AriaArch":
        a = super().from_hf_config(cfg)
        a.num_experts = cfg.get("moe_num_experts", 8)
        a.num_experts_per_tok = cfg.get("moe_topk", 2)
        a.moe_intermediate_size = cfg.get("moe_intermediate_size", 4096)
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = True
        a.moe_shared_intermediate = (
            cfg.get("moe_intermediate_size", 4096)
            * cfg.get("moe_num_shared_experts", 2))
        a.moe_shared_plural = True
        a.moe_hf_style = "aria"
        return a


class AriaModel:
    architecture = "llava"

    def __init__(self, text_arch: AriaArch, vision_arch: VisionArch,
                 image_token_id: int, patch_to_query: dict,
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision = VisionTower(vision_arch, dtype=dtype)
        self.arch = text_arch
        self.image_token_id = image_token_id
        self.patch_to_query = {int(k): int(v)
                               for k, v in patch_to_query.items()}
        self.num_heads = vision_arch.num_heads
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16) -> "AriaModel":
        text = AriaArch.from_hf_config(cfg["text_config"])
        vision = VisionArch.from_hf_config(
            {"model_type": "siglip_vision_model", **cfg["vision_config"]},
            text.hidden_size)
        vision.projector = "none"
        vision.post_ln_feature = False        # identity post-LN
        return cls(text, vision, cfg.get("image_token_index", 9),
                   cfg.get("projector_patch_to_query_dict")
                   or {1225: 128, 4900: 256}, dtype=dtype)

    # ---- params ---------------------------------------------------------

    def _pos_ids(self) -> np.ndarray:
        g = self.vision.arch.image_size // self.vision.arch.patch_size
        boundaries = np.arange(1 / g, 1.0, 1 / g, dtype=np.float32)
        fc = np.arange(g, dtype=np.float32) / g * np.float32(1 - 1e-6)
        b = np.searchsorted(boundaries, fc, side="right")
        return (b[:, None] * g + b[None, :]).reshape(-1)

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        rng = np.random.default_rng(seed + 2)
        dv = self.vision.arch.hidden_size
        ff = out = self.arch.hidden_size
        max_q = max(self.patch_to_query.values())

        def w(*shape):
            x = rng.standard_normal(shape).astype(np.float32) * 0.02
            return x if as_numpy else jnp.asarray(x, self.dtype)

        def ones(n):
            return (np.ones(n, np.float32) if as_numpy
                    else jnp.ones((n,), self.dtype))

        def zeros(n):
            return (np.zeros(n, np.float32) if as_numpy
                    else jnp.zeros((n,), self.dtype))

        params["projector"] = {
            "query": w(max_q, dv),
            "q_w": w(dv, dv), "k_w": w(dv, dv), "v_w": w(dv, dv),
            "ln_q_w": ones(dv), "ln_q_b": zeros(dv),
            "ln_kv_w": ones(dv), "ln_kv_b": zeros(dv),
            "in_w": w(dv, 3 * dv), "in_b": zeros(3 * dv),
            "out_w": w(dv, dv), "out_b": zeros(dv),
            "lin_w": w(dv, dv), "lin_b": zeros(dv),
            "ln_ffn_w": ones(dv), "ln_ffn_b": zeros(dv),
            "ffn_in": w(dv, ff), "ffn_out": w(ff, out),
        }
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        lang = {k[len("language_model."):]: v for k, v in tensors.items()
                if k.startswith("language_model.")}
        if "lm_head.weight" in tensors:
            lang["lm_head.weight"] = tensors["lm_head.weight"]
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        params["vision"] = self.vision.load_hf_state_dict(
            tensors, vision_prefix="vision_tower.vision_model.")
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        mp = "multi_modal_projector."
        t = lambda n: np.asarray(tensors[mp + n])  # noqa: E731
        proj = {
            "query": t("query"),
            "q_w": t("cross_attn.q_proj.weight").T,
            "k_w": t("cross_attn.k_proj.weight").T,
            "v_w": t("cross_attn.v_proj.weight").T,
            "ln_q_w": t("cross_attn.layer_norm.weight"),
            "ln_q_b": t("cross_attn.layer_norm.bias"),
            "ln_kv_w": t("cross_attn.ln_kv.weight"),
            "ln_kv_b": t("cross_attn.ln_kv.bias"),
            "in_w": t("cross_attn.multihead_attn.in_proj_weight").T,
            "in_b": t("cross_attn.multihead_attn.in_proj_bias"),
            "out_w": t("cross_attn.multihead_attn.out_proj.weight").T,
            "out_b": t("cross_attn.multihead_attn.out_proj.bias"),
            "lin_w": t("cross_attn.linear.weight").T,
            "lin_b": t("cross_attn.linear.bias"),
            "ln_ffn_w": t("ln_ffn.weight"), "ln_ffn_b": t("ln_ffn.bias"),
            "ffn_in": t("ffn.linear_in.weight").T,
            "ffn_out": t("ffn.linear_out.weight").T,
        }
        params["projector"] = jax.tree.map(
            lambda x: x if as_numpy else jnp.asarray(x, self.dtype), proj)
        return params

    # ---- image path -----------------------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        s = self.vision.arch.image_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected crops [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        if self.vision.arch.num_patches not in self.patch_to_query:
            raise ValueError(
                f"no query count for {self.vision.arch.num_patches} "
                f"patches in {self.patch_to_query}")
        return pixel_values

    def num_image_tokens_for(self, pixel_values) -> int:
        return (pixel_values.shape[0]
                * self.patch_to_query[self.vision.arch.num_patches])

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """crops [N, 3, S, S] -> [N * query_num, hidden]."""
        feats = jax.vmap(
            lambda px: self.vision.encode(params["vision"], px))(
            pixel_values)                               # [N, P, Dv]
        pp = params["projector"]
        n, p, dv = feats.shape
        qn = self.patch_to_query[p]
        nh = self.num_heads
        hd = dv // nh
        # cross_attn (aria.py:144-182): LN(q) -> q_proj; ln_kv -> k/v
        # projections; then the MultiheadAttention's own in/out proj.
        q = layer_norm(pp["query"][:qn], pp["ln_q_w"], pp["ln_q_b"], 1e-5)
        q = q @ pp["q_w"]
        kv = layer_norm(feats, pp["ln_kv_w"], pp["ln_kv_b"], 1e-5)
        k = kv @ pp["k_w"]
        v = kv @ pp["v_w"]
        wq, wk, wv = jnp.split(pp["in_w"], 3, axis=1)
        bq, bk, bv = jnp.split(pp["in_b"], 3)
        qh = (q @ wq + bq).reshape(qn, nh, hd)
        kh = (k @ wk + bk).reshape(n, p, nh, hd)
        vh = (v @ wv + bv).reshape(n, p, nh, hd)
        s = jnp.einsum("qhd,nlhd->nhql", qh, kh,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        pr = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("nhql,nlhd->nqhd", pr, vh).reshape(n, qn, dv)
        o = o @ pp["out_w"] + pp["out_b"]
        o = o @ pp["lin_w"] + pp["lin_b"]
        o = layer_norm(o, pp["ln_ffn_w"], pp["ln_ffn_b"], 1e-5)
        o = jax.nn.gelu(o @ pp["ffn_in"], approximate=True)
        o = o @ pp["ffn_out"]
        return o.reshape(n * qn, -1)

    # ---- delegation -----------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        a = self.vision.arch
        vis = a.num_layers * (4 * a.hidden_size ** 2
                              + 2 * a.hidden_size * a.intermediate_size)
        return (self.language.param_bytes()
                + vis * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
