"""MiniCPM-V 2.5 / 2.6: Idefics2-style SigLIP tower + perceiver
resampler + Llama-3 (2.5) or Qwen2 (2.6) trunk.

Reference: vllm/model_executor/models/minicpmv.py (version dispatch
:966-1019; 2.5 :733-858, 2.6 :859-963) with the shared perceiver in
vllm/model_executor/layers/resampler.py (BaseResampler :149-206,
Resampler2_5 in minicpmv.py:122-216): ``query_num`` learned queries
cross-attend over kv-projected, LayerNorm-ed patch features whose keys
carry a 2D sincos positional embedding; output is ln_post + a learned
[D, D] projection.  The vision tower is Idefics2VisionTransformer —
structurally our SigLIP tower with Idefics2's bucketized full-grid
positions (identical to Idefics3's) and ``drop_vision_last_layer``.

MiniCPM-V 2.0 (timm-based tower + MiniCPM trunk) is not supported —
the reference marks it legacy and 2.5/2.6 are the served checkpoints.

Image intake: ``multi_modal_data={"image": slices}`` with fixed square
slices [N, 3, S, S] (the HF processor's variable-size slices are padded
to squares by the caller); each slice resamples to ``query_num`` tokens.
The HF config carries no image placeholder id (the HF side splices by
string markers), so ``image_token_id`` must be present in the config
dict (default 0 = <unk>).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel, Qwen2Arch
from .vision import VisionArch, VisionTower, layer_norm


def sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """2D sincos position table [h, w, D] (resampler.py:69-148,
    version 2.5 layout: [sincos(w-coord) | sincos(h-coord)], each D/2 =
    [sin | cos] over D/4 frequencies)."""
    def one(dim, pos):                       # pos [h, w] -> [h, w, dim]
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float32)
                                / (dim / 2.0))
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return np.concatenate([one(embed_dim // 2, gw),
                           one(embed_dim // 2, gh)], axis=-1)


class MiniCPMVModel:
    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, vision_arch: VisionArch,
                 image_token_id: int, query_num: int, dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision = VisionTower(vision_arch, dtype=dtype)
        self.arch = text_arch
        self.image_token_id = image_token_id
        self.query_num = query_num
        # embed_dim // 128 in the reference (minicpmv.py:806); real
        # checkpoints have hidden >= 2048, tiny test configs clamp to 1.
        self.num_heads = max(1, text_arch.hidden_size // 128)
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "MiniCPMVModel":
        version = str(cfg.get("version", "2.5"))
        if version == "2.6":
            text = Qwen2Arch.from_hf_config(cfg)
        elif version == "2.5":
            text = LlamaArch.from_hf_config(cfg)
        else:
            raise NotImplementedError(
                f"MiniCPM-V version {version} (2.5 / 2.6 supported)")
        vision = VisionArch.from_hf_config(
            {"model_type": "siglip_vision_model", **cfg["vision_config"]},
            text.hidden_size)
        vision.projector = "none"
        if cfg.get("drop_vision_last_layer", True):
            vision.num_layers -= 1
        return cls(text, vision, cfg.get("image_token_id", 0),
                   cfg.get("query_num", 96), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def _pos_ids(self) -> np.ndarray:
        # Idefics2VisionEmbeddings bucketized full-grid positions —
        # identical to Idefics3's (idefics3.py _pos_ids).
        g = self.vision.arch.image_size // self.vision.arch.patch_size
        boundaries = np.arange(1 / g, 1.0, 1 / g, dtype=np.float32)
        fc = np.arange(g, dtype=np.float32) / g * np.float32(1 - 1e-6)
        b = np.searchsorted(boundaries, fc, side="right")
        return (b[:, None] * g + b[None, :]).reshape(-1)

    def _sincos(self) -> jnp.ndarray:
        g = self.vision.arch.image_size // self.vision.arch.patch_size
        d = self.arch.hidden_size
        return jnp.asarray(sincos_2d(d, g, g).reshape(g * g, d),
                           self.dtype)

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        rng = np.random.default_rng(seed + 2)
        d, dv = self.arch.hidden_size, self.vision.arch.hidden_size

        def w(*shape):
            x = rng.standard_normal(shape).astype(np.float32) * 0.02
            return x if as_numpy else jnp.asarray(x, self.dtype)

        def ones(n):
            return (np.ones(n, np.float32) if as_numpy
                    else jnp.ones((n,), self.dtype))

        def zeros(n):
            return (np.zeros(n, np.float32) if as_numpy
                    else jnp.zeros((n,), self.dtype))

        params["resampler"] = {
            "query": w(self.query_num, d), "kv_w": w(dv, d),
            "ln_q_w": ones(d), "ln_q_b": zeros(d),
            "ln_kv_w": ones(d), "ln_kv_b": zeros(d),
            "in_w": w(d, 3 * d), "in_b": zeros(3 * d),
            "out_w": w(d, d), "out_b": zeros(d),
            "ln_post_w": ones(d), "ln_post_b": zeros(d),
            "proj": w(d, d),
        }
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        lang = {k[len("llm."):]: v for k, v in tensors.items()
                if k.startswith("llm.")}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        params["vision"] = self.vision.load_hf_state_dict(
            tensors, vision_prefix="vpm.")
        params["vision"]["pos"] = params["vision"]["pos"][self._pos_ids()]
        t = lambda n: np.asarray(tensors["resampler." + n])  # noqa: E731
        res = {
            "query": t("query"), "kv_w": t("kv_proj.weight").T,
            "ln_q_w": t("ln_q.weight"), "ln_q_b": t("ln_q.bias"),
            "ln_kv_w": t("ln_kv.weight"), "ln_kv_b": t("ln_kv.bias"),
            "in_w": t("attn.in_proj_weight").T,
            "in_b": t("attn.in_proj_bias"),
            "out_w": t("attn.out_proj.weight").T,
            "out_b": t("attn.out_proj.bias"),
            "ln_post_w": t("ln_post.weight"),
            "ln_post_b": t("ln_post.bias"),
            "proj": t("proj"),
        }
        params["resampler"] = jax.tree.map(
            lambda x: x if as_numpy else jnp.asarray(x, self.dtype), res)
        return params

    # ---- image path -----------------------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        s = self.vision.arch.image_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected slices [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        return pixel_values

    def num_image_tokens_for(self, pixel_values) -> int:
        return pixel_values.shape[0] * self.query_num

    def resample(self, params: dict, feats: jnp.ndarray) -> jnp.ndarray:
        """Perceiver cross-attention (minicpmv.py:168-216): feats
        [N, L, Dv] -> [N, query_num, D]."""
        rp = params["resampler"]
        d = self.arch.hidden_size
        nh = self.num_heads
        hd = d // nh
        q = layer_norm(rp["query"], rp["ln_q_w"], rp["ln_q_b"], 1e-6)
        kv = layer_norm(feats @ rp["kv_w"], rp["ln_kv_w"], rp["ln_kv_b"],
                        1e-6)
        keys = kv + self._sincos()[None, :kv.shape[1]]
        wq, wk, wv = jnp.split(rp["in_w"], 3, axis=1)
        bq, bk, bv = jnp.split(rp["in_b"], 3)
        qh = (q @ wq + bq).reshape(self.query_num, nh, hd)
        kh = (keys @ wk + bk).reshape(*keys.shape[:2], nh, hd)
        vh = (kv @ wv + bv).reshape(*kv.shape[:2], nh, hd)
        s = jnp.einsum("qhd,nlhd->nhql", qh, kh,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("nhql,nlhd->nqhd", p, vh).reshape(
            feats.shape[0], self.query_num, d)
        o = o @ rp["out_w"] + rp["out_b"]
        o = layer_norm(o, rp["ln_post_w"], rp["ln_post_b"], 1e-6)
        return o @ rp["proj"]

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """slices [N, 3, S, S] -> [N * query_num, hidden]."""
        feats = jax.vmap(
            lambda px: self.vision.encode(params["vision"], px))(
            pixel_values)                               # [N, L, Dv]
        out = self.resample(params, feats)
        return out.reshape(-1, self.arch.hidden_size)

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
