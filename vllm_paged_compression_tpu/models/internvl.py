"""InternVL2 family: InternViT vision tower + pixel-shuffle + MLP1
projector + a registry-selected text trunk (Qwen2 / InternLM2 / Llama).

Covers three reference architectures on one implementation:

- ``InternVLChatModel`` (vllm/model_executor/models/internvl.py +
  intern_vit.py): InternViT encoder (CLS token, pre-norm layers with
  layer-scale ls1/ls2, optional flat qk RMSNorm), features from
  ``select_layer``, CLS dropped, pixel shuffle by ``downsample_ratio``
  (internvl.py:573-585), then mlp1 = LayerNorm -> Linear -> GELU ->
  Linear (internvl.py:561-571).
- ``NVLM_D`` (vllm/model_executor/models/nvlm_d.py): same tower; mlp1
  projects through the LLM intermediate size with bias-free linears
  (nvlm_d.py:47-59).  The reference pads the ViT with 7 dummy attention
  heads purely for GPU tensor-parallel divisibility (nvlm_d.py:80) —
  irrelevant under GSPMD sharding, so no dummy heads here.
- ``H2OVLChatModel`` (vllm/model_executor/models/h2ovl.py): identical
  model; its novelty is host-side multi-scale adaptive cropping (MSAC),
  provided by :func:`dynamic_tile` with ``msac=True``.

Image intake: ``multi_modal_data={"image": crops}`` with crops
[N, 3, S, S] — the tiles produced by the HF processor's dynamic
preprocessing (aspect-ratio grid + thumbnail).  :func:`dynamic_tile`
replicates that tiling host-side for raw [3, H, W] arrays
(internvl.py:90-185; h2ovl.py:70-173 for MSAC).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel
from .vision import layer_norm, _VIT_ACTS


@dataclass
class InternViTArch:
    hidden_size: int
    intermediate_size: int
    num_layers: int            # layers RUN (select_layer applied)
    num_heads: int
    image_size: int
    patch_size: int
    norm_type: str = "layer_norm"     # | "rms_norm" (InternViT-6B)
    qk_norm: bool = False             # 6B: flat RMSNorm on q/k
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    act: str = "gelu"

    @classmethod
    def from_hf_config(cls, vc: dict, select_layer: int = -1
                       ) -> "InternViTArch":
        n = vc["num_hidden_layers"]
        # reference internvl.py:546-551: select_layer -> layer override.
        n_run = (n + select_layer + 1) if select_layer < 0 \
            else (select_layer + 1)
        return cls(
            hidden_size=vc["hidden_size"],
            intermediate_size=vc["intermediate_size"],
            num_layers=n_run,
            num_heads=vc["num_attention_heads"],
            image_size=vc.get("image_size", 448),
            patch_size=vc.get("patch_size", 14),
            norm_type=vc.get("norm_type", "layer_norm"),
            qk_norm=vc.get("qk_normalization", False),
            qkv_bias=vc.get("qkv_bias", True),
            ln_eps=vc.get("layer_norm_eps", 1e-6),
            act=vc.get("hidden_act", "gelu"),
        )

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


class InternViTTower:
    """InternViT encoder (reference intern_vit.py InternVisionModel,
    SDPA attention path :214-280).  Returns patch features with the CLS
    token dropped (internvl.py:588)."""

    def __init__(self, arch: InternViTArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    def init_params(self, seed: int = 0) -> dict:
        a = self.arch
        rng = np.random.default_rng(seed)

        def w(*shape):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * 0.02,
                self.dtype)

        d, i, L = a.hidden_size, a.intermediate_size, a.num_layers
        layers = {
            "n1_w": jnp.ones((L, d), self.dtype),
            "wqkv": w(L, d, 3 * d), "bqkv": jnp.zeros((L, 3 * d),
                                                      self.dtype),
            "wo": w(L, d, d), "bo": jnp.zeros((L, d), self.dtype),
            "n2_w": jnp.ones((L, d), self.dtype),
            "fc1_w": w(L, d, i), "fc1_b": jnp.zeros((L, i), self.dtype),
            "fc2_w": w(L, i, d), "fc2_b": jnp.zeros((L, d), self.dtype),
            "ls1": jnp.ones((L, d), self.dtype),
            "ls2": jnp.ones((L, d), self.dtype),
        }
        if a.norm_type == "layer_norm":
            layers["n1_b"] = jnp.zeros((L, d), self.dtype)
            layers["n2_b"] = jnp.zeros((L, d), self.dtype)
        if a.qk_norm:
            layers["qn_w"] = jnp.ones((L, d), self.dtype)
            layers["kn_w"] = jnp.ones((L, d), self.dtype)
        return {
            "patch_w": w(3 * a.patch_size ** 2, d),
            "patch_b": jnp.zeros((d,), self.dtype),
            "cls": w(1, d),
            "pos": w(a.grid ** 2 + 1, d),
            "layers": layers,
        }

    def load_hf_state_dict(self, tensors: dict,
                           prefix: str = "vision_model.") -> dict:
        a = self.arch

        def t(name):
            return np.asarray(tensors[prefix + name])

        L = a.num_layers
        names = ["n1_w", "wqkv", "bqkv", "wo", "bo", "n2_w", "fc1_w",
                 "fc1_b", "fc2_w", "fc2_b", "ls1", "ls2"]
        if a.norm_type == "layer_norm":
            names += ["n1_b", "n2_b"]
        if a.qk_norm:
            names += ["qn_w", "kn_w"]
        layers = {k: [] for k in names}
        for li in range(L):
            p = f"encoder.layers.{li}."
            layers["n1_w"].append(t(p + "norm1.weight"))
            layers["n2_w"].append(t(p + "norm2.weight"))
            if a.norm_type == "layer_norm":
                layers["n1_b"].append(t(p + "norm1.bias"))
                layers["n2_b"].append(t(p + "norm2.bias"))
            layers["wqkv"].append(t(p + "attn.qkv.weight").T)
            layers["bqkv"].append(
                t(p + "attn.qkv.bias") if a.qkv_bias
                else np.zeros(3 * a.hidden_size, np.float32))
            layers["wo"].append(t(p + "attn.proj.weight").T)
            layers["bo"].append(t(p + "attn.proj.bias"))
            if a.qk_norm:
                layers["qn_w"].append(t(p + "attn.q_norm.weight"))
                layers["kn_w"].append(t(p + "attn.k_norm.weight"))
            layers["fc1_w"].append(t(p + "mlp.fc1.weight").T)
            layers["fc1_b"].append(t(p + "mlp.fc1.bias"))
            layers["fc2_w"].append(t(p + "mlp.fc2.weight").T)
            layers["fc2_b"].append(t(p + "mlp.fc2.bias"))
            layers["ls1"].append(t(p + "ls1"))
            layers["ls2"].append(t(p + "ls2"))
        conv = t("embeddings.patch_embedding.weight")
        params = {
            "patch_w": conv.reshape(a.hidden_size, -1).T,
            "patch_b": t("embeddings.patch_embedding.bias"),
            "cls": t("embeddings.class_embedding").reshape(1, -1),
            "pos": t("embeddings.position_embedding").reshape(
                -1, a.hidden_size),
            "layers": {k: np.stack(v) for k, v in layers.items()},
        }
        return jax.tree.map(lambda x: jnp.asarray(x, self.dtype), params)

    def encode(self, params: dict, pixel_values: jnp.ndarray
               ) -> jnp.ndarray:
        """[3, S, S] -> [grid*grid, hidden] (CLS dropped)."""
        a = self.arch
        ps, g = a.patch_size, a.grid
        x = pixel_values.astype(self.dtype)
        x = x.reshape(3, g, ps, g, ps)
        x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(g * g, 3 * ps * ps)
        h = x @ params["patch_w"] + params["patch_b"]
        h = jnp.concatenate([params["cls"], h], axis=0) + params["pos"]

        nh, d = a.num_heads, a.hidden_size
        hd = d // nh
        scale = hd ** -0.5
        act = _VIT_ACTS.get(a.act) or _VIT_ACTS["gelu"]

        def norm(x, lp, which):
            if a.norm_type == "rms_norm":
                return _rms(x, lp[which + "_w"], a.ln_eps)
            return layer_norm(x, lp[which + "_w"], lp[which + "_b"],
                              a.ln_eps)

        def layer_fn(h, lp):
            x = norm(h, lp, "n1")
            qkv = x @ lp["wqkv"] + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if a.qk_norm:
                # flat RMSNorm over the full H*d projection
                # (intern_vit.py:262-267).
                q = _rms(q, lp["qn_w"], a.ln_eps)
                k = _rms(k, lp["kn_w"], a.ln_eps)
            t = q.shape[0]
            q = q.reshape(t, nh, hd).transpose(1, 0, 2)
            k = k.reshape(t, nh, hd).transpose(1, 0, 2)
            v = v.reshape(t, nh, hd).transpose(1, 0, 2)
            s = jnp.einsum("htd,hsd->hts", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("hts,hsd->htd", p, v)
            o = o.transpose(1, 0, 2).reshape(t, d)
            h = h + (o @ lp["wo"] + lp["bo"]) * lp["ls1"]
            x = norm(h, lp, "n2")
            x = act(x @ lp["fc1_w"] + lp["fc1_b"])
            h = h + (x @ lp["fc2_w"] + lp["fc2_b"]) * lp["ls2"]
            return h, None

        h, _ = jax.lax.scan(layer_fn, h, params["layers"])
        return h[1:]                                    # drop CLS


class InternVLModel:
    """Composite InternVL/NVLM-D/H2OVL model; the language side delegates
    to the registry-selected trunk so every engine path (paged decode,
    eviction, spec decode, quantized KV) works unchanged."""

    architecture = "llava"

    def __init__(self, text_arch, vision_arch: InternViTArch,
                 image_token_id: int, downsample_ratio: float = 0.5,
                 ps_version: str = "v2", style: str = "internvl",
                 dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.vision = InternViTTower(vision_arch, dtype=dtype)
        self.arch = text_arch
        self.image_token_id = image_token_id
        self.downsample_ratio = downsample_ratio
        self.ps_version = ps_version
        self.style = style
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16,
                       style: str = "internvl") -> "InternVLModel":
        from .registry import _ensure_builtin, _REGISTRY
        _ensure_builtin()
        tc = cfg["text_config"]
        arch_cls = None
        for name in tc.get("architectures") or ["LlamaForCausalLM"]:
            if name in _REGISTRY:
                arch_cls = _REGISTRY[name][1]
                break
        if arch_cls is None:
            raise ValueError(f"unsupported InternVL text trunk "
                             f"{tc.get('architectures')}")
        text = arch_cls.from_hf_config(tc)
        vision = InternViTArch.from_hf_config(cfg["vision_config"],
                                              cfg.get("select_layer", -1))
        return cls(text, vision,
                   cfg.get("img_context_token_id")
                   or cfg.get("image_token_id", 151667),
                   downsample_ratio=cfg.get("downsample_ratio", 0.5),
                   ps_version=cfg.get("ps_version", "v2"),
                   style=style, dtype=dtype)

    @property
    def tokens_per_crop(self) -> int:
        return int(round(self.vision.arch.grid ** 2
                         * self.downsample_ratio ** 2))

    # ---- params ---------------------------------------------------------

    def _proj_dims(self):
        dv = self.vision.arch.hidden_size
        din = int(dv / self.downsample_ratio ** 2)
        if self.style == "nvlm":
            mid = self.arch.intermediate_size
        else:
            mid = self.arch.hidden_size
        return din, mid, self.arch.hidden_size

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        params["vision"] = self.vision.init_params(seed + 1)
        rng = np.random.default_rng(seed + 2)
        din, mid, dout = self._proj_dims()

        def w(*shape):
            x = rng.standard_normal(shape).astype(np.float32) * 0.02
            return x if as_numpy else jnp.asarray(x, self.dtype)

        params["mlp1"] = {
            "ln_w": np.ones(din, np.float32) if as_numpy
            else jnp.ones((din,), self.dtype),
            "ln_b": np.zeros(din, np.float32) if as_numpy
            else jnp.zeros((din,), self.dtype),
            "w1": w(din, mid), "b1": w(mid) * 0.0,
            "w2": w(mid, dout), "b2": w(dout) * 0.0,
        }
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        lang = {k[len("language_model."):]: v for k, v in tensors.items()
                if k.startswith("language_model.")}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)
        params["vision"] = self.vision.load_hf_state_dict(tensors)
        t = lambda n: np.asarray(tensors[n])  # noqa: E731
        din, mid, dout = self._proj_dims()
        mlp1 = {"ln_w": t("mlp1.0.weight"), "ln_b": t("mlp1.0.bias"),
                "w1": t("mlp1.1.weight").T, "w2": t("mlp1.3.weight").T}
        mlp1["b1"] = (np.asarray(tensors["mlp1.1.bias"])
                      if "mlp1.1.bias" in tensors
                      else np.zeros(mid, np.float32))
        mlp1["b2"] = (np.asarray(tensors["mlp1.3.bias"])
                      if "mlp1.3.bias" in tensors
                      else np.zeros(dout, np.float32))
        params["mlp1"] = jax.tree.map(
            lambda x: x if as_numpy else jnp.asarray(x, self.dtype), mlp1)
        return params

    # ---- image path -----------------------------------------------------

    def validate_image(self, pixel_values: np.ndarray) -> np.ndarray:
        s = self.vision.arch.image_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        if pixel_values.ndim != 4 or pixel_values.shape[1:] != (3, s, s):
            raise ValueError(f"expected tiles [N, 3, {s}, {s}], got "
                             f"{pixel_values.shape}")
        return pixel_values

    def num_image_tokens_for(self, pixel_values) -> int:
        return pixel_values.shape[0] * self.tokens_per_crop

    def encode_image(self, params: dict, pixel_values) -> jnp.ndarray:
        """tiles [N, 3, S, S] -> [N * tokens_per_crop, text_hidden]:
        tower -> pixel shuffle (internvl.py:573-585) -> mlp1."""
        feats = jax.vmap(
            lambda px: self.vision.encode(params["vision"], px))(
            pixel_values)                               # [N, g*g, Dv]
        n, seq, d = feats.shape
        g = int(round(seq ** 0.5))
        sf = self.downsample_ratio
        gs = int(g * sf)
        # pixel_shuffle: [N, W, H, C] -> [N, H*sf, W*sf, C/sf^2]; v2
        # transposes back to width-major (v1 keeps the permuted order).
        x = feats.reshape(n, g, gs, int(d / sf))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n, gs, gs, int(d / (sf * sf)))
        if self.ps_version != "v1":
            x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(n * gs * gs, int(d / (sf * sf)))
        mp = params["mlp1"]
        y = layer_norm(x, mp["ln_w"], mp["ln_b"], 1e-5)
        y = jax.nn.gelu(y @ mp["w1"] + mp["b1"], approximate=False)
        return y @ mp["w2"] + mp["b2"]

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


# ---- host-side dynamic tiling (reference internvl.py:90-199 /
# h2ovl.py:29-173) -------------------------------------------------------

def _closest_aspect_ratio(aspect, ratios, w, h, s):
    best, best_diff = (1, 1), float("inf")
    area = w * h
    for r in ratios:
        diff = abs(aspect - r[0] / r[1])
        if diff < best_diff:
            best, best_diff = r, diff
        elif diff == best_diff and area > 0.5 * s * s * r[0] * r[1]:
            best = r
    return best


def dynamic_tile(image: np.ndarray, image_size: int = 448,
                 min_num: int = 1, max_num: int = 12,
                 use_thumbnail: bool = True, msac: bool = False
                 ) -> np.ndarray:
    """[3, H, W] float array -> tiles [N, 3, S, S] following the
    reference's dynamic aspect-ratio preprocessing (internvl.py:155-185).
    ``msac=True`` runs H2OVL's two-pass multi-scale adaptive crop
    (h2ovl.py:134-173): second pass at the prior aspect ratio doubled,
    combined as [pass2 tiles | pass1 tiles | thumbnail]."""
    _, h, w = image.shape
    ratios = sorted({(i, j) for n in range(min_num, max_num + 1)
                     for i in range(1, n + 1) for j in range(1, n + 1)
                     if min_num <= i * j <= max_num},
                    key=lambda r: r[0] * r[1])

    def one_pass(prior=None):
        if prior is None:
            r = _closest_aspect_ratio(w / h, ratios, w, h, image_size)
        else:
            # h2ovl.py:70-99: exclude the prior ratio, prefer ~2x its area.
            cand = [x for x in ratios if x != prior]
            r = _closest_aspect_ratio(2 * prior[0] * prior[1], cand,
                                      w, h, image_size) if cand else prior
        tw, th = image_size * r[0], image_size * r[1]
        resized = jax.image.resize(jnp.asarray(image, jnp.float32),
                                   (3, th, tw), "bilinear")
        tiles = [np.asarray(resized[:, y:y + image_size,
                                    x:x + image_size])
                 for y in range(0, th, image_size)
                 for x in range(0, tw, image_size)]
        return tiles, r

    if msac:
        t1, r1 = one_pass()
        t2, _ = one_pass(prior=r1)
        tiles = t2 + t1
    else:
        tiles, _ = one_pass()
    if use_thumbnail and len(tiles) > 1:
        thumb = np.asarray(jax.image.resize(
            jnp.asarray(image, jnp.float32),
            (3, image_size, image_size), "bilinear"))
        tiles.append(thumb)
    return np.stack(tiles)
