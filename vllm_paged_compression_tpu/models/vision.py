"""CLIP-style vision tower + multimodal projector (functional JAX).

TPU-native re-design of the reference's multimodal input path
(vllm/model_executor/models/clip.py CLIPVisionModel +
vllm/model_executor/models/llava.py LlavaMultiModalProjector, SURVEY C17):
a pre-LayerNorm ViT over image patches whose selected hidden layer feeds a
two-layer MLP projector into the language model's embedding space.  All
weights are a plain pytree; the encoder is one jittable function (patch
conv as a single reshaped matmul — MXU-friendly, no conv primitive
needed for non-overlapping patches).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class VisionArch:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    # Llava: features from hidden layer -2, CLS token dropped.
    feature_layer: int = -2
    projector_hidden: int = 4096          # language hidden size
    # Encoder style (reference clip.py vs siglip.py):
    # "clip": CLS token + pre-LayerNorm, exact GELU, no patch bias.
    # "siglip": no CLS, patch bias, final post-LayerNorm, tanh GELU,
    #           features from the LAST layer (post-norm).
    style: str = "clip"
    ln_eps: float = 1e-5
    act: str = "quick_gelu"   # CLIP default; siglip: gelu_pytorch_tanh
    # Projector: "mlp2" (llava linear_1/gelu/linear_2), "linear"
    # (paligemma multi_modal_projector.linear), "none" (raw features).
    projector: str = "mlp2"
    proj_scale: float = 1.0               # paligemma: text_hidden**-0.5
    post_ln_feature: bool = True          # siglip: features post-norm;
    #                                       llava-onevision selects the
    #                                       raw last layer ("full" at -1)

    @classmethod
    def from_hf_config(cls, vision_cfg: dict, text_hidden: int
                       ) -> "VisionArch":
        style = ("siglip"
                 if vision_cfg.get("model_type") == "siglip_vision_model"
                 else "clip")
        return cls(
            hidden_size=vision_cfg.get("hidden_size", 1024),
            intermediate_size=vision_cfg.get("intermediate_size", 4096),
            num_layers=vision_cfg.get("num_hidden_layers", 24),
            num_heads=vision_cfg.get("num_attention_heads", 16),
            image_size=vision_cfg.get("image_size", 336),
            patch_size=vision_cfg.get("patch_size", 14),
            projector_hidden=text_hidden,
            style=style,
            ln_eps=vision_cfg.get("layer_norm_eps",
                                  1e-6 if style == "siglip" else 1e-5),
            act=vision_cfg.get("hidden_act",
                               "gelu_pytorch_tanh" if style == "siglip"
                               else "quick_gelu"),
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


_VIT_ACTS = {
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


class VisionTower:
    """Stateless ViT encoder + projector (params travel as a pytree)."""

    def __init__(self, arch: VisionArch, dtype=jnp.float32):
        self.arch = arch
        self.dtype = dtype

    def init_params(self, seed: int = 0) -> dict:
        a = self.arch
        rng = np.random.default_rng(seed)

        def w(*shape):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * 0.02,
                self.dtype)

        def zeros(*shape):
            return jnp.zeros(shape, self.dtype)

        def ones(*shape):
            return jnp.ones(shape, self.dtype)

        d, i, L = a.hidden_size, a.intermediate_size, a.num_layers
        patch_in = 3 * a.patch_size * a.patch_size
        layers = {
            "ln1_w": ones(L, d), "ln1_b": zeros(L, d),
            "wqkv": w(L, d, 3 * d), "bqkv": zeros(L, 3 * d),
            "wo": w(L, d, d), "bo": zeros(L, d),
            "ln2_w": ones(L, d), "ln2_b": zeros(L, d),
            "fc1_w": w(L, d, i), "fc1_b": zeros(L, i),
            "fc2_w": w(L, i, d), "fc2_b": zeros(L, d),
        }
        params = {"patch_w": w(patch_in, d), "layers": layers}
        if a.style == "siglip":
            params.update({
                "patch_b": zeros(d),
                "pos": w(a.num_patches, d),
                "post_ln_w": ones(d), "post_ln_b": zeros(d),
            })
        else:
            params.update({
                "cls": w(1, d),
                "pos": w(a.num_patches + 1, d),
                "pre_ln_w": ones(d), "pre_ln_b": zeros(d),
            })
        if a.projector == "mlp2":
            params.update({
                "proj1_w": w(d, a.projector_hidden),
                "proj1_b": zeros(a.projector_hidden),
                "proj2_w": w(a.projector_hidden, a.projector_hidden),
                "proj2_b": zeros(a.projector_hidden),
            })
        elif a.projector == "linear":
            params.update({
                "proj1_w": w(d, a.projector_hidden),
                "proj1_b": zeros(a.projector_hidden),
            })
        return params

    def load_hf_state_dict(self, tensors: dict, prefix: str = "",
                           vision_prefix: str =
                           "vision_tower.vision_model.") -> dict:
        """Map HF llava weights (vision_tower.vision_model.* +
        multi_modal_projector.*) into our fused layout; other families
        pass their own ``vision_prefix`` (Idefics3: model.vision_model.).
        """
        a = self.arch

        def t(name):
            return np.asarray(tensors[prefix + name])

        vp = vision_prefix
        L = a.num_layers
        layers = {k: [] for k in ("ln1_w", "ln1_b", "wqkv", "bqkv", "wo",
                                  "bo", "ln2_w", "ln2_b", "fc1_w", "fc1_b",
                                  "fc2_w", "fc2_b")}
        for li in range(L):
            p = f"{vp}encoder.layers.{li}."
            layers["ln1_w"].append(t(p + "layer_norm1.weight"))
            layers["ln1_b"].append(t(p + "layer_norm1.bias"))
            layers["wqkv"].append(np.concatenate([
                t(p + "self_attn.q_proj.weight").T,
                t(p + "self_attn.k_proj.weight").T,
                t(p + "self_attn.v_proj.weight").T], axis=1))
            layers["bqkv"].append(np.concatenate([
                t(p + "self_attn.q_proj.bias"),
                t(p + "self_attn.k_proj.bias"),
                t(p + "self_attn.v_proj.bias")]))
            layers["wo"].append(t(p + "self_attn.out_proj.weight").T)
            layers["bo"].append(t(p + "self_attn.out_proj.bias"))
            layers["ln2_w"].append(t(p + "layer_norm2.weight"))
            layers["ln2_b"].append(t(p + "layer_norm2.bias"))
            layers["fc1_w"].append(t(p + "mlp.fc1.weight").T)
            layers["fc1_b"].append(t(p + "mlp.fc1.bias"))
            layers["fc2_w"].append(t(p + "mlp.fc2.weight").T)
            layers["fc2_b"].append(t(p + "mlp.fc2.bias"))
        # HF conv kernel [D, 3, ps, ps] -> matmul [3*ps*ps, D] matching our
        # patch extraction order (channel-major per patch).
        conv = t(vp + "embeddings.patch_embedding.weight")
        patch_w = conv.reshape(a.hidden_size, -1).T
        params = {
            "patch_w": patch_w,
            "layers": {k: np.stack(v) for k, v in layers.items()},
        }
        if a.style == "siglip":
            params.update({
                "patch_b": t(vp + "embeddings.patch_embedding.bias"),
                "pos": t(vp + "embeddings.position_embedding.weight"),
            })
            if vision_prefix + "post_layernorm.weight" in tensors:
                params["post_ln_w"] = t(vp + "post_layernorm.weight")
                params["post_ln_b"] = t(vp + "post_layernorm.bias")
            else:
                # Aria replaces the post-layernorm with identity
                # (aria.py:56-70); keep inert params for a stable pytree.
                params["post_ln_w"] = np.ones(a.hidden_size, np.float32)
                params["post_ln_b"] = np.zeros(a.hidden_size, np.float32)
        else:
            params.update({
                "cls": t(vp + "embeddings.class_embedding").reshape(1, -1),
                "pos": t(vp + "embeddings.position_embedding.weight"),
                "pre_ln_w": t(vp + "pre_layrnorm.weight"),
                "pre_ln_b": t(vp + "pre_layrnorm.bias"),
            })
        if a.projector == "mlp2":
            params.update({
                "proj1_w": t("multi_modal_projector.linear_1.weight").T,
                "proj1_b": t("multi_modal_projector.linear_1.bias"),
                "proj2_w": t("multi_modal_projector.linear_2.weight").T,
                "proj2_b": t("multi_modal_projector.linear_2.bias"),
            })
        elif a.projector == "linear":
            params.update({
                "proj1_w": t("multi_modal_projector.linear.weight").T,
                "proj1_b": t("multi_modal_projector.linear.bias"),
            })
        return jax.tree.map(lambda x: jnp.asarray(x, self.dtype), params)

    def encode(self, params: dict, pixel_values: jnp.ndarray,
               project: bool = True) -> jnp.ndarray:
        """pixel_values [3, H, W] -> projected patch features
        [num_patches, projector_hidden] (CLS dropped, layer -2 features —
        the HF llava default vision_feature_layer/-strategy).
        ``project=False`` returns raw tower features (video paths pool
        spatially BEFORE the projector)."""
        a = self.arch
        ps = a.patch_size
        g = a.image_size // ps
        x = pixel_values.astype(self.dtype)
        # [3, H, W] -> [g*g, 3*ps*ps] with channel-major patch pixels
        # (matches the HF conv kernel reshape above).
        x = x.reshape(3, g, ps, g, ps)
        x = jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(g * g, 3 * ps * ps)
        h = x @ params["patch_w"]
        if a.style == "siglip":
            h = (h + params["patch_b"]) + params["pos"]
        else:
            h = jnp.concatenate([params["cls"], h], axis=0)
            h = h + params["pos"]
            h = layer_norm(h, params["pre_ln_w"], params["pre_ln_b"],
                           a.ln_eps)

        nh = a.num_heads
        d = a.hidden_size
        hd = d // nh
        scale = hd ** -0.5
        act = _VIT_ACTS[a.act]
        if a.style == "siglip":
            n_run = a.num_layers        # features = post-norm last layer
        else:
            n_run = a.num_layers + a.feature_layer + 1  # -2: skip last

        def layer_fn(h, lp):
            res = h
            x = layer_norm(h, lp["ln1_w"], lp["ln1_b"], a.ln_eps)
            qkv = x @ lp["wqkv"] + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            t = q.shape[0]
            q = q.reshape(t, nh, hd).transpose(1, 0, 2)
            k = k.reshape(t, nh, hd).transpose(1, 0, 2)
            v = v.reshape(t, nh, hd).transpose(1, 0, 2)
            s = jnp.einsum("htd,hsd->hts", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("hts,hsd->htd", p, v)
            o = o.transpose(1, 0, 2).reshape(t, d)
            h = res + (o @ lp["wo"] + lp["bo"])
            res = h
            x = layer_norm(h, lp["ln2_w"], lp["ln2_b"], a.ln_eps)
            x = act(x @ lp["fc1_w"] + lp["fc1_b"])
            h = res + (x @ lp["fc2_w"] + lp["fc2_b"])
            return h, None

        sliced = jax.tree.map(lambda x: x[:n_run], params["layers"])
        h, _ = jax.lax.scan(layer_fn, h, sliced)
        if a.style == "siglip":
            feats = (layer_norm(h, params["post_ln_w"],
                                params["post_ln_b"], a.ln_eps)
                     if a.post_ln_feature else h)
        else:
            feats = h[1:]                                   # drop CLS
        if not project:
            return feats        # pre-projector (video pooling paths)
        return self.project(params, feats)

    def project(self, params: dict, feats: jnp.ndarray) -> jnp.ndarray:
        """Apply the multimodal projector to raw tower features."""
        a = self.arch
        if a.projector == "mlp2":
            y = jax.nn.gelu(feats @ params["proj1_w"] + params["proj1_b"],
                            approximate=False)
            y = y @ params["proj2_w"] + params["proj2_b"]
        elif a.projector == "linear":
            y = feats @ params["proj1_w"] + params["proj1_b"]
        else:
            y = feats
        if a.proj_scale != 1.0:
            y = y * a.proj_scale
        return y
