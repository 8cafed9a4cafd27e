"""Chameleon: VQ-VAE image tokenizer + Llama trunk with per-head q/k
LayerNorms.

Reference: vllm/model_executor/models/chameleon.py; math mirrors HF
modeling_chameleon.  Unlike every other multimodal family here, images
become DISCRETE vocabulary tokens (VQGAN codes mapped through the
IMGIMG vocabulary map), so serving needs no embedding splice: the engine
substitutes the placeholder with the encoded ids and the request becomes
a plain text request — paged eviction, prefix caching and speculative
decoding all apply unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel


class ChameleonArch(LlamaArch):
    """Llama trunk + q/k LayerNorm with PER-HEAD affine (HF
    ChameleonLayerNorm: normalization over head_dim, weights [H, hd])."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "ChameleonArch":
        a = super().from_hf_config(cfg)
        a.qk_norm = True
        a.qk_norm_type = "layernorm"
        if cfg.get("swin_norm"):
            raise NotImplementedError("Chameleon swin_norm variant")
        return a


def _conv(x, w, b, stride=1, padding=1):
    """x [C, H, W], w [O, I, kh, kw] (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    return y + b[:, None, None]


def _group_norm(x, w, b, groups=32, eps=1e-6):
    c, h, wd = x.shape
    g = x.reshape(groups, c // groups, h, wd).astype(jnp.float32)
    mu = g.mean(axis=(1, 2, 3), keepdims=True)
    var = g.var(axis=(1, 2, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return (g.reshape(c, h, wd) * w[:, None, None] + b[:, None, None]
            ).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


class ChameleonModel:
    architecture = "llava"       # multimodal-capable (token substitution)

    def __init__(self, arch: ChameleonArch, vq_cfg: dict,
                 vocabulary_map: dict, dtype=jnp.bfloat16):
        self.language = LlamaModel(arch, dtype=dtype)
        self.arch = arch
        self.vq_cfg = vq_cfg
        self.dtype = dtype
        self.image_token_id = vocabulary_map.get("<image>", -1)
        # IMGIMG<digits-as-letters>Z name -> vq code; invert to code->bpe
        # (HF ChameleonImageVocabularyMapping).
        chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
        img2bpe = {}
        for name, tok in vocabulary_map.items():
            if name.startswith("IMGIMG"):
                code = int("".join(chr_map.get(c, c)
                                   for c in name[len("IMGIMG"):-1]))
                img2bpe[code] = tok
        table = np.zeros(max(img2bpe) + 1 if img2bpe else 1, np.int32)
        for k, v in img2bpe.items():
            table[k] = v
        self._img2bpe = table
        # HF ChameleonForConditionalGeneration masks image-token logits to
        # dtype-min: text generation can never emit VQ codes.
        mask = np.zeros(arch.vocab_size, bool)
        for tok in img2bpe.values():
            if tok < arch.vocab_size:
                mask[tok] = True
        self._img_logit_mask = jnp.asarray(mask)
        self._encode_jit = None

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "ChameleonModel":
        return cls(ChameleonArch.from_hf_config(cfg),
                   dict(cfg.get("vq_config") or {}),
                   dict(cfg.get("vocabulary_map") or {}), dtype=dtype)

    # ---- params ---------------------------------------------------------

    def _vq_dims(self):
        vc = self.vq_cfg
        base = vc.get("base_channels", 128)
        mult = tuple(vc.get("channel_multiplier", [1, 1, 2, 2, 4]))
        return base, mult, vc.get("num_res_blocks", 2), \
            vc.get("latent_channels", 256), vc.get("embed_dim", 256), \
            vc.get("num_embeddings", 8192), \
            tuple(vc.get("attn_resolutions") or ()), \
            vc.get("resolution", 512)

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        rng = np.random.default_rng(seed + 1)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.05

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

        base, mult, nrb, latent, embed, ncodes, attn_res, res = \
            self._vq_dims()

        def resblock(cin, cout):
            p = {"n1_w": ones(cin), "n1_b": zeros(cin),
                 "c1_w": w(cout, cin, 3, 3), "c1_b": zeros(cout),
                 "n2_w": ones(cout), "n2_b": zeros(cout),
                 "c2_w": w(cout, cout, 3, 3), "c2_b": zeros(cout)}
            if cin != cout:
                p["nin_w"] = w(cout, cin, 1, 1)
                p["nin_b"] = zeros(cout)
            return p

        def attnblock(c):
            return {"n_w": ones(c), "n_b": zeros(c),
                    "q_w": w(c, c, 1, 1), "q_b": zeros(c),
                    "k_w": w(c, c, 1, 1), "k_b": zeros(c),
                    "v_w": w(c, c, 1, 1), "v_b": zeros(c),
                    "o_w": w(c, c, 1, 1), "o_b": zeros(c)}

        levels = []
        cin = base
        cur = res
        in_mult = (1,) + mult
        for i, m in enumerate(mult):
            blocks, attns = [], []
            block_in = base * in_mult[i]
            block_out = base * m
            for _ in range(nrb):
                blocks.append(resblock(block_in, block_out))
                block_in = block_out
                if cur in attn_res:
                    attns.append(attnblock(block_in))
            lvl = {"blocks": blocks, "attns": attns}
            if i != len(mult) - 1:
                lvl["down_w"] = w(block_in, block_in, 3, 3)
                lvl["down_b"] = zeros(block_in)
                cur //= 2
            levels.append(lvl)
        cin = base * mult[-1]
        vq = {
            "conv_in_w": w(base, 3, 3, 3), "conv_in_b": zeros(base),
            "levels": levels,
            "mid1": resblock(cin, cin), "mid_attn": attnblock(cin),
            "mid2": resblock(cin, cin),
            "norm_out_w": ones(cin), "norm_out_b": zeros(cin),
            "conv_out_w": w(latent, cin, 3, 3), "conv_out_b": zeros(latent),
            "quant_w": w(embed, latent, 1, 1), "quant_b": zeros(embed),
            "codebook": w(ncodes, embed),
        }
        params["vq"] = (vq if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), vq))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        lang = {k: v for k, v in tensors.items()
                if not k.startswith("model.vqmodel")}
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)

        def t(name):
            return np.asarray(tensors["model.vqmodel." + name])

        base, mult, nrb, latent, embed, ncodes, attn_res, res = \
            self._vq_dims()

        def resblock(p, cin, cout):
            out = {"n1_w": t(p + "norm1.weight"), "n1_b": t(p + "norm1.bias"),
                   "c1_w": t(p + "conv1.weight"), "c1_b": t(p + "conv1.bias"),
                   "n2_w": t(p + "norm2.weight"), "n2_b": t(p + "norm2.bias"),
                   "c2_w": t(p + "conv2.weight"), "c2_b": t(p + "conv2.bias")}
            if cin != cout:
                out["nin_w"] = t(p + "nin_shortcut.weight")
                out["nin_b"] = t(p + "nin_shortcut.bias")
            return out

        def attnblock(p):
            return {"n_w": t(p + "norm.weight"), "n_b": t(p + "norm.bias"),
                    "q_w": t(p + "q.weight"), "q_b": t(p + "q.bias"),
                    "k_w": t(p + "k.weight"), "k_b": t(p + "k.bias"),
                    "v_w": t(p + "v.weight"), "v_b": t(p + "v.bias"),
                    "o_w": t(p + "proj_out.weight"),
                    "o_b": t(p + "proj_out.bias")}

        levels = []
        cur = res
        in_mult = (1,) + mult
        for i, m in enumerate(mult):
            blocks, attns = [], []
            block_in = base * in_mult[i]
            block_out = base * m
            for j in range(nrb):
                pfx = f"encoder.down.{i}.block.{j}."
                blocks.append(resblock(pfx, block_in, block_out))
                block_in = block_out
                if cur in attn_res:
                    attns.append(attnblock(f"encoder.down.{i}.attn.{j}."))
            lvl = {"blocks": blocks, "attns": attns}
            if i != len(mult) - 1:
                lvl["down_w"] = t(f"encoder.down.{i}.downsample.conv"
                                  ".weight")
                lvl["down_b"] = t(f"encoder.down.{i}.downsample.conv.bias")
                cur //= 2
            levels.append(lvl)
        cin = base * mult[-1]
        vq = {
            "conv_in_w": t("encoder.conv_in.weight"),
            "conv_in_b": t("encoder.conv_in.bias"),
            "levels": levels,
            "mid1": resblock("encoder.mid.block_1.", cin, cin),
            "mid_attn": attnblock("encoder.mid.attn_1."),
            "mid2": resblock("encoder.mid.block_2.", cin, cin),
            "norm_out_w": t("encoder.norm_out.weight"),
            "norm_out_b": t("encoder.norm_out.bias"),
            "conv_out_w": t("encoder.conv_out.weight"),
            "conv_out_b": t("encoder.conv_out.bias"),
            "quant_w": t("quant_conv.weight"),
            "quant_b": t("quant_conv.bias"),
            "codebook": t("quantize.embedding.weight"),
        }
        params["vq"] = (vq if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), vq))
        return params

    # ---- VQ encode --------------------------------------------------------

    @staticmethod
    def _resblock(p, x):
        r = x
        x = _swish(_group_norm(x, p["n1_w"], p["n1_b"]))
        x = _conv(x, p["c1_w"], p["c1_b"])
        x = _swish(_group_norm(x, p["n2_w"], p["n2_b"]))
        x = _conv(x, p["c2_w"], p["c2_b"])
        if "nin_w" in p:
            r = _conv(r, p["nin_w"], p["nin_b"], padding=0)
        return r + x

    @staticmethod
    def _attnblock(p, x):
        r = x
        h = _group_norm(x, p["n_w"], p["n_b"])
        c, hh, ww = h.shape
        q = _conv(h, p["q_w"], p["q_b"], padding=0).reshape(c, -1).T
        k = _conv(h, p["k_w"], p["k_b"], padding=0).reshape(c, -1)
        v = _conv(h, p["v_w"], p["v_b"], padding=0).reshape(c, -1)
        a = jax.nn.softmax((q.astype(jnp.float32)
                            @ k.astype(jnp.float32)) * (c ** -0.5),
                           axis=1)
        o = (v.astype(jnp.float32) @ a.T).reshape(c, hh, ww).astype(x.dtype)
        return r + _conv(o, p["o_w"], p["o_b"], padding=0)

    def _vq_encode(self, vq, pix):
        """pix [3, R, R] -> flat code indices [latent_hw] (row-major)."""
        x = _conv(pix, vq["conv_in_w"], vq["conv_in_b"])
        n_levels = len(vq["levels"])
        for i, lvl in enumerate(vq["levels"]):
            for j, blk in enumerate(lvl["blocks"]):
                x = self._resblock(blk, x)
                if lvl["attns"]:
                    x = self._attnblock(lvl["attns"][j], x)
            if i != n_levels - 1:
                # Asymmetric (right, bottom) pad then stride-2 conv.
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1)))
                x = _conv(x, lvl["down_w"], lvl["down_b"], stride=2,
                          padding=0)
        x = self._resblock(vq["mid1"], x)
        x = self._attnblock(vq["mid_attn"], x)
        x = self._resblock(vq["mid2"], x)
        x = _swish(_group_norm(x, vq["norm_out_w"], vq["norm_out_b"]))
        x = _conv(x, vq["conv_out_w"], vq["conv_out_b"])
        x = _conv(x, vq["quant_w"], vq["quant_b"], padding=0)
        z = x.reshape(x.shape[0], -1).T.astype(jnp.float32)   # [hw, E]
        cb = vq["codebook"].astype(jnp.float32)               # [N, E]
        d = (jnp.sum(z * z, axis=1, keepdims=True)
             + jnp.sum(cb * cb, axis=1) - 2.0 * z @ cb.T)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    def encode_image_tokens(self, params, pixel_values) -> list[int]:
        """[3, R, R] -> BPE token ids (the engine substitutes these for
        the placeholder; reference ChameleonModel.get_image_tokens)."""
        res = self.vq_cfg.get("resolution", 512)
        if pixel_values.shape != (3, res, res):
            raise ValueError(f"expected pixel_values [3, {res}, {res}], "
                             f"got {pixel_values.shape}")
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, px: self._vq_encode(p["vq"], px))
        codes = np.asarray(self._encode_jit(params,
                                            jnp.asarray(pixel_values,
                                                        jnp.float32)))
        return [int(x) for x in self._img2bpe[codes]]

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def forward_layers(self, params, *args, **kw):
        return self.language.forward_layers(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        y = self.language.logits(params, hidden)
        return jnp.where(self._img_logit_mask,
                         jnp.asarray(jnp.finfo(jnp.float32).min, y.dtype),
                         y)

    def param_bytes(self) -> int:
        return self.language.param_bytes()

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
