"""Qwen2-Audio: Whisper-style audio encoder + linear projector + Qwen2
language tower.

Reference: vllm/model_executor/models/qwen2_audio.py; math mirrors HF
modeling_qwen2_audio.Qwen2AudioEncoder — two GELU convs (stride 1 then
2), fixed sinusoidal positions (shipped as a weight), pre-LN whisper
layers, an AvgPool1d(2) and a final LayerNorm.  Audio placeholder tokens
are expanded to ``max_source_positions // 2`` feature rows and spliced by
the engine's multimodal path (``multi_modal_data={"audio": mel}`` with
mel [num_mel_bins, max_source_positions * 2]).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, Qwen2Arch
from .vision import layer_norm


@dataclass
class AudioEncoderArch:
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    num_mel_bins: int = 128
    max_source_positions: int = 1500


class Qwen2AudioModel:
    architecture = "llava"     # rides the multimodal splice path

    def __init__(self, text_arch: Qwen2Arch, audio_arch: AudioEncoderArch,
                 audio_token_id: int, dtype=jnp.bfloat16):
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.audio_arch = audio_arch
        self.image_token_id = audio_token_id   # engine placeholder id
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "Qwen2AudioModel":
        ac = cfg["audio_config"]
        audio = AudioEncoderArch(
            d_model=ac["d_model"],
            num_layers=ac["encoder_layers"],
            num_heads=ac["encoder_attention_heads"],
            ffn_dim=ac["encoder_ffn_dim"],
            num_mel_bins=ac.get("num_mel_bins", 128),
            max_source_positions=ac.get("max_source_positions", 1500))
        text = Qwen2Arch.from_hf_config(cfg["text_config"])
        return cls(text, audio, cfg.get("audio_token_index", 151646),
                   dtype=dtype)

    @property
    def num_image_tokens(self) -> int:
        return self.audio_arch.max_source_positions // 2

    def validate_image(self, mel: np.ndarray) -> np.ndarray:
        a = self.audio_arch
        want = (a.num_mel_bins, 2 * a.max_source_positions)
        if mel.shape != want:
            raise ValueError(f"expected mel features {want} (pad the log-"
                             f"mel spectrogram), got {mel.shape}")
        return mel

    def num_image_tokens_for(self, mel) -> int:
        return self.num_image_tokens

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = self.language.init_params(seed, as_numpy=as_numpy)
        a = self.audio_arch
        rng = np.random.default_rng(seed + 1)

        def w(*shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02

        def zeros(*shape):
            return np.zeros(shape, np.float32)

        def ones(*shape):
            return np.ones(shape, np.float32)

        d, f, L = a.d_model, a.ffn_dim, a.num_layers
        audio = {
            "conv1_w": w(3, a.num_mel_bins, d), "conv1_b": zeros(d),
            "conv2_w": w(3, d, d), "conv2_b": zeros(d),
            "pos": w(a.max_source_positions, d),
            "final_ln_w": ones(d), "final_ln_b": zeros(d),
            "layers": {
                "attn_ln_w": ones(L, d), "attn_ln_b": zeros(L, d),
                "wq": w(L, d, d), "bq": zeros(L, d),
                "wk": w(L, d, d),
                "wv": w(L, d, d), "bv": zeros(L, d),
                "wo": w(L, d, d), "bo": zeros(L, d),
                "ffn_ln_w": ones(L, d), "ffn_ln_b": zeros(L, d),
                "fc1_w": w(L, d, f), "fc1_b": zeros(L, f),
                "fc2_w": w(L, f, d), "fc2_b": zeros(L, d),
            },
            "proj_w": w(d, self.arch.hidden_size),
            "proj_b": zeros(self.arch.hidden_size),
        }
        params["audio"] = (audio if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), audio))
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        a = self.audio_arch
        lang = {}
        for k, v in tensors.items():
            if k.startswith("model.language_model."):
                lang["model." + k[len("model.language_model."):]] = v
            elif k.startswith("language_model."):
                lang[k[len("language_model."):]] = v
        params = self.language.load_hf_state_dict(lang, as_numpy=as_numpy)

        def t(name):
            return np.asarray(tensors.get("audio_tower." + name,
                                          tensors.get("model.audio_tower."
                                                      + name)))

        L = a.num_layers
        acc = {k: [] for k in ("attn_ln_w", "attn_ln_b", "wq", "bq", "wk",
                               "wv", "bv", "wo", "bo", "ffn_ln_w",
                               "ffn_ln_b", "fc1_w", "fc1_b", "fc2_w",
                               "fc2_b")}
        for li in range(L):
            p = f"layers.{li}."
            acc["attn_ln_w"].append(t(p + "self_attn_layer_norm.weight"))
            acc["attn_ln_b"].append(t(p + "self_attn_layer_norm.bias"))
            acc["wq"].append(t(p + "self_attn.q_proj.weight").T)
            acc["bq"].append(t(p + "self_attn.q_proj.bias"))
            acc["wk"].append(t(p + "self_attn.k_proj.weight").T)
            acc["wv"].append(t(p + "self_attn.v_proj.weight").T)
            acc["bv"].append(t(p + "self_attn.v_proj.bias"))
            acc["wo"].append(t(p + "self_attn.out_proj.weight").T)
            acc["bo"].append(t(p + "self_attn.out_proj.bias"))
            acc["ffn_ln_w"].append(t(p + "final_layer_norm.weight"))
            acc["ffn_ln_b"].append(t(p + "final_layer_norm.bias"))
            acc["fc1_w"].append(t(p + "fc1.weight").T)
            acc["fc1_b"].append(t(p + "fc1.bias"))
            acc["fc2_w"].append(t(p + "fc2.weight").T)
            acc["fc2_b"].append(t(p + "fc2.bias"))
        proj_w = tensors.get("multi_modal_projector.linear.weight",
                             tensors.get("model.multi_modal_projector"
                                         ".linear.weight"))
        proj_b = tensors.get("multi_modal_projector.linear.bias",
                             tensors.get("model.multi_modal_projector"
                                         ".linear.bias"))
        audio = {
            # HF Conv1d weight [out, in, k] -> [k, in, out] taps.
            "conv1_w": np.transpose(t("conv1.weight"), (2, 1, 0)),
            "conv1_b": t("conv1.bias"),
            "conv2_w": np.transpose(t("conv2.weight"), (2, 1, 0)),
            "conv2_b": t("conv2.bias"),
            "pos": t("embed_positions.weight"),
            "final_ln_w": t("layer_norm.weight"),
            "final_ln_b": t("layer_norm.bias"),
            "layers": {k: np.stack(v) for k, v in acc.items()},
            "proj_w": np.asarray(proj_w).T,
            "proj_b": np.asarray(proj_b),
        }
        params["audio"] = (audio if as_numpy else jax.tree.map(
            lambda x: jnp.asarray(x, self.dtype), audio))
        return params

    # ---- audio encoder ----------------------------------------------------

    @staticmethod
    def _conv1d(x, w, b, stride):
        """x [T, Cin], w [k=3, Cin, Cout], padding 1."""
        xp = jnp.pad(x, ((1, 1), (0, 0)))
        t_out = (x.shape[0] + 2 - 3) // stride + 1
        idx = jnp.arange(t_out) * stride
        window = jnp.stack([xp[idx + j] for j in range(3)], axis=1)
        return jnp.einsum("tki,kio->to", window, w) + b

    def encode_image(self, params: dict, mel) -> jnp.ndarray:
        """mel [num_mel_bins, 2 * max_source_positions] ->
        [max_source_positions // 2, text_hidden]."""
        a = self.audio_arch
        ap = params["audio"]
        x = mel.astype(self.dtype).T                       # [T, mel]
        x = jax.nn.gelu(self._conv1d(x, ap["conv1_w"], ap["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(self._conv1d(x, ap["conv2_w"], ap["conv2_b"], 2),
                        approximate=False)
        h = x + ap["pos"]
        nh, d = a.num_heads, a.d_model
        hd = d // nh
        scale = hd ** -0.5

        def layer_fn(h, lp):
            res = h
            x = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"])
            t = x.shape[0]
            # Whisper attention: q scaled, k WITHOUT bias.
            q = ((x @ lp["wq"] + lp["bq"]) * scale).reshape(t, nh, hd)
            k = (x @ lp["wk"]).reshape(t, nh, hd)
            v = (x @ lp["wv"] + lp["bv"]).reshape(t, nh, hd)
            s = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                           k.astype(jnp.float32))
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, v.astype(jnp.float32))
            h = res + (o.reshape(t, d).astype(h.dtype) @ lp["wo"]
                       + lp["bo"])
            res = h
            x = layer_norm(h, lp["ffn_ln_w"], lp["ffn_ln_b"])
            x = jax.nn.gelu(x @ lp["fc1_w"] + lp["fc1_b"],
                            approximate=False)
            return res + (x @ lp["fc2_w"] + lp["fc2_b"]), None

        h, _ = jax.lax.scan(layer_fn, h, ap["layers"])
        # AvgPool1d(2, stride 2) over time, then the final LayerNorm.
        h = h.reshape(h.shape[0] // 2, 2, d).mean(axis=1)
        h = layer_norm(h, ap["final_ln_w"], ap["final_ln_b"])
        return h @ ap["proj_w"] + ap["proj_b"]

    # ---- delegation -------------------------------------------------------

    def forward_hidden(self, params, *args, **kw):
        return self.language.forward_hidden(params, *args, **kw)

    def embed(self, params, token_ids):
        return self.language.embed(params, token_ids)

    def logits(self, params, hidden):
        return self.language.logits(params, hidden)

    def param_bytes(self) -> int:
        a = self.audio_arch
        enc = a.num_layers * (4 * a.d_model ** 2
                              + 2 * a.d_model * a.ffn_dim)
        return (self.language.param_bytes()
                + enc * jnp.dtype(self.dtype).itemsize)

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        return self.language.kv_bytes_per_token(kv_dtype)
