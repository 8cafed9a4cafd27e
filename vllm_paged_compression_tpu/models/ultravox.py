"""Ultravox: Whisper encoder + frame-stacking SwiGLU projector + Llama
text tower.

Reference: vllm/model_executor/models/ultravox.py.  The audio tower is a
standard Whisper encoder (same layer math and checkpoint names as
Qwen2-Audio's tower, minus the avg pooler); the projector stacks
``stack_factor`` consecutive frames, RMS-norms, projects through a
FLIPPED SwiGLU (silu on the second half gating the first,
ultravox.py:203-209) and RMS-norms again.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaArch, LlamaModel, rms_norm
from .qwen2_audio import AudioEncoderArch, Qwen2AudioModel
from .vision import layer_norm


class UltravoxModel(Qwen2AudioModel):
    architecture = "llava"

    def __init__(self, text_arch: LlamaArch, audio_arch: AudioEncoderArch,
                 audio_token_id: int, stack_factor: int,
                 projector_act: str, dtype=jnp.bfloat16):
        # Reuse the Qwen2-Audio tower param machinery; the language tower
        # arch class differs per checkpoint (llama-family).
        self.language = LlamaModel(text_arch, dtype=dtype)
        self.arch = text_arch
        self.audio_arch = audio_arch
        self.image_token_id = audio_token_id
        self.stack_factor = stack_factor
        self.projector_act = projector_act
        self.dtype = dtype

    @classmethod
    def from_hf_config(cls, cfg: dict, dtype=jnp.bfloat16
                       ) -> "UltravoxModel":
        ac = cfg["audio_config"]
        audio = AudioEncoderArch(
            d_model=ac["d_model"],
            num_layers=ac["encoder_layers"],
            num_heads=ac["encoder_attention_heads"],
            ffn_dim=ac["encoder_ffn_dim"],
            num_mel_bins=ac.get("num_mel_bins", 128),
            max_source_positions=ac.get("max_source_positions", 1500))
        text = LlamaArch.from_hf_config(cfg["text_config"])
        model = cls(text, audio, cfg.get("audio_token_index", 128256),
                    cfg.get("stack_factor", 8),
                    cfg.get("projector_act", "swiglu"), dtype=dtype)
        model.projector_hidden = cfg.get(
            "hidden_size", audio.d_model * model.stack_factor)
        return model

    @property
    def num_image_tokens(self) -> int:
        t_enc = self.audio_arch.max_source_positions
        return -(-t_enc // self.stack_factor)

    # ---- params ---------------------------------------------------------

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        params = super().init_params(seed, as_numpy=as_numpy)
        a = self.audio_arch
        rng = np.random.default_rng(seed + 3)
        din = a.d_model * self.stack_factor
        hid = getattr(self, "projector_hidden", din)
        mid = hid // 2 if self.projector_act == "swiglu" else hid

        def w(*shape):
            arr = rng.standard_normal(shape).astype(np.float32) * 0.02
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        def ones(n):
            arr = np.ones(n, np.float32)
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        audio = dict(params["audio"])
        audio.pop("proj_w", None)
        audio.pop("proj_b", None)
        audio.update({
            "ln_pre": ones(din),
            "p1_w": w(din, hid),
            "p2_w": w(mid, self.arch.hidden_size),
            "ln_post": ones(self.arch.hidden_size),
        })
        params["audio"] = audio
        return params

    def load_hf_state_dict(self, tensors: dict, as_numpy: bool = False
                           ) -> dict:
        t = dict(tensors)
        # Satisfy the parent loader's projector lookup, then replace it
        # with the Ultravox stacking projector weights.
        d = self.audio_arch.d_model
        t.setdefault("multi_modal_projector.linear.weight",
                     np.zeros((self.arch.hidden_size, d), np.float32))
        t.setdefault("multi_modal_projector.linear.bias",
                     np.zeros(self.arch.hidden_size, np.float32))
        params = super().load_hf_state_dict(t, as_numpy=as_numpy)

        def g(name):
            return np.asarray(tensors["multi_modal_projector." + name])

        leaf = (np.asarray if as_numpy
                else lambda x: jnp.asarray(x, self.dtype))
        audio = dict(params["audio"])
        audio.pop("proj_w", None)
        audio.pop("proj_b", None)
        audio.update({
            "ln_pre": leaf(g("ln_pre.weight")),
            "p1_w": leaf(g("linear_1.weight").T),
            "p2_w": leaf(g("linear_2.weight").T),
            "ln_post": leaf(g("ln_post.weight")),
        })
        params["audio"] = audio
        return params

    # ---- audio path -------------------------------------------------------

    def encode_image(self, params: dict, mel) -> jnp.ndarray:
        """mel [mel_bins, 2 * max_source_positions] ->
        [ceil(T_enc / stack), text_hidden]."""
        a = self.audio_arch
        ap = params["audio"]
        x = mel.astype(self.dtype).T
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
        h = layer_norm(h, ap["final_ln_w"], ap["final_ln_b"])
        # Stack `stack_factor` consecutive frames (zero-padded tail).
        sf = self.stack_factor
        t = h.shape[0]
        t_pad = -(-t // sf) * sf
        h = jnp.pad(h, ((0, t_pad - t), (0, 0)))
        h = h.reshape(t_pad // sf, sf * d)
        h = rms_norm(h, ap["ln_pre"], 1e-6)
        h = h @ ap["p1_w"]
        if self.projector_act == "swiglu":
            half = h.shape[-1] // 2
            # FLIPPED SwiGLU: silu of the SECOND half gates the first.
            h = h[..., :half] * jax.nn.silu(h[..., half:])
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = h @ ap["p2_w"]
        return rms_norm(h, ap["ln_post"], 1e-6)
