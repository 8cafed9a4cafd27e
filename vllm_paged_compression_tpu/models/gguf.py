"""GGUF checkpoint loading (pure Python, no gguf library).

Reference analog: vllm/model_executor/model_loader/loader.py GGUFModelLoader
+ config/tokenizer extraction in vllm/transformers_utils/config.py (both via
the `gguf` package, absent from this image).  Implements the GGUF v2/v3
binary format directly: header, typed metadata KVs, tensor infos, aligned
data section; dequantizes the common ggml tensor codecs (F32, F16, BF16,
Q8_0, Q4_0, Q4_1) AND the 256-element super-block k-quants (Q4_K, Q5_K,
Q6_K — the formats real GGUF releases actually ship; reference analog
csrc/quantization/gguf/gguf_kernel.cu with the layout tables from
ggml-common.h) to fp32 numpy in the HF layout, and rebuilds an HF-style
config dict from the llama.* metadata keys.

Q2_K/Q3_K (and the i-quants) are not implemented — loading one raises
with a clear message (re-export as Q4_K/Q6_K/Q8_0).
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32 = 0, 1, 2, 3, 4, 5
_T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = (
    6, 7, 8, 9, 10, 11, 12)

_SCALAR_FMT = {_T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
               _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_U64: "<Q",
               _T_I64: "<q", _T_F64: "<d"}

# ggml tensor types
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 12, 13, 14
GGML_BF16 = 30

_QK = 32    # block size of the classic quants
_QK_K = 256  # super-block size of the k-quants


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _SCALAR_FMT:
        fmt = _SCALAR_FMT[vtype]
        (v,) = struct.unpack(fmt, f.read(struct.calcsize(fmt)))
        return v
    if vtype == _T_BOOL:
        return bool(f.read(1)[0])
    if vtype == _T_STR:
        return _read_str(f)
    if vtype == _T_ARR:
        (etype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown GGUF metadata type {vtype}")


def _dequant(data: bytes, ggml_type: int, n_elems: int) -> np.ndarray:
    if ggml_type == GGML_F32:
        return np.frombuffer(data, np.float32, n_elems).copy()
    if ggml_type == GGML_F16:
        return np.frombuffer(data, np.float16, n_elems).astype(np.float32)
    if ggml_type == GGML_BF16:
        raw = np.frombuffer(data, np.uint16, n_elems).astype(np.uint32)
        return (raw << 16).view(np.float32).copy()
    nb = n_elems // _QK
    if ggml_type == GGML_Q8_0:  # d f16 + 32 x i8
        rec = np.frombuffer(data, np.dtype([("d", "<f2"),
                                            ("q", "i1", (_QK,))]), nb)
        return (rec["d"].astype(np.float32)[:, None]
                * rec["q"].astype(np.float32)).reshape(-1)
    if ggml_type == GGML_Q4_0:  # d f16 + 16 bytes of nibbles; w = d*(q-8)
        rec = np.frombuffer(data, np.dtype([("d", "<f2"),
                                            ("q", "u1", (_QK // 2,))]), nb)
        lo = (rec["q"] & 0xF).astype(np.float32) - 8.0
        hi = (rec["q"] >> 4).astype(np.float32) - 8.0
        q = np.concatenate([lo, hi], axis=1)  # ggml: low nibbles first half
        return (rec["d"].astype(np.float32)[:, None] * q).reshape(-1)
    if ggml_type == GGML_Q4_1:  # d f16, m f16, nibbles; w = d*q + m
        rec = np.frombuffer(data, np.dtype([("d", "<f2"), ("m", "<f2"),
                                            ("q", "u1", (_QK // 2,))]), nb)
        lo = (rec["q"] & 0xF).astype(np.float32)
        hi = (rec["q"] >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)
        return (rec["d"].astype(np.float32)[:, None] * q
                + rec["m"].astype(np.float32)[:, None]).reshape(-1)
    nbk = n_elems // _QK_K
    if ggml_type == GGML_Q4_K:
        return _dequant_q4_k(data, nbk)
    if ggml_type == GGML_Q5_K:
        return _dequant_q5_k(data, nbk)
    if ggml_type == GGML_Q6_K:
        return _dequant_q6_k(data, nbk)
    raise NotImplementedError(
        f"ggml tensor type {ggml_type} is not supported; re-export the "
        "GGUF as Q4_K / Q5_K / Q6_K / Q8_0 / Q4_0 / F16")


def _k_scale_min(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the Q4_K/Q5_K 6-bit sub-block (scale, min) pairs from the
    12-byte packed array (ggml-common.h get_scale_min_k4): sub-blocks
    0-3 use the low 6 bits of bytes j / j+4; sub-blocks 4-7 splice the
    low nibble of bytes j+4 with the top 2 bits of bytes j-4 / j."""
    nb = scales.shape[0]
    sc = np.empty((nb, 8), np.float32)
    mn = np.empty((nb, 8), np.float32)
    s = scales
    for j in range(4):
        sc[:, j] = s[:, j] & 63
        mn[:, j] = s[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s[:, j + 4] & 0xF) | ((s[:, j - 4] >> 6) << 4)
        mn[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc, mn


def _dequant_q4_k(data: bytes, nb: int) -> np.ndarray:
    """Q4_K: 256-elem super-block = f16 d, f16 dmin, 12B packed 6-bit
    scales/mins (8 sub-blocks of 32), 128B nibbles.  w = d·sc·q − dmin·m;
    each 32-byte quarter holds 64 elems: low nibbles first 32, high
    nibbles next 32 (sub-blocks 2j, 2j+1)."""
    rec = np.frombuffer(data, np.dtype([
        ("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (12,)),
        ("qs", "u1", (128,))]), nb)
    sc, mn = _k_scale_min(rec["scales"])
    d = rec["d"].astype(np.float32)[:, None, None, None]
    dmin = rec["dmin"].astype(np.float32)[:, None, None, None]
    qs = rec["qs"].reshape(nb, 4, 32)
    q = np.stack([qs & 0xF, qs >> 4], axis=2).astype(np.float32)
    scs = sc.reshape(nb, 4, 2)[..., None]
    mns = mn.reshape(nb, 4, 2)[..., None]
    return (d * scs * q - dmin * mns).reshape(-1)


def _dequant_q5_k(data: bytes, nb: int) -> np.ndarray:
    """Q5_K: Q4_K layout plus 32B of 5th bits — sub-block s's high bit is
    bit s of each qh byte."""
    rec = np.frombuffer(data, np.dtype([
        ("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (12,)),
        ("qh", "u1", (32,)), ("qs", "u1", (128,))]), nb)
    sc, mn = _k_scale_min(rec["scales"])
    d = rec["d"].astype(np.float32)[:, None, None, None]
    dmin = rec["dmin"].astype(np.float32)[:, None, None, None]
    qs = rec["qs"].reshape(nb, 4, 32)
    q4 = np.stack([qs & 0xF, qs >> 4], axis=2).astype(np.float32)
    qh = rec["qh"]                                       # [nb, 32]
    hbit = np.stack([(qh >> s) & 1 for s in range(8)],
                    axis=1).reshape(nb, 4, 2, 32).astype(np.float32)
    q = q4 + 16.0 * hbit
    scs = sc.reshape(nb, 4, 2)[..., None]
    mns = mn.reshape(nb, 4, 2)[..., None]
    return (d * scs * q - dmin * mns).reshape(-1)


def _dequant_q6_k(data: bytes, nb: int) -> np.ndarray:
    """Q6_K: 128B low nibbles + 64B 2-bit highs + 16 int8 sub-block
    scales (16 sub-blocks of 16) + f16 d.  q = ((ql | qh<<4) − 32);
    w = d·scale[sub]·q.  Per 128-elem half, the 4 interleaved 32-elem
    groups take qh bit-pairs 0/2/4/6 and scale strides 2·g + l//16."""
    rec = np.frombuffer(data, np.dtype([
        ("ql", "u1", (128,)), ("qh", "u1", (64,)),
        ("scales", "i1", (16,)), ("d", "<f2")]), nb)
    d = rec["d"].astype(np.float32)
    ql = rec["ql"].reshape(nb, 2, 64)
    qh = rec["qh"].reshape(nb, 2, 32)
    sc = rec["scales"].reshape(nb, 2, 8).astype(np.float32)
    ql_lo, ql_hi = ql & 0xF, ql >> 4
    hb = np.stack([(qh >> (2 * k)) & 3 for k in range(4)],
                  axis=2)                                 # [nb, 2, 4, 32]
    q = np.empty((nb, 2, 4, 32), np.float32)
    q[:, :, 0] = ql_lo[:, :, :32] | (hb[:, :, 0] << 4)
    q[:, :, 1] = ql_lo[:, :, 32:] | (hb[:, :, 1] << 4)
    q[:, :, 2] = ql_hi[:, :, :32] | (hb[:, :, 2] << 4)
    q[:, :, 3] = ql_hi[:, :, 32:] | (hb[:, :, 3] << 4)
    q -= 32.0
    idx = 2 * np.arange(4)[:, None] + np.arange(32)[None, :] // 16
    scl = sc[:, :, idx]                                   # [nb, 2, 4, 32]
    return (d[:, None, None, None] * scl * q).reshape(-1)


def _type_size(ggml_type: int, n_elems: int) -> int:
    if ggml_type == GGML_F32:
        return 4 * n_elems
    if ggml_type in (GGML_F16, GGML_BF16):
        return 2 * n_elems
    nb = n_elems // _QK
    if ggml_type == GGML_Q8_0:
        return nb * (2 + _QK)
    if ggml_type == GGML_Q4_0:
        return nb * (2 + _QK // 2)
    if ggml_type == GGML_Q4_1:
        return nb * (4 + _QK // 2)
    nbk = n_elems // _QK_K
    if ggml_type == GGML_Q4_K:
        return nbk * 144   # 2 + 2 + 12 + 128
    if ggml_type == GGML_Q5_K:
        return nbk * 176   # 2 + 2 + 12 + 32 + 128
    if ggml_type == GGML_Q6_K:
        return nbk * 210   # 128 + 64 + 16 + 2
    raise NotImplementedError(
        f"ggml tensor type {ggml_type} is not supported; re-export the "
        "GGUF as Q4_K / Q5_K / Q6_K / Q8_0 / Q4_0 / F16")


def read_gguf(path: str, meta_only: bool = False
              ) -> tuple[dict, dict[str, np.ndarray]]:
    """Parse a .gguf file -> (metadata dict, {ggml name: fp32 array}).

    Arrays come back row-major over reversed ggml dims, which for 2-D
    weights is the HF [out_features, in_features] layout."""
    meta: dict[str, Any] = {}
    tensors: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        if version < 2:
            raise ValueError(f"GGUF v{version} (need >= 2)")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)
        if meta_only:
            return meta, tensors
        infos = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (nd,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
            gtype, offset = struct.unpack("<IQ", f.read(12))
            infos.append((name, dims, gtype, offset))
        align = int(meta.get("general.alignment", 32))
        base = (f.tell() + align - 1) // align * align
        for name, dims, gtype, offset in infos:
            n_elems = 1
            for d in dims:
                n_elems *= int(d)
            f.seek(base + offset)
            data = f.read(_type_size(gtype, n_elems))
            arr = _dequant(data, gtype, n_elems)
            # ggml dims are innermost-first; numpy shape is the reverse.
            tensors[name] = arr.reshape(tuple(int(d)
                                              for d in reversed(dims)))
    return meta, tensors


def _reverse_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Undo llama.cpp's rope permutation of q/k rows (transformers'
    gguf conversion applies the same inverse)."""
    out_f, in_f = w.shape
    return (w.reshape(n_head, 2, out_f // n_head // 2, in_f)
            .swapaxes(1, 2).reshape(out_f, in_f))


_NAME_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}

_BLK_MAP = {
    "attn_norm.weight": "input_layernorm.weight",
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_output.weight": "self_attn.o_proj.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
}


def load_gguf_checkpoint(path: str) -> tuple[dict, dict[str, np.ndarray]]:
    """.gguf file -> (HF-style config dict, HF-named fp32 state dict)."""
    meta, gg = read_gguf(path)
    arch = meta.get("general.architecture", "llama")

    def m(key, default=None):
        return meta.get(f"{arch}.{key}", default)

    n_head = int(m("attention.head_count"))
    n_kv = int(m("attention.head_count_kv", n_head))
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": int(m("embedding_length")),
        "intermediate_size": int(m("feed_forward_length")),
        "num_hidden_layers": int(m("block_count")),
        "num_attention_heads": n_head,
        "num_key_value_heads": n_kv,
        "max_position_embeddings": int(m("context_length", 4096)),
        "rope_theta": float(m("rope.freq_base", 10000.0)),
        "rms_norm_eps": float(m("attention.layer_norm_rms_epsilon", 1e-5)),
        "vocab_size": int(gg["token_embd.weight"].shape[0]),
        "tie_word_embeddings": "output.weight" not in gg,
        "eos_token_id": meta.get("tokenizer.ggml.eos_token_id"),
        "bos_token_id": meta.get("tokenizer.ggml.bos_token_id"),
    }

    out: dict[str, np.ndarray] = {}
    for name, w in gg.items():
        if name in _NAME_MAP:
            out[_NAME_MAP[name]] = w
            continue
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            hf = _BLK_MAP.get(rest)
            if hf is None:
                continue
            if rest == "attn_q.weight":
                w = _reverse_permute(w, n_head)
            elif rest == "attn_k.weight":
                w = _reverse_permute(w, n_kv)
            out[f"model.layers.{idx}.{hf}"] = w
    return hf_cfg, out


def tokenizer_from_gguf_meta(meta: dict):
    """GGUF embeds its tokenizer: for sentencepiece-style models
    (tokenizer.ggml.model == "llama"), rebuild the in-tree
    SentencePieceTokenizer from the tokens/scores/token_type arrays
    (types use the sentencepiece enum: 1 normal, 2 unknown, 3 control,
    6 byte).  Returns None for BPE-merges ("gpt2") tokenizers."""
    if meta.get("tokenizer.ggml.model") != "llama":
        return None
    tokens = meta.get("tokenizer.ggml.tokens")
    if not tokens:
        return None
    scores = meta.get("tokenizer.ggml.scores") or [0.0] * len(tokens)
    types = meta.get("tokenizer.ggml.token_type") or [1] * len(tokens)
    from ..engine.sp_tokenizer import (SentencePieceTokenizer, SpModel,
                                       _Piece)
    m = SpModel(pieces=[_Piece(p, float(s), int(t))
                        for p, s, t in zip(tokens, scores, types)],
                model_type=1, byte_fallback=any(t == 6 for t in types),
                add_dummy_prefix=True,
                unk_id=int(meta.get("tokenizer.ggml.unknown_token_id",
                                    0)),
                # llama-family spm ships the identity normalizer with
                # remove_extra_whitespaces off; GGUF metadata does not
                # carry the NormalizerSpec, so mirror that convention.
                normalizer="identity", remove_extra_ws=False)
    return SentencePieceTokenizer(m)


def find_gguf_file(model_path: str) -> str | None:
    """model_path is a .gguf file itself, or a directory holding one."""
    if model_path.endswith(".gguf") and os.path.isfile(model_path):
        return model_path
    if os.path.isdir(model_path):
        ggufs = sorted(f for f in os.listdir(model_path)
                       if f.endswith(".gguf"))
        if ggufs:
            return os.path.join(model_path, ggufs[0])
    return None
