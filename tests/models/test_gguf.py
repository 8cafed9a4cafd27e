"""GGUF checkpoint loading: binary format parse, quant-block dequant
(Q8_0 / Q4_0 / Q4_1 / F16 / F32), llama name mapping + q/k rope
un-permute, embedded sentencepiece tokenizer, and an E2E generate.

Reference analog: vllm GGUFModelLoader (model_loader/loader.py) +
tests/models/decoder_only/language/test_gguf.py — there via the `gguf`
package; here the format is parsed directly, so the test writes a GGUF
file byte-by-byte per the spec.
"""

import struct

import numpy as np
import pytest

from vllm_paged_compression_tpu.models.gguf import (
    GGML_F16, GGML_F32, GGML_Q4_0, GGML_Q4_1, GGML_Q8_0, find_gguf_file,
    load_gguf_checkpoint, read_gguf, tokenizer_from_gguf_meta)

_T_U32, _T_F32, _T_STR, _T_ARR, _T_I32 = 4, 6, 8, 9, 5


def _s(text: str) -> bytes:
    b = text.encode()
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, vtype: int, payload: bytes) -> bytes:
    return _s(key) + struct.pack("<I", vtype) + payload


def _kv_u32(key, v):
    return _kv(key, _T_U32, struct.pack("<I", v))


def _kv_f32(key, v):
    return _kv(key, _T_F32, struct.pack("<f", v))


def _kv_str_arr(key, items):
    body = struct.pack("<IQ", _T_STR, len(items)) + b"".join(
        _s(i) for i in items)
    return _kv(key, _T_ARR, body)


def _kv_f32_arr(key, items):
    body = struct.pack("<IQ", _T_F32, len(items)) + struct.pack(
        f"<{len(items)}f", *items)
    return _kv(key, _T_ARR, body)


def _kv_i32_arr(key, items):
    body = struct.pack("<IQ", _T_I32, len(items)) + struct.pack(
        f"<{len(items)}i", *items)
    return _kv(key, _T_ARR, body)


def _q8_0(w: np.ndarray) -> bytes:
    flat = w.reshape(-1, 32)
    out = b""
    for blk in flat:
        d = max(np.abs(blk).max() / 127.0, 1e-8)
        q = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
        out += np.float16(d).tobytes() + q.tobytes()
    return out


def _q4_0(w: np.ndarray) -> bytes:
    flat = w.reshape(-1, 32)
    out = b""
    for blk in flat:
        d = max(np.abs(blk).max() / 7.0, 1e-8)
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        lo, hi = q[:16], q[16:]
        out += np.float16(d).tobytes() + (lo | (hi << 4)).tobytes()
    return out


def _write_gguf(path, kvs: bytes, n_kv: int,
                tensors: list[tuple[str, tuple, int, bytes]]):
    align = 32
    infos = b""
    offset = 0
    for name, dims, gtype, data in tensors:
        infos += _s(name) + struct.pack("<I", len(dims))
        infos += struct.pack(f"<{len(dims)}Q", *dims)
        infos += struct.pack("<IQ", gtype, offset)
        offset += (len(data) + align - 1) // align * align
    head = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), n_kv)
    body = head + kvs + infos
    pad = (-len(body)) % align
    body += b"\0" * pad
    for _, _, _, data in tensors:
        body += data + b"\0" * ((-len(data)) % align)
    with open(path, "wb") as f:
        f.write(body)


class TestDequant:
    def test_q8_0_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((4, 64)).astype(np.float32)
        p = tmp_path / "t.gguf"
        _write_gguf(str(p), _kv_u32("general.alignment", 32), 1,
                    [("x", (64, 4), GGML_Q8_0, _q8_0(w))])
        meta, t = read_gguf(str(p))
        # per-block max error <= d/2 with d = absmax/127
        err = np.abs(t["x"] - w)
        bound = np.abs(w).reshape(-1, 32).max(axis=1) / 127.0 * 0.51 + 1e-7
        assert np.all(err.reshape(-1, 32) <= bound[:, None])

    def test_q4_0_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((2, 64)).astype(np.float32)
        p = tmp_path / "t.gguf"
        _write_gguf(str(p), b"", 0, [("x", (64, 2), GGML_Q4_0, _q4_0(w))])
        _, t = read_gguf(str(p))
        bound = np.abs(w).reshape(-1, 32).max(axis=1) / 7.0 * 0.51 + 1e-7
        assert np.all(np.abs(t["x"] - w).reshape(-1, 32)
                      <= bound[:, None])

    def test_f16_f32(self, tmp_path):
        w = np.arange(64, dtype=np.float32).reshape(2, 32)
        p = tmp_path / "t.gguf"
        _write_gguf(str(p), b"", 0, [
            ("a", (32, 2), GGML_F32, w.tobytes()),
            ("b", (32, 2), GGML_F16, w.astype(np.float16).tobytes())])
        _, t = read_gguf(str(p))
        np.testing.assert_array_equal(t["a"], w)
        np.testing.assert_allclose(t["b"], w, rtol=1e-3)

    def test_unsupported_quant_rejected(self, tmp_path):
        p = tmp_path / "t.gguf"
        # Q2_K (type 10) stays unsupported.
        _write_gguf(str(p), b"", 0, [("x", (256,), 10, b"\0" * 256)])
        with pytest.raises(NotImplementedError, match="not supported"):
            read_gguf(str(p))


# ---- k-quants: vectorized dequant vs scalar spec reference ---------------
# The references below transcribe ggml's dequantize_row_q{4,5,6}_K loops
# (ggml-common.h / reference csrc/quantization/gguf) element by element.

def _ref_scale_min(sc_bytes, j):
    if j < 4:
        return sc_bytes[j] & 63, sc_bytes[j + 4] & 63
    d = (sc_bytes[j + 4] & 0xF) | ((sc_bytes[j - 4] >> 6) << 4)
    m = (sc_bytes[j + 4] >> 4) | ((sc_bytes[j] >> 6) << 4)
    return d, m


def _ref_q4_k(blk: bytes) -> np.ndarray:
    d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4], np.float16)[0].astype(np.float32)
    scales = blk[4:16]
    qs = blk[16:144]
    y = np.zeros(256, np.float32)
    ys = 0
    q = 0
    for j in range(4):          # QK_K/64 chunks
        sc1, m1 = _ref_scale_min(scales, 2 * j)
        sc2, m2 = _ref_scale_min(scales, 2 * j + 1)
        for l in range(32):
            y[ys + l] = d * sc1 * (qs[q + l] & 0xF) - dmin * m1
        for l in range(32):
            y[ys + 32 + l] = d * sc2 * (qs[q + l] >> 4) - dmin * m2
        ys += 64
        q += 32
    return y


def _ref_q5_k(blk: bytes) -> np.ndarray:
    d = np.frombuffer(blk[0:2], np.float16)[0].astype(np.float32)
    dmin = np.frombuffer(blk[2:4], np.float16)[0].astype(np.float32)
    scales = blk[4:16]
    qh = blk[16:48]
    qs = blk[48:176]
    y = np.zeros(256, np.float32)
    ys, q = 0, 0
    u1, u2 = 1, 2
    for j in range(4):
        sc1, m1 = _ref_scale_min(scales, 2 * j)
        sc2, m2 = _ref_scale_min(scales, 2 * j + 1)
        for l in range(32):
            hi = 16 if (qh[l] & u1) else 0
            y[ys + l] = d * sc1 * ((qs[q + l] & 0xF) + hi) - dmin * m1
        for l in range(32):
            hi = 16 if (qh[l] & u2) else 0
            y[ys + 32 + l] = d * sc2 * ((qs[q + l] >> 4) + hi) - dmin * m2
        ys += 64
        q += 32
        u1 <<= 2
        u2 <<= 2
    return y


def _ref_q6_k(blk: bytes) -> np.ndarray:
    ql = blk[0:128]
    qh = blk[128:192]
    sc = np.frombuffer(blk[192:208], np.int8)
    d = np.frombuffer(blk[208:210], np.float16)[0].astype(np.float32)
    y = np.zeros(256, np.float32)
    for n in range(2):          # two 128-element halves
        yo, qlo, qho, so = n * 128, n * 64, n * 32, n * 8
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[qlo + l] & 0xF) | ((qh[qho + l] & 3) << 4)) - 32
            q2 = ((ql[qlo + l + 32] & 0xF)
                  | (((qh[qho + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[qlo + l] >> 4) | (((qh[qho + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[qlo + l + 32] >> 4)
                  | (((qh[qho + l] >> 6) & 3) << 4)) - 32
            y[yo + l] = d * sc[so + is_] * q1
            y[yo + l + 32] = d * sc[so + is_ + 2] * q2
            y[yo + l + 64] = d * sc[so + is_ + 4] * q3
            y[yo + l + 96] = d * sc[so + is_ + 6] * q4
    return y


class TestKQuants:
    @pytest.mark.parametrize("gtype,bsize,ref", [
        (12, 144, _ref_q4_k), (13, 176, _ref_q5_k), (14, 210, _ref_q6_k)])
    def test_kquant_matches_scalar_reference(self, tmp_path, gtype,
                                             bsize, ref):
        """Random super-block bytes through the vectorized numpy dequant
        must equal the element-by-element ggml spec transcription."""
        rng = np.random.default_rng(gtype)
        nb = 3
        raw = rng.integers(0, 256, nb * bsize, dtype=np.uint8)
        # Overwrite the f16 d/dmin fields with sane finite values (random
        # bytes can encode NaN/inf, which compare unequal).
        raw = raw.copy()
        for i in range(nb):
            off = i * bsize if gtype != 14 else i * bsize + 208
            d16 = np.array([0.01 * (i + 1), -0.02], np.float16).tobytes()
            n = 2 if gtype == 14 else 4
            raw[off:off + n] = np.frombuffer(d16[:n], np.uint8)
        p = tmp_path / "t.gguf"
        _write_gguf(str(p), b"", 0,
                    [("x", (256 * nb,), gtype, raw.tobytes())])
        _, t = read_gguf(str(p))
        expect = np.concatenate([
            ref(raw[i * bsize:(i + 1) * bsize].tobytes())
            for i in range(nb)])
        np.testing.assert_allclose(t["x"], expect, rtol=0, atol=0)


def _tiny_llama_gguf(path, rng):
    """A complete 2-layer llama GGUF with mixed codecs + sp tokenizer."""
    H, I, V, NH, NKV = 32, 64, 64, 4, 2
    kvs = (_kv("general.architecture", _T_STR, _s("llama"))
           + _kv_u32("llama.embedding_length", H)
           + _kv_u32("llama.feed_forward_length", I)
           + _kv_u32("llama.block_count", 2)
           + _kv_u32("llama.attention.head_count", NH)
           + _kv_u32("llama.attention.head_count_kv", NKV)
           + _kv_u32("llama.context_length", 256)
           + _kv_f32("llama.rope.freq_base", 10000.0)
           + _kv_f32("llama.attention.layer_norm_rms_epsilon", 1e-5)
           + _kv("tokenizer.ggml.model", _T_STR, _s("llama"))
           + _kv_str_arr("tokenizer.ggml.tokens",
                         ["<unk>", "<s>", "</s>", "▁hi", "▁there", "x"]
                         + [f"<pad{i}>" for i in range(58)])
           + _kv_f32_arr("tokenizer.ggml.scores",
                         [0.0, 0.0, 0.0, -1.0, -1.0, -2.0] + [0.0] * 58)
           + _kv_i32_arr("tokenizer.ggml.token_type",
                         [2, 3, 3, 1, 1, 1] + [3] * 58))
    n_kv = 13
    dense = {}
    tensors = []

    def add(name, shape_oi, codec):
        w = (rng.standard_normal(shape_oi) * 0.05).astype(np.float32)
        if codec == GGML_F32:
            data = w.tobytes()
        elif codec == GGML_Q8_0:
            data = _q8_0(w)
        else:
            data = _q4_0(w)
        dense[name] = w
        # ggml dims innermost-first: (in, out) for a [out, in] array
        tensors.append((name, tuple(reversed(shape_oi)), codec, data))

    add("token_embd.weight", (V, H), GGML_F32)
    add("output_norm.weight", (H,), GGML_F32)
    for i in range(2):
        add(f"blk.{i}.attn_norm.weight", (H,), GGML_F32)
        add(f"blk.{i}.ffn_norm.weight", (H,), GGML_F32)
        add(f"blk.{i}.attn_q.weight", (H, H), GGML_Q8_0)
        add(f"blk.{i}.attn_k.weight", (H // 2, H), GGML_Q8_0)
        add(f"blk.{i}.attn_v.weight", (H // 2, H), GGML_F32)
        add(f"blk.{i}.attn_output.weight", (H, H), GGML_Q4_0)
        add(f"blk.{i}.ffn_gate.weight", (I, H), GGML_Q8_0)
        add(f"blk.{i}.ffn_up.weight", (I, H), GGML_Q8_0)
        add(f"blk.{i}.ffn_down.weight", (H, I), GGML_Q8_0)
    _write_gguf(path, kvs, n_kv, tensors)
    return dense


class TestLlamaGguf:
    def test_config_and_names(self, tmp_path):
        rng = np.random.default_rng(2)
        p = str(tmp_path / "m.gguf")
        _tiny_llama_gguf(p, rng)
        cfg, sd = load_gguf_checkpoint(p)
        assert cfg["hidden_size"] == 32 and cfg["num_hidden_layers"] == 2
        assert cfg["num_key_value_heads"] == 2
        assert cfg["tie_word_embeddings"] is True
        assert "model.layers.1.mlp.down_proj.weight" in sd
        assert sd["model.embed_tokens.weight"].shape == (64, 32)

    def test_qk_unpermute_roundtrip(self, tmp_path):
        """reverse_permute(permute(w)) == w (the llama.cpp permutation is
        its own structure; verify ours inverts the documented one)."""
        from vllm_paged_compression_tpu.models.gguf import _reverse_permute
        rng = np.random.default_rng(3)
        w = rng.standard_normal((32, 32)).astype(np.float32)

        def permute(w, n_head):  # llama.cpp convert.py permute
            out_f, in_f = w.shape
            return (w.reshape(n_head, out_f // n_head // 2, 2, in_f)
                    .swapaxes(1, 2).reshape(out_f, in_f))

        np.testing.assert_array_equal(
            _reverse_permute(permute(w, 4), 4), w)

    def test_embedded_tokenizer(self, tmp_path):
        rng = np.random.default_rng(4)
        p = str(tmp_path / "m.gguf")
        _tiny_llama_gguf(p, rng)
        meta, _ = read_gguf(p, meta_only=True)
        tok = tokenizer_from_gguf_meta(meta)
        assert tok is not None
        ids = tok.encode("hi there").ids
        assert tok.decode(ids) == "hi there"

    def test_e2e_generation(self, tmp_path):
        rng = np.random.default_rng(5)
        p = str(tmp_path / "m.gguf")
        _tiny_llama_gguf(p, rng)
        assert find_gguf_file(str(tmp_path)) == p
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        llm = LLM(model=p, dtype="float32", block_size=4,
                  max_model_len=128, num_device_blocks=64, seed=0,
                  max_num_seqs=4)
        assert llm.engine.tokenizer is not None
        outs = llm.generate(
            prompts=["hi there"],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
        assert len(outs[0].outputs[0].token_ids) == 8
