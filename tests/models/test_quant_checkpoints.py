"""Quantized-checkpoint loading: AWQ and GPTQ int4 dequantization math
(validated against hand-packed checkpoints built per the formats'
documented layouts) and fp8 weight-scale application.

Reference analog: the dequant halves of
vllm/model_executor/layers/quantization/{awq,gptq,fp8}.py.
"""

import numpy as np
import pytest

from vllm_paged_compression_tpu.models.weights import (
    _dequant_awq, _dequant_gptq, dequantize_checkpoint)

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]   # AutoAWQ pack_intweight order


def _pack_cols(int4: np.ndarray, order=None) -> np.ndarray:
    """Pack groups of 8 values along the last axis into int32 (low nibble
    first), optionally permuting within each group (AWQ)."""
    r, c = int4.shape
    grp = int4.reshape(r, c // 8, 8)
    if order is not None:
        grp = grp[:, :, order]
    out = np.zeros((r, c // 8), np.uint32)
    for j in range(8):
        out |= grp[:, :, j].astype(np.uint32) << (4 * j)
    return out.astype(np.int32)


def _pack_rows(int4: np.ndarray) -> np.ndarray:
    """GPTQ qweight packing: 8 consecutive input rows per int32."""
    return _pack_cols(int4.T, order=None).T


def test_gptq_dequant_matches_formula():
    rng = np.random.default_rng(0)
    in_f, out_f, group = 32, 24, 8
    iw = rng.integers(0, 16, (in_f, out_f))
    iz = rng.integers(0, 15, (in_f // group, out_f))   # stored zeros (v1: -1)
    scales = rng.standard_normal((in_f // group, out_f)).astype(np.float32)
    qweight = _pack_rows(iw)
    qzeros = _pack_cols(iz, order=None)
    w = _dequant_gptq(qweight, qzeros, scales)
    g = np.arange(in_f) // group
    expect = ((iw - (iz[g] + 1)) * scales[g]).T
    np.testing.assert_allclose(w, expect, rtol=1e-6)


def test_gptq_act_order_g_idx():
    rng = np.random.default_rng(1)
    in_f, out_f, group = 32, 16, 8
    iw = rng.integers(0, 16, (in_f, out_f))
    iz = rng.integers(0, 15, (in_f // group, out_f))
    scales = rng.standard_normal((in_f // group, out_f)).astype(np.float32)
    g_idx = rng.integers(0, in_f // group, in_f)       # permuted groups
    w = _dequant_gptq(_pack_rows(iw), _pack_cols(iz), scales, g_idx=g_idx)
    expect = ((iw - (iz[g_idx] + 1)) * scales[g_idx]).T
    np.testing.assert_allclose(w, expect)


def test_awq_dequant_matches_formula():
    rng = np.random.default_rng(2)
    in_f, out_f, group = 16, 32, 8
    iw = rng.integers(0, 16, (in_f, out_f))
    iz = rng.integers(0, 16, (in_f // group, out_f))
    scales = rng.standard_normal((in_f // group, out_f)).astype(np.float32)
    qweight = _pack_cols(iw, order=AWQ_ORDER)
    qzeros = _pack_cols(iz, order=AWQ_ORDER)
    w = _dequant_awq(qweight, qzeros, scales)
    g = np.arange(in_f) // group
    expect = ((iw - iz[g]) * scales[g]).T
    np.testing.assert_allclose(w, expect)


def test_fp8_weight_scale_applied():
    t = {"model.layers.0.self_attn.q_proj.weight":
         np.full((4, 8), 2.0, np.float16),
         "model.layers.0.self_attn.q_proj.weight_scale":
         np.float32(0.5),
         "model.norm.weight": np.ones(8, np.float32)}
    out = dequantize_checkpoint(t, {"quant_method": "fp8"})
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.weight"], 1.0)
    assert "model.layers.0.self_attn.q_proj.weight_scale" not in out
    assert "model.norm.weight" in out


def test_gptq_checkpoint_loads_into_llama():
    """A llama state dict whose linears are GPTQ-packed loads to exactly
    the same params as the pre-dequantized fp checkpoint."""
    import jax.numpy as jnp

    from vllm_paged_compression_tpu.models.llama import (LlamaArch,
                                                         LlamaModel)
    rng = np.random.default_rng(3)
    arch = LlamaArch(vocab_size=64, hidden_size=32, intermediate_size=48,
                     num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                     tie_word_embeddings=True)
    group = 16
    fp, qt = {}, {}
    lin_shapes = {"self_attn.q_proj": (32, 32), "self_attn.k_proj": (16, 32),
                  "self_attn.v_proj": (16, 32), "self_attn.o_proj": (32, 32),
                  "mlp.gate_proj": (48, 32), "mlp.up_proj": (48, 32),
                  "mlp.down_proj": (32, 48)}
    for i in range(arch.num_layers):
        p = f"model.layers.{i}."
        for name, (out_f, in_f) in lin_shapes.items():
            iw = rng.integers(0, 16, (in_f, out_f))
            iz = rng.integers(0, 15, (in_f // group, out_f))
            s = (rng.standard_normal((in_f // group, out_f))
                 .astype(np.float32) * 0.02)
            g = np.arange(in_f) // group
            fp[p + name + ".weight"] = ((iw - (iz[g] + 1)) * s[g]).T
            qt[p + name + ".qweight"] = _pack_rows(iw)
            qt[p + name + ".qzeros"] = _pack_cols(iz)
            qt[p + name + ".scales"] = s
        for norm in ("input_layernorm", "post_attention_layernorm"):
            w = rng.standard_normal(32).astype(np.float32)
            fp[p + norm + ".weight"] = w
            qt[p + norm + ".weight"] = w
    for name, shape in (("model.embed_tokens.weight", (64, 32)),
                        ("model.norm.weight", (32,))):
        w = rng.standard_normal(shape).astype(np.float32)
        fp[name] = w
        qt[name] = w

    model = LlamaModel(arch, dtype=jnp.float32)
    params_fp = model.load_hf_state_dict(fp)
    params_q = model.load_hf_state_dict(
        dequantize_checkpoint(qt, {"quant_method": "gptq", "bits": 4}))
    import jax
    for a, b in zip(jax.tree.leaves(params_fp), jax.tree.leaves(params_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_unsupported_bits_rejected():
    with pytest.raises(NotImplementedError):
        dequantize_checkpoint({}, {"quant_method": "gptq", "bits": 8})


def test_compressed_tensors_int8_dequant():
    """compressed-tensors int8 weight scheme (reference
    layers/quantization/compressed_tensors/): .weight int8 +
    .weight_scale per-channel or per-tensor; calibration scales dropped."""
    rng = np.random.default_rng(7)
    w8 = rng.integers(-128, 127, (8, 4)).astype(np.int8)
    sc = rng.standard_normal(8).astype(np.float32) * 0.01
    t = {"model.layers.0.self_attn.q_proj.weight": w8,
         "model.layers.0.self_attn.q_proj.weight_scale": sc,
         "model.layers.0.self_attn.q_proj.input_scale":
         np.float32(0.1),
         "model.layers.0.self_attn.attn.k_scale": np.float32(1.0),
         "model.layers.1.mlp.up_proj.weight": w8,
         "model.layers.1.mlp.up_proj.weight_scale": np.float32(0.5),
         "model.norm.weight": np.ones(8, np.float32)}
    out = dequantize_checkpoint(
        t, {"quant_method": "compressed-tensors",
            "format": "int-quantized"})
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.weight"],
        w8.astype(np.float32) * sc[:, None])
    np.testing.assert_allclose(
        out["model.layers.1.mlp.up_proj.weight"],
        w8.astype(np.float32) * 0.5)
    assert "model.layers.0.self_attn.q_proj.input_scale" not in out
    assert "model.layers.0.self_attn.attn.k_scale" not in out
    assert "model.norm.weight" in out


def test_compressed_tensors_packed_rejected():
    with pytest.raises(NotImplementedError):
        dequantize_checkpoint({}, {"quant_method": "compressed-tensors",
                                   "format": "pack-quantized"})


def test_gptq_checkpoint_serves_native_int4(tmp_path):
    """An on-disk GPTQ checkpoint auto-routes to the native int4 path
    (weight_dtype int4) and generates; the repacked int4 projections
    dequantize to the checkpoint's own dequantized values (same group ->
    same 16-level grid; reference executes these via gptq_marlin GEMM)."""
    import json

    from safetensors.numpy import save_file

    rng = np.random.default_rng(7)
    group = 16
    hidden, inter, kv_dim = 32, 48, 16
    lin_shapes = {"self_attn.q_proj": (hidden, hidden),
                  "self_attn.k_proj": (kv_dim, hidden),
                  "self_attn.v_proj": (kv_dim, hidden),
                  "self_attn.o_proj": (hidden, hidden),
                  "mlp.gate_proj": (inter, hidden),
                  "mlp.up_proj": (inter, hidden),
                  "mlp.down_proj": (hidden, inter)}
    qt = {}
    for i in range(2):
        p = f"model.layers.{i}."
        for name, (out_f, in_f) in lin_shapes.items():
            iw = rng.integers(0, 16, (in_f, out_f))
            iz = rng.integers(0, 15, (in_f // group, out_f))
            s = (rng.standard_normal((in_f // group, out_f))
                 .astype(np.float32) * 0.02)
            qt[p + name + ".qweight"] = _pack_rows(iw)
            qt[p + name + ".qzeros"] = _pack_cols(iz)
            qt[p + name + ".scales"] = s
        for norm in ("input_layernorm", "post_attention_layernorm"):
            qt[p + norm + ".weight"] = np.ones(hidden, np.float32)
    qt["model.embed_tokens.weight"] = (
        rng.standard_normal((64, hidden)).astype(np.float32) * 0.02)
    qt["model.norm.weight"] = np.ones(hidden, np.float32)
    # safetensors serializes the raw buffer: transposed views (from
    # _pack_rows) must be made contiguous or they save scrambled.
    save_file({k: np.ascontiguousarray(v) for k, v in qt.items()},
              str(tmp_path / "model.safetensors"))
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 64,
           "hidden_size": hidden, "intermediate_size": inter,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "max_position_embeddings": 256,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True, "eos_token_id": None,
           "quantization_config": {"quant_method": "gptq", "bits": 4,
                                   "group_size": group}}
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)

    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
        QuantizedWeight4, dequantize_int4)
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              max_num_seqs=4)
    eng = llm.engine
    assert eng.config.model.weight_dtype == "int4"
    wqkv = eng.params["layers"]["wqkv"]
    assert isinstance(wqkv, QuantizedWeight4)

    # Repack fidelity: re-quantization runs on the checkpoint's own group
    # size, so every value stays within HALF the checkpoint's original
    # quantization step (min/max refit can only shrink the grid).
    iw = np.asarray(_dequant_gptq(
        qt["model.layers.0.self_attn.q_proj.qweight"],
        qt["model.layers.0.self_attn.q_proj.qzeros"],
        qt["model.layers.0.self_attn.q_proj.scales"])).T  # [in, out]
    ours = np.asarray(dequantize_int4(
        QuantizedWeight4(qp=wqkv.qp[0], s=wqkv.s[0], z=wqkv.z[0]),
        dtype=np.float32))[:, :hidden]
    assert wqkv.s.shape[-2] == hidden // group  # group plumbed through
    s_ckpt = np.abs(np.asarray(
        qt["model.layers.0.self_attn.q_proj.scales"]))   # [in/g, out->in?]
    bound = np.repeat(s_ckpt, group, axis=0) * 0.5 + 1e-7  # [in, out]
    assert np.all(np.abs(ours - iw) <= bound)

    outs = llm.generate(
        prompt_token_ids=[[1, 5, 9, 13, 2, 6]],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
    assert len(outs[0].outputs[0].token_ids) == 8
