"""int8 weight quantization (reference analog: tpu_int8 scheme,
vllm/model_executor/layers/quantization/tpu_int8.py)."""

import numpy as np

import jax.numpy as jnp

from vllm_paged_compression_tpu.ops.quant import (QuantizedWeight, matmul,
                                                  quantize_params_tree,
                                                  quantize_weight)


def test_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw = quantize_weight(jnp.array(w))
    deq = np.asarray(qw.q, np.float32) * np.asarray(qw.s)[None, :]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # 7-bit effective precision


def test_matmul_close_to_fp():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    y_fp = x @ w
    y_q = np.asarray(matmul(jnp.array(x), quantize_weight(jnp.array(w))))
    err = np.abs(y_q - y_fp).max() / np.abs(y_fp).max()
    assert err < 0.02


def test_stacked_weights_per_layer_scales():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    qw = quantize_weight(jnp.array(w))
    assert qw.q.shape == (3, 16, 8)
    assert qw.s.shape == (3, 8)


def test_tree_quantization_targets_named_leaves():
    params = {"embed": jnp.ones((10, 4)),
              "layers": {"wqkv": jnp.ones((2, 4, 6)),
                         "input_norm": jnp.ones((2, 4))},
              "final_norm": jnp.ones((4,))}
    out = quantize_params_tree(params, ("wqkv", "embed"))
    assert isinstance(out["embed"], QuantizedWeight)
    assert out["embed"].s.shape == (10,)  # per-row (gathered) scales
    assert isinstance(out["layers"]["wqkv"], QuantizedWeight)
    assert not isinstance(out["layers"]["input_norm"], QuantizedWeight)
    assert not isinstance(out["final_norm"], QuantizedWeight)


def test_e2e_int8_generation_close_to_fp():
    """Greedy generations with int8 weights should mostly agree with fp32
    on a tiny model (quality smoke, not bit-exactness)."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "max_position_embeddings": 256,
           "tie_word_embeddings": True}
    kw = dict(hf_config=cfg, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    prompt = [[1, 5, 9, 33, 77, 2]]
    fp_llm = LLM(**kw)
    fp = fp_llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    # Quantize the *same* weights (the engine's synthetic int8 path would
    # generate unrelated random int8 weights).
    qparams = quantize_params_tree(
        fp_llm.engine.params,
        ("wqkv", "wo", "w_gate_up", "w_down", "embed"))
    q = LLM(params=qparams, **kw).generate(prompt_token_ids=prompt,
                                           sampling_params=sp)
    a = fp[0].outputs[0].token_ids
    b = q[0].outputs[0].token_ids
    agree = sum(x == y for x, y in zip(a, b))
    assert agree >= len(a) // 2, (a, b)
