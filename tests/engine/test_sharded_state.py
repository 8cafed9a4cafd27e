"""Sharded-state export/reload (reference Worker.save_sharded_state,
vllm/worker/worker.py:166-176 + ShardedStateLoader): the engine dumps
its RESIDENT params — already quantized/packed — and a later boot with
model=<dir> restores them without dequant/re-quant, producing identical
outputs."""

import numpy as np

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 256, "intermediate_size": 512,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def _llm(**kw):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    return LLM(dtype="float32", block_size=16, max_model_len=256,
               num_device_blocks=64, seed=0, max_num_seqs=4, **kw)


def test_roundtrip_int4_identical_outputs(tmp_path):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    prompt = [[1, 17, 33, 5, 99, 2, 8, 61]]

    llm = _llm(hf_config=CFG, quantization="int4")
    ref = llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    ref_toks = ref[0].outputs[0].token_ids
    saved_type = type(llm.engine.params["layers"]["wqkv"])
    out_dir = str(tmp_path / "state")
    llm.save_sharded_state(out_dir, max_size=256 * 1024)  # force shards
    del llm

    import os
    import json
    man = json.load(open(os.path.join(out_dir,
                                      "vpc_sharded_state.json")))
    assert len(man["shards"]) > 1          # max_size actually splits
    assert man["weight_dtype"] == "int4"
    assert os.path.isfile(os.path.join(out_dir, "config.json"))

    llm2 = _llm(model=out_dir)
    # quant wrappers restored with their exact types, not re-quantized
    lp = llm2.engine.params["layers"]["wqkv"]
    assert type(lp) is saved_type
    got = llm2.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert got[0].outputs[0].token_ids == ref_toks


def test_roundtrip_plain_weights(tmp_path):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    prompt = [[3, 9, 27, 81]]
    llm = _llm(hf_config=CFG)
    ref = llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    out_dir = str(tmp_path / "state")
    llm.save_sharded_state(out_dir)
    del llm
    llm2 = _llm(model=out_dir)
    got = llm2.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert (got[0].outputs[0].token_ids == ref[0].outputs[0].token_ids)


def test_flatten_rebuild_typed_tree(tmp_path):
    """Unit roundtrip of a tree containing every wrapper type incl.
    PackedInt4 (the kernel-eligible form) and a list node."""
    import jax.numpy as jnp
    import numpy as np
    from vllm_paged_compression_tpu.models.weights import (
        load_sharded_state, save_sharded_state)
    from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
        PackedInt4, QuantizedWeight4, pack_int4_scales,
        quantize_weight_int4)
    from vllm_paged_compression_tpu.ops.quant import QuantizedWeight
    rng = np.random.default_rng(0)
    w4 = quantize_weight_int4(
        rng.standard_normal((2048, 256)).astype(np.float32) * 0.02)
    p4 = pack_int4_scales(w4)
    assert isinstance(p4, PackedInt4)
    tree = {
        "layers": {"a": p4,
                   "b": QuantizedWeight4(qp=w4.qp, s=w4.s, z=w4.z),
                   "c": QuantizedWeight(q=jnp.ones((4, 4), jnp.int8),
                                        s=jnp.ones((4,), jnp.float32))},
        "experts": [jnp.zeros((2, 2), jnp.bfloat16),
                    jnp.ones((2, 2), jnp.bfloat16)],
        "norm": jnp.full((8,), 0.5, jnp.float32),
    }
    d = str(tmp_path / "t")
    save_sharded_state(tree, d, weight_dtype="int4")
    got, wd = load_sharded_state(d)
    assert wd == "int4"
    assert isinstance(got["layers"]["a"], PackedInt4)
    assert isinstance(got["layers"]["b"], QuantizedWeight4)
    assert isinstance(got["layers"]["c"], QuantizedWeight)
    assert isinstance(got["experts"], list) and len(got["experts"]) == 2
    np.testing.assert_array_equal(np.asarray(got["layers"]["a"].sz),
                                  np.asarray(p4.sz))
    np.testing.assert_array_equal(np.asarray(got["norm"]),
                                  np.asarray(tree["norm"]))


def test_none_only_nodes_roundtrip(tmp_path):
    """A parent whose children are ALL None (and a None list tail) must
    still reconstruct — review finding round 4."""
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.models.weights import (
        load_sharded_state, save_sharded_state)
    tree = {"a": {"x": None, "y": None},
            "lst": [jnp.ones((2,), jnp.float32), None],
            "w": jnp.zeros((2, 2), jnp.float32)}
    d = str(tmp_path / "n")
    save_sharded_state(tree, d)
    got, _ = load_sharded_state(d)
    assert got["a"] == {"x": None, "y": None}
    assert got["lst"][1] is None and len(got["lst"]) == 2


def test_roundtrip_hybrid_state_model(tmp_path):
    """Hybrid state-slot trunk (Jamba): the per-layer dict list
    (layer_list) round-trips through the typed flatten/rebuild and a
    reboot from the dump is token-identical."""
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    jcfg = {
        "architectures": ["JambaForCausalLM"], "vocab_size": 128,
        "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "num_experts": 4,
        "num_experts_per_tok": 2, "expert_layer_period": 2,
        "expert_layer_offset": 1, "attn_layer_period": 4,
        "attn_layer_offset": 2, "mamba_d_state": 8, "mamba_d_conv": 4,
        "mamba_expand": 2, "tie_word_embeddings": False,
        "rms_norm_eps": 1e-6, "eos_token_id": None,
    }
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = [[3, 77, 15, 42, 9]]
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    llm = LLM(hf_config=jcfg, dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0)
    ref = llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    out_dir = str(tmp_path / "state")
    llm.save_sharded_state(out_dir)
    del llm
    llm2 = LLM(model=out_dir, dtype="float32", max_model_len=64,
               num_device_blocks=8, seed=0)
    assert isinstance(llm2.engine.params["layer_list"], list)
    got = llm2.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert (got[0].outputs[0].token_ids == ref[0].outputs[0].token_ids)


def test_pp_engine_save_reloads_everywhere(tmp_path):
    """A PP engine holds block-form hybrid params (to_block_form); the
    dump must invert to layer-form so it reloads under BOTH a non-PP and
    a PP layout (advisor finding, round 4)."""
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    jcfg = {
        "architectures": ["JambaForCausalLM"], "vocab_size": 128,
        "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 8, "num_attention_heads": 4,
        "num_key_value_heads": 2, "num_experts": 4,
        "num_experts_per_tok": 2, "expert_layer_period": 2,
        "expert_layer_offset": 1, "attn_layer_period": 4,
        "attn_layer_offset": 2, "mamba_d_state": 8, "mamba_d_conv": 4,
        "mamba_expand": 2, "tie_word_embeddings": False,
        "rms_norm_eps": 1e-6, "eos_token_id": None,
    }
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = [[3, 77, 15, 42, 9]]
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    llm = LLM(hf_config=jcfg, dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0, pipeline_parallel_size=2)
    assert "block_list" in llm.engine.params
    ref = llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    ref_toks = ref[0].outputs[0].token_ids
    out_dir = str(tmp_path / "state")
    llm.save_sharded_state(out_dir)
    del llm
    # non-PP reload
    llm2 = LLM(model=out_dir, dtype="float32", max_model_len=64,
               num_device_blocks=8, seed=0)
    assert isinstance(llm2.engine.params["layer_list"], list)
    got = llm2.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert got[0].outputs[0].token_ids == ref_toks
    del llm2
    # PP reload
    llm3 = LLM(model=out_dir, dtype="float32", max_model_len=64,
               num_device_blocks=8, seed=0, pipeline_parallel_size=2)
    got = llm3.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert got[0].outputs[0].token_ids == ref_toks


def test_noncontiguous_leaf_roundtrip(tmp_path):
    """Regression: np.asarray of a jax array can be a non-contiguous
    VIEW (an untied lm_head built as a transpose had strides (2, 512)),
    and safetensors' numpy writer serializes the raw buffer ignoring
    strides — without ascontiguousarray at save, such a leaf
    round-trips transposed-flattened (caught live: the round-5 GSM
    proxy checkpoint scored 0.0 because its lm_head was garbled)."""
    from vllm_paged_compression_tpu.models.weights import (
        load_sharded_state, save_sharded_state)

    base = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    view = base.T                      # (3, 8) transpose view on host
    assert not np.asarray(view).flags["C_CONTIGUOUS"]
    tree = {"w": view, "b": base}
    save_sharded_state(tree, str(tmp_path / "s"))
    got, _ = load_sharded_state(str(tmp_path / "s"))
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(view))
    np.testing.assert_array_equal(np.asarray(got["b"]), np.asarray(base))


def test_untied_lm_head_roundtrip(tmp_path):
    """End-to-end: an UNTIED-embedding model (separate lm_head — the
    transpose-view case) produces identical tokens after sharded-state
    reload."""
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = dict(CFG, tie_word_embeddings=False)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompt = [[1, 17, 33, 5, 99, 2, 8, 61]]
    llm = _llm(hf_config=cfg)
    ref = llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    ref_toks = ref[0].outputs[0].token_ids
    out_dir = str(tmp_path / "state")
    llm.save_sharded_state(out_dir)
    del llm
    llm2 = _llm(model=out_dir)
    got = llm2.generate(prompt_token_ids=prompt, sampling_params=sp)
    assert got[0].outputs[0].token_ids == ref_toks
