"""TP/DP sharded execution on the virtual 8-device CPU mesh: sharded decode
must produce the same tokens as single-device execution (reference analog:
tests/distributed/test_comm_ops.py runs collectives on a one-host ray
cluster; here GSPMD owns the collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                               ModelConfig, PagedEvictConfig,
                                               SchedulerConfig)
from vllm_paged_compression_tpu.core.scheduler import Scheduler
from vllm_paged_compression_tpu.core.sequence import Sequence
from vllm_paged_compression_tpu.engine.llm_engine import LLMEngine
from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.parallel.mesh import (build_mesh,
                                                      shard_caches,
                                                      shard_params)
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 8,
    "num_key_value_heads": 4, "max_position_embeddings": 512,
    "tie_word_embeddings": True,
}


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()


def run_generation(mesh=None):
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=3,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=16, evict_selection="l2")
    eng = llm.engine
    if mesh is not None:
        eng.params = shard_params(eng.params, mesh, "llama")
        eng.kv_caches = shard_caches(eng.kv_caches, mesh)
    prompts = [[(3 * i + j) % 128 for j in range(20 + i)] for i in range(4)]
    outs = llm.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16))
    return [o.outputs[0].token_ids for o in outs]


def test_tp_sharded_decode_matches_single_device(eight_devices):
    base = run_generation(mesh=None)
    mesh = build_mesh(tensor_parallel=4, data_parallel=2)
    sharded = run_generation(mesh=mesh)
    assert base == sharded


def test_param_shardings_cover_tree(eight_devices):
    mesh = build_mesh(tensor_parallel=4, data_parallel=2)
    from vllm_paged_compression_tpu.models.llama import LlamaArch, LlamaModel
    from vllm_paged_compression_tpu.parallel.mesh import param_shardings
    model = LlamaModel(LlamaArch(vocab_size=64, hidden_size=32,
                                 intermediate_size=64, num_layers=2,
                                 num_heads=4, num_kv_heads=4, head_dim=8),
                       dtype=jnp.float32)
    params = model.init_params(0)
    sh = param_shardings(mesh, "llama", params)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    assert len(flat_p) == len(flat_s)


def test_tp_int4_matches_single_device(eight_devices):
    """Packed int4 weights under TP: the out axis shards, the packed
    in-features axis stays whole (nibble pairing couples rows j and
    j + K/2), and tokens match single-device execution."""
    cfg = dict(CFG, hidden_size=256, intermediate_size=512,
               num_attention_heads=4, num_key_value_heads=2)

    def gen(tp):
        llm = LLM(hf_config=cfg, dtype="float32", block_size=4,
                  max_model_len=128, num_device_blocks=64, seed=3,
                  quantization="int4", tensor_parallel_size=tp)
        outs = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=10))
        return outs[0].outputs[0].token_ids

    assert gen(1) == gen(2)
