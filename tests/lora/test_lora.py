"""Multi-LoRA serving tests.

Oracle: an adapter applied at serve time must produce exactly the tokens
of a plain engine whose base weights were pre-merged with
W' = W + scale * A @ B (reference test strategy: tests/lora/ compares
LoRA outputs against merged-weight outputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.lora import LoRARequest
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 512,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}

BASE = dict(hf_config=CFG, dtype="float32", block_size=16,
            max_model_len=512, num_device_blocks=64, seed=0,
            max_num_seqs=8)
SP = SamplingParams(temperature=0.0, max_tokens=20)


def _mk_adapter(rng, arch_dims, rank=4, std=0.6):
    L = CFG["num_hidden_layers"]
    out = {}
    for name, (din, dout) in arch_dims.items():
        a = rng.standard_normal((L, din, rank)).astype(np.float32) * std
        b = rng.standard_normal((L, rank, dout)).astype(np.float32) * std
        out[name] = (a, b)
    return out


def _dims():
    d = CFG["hidden_size"]
    hd = d // CFG["num_attention_heads"]
    qkv_out = (CFG["num_attention_heads"]
               + 2 * CFG["num_key_value_heads"]) * hd
    return {"wqkv": (d, qkv_out), "wo": (d, d)}


def _merged_params(params, tensors, scaling):
    layers = dict(params["layers"])
    for name, (a, b) in tensors.items():
        delta = jnp.einsum("ldr,lro->ldo", jnp.asarray(a), jnp.asarray(b))
        layers[name] = params["layers"][name] + scaling * delta
    return {**params, "layers": layers}


def test_lora_matches_merged_weights():
    rng = np.random.default_rng(0)
    tensors = _mk_adapter(rng, _dims())
    scaling = 0.8

    base_llm = LLM(enable_lora=True, max_loras=2, max_lora_rank=4, **BASE)
    base_params = {k: v for k, v in base_llm.engine.params.items()
                   if k != "lora"}
    base_llm.engine.add_lora(7, tensors, scaling=scaling)

    prompt = [list(range(1, 60))]
    # No adapter -> matches the plain engine (slot 0 is the zero adapter).
    plain = LLM(params=base_params, **BASE).generate(
        prompt_token_ids=prompt, sampling_params=SP)
    none_out = base_llm.generate(prompt_token_ids=prompt,
                                 sampling_params=SP)
    assert none_out[0].outputs[0].token_ids == \
        plain[0].outputs[0].token_ids

    # Adapter -> matches the merged-weight engine.
    merged = LLM(params=_merged_params(base_params, tensors, scaling),
                 **BASE).generate(prompt_token_ids=prompt,
                                  sampling_params=SP)
    lora_out = base_llm.generate(prompt_token_ids=prompt,
                                 sampling_params=SP,
                                 lora_request=LoRARequest("ad", 7))
    got = lora_out[0].outputs[0].token_ids
    want = merged[0].outputs[0].token_ids
    assert got == want
    if want != plain[0].outputs[0].token_ids:
        assert got != plain[0].outputs[0].token_ids
    else:
        pytest.skip("adapter too weak to change greedy tokens on this "
                    "random model — parity assertions above still ran")


def test_mixed_adapter_batch():
    """Concurrent requests with different adapters (and none) decode in one
    batch and each matches its merged-weight oracle."""
    rng = np.random.default_rng(1)
    t1 = _mk_adapter(rng, _dims())
    t2 = _mk_adapter(rng, _dims())

    llm = LLM(enable_lora=True, max_loras=2, max_lora_rank=4, **BASE)
    base_params = {k: v for k, v in llm.engine.params.items()
                   if k != "lora"}
    llm.engine.add_lora(1, t1, scaling=1.0)
    llm.engine.add_lora(2, t2, scaling=0.5)

    prompts = [list(range(1, 40)), list(range(1, 40)), list(range(1, 40))]
    reqs = [LoRARequest("a1", 1), LoRARequest("a2", 2), None]
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=SP,
                        lora_request=reqs)

    oracles = [
        LLM(params=_merged_params(base_params, t1, 1.0), **BASE),
        LLM(params=_merged_params(base_params, t2, 0.5), **BASE),
        LLM(params=base_params, **BASE),
    ]
    for out, oracle, prompt in zip(outs, oracles, prompts):
        want = oracle.generate(prompt_token_ids=[prompt],
                               sampling_params=SP)
        assert out.outputs[0].token_ids == want[0].outputs[0].token_ids


def test_slot_exhaustion_and_removal():
    llm = LLM(enable_lora=True, max_loras=1, max_lora_rank=4, **BASE)
    rng = np.random.default_rng(2)
    llm.engine.add_lora(1, _mk_adapter(rng, _dims()), 1.0)
    with pytest.raises(RuntimeError):
        llm.engine.add_lora(2, _mk_adapter(rng, _dims()), 1.0)
    llm.engine.remove_lora(1)
    llm.engine.add_lora(2, _mk_adapter(rng, _dims()), 1.0)
