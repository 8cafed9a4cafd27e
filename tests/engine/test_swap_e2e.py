"""End-to-end preemption-by-swap: a sequence swapped to host mid-decode must
resume with its exact KV and produce the same greedy continuation as an
unpressured run (reference swap tier: CacheEngine.swap_in/swap_out +
scheduler swapped queue)."""

import numpy as np

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def _run(num_device_blocks, preemption_mode="recompute", max_tokens=48):
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128, 100).tolist() for _ in range(4)]
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=1024, num_device_blocks=num_device_blocks,
              max_num_seqs=4, num_scheduler_steps=2,
              preemption_mode=preemption_mode, seed=0)
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    return llm.engine, [o.outputs[0].token_ids for o in outs]


def test_swap_preemption_token_identical_to_unpressured_run():
    _, reference = _run(num_device_blocks=256)
    eng, swapped = _run(num_device_blocks=33, preemption_mode="swap")
    sched = eng.scheduler
    assert sched.num_swap_outs > 0, "pool never pressured; test is vacuous"
    assert sched.num_swap_ins == sched.num_swap_outs
    assert swapped == reference
    assert sched.allocator.num_allocated_blocks == 0
    assert eng._swap_bytes_used == 0


def test_swap_budget_exhaustion_falls_back_to_recompute():
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, 100).tolist() for _ in range(4)]
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=1024, num_device_blocks=33,
              max_num_seqs=4, num_scheduler_steps=2,
              preemption_mode="swap", swap_space=0.0, seed=0)
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    sched = llm.engine.scheduler
    assert sched.num_swap_outs == 0
    assert sched.num_preemptions > 0   # recompute fallback fired
    assert all(len(o.outputs[0].token_ids) == 48 for o in outs)
    assert sched.allocator.num_allocated_blocks == 0
