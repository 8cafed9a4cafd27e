"""Continuous-batching stress: many concurrent requests, mixed lengths,
eviction + preemption under a tiny page pool (SURVEY §7 phase 8).
"""

import numpy as np

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def test_stress_mixed_lengths_eviction_and_preemption():
    rng = np.random.default_rng(0)
    n = 24
    prompts = [rng.integers(1, 128, rng.integers(8, 300)).tolist()
               for _ in range(n)]
    lens = [int(rng.integers(4, 40)) for _ in range(n)]
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=1024, num_device_blocks=96,  # tight pool
              max_num_seqs=6, num_scheduler_steps=4,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, seed=0)
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in lens]
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sps)
    assert len(outs) == n
    for out, m in zip(outs, lens):
        assert len(out.outputs[0].token_ids) == m
    # The tight pool must have been stressed without leaking pages.
    sched = llm.engine.scheduler
    assert sched.allocator.num_allocated_blocks == 0


def test_preemption_recompute_preserves_output():
    """A request preempted by RECOMPUTE mid-generation must keep its
    pre-preemption tokens in the final output and still produce exactly
    max_tokens — reset_for_recompute folds generated tokens into the
    prompt for replay, and used to silently drop them from the output
    and restart the max_tokens budget (caught by the chain-recall
    harness: finished outputs came back short and shifted)."""
    rng = np.random.default_rng(2)
    n = 8
    prompts = [rng.integers(1, 128, 150).tolist() for _ in range(n)]
    m = 40

    def run(blocks):
        llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
                  max_model_len=512, num_device_blocks=blocks,
                  max_num_seqs=n, num_scheduler_steps=2, seed=0)
        sp = SamplingParams(temperature=0.0, max_tokens=m,
                            ignore_eos=True)
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        return outs, llm.engine.scheduler

    ample, _ = run(256)
    tight, sched = run(12 * n - 10)   # forces mid-decode preemption
    assert sched.num_preemptions > 0, "pool was not tight enough"
    for a, t in zip(ample, tight):
        assert len(t.outputs[0].token_ids) == m
        assert t.outputs[0].token_ids == a.outputs[0].token_ids


def test_stress_determinism_across_batch_compositions():
    """A request's greedy continuation must not depend on which other
    requests share its decode batches (fixed-shape padding + masking)."""
    rng = np.random.default_rng(1)
    target = rng.integers(1, 128, 120).tolist()
    others = [rng.integers(1, 128, rng.integers(10, 200)).tolist()
              for _ in range(5)]

    def run(all_prompts):
        llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
                  max_model_len=1024, num_device_blocks=256,
                  max_num_seqs=8, num_scheduler_steps=4, seed=0)
        sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
        outs = llm.generate(prompt_token_ids=all_prompts,
                            sampling_params=sp)
        return outs[0].outputs[0].token_ids

    alone = run([target])
    crowded = run([target] + others)
    assert alone == crowded
