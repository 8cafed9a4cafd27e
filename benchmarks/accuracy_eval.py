#!/usr/bin/env python
"""Eviction quality harness: greedy-continuation agreement vs full cache.

Reference analog: the fork validated eviction quality through an lm-eval
GSM8K harness (.buildkite/lm-eval-harness/, SURVEY §4).  The zero-egress
image has no datasets, so the harness measures the model-intrinsic signal
that drives those scores: how much the evicted-cache greedy continuation
diverges from the full-cache one, per method and budget.

Outputs one JSON line per (method, budget):
  {"method", "budget", "agree_rate", "mean_prefix_len", "n"}

- agree_rate: fraction of positions where evicted == full-cache token.
- mean_prefix_len: average length of the exact-match prefix (tokens until
  first divergence) — the stricter, generation-order-aware metric.

Usage (synthetic weights):  python benchmarks/accuracy_eval.py
Real checkpoint:            ... --model /path/to/ckpt --prompt-file f.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even though the machine's sitecustomize imports
# jax (pinning the TPU) before this script runs.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

DEFAULT_ARCH = {
    "architectures": ["LlamaForCausalLM"], "vocab_size": 32000,
    "hidden_size": 512, "intermediate_size": 1024,
    "num_hidden_layers": 8, "num_attention_heads": 8,
    "num_key_value_heads": 4, "max_position_embeddings": 8192,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def continuation_tokens(llm, prompts, gen_len):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=gen_len,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    return [o.outputs[0].token_ids for o in outs]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="")
    ap.add_argument("--prompt-file", default=None,
                    help="text file; lines become prompts (needs a "
                         "tokenizer in --model)")
    ap.add_argument("--methods", nargs="+",
                    default=["streamingLLM", "global", "local"])
    ap.add_argument("--budgets", nargs="+", type=int,
                    default=[256, 512, 1024])
    ap.add_argument("--num-prompts", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=2048)
    ap.add_argument("--gen-len", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vllm_paged_compression_tpu.entrypoints.llm import LLM

    import numpy as np
    rng = np.random.default_rng(args.seed)
    kw = dict(dtype=args.dtype, block_size=16,
              max_model_len=args.prompt_len + args.gen_len + 64,
              max_num_seqs=8, num_scheduler_steps=16, seed=args.seed)
    if args.model:
        kw["model"] = args.model
    else:
        kw["hf_config"] = DEFAULT_ARCH

    if args.prompt_file:
        full_llm = LLM(**kw)
        tok = full_llm.engine.tokenizer
        assert tok is not None, "--prompt-file needs a tokenizer"
        with open(args.prompt_file) as f:
            prompts = [tok.encode(line.strip()).ids[:args.prompt_len]
                       for line in f if line.strip()][:args.num_prompts]
    else:
        full_llm = LLM(**kw)
        prompts = [rng.integers(1, DEFAULT_ARCH["vocab_size"],
                                args.prompt_len).tolist()
                   for _ in range(args.num_prompts)]

    print(f"# full-cache baseline over {len(prompts)} prompts "
          f"({args.prompt_len} -> {args.gen_len} tokens)", file=sys.stderr)
    baseline = continuation_tokens(full_llm, prompts, args.gen_len)
    del full_llm

    for method in args.methods:
        for budget in args.budgets:
            ev_kw = dict(kw, enable_paged_eviction=True,
                         evict_method=method, cache_budget=budget,
                         evict_selection="l2",
                         topk_blocks=(3 if method == "local" else -1))
            llm = LLM(**ev_kw)
            got = continuation_tokens(llm, prompts, args.gen_len)
            del llm
            agree, prefix = [], []
            for b, g in zip(baseline, got):
                same = [x == y for x, y in zip(b, g)]
                agree.append(sum(same) / max(len(same), 1))
                p = 0
                while p < len(same) and same[p]:
                    p += 1
                prefix.append(p)
            print(json.dumps({
                "method": method, "budget": budget,
                "agree_rate": round(float(sum(agree) / len(agree)), 4),
                "mean_prefix_len": round(float(sum(prefix) / len(prefix)),
                                         1),
                "n": len(prompts)}))


if __name__ == "__main__":
    main()
