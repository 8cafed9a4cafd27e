#!/usr/bin/env python
"""Capture a jax.profiler trace of steady-state decode (and optionally
one prefill) on the real chip, then print the xplane op-time summary.

Usage:
    python tools/profile_decode.py [--kv-dtype fp8] [--windows 4]
    # -> trace in /tmp/vpc_trace, summary on stdout

Feeds VERDICT r2 #4/#9: the committed breakdown behind kernel
optimization (decode HBM roofline, prefill MFU).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-model", default="llama-3.1-8b")
    ap.add_argument("--quantization", default="int4")
    ap.add_argument("--kv-dtype", default="auto")
    ap.add_argument("--input-len", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=1024)
    ap.add_argument("--windows", type=int, default=4,
                    help="traced decode windows (128 steps each)")
    ap.add_argument("--trace-dir", default="/tmp/vpc_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import numpy as np
    import bench
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams

    num_steps = 128
    llm = LLM(hf_config=bench.ARCHS[args.bench_model], dtype="bfloat16",
              block_size=16,
              max_model_len=args.input_len + num_steps * (
                  args.windows + 3) + 64,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=args.budget, evict_selection="l2",
              kv_cache_dtype=args.kv_dtype, max_num_seqs=1,
              num_scheduler_steps=num_steps,
              quantization=args.quantization, seed=0)
    eng = llm.engine
    rng = np.random.default_rng(0)
    eng.add_request(request_id="p",
                    prompt_token_ids=rng.integers(
                        1, 32000, size=args.input_len).tolist(),
                    sampling_params=SamplingParams(
                        temperature=0.0,
                        max_tokens=num_steps * (args.windows + 2),
                        ignore_eos=True))
    # Warm: prefill + 2 decode windows compile everything.
    for _ in range(3):
        eng.step()
    if args.windows == 0:
        # Prefill profile: finish the warm request, trace a fresh
        # request's prefill step only.
        while eng.has_unfinished_requests():
            eng.step()
        eng.add_request(request_id="p2",
                        prompt_token_ids=rng.integers(
                            1, 32000, size=args.input_len).tolist(),
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4,
                            ignore_eos=True))
        jax.profiler.start_trace(args.trace_dir)
        eng.step()          # the prefill
        jax.profiler.stop_trace()
    else:
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.windows):
            eng.step()
        jax.profiler.stop_trace()
    seq = eng.scheduler.running[0] if eng.scheduler.running else None
    print(f"# traced {args.windows} windows x {num_steps} steps "
          f"(kv={args.kv_dtype}, budget={args.budget})")
    out = subprocess.run(
        [sys.executable, "tools/xplane_summary.py", args.trace_dir,
         str(args.top)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
