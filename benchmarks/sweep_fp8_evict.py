#!/usr/bin/env python
"""FP8-KV + eviction sequence-length sweep (BASELINE config #3).

For each input length, runs single-request decode with the KV cache in
fp8 (or int8/bf16 via --kv-dtype) and paged eviction at a budget that is
a fraction of the input (default 50%), reporting decode tok/s and the
physical KV-cache HBM bytes per cached token.

The reference could not combine fp8 KV with eviction (its eviction
backend rejects fp8 KV, vllm/attention/backends/torch_cuda_sdpa.py:769-772;
fp8 KV scales live in vllm/model_executor/layers/quantization/
kv_cache.py:63-73) — this sweep is the on-chip evidence that the TPU
build's combination works and holds throughput.

Output: one JSON line per point:
  {"input_len", "budget", "kv_dtype", "tok_s", "kv_bytes_per_token",
   "ttft_s"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")  # repo-root execution

import numpy as np  # noqa: E402


def run_point(model_cfg, input_len, output_len, budget, kv_dtype, quant,
              num_steps, chunked=False):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    extra = {}
    if chunked:
        # 64k/128k prefill strategy (BASELINE config #5 stretch): chunked
        # prefill x eviction — chunks write full pages, the final chunk
        # scores the whole prompt and compacts to the budget.
        extra = dict(enable_chunked_prefill=True,
                     max_num_batched_tokens=8192)
    llm = LLM(hf_config=model_cfg, dtype="bfloat16", block_size=16,
              max_model_len=input_len + output_len + 64,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=budget, evict_selection="l2",
              kv_cache_dtype=kv_dtype, max_num_seqs=1,
              num_scheduler_steps=num_steps, quantization=quant, seed=0,
              **extra)
    eng = llm.engine
    ce = eng.cache_engine
    rng = np.random.default_rng(0)

    # Untimed warmup request: compile prefill + decode programs.
    eng.add_request(request_id="w",
                    prompt_token_ids=rng.integers(
                        1, 32000, size=input_len).tolist(),
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=2 * num_steps,
                        ignore_eos=True))
    while eng.has_unfinished_requests():
        eng.step()

    eng.add_request(request_id="b",
                    prompt_token_ids=rng.integers(
                        1, 32000, size=input_len).tolist(),
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=output_len,
                        ignore_eos=True))
    t0 = time.perf_counter()
    eng.step()
    ttft = time.perf_counter() - t0
    seq = eng.scheduler.running[0]
    warm = max(min(32, output_len // 4), 1)
    while seq.num_output_tokens < warm and eng.has_unfinished_requests():
        eng.step()
    # MEASURED steady-state cache state (not asserted from config): the
    # block table's physical slot/page counts and the allocator's live
    # page count prove eviction actually reclaimed memory mid-decode.
    held_slots = seq.block_table.num_kv_slots
    held_pages = len(seq.block_table.pages)
    used_pages = eng.scheduler.allocator.num_allocated_blocks
    n0, t1 = seq.num_output_tokens, time.perf_counter()
    while eng.has_unfinished_requests():
        eng.step()
    dt = time.perf_counter() - t1
    n = seq.num_output_tokens - n0
    runner = eng.runner
    fused_quant = (runner.attn_backend == "pallas"
                   and ce.quantized_kv
                   and runner.model.arch.head_dim % 128 == 0)
    return {
        "input_len": input_len, "budget": budget, "kv_dtype": kv_dtype,
        "tok_s": round(n / max(dt, 1e-9), 2),
        "kv_bytes_per_token": round(
            held_pages * ce.page_bytes / max(held_slots, 1), 1),
        "kv_tokens_held": held_slots,
        "kv_pages_held": held_pages,
        "allocator_pages_used": used_pages,
        "fused_quant_kernel": fused_quant,
        "ttft_s": round(ttft, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-model", default="llama-3.2-3b")
    ap.add_argument("--input-lens", nargs="+", type=int,
                    default=[1024, 2048, 4096, 8192, 16384, 32768])
    ap.add_argument("--output-len", type=int, default=256)
    ap.add_argument("--budget-frac", type=float, default=0.5)
    ap.add_argument("--kv-dtype", default="fp8",
                    choices=["auto", "fp8", "int8"])
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--num-scheduler-steps", type=int, default=64)
    ap.add_argument("--chunked-prefill", action="store_true",
                    help="prefill via 8192-token chunks (the 64k/128k "
                         "long-context strategy)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import bench
    cfg = bench.ARCHS[args.bench_model]
    results = []
    if len(args.input_lens) > 1 \
            and os.environ.get("VPC_SWEEP_INPROC") != "1":
        # One subprocess per point: consecutive engine inits in one
        # process accumulate not-yet-freed HBM and crash the TPU worker
        # around the 5th init (reproduced twice at the 16k/32k points).
        import subprocess
        for il in args.input_lens:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--bench-model", args.bench_model,
                   "--input-lens", str(il),
                   "--output-len", str(args.output_len),
                   "--budget-frac", str(args.budget_frac),
                   "--kv-dtype", args.kv_dtype,
                   "--num-scheduler-steps",
                   str(args.num_scheduler_steps)]
            if args.chunked_prefill:
                cmd += ["--chunked-prefill"]
            if args.quantization:
                cmd += ["--quantization", args.quantization]
            p = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))))
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")]
            if p.returncode != 0 or not line:
                print(f"# point input_len={il} failed (rc="
                      f"{p.returncode}):\n{p.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            r = json.loads(line[-1])
            print(json.dumps(r), flush=True)
            results.append(r)
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump({"model": args.bench_model,
                           "kv_dtype": args.kv_dtype,
                           "budget_frac": args.budget_frac,
                           "points": results}, f, indent=1)
        return
    for il in args.input_lens:
        budget = max(int(il * args.budget_frac) // 16 * 16, 128)
        r = run_point(cfg, il, args.output_len, budget, args.kv_dtype,
                      args.quantization, args.num_scheduler_steps,
                      chunked=args.chunked_prefill)
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"model": args.bench_model,
                       "kv_dtype": args.kv_dtype,
                       "budget_frac": args.budget_frac,
                       "points": results}, f, indent=1)


if __name__ == "__main__":
    main()
