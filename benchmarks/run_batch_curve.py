#!/usr/bin/env python
"""Continuous-batching throughput curve driver (BASELINE config #4,
VERDICT r2 #2): offered load 1/8/64/256 requests, eviction on AND off,
one benchmark_throughput.py subprocess per point.

The per-point JSON carries peak_concurrent and preemptions so the curve
shows what the scheduler actually sustained: on a 16 GiB chip the KV
pool, not max_num_seqs, gates concurrency for the evict-off column —
which is itself the point of the comparison (eviction admits more
concurrent sequences at equal memory).

Reference analog: benchmarks/benchmark_throughput.py:164 run_vllm with
its committed single-log batching run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-model", default="llama-3.1-8b")
    ap.add_argument("--quantization", default="int4")
    ap.add_argument("--input-len", type=int, default=1024)
    ap.add_argument("--output-len", type=int, default=1024)
    ap.add_argument("--loads", nargs="+", type=int,
                    default=[1, 8, 64, 256])
    ap.add_argument("--off-loads", nargs="+", type=int, default=None,
                    help="offered loads for the evict-off column "
                         "(default: same as --loads)")
    ap.add_argument("--cache-budget", type=int, default=1024)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = []
    for evict in (True, False):
        loads = args.loads if evict else (args.off_loads or args.loads)
        for n in loads:
            cmd = [sys.executable, "benchmarks/benchmark_throughput.py",
                   "--bench-model", args.bench_model,
                   "--num-prompts", str(n),
                   "--input-len", str(args.input_len),
                   "--output-len", str(args.output_len),
                   "--max-num-seqs", str(min(n, 64)),
                   "--json-out", "/tmp/_bt_point.json"]
            if args.quantization:
                cmd += ["--quantization", args.quantization]
            if evict:
                cmd += ["--enable-paged-eviction", "--evict-method",
                        "global", "--evict-selection", "l2",
                        "--cache-budget", str(args.cache_budget)]
            p = subprocess.run(cmd, cwd=repo, capture_output=True,
                               text=True)
            if p.returncode != 0:
                print(f"# point n={n} evict={evict} failed "
                      f"(rc={p.returncode}):\n{p.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            r = json.load(open("/tmp/_bt_point.json"))
            r.update({"offered": n, "evict": evict,
                      "cache_budget": args.cache_budget if evict
                      else None})
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"model": args.bench_model,
                       "quant": args.quantization,
                       "input_len": args.input_len,
                       "output_len": args.output_len,
                       "methodology": (
                           "single run per point; output_tok_s_seg is "
                           "the stall-aware segment-median (drop first "
                           "10% of tokens, median of ~8 contiguous "
                           "segment rates — bench.py methodology); "
                           "output_tok_s is the whole-run rate incl. "
                           "compile/stalls"),
                       "points": results}, f, indent=1)


if __name__ == "__main__":
    main()
