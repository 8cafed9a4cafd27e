#!/usr/bin/env python
"""Eviction-method sweep (reference scripts/diff_methods_full.sh +
collect_var_methods_results.sh): methods x cache budgets x block sizes,
collecting output tok/s into a CSV."""

from __future__ import annotations

import argparse
import csv
import itertools
import subprocess
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bench-model", default="llama-3.2-1b")
    p.add_argument("--methods", nargs="+",
                   default=["streamingLLM-1", "local", "global",
                            "inverse_key_l2"])
    p.add_argument("--budgets", nargs="+", type=int,
                   default=[256, 512, 1024, 2048, 4096])
    p.add_argument("--block-sizes", nargs="+", type=int, default=[16])
    p.add_argument("--num-prompts", type=int, default=8)
    p.add_argument("--input-len", type=int, default=1024)
    p.add_argument("--output-len", type=int, default=512)
    p.add_argument("--out", default="sweep_results.csv")
    args = p.parse_args()

    rows = []
    for method, budget, bs in itertools.product(
            args.methods, args.budgets, args.block_sizes):
        if budget < 3 * bs or budget % bs:
            continue
        cmd = [sys.executable, "benchmarks/benchmark_throughput.py",
               "--bench-model", args.bench_model,
               "--num-prompts", str(args.num_prompts),
               "--input-len", str(args.input_len),
               "--output-len", str(args.output_len),
               "--enable-paged-eviction", "--evict-method", method,
               "--cache-budget", str(budget), "--block-size", str(bs),
               "--num-scheduler-steps", "32",
               "--topk-blocks", "3" if method == "local" else "-1",
               "--json-out", "/tmp/sweep_one.json"]
        print(">>", method, budget, bs, flush=True)
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr[-500:], file=sys.stderr)
            rows.append({"method": method, "budget": budget,
                         "block_size": bs, "output_tok_s": "ERROR"})
            continue
        import json
        with open("/tmp/sweep_one.json") as f:
            res = json.load(f)
        rows.append({"method": method, "budget": budget, "block_size": bs,
                     "output_tok_s": round(res["output_tok_s"], 2)})
        print("   ", rows[-1], flush=True)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["method", "budget", "block_size",
                                          "output_tok_s"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
