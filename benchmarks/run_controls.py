#!/usr/bin/env python
"""Headline-control matrix driver (VERDICT r2 #3): runs bench.py under a
grid of env configs, one subprocess per point, and collects the JSON
lines.

Default grid:
- 8B int4, eviction ON  (the headline config)
- 8B int4, eviction OFF (the within-repo control: eviction must not
  cost throughput at equal batch — BASELINE.md's own bar)
- 3B bf16, eviction ON / OFF (the apples-to-apples dtype anchor against
  the reference's bf16-on-A100 number)
- 8B int4, eviction ON, output 8192 (the reference's exact canonical
  output length, benchmarks/llama3.1_8b_test_sdpa.txt)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

GRID = [
    {"name": "8b_int4_evict_on",
     "env": {"VPC_BENCH_MODEL": "llama-3.1-8b", "VPC_BENCH_EVICT": "1"}},
    {"name": "8b_int4_evict_off",
     "env": {"VPC_BENCH_MODEL": "llama-3.1-8b", "VPC_BENCH_EVICT": "0"}},
    {"name": "3b_bf16_evict_on",
     "env": {"VPC_BENCH_MODEL": "llama-3.2-3b", "VPC_BENCH_EVICT": "1"}},
    {"name": "3b_bf16_evict_off",
     "env": {"VPC_BENCH_MODEL": "llama-3.2-3b", "VPC_BENCH_EVICT": "0"}},
    {"name": "8b_int4_evict_on_out8192",
     "env": {"VPC_BENCH_MODEL": "llama-3.1-8b", "VPC_BENCH_EVICT": "1",
             "VPC_BENCH_OUTPUT_LEN": "8192"}},
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="+", default=None,
                    help="subset of grid names")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for point in GRID:
        if args.only and point["name"] not in args.only:
            continue
        env = dict(os.environ)
        env.update(point["env"])
        p = subprocess.run([sys.executable, "bench.py"], cwd=repo,
                           env=env, capture_output=True, text=True)
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            print(f"# {point['name']} failed (rc={p.returncode}):\n"
                  f"{p.stderr[-2000:]}", file=sys.stderr, flush=True)
            continue
        r = json.loads(lines[-1])
        r["config"] = point["name"]
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"baseline_tok_s": 65.78,
                       "baseline": "Llama-3.1-8B bf16 A100-40G, fork "
                                   "TORCH_SDPA full cache (BASELINE.md)",
                       "lines": results}, f, indent=1)


if __name__ == "__main__":
    main()
