#!/usr/bin/env python
"""Merge the per-dtype sweep_fp8_evict.py outputs (std + long-context
rows) into SWEEP_r05.json in the SWEEP_r04 columns format."""

import json
import os
import sys

TMP = "/tmp"
OUT = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_r05.json"

cols: dict[str, list] = {}
for dt, col in (("auto", "bf16"), ("int8", "int8"), ("fp8", "fp8")):
    pts = []
    for path in ([os.path.join(TMP, f"sweep_r05_std_{dt}.json")]
                 + [os.path.join(TMP, f"sweep_r05_long_{dt}_{il}.json")
                    for il in (65536, 131072)]):
        if os.path.exists(path):
            d = json.load(open(path))
            pts.extend(dict(r) for r in d["points"])
    if pts:
        cols[col] = pts

doc = {
    "model": ("llama-3.1-8b (int4 weights, fused decode-layer megakernel "
              "round-5 path; real llama3 128k rope scaling)"),
    "config": ("single request, input N / output 256, eviction "
               "method=global selection=l2, cache_budget = N/2 (BASELINE "
               "config #3); 65k/128k rows (BASELINE config #5 stretch) "
               "prefill via the single-program evict-at-prefill path — "
               "the reference cannot run ANY of these rows (no "
               "quantized-KV x eviction, torch_cuda_sdpa.py:769-772)"),
    "long_context_prefill_note": (
        "The chunked-prefill x eviction strategy is functionally "
        "correct at these lengths (token-identical tests incl. PP) but "
        "was measured COMPILE-PROHIBITIVE for the 64k bench point on "
        "this host: the per-context-bucket program ladder (4-5 distinct "
        "8192-token chunk programs + the final-chunk whole-prompt prune "
        "program) ran >70 min of XLA host compile for ONE point.  The "
        "single-program evict-at-prefill path compiles in minutes and "
        "serves the same budget, so the long rows use it; chunked "
        "remains the right strategy on hosts with normal compile "
        "throughput or a warmed program cache (honest negative "
        "result, round 5)."),
    "hardware": "1x TPU v5e (16 GiB HBM)",
    "methodology": ("one subprocess per point; tok_s = steady-state "
                    "decode rate after 32-token warmup; kv state "
                    "MEASURED from the block table + allocator at "
                    "mid-decode; fused_quant_kernel=true means the "
                    "pallas fused write+attend kernel served the "
                    "quantized pools; column RATIOS at equal N are the "
                    "comparable signal (tunnel bucket luck moves "
                    "absolute rows a few %)"),
    "columns": cols,
}
with open(OUT, "w") as f:
    json.dump(doc, f, indent=1)
print(f"wrote {OUT}: " + ", ".join(
    f"{k}={len(v)} pts" for k, v in cols.items()))
