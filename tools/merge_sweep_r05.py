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
    for kind in ("std", "long"):
        p = os.path.join(TMP, f"sweep_r05_{kind}_{dt}.json")
        if os.path.exists(p):
            d = json.load(open(p))
            for r in d["points"]:
                r = dict(r)
                if kind == "long":
                    r["chunked_prefill"] = True
                pts.append(r)
    if pts:
        cols[col] = pts

doc = {
    "model": ("llama-3.1-8b (int4 weights, fused decode-layer megakernel "
              "round-5 path; real llama3 128k rope scaling)"),
    "config": ("single request, input N / output 256, eviction "
               "method=global selection=l2, cache_budget = N/2 (BASELINE "
               "config #3); 65k/128k rows (BASELINE config #5 stretch) "
               "prefill via chunked prefill x eviction, 8192-token "
               "chunks — the reference cannot run ANY of these rows "
               "(no quantized-KV x eviction, torch_cuda_sdpa.py:769-772, "
               "and chunked prefill asserted off with eviction, "
               "scheduler.py:1307)"),
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
