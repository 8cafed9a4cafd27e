#!/usr/bin/env python
"""Serving load suite: start the live OpenAI server, sweep Poisson
arrival rates until the saturation knee, record TTFT/TPOT/ITL
percentiles per row (VERDICT r5 #6).

Each row runs benchmark_serving.py (with its warmup phase) against one
long-lived server process; eviction on/off are separate server runs.
The knee is visible as the rate where output_tok_s stops tracking the
offered rate and TTFT p50 departs from the unloaded value.

Reference analog: /root/reference/benchmarks/benchmark_serving.py
sweeps + .buildkite serving jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request


def wait_health(port: int, timeout: float = 900.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=5):
                return
        except Exception:
            time.sleep(2.0)
    raise TimeoutError("server did not become healthy")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-model", default="llama-3.1-8b")
    ap.add_argument("--rates", nargs="+", type=float,
                    default=[1.0, 2.0, 4.0, 6.0, 8.0])
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--seconds-per-row", type=float, default=45.0,
                    help="measured window per rate (num prompts = "
                         "rate * seconds, min 24)")
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--evict", nargs="+", default=["on", "off"])
    ap.add_argument("--stream-scheduler-steps", type=int, default=8)
    ap.add_argument("--quantization", default="int4",
                    help="'none' serves unquantized (CPU smoke)")
    ap.add_argument("--cache-budget", type=int, default=512,
                    help="evict-on rows' budget; must be BELOW "
                         "input+output so eviction actually fires "
                         "under load (512 prunes a 512-token prompt's "
                         "working set and evicts through decode)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    sys.path.insert(0, repo)
    import bench
    arch_json = (os.environ.get("VPC_BENCH_ARCH_JSON")
                 or json.dumps(bench.ARCHS[args.bench_model]))

    rows = []
    for ev in args.evict:
        cmd = [sys.executable, "-m", "vllm_paged_compression_tpu.cli",
               "serve", "--hf-config-json", arch_json,
               "--max-model-len", str(args.input_len + args.output_len
                                      + 64),
               "--max-num-seqs", "64",
               "--num-scheduler-steps", "16",
               "--stream-scheduler-steps",
               str(args.stream_scheduler_steps),
               "--port", str(args.port)]
        if args.quantization and args.quantization != "none":
            cmd += ["--quantization", args.quantization]
        if ev == "on":
            cmd += ["--enable-paged-eviction", "--evict-method", "global",
                    "--evict-selection", "l2",
                    "--cache-budget", str(args.cache_budget)]
        srv = subprocess.Popen(cmd, cwd=repo,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL,
                               start_new_session=True)
        try:
            wait_health(args.port)
            for rate in args.rates:
                n = max(24, int(rate * args.seconds_per_row))
                out = f"/tmp/_serving_row_{ev}_{rate}.json"
                p = subprocess.run(
                    [sys.executable, "benchmarks/benchmark_serving.py",
                     "--port", str(args.port),
                     "--num-prompts", str(n),
                     "--input-len", str(args.input_len),
                     "--output-len", str(args.output_len),
                     "--request-rate", str(rate),
                     "--warmup", "4",
                     "--json-out", out],
                    cwd=repo, capture_output=True, text=True,
                    timeout=1800)
                if p.returncode != 0:
                    print(f"# row evict={ev} rate={rate} failed:\n"
                          f"{p.stderr[-1500:]}", file=sys.stderr,
                          flush=True)
                    continue
                r = json.load(open(out))
                r.update({"evict": ev, "offered_rate": rate,
                          "num_prompts": n})
                print(json.dumps(r), flush=True)
                rows.append(r)
        finally:
            os.killpg(os.getpgid(srv.pid), signal.SIGTERM)
            try:
                srv.wait(timeout=30)
            except subprocess.TimeoutExpired:
                os.killpg(os.getpgid(srv.pid), signal.SIGKILL)
            time.sleep(5)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({
                "setup": (f"live OpenAI server, {args.bench_model} int4 "
                          "synthetic weights, 1x v5e; Poisson arrivals, "
                          f"{args.input_len} in / {args.output_len} out, "
                          "streaming; warmup=4 untimed requests/row; "
                          "stream_scheduler_steps="
                          f"{args.stream_scheduler_steps} (windows cap "
                          "while SSE clients attached)"),
                "reference_analog": "benchmarks/benchmark_serving.py "
                                    "(TTFT/TPOT/ITL percentiles under "
                                    "arrival load)",
                "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
