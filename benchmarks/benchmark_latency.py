#!/usr/bin/env python
"""End-to-end latency benchmark (reference benchmarks/benchmark_latency.py):
repeated single-batch generations, reporting avg and percentile latencies."""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-iters-warmup", type=int, default=2)
    parser.add_argument("--num-iters", type=int, default=5)
    parser.add_argument("--bench-model", type=str, default="llama-3.2-1b")
    parser.add_argument("--json-out", type=str, default=None)
    from vllm_paged_compression_tpu.engine.arg_utils import EngineArgs
    EngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    from vllm_paged_compression_tpu.engine.llm_engine import LLMEngine
    from vllm_paged_compression_tpu.sampling_params import SamplingParams

    engine_args = EngineArgs.from_cli_args(args)
    engine_args.max_model_len = max(engine_args.max_model_len,
                                    args.input_len + args.output_len + 64)
    config = engine_args.create_engine_config()
    if not args.model:
        import bench
        config.model.hf_config = bench.ARCHS[args.bench_model]
    engine = LLMEngine(config)
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    def run_once():
        for i in range(args.batch_size):
            engine.add_request(
                prompt_token_ids=rng.integers(
                    1, 32000, size=args.input_len).tolist(),
                sampling_params=sp)
        t0 = time.perf_counter()
        while engine.has_unfinished_requests():
            engine.step()
        return time.perf_counter() - t0

    for _ in range(args.num_iters_warmup):
        run_once()
    lats = [run_once() for _ in range(args.num_iters)]
    lats = np.array(lats)
    pcts = {p: float(np.percentile(lats, p)) for p in (50, 90, 99)}
    print(f"Avg latency: {lats.mean():.3f} seconds")
    for p, v in pcts.items():
        print(f"{p}% percentile latency: {v:.3f} seconds")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"avg_latency": float(lats.mean()),
                       "percentiles": pcts}, f)


if __name__ == "__main__":
    main()
