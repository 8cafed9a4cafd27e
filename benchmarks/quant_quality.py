#!/usr/bin/env python
"""int4 / int8 weight-quantization quality vs bf16 at MATCHED weights.

The headline bench serves 8B with the native int4 fused matmul; this
script provides the quality side of that claim on the largest config
whose bf16 twin also fits the chip (3B): ONE set of bf16 weights is
generated, quantized through the production path
(ops/quant.quantize_params_tree -> pallas int4 kernel), and both models
run TEACHER-FORCED over the same token streams.  Free-running greedy
agreement is meaningless on random weights (near-uniform logits flip
argmax at token 0 — the same reason accuracy_eval saturates, see
ACC_r02/ACC_r03 notes), so the metrics are per-position and
distributional:

- argmax agreement of the next-token distribution at every position
- KL(bf16 || quant) per position
- top-1 logit delta in units of the position's logit std

Reference analog: the lm-eval quality gates the reference runs on GPTQ
checkpoints (.buildkite/lm-eval-harness/); with no real checkpoints in
this image, matched-weight teacher-forced divergence is the strongest
available end-model signal (kernel-level numerics are covered by
tests/ops/test_int4_matmul.py).

Output: one JSON line per quantization mode.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def forward_logits(model, params, tokens):
    import jax
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.ops.attention import prefill_attention
    scale = model.arch.head_dim ** -0.5
    t = tokens.shape[0]
    positions = jnp.arange(t)

    @jax.jit
    def fwd(params, toks):
        h, _ = model.forward_hidden(
            params, toks, positions,
            lambda q, k, v, s: (prefill_attention(q, k, v, scale, t), s))
        return model.logits(params, h).astype(jnp.float32)

    return np.asarray(fwd(params, tokens))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bench-model", default="llama-3.2-3b")
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--quants", nargs="+", default=["int8", "int4"])
    ap.add_argument("--arch-json", default=None,
                    help="inline HF config dict (overrides --bench-model;"
                         " used by the CPU smoke test)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import bench
    import jax.numpy as jnp
    from vllm_paged_compression_tpu.models.registry import build_model
    from vllm_paged_compression_tpu.ops.quant import quantize_params_tree

    cfg = (json.loads(args.arch_json) if args.arch_json
           else bench.ARCHS[args.bench_model])
    model = build_model(cfg, dtype=jnp.bfloat16)
    params = model.init_params(0)

    rng = np.random.default_rng(7)
    prompts = [jnp.asarray(rng.integers(
        1, min(32000, cfg["vocab_size"]), size=args.input_len), jnp.int32)
        for _ in range(args.prompts)]
    base = [forward_logits(model, params, p) for p in prompts]

    leaves = ("wqkv", "wo", "w_gate_up", "w_down", "lm_head", "embed")

    def quantize_lowmem(params, bits):
        """quantize_params_tree semantics, but stacked [L, K, N] leaves
        quantize one layer slice at a time — the whole-tree f32 temps
        OOM a 16 GiB chip next to the live bf16 baseline params."""
        from vllm_paged_compression_tpu.ops.quant import quantize_weight
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            quantize_weight_int4)

        def one(k, v):
            if k == "embed":
                return quantize_weight(v, axis=-1)
            if bits == 4:
                if v.ndim == 3:
                    import jax
                    per = [quantize_weight_int4(v[i])
                           for i in range(v.shape[0])]
                    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)
                return quantize_weight_int4(v)
            if v.ndim == 3:
                per = [quantize_weight(v[i], axis=-2)
                       for i in range(v.shape[0])]
                import jax
                return jax.tree.map(lambda *xs: jnp.stack(xs), *per)
            return quantize_weight(v, axis=-2)

        def walk(node):
            if isinstance(node, dict):
                return {k: (one(k, v) if k in leaves
                            and not isinstance(v, dict) else walk(v))
                        for k, v in node.items()}
            return node
        return walk(params)

    results = []
    for q in args.quants:
        qp = quantize_lowmem(params, 4 if q == "int4" else 8)
        agree, kls, dtop = [], [], []
        for p, bl in zip(prompts, base):
            ql = forward_logits(model, qp, p)
            agree.append((bl.argmax(-1) == ql.argmax(-1)).mean())
            lb = bl - bl.max(-1, keepdims=True)
            lq = ql - ql.max(-1, keepdims=True)
            pb = np.exp(lb) / np.exp(lb).sum(-1, keepdims=True)
            logzb = np.log(np.exp(lb).sum(-1))
            logzq = np.log(np.exp(lq).sum(-1))
            # KL(pb||pq) = sum pb*(log pb - log pq)
            kl = (pb * ((lb - logzb[:, None]) - (lq - logzq[:, None]))
                  ).sum(-1)
            kls.append(kl.mean())
            top = bl.argmax(-1)
            rows = np.arange(bl.shape[0])
            dtop.append((np.abs(bl[rows, top] - ql[rows, top])
                         / (bl.std(-1) + 1e-9)).mean())
        line = {
            "model": args.bench_model, "quant": q,
            "teacher_forced_argmax_agreement": round(float(
                np.mean(agree)), 4),
            "mean_kl_bf16_vs_quant": round(float(np.mean(kls)), 5),
            "top1_logit_delta_in_sigma": round(float(np.mean(dtop)), 4),
            "positions": args.input_len * args.prompts,
        }
        print(json.dumps(line), flush=True)
        results.append(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"baseline": "bf16, matched weights, "
                                   "teacher-forced", "lines": results},
                      f, indent=1)


if __name__ == "__main__":
    main()
