#!/usr/bin/env python
"""Micro-benchmarks that decompose the decode-step time budget on chip:

  weights : pure weight-streaming forward (attention = identity) —
            the HBM roofline for the model
  attn    : the paged-decode Pallas kernel alone, at engine shapes
  full    : the engine's real decode window per-token time (from bench.py)

Usage: python benchmarks/micro_decode.py [model]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import ARCHS  # noqa: E402  (repo root on sys.path)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "llama-3.2-3b"
    cfg = ARCHS[model_name]
    from vllm_paged_compression_tpu.models.registry import build_model
    model = build_model(cfg, dtype=jnp.bfloat16)
    params = model.init_params(0)
    n_bytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"weights: {n_bytes / 2**30:.2f} GiB")

    arch = model.arch
    b = 1
    tokens = jnp.zeros((b,), jnp.int32)
    positions = jnp.full((b,), 1024, jnp.int32)

    # 1. weight-streaming bound: attention -> v passthrough
    def ident_attn(q, k, v, layer_cache):
        return q * (1.0 + 0.0 * jnp.sum(v)), layer_cache

    @jax.jit
    def fwd_only(params, tokens, positions):
        hidden, _ = model.forward_hidden(params, tokens, positions,
                                         ident_attn, None)
        return model.logits(params, hidden)

    dt = timeit(fwd_only, params, tokens, positions)
    print(f"weight-stream forward: {dt * 1e3:.2f} ms/token "
          f"({n_bytes / dt / 2**30:.0f} GiB/s, {1 / dt:.1f} tok/s bound)")

    # 2. paged decode kernel at engine shapes (budget 1024, bs 16)
    from vllm_paged_compression_tpu.ops.pallas import (
        paged_decode_attention_pallas)
    page_size, budget = 16, 1024
    max_pages = budget // page_size + 2
    num_pool = 1024
    hkv, d, h = arch.num_kv_heads, arch.head_dim, arch.num_heads
    kc = jnp.zeros((num_pool, page_size, hkv, d), jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    q = jnp.zeros((b, h, d), jnp.bfloat16)
    tables = jnp.tile(jnp.arange(max_pages, dtype=jnp.int32), (b, 1))
    kv_lens = jnp.full((b,), budget, jnp.int32)

    dt1 = timeit(functools.partial(paged_decode_attention_pallas,
                                   scale=d ** -0.5),
                 q, kc, vc, tables, kv_lens, n=100)
    nl = arch.num_layers
    print(f"paged-decode kernel: {dt1 * 1e6:.0f} us/layer -> "
          f"{dt1 * nl * 1e3:.2f} ms/token over {nl} layers "
          f"({max_pages} pages of {page_size})")

    # batched variant (8 seqs)
    q8 = jnp.zeros((8, h, d), jnp.bfloat16)
    tables8 = jnp.tile(tables, (8, 1))
    lens8 = jnp.full((8,), budget, jnp.int32)
    dt8 = timeit(functools.partial(paged_decode_attention_pallas,
                                   scale=d ** -0.5),
                 q8, kc, vc, tables8, lens8, n=100)
    print(f"paged-decode kernel b=8: {dt8 * 1e6:.0f} us/layer")

    # 3. cache scatter write at engine shapes
    from vllm_paged_compression_tpu.ops.cache import write_kv_slots
    k1 = jnp.zeros((b, hkv, d), jnp.bfloat16)
    slots = jnp.zeros((b,), jnp.int32)

    @jax.jit
    def scat(kc, vc, k1, slots):
        return write_kv_slots(kc, vc, k1, k1, slots)

    dt2 = timeit(scat, kc, vc, k1, slots, n=100)
    print(f"write_kv_slots: {dt2 * 1e6:.0f} us/layer -> "
          f"{dt2 * nl * 1e3:.2f} ms/token")


if __name__ == "__main__":
    main()
