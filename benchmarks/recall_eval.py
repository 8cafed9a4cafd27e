#!/usr/bin/env python
"""Trained-model eviction-quality harness: key-value associative recall.

The zero-egress image ships no checkpoints, and RANDOM weights have no
attention structure — any eviction diverges the greedy continuation at
token 1, so accuracy_eval.py's agreement metric saturates at 0 for every
method (committed ACC artifacts showed exactly that).  This harness
instead TRAINS a tiny Llama (this package's own model/trunk, full-cache
jnp attention) on synthetic associative recall:

    BOS  k1 v1  k2 v2 ... kn vn  Q  ki   ->   vi

A 2-layer transformer learns induction/retrieval heads for this task
(>95% held-out accuracy in ~2 min on CPU), giving the cache real,
position-dependent structure.  The engine then serves the SAME weights
at full cache and under each eviction method × budget; the metric is
recall accuracy of the queried value — pairs whose KV rows were evicted
become unrecoverable, so accuracy degrades with budget and
differentiates the methods (streamingLLM keeps sink+recent pairs;
global/local L2 keeps salient rows; inverse_key_l2 zeroes slots).

Reference analog: the fork's lm-eval GSM8K quality harness
(.buildkite/lm-eval-harness/, SURVEY §4) — "accuracy at 25%/50%
eviction" measured on a model that actually uses its context.

Output: one JSON line per (method, budget) plus the full-cache line.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

BOS, QTOK = 1, 2
KEY0, NKEYS = 10, 160
VAL0, NVALS = 200, 64
VOCAB = 320

ARCH = {
    "architectures": ["LlamaForCausalLM"], "vocab_size": VOCAB,
    "hidden_size": 128, "intermediate_size": 256,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 4, "max_position_embeddings": 1024,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def make_batch(rng, batch, pairs):
    """Episodes [B, 2*pairs+3] + target value token per episode."""
    seq_len = 2 * pairs + 3
    toks = np.zeros((batch, seq_len), np.int32)
    tgt = np.zeros(batch, np.int32)
    for b in range(batch):
        keys = rng.choice(NKEYS, size=pairs, replace=False)
        vals = rng.integers(0, NVALS, size=pairs)
        qi = rng.integers(0, pairs)
        row = [BOS]
        for k, v in zip(keys, vals):
            row += [KEY0 + int(k), VAL0 + int(v)]
        row += [QTOK, KEY0 + int(keys[qi])]
        toks[b] = row
        tgt[b] = VAL0 + int(vals[qi])
    return toks, tgt


def build_model():
    from vllm_paged_compression_tpu.models.llama import (LlamaArch,
                                                         LlamaModel)
    arch = LlamaArch.from_hf_config(ARCH)
    return LlamaModel(arch, dtype=jnp.float32)


def train(model, steps=1500, batch=64, pairs=60, lr=3e-3, seed=0,
          log=print):
    """Adam on final-position cross-entropy; returns trained params."""
    import optax
    from vllm_paged_compression_tpu.ops.attention import prefill_attention
    params = model.init_params(seed)
    scale = model.arch.head_dim ** -0.5
    seq_len = 2 * pairs + 3
    positions = jnp.arange(seq_len)

    def forward_last(params, toks):
        def one(t):
            h, _ = model.forward_hidden(
                params, t, positions,
                lambda q, k, v, s: (prefill_attention(q, k, v, scale,
                                                      seq_len), s))
            return h[-1]
        h_last = jax.vmap(one)(toks)               # [B, D]
        return model.logits(params, h_last)        # [B, V]

    def loss_fn(params, toks, tgt):
        logits = forward_last(params, toks)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[jnp.arange(toks.shape[0]), tgt])

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, toks, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(params, toks, tgt)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    t0 = time.time()
    for i in range(steps):
        toks, tgt = make_batch(rng, batch, pairs)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(toks),
                                       jnp.asarray(tgt))
        if i % 200 == 0 or i == steps - 1:
            log(f"# train step {i}: loss {float(loss):.4f} "
                f"({time.time() - t0:.0f}s)")
    # held-out accuracy
    toks, tgt = make_batch(rng, 256, pairs)
    pred = np.asarray(jnp.argmax(
        jax.jit(forward_last)(params, jnp.asarray(toks)), axis=-1))
    acc = float((pred == tgt).mean())
    log(f"# held-out full-attention accuracy: {acc:.3f}")
    return params, acc


def engine_accuracy(params, prompts, targets, n_queries, **llm_kw):
    """Serve the episodes through the engine; accuracy of the 1-token
    greedy answer."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=ARCH, dtype="float32", params=params,
              max_num_seqs=16, num_scheduler_steps=1, seed=0, **llm_kw)
    outs = llm.generate(
        prompt_token_ids=[p.tolist() for p in prompts],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=1))
    pred = [o.outputs[0].token_ids[0] for o in outs]
    del llm
    return float(np.mean([p == t for p, t in zip(pred, targets)]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--methods", nargs="+",
                    default=["streamingLLM", "streamingLLM-1", "local",
                             "global"])
    ap.add_argument("--budgets", nargs="+", type=int,
                    default=[128, 192, 256])
    ap.add_argument("--pairs", type=int, default=60,
                    help="KV pairs per episode (prompt ~2*pairs tokens)")
    ap.add_argument("--episodes", type=int, default=128)
    ap.add_argument("--train-steps", type=int, default=1500)
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    model = build_model()
    params, train_acc = train(model, steps=args.train_steps,
                              pairs=args.pairs,
                              log=lambda m: print(m, file=sys.stderr,
                                                  flush=True))

    rng = np.random.default_rng(123)
    toks, tgt = make_batch(rng, args.episodes, args.pairs)
    prompts = [toks[i] for i in range(args.episodes)]
    targets = tgt.tolist()
    seq_len = toks.shape[1]
    base_kw = dict(block_size=args.block_size,
                   max_model_len=seq_len + 16,
                   num_device_blocks=args.episodes // 4 * (
                       seq_len // args.block_size + 2) + 32)

    results = []
    full = engine_accuracy(params, prompts, targets, args.episodes,
                           **base_kw)
    line = {"method": "full-cache", "budget": seq_len,
            "recall_acc": round(full, 4), "n": args.episodes,
            "train_acc": round(train_acc, 4)}
    print(json.dumps(line), flush=True)
    results.append(line)

    for method in args.methods:
        for budget in args.budgets:
            acc = engine_accuracy(
                params, prompts, targets, args.episodes,
                enable_paged_eviction=True, evict_method=method,
                cache_budget=budget, evict_selection="l2",
                topk_blocks=(3 if method == "local" else -1), **base_kw)
            line = {"method": method, "budget": budget,
                    "budget_frac": round(budget / seq_len, 2),
                    "recall_acc": round(acc, 4), "n": args.episodes}
            print(json.dumps(line), flush=True)
            results.append(line)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"task": "associative-recall",
                       "arch": ARCH, "pairs": args.pairs,
                       "prompt_len": seq_len,
                       "train_acc": round(train_acc, 4),
                       "lines": results}, f, indent=1)


if __name__ == "__main__":
    main()
