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


def make_batch(rng, batch, pairs, n_queries=1):
    """Episodes ``BOS k1 v1 .. kn vn  Q ka va  Q kb vb ...`` with
    ``n_queries`` recall queries.  Returns (tokens [B, T], query-key
    positions [B, n_queries], targets [B, n_queries]).

    Training uses many queries per episode — one supervised position per
    sequence is far too sparse a signal for the retrieval head to form
    (measured: 4k steps stuck at the ln(NVALS) plateau with one query;
    16 queries crack it in a few hundred).  Engine eval uses
    n_queries=1 so the answer is the single generated token."""
    seq_len = 2 * pairs + 2 + 3 * n_queries
    toks = np.zeros((batch, seq_len), np.int32)
    qpos = np.zeros((batch, n_queries), np.int32)
    tgt = np.zeros((batch, n_queries), np.int32)
    for b in range(batch):
        keys = rng.choice(NKEYS, size=pairs, replace=False)
        vals = rng.integers(0, NVALS, size=pairs)
        row = [BOS]
        for k, v in zip(keys, vals):
            row += [KEY0 + int(k), VAL0 + int(v)]
        qis = rng.choice(pairs, size=n_queries, replace=n_queries > pairs)
        for j, qi in enumerate(qis):
            row += [QTOK, KEY0 + int(keys[qi])]
            qpos[b, j] = len(row) - 1
            tgt[b, j] = VAL0 + int(vals[qi])
            row.append(VAL0 + int(vals[qi]))
        row = row[:-1]          # final answer is what the model predicts
        toks[b, :len(row)] = row
    return toks, qpos, tgt


def build_model():
    from vllm_paged_compression_tpu.models.llama import (LlamaArch,
                                                         LlamaModel)
    arch = LlamaArch.from_hf_config(ARCH)
    return LlamaModel(arch, dtype=jnp.float32)


def train(model, steps=4000, batch=64, pairs=60, lr=1e-3, seed=0,
          log=print):
    """AdamW (warmup + cosine) on multi-query recall cross-entropy with
    a pairs CURRICULUM; returns trained params.

    The retrieval head forms quickly at small episode sizes and then
    transfers — training directly at large ``pairs`` sits on the
    ln(NVALS) plateau indefinitely (measured: 8k steps flat at
    pairs=126), while a 10 → pairs ladder cracks it in a few hundred
    steps per rung."""
    import optax
    from vllm_paged_compression_tpu.ops.attention import prefill_attention
    params = model.init_params(seed)
    scale = model.arch.head_dim ** -0.5
    nq = 16

    def make_fns(cur_pairs):
        seq_len = 2 * cur_pairs + 2 + 3 * nq
        positions = jnp.arange(seq_len)

        def forward_at(params, toks, qpos):
            def one(t, qp):
                h, _ = model.forward_hidden(
                    params, t, positions,
                    lambda q, k, v, s: (prefill_attention(
                        q, k, v, scale, seq_len), s))
                return h[qp]                        # [nq, D]
            h_q = jax.vmap(one)(toks, qpos)         # [B, nq, D]
            return model.logits(params, h_q)        # [B, nq, V]

        def loss_fn(params, toks, qpos, tgt):
            logits = forward_at(params, toks, qpos)
            lp = jax.nn.log_softmax(logits)
            b, nq_ = tgt.shape
            return -jnp.mean(lp[jnp.arange(b)[:, None],
                                jnp.arange(nq_)[None, :], tgt])

        @jax.jit
        def step(params, opt_state, toks, qpos, tgt):
            loss, grads = jax.value_and_grad(loss_fn)(params, toks,
                                                      qpos, tgt)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step, jax.jit(forward_at)

    # Curriculum rungs: double from 10 up to the target episode size,
    # splitting the step budget evenly with the last rung taking slack.
    rungs = [10]
    while rungs[-1] < pairs:
        rungs.append(min(rungs[-1] * 2, pairs))
    per = max(steps // len(rungs), 1)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(200, steps // 10),
        decay_steps=steps, end_value=lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    rng = np.random.default_rng(seed)
    t0 = time.time()
    done = 0
    for ri, cur in enumerate(rungs):
        n = steps - done if ri == len(rungs) - 1 else per
        step, _fwd = make_fns(cur)
        for i in range(n):
            toks, qpos, tgt = make_batch(rng, batch, cur, nq)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(toks),
                                           jnp.asarray(qpos),
                                           jnp.asarray(tgt))
            if i % 200 == 0 or i == n - 1:
                log(f"# rung pairs={cur} step {done + i}: loss "
                    f"{float(loss):.4f} ({time.time() - t0:.0f}s)")
        done += n

    # held-out accuracy at the TARGET shape
    _step, fwd = make_fns(pairs)
    toks, qpos, tgt = make_batch(rng, 256, pairs, nq)
    pred = np.asarray(jnp.argmax(
        fwd(params, jnp.asarray(toks), jnp.asarray(qpos)), axis=-1))
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
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--train-batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    model = build_model()
    params, train_acc = train(model, steps=args.train_steps,
                              batch=args.train_batch, pairs=args.pairs,
                              lr=args.lr,
                              log=lambda m: print(m, file=sys.stderr,
                                                  flush=True))

    rng = np.random.default_rng(123)
    toks, qpos, tgt = make_batch(rng, args.episodes, args.pairs, 1)
    prompts = [toks[i, :qpos[i, 0] + 1] for i in range(args.episodes)]
    targets = tgt[:, 0].tolist()
    seq_len = int(qpos[:, 0].max()) + 1
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
