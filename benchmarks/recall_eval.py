#!/usr/bin/env python
"""Eviction-quality harness: key-value associative recall on a model with
an exact, analytically PLANTED retrieval circuit.

The zero-egress image ships no checkpoints, and RANDOM weights have no
attention structure — any eviction diverges the greedy continuation at
token 1, so accuracy_eval.py's agreement metric saturates at 0 for every
method.  This harness instead builds a 2-layer Llama (this repo's own
trunk) whose weights implement associative recall BY CONSTRUCTION
(build_constructed_params: a rope-phase-shift previous-token head feeding
a slow-rope-plane content-matching head — 100% recall at full cache,
deterministic):

    BOS  k1 v1  k2 v2 ... kn vn  Q  ki   ->   vi

The engine serves the episodes at full cache and under each eviction
method × budget; the metric is recall accuracy of the queried value —
pairs whose KV rows were evicted become unrecoverable, so accuracy
degrades with budget and differentiates the methods (streamingLLM keeps
sink+recent pairs; global/local L2 keep high-score rows).  Because the
circuit is exact, every accuracy delta is attributable to eviction
alone.

Two tasks share the planted circuit:

- ``prompt`` (single-token answer): measures PROMPT pruning only — the
  original harness.  Decode-boundary eviction never engages
  (max_tokens=1), which is why streamingLLM and streamingLLM-1 used to
  post byte-identical numbers.
- ``chain`` (pointer-chasing generation): pair values are themselves
  keys forming a random non-repeating chain; the model must GENERATE
  the whole chain (every hop is a fresh retrieval from the pairs
  section).  The generated tokens push the sequence across block
  boundaries past the budget, so the DECODE-time eviction loop (the
  reference's _prune_decode_reqs_*, torch_cuda_sdpa.py:1375-1560) fires
  repeatedly mid-generation and each method's victim choice shows up as
  a distinct accuracy-vs-depth decay: streamingLLM kills whole early
  blocks at boundaries, streamingLLM-1 additionally zero-overwrites
  off-boundary slots, inverse_key_l2 (decode-time only) zeroes random
  middle slots without shrinking kv_len, local/global pick by page L2.

A gradient-descent variant (--mode trained) is kept for reference; on
this task SGD reliably stalls on the "attend to all value positions"
plateau (loss ln(NVALS)) across 2-4-layer / 128-256-dim configs, which
is why the planted circuit is the default.

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

BOS, QTOK, SEP = 1, 2, 3
KEY0, NKEYS = 10, 300
VAL0, NVALS = 320, 64
VOCAB = 400

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


def make_chain_batch(rng, batch, pairs, chain_len):
    """Pointer-chasing episodes for DECODE-time eviction quality.

    ``BOS  k_{p1} v_{p1} SEP  k_{p2} v_{p2} SEP ...  QTOK k_start``
    where the value of chain pair j is the KEY of chain pair j+1 (a
    random non-repeating walk of length chain_len through the pairs).
    Non-chain pairs get VAL-range fillers.  The SEP between pairs keeps
    pair adjacency out of the matching head: without it, position(k_j)
    has predecessor v_{j-1}, planting a spurious v→k mapping that
    collides with chain queries (v's ARE k's here).  Each hop the model
    must retrieve f(k) from the pairs section — which decode-boundary
    eviction is eating in the background.

    Returns (tokens [B, T], expected chains [B, chain_len]).
    """
    assert chain_len < pairs
    seq_len = 1 + 3 * pairs + 2
    toks = np.zeros((batch, seq_len), np.int32)
    chains = np.zeros((batch, chain_len), np.int32)
    for b in range(batch):
        keys = rng.choice(NKEYS, size=pairs, replace=False) + KEY0
        order = rng.permutation(pairs)           # chain visits these
        vals = rng.integers(0, NVALS, size=pairs) + VAL0
        for j in range(chain_len):
            vals[order[j]] = keys[order[j + 1]]
        row = [BOS]
        for k, v in zip(keys, vals):
            row += [int(k), int(v), SEP]
        row += [QTOK, int(keys[order[0]])]
        toks[b, :len(row)] = row
        chains[b] = keys[order[1:chain_len + 1]]
    return toks, chains


def build_model():
    from vllm_paged_compression_tpu.models.llama import (LlamaArch,
                                                         LlamaModel)
    arch = LlamaArch.from_hf_config(ARCH)
    return LlamaModel(arch, dtype=jnp.float32)


def build_constructed_params(model, seed=0):
    """Analytically constructed 2-layer retrieval circuit (no training).

    Gradient descent on this task reliably stalls on the "value set"
    solution (attend to all value positions; loss pins to ln(NVALS) —
    measured across 2-4 layer / 128-256 dim / tied & untied configs), so
    the harness PLANTS the classic induction circuit by hand in the
    repo's own Llama trunk:

    - Every token embedding = α·u0 + β·code_t over residual dims
      [0, 48) (S_E); u0 a shared unit vector.
    - Layer-1 head 0 = previous-token head: W_q reads the u0 component
      into the FAST rope planes (0..2); W_k does the same through a
      fixed extra rotation by one position (R_{+1} baked into the
      weights), so score(i, j) peaks exactly at j = i - 1 independent
      of content.  Its OV copies the attended token's S_E code into
      dims [48, 96) (S_P): after layer 1 each position carries its
      predecessor's identity.
    - Layer-2 heads 1..3 = matching heads: W_q maps the position's OWN
      code (S_E), W_k the PREDECESSOR code (S_P), through the same
      random projection into the SLOW rope planes (4..15; rope theta is
      raised to 1e12 so those planes rotate <0.3 rad over the whole
      context — rope-safe content matching).  A query token ki
      therefore attends to the value position whose predecessor is ki.
      Their OV maps the matched value's code to a value-output codebook
      in dims [96, 128) (S_O), and the untied lm_head reads S_O back to
      value-token logits.

    MLPs are zeroed; norms are unit RMSNorms.  The circuit is exact by
    construction (greedy accuracy ~1.0 at full cache), deterministic,
    and every KV row it relies on is position-meaningful — which is
    precisely what an eviction-quality metric needs."""
    rng = np.random.default_rng(seed)
    a = model.arch
    D, H, dh = a.hidden_size, a.num_heads, a.head_dim
    assert (D, H, dh) == (128, 4, 32), "construction assumes 128/4/32"
    V = a.vocab_size
    L = a.num_layers
    half = dh // 2                       # 16 rope planes per head
    theta = a.rope_theta

    def unit_rows(n, d):
        m = rng.standard_normal((n, d)).astype(np.float32)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    # Token code c_t = [m_t, r_t]/√2: a 24-dim MATCH section that maps
    # losslessly onto one head's 12 slow rope planes (a random 48→24
    # projection would add ~1/√24 inner-product noise — at 126 in-context
    # impostors that floor drowns the match), plus a 24-dim residual
    # section.  The previous-token head rides TWO shared carriers: its
    # query reads u_q, its key reads u_k.  Every token carries both —
    # EXCEPT the chain task's SEP, which drops u_q: at SEP positions the
    # previous-token head then has no query, so S_P(SEP) is attention
    # mush instead of the preceding VALUE token's code.  (With a single
    # shared u0, the SEP following a chain key's value occurrence matched
    # that key's queries at full strength, splitting the matching head's
    # mass 50/50 and dropping the readout signal to the noise floor —
    # measured 0.078 full-cache chain accuracy vs ~1.0 with the split.)
    # Code sections are orthogonal to both carriers: leakage into them
    # becomes per-token multiplicative noise (~±25%) that would swamp
    # the previous-token head's ~16% position margin.
    uq, uk = unit_rows(2, 48)
    uk = uk - (uk @ uq) * uq
    uk /= np.linalg.norm(uk)
    m_code = unit_rows(V, 24)
    r_code = unit_rows(V, 24)
    code = np.concatenate([m_code, r_code], axis=1) / np.sqrt(2)
    code = code - np.outer(code @ uq, uq) - np.outer(code @ uk, uk)
    code /= np.linalg.norm(code, axis=1, keepdims=True)
    alpha = 0.5 / np.sqrt(2.0)           # per-carrier amplitude
    beta = np.sqrt(0.75).astype(np.float32)
    embed = np.zeros((V, D), np.float32)
    embed[:, :48] = alpha * (uq + uk)[None, :] + beta * code
    embed[SEP, :48] = alpha * uk + beta * code[SEP]

    def head_cols(h):
        return slice(h * dh, (h + 1) * dh)

    qkv_out = (H + 2 * a.num_kv_heads) * dh
    wqkv = np.zeros((L, D, qkv_out), np.float32)
    wo = np.zeros((L, H * dh, D), np.float32)

    # ---- layer 1, head 0: previous-token head -----------------------
    fast = [0, 1, 2]                     # plane indices
    # carrier amplitude a² dropped from 0.25 (single u0) to 0.125, so
    # the gains rise to keep a²·cq·ck1 = 16 (the margin analysis's
    # operating point).
    cq, ck1 = 11.3137, 11.3137
    u_fast = np.zeros(dh, np.float32)
    for p in fast:
        u_fast[p] = 1.0 / np.sqrt(len(fast))
    # q = cq * (x . u_q in S_E) * u_fast
    wq1 = np.outer(np.pad(uq, (0, D - 48)), u_fast) * cq
    # k = ck * (x . u_k) * R_{+1} u_fast  (rotate each plane by omega_p)
    u_fast_rot = u_fast.copy()
    for p in fast:
        w = theta ** (-2.0 * p / dh)
        # rotate_half convention: plane p couples dims (p, p + half)
        u_fast_rot[p] = u_fast[p] * np.cos(w)
        u_fast_rot[p + half] = u_fast[p] * np.sin(w)
    wk1 = np.outer(np.pad(uk, (0, D - 48)), u_fast_rot) * ck1
    # v = the MATCH section of the token's own code (24 dims, copied
    # verbatim — no compression); OV writes it into S_P dims [48, 72).
    wv1 = np.zeros((D, dh), np.float32)
    wv1[:24, :24] = np.eye(24)
    wo1 = np.zeros((dh, D), np.float32)
    wo1[:24, 48:72] = np.eye(24)
    wqkv[0, :, head_cols(0)] = wq1
    wqkv[0, :, H * dh:][:, head_cols(0)] = wk1
    wqkv[0, :, (H + a.num_kv_heads) * dh:][:, head_cols(0)] = wv1
    wo[0, head_cols(0), :] = wo1

    # ---- layer 2, head 1: content matching --------------------------
    # q reads the position's OWN match code (S_E dims [0, 24)), k the
    # PREDECESSOR's (S_P dims [48, 72)); both land identically on the
    # 12 slow planes, where rope rotates < 0.3 rad over the context.
    slow = list(range(4, half))          # 12 planes -> 24 dims
    cq2, ck2 = 4.0, 4.0

    def to_slow(g):                      # g: [n, 24] -> [n, dh]
        m = np.zeros((g.shape[0], dh), np.float32)
        for j, p in enumerate(slow):
            m[:, p] = g[:, 2 * j]
            m[:, p + half] = g[:, 2 * j + 1]
        return m

    wq2 = np.zeros((D, dh), np.float32)
    wq2[:24, :] = to_slow(np.eye(24, dtype=np.float32)) * cq2
    wk2 = np.zeros((D, dh), np.float32)
    wk2[48:72, :] = to_slow(np.eye(24, dtype=np.float32)) * ck2
    # OV: copy the matched (value) position's own match code VERBATIM
    # into S_O dims [96, 120); the lm_head reads it against the value
    # tokens' match codebook.  (A dense code→codebook linear map
    # accumulates Σ_t (c_t·c_v) noise over the whole vocab — norm ~2.6×
    # the signal — so the readout must be collision-free copy + dot.)
    wv2 = np.zeros((D, dh), np.float32)
    wv2[:24, :24] = np.eye(24)
    wo2 = np.zeros((dh, D), np.float32)
    wo2[:24, 96:120] = np.eye(24)
    wqkv[1, :, head_cols(1)] = wq2
    wqkv[1, :, H * dh:][:, head_cols(1)] = wk2
    wqkv[1, :, (H + a.num_kv_heads) * dh:][:, head_cols(1)] = wv2
    wo[1, head_cols(1), :] = wo2

    lm_head = np.zeros((D, V), np.float32)
    lm_head[96:120, VAL0:VAL0 + NVALS] = m_code[VAL0:VAL0 + NVALS].T
    # The chain task's answers are KEY-range tokens (pair values are
    # keys), so the S_O readout covers them too.  BOS/QTOK/SEP stay
    # unreadable: spurious matches whose OV carries a separator code are
    # invisible to the logits (they only split softmax mass).
    lm_head[96:120, KEY0:KEY0 + NKEYS] = m_code[KEY0:KEY0 + NKEYS].T

    I = a.intermediate_size
    layers = {
        "wqkv": jnp.asarray(wqkv),
        "wo": jnp.asarray(wo),
        "w_gate_up": jnp.zeros((L, D, 2 * I), jnp.float32),
        "w_down": jnp.zeros((L, I, D), jnp.float32),
        "input_norm": jnp.ones((L, D), jnp.float32),
        "post_norm": jnp.ones((L, D), jnp.float32),
    }
    return {"embed": jnp.asarray(embed), "layers": layers,
            "final_norm": jnp.ones((D,), jnp.float32),
            "lm_head": jnp.asarray(lm_head)}


def train(model, steps=4000, batch=64, pairs=60, lr=1e-3, seed=0,
          log=print, chain_pairs=None, chain_len=None):
    """Three-phase recipe (round 4 — replaces the curriculum that sat on
    the copy-any-context-value plateau for every hyperparameter tried):

    1. INDUCTION PRETRAIN: LM loss on VARIABLE-length repeated random
       segments.  Fixed-length repeats train a purely positional
       copy-at-offset head (lm_loss -> 0 with zero transfer, measured);
       variable lengths force content-based key matching — the
       induction head forms in ~2k steps and is the whole game.
    2. RECALL FINETUNE: multi-query episodes with an accuracy-gated
       pairs curriculum.  With the induction head in place this snaps
       to ~1.0 within a few hundred steps per rung (without it, 40k
       steps of direct training, grokking-style finite-data training,
       and fixed-offset pretraining all stay at the ln(context) floor).
    3. CHAIN FINETUNE (when chain_pairs/chain_len given): teacher-forced
       pointer-chasing continuation so the model treats its own sampled
       hop as the next query — the decode-time eviction eval's task.

    Returns (params, held-out full-attention accuracy at the target
    episode size)."""
    import optax
    from vllm_paged_compression_tpu.ops.attention import prefill_attention
    params = model.init_params(seed)
    scale = model.arch.head_dim ** -0.5
    nq = 16
    V = model.arch.vocab_size
    rng = np.random.default_rng(seed)
    t0 = time.time()

    def scan20(loss_fn, opt):
        @jax.jit
        def step20(params, o, *xs):
            def body(c, x):
                p, oo = c
                loss, g = jax.value_and_grad(loss_fn)(p, *x)
                u, oo = opt.update(g, oo, p)
                return (optax.apply_updates(p, u), oo), loss
            (params, o), losses = jax.lax.scan(body, (params, o), xs=xs)
            return params, o, losses[-1]
        return step20

    # ---- phase 1: variable-repeat induction pretrain -------------------
    T1 = 48
    pos1 = jnp.arange(T1)

    def lm_logits(params, toks):
        def one(t):
            h, _ = model.forward_hidden(
                params, t, pos1,
                lambda q, k, v, s: (prefill_attention(q, k, v, scale, T1),
                                    s))
            return h
        return model.logits(params, jax.vmap(one)(toks))

    def lm_loss(params, toks, mask):
        lp = jax.nn.log_softmax(lm_logits(params, toks))
        tg = toks[:, 1:]
        pred = jnp.take_along_axis(lp[:, :-1], tg[..., None], -1)[..., 0]
        return -jnp.sum(pred * mask) / jnp.sum(mask)

    p1_steps = max(steps // 2, 2000)
    opt1 = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, 2e-3, 100, p1_steps, 2e-4))
    o1 = opt1.init(params)
    step1 = scan20(lm_loss, opt1)

    def rep_chunk(n=20, b=128):
        ts = np.zeros((n, b, T1), np.int64)
        ms = np.zeros((n, b, T1 - 1), np.float32)
        for i in range(n):
            for j in range(b):
                L = int(rng.integers(8, 25))
                seg = rng.integers(4, V, size=L)
                ts[i, j, :2 * L] = np.concatenate([seg, seg])
                ms[i, j, L - 1:2 * L - 1] = 1.0
        return jnp.asarray(ts), jnp.asarray(ms)

    done = 0
    while done < p1_steps:
        toks, mask = rep_chunk()
        params, o1, loss = step1(params, o1, toks, mask)
        done += 20
        if done % 500 == 0:
            log(f"# phase1 step {done} lm_loss {float(loss):.3f} "
                f"({time.time() - t0:.0f}s)")
            if float(loss) < 0.05:
                log("# induction formed")
                break

    # ---- phase 2: recall finetune with accuracy-gated curriculum -------
    _fns = {}

    def make_fns(cur, opt):
        if cur in _fns:
            return _fns[cur]
        seq_len = 2 * cur + 2 + 3 * nq
        positions = jnp.arange(seq_len)

        def forward_at(params, toks, qpos):
            def one(t, qp):
                h, _ = model.forward_hidden(
                    params, t, positions,
                    lambda q, k, v, s: (prefill_attention(
                        q, k, v, scale, seq_len), s))
                return h[qp]
            return model.logits(params, jax.vmap(one)(toks, qpos))

        def loss_fn(params, toks, qpos, tgt):
            lp = jax.nn.log_softmax(forward_at(params, toks, qpos))
            b, nq_ = tgt.shape
            return -jnp.mean(lp[jnp.arange(b)[:, None],
                                jnp.arange(nq_)[None, :], tgt])

        @jax.jit
        def acc_fn(params, toks, qpos, tgt):
            pred = jnp.argmax(forward_at(params, toks, qpos), -1)
            return jnp.mean((pred == tgt).astype(jnp.float32))

        _fns[cur] = (scan20(loss_fn, opt), acc_fn)
        return _fns[cur]

    p2_steps = max(steps, 2000)
    opt2 = optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(optax.warmup_cosine_decay_schedule(
                           0.0, lr, 100, p2_steps, lr * 0.1),
                           weight_decay=0.01))
    o2 = opt2.init(params)
    cur = 10
    done = 0
    while done < p2_steps:
        step2, acc_fn = make_fns(cur, opt2)
        ts, qs, gs = [], [], []
        for _ in range(20):
            t, q, g = make_batch(rng, batch, cur, nq)
            ts.append(t)
            qs.append(q)
            gs.append(g)
        params, o2, loss = step2(params, o2, jnp.asarray(np.stack(ts)),
                                 jnp.asarray(np.stack(qs)),
                                 jnp.asarray(np.stack(gs)))
        done += 20
        if done % 500 == 0:
            et, eq, eg = make_batch(rng, 256, cur, nq)
            a = float(acc_fn(params, jnp.asarray(et), jnp.asarray(eq),
                             jnp.asarray(eg)))
            log(f"# phase2 step {done} pairs={cur} acc {a:.3f} "
                f"({time.time() - t0:.0f}s)")
            if a >= 0.85 and cur < pairs:
                cur = min(cur * 2, pairs)
                log(f"# advance to pairs={cur}")
            elif a >= 0.99 and cur == pairs:
                break

    # ---- phase 3: teacher-forced chain continuation --------------------
    if chain_pairs and chain_len:
        T_p = 1 + 3 * chain_pairs + 2
        T3 = T_p + chain_len
        pos3 = jnp.arange(T3)

        def fwd3(params, toks):
            def one(t):
                h, _ = model.forward_hidden(
                    params, t, pos3,
                    lambda q, k, v, s: (prefill_attention(
                        q, k, v, scale, T3), s))
                return h
            return model.logits(params, jax.vmap(one)(toks))

        def loss3(params, toks, chains):
            lp = jax.nn.log_softmax(fwd3(params, toks))
            idx = T_p - 1 + jnp.arange(chain_len)
            sel = lp[:, idx, :]
            return -jnp.mean(jnp.take_along_axis(sel, chains[..., None],
                                                 -1))

        p3_steps = 2000
        opt3 = optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(optax.warmup_cosine_decay_schedule(
                               0.0, 7e-4, 100, p3_steps, 7e-5),
                               weight_decay=0.01))
        o3 = opt3.init(params)
        step3 = scan20(loss3, opt3)
        done = 0
        while done < p3_steps:
            ts, cs = [], []
            for _ in range(20):
                t, c = make_chain_batch(rng, 64, chain_pairs, chain_len)
                ts.append(np.concatenate([t, c], axis=1))
                cs.append(c)
            params, o3, loss = step3(params, o3,
                                     jnp.asarray(np.stack(ts)),
                                     jnp.asarray(np.stack(cs)))
            done += 20
            if done % 500 == 0:
                log(f"# phase3 step {done} chain_loss {float(loss):.3f} "
                    f"({time.time() - t0:.0f}s)")

    # held-out accuracy at the TARGET shape
    _, acc_fn = make_fns(pairs, opt2)
    toks, qpos, tgt = make_batch(rng, 256, pairs, nq)
    acc = float(acc_fn(params, jnp.asarray(toks), jnp.asarray(qpos),
                       jnp.asarray(tgt)))
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


def engine_chain_accuracy(params, prompts, chains, **llm_kw):
    """Serve the chain episodes; greedy-generate the full chain length.

    Returns (token_acc, mean_depth_frac): token_acc is the positional
    match rate over all chain slots; depth is the correct prefix length
    before the first divergence (once a hop is wrong the walk leaves the
    planted chain, so depth is the stricter signal).
    """
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    chain_len = chains.shape[1]
    llm = LLM(hf_config=ARCH, dtype="float32", params=params,
              max_num_seqs=16, num_scheduler_steps=1, seed=0, **llm_kw)
    outs = llm.generate(
        prompt_token_ids=[p.tolist() for p in prompts],
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=chain_len,
                                       ignore_eos=True))
    del llm
    tok_hits, depths = [], []
    for o, chain in zip(outs, chains):
        got = np.asarray(o.outputs[0].token_ids[:chain_len])
        got = np.pad(got, (0, chain_len - len(got)), constant_values=-1)
        hit = got == chain
        tok_hits.append(hit.mean())
        depths.append((np.cumprod(hit).sum()) / chain_len)
    return float(np.mean(tok_hits)), float(np.mean(depths))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--methods", nargs="+",
                    default=["streamingLLM", "streamingLLM-1", "local",
                             "global", "inverse_key_l2"])
    ap.add_argument("--budgets", nargs="+", type=int,
                    default=[128, 192, 256])
    ap.add_argument("--pairs", type=int, default=60,
                    help="KV pairs per episode (prompt ~2*pairs tokens)")
    ap.add_argument("--episodes", type=int, default=128)
    ap.add_argument("--tasks", nargs="+", default=["prompt", "chain"],
                    choices=["prompt", "chain"])
    ap.add_argument("--chain-pairs", type=int, default=60)
    ap.add_argument("--chain-len", type=int, default=48,
                    help="generated hops; prompt+chain must cross the "
                         "budget so decode-boundary eviction engages")
    ap.add_argument("--chain-budgets", nargs="+", type=int, default=None,
                    help="budgets for the chain task (default: sized "
                         "around the chain prompt so eviction happens "
                         "mid-generation, not only at prefill)")
    ap.add_argument("--mode", choices=["constructed", "trained"],
                    default="constructed",
                    help="constructed: analytically planted retrieval "
                         "circuit (exact, deterministic); trained: "
                         "gradient-descent harness (stalls on the "
                         "value-set plateau — kept for reference)")
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--train-batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hidden", type=int, default=None,
                    help="override hidden_size (trained mode; heads "
                         "scale to keep head_dim 32)")
    ap.add_argument("--percentage-row", action="store_true",
                    help="add chain rows with cache_prune_type="
                         "'percentage' at a 50%% budget")
    ap.add_argument("--layers", type=int, default=None,
                    help="override num_hidden_layers (trained mode only "
                         "- the planted circuit is 2-layer by "
                         "construction).  The image ships NO real "
                         "checkpoints (verified: no *.safetensors/*.gguf "
                         "outside test artifacts), so a 4-8 layer "
                         "TRAINED model is the closest available source "
                         "of realistic value-norm distributions for L2 "
                         "scoring.")
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--kv-dtypes", nargs="+", default=["auto"],
                    choices=["auto", "int8", "fp8"],
                    help="KV pool dtypes to sweep: quantized pools make "
                         "L2 scoring read QUANTIZED pages - the "
                         "no-prior-art risk SURVEY section 7 flags")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.mode == "constructed":
        ARCH["rope_theta"] = 1e12
        ARCH["tie_word_embeddings"] = False
        model = build_model()
        params = build_constructed_params(model)
        train_acc = 1.0
    else:
        if args.layers:
            ARCH["num_hidden_layers"] = args.layers
        if args.hidden:
            ARCH["hidden_size"] = args.hidden
            ARCH["intermediate_size"] = 2 * args.hidden
            ARCH["num_attention_heads"] = args.hidden // 32
            ARCH["num_key_value_heads"] = args.hidden // 32
        ARCH["tie_word_embeddings"] = False
        model = build_model()
        params, train_acc = train(
            model, steps=args.train_steps, batch=args.train_batch,
            pairs=args.pairs, lr=args.lr,
            chain_pairs=(args.chain_pairs if "chain" in args.tasks
                         else None),
            chain_len=(args.chain_len if "chain" in args.tasks
                       else None),
            log=lambda m: print(m, file=sys.stderr, flush=True))

    results = []
    rng = np.random.default_rng(123)

    if "prompt" in args.tasks:
        toks, qpos, tgt = make_batch(rng, args.episodes, args.pairs, 1)
        prompts = [toks[i, :qpos[i, 0] + 1] for i in range(args.episodes)]
        targets = tgt[:, 0].tolist()
        seq_len = int(qpos[:, 0].max()) + 1
        base_kw = dict(block_size=args.block_size,
                       max_model_len=seq_len + 16,
                       num_device_blocks=args.episodes // 4 * (
                           seq_len // args.block_size + 2) + 32)

        full = engine_accuracy(params, prompts, targets, args.episodes,
                               **base_kw)
        line = {"task": "prompt", "method": "full-cache",
                "budget": seq_len, "recall_acc": round(full, 4),
                "n": args.episodes, "train_acc": round(train_acc, 4)}
        print(json.dumps(line), flush=True)
        results.append(line)

        for kd in args.kv_dtypes:
            for method in args.methods:
                for budget in args.budgets:
                    acc = engine_accuracy(
                        params, prompts, targets, args.episodes,
                        enable_paged_eviction=True, evict_method=method,
                        cache_budget=budget, evict_selection="l2",
                        topk_blocks=(3 if method == "local" else -1),
                        kv_cache_dtype=kd, **base_kw)
                    line = {"task": "prompt", "method": method,
                            "budget": budget, "kv_dtype": kd,
                            "budget_frac": round(budget / seq_len, 2),
                            "recall_acc": round(acc, 4),
                            "n": args.episodes}
                    print(json.dumps(line), flush=True)
                    results.append(line)

    if "chain" in args.tasks:
        ctoks, chains = make_chain_batch(rng, args.episodes,
                                         args.chain_pairs, args.chain_len)
        cprompts = [t[:1 + 3 * args.chain_pairs + 2] for t in ctoks]
        clen = len(cprompts[0])
        total = clen + args.chain_len
        cbudgets = args.chain_budgets
        if cbudgets is None:
            # One budget above the prompt length (eviction fires ONLY at
            # decode boundaries — the pure decode-time configuration) and
            # one below (prefill pruning + decode eviction combined).
            bs = args.block_size
            cbudgets = [(clen + 2 * bs) // bs * bs,
                        (2 * clen // 3) // bs * bs]
        ckw = dict(block_size=args.block_size, max_model_len=total + 16,
                   num_device_blocks=args.episodes // 4 * (
                       total // args.block_size + 2) + 32)
        for kd in args.kv_dtypes:
            # Per-dtype full-cache row: isolates pure KV-quantization
            # loss from eviction loss.
            acc, depth = engine_chain_accuracy(params, cprompts, chains,
                                               kv_cache_dtype=kd, **ckw)
            line = {"task": "chain", "method": "full-cache",
                    "budget": total, "kv_dtype": kd,
                    "chain_acc": round(acc, 4),
                    "depth_frac": round(depth, 4),
                    "prompt_len": clen, "chain_len": args.chain_len,
                    "n": args.episodes}
            print(json.dumps(line), flush=True)
            results.append(line)
            for method in args.methods:
                for budget in cbudgets:
                    acc, depth = engine_chain_accuracy(
                        params, cprompts, chains,
                        enable_paged_eviction=True, evict_method=method,
                        cache_budget=budget, evict_selection="l2",
                        topk_blocks=(3 if method == "local" else -1),
                        kv_cache_dtype=kd, **ckw)
                    line = {"task": "chain", "method": method,
                            "budget": budget, "kv_dtype": kd,
                            "budget_frac": round(budget / total, 2),
                            "chain_acc": round(acc, 4),
                            "depth_frac": round(depth, 4),
                            "n": args.episodes}
                    print(json.dumps(line), flush=True)
                    results.append(line)

    if args.percentage_row and "chain" in args.tasks:
        # Percentage prune type (the r4 superset knob): 50% of each
        # prompt's length, decode-boundary evictions against the same
        # resolved budget.
        for method in (args.methods[:2] or ["global"]):
            acc, depth = engine_chain_accuracy(
                params, cprompts, chains,
                enable_paged_eviction=True, evict_method=method,
                cache_prune_type="percentage", cache_budget=50,
                evict_selection="l2",
                topk_blocks=(3 if method == "local" else -1), **ckw)
            line = {"task": "chain", "method": method,
                    "prune_type": "percentage", "budget_pct": 50,
                    "chain_acc": round(acc, 4),
                    "depth_frac": round(depth, 4), "n": args.episodes}
            print(json.dumps(line), flush=True)
            results.append(line)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"task": "associative-recall", "mode": args.mode,
                       "arch": ARCH, "pairs": args.pairs,
                       "tasks": args.tasks,
                       "chain_len": args.chain_len,
                       "train_acc": round(train_acc, 4),
                       "lines": results}, f, indent=1)


if __name__ == "__main__":
    main()
