#!/usr/bin/env python
"""Train an in-image GSM-proxy checkpoint so the lm-eval harness scores
NONZERO end to end.

The zero-egress image ships no trained checkpoints, so every prior
lm_eval_quality.py run scored 0.0 on random weights (LM_EVAL_r04_smoke).
This trainer closes the loop in-image: it trains this repo's own llama
trunk (4 layers / hidden 256, char-level vocab) on the SAME synthetic
GSM-format arithmetic task the harness generates
(lm_eval_quality.synthetic_records — 2-operand addition with the
``#### <answer>`` tail), then saves a fully LLM-loadable model directory:

    config.json  +  engine-native sharded state  +  char-level
    tokenizer.json (tokenizers WordLevel + isolated-char split)

so ``lm_eval_quality.py --model-path <dir> --data synthetic`` exercises
the REAL quality pipeline — checkpoint load, tokenizer, few-shot
prompting, stop strings, strict/flexible extraction — with nonzero
full-cache accuracy and measurable eviction deltas.

Reference analog: .buildkite/lm-eval-harness/run-lm-eval-gsm-vllm-
baseline.sh trains nothing (it downloads checkpoints); in-image training
is the TPU-native substitute.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")  # repo-root execution
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from lm_eval_quality import build_prompt, synthetic_records  # noqa: E402

CHARSET = sorted(set(
    "Question: Tom has  apples and buys  more. How many apples does "
    "Tom have now?\nAnswer: <<+=>>.\n#### 0123456789,"))
PAD = 0          # <unk>/pad share id 0; loss-masked


def char_vocab() -> dict:
    v = {"<unk>": 0}
    for i, ch in enumerate(CHARSET):
        v[ch] = i + 1
    return v


def save_tokenizer(out_dir: str) -> None:
    from tokenizers import (Regex, Tokenizer, decoders, models,
                            pre_tokenizers)
    tok = Tokenizer(models.WordLevel(char_vocab(), unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex("[\\s\\S]"),
                                             behavior="isolated")
    tok.decoder = decoders.Fuse()
    tok.save(os.path.join(out_dir, "tokenizer.json"))


def encode(text: str, vocab: dict) -> list[int]:
    return [vocab.get(ch, 0) for ch in text]


ARCH = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 64, "hidden_size": 256, "intermediate_size": 512,
    "num_hidden_layers": 4, "num_attention_heads": 8,
    "num_key_value_heads": 8, "max_position_embeddings": 2048,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": None,
}


def make_example(rng, vocab, t_len: int):
    """One training sequence: 0-2 few-shot QAs + the target QA, loss
    masked to every answer span (the completion the harness scores)."""
    n_shots = int(rng.integers(0, 6))   # cover the harness's 5-shot eval
    recs = synthetic_records(n_shots + 1, seed=int(rng.integers(1 << 30)))
    shots, target = recs[:n_shots], recs[n_shots]
    prompt = build_prompt(shots, target["question"])
    # Trailing blank line is deliberate: the model learns to EMIT the
    # "\n\n" terminator, so the harness's stop=["\n\n"] truncates the
    # completion cleanly (flexible-extract takes the LAST number — an
    # unterminated generation would bury the answer under babble).
    full = prompt + " " + target["answer"] + "\n\n"
    ids = encode(full, vocab)
    mask = np.zeros(len(ids), np.float32)
    # answer spans: after every "Answer:" up to the next newline-newline
    text = full
    start = 0
    while True:
        i = text.find("Answer:", start)
        if i < 0:
            break
        j = text.find("\n\n", i)
        if j < 0:
            j = len(text)
        mask[i + len("Answer:"):min(j + 2, len(ids))] = 1.0
        start = i + 1
    ids = ids[:t_len]
    mask = mask[:len(ids)]
    out_ids = np.full(t_len, PAD, np.int64)
    out_m = np.zeros(t_len, np.float32)
    out_ids[:len(ids)] = ids
    out_m[:len(mask)] = mask
    return out_ids, out_m


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t-len", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/gsm_proxy_ckpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vllm_paged_compression_tpu.models.registry import build_model
    from vllm_paged_compression_tpu.models.weights import (
        save_sharded_state)
    from vllm_paged_compression_tpu.ops.attention import prefill_attention

    vocab = char_vocab()
    model = build_model(ARCH, dtype=jnp.float32)
    params = model.init_params(args.seed)
    scale = model.arch.head_dim ** -0.5
    T = args.t_len
    pos = jnp.arange(T)
    rng = np.random.default_rng(args.seed)

    def lm_loss(params, toks, mask):
        def one(t):
            h, _ = model.forward_hidden(
                params, t, pos,
                lambda q, k, v, s: (prefill_attention(q, k, v, scale, T),
                                    s))
            return h
        logits = model.logits(params, jax.vmap(one)(toks))
        lp = jax.nn.log_softmax(logits)
        tg = toks[:, 1:]
        pred = jnp.take_along_axis(lp[:, :-1], tg[..., None], -1)[..., 0]
        m = mask[:, 1:]
        return -jnp.sum(pred * m) / jnp.maximum(jnp.sum(m), 1.0)

    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr / 20))
    ostate = opt.init(params)

    @jax.jit
    def step20(params, ostate, toks, masks):
        def body(c, x):
            p, oo = c
            loss, g = jax.value_and_grad(lm_loss)(p, *x)
            u, oo = opt.update(g, oo, p)
            return (optax.apply_updates(p, u), oo), loss
        (params, ostate), losses = jax.lax.scan(body, (params, ostate),
                                                xs=(toks, masks))
        return params, ostate, losses[-1]

    t0 = time.time()
    done = 0
    while done < args.steps:
        # NOTE: tokens and masks must come from the SAME examples.
        exs = [[make_example(rng, vocab, T) for _ in range(args.batch)]
               for _ in range(20)]
        ts = jnp.asarray(np.stack(
            [np.stack([e[0] for e in row]) for row in exs]))
        ms = jnp.asarray(np.stack(
            [np.stack([e[1] for e in row]) for row in exs]))
        params, ostate, loss = step20(params, ostate, ts, ms)
        done += 20
        if done % 500 == 0:
            print(f"# step {done} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
            if float(loss) < 0.003:
                print("# converged", file=sys.stderr, flush=True)
                break

    # Quick greedy self-check on fresh episodes (teacher-free prefill
    # argmax over the answer span is NOT generation; the harness does
    # real generation — this is just a training-quality signal).
    os.makedirs(args.out, exist_ok=True)
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    save_sharded_state(params_bf16, args.out)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump({**ARCH, "torch_dtype": "bfloat16"}, f, indent=1)
    save_tokenizer(args.out)
    print(json.dumps({"out": args.out, "steps": done,
                      "final_loss": round(float(loss), 4)}))


if __name__ == "__main__":
    main()
