"""In-graph token sampling.

TPU-native analog of the reference Sampler
(vllm/model_executor/layers/sampler.py): one vectorized pass over the batch
with per-sequence parameter arrays — no per-request Python.  Greedy falls out
of temperature==0 via jnp.where, so a single compiled program serves mixed
batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingTensors(NamedTuple):
    """Per-sequence sampling parameters, stacked [B].

    PRNG keys are derived in-graph as fold_in(PRNGKey(seed), step): the host
    passes plain integers, keeping the hot loop free of host-side key
    plumbing while staying deterministic per request.
    """

    temperature: jnp.ndarray   # f32; 0 => greedy
    top_p: jnp.ndarray         # f32 in (0, 1]
    top_k: jnp.ndarray         # i32; <= 0 => disabled
    seed: jnp.ndarray          # i32 per-seq base seed
    step: jnp.ndarray          # i32 decode step counter


def sample(logits: jnp.ndarray, t: SamplingTensors,
           greedy_only: bool = False) -> jnp.ndarray:
    """logits [B, V] -> token ids [B].

    ``greedy_only`` is a static fast path: when the host knows every
    sequence in the batch is greedy it skips the top-k/top-p machinery —
    the full path costs three [B, V] sorts per step, which dominates small
    decode batches on TPU.
    """
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    greedy_ids = jnp.argmax(logits, axis=-1)
    if greedy_only:
        return greedy_ids

    temp = jnp.maximum(t.temperature, 1e-6)[:, None]
    scaled = logits / temp

    # top-k: mask everything below the k-th largest.  k is dynamic per seq;
    # use rank-against-threshold with a static full sort.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(t.top_k > 0, t.top_k, v)
    kth = jnp.take_along_axis(sorted_desc,
                              jnp.clip(k[:, None] - 1, 0, v - 1), axis=1)
    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    # top-p (nucleus): keep the smallest prefix of the sorted distribution
    # with cumulative prob >= top_p; always keep the argmax.
    probs_sorted = jax.nn.softmax(jnp.sort(scaled, axis=-1)[:, ::-1], axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    cutoff_rank = jnp.sum(cum < t.top_p[:, None], axis=-1)  # ranks kept - 1
    thresh = jnp.take_along_axis(
        jnp.sort(scaled, axis=-1)[:, ::-1],
        jnp.clip(cutoff_rank[:, None], 0, v - 1), axis=1)
    scaled = jnp.where(scaled < thresh, -jnp.inf, scaled)

    sampled = jax.vmap(
        lambda seed, step, lg: jax.random.categorical(
            jax.random.fold_in(jax.random.PRNGKey(seed), step), lg)
    )(t.seed, t.step, scaled)
    return jnp.where(t.temperature <= 0.0, greedy_ids, sampled)


def apply_penalties(logits: jnp.ndarray, output_token_counts: jnp.ndarray,
                    presence: jnp.ndarray, frequency: jnp.ndarray,
                    repetition: jnp.ndarray) -> jnp.ndarray:
    """OpenAI-style presence/frequency + HF repetition penalties.

    output_token_counts: [B, V] int32 counts of generated tokens.
    """
    logits = logits.astype(jnp.float32)
    seen = output_token_counts > 0
    logits = logits - presence[:, None] * seen
    logits = logits - frequency[:, None] * output_token_counts
    rep = repetition[:, None]
    logits = jnp.where(seen & (logits > 0), logits / rep, logits)
    logits = jnp.where(seen & (logits <= 0), logits * rep, logits)
    return logits
