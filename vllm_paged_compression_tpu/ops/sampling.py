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
    min_p: jnp.ndarray = None  # f32; 0 => disabled


def sample(logits: jnp.ndarray, t: SamplingTensors,
           greedy_only: bool = False) -> jnp.ndarray:
    """logits [B, V] -> token ids [B].

    ``greedy_only`` is a static fast path: when the host knows every
    sequence in the batch is greedy it skips the top-k/top-p machinery —
    the full path costs three [B, V] sorts per step, which dominates small
    decode batches on TPU.
    """
    logits = logits.astype(jnp.float32)
    greedy_ids = jnp.argmax(logits, axis=-1)
    if greedy_only:
        return greedy_ids

    scaled = _filter_logits(logits, t)
    sampled = jax.vmap(
        lambda seed, step, lg: jax.random.categorical(
            jax.random.fold_in(jax.random.PRNGKey(seed), step), lg)
    )(t.seed, t.step, scaled)
    return jnp.where(t.temperature <= 0.0, greedy_ids, sampled)


def _filter_logits(logits: jnp.ndarray, t: SamplingTensors) -> jnp.ndarray:
    """Temperature + top-k + top-p filtered logits (f32 in, f32 out)."""
    v = logits.shape[-1]
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

    # min-p (reference vllm/model_executor/layers/sampler.py _apply_min_p):
    # drop tokens whose prob < min_p * max_prob.
    if t.min_p is not None:
        probs = jax.nn.softmax(scaled, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        scaled = jnp.where(probs < t.min_p[:, None] * pmax, -jnp.inf,
                           scaled)
    return scaled


def sampling_probs(logits: jnp.ndarray, t: SamplingTensors) -> jnp.ndarray:
    """The actual per-token sampling distribution [B, V] after temperature
    / top-k / top-p filtering; greedy rows (temp <= 0) become one-hot.
    This is the target distribution the rejection sampler verifies
    speculative proposals against (reference
    vllm/model_executor/layers/rejection_sampler.py)."""
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    greedy = jax.nn.one_hot(jnp.argmax(logits, axis=-1), v,
                            dtype=jnp.float32)
    probs = jax.nn.softmax(_filter_logits(logits, t), axis=-1)
    return jnp.where(t.temperature[:, None] <= 0.0, greedy, probs)


def rejection_sample(probs: jnp.ndarray, proposals: jnp.ndarray,
                     seeds: jnp.ndarray, steps: jnp.ndarray):
    """Leviathan-style speculative verification for one-hot drafts.

    Both of this engine's proposers (ngram, greedy draft model) emit
    deterministic proposals, i.e. draft distribution q = one-hot(x_j).
    Then accept x_j with prob min(1, p(x_j)/q(x_j)) = p(x_j), and on
    rejection resample from the residual max(0, p - q) normalized = p with
    the proposed token zeroed out.  Greedy targets (one-hot p) reduce
    exactly to argmax-match verification.

    probs:      [B, k+1, V] target sampling distributions per position
    proposals:  [B, k] proposed token ids
    Returns (tokens [B, k+1], n_accepted [B]): tokens[:, :n] are accepted
    proposals, tokens[:, n] the resampled/bonus token; positions past n
    are garbage (the caller appends n+1 tokens).
    """
    b, kp1, v = probs.shape
    k = kp1 - 1
    iota_b = jnp.arange(b)
    p_prop = jnp.take_along_axis(probs[:, :k, :], proposals[:, :, None],
                                 axis=2)[..., 0]            # [B, k]

    def per_row(seed, step):
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), step), 0x5EC)
        ku, kr = jax.random.split(key)
        return jax.random.uniform(ku, (k,)), kr

    u, rkeys = jax.vmap(per_row)(seeds, steps)
    accept = u < p_prop
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    row = probs[iota_b, n_acc]                              # [B, V]
    rej_tok = proposals[iota_b, jnp.clip(n_acc, 0, k - 1)]
    zeroed = row.at[iota_b, rej_tok].set(0.0)
    zsum = jnp.sum(zeroed, axis=-1, keepdims=True)
    resid = jnp.where(zsum > 0, zeroed / jnp.maximum(zsum, 1e-20), row)
    dist = jnp.where((n_acc < k)[:, None], resid, row)
    final = jax.vmap(lambda kk, d: jax.random.categorical(
        kk, jnp.log(jnp.maximum(d, 1e-20))))(rkeys, dist)
    tokens = jnp.concatenate(
        [proposals, jnp.zeros((b, 1), proposals.dtype)], axis=1)
    tokens = tokens.at[iota_b, n_acc].set(final.astype(tokens.dtype))
    return tokens, n_acc


def typical_acceptance_sample(probs: jnp.ndarray, proposals: jnp.ndarray,
                              posterior_threshold: float = 0.09,
                              posterior_alpha: float = 0.3):
    """Entropy-adaptive deterministic verification (reference
    vllm/model_executor/layers/typical_acceptance_sampler.py, after
    Cai et al. Medusa): accept proposal x_j iff
    p(x_j) > min(threshold, alpha * exp(-H(p))); on the first rejection
    emit argmax(p) (and argmax of the bonus position after a clean run).

    probs:      [B, k+1, V] target sampling distributions per position
    proposals:  [B, k] proposed token ids
    Returns (tokens [B, k+1], n_accepted [B]) with the same contract as
    ``rejection_sample``.
    """
    b, kp1, v = probs.shape
    k = kp1 - 1
    iota_b = jnp.arange(b)
    p_prop = jnp.take_along_axis(probs[:, :k, :], proposals[:, :, None],
                                 axis=2)[..., 0]            # [B, k]
    logp = jnp.log(jnp.maximum(probs[:, :k, :], 1e-20))
    entropy = -jnp.sum(probs[:, :k, :] * logp, axis=-1)     # [B, k]
    threshold = jnp.minimum(posterior_threshold,
                            posterior_alpha * jnp.exp(-entropy))
    accept = p_prop > threshold
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    recovery = jnp.argmax(probs[iota_b, n_acc], axis=-1)    # [B]
    tokens = jnp.concatenate(
        [proposals, jnp.zeros((b, 1), proposals.dtype)], axis=1)
    tokens = tokens.at[iota_b, n_acc].set(recovery.astype(tokens.dtype))
    return tokens, n_acc


def apply_token_bitmask(logits: jnp.ndarray,
                        mask_words: jnp.ndarray) -> jnp.ndarray:
    """Guided-decoding constraint: disallow tokens whose bit is 0.

    mask_words: [B, ceil(V/32)] uint32, bit ``tid % 32`` of word
    ``tid // 32`` set iff token ``tid`` is allowed (packed on host by
    guided/fsm.py TokenFSM.allowed_mask — ~4 KB per row instead of a [V]
    f32 bias, which matters on a thin host<->device link).
    """
    b, w = mask_words.shape
    v = logits.shape[-1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (mask_words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(b, w * 32)[:, :v]
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
    return jnp.where(bits > 0, logits, neg)


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
