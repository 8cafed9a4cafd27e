"""Draft-model proposer: a small model proposes k tokens per step.

Reference analog: vllm/spec_decode/multi_step_worker.py (the draft model
runs k autoregressive steps with its own KV cache and worker).  The
TPU-native re-design is **stateless**: the draft reruns full attention
over a fixed recent window of the request's tokens each speculative step
— no draft KV pool, no draft block tables, no cache coherence with
preemption/eviction, and one fixed-shape jit regardless of history
length.  For the sub-100M drafts this targets, k full forwards over a
128-token window cost far less than the machinery they replace; window
truncation only affects proposal *quality* (bad proposals are simply
rejected by the verifier, never correctness).

Greedy draft => one-hot draft distribution, which is what the rejection
sampler (ops/sampling.rejection_sample) assumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class DraftProposer:
    def __init__(self, model, params, num_speculative_tokens: int,
                 window: int = 128):
        self.model = model
        self.params = params
        self.k = num_speculative_tokens
        self.window = window
        self.wk = window + num_speculative_tokens
        self._jit = jax.jit(functools.partial(self._propose))

    def _propose(self, params, tokens, lens):
        """tokens [B, W+k] left-aligned recent windows, lens [B] valid
        counts -> proposals [B, k] (greedy continuations)."""
        from ..ops.attention import prefill_attention
        model = self.model
        scale = getattr(model.arch, "attn_scale",
                        model.arch.head_dim ** -0.5)
        wk = tokens.shape[1]
        b = tokens.shape[0]
        positions = jnp.arange(wk)

        def one(params, toks, length):
            h, _ = model.forward_hidden(
                params, toks, positions,
                lambda q, k_, v, s: (prefill_attention(q, k_, v, scale,
                                                       length), s))
            last = h[jnp.clip(length - 1, 0, wk - 1)][None]
            return jnp.argmax(model.logits(params, last)[0]).astype(
                jnp.int32)

        def step(carry, _):
            toks, lens = carry
            nxt = jax.vmap(lambda tt, ln: one(params, tt, ln))(toks, lens)
            toks = toks.at[jnp.arange(b),
                           jnp.clip(lens, 0, wk - 1)].set(nxt)
            return (toks, lens + 1), nxt

        (_, _), props = jax.lax.scan(step, (tokens, lens), None,
                                     length=self.k)
        return jnp.swapaxes(props, 0, 1)                    # [B, k]

    def propose(self, histories: list[list[int]]) -> np.ndarray:
        """Batch host entry: recent-window assembly + one jit call."""
        b = len(histories)
        tokens = np.zeros((b, self.wk), np.int32)
        lens = np.zeros(b, np.int32)
        for i, hist in enumerate(histories):
            tail = hist[-self.window:]
            tokens[i, :len(tail)] = tail
            lens[i] = len(tail)
        return np.asarray(self._jit(self.params, tokens, lens))
