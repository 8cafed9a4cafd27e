"""EAGLE speculative proposer (reference vllm/model_executor/models/
eagle.py + spec_decode/multi_step_worker.py; paper arXiv:2401.15077).

EAGLE's draft is a 1-layer decoder that autoregresses over *feature*
space: its input at slot j is ``fc([embed(token_{j+1}) | H_j])`` where
H_j is the TARGET model's output hidden state for position j — so token
j+1 is paired with the feature of the token before it.  For tokens the
draft itself proposed, their "target features" are the draft's own output
hiddens (the feature-level autoregression that distinguishes EAGLE from a
plain small draft model).

TPU-native shape: like spec_decode/draft.py, the proposer is **stateless**
over a fixed recent token window — one target forward produces the window's
hidden sequence, then k fixed-shape draft forwards extend (token, hidden)
buffers in a ``lax.scan``.  No draft KV pool, no coupling with paging or
eviction; window truncation only affects proposal quality (the verifier
keeps outputs exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class EagleProposer:
    """``fc_params``: {"fc_w": [2D, D], optional "fc_b": [D]}; the inner
    draft trunk is a (usually 1-layer) LlamaModel whose params carry their
    own embed / final norm / lm head (tied fallback when absent)."""

    def __init__(self, target_model, target_params, draft_model,
                 draft_params, fc_params, k: int, window: int = 128):
        self.k = k
        self.window = window
        self.wk = window + k
        self.target_model = target_model
        self.target_params = target_params
        self.draft_model = draft_model
        self.draft_params = jax.tree.map(jnp.asarray, draft_params)
        self.fc_params = jax.tree.map(jnp.asarray, fc_params)

        from ..ops.attention import prefill_attention
        wk = self.wk
        t_scale = getattr(target_model.arch, "attn_scale",
                          target_model.arch.head_dim ** -0.5)
        d_scale = getattr(draft_model.arch, "attn_scale",
                          draft_model.arch.head_dim ** -0.5)
        positions = jnp.arange(wk)
        d_positions = jnp.arange(wk - 1)

        def target_hiddens(tparams, toks, length):
            h, _ = target_model.forward_hidden(
                tparams, toks, positions,
                lambda q, k_, v, s: (prefill_attention(
                    q, k_, v, t_scale, length), s))
            return h.astype(jnp.float32)                     # [WK, D]

        def draft_step(dparams, fcp, toks, hids, length):
            """One feature-level draft forward: predict token `length` from
            (toks[1:], hids[:-1]) pairs; returns (next_token, its feature).
            """
            emb = draft_model.embed(dparams, toks[1:])       # [WK-1, D]
            x = jnp.concatenate(
                [emb.astype(jnp.float32), hids[:-1]], axis=-1)
            x = x @ fcp["fc_w"]
            if "fc_b" in fcp:
                x = x + fcp["fc_b"]
            x = x.astype(draft_model.dtype)
            h, _ = draft_model.forward_hidden(
                dparams, jnp.zeros(wk - 1, jnp.int32), d_positions,
                lambda q, k_, v, s: (prefill_attention(
                    q, k_, v, d_scale, length - 1), s),
                input_embeds=x)
            h_last = h[jnp.clip(length - 2, 0, wk - 2)]
            logits = draft_model.logits(dparams, h_last[None])[0]
            return (jnp.argmax(logits).astype(jnp.int32),
                    h_last.astype(jnp.float32))

        def propose(tparams, dparams, fcp, tokens, lens):
            # tokens [B, WK] left-aligned windows, lens [B] -> [B, k]
            b = tokens.shape[0]
            hids = jax.vmap(
                lambda t, n: target_hiddens(tparams, t, n))(tokens, lens)

            def step(carry, _):
                toks, hh, m = carry
                nxt, feat = jax.vmap(
                    lambda t, f, n: draft_step(dparams, fcp, t, f, n))(
                        toks, hh, m)
                idx = jnp.clip(m, 0, wk - 1)
                toks = toks.at[jnp.arange(b), idx].set(nxt)
                hh = hh.at[jnp.arange(b), idx].set(feat)
                return (toks, hh, m + 1), nxt

            (_, _, _), props = jax.lax.scan(step, (tokens, hids, lens),
                                            None, length=self.k)
            return jnp.swapaxes(props, 0, 1)                 # [B, k]

        self._jit = jax.jit(propose)

    def propose(self, histories: list[list[int]]) -> np.ndarray:
        b = len(histories)
        tokens = np.zeros((b, self.wk), np.int32)
        lens = np.zeros(b, np.int32)
        for i, hist in enumerate(histories):
            tail = hist[-self.window:]
            tokens[i, :len(tail)] = tail
            lens[i] = len(tail)
        return np.asarray(self._jit(self.target_params, self.draft_params,
                                    self.fc_params, tokens, lens))


def load_hf_eagle(tensors: dict, draft_model) -> tuple[dict, dict]:
    """Split an EAGLE checkpoint into (draft trunk params, fc params).

    EAGLE checkpoints (reference eagle.py:39-60) hold ``fc.weight``
    ([D, 2D], optional bias), the 1-layer decoder under ``model.layers.*``
    or bare ``layers.*``, usually ``embed_tokens`` (tied from the base
    model) and ``lm_head``; they ship NO final norm — an identity-weight
    RMSNorm slot is injected so the shared trunk stays uniform (proposal-
    quality-only deviation, verification keeps outputs exact)."""
    fc = {"fc_w": np.asarray(tensors.pop("fc.weight")).T}
    if "fc.bias" in tensors:
        fc["fc_b"] = np.asarray(tensors.pop("fc.bias"))
    d = draft_model.arch.hidden_size
    norm_keys = ("model.norm.weight", "norm.weight")
    if not any(k in tensors for k in norm_keys):
        tensors = dict(tensors)
        bare = "embed_tokens.weight" in tensors     # pre-prefix-normalize
        tensors["norm.weight" if bare else "model.norm.weight"] = np.full(
            d, np.sqrt(float(d)), np.float32)
        # sqrt(D)-scaled weight makes RMSNorm ~identity for unit-RMS
        # inputs; exactness is not required (quality-only).
    return draft_model.load_hf_state_dict(tensors), fc


def init_eagle_params(target_model, draft_model, seed: int = 0):
    """Synthetic EAGLE params (tests/benchmarks): random fc + random
    1-layer trunk."""
    rng = np.random.default_rng(seed)
    d = draft_model.arch.hidden_size
    fc = {"fc_w": np.asarray(
        rng.standard_normal((2 * d, d)) * 0.02, np.float32)}
    return draft_model.init_params(seed + 1), fc
