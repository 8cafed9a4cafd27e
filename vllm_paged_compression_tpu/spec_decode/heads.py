"""Head-based speculative proposers: Medusa and MLP-speculator.

Reference analog: vllm/spec_decode/medusa_worker.py +
vllm/model_executor/models/medusa.py and mlp_speculator.py.  Both attach
small prediction heads to the TARGET model's last hidden state:

- **Medusa**: head i is a stack of residual blocks (x + SiLU(W x + b))
  followed by its own lm head; head i predicts the token i+1 positions
  ahead, so k heads yield k proposals from ONE hidden state.
- **MLP-speculator** (IBM): a small recurrent cell — each step embeds the
  previously predicted token, mixes it with the carried state
  (state*state_weight + emb*emb_weight), LayerNorms, GELUs, and projects
  to logits; k cells yield k proposals.

TPU-native shape: like the draft proposer (spec_decode/draft.py), the
hidden state comes from a **stateless** target forward over a fixed recent
token window — no KV coupling, one fixed-shape jit.  Proposal quality only
affects the acceptance rate; verification keeps outputs exact regardless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _last_hidden_fn(model, window: int):
    """jit: (params, tokens [B, W], lens [B]) -> h_last [B, D] fp32."""
    from ..ops.attention import prefill_attention
    scale = getattr(model.arch, "attn_scale", model.arch.head_dim ** -0.5)
    positions = jnp.arange(window)

    def one(params, toks, length):
        h, _ = model.forward_hidden(
            params, toks, positions,
            lambda q, k_, v, s: (prefill_attention(q, k_, v, scale,
                                                   length), s))
        return h[jnp.clip(length - 1, 0, window - 1)].astype(jnp.float32)

    def fn(params, tokens, lens):
        return jax.vmap(lambda t, n: one(params, t, n))(tokens, lens)

    return jax.jit(fn)


class _WindowedHeadProposer:
    """Shared host plumbing: recent-window assembly + target hidden."""

    def __init__(self, model, params, k: int, window: int = 128):
        self.model = model
        self.params = params
        self.k = k
        self.window = window
        self._hidden_jit = _last_hidden_fn(model, window)

    def propose(self, histories: list[list[int]]) -> np.ndarray:
        b = len(histories)
        tokens = np.zeros((b, self.window), np.int32)
        lens = np.zeros(b, np.int32)
        last = np.zeros(b, np.int32)
        for i, hist in enumerate(histories):
            tail = hist[-self.window:]
            tokens[i, :len(tail)] = tail
            lens[i] = len(tail)
            last[i] = hist[-1] if hist else 0
        h = self._hidden_jit(self.params, tokens, lens)
        return np.asarray(self._heads_jit(self.head_params, h,
                                          jnp.asarray(last)))


class MedusaProposer(_WindowedHeadProposer):
    """``head_params``: {"W": [k, R, D, D], "b": [k, R, D],
    "lm": [k, D, V]} — R residual blocks then a per-head lm projection
    (HF medusa: medusa_head.{i}.{j}.linear + final .{R}); greedy
    proposals."""

    def __init__(self, model, params, head_params, k: int,
                 window: int = 128):
        super().__init__(model, params, k, window)
        self.head_params = jax.tree.map(jnp.asarray, head_params)

        def heads(hp, h, _last):
            def one_head(W, bb, lm):
                x = h                                     # [B, D]
                for r in range(W.shape[0]):
                    x = x + jax.nn.silu(x @ W[r] + bb[r])
                return jnp.argmax(x @ lm, axis=-1)        # [B]
            props = jax.vmap(one_head)(hp["W"], hp["b"], hp["lm"])
            return jnp.swapaxes(props, 0, 1).astype(jnp.int32)  # [B, k]

        self._heads_jit = jax.jit(heads)

    @staticmethod
    def init_head_params(arch, k: int, num_res_layers: int = 1,
                         seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        d, v = arch.hidden_size, arch.vocab_size
        s = 0.02
        return {
            "W": rng.standard_normal((k, num_res_layers, d, d),
                                     np.float32) * s,
            "b": np.zeros((k, num_res_layers, d), np.float32),
            "lm": rng.standard_normal((k, d, v), np.float32) * s,
        }

    @staticmethod
    def load_hf_heads(tensors: dict, k: int) -> dict:
        """Stack an HF medusa checkpoint: medusa_head.{i}.{j}.linear.{weight,
        bias} residual blocks + medusa_head.{i}.{R}.weight lm projection."""
        W, b, lm = [], [], []
        for i in range(k):
            ws, bs = [], []
            j = 0
            while f"medusa_head.{i}.{j}.linear.weight" in tensors:
                ws.append(np.asarray(
                    tensors[f"medusa_head.{i}.{j}.linear.weight"]).T)
                bs.append(np.asarray(
                    tensors[f"medusa_head.{i}.{j}.linear.bias"]))
                j += 1
            W.append(np.stack(ws))
            b.append(np.stack(bs))
            lm.append(np.asarray(tensors[f"medusa_head.{i}.{j}.weight"]).T)
        return {"W": np.stack(W), "b": np.stack(b), "lm": np.stack(lm)}


class MLPSpeculatorProposer(_WindowedHeadProposer):
    """``head_params``: {"emb": [k, V, I], "proj": [k, Din, I],
    "head": [k, I, V], "ln_w": [k, I], "ln_b": [k, I]} with
    Din = hidden for cell 0 and I afterwards (loaded padded to a common
    Din = max(hidden, I)); state/emb mixing weights follow the IBM
    mlp_speculator (vllm mlp_speculator.py)."""

    def __init__(self, model, params, head_params, k: int,
                 window: int = 128):
        super().__init__(model, params, k, window)
        self.head_params = jax.tree.map(jnp.asarray, head_params)
        inner = int(head_params["ln_w"].shape[-1])
        state_weight = 0.5 ** (0.5 / max(k, 1))
        emb_weight = float(np.sqrt((1 - state_weight ** 2) * (inner / 2)))

        def heads(hp, h, last):
            def cell(carry, xs):
                state, tok = carry
                emb, proj, head, ln_w, ln_b = xs
                z = emb[tok] * emb_weight                    # [B, I]
                s = state @ proj * state_weight + z
                mu = jnp.mean(s, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(s - mu), axis=-1, keepdims=True)
                s = (s - mu) * jax.lax.rsqrt(var + 1e-6) * ln_w + ln_b
                s = jax.nn.gelu(s)
                tok = jnp.argmax(s @ head, axis=-1).astype(jnp.int32)
                # Pad the state back to the carry width (Din >= I).
                pad = state.shape[-1] - s.shape[-1]
                s_pad = jnp.pad(s, ((0, 0), (0, pad)))
                return (s_pad, tok), tok

            (_, _), props = jax.lax.scan(
                cell, (h, last),
                (hp["emb"], hp["proj"], hp["head"], hp["ln_w"], hp["ln_b"]))
            return jnp.swapaxes(props, 0, 1).astype(jnp.int32)

        self._heads_jit = jax.jit(heads)

    @staticmethod
    def init_head_params(arch, k: int, inner_dim: int = 0,
                         seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        d, v = arch.hidden_size, arch.vocab_size
        inner = inner_dim or d
        din = max(d, inner)
        s = 0.02
        return {
            "emb": rng.standard_normal((k, v, inner), np.float32) * s,
            "proj": rng.standard_normal((k, din, inner), np.float32) * s,
            "head": rng.standard_normal((k, inner, v), np.float32) * s,
            "ln_w": np.ones((k, inner), np.float32),
            "ln_b": np.zeros((k, inner), np.float32),
        }

    @staticmethod
    def load_hf_heads(tensors: dict, k: int, hidden: int) -> dict:
        """Stack an IBM mlp_speculator checkpoint (emb.{i}, proj.{i},
        head.{i}, ln.{i}); cell-0's proj [hidden, I] and later cells'
        [I, I] are zero-padded to a common input width."""
        embs = [np.asarray(tensors[f"emb.{i}.weight"]) for i in range(k)]
        projs = [np.asarray(tensors[f"proj.{i}.weight"]).T
                 for i in range(k)]
        heads = [np.asarray(tensors[f"head.{i}.weight"]).T
                 for i in range(k)]
        ln_w = [np.asarray(tensors[f"ln.{i}.weight"]) for i in range(k)]
        ln_b = [np.asarray(tensors[f"ln.{i}.bias"]) for i in range(k)]
        din = max(max(p.shape[0] for p in projs), hidden)
        projs = [np.pad(p, ((0, din - p.shape[0]), (0, 0))) for p in projs]
        return {"emb": np.stack(embs), "proj": np.stack(projs),
                "head": np.stack(heads), "ln_w": np.stack(ln_w),
                "ln_b": np.stack(ln_b)}
