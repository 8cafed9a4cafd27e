"""Jitted per-step execution: prefill and decode programs.

TPU-native re-design of the reference ModelRunner + attention backend
(vllm/worker/model_runner.py:186,1623,1662 and
vllm/attention/backends/torch_cuda_sdpa.py).  The reference's per-request
Python loops (SDPA per sequence, CUDA-stream pruning, per-token slot-mapping
loops) collapse into three fixed-shape XLA programs:

- ``decode``: one batched step over all running sequences — cache scatter,
  in-graph victim selection from device-maintained page scores, block-table
  shift, paged attention, sampling.  The eviction feedback loop
  (impl → sampler → engine → scheduler, SURVEY F9) becomes a single
  ``victims`` output fetched together with the sampled tokens.
- ``prefill``: one (bucketed) sequence — optional per-layer prompt pruning
  (evict-then-attend or attend-then-evict), cache write, first-token sample.
- page-score maintenance rides inside both (layer-0 value-L2 per filled
  page, replacing BlockL2NormManager F4).

Shape discipline: batch sizes and prompt lengths are bucketed to keep the
jit cache small; padded lanes write to the cache-pool trash page and are
masked out of attention by kv_len.  Block tables are padded to a static
width (bounded by the cache budget when eviction is on).
"""

from __future__ import annotations

import random
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..core.paging import (
    num_required_blocks_after_prune as _blocks_after_prune)
from ..core.scheduler import ScheduledPrefill, SeqWindowPlan
from ..ops.attention import (context_prefill_attention,
                             paged_decode_attention, prefill_attention,
                             pruned_prefill_attention)
from ..ops.pallas import (flash_context_prefill_attention,
                          flash_prefill_attention,
                          paged_decode_attention_pallas)
from ..ops.pallas.fused_decode import fused_paged_decode_attention
from ..ops.cache import write_kv_pages, write_kv_slots, zero_kv_slots
from ..ops.eviction import (gather_pruned_kv, index_cache_pages,
                            page_scores_from_cache, prompt_keep_indices,
                            select_victims, shift_block_tables, token_scores)
from ..ops.sampling import SamplingTensors, sample
from ..utils import cdiv, init_logger, next_bucket
from .cache_engine import CacheEngine

logger = init_logger(__name__)


def select_attention_backend() -> str:
    """Backend selection, analog of the reference's get_attn_backend +
    VLLM_ATTENTION_BACKEND override (vllm/attention/selector.py:101-174,
    envs.py:270).  "pallas" = TPU kernels (paged decode + flash prefill);
    "jnp" = pure-XLA oracles (always correct, used on CPU where the Pallas
    interpreter would be slow)."""
    from .. import envs
    choice = envs.VPC_ATTENTION_BACKEND.lower()
    if choice == "auto":
        choice = "jnp" if jax.default_backend() == "cpu" else "pallas"
    if choice not in ("pallas", "jnp"):
        raise ValueError(f"VPC_ATTENTION_BACKEND={choice!r} "
                         "(want pallas | jnp | auto)")
    return choice


class WindowHandle:
    """A dispatched-but-unfetched decode window: ``out`` (tokens+victims),
    ``state`` (end-of-window dynamic state) and optional ``lp`` (top-L
    logprobs) are device arrays; ``fetch()`` blocks on the device->host
    transfer."""

    def __init__(self, out_pack, state, k: int, n: int, lp=None,
                 logprobs_l: int = 0):
        self.out_pack = out_pack
        self.state = state
        self.k = k
        self.n = n
        self.lp = lp
        self.logprobs_l = logprobs_l
        # Start the device->host copy as soon as the window completes
        # (fetch() then finds the bytes already on host instead of paying
        # a post-completion transfer roundtrip).
        try:
            out_pack.copy_to_host_async()
            if lp is not None:
                lp.copy_to_host_async()
        except AttributeError:
            pass

    def fetch(self):
        """Returns (tokens [K, n], victims [K, n], logprobs or None) where
        logprobs is [K, n, 2L+1] f32: top-L values, top-L ids, chosen."""
        out = np.asarray(self.out_pack)   # one device->host fetch
        lp = np.asarray(self.lp)[:, :self.n] if self.lp is not None else None
        return out[0, :, :self.n], out[1, :, :self.n], lp


def _pow2_buckets(lo: int, hi: int) -> list[int]:
    out, b = [], lo
    while b < hi:
        out.append(b)
        b *= 2
    out.append(hi)
    return sorted(set(out))


class ModelRunner:
    def __init__(self, model, config: EngineConfig,
                 cache_engine: CacheEngine, mesh=None):
        self.model = model
        self.config = config
        self.cache_engine = cache_engine
        self.mesh = mesh
        pc = config.parallel
        self.pp = pc.pipeline_parallel_size if pc is not None else 1
        if self.pp > 1:
            assert mesh is not None, "pipeline parallelism needs a mesh"
            assert self.pp & (self.pp - 1) == 0, \
                "pipeline_parallel_size must be a power of two"
            assert model.arch.num_layers % self.pp == 0, \
                (model.arch.num_layers, self.pp)
        self.block_size = config.cache.block_size
        ev = config.cache.paged_evict
        self.evict = ev if (ev is not None and ev.enabled) else None
        self.scale = getattr(model.arch, "attn_scale",
                             model.arch.head_dim ** -0.5)
        self.attn_softcap = getattr(model.arch, "attn_logit_softcap", None)

        sched = config.scheduler
        if (self.evict is not None and self.evict.frees_pages
                and not sched.enable_chunked_prefill):
            from ..config import resolve_evict_budget
            _bmax = resolve_evict_budget(self.evict, 0, self.block_size,
                                         max_model_len=sched.max_model_len)
            self.max_table_len = _bmax // self.block_size + 2
        else:
            # Chunked prefill x eviction holds the FULL prompt's pages
            # transiently until the final-chunk prune, so table buckets
            # must span max_model_len even under eviction.
            self.max_table_len = cdiv(sched.max_model_len, self.block_size)
        self.decode_buckets = _pow2_buckets(1, sched.max_num_seqs)
        if self.pp > 1:
            # Microbatching splits the decode batch across stages: lane
            # buckets must be multiples of the stage count.
            self.decode_buckets = sorted(
                {max(bb, self.pp) for bb in self.decode_buckets})
        bs = self.block_size
        self.prefill_buckets = sorted({
            -(-b // bs) * bs for b in _pow2_buckets(
                min(32, sched.max_model_len), sched.max_model_len)})
        self._ctx_page_buckets = _pow2_buckets(1, self.max_table_len)
        # Static cap on stored (pruned) prompt length.
        if self.evict is not None:
            from ..config import resolve_evict_budget
            self.stored_cap = resolve_evict_budget(
                self.evict, 0, self.block_size,
                max_model_len=sched.max_model_len) + self.block_size
        else:
            self.stored_cap = sched.max_model_len

        # Host-side RNG reproducing the reference's shipped random victim
        # mode (random.seed(1234), torch_cuda_sdpa.py:796,802).
        self._victim_rng = random.Random(
            self.evict.random_seed if self.evict else 0)

        self.track_page_scores = (
            self.evict is not None
            and self.evict.evict_method in ("local", "global")
            and self.evict.selection == "l2")

        self.lora_enabled = config.lora is not None
        self.is_mamba = getattr(model, "architecture", "") == "mamba"
        self.attn_backend = select_attention_backend()
        # ALiBi models (Bloom/MPT/JAIS): additive per-head key bias, served
        # by the jnp oracles (Pallas kernels don't take a bias yet).
        self.alibi_slopes = None
        if getattr(model.arch, "alibi", False):
            from ..ops.attention import alibi_slopes as _slopes
            self.alibi_slopes = jnp.asarray(
                _slopes(model.arch.num_heads,
                        getattr(model.arch, "alibi_variant", "bloom"),
                        getattr(model.arch, "alibi_bias_max", 8.0)),
                jnp.float32)
            if self.attn_backend == "pallas":
                logger.info("ALiBi model: using the jnp attention backend")
                self.attn_backend = "jnp"
        # Blocksparse attention (Phi-3-small): exact per-head local+vert
        # masks served by the jnp oracles; per-layer dense switch rides
        # the carry-mode layer index.
        self.blocksparse = None
        if getattr(model.arch, "bs_block", 0):
            a2 = model.arch
            self.blocksparse = dict(
                block=a2.bs_block, local=a2.bs_local_blocks,
                vert=a2.bs_vert_stride, homo=a2.bs_homo,
                heads=a2.num_heads)
            n = a2.bs_dense_every_n
            self._bs_sparse_layers = jnp.asarray(
                [not (n and (i + 1) % n == 0)
                 for i in range(a2.num_layers)])
            if self.attn_backend == "pallas":
                logger.info("Blocksparse model: using the jnp attention "
                            "backend")
                self.attn_backend = "jnp"
        # Sliding-window attention (Mistral / Gemma2 / Cohere2 /
        # Phi-3-mini / StarCoder2): exact window masking via the jnp
        # oracles whenever the window actually bites (< max_model_len).
        # The reference rejects sliding windows with paged eviction
        # (torch_cuda_sdpa.py:567) — so do we; without eviction, physical
        # slot index == logical position, so masks derive from kv lens.
        self.sliding = None
        sw = getattr(model.arch, "sliding_window", None)
        if (sw and not self.is_mamba and self.blocksparse is None
                and sw < sched.max_model_len):
            a2 = model.arch
            if self.evict is not None:
                raise ValueError(
                    f"sliding-window attention (window {sw} < "
                    f"max_model_len {sched.max_model_len}) cannot be "
                    "combined with paged eviction (the reference asserts "
                    "the same); disable eviction or cap max_model_len")
            for bad, what in (
                    (sched.enable_chunked_prefill, "chunked prefill"),
                    (config.cache.enable_prefix_caching,
                     "prefix caching"),
                    (config.speculative is not None,
                     "speculative decoding"),
                    (self.pp > 1, "pipeline parallelism")):
                if bad:
                    raise ValueError("sliding-window attention with "
                                     f"{what} is not supported yet")
            self.sliding = int(sw)
            p = getattr(a2, "sliding_window_pattern", 0)
            self._sw_layers = jnp.asarray(
                [p == 0 or (i + 1) % p != 0
                 for i in range(a2.num_layers)])
            # (Pallas stays on: the fused decode kernel takes per-row
            # window starts — skipping out-of-window pages' DMAs — and
            # the flash prefill kernel takes a traced window.)
        logger.info("Attention backend: %s", self.attn_backend)
        # 64-dim-head models use the fused kernel's flat-page variant; the
        # decode/spec programs carry the pools as [L, NP, ps, Hkv*d] so
        # XLA keeps ONE layout across the layer scan (a 5D carry forces
        # four full-pool relayout copies per layer — measured 9.4x).
        a_ = model.arch
        self.flat_kv = (
            self.attn_backend == "pallas"
            and not cache_engine.quantized_kv
            and a_.head_dim % 128 != 0
            and (a_.num_kv_heads * a_.head_dim) % 128 == 0)
        import functools
        cap = dict(softcap=self.attn_softcap)
        if self.alibi_slopes is not None:
            cap["alibi_slopes"] = self.alibi_slopes
        if self.attn_backend == "pallas":
            self._paged_decode = functools.partial(
                paged_decode_attention_pallas, **cap)
            self._prefill_attn = (
                lambda q, k, v, scale, q_len:
                flash_prefill_attention(q, k, v, scale, q_len, q_len, **cap))
            self._pruned_prefill_attn = functools.partial(
                flash_prefill_attention, **cap)
            self._ctx_attn = functools.partial(
                flash_context_prefill_attention, **cap)
        else:
            self._paged_decode = functools.partial(
                paged_decode_attention, **cap)
            self._prefill_attn = functools.partial(prefill_attention, **cap)
            self._pruned_prefill_attn = functools.partial(
                pruned_prefill_attention, **cap)
            self._ctx_attn = functools.partial(
                context_prefill_attention, **cap)

        import functools
        # Jit caches keyed (greedy, logprobs_l) — greedy-specialized
        # because the generic top-p/top-k sampler's full-vocab sort costs
        # ~65 s of XLA compile for a 128k vocab, and logprobs because the
        # top-L extraction only belongs in traces that asked for it.
        self._decode_window_jits: dict = {}
        self._prefill_plain_jits: dict = {}
        self._prefill_prune_jits: dict = {}
        self._prefill_ctx_jits = {}
        self._prefill_ctx_prune_jits = {}
        self._spec_verify_jit = jax.jit(
            self._spec_verify_pp if self.pp > 1 else self._spec_verify,
            donate_argnums=(1, 2))
        self._spec_verify_sampled_jit = jax.jit(
            self._spec_verify_sampled_pp if self.pp > 1
            else self._spec_verify_sampled,
            donate_argnums=(1, 2))

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _lora_kwargs(self, params, idx):
        """forward_hidden kwargs when multi-LoRA is on (absent otherwise so
        non-LoRA engines keep their traces)."""
        if not self.lora_enabled:
            return {}
        return {"lora": params["lora"], "lora_idx": idx}

    # ---- per-request logit controls (reference logits processors:
    # min-tokens / NoBadWords / allowed_token_ids / OpenAI logit_bias,
    # vllm/model_executor/layers/sampler.py + logits_process.py).  All of
    # them compile into the guided-decoding bitmask + a sparse bias, both
    # applied in-graph — no host-side logits round trip. -------------------

    _BIAS_WIDTH = 64

    @property
    def _mask_w(self) -> int:
        return (self.model.arch.vocab_size + 31) // 32

    @staticmethod
    def _clear_bit(words: np.ndarray, tid: int) -> None:
        if 0 <= tid < words.shape[0] * 32:
            words[tid // 32] &= np.uint32(~np.uint32(1 << (tid % 32)))

    def _static_mask_words(self, seq):
        """Request-constant allowed-token words [W] uint32 or None
        (allowed_token_ids + single-token bad_words), cached on the seq."""
        cached = getattr(seq, "_static_mask_words", False)
        if cached is not False:
            return cached
        p = seq.params
        words = None
        if p.allowed_token_ids is not None:
            bits = np.zeros(self._mask_w * 32, bool)
            for t in p.allowed_token_ids:
                if 0 <= t < bits.shape[0]:
                    bits[t] = True
            words = np.packbits(bits.reshape(-1, 32)[:, ::-1], axis=1,
                                bitorder="big").view(">u4").astype(
                np.uint32).reshape(-1)
        for bw in (p.bad_words or []):
            if len(bw) == 1:
                if words is None:
                    words = np.full(self._mask_w, 0xFFFFFFFF, np.uint32)
                self._clear_bit(words, bw[0])
        seq._static_mask_words = words
        return words

    @staticmethod
    def lane_needs_stepwise_mask(seq) -> bool:
        """True when the mask for step j+1 depends on the token sampled at
        step j (guided FSM, multi-token bad_words) — such sequences must
        run single-step windows."""
        return (seq.guided is not None
                or any(len(w) > 1 for w in (seq.params.bad_words or [])))

    def _lane_needs_mask(self, seq) -> bool:
        p = seq.params
        pending_min = (p.min_tokens > 0
                       and seq.num_output_tokens < p.min_tokens
                       and (seq.eos_token_id is not None
                            or p.stop_token_ids))
        return (seq.guided is not None or p.allowed_token_ids is not None
                or bool(p.bad_words) or pending_min)

    def _lane_mask_words(self, seq, step_offset: int):
        """Allowed-token words for sampling output token number
        ``num_output_tokens + step_offset``; None = unconstrained."""
        p = seq.params
        words = None
        if seq.guided is not None:
            assert step_offset == 0
            words = seq.guided.mask().copy()
        static = self._static_mask_words(seq)
        if static is not None:
            words = static.copy() if words is None else words & static
        for bw in (p.bad_words or []):
            if len(bw) > 1:
                tail = seq.all_output_token_ids[-(len(bw) - 1):]
                if len(tail) == len(bw) - 1 and tail == bw[:-1]:
                    if words is None:
                        words = np.full(self._mask_w, 0xFFFFFFFF,
                                        np.uint32)
                    self._clear_bit(words, bw[-1])
        if p.min_tokens > 0 and \
                seq.num_output_tokens + step_offset < p.min_tokens:
            ban = list(p.stop_token_ids)
            if seq.eos_token_id is not None and not p.ignore_eos:
                ban.append(seq.eos_token_id)
            if ban:
                if words is None:
                    words = np.full(self._mask_w, 0xFFFFFFFF, np.uint32)
                for t in ban:
                    self._clear_bit(words, t)
        return words

    def _bias_arrays(self, seqs, n_pad):
        """Sparse logit_bias rows (ids [B, 64] i32, vals [B, 64] f32) or
        None; padded entries add 0.0 to token 0."""
        if not any(s.params.logit_bias for s in seqs):
            return None
        ids = np.zeros((n_pad, self._BIAS_WIDTH), np.int32)
        vals = np.zeros((n_pad, self._BIAS_WIDTH), np.float32)
        vocab = self.model.arch.vocab_size
        for i, s in enumerate(seqs):
            lb = s.params.logit_bias or {}
            for j, (t, v) in enumerate(lb.items()):
                if 0 <= t < vocab:
                    ids[i, j] = t
                    vals[i, j] = v
        return ids, vals

    def _sampling_tensors(self, batch) -> SamplingTensors:
        return SamplingTensors(
            temperature=batch["temperature"], top_p=batch["top_p"],
            top_k=batch["top_k"], seed=batch["seed"], step=batch["step"],
            min_p=batch["min_p"])

    def _update_page_scores(self, page_scores, v_pool, fill_pages):
        """Record value-L2 scores of pages that just became full (layer 0 —
        the reference's feedback also acts on layer 0's decision,
        model_runner.py:1797-1802).  ``v_pool`` is the layer-stacked V pool
        (plain array, flat-carry array, or QuantKV)."""
        if self.flat_kv:
            v_pool = jax.tree.map(self._kv_view5, v_pool)
        v0 = jax.tree.map(lambda x: x[0], v_pool)
        scores = page_scores_from_cache(
            index_cache_pages(v0, fill_pages))
        return page_scores.at[fill_pages].set(scores)

    def update_fill_scores(self, page_scores, caches, pages: list):
        """Refresh the L2 scores of pages a spec step just filled (host
        list of page ids).  Padded to a bucket with -1 lanes, which land
        on the trash page — the same convention as the window plan's
        fill_pages."""
        if not pages:
            return page_scores
        pad = 8 * (-(-len(pages) // 8))
        arr = np.full(pad, -1, np.int32)
        arr[:len(pages)] = pages
        if not hasattr(self, "_fill_scores_jit"):
            self._fill_scores_jit = jax.jit(
                lambda ps, vc, f: self._update_page_scores(ps, vc, f),
                donate_argnums=(0,))
        return self._fill_scores_jit(page_scores, caches[1],
                                     jnp.asarray(arr))

    # Field order of the per-step plan pack [K, NF, B].
    _PLAN_FIELDS = ("positions", "slots", "evict", "victims", "zero_slots",
                    "fill_pages", "new_pages", "steps")

    # ---- flat-KV carry helpers (see self.flat_kv) -----------------------

    def _kv_carry_in(self, caches):
        if not self.flat_kv:
            return caches
        return jax.tree.map(
            lambda x: x.reshape(*x.shape[:3], -1), caches)

    def _kv_carry_out(self, caches):
        if not self.flat_kv:
            return caches
        a = self.model.arch
        return jax.tree.map(
            lambda x: x.reshape(*x.shape[:3], a.num_kv_heads, a.head_dim),
            caches)

    def _kv_view5(self, pool):
        """5D view of one stacked pool regardless of carry layout.
        QuantKV pools pass through (flat_kv never applies to them)."""
        if not hasattr(pool, "ndim"):
            return pool
        if pool.ndim == 4:
            a = self.model.arch
            return pool.reshape(*pool.shape[:3], a.num_kv_heads,
                                a.head_dim)
        return pool

    def _fused_attn(self, q, k, v, kc_all, vc_all, layer, tables, kv_lens,
                    slots, zero_slots):
        """One decode-attention layer against the STACKED pools: write this
        step's K/V rows in place, then paged attention.  Pallas fused
        kernel on TPU bf16 pools (64-dim heads route to the kernel's
        flat-page variant); slice-update fallback elsewhere (CPU oracle
        path, quantized pools, exotic head dims)."""
        a = self.model.arch
        quant_kv = self.cache_engine.quantized_kv
        # The quantized fused kernel has no flat-page variant: it needs
        # head_dim itself lane-aligned.
        fused_ok = (a.head_dim % 128 == 0
                    or (not quant_kv
                        and (a.num_kv_heads * a.head_dim) % 128 == 0))
        sw_starts = None
        if self.sliding is not None:
            # First attended position per row for this layer: global
            # layers start at 0; physical slot index == logical position
            # (eviction is rejected with sliding windows).
            sw_starts = jnp.where(
                self._sw_layers[layer],
                jnp.maximum(kv_lens - self.sliding, 0), 0)
        if self.attn_backend == "pallas" and fused_ok:
            flat_in = (not isinstance(kc_all, tuple)
                       and getattr(kc_all, "ndim", 5) == 4)
            out, kc5, vc5 = fused_paged_decode_attention(
                q, k, v, self._kv_view5(kc_all), self._kv_view5(vc_all),
                layer, tables, kv_lens, slots, zero_slots, sw_starts,
                scale=self.scale, softcap=self.attn_softcap)
            if flat_in:
                kc5 = kc5.reshape(*kc5.shape[:3], -1)
                vc5 = vc5.reshape(*vc5.shape[:3], -1)
            return out, kc5, vc5
        kc = jax.tree.map(lambda x: x[layer], kc_all)
        vc = jax.tree.map(lambda x: x[layer], vc_all)
        kc, vc = write_kv_slots(kc, vc, k, v, slots)
        if zero_slots is not None:
            kc, vc = zero_kv_slots(kc, vc, zero_slots)
        extra = {}
        if self.blocksparse is not None:
            extra["extra_mask"] = self._decode_bs_mask(tables, kv_lens,
                                                       layer)
        elif self.sliding is not None:
            extra["extra_mask"] = self._decode_sw_mask(tables, kv_lens,
                                                       layer)
        if extra and self.attn_backend == "pallas":
            # Masked fallback (sliding window + quantized KV / exotic head
            # dims): the unfused Pallas kernel takes no mask — use the jnp
            # oracle, which also dequantizes QuantKV pools.
            from ..ops.attention import paged_decode_attention as _jnp_pd
            out = _jnp_pd(q, kc, vc, tables, kv_lens, self.scale,
                          self.attn_softcap, **extra)
        else:
            out = self._paged_decode(q, kc, vc, tables, kv_lens,
                                     self.scale, **extra)
        kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s), kc_all, kc)
        vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s), vc_all, vc)
        return out, kc_all, vc_all

    def _decode_bs_mask(self, tables, kv_lens, layer):
        """Blocksparse decode mask [B, H, S]: the query sits at position
        kv_len - 1; dense layers pass all-True (phi3_small.py:196-204)."""
        from ..ops.attention import blocksparse_allowed
        cfg = self.blocksparse
        s = tables.shape[1] * self.block_size
        k_pos = jnp.arange(s)
        allowed = jax.vmap(lambda ql: blocksparse_allowed(
            ql[None], k_pos, cfg["heads"], cfg["block"], cfg["local"],
            cfg["vert"], cfg["homo"])[:, 0])(kv_lens - 1)   # [B, H?, S]
        allowed = jnp.broadcast_to(allowed,
                                   (kv_lens.shape[0], cfg["heads"], s))
        return jnp.where(self._bs_sparse_layers[layer], allowed, True)

    def _decode_sw_mask(self, tables, kv_lens, layer):
        """Sliding-window decode mask [B, H, S]: the query sits at logical
        position kv_len - 1 and attends keys j with (kv_len - 1) - j <
        window; without eviction, physical slot index == logical
        position.  Global layers pass all-True."""
        b = kv_lens.shape[0]
        s = tables.shape[1] * self.block_size
        allowed = (jnp.arange(s)[None]
                   >= (kv_lens[:, None] - self.sliding))       # [B, S]
        allowed = jnp.broadcast_to(
            allowed[:, None], (b, self.model.arch.num_heads, s))
        return jnp.where(self._sw_layers[layer], allowed, True)

    def _decode_jit(self, greedy: bool, logprobs_l: int):
        import functools
        key = (greedy, logprobs_l)
        if key not in self._decode_window_jits:
            if self.is_mamba:
                body = (self._decode_window_mamba_pp if self.pp > 1
                        else self._decode_window_mamba)
            else:
                body = (self._decode_window_pp if self.pp > 1
                        else self._decode_window)
            self._decode_window_jits[key] = jax.jit(
                functools.partial(body, greedy_only=greedy,
                                  logprobs_l=logprobs_l),
                donate_argnums=(1, 2, 4))
        return self._decode_window_jits[key]

    def _prefill_ctx_jit(self, greedy: bool, last: bool, logprobs_l: int):
        import functools
        key = (greedy, last, logprobs_l)
        if key not in self._prefill_ctx_jits:
            body = (self._prefill_context_pp if self.pp > 1
                    else self._prefill_context)
            self._prefill_ctx_jits[key] = jax.jit(
                functools.partial(body, greedy_only=greedy, is_last=last,
                                  logprobs_l=logprobs_l),
                donate_argnums=(1, 2))
        return self._prefill_ctx_jits[key]

    def _prefill_jit(self, prune: bool, greedy: bool, logprobs_l: int):
        import functools
        cache = self._prefill_prune_jits if prune \
            else self._prefill_plain_jits
        key = (greedy, logprobs_l)
        if key not in cache:
            if self.pp > 1:
                body = (self._prefill_prune_pp if prune
                        else self._prefill_plain_pp)
            else:
                body = self._prefill_prune if prune else self._prefill_plain
            cache[key] = jax.jit(
                functools.partial(body, greedy_only=greedy,
                                  logprobs_l=logprobs_l),
                donate_argnums=(1, 2))
        return cache[key]

    @property
    def zero_writes(self) -> bool:
        ev = self.evict
        return ev is not None and ev.evict_method in ("streamingLLM-1",
                                                      "inverse_key_l2")

    def _step_tables(self, page_scores, tables, kv_lens, num_pages, evict,
                     victims_in, new_pages):
        """One decode step's block-table transition (shared by the
        single-stage and pipelined window bodies): append the pre-reserved
        page, resolve the eviction victim (host plan or device L2 argmin),
        left-shift the table past it.  ``kv_lens`` is the PRE-step count;
        returns (eff_tables, eff_kv, num_pages, victims) where eff_kv
        includes this step's token."""
        ev = self.evict
        bs = self.block_size
        iota_p = jnp.arange(tables.shape[1])[None, :]
        has_new = new_pages >= 0
        onehot = (iota_p == num_pages[:, None]) & has_new[:, None]
        tables = jnp.where(onehot, new_pages[:, None], tables)
        num_pages = num_pages + has_new.astype(jnp.int32)
        kv_lens = kv_lens + 1

        evict_b = evict.astype(bool)
        victims = victims_in
        if self.track_page_scores:
            sel = select_victims(page_scores, tables, evict_b, num_pages,
                                 ev.topk_blocks if ev else -1)
            victims = jnp.where(victims >= 0, victims, sel)
        victims = jnp.where(evict_b, victims, -1)
        eff_tables = shift_block_tables(tables, victims)
        eff_kv = kv_lens - bs * evict_b.astype(jnp.int32)
        num_pages = num_pages - evict_b.astype(jnp.int32)
        return eff_tables, eff_kv, num_pages, victims

    def _fuse_layers_ok(self, params, b: int) -> bool:
        """Trace-time gate for the fused decode-layer megakernel
        (ops/pallas/fused_layer.py): the standard llama trunk with
        kernel-eligible PackedInt4 weights, bf16 activations, single
        stage, small decode batches."""
        from .. import envs
        if envs.VPC_DISABLE_FUSED_LAYER:
            return False
        if (self.attn_backend != "pallas" or self.pp > 1
                or self.lora_enabled or self.is_mamba):
            return False
        model = self.model
        a = model.arch
        if getattr(model, "architecture", "") != "llama":
            return False
        if model.dtype != jnp.bfloat16:
            return False
        if (a.attn_type == "mla" or a.postnorm or a.parallel_residual
                or a.sandwich_norms or a.residual_multiplier != 1.0
                or a.num_experts or a.qkv_bias or a.o_bias or a.mlp_bias
                or getattr(a, "mlp_down_bias", False) or not a.mlp_gated
                or a.hidden_act != "silu" or a.norm_type != "rmsnorm"
                or a.qkv_clip is not None or a.qk_norm or a.qk_norm_flat
                or a.no_rope_pattern or not a.use_rope
                or a.pos_embed_learned or a.embed_ln
                or a.mrope_section is not None
                or "dense_layers" in params):
            return False
        lay = params.get("layers")
        if lay is None or any(k not in lay for k in (
                "wqkv", "wo", "w_gate_up", "w_down", "input_norm",
                "post_norm")):
            return False
        from ..ops.pallas.fused_layer import fused_layer_eligible
        q_sz = a.num_heads * a.head_dim
        kv_sz = a.num_kv_heads * a.head_dim
        return fused_layer_eligible(
            lay["wqkv"], lay["wo"], lay["w_gate_up"], lay["w_down"],
            a.hidden_size, a.intermediate_size, q_sz + 2 * kv_sz, b)

    def _fused_decode_step(self, params, tokens, positions, attn_fn,
                           caches):
        """Fast-path decode forward: one megakernel per layer streams all
        four projection weights through a single DMA pipeline, with the
        layer boundary shifted so kernel(i) also produces layer i+1's
        pre-rope qkv (see ops/pallas/fused_layer.py).  XLA between
        kernels: rope + the fused write+attend kernel only."""
        from ..models.llama import rms_norm
        from ..ops.pallas.fused_layer import fused_decode_layer
        from ..ops.pallas.int4_matmul import int4_matmul_stacked_packed
        from ..ops.rope import apply_rope, rope_cos_sin
        model = self.model
        a = model.arch
        lay = params["layers"]
        num_layers = lay["input_norm"].shape[0]
        h = model.embed(params, tokens)
        if a.embed_scale is not None:
            h = h * jnp.asarray(a.embed_scale, model.dtype)
        cos, sin = rope_cos_sin(positions, a.rot_dim, a.rope_theta,
                                scaling=a.rope_scaling,
                                interleaved=a.rope_interleaved)
        inw = lay["input_norm"]
        postw = lay["post_norm"]
        # norms[l] rows: 0 = post_attention_norm(l), 1 = input_norm(l+1)
        # (rolled; the l = L-1 row feeds a discarded qkv).
        norms = jnp.concatenate(
            [postw[:, None], jnp.roll(inw, -1, axis=0)[:, None],
             jnp.zeros((num_layers, 6, a.hidden_size), postw.dtype)],
            axis=1).astype(jnp.bfloat16)
        x0 = rms_norm(h, inw[0], a.rms_norm_eps)
        qkv0 = int4_matmul_stacked_packed(x0, lay["wqkv"], 0)
        q_sz = a.num_heads * a.head_dim
        kv_sz = a.num_kv_heads * a.head_dim
        t = h.shape[0]

        def body(carry, li):
            h, qkv, caches = carry
            q = qkv[:, :q_sz].reshape(t, a.num_heads, a.head_dim)
            k = qkv[:, q_sz:q_sz + kv_sz].reshape(t, a.num_kv_heads,
                                                  a.head_dim)
            v = qkv[:, q_sz + kv_sz:].reshape(t, a.num_kv_heads,
                                              a.head_dim)
            q, k = apply_rope(q, k, cos, sin, rot_dim=a.rot_dim,
                              interleaved=a.rope_interleaved)
            attn_out, caches = attn_fn(q, k, v, caches, li)
            attn2d = attn_out.reshape(t, q_sz).astype(model.dtype)
            h2, qkv_next = fused_decode_layer(
                attn2d, h, lay["wo"], lay["w_gate_up"], lay["w_down"],
                lay["wqkv"], norms, li, eps=a.rms_norm_eps)
            return (h2, qkv_next, caches), None

        (h, _, caches), _ = jax.lax.scan(
            body,
            (h.astype(jnp.bfloat16), qkv0.astype(jnp.bfloat16), caches),
            jnp.arange(num_layers, dtype=jnp.int32))
        h_final = rms_norm(h, params["final_norm"], a.rms_norm_eps,
                           a.norm_unit_offset)
        return h_final, caches

    def _decode_window(self, params, caches, page_scores, plan_pack,
                       state_pack, f32_pack, token_counts=None,
                       mask_pack=None, bias_pack=None, greedy_only=False,
                       logprobs_l=0):
        """K chained decode steps under one jit: tokens feed forward on
        device; the host only uploads the packed plan and fetches one
        [2, K, B] (tokens, victims) array.  This is the multi-step analog of
        the reference's per-step execute_model loop — the reference forbids
        multi-step + eviction (arg_utils.py:1255-1257); here eviction is
        in-graph so the combination is exact.

        ``token_counts`` [B, V] (non-greedy path only) carries per-sequence
        generated-token counts for OpenAI presence/frequency + HF repetition
        penalties; it rides the scan carry and updates with each sampled
        token."""
        ev = self.evict
        bs = self.block_size
        p = self.max_table_len
        b = state_pack.shape[0]
        caches = self._kv_carry_in(caches)
        tables0 = state_pack[:, :p]
        kv0 = state_pack[:, p]
        np0 = state_pack[:, p + 1]
        tok0 = state_pack[:, p + 2]
        seeds = state_pack[:, p + 3]
        topk = state_pack[:, p + 4]
        lora_slots = state_pack[:, p + 5]
        temp, top_p, min_p = f32_pack[0], f32_pack[1], f32_pack[5]
        if not greedy_only:
            presence, frequency, repetition = (f32_pack[2], f32_pack[3],
                                               f32_pack[4])
        zero_writes = self.zero_writes
        iota_b = jnp.arange(b)

        def body(carry, xs):
            caches, page_scores, tables, kv_lens, num_pages, tokens, \
                counts = carry
            xs_plan, mask = (xs, None) if mask_pack is None else xs
            positions, slots, evict, victims_in, zero_slots, fill_pages, \
                new_pages, stepctr = (xs_plan[i] for i in range(len(
                    self._PLAN_FIELDS)))
            eff_tables, eff_kv, num_pages, victims = self._step_tables(
                page_scores, tables, kv_lens, num_pages, evict, victims_in,
                new_pages)

            def attn_fn(q, k, v, state, layer):
                kc_all, vc_all = state
                out, kc_all, vc_all = self._fused_attn(
                    q, k, v, kc_all, vc_all, layer, eff_tables, eff_kv,
                    slots, zero_slots if zero_writes else None)
                return out, (kc_all, vc_all)

            if self._fuse_layers_ok(params, b):
                hidden, new_caches = self._fused_decode_step(
                    params, tokens, positions, attn_fn, caches)
            else:
                hidden, new_caches = self.model.forward_hidden(
                    params, tokens, positions, attn_fn, caches,
                    state_mode="carry",
                    **self._lora_kwargs(params, lora_slots))
            if self.track_page_scores:
                page_scores = self._update_page_scores(
                    page_scores, new_caches[1], fill_pages)
            logits = self.model.logits(params, hidden)
            if not greedy_only:
                from ..ops.sampling import apply_penalties
                logits = apply_penalties(logits, counts, presence,
                                         frequency, repetition)
            if bias_pack is not None:
                bias_ids, bias_vals = bias_pack
                logits = logits.astype(jnp.float32).at[
                    iota_b[:, None], bias_ids].add(bias_vals)
            if mask is not None:
                from ..ops.sampling import apply_token_bitmask
                logits = apply_token_bitmask(logits, mask)
            toks = sample(logits, SamplingTensors(
                temperature=temp, top_p=top_p, top_k=topk, seed=seeds,
                step=stepctr, min_p=min_p),
                greedy_only=greedy_only).astype(jnp.int32)
            if counts is not None:
                counts = counts.at[iota_b, toks].add(1)
            carry = (new_caches, page_scores, eff_tables, eff_kv,
                     num_pages, toks, counts)
            ys = jnp.stack([toks, victims])
            if logprobs_l > 0:
                lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                tv, ti = jax.lax.top_k(lp, logprobs_l)
                chosen = lp[iota_b, toks]
                ys = (ys, jnp.concatenate(
                    [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1))
            return carry, ys

        init = (caches, page_scores, tables0, kv0, np0, tok0,
                token_counts)
        xs = plan_pack if mask_pack is None else (plan_pack, mask_pack)
        carry, ys = jax.lax.scan(body, init, xs)
        (new_caches, page_scores, tables_end, kv_end, np_end, tok_end,
         _counts) = carry
        new_caches = self._kv_carry_out(new_caches)
        lp_pack = None
        if logprobs_l > 0:
            ys, lp_pack = ys          # lp_pack: [K, B, 2L+1] f32
        # ys: [K, 2, B] -> [2, K, B] single fetchable array.
        out_pack = jnp.swapaxes(ys, 0, 1)
        # End-of-window dynamic state in state_pack layout, so a chained
        # window can start from it without a host round trip (the host
        # param columns seeds/topk/lora pass through untouched).
        new_state = jnp.concatenate([
            tables_end, kv_end[:, None], np_end[:, None], tok_end[:, None],
            state_pack[:, p + 3:],
        ], axis=1)
        return new_caches, page_scores, out_pack, new_state, lp_pack

    # ------------------------------------------------------------------
    # Mamba (state-space) programs — same packing/dispatch interface as
    # the attention window/prefill programs, but per-sequence conv/SSM
    # state slots instead of paged KV (reference
    # vllm/model_executor/models/mamba.py + mamba_cache.py).
    # ------------------------------------------------------------------

    def _decode_window_mamba(self, params, caches, page_scores, plan_pack,
                             state_pack, f32_pack, token_counts=None,
                             mask_pack=None, bias_pack=None,
                             greedy_only=False, logprobs_l=0):
        p = self.max_table_len           # == 1: the page IS the state slot
        b = state_pack.shape[0]
        slots = state_pack[:, 0]
        tok0 = state_pack[:, p + 2]
        seeds = state_pack[:, p + 3]
        topk = state_pack[:, p + 4]
        temp, top_p, min_p = f32_pack[0], f32_pack[1], f32_pack[5]
        if not greedy_only:
            presence, frequency, repetition = (f32_pack[2], f32_pack[3],
                                               f32_pack[4])
        iota_b = jnp.arange(b)

        def body(carry, xs):
            caches, tokens, counts = carry
            xs_plan, mask = (xs, None) if mask_pack is None else xs
            stepctr = xs_plan[7]
            hidden, caches = self.model.forward_decode_step(
                params, tokens, slots, caches)
            logits = self.model.logits(params, hidden)
            if not greedy_only:
                from ..ops.sampling import apply_penalties
                logits = apply_penalties(logits, counts, presence,
                                         frequency, repetition)
            if bias_pack is not None:
                bias_ids, bias_vals = bias_pack
                logits = logits.astype(jnp.float32).at[
                    iota_b[:, None], bias_ids].add(bias_vals)
            if mask is not None:
                from ..ops.sampling import apply_token_bitmask
                logits = apply_token_bitmask(logits, mask)
            toks = sample(logits, SamplingTensors(
                temperature=temp, top_p=top_p, top_k=topk, seed=seeds,
                step=stepctr, min_p=min_p),
                greedy_only=greedy_only).astype(jnp.int32)
            if counts is not None:
                counts = counts.at[iota_b, toks].add(1)
            ys = jnp.stack([toks, jnp.full_like(toks, -1)])  # no victims
            if logprobs_l > 0:
                lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                tv, ti = jax.lax.top_k(lp, logprobs_l)
                chosen = lp[iota_b, toks]
                ys = (ys, jnp.concatenate(
                    [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1))
            return (caches, toks, counts), ys

        init = (caches, tok0, token_counts)
        xs = plan_pack if mask_pack is None else (plan_pack, mask_pack)
        (caches, tok_end, _counts), ys = jax.lax.scan(body, init, xs)
        lp_pack = None
        if logprobs_l > 0:
            ys, lp_pack = ys
        out_pack = jnp.swapaxes(ys, 0, 1)
        new_state = jnp.concatenate([
            state_pack[:, :p + 2], tok_end[:, None],
            state_pack[:, p + 3:]], axis=1)
        return caches, page_scores, out_pack, new_state, lp_pack

    def _prefill_mamba(self, params, caches, page_scores, batch,
                       greedy_only=False, logprobs_l=0):
        kw = {}
        if "cross_states" in batch:
            # Encoder-decoder multimodal (Mllama): host-encoded vision
            # states feed the cross-attention layers.
            kw = {"cross_states": batch["cross_states"],
                  "img_start": batch["img_start"]}
        last, caches = self.model.forward_prefill(
            params, batch["tokens"], batch["q_len"], batch["slot"],
            caches, **kw)
        logits = self.model.logits(params, last)
        if "bias_ids" in batch:
            logits = logits.astype(jnp.float32).at[
                jnp.zeros(1, jnp.int32)[:, None],
                batch["bias_ids"][None]].add(batch["bias_vals"][None])
        if "mask_words" in batch:
            from ..ops.sampling import apply_token_bitmask
            logits = apply_token_bitmask(logits, batch["mask_words"][None])
        tokens = sample(logits, self._sampling_tensors(batch),
                        greedy_only=greedy_only)
        lp_row = None
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[jnp.arange(1), tokens]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1)[0]
        return caches, page_scores, tokens, lp_row

    def _run_prefill_mamba(self, params, caches, page_scores,
                           sp: ScheduledPrefill):
        seq = sp.seq
        prompt = seq.prompt_token_ids
        q_len = len(prompt)
        l_pad = next_bucket(q_len, self.prefill_buckets)
        tokens = np.zeros(l_pad, np.int32)
        tokens[:q_len] = prompt
        batch = {"tokens": tokens, "q_len": np.int32(q_len),
                 "slot": np.int32(seq.block_table.pages[0])}
        if getattr(seq, "mm_feats", None) is not None \
                and hasattr(self.model, "encode_cross_states"):
            batch["cross_states"] = seq.mm_feats
            batch["img_start"] = np.int32(seq.mm_start)
        batch.update(self._seq_sampling_arrays([seq], 1))
        if self._lane_needs_mask(seq):
            words = self._lane_mask_words(seq, 0)
            if words is not None:
                batch["mask_words"] = words
        bias = self._bias_arrays([seq], 1)
        if bias is not None:
            batch["bias_ids"], batch["bias_vals"] = bias[0][0], bias[1][0]
        greedy = seq.params.greedy
        logprobs_l = min(seq.params.logprobs or 0, 32)
        key = (greedy, logprobs_l)
        fn = self._prefill_plain_jits.get(("mamba",) + key)
        if fn is None:
            import functools
            base = (self._prefill_mamba_pp if self.pp > 1
                    else self._prefill_mamba)
            fn = jax.jit(functools.partial(base,
                                           greedy_only=greedy,
                                           logprobs_l=logprobs_l),
                         donate_argnums=(1, 2))
            self._prefill_plain_jits[("mamba",) + key] = fn
        caches, page_scores, tok, lp_row = fn(params, caches, page_scores,
                                              batch)
        lp = np.asarray(lp_row) if lp_row is not None else None
        return caches, page_scores, int(np.asarray(tok)[0]), lp

    # ------------------------------------------------------------------
    # pipeline-parallel program wrappers (shard_map over "pipe")
    # ------------------------------------------------------------------

    def _pp_shard_call(self, body, params, caches, page_scores, *rest,
                       extra_out_specs):
        """Run ``body`` as a shard_map over the "pipe" axis ONLY
        (axis_names): layer-stacked leaves (params["layers"], the KV
        pools) shard on their leading axis; everything else is replicated
        w.r.t. "pipe" (the body keeps replicated values bit-identical via
        masked psums).  "data"/"model" stay AUTO, so TP shardings flow
        through the boundary and GSPMD inserts the TP collectives inside
        each stage instead of all-gathering the weights (the reference
        composes TP inside PP the same way — each PP stage process group
        runs megatron TP, parallel_state.py:992)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.pipeline import cache_pipe_specs, param_specs
        in_specs = (param_specs(params),
                    cache_pipe_specs(caches),
                    P(),
                    *[jax.tree.map(lambda _: P(), r) for r in rest])
        out_specs = (cache_pipe_specs(caches), P(), *extra_out_specs)
        return jax.shard_map(body, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False,
                             axis_names=frozenset({"pipe"}))(
            params, caches, page_scores, *rest)

    def _decode_window_pp(self, params, caches, page_scores, plan_pack,
                          state_pack, f32_pack, token_counts=None,
                          mask_pack=None, bias_pack=None, greedy_only=False,
                          logprobs_l=0):
        from jax.sharding import PartitionSpec as P

        from ..parallel.pipeline import pp_decode_window_body

        def body(params, caches, page_scores, plan_pack, state_pack,
                 f32_pack, token_counts, mask_pack=None, bias_pack=None):
            out = pp_decode_window_body(
                self, params, caches, page_scores, plan_pack, state_pack,
                f32_pack, token_counts, mask_pack=mask_pack,
                bias_pack=bias_pack, greedy_only=greedy_only,
                logprobs_l=logprobs_l)
            # shard_map out_specs can't carry a None leaf: drop the
            # lp_pack slot when logprobs are off.
            return out if logprobs_l > 0 else out[:4]

        rest = [plan_pack, state_pack, f32_pack, token_counts]
        if mask_pack is not None or bias_pack is not None:
            import functools
            body = functools.partial(body, mask_pack=mask_pack,
                                     bias_pack=bias_pack)
        extra = (P(), P()) + ((P(),) if logprobs_l > 0 else ())
        out = self._pp_shard_call(
            body, params, caches, page_scores, *rest,
            extra_out_specs=extra)
        return out if logprobs_l > 0 else (*out, None)

    def _decode_window_mamba_pp(self, params, caches, page_scores,
                                plan_pack, state_pack, f32_pack,
                                token_counts=None, mask_pack=None,
                                bias_pack=None, greedy_only=False,
                                logprobs_l=0):
        from jax.sharding import PartitionSpec as P

        from ..parallel.pipeline import pp_decode_window_body_mamba

        def body(params, caches, page_scores, plan_pack, state_pack,
                 f32_pack, token_counts, mask_pack=None, bias_pack=None):
            out = pp_decode_window_body_mamba(
                self, params, caches, page_scores, plan_pack, state_pack,
                f32_pack, token_counts, mask_pack=mask_pack,
                bias_pack=bias_pack, greedy_only=greedy_only,
                logprobs_l=logprobs_l)
            return out if logprobs_l > 0 else out[:4]

        rest = [plan_pack, state_pack, f32_pack, token_counts]
        if mask_pack is not None or bias_pack is not None:
            import functools
            body = functools.partial(body, mask_pack=mask_pack,
                                     bias_pack=bias_pack)
        extra = (P(), P()) + ((P(),) if logprobs_l > 0 else ())
        out = self._pp_shard_call(
            body, params, caches, page_scores, *rest,
            extra_out_specs=extra)
        return out if logprobs_l > 0 else (*out, None)

    def _prefill_mamba_pp(self, params, caches, page_scores, batch,
                          greedy_only=False, logprobs_l=0):
        from jax.sharding import PartitionSpec as P

        from ..models.mamba import _rms
        from ..parallel.pipeline import (_masked_psum,
                                         pp_prefill_wave_mamba)

        def body(params, caches, page_scores, batch):
            arch = self.model.arch
            h0 = self.model.embed(params, batch["tokens"]).astype(
                self.model.dtype)
            extra = ({"cross_states": batch["cross_states"],
                      "img_start": batch["img_start"]}
                     if "cross_states" in batch else None)
            h, caches = pp_prefill_wave_mamba(
                self, params, caches, h0, batch["q_len"], batch["slot"],
                extra=extra)
            stage = jax.lax.axis_index("pipe")
            # Final-hidden / last-row hooks: BART has per-layer norms
            # only and rides the decoder hidden at a fixed trailing row
            # (models/bart.py pp_final_hidden / pp_prefill_last).
            fin = getattr(self.model, "pp_final_hidden", None)
            h_final = (fin(params, h) if fin is not None else
                       _rms(h, params["final_norm"],
                            arch.layer_norm_eps))
            last_fn = getattr(self.model, "pp_prefill_last", None)
            last = (last_fn(h_final, batch["q_len"])
                    if last_fn is not None
                    else h_final[batch["q_len"] - 1][None])
            logits = self.model.logits(params, last)
            if "bias_ids" in batch:
                logits = logits.astype(jnp.float32).at[
                    jnp.zeros(1, jnp.int32)[:, None],
                    batch["bias_ids"][None]].add(batch["bias_vals"][None])
            if "mask_words" in batch:
                from ..ops.sampling import apply_token_bitmask
                logits = apply_token_bitmask(logits,
                                             batch["mask_words"][None])
            tokens = sample(logits, self._sampling_tensors(batch),
                            greedy_only=greedy_only).astype(jnp.int32)
            tokens = _masked_psum(tokens, stage == self.pp - 1, "pipe")
            if logprobs_l > 0:
                lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                tv, ti = jax.lax.top_k(lp, logprobs_l)
                chosen = lp[jnp.arange(1), tokens]
                lp_row = jnp.concatenate(
                    [tv, ti.astype(jnp.float32), chosen[:, None]],
                    axis=1)[0]
                lp_row = _masked_psum(lp_row, stage == self.pp - 1,
                                      "pipe")
                return caches, page_scores, tokens, lp_row
            return caches, page_scores, tokens

        extra = (P(),) + ((P(),) if logprobs_l > 0 else ())
        out = self._pp_shard_call(body, params, caches, page_scores,
                                  batch, extra_out_specs=extra)
        if logprobs_l > 0:
            return out
        return (*out, None)

    def _finish_prefill_pp(self, params, caches, page_scores, batch,
                           attn_fn_factory, greedy_only, logprobs_l=0):
        """Shared tail of the PP prefill programs (inside shard_map)."""
        from ..models.llama import rms_norm
        from ..parallel.pipeline import _masked_psum, pp_prefill_wave
        arch = self.model.arch
        h0 = self.model.embed(params, batch["tokens"])
        if arch.embed_scale is not None:
            h0 = h0 * jnp.asarray(arch.embed_scale, self.model.dtype)
        h, caches = pp_prefill_wave(self, params, caches, h0,
                                    batch["positions"], attn_fn_factory,
                                    lora_idx=batch.get("lora_idx"))
        stage = jax.lax.axis_index("pipe")
        if self.track_page_scores:
            ps_new = self._update_page_scores(page_scores, caches[1],
                                              batch["fill_pages"])
            page_scores = _masked_psum(ps_new, stage == 0, "pipe")
        h_final = rms_norm(h, params["final_norm"], arch.rms_norm_eps,
                           arch.norm_unit_offset)
        last = h_final[batch["q_len"] - 1][None]
        logits = self.model.logits(params, last)
        if "bias_ids" in batch:
            logits = logits.astype(jnp.float32).at[
                jnp.zeros(1, jnp.int32)[:, None],
                batch["bias_ids"][None]].add(batch["bias_vals"][None])
        if "mask_words" in batch:
            from ..ops.sampling import apply_token_bitmask
            logits = apply_token_bitmask(logits, batch["mask_words"][None])
        tokens = sample(logits, self._sampling_tensors(batch),
                        greedy_only=greedy_only).astype(jnp.int32)
        tokens = _masked_psum(tokens, stage == self.pp - 1, "pipe")
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[jnp.arange(1), tokens]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1)[0]
            lp_row = _masked_psum(lp_row, stage == self.pp - 1, "pipe")
            return caches, page_scores, tokens, lp_row
        return caches, page_scores, tokens

    def _prefill_plain_pp(self, params, caches, page_scores, batch,
                          greedy_only=False, logprobs_l=0):
        from jax.sharding import PartitionSpec as P
        trash_page = self.cache_engine.trash_page

        def body(params, caches, page_scores, batch):
            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    wp = jnp.where(active, batch["write_pages"], trash_page)
                    kc = jax.tree.map(lambda x: x[layer], kc_all)
                    vc = jax.tree.map(lambda x: x[layer], vc_all)
                    kc, vc = write_kv_pages(kc, vc, k, v, wp)
                    out = self._prefill_attn(q, k, v, self.scale,
                                             batch["q_len"])
                    kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          kc_all, kc)
                    vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          vc_all, vc)
                    return out, (kc_all, vc_all)
                return attn_fn
            return self._finish_prefill_pp(params, caches, page_scores,
                                           batch, factory, greedy_only,
                                           logprobs_l)

        extra = (P(),) + ((P(),) if logprobs_l > 0 else ())
        out = self._pp_shard_call(body, params, caches, page_scores,
                                  batch, extra_out_specs=extra)
        return out if logprobs_l > 0 else (*out, None)

    def _prefill_prune_pp(self, params, caches, page_scores, batch,
                          greedy_only=False, logprobs_l=0):
        """Evict-at-prefill under PP: per-layer pruning exactly as the
        single-stage program (each stage prunes at its own layers)."""
        from jax.sharding import PartitionSpec as P
        ev = self.evict
        assert ev is not None
        trash_page = self.cache_engine.trash_page

        def body(params, caches, page_scores, batch):
            s_pad = batch["write_pages"].shape[0] * self.block_size
            score_based = ev.evict_method in ("local", "global",
                                              "inverse_key_l2")

            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    if score_based:
                        scores = token_scores(k, v, ev.evict_method)
                    else:
                        scores = jnp.zeros(k.shape[:2], jnp.float32)
                    keep_idx = prompt_keep_indices(
                        scores, batch["q_len"], self.block_size,
                        batch["evict_budget"], ev.evict_method, s_pad)
                    k_kept, v_kept = gather_pruned_kv(k, v, keep_idx)
                    wp = jnp.where(active, batch["write_pages"], trash_page)
                    kc = jax.tree.map(lambda x: x[layer], kc_all)
                    vc = jax.tree.map(lambda x: x[layer], vc_all)
                    kc, vc = write_kv_pages(kc, vc, k_kept, v_kept, wp)
                    kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          kc_all, kc)
                    vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          vc_all, vc)
                    if ev.disable_evict_prefill:
                        out = self._prefill_attn(q, k, v, self.scale,
                                                 batch["q_len"])
                    else:
                        out = self._pruned_prefill_attn(
                            q, k_kept, v_kept, self.scale, batch["q_len"],
                            batch["stored_len"])
                    return out, (kc_all, vc_all)
                return attn_fn
            return self._finish_prefill_pp(params, caches, page_scores,
                                           batch, factory, greedy_only,
                                           logprobs_l)

        extra = (P(),) + ((P(),) if logprobs_l > 0 else ())
        out = self._pp_shard_call(body, params, caches, page_scores,
                                  batch, extra_out_specs=extra)
        return out if logprobs_l > 0 else (*out, None)

    def _prefill_context_pp(self, params, caches, page_scores, batch,
                            greedy_only=False, is_last=True,
                            logprobs_l=0):
        """Chunked-prefill / cached-prefix-suffix program under pipeline
        parallelism: the same single-microbatch wave as _prefill_plain_pp,
        with each stage's layers attending to the already-cached context
        through the block table (reference PP+chunked-prefill composition:
        vllm/engine/llm_engine.py:1331-1338 virtual engines each run the
        full scheduler feature set)."""
        from jax.sharding import PartitionSpec as P

        from ..models.llama import rms_norm
        from ..ops.quant import QuantKV, dequantize_kv
        from ..parallel.pipeline import _masked_psum, pp_prefill_wave
        trash_page = self.cache_engine.trash_page
        arch = self.model.arch

        def body(params, caches, page_scores, batch):
            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    wp = jnp.where(active, batch["write_pages"],
                                   trash_page)
                    kc = jax.tree.map(lambda x: x[layer], kc_all)
                    vc = jax.tree.map(lambda x: x[layer], vc_all)
                    kc, vc = write_kv_pages(kc, vc, k, v, wp)
                    k_ctx = index_cache_pages(kc, batch["ctx_tables"])
                    v_ctx = index_cache_pages(vc, batch["ctx_tables"])
                    if isinstance(k_ctx, QuantKV):
                        k_ctx = dequantize_kv(k_ctx).astype(q.dtype)
                        v_ctx = dequantize_kv(v_ctx).astype(q.dtype)
                    cp, ps = k_ctx.shape[0], k_ctx.shape[1]
                    k_ctx = k_ctx.reshape(cp * ps, *k_ctx.shape[2:])
                    v_ctx = v_ctx.reshape(cp * ps, *v_ctx.shape[2:])
                    out = self._ctx_attn(q, k_ctx, v_ctx, k, v, self.scale,
                                         batch["q_len"], batch["ctx_len"])
                    kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          kc_all, kc)
                    vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          vc_all, vc)
                    return out, (kc_all, vc_all)
                return attn_fn

            h0 = self.model.embed(params, batch["tokens"])
            if arch.embed_scale is not None:
                h0 = h0 * jnp.asarray(arch.embed_scale, self.model.dtype)
            h, caches = pp_prefill_wave(self, params, caches, h0,
                                        batch["positions"], factory,
                                        lora_idx=batch.get("lora_idx"))
            stage = jax.lax.axis_index("pipe")
            if is_last:
                h_final = rms_norm(h, params["final_norm"],
                                   arch.rms_norm_eps,
                                   arch.norm_unit_offset)
                last = h_final[batch["q_len"] - 1][None]
                logits = self.model.logits(params, last)
                if "bias_ids" in batch:
                    logits = logits.astype(jnp.float32).at[
                        jnp.zeros(1, jnp.int32)[:, None],
                        batch["bias_ids"][None]].add(
                            batch["bias_vals"][None])
                if "mask_words" in batch:
                    from ..ops.sampling import apply_token_bitmask
                    logits = apply_token_bitmask(
                        logits, batch["mask_words"][None])
                tokens = sample(logits, self._sampling_tensors(batch),
                                greedy_only=greedy_only).astype(jnp.int32)
                tokens = _masked_psum(tokens, stage == self.pp - 1, "pipe")
                if logprobs_l > 0:
                    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                    tv, ti = jax.lax.top_k(lp, logprobs_l)
                    chosen = lp[jnp.arange(1), tokens]
                    lp_row = jnp.concatenate(
                        [tv, ti.astype(jnp.float32), chosen[:, None]],
                        axis=1)[0]
                    lp_row = _masked_psum(lp_row, stage == self.pp - 1,
                                          "pipe")
                    return caches, page_scores, tokens, lp_row
            else:
                tokens = jnp.zeros((1,), jnp.int32)
            if logprobs_l > 0:
                return (caches, page_scores, tokens,
                        jnp.zeros(2 * logprobs_l + 1, jnp.float32))
            return caches, page_scores, tokens

        extra = (P(),) + ((P(),) if logprobs_l > 0 else ())
        return self._pp_shard_call(body, params, caches, page_scores,
                                   batch, extra_out_specs=extra)

    def _prefill_plain(self, params, caches, page_scores, batch,
                       greedy_only=False, logprobs_l=0):
        # Prefix-LM prompts (PaliGemma): image batches attend
        # bidirectionally within the prompt (jnp oracle; K/V writes are
        # mask-independent so decode is unchanged).
        bidir = (("pixel_values" in batch or "mm_feats" in batch)
                 and getattr(self.model, "mm_bidirectional_prompt", False))

        if self.blocksparse is not None:
            # Blocksparse prefill runs in CARRY mode so the per-layer
            # dense/sparse switch can read the layer index.
            from ..ops.attention import blocksparse_allowed
            cfg = self.blocksparse
            t = batch["tokens"].shape[0]
            pos = jnp.arange(t)
            allowed = jnp.broadcast_to(
                blocksparse_allowed(pos, pos, cfg["heads"], cfg["block"],
                                    cfg["local"], cfg["vert"],
                                    cfg["homo"]),
                (cfg["heads"], t, t))

            def bs_attn_fn(q, k, v, state, layer):
                kc_all, vc_all = state
                kc = jax.tree.map(lambda x: x[layer], kc_all)
                vc = jax.tree.map(lambda x: x[layer], vc_all)
                kc, vc = write_kv_pages(kc, vc, k, v,
                                        batch["write_pages"])
                kc_all = jax.tree.map(
                    lambda a_, s_: a_.at[layer].set(s_), kc_all, kc)
                vc_all = jax.tree.map(
                    lambda a_, s_: a_.at[layer].set(s_), vc_all, vc)
                m = jnp.where(self._bs_sparse_layers[layer], allowed,
                              True)
                out = prefill_attention(q, k, v, self.scale,
                                        batch["q_len"],
                                        softcap=self.attn_softcap,
                                        extra_mask=m)
                return out, (kc_all, vc_all)

            return self._finish_prefill(params, caches, page_scores,
                                        batch, bs_attn_fn, greedy_only,
                                        logprobs_l, state_mode="carry")

        if self.sliding is not None:
            # Sliding-window prefill runs in CARRY mode so the per-layer
            # sliding/global switch can read the layer index (same shape
            # as the blocksparse path above).  Pallas: the flash kernel
            # takes the window as a traced scalar (0 = global layer);
            # jnp: explicit [Tq, Tk] band mask.
            use_flash = self.attn_backend == "pallas"
            if not use_flash:
                t = batch["tokens"].shape[0]
                pos = jnp.arange(t)
                allowed = (pos[:, None] - pos[None, :]
                           < self.sliding)[None]           # [1, Tq, Tk]

            def sw_attn_fn(q, k, v, state, layer):
                kc_all, vc_all = state
                kc = jax.tree.map(lambda x: x[layer], kc_all)
                vc = jax.tree.map(lambda x: x[layer], vc_all)
                kc, vc = write_kv_pages(kc, vc, k, v,
                                        batch["write_pages"])
                kc_all = jax.tree.map(
                    lambda a_, s_: a_.at[layer].set(s_), kc_all, kc)
                vc_all = jax.tree.map(
                    lambda a_, s_: a_.at[layer].set(s_), vc_all, vc)
                if use_flash:
                    w = jnp.where(self._sw_layers[layer],
                                  jnp.int32(self.sliding), jnp.int32(0))
                    out = flash_prefill_attention(
                        q, k, v, self.scale, batch["q_len"],
                        batch["q_len"], softcap=self.attn_softcap,
                        window=w)
                else:
                    m = jnp.where(self._sw_layers[layer], allowed, True)
                    out = prefill_attention(q, k, v, self.scale,
                                            batch["q_len"],
                                            softcap=self.attn_softcap,
                                            extra_mask=m)
                return out, (kc_all, vc_all)

            return self._finish_prefill(params, caches, page_scores,
                                        batch, sw_attn_fn, greedy_only,
                                        logprobs_l, state_mode="carry")

        def attn_fn(q, k, v, layer_cache):
            kc, vc = layer_cache
            kc, vc = write_kv_pages(kc, vc, k, v, batch["write_pages"])
            if bidir:
                out = prefill_attention(q, k, v, self.scale,
                                        batch["q_len"],
                                        softcap=self.attn_softcap,
                                        bidirectional=True)
            else:
                out = self._prefill_attn(q, k, v, self.scale,
                                         batch["q_len"])
            return out, (kc, vc)

        return self._finish_prefill(params, caches, page_scores, batch,
                                    attn_fn, greedy_only, logprobs_l)

    def _prefill_prune(self, params, caches, page_scores, batch,
                       greedy_only=False, logprobs_l=0):
        """Evict-at-prefill (both orderings).  Per-layer pruning: each layer
        selects its own keep set from its own K/V scores
        (torch_cuda_sdpa.py:882-892 runs the pruner inside every layer's
        forward)."""
        ev = self.evict
        assert ev is not None
        s_pad = batch["write_pages"].shape[0] * self.block_size
        score_based = ev.evict_method in ("local", "global", "inverse_key_l2")

        def attn_fn(q, k, v, layer_cache):
            if score_based:
                scores = token_scores(k, v, ev.evict_method)
            else:
                scores = jnp.zeros(k.shape[:2], jnp.float32)
            keep_idx = prompt_keep_indices(
                scores, batch["q_len"], self.block_size,
                batch["evict_budget"], ev.evict_method, s_pad)
            k_kept, v_kept = gather_pruned_kv(k, v, keep_idx)
            kc, vc = layer_cache
            kc, vc = write_kv_pages(kc, vc, k_kept, v_kept,
                                    batch["write_pages"])
            if ev.disable_evict_prefill:
                # Attend-then-evict: full-context attention, pruned storage
                # (torch_cuda_sdpa.py:1014-1024).
                out = self._prefill_attn(q, k, v, self.scale, batch["q_len"])
            else:
                out = self._pruned_prefill_attn(q, k_kept, v_kept, self.scale,
                                                batch["q_len"],
                                                batch["stored_len"])
            return out, (kc, vc)

        return self._finish_prefill(params, caches, page_scores, batch,
                                    attn_fn, greedy_only, logprobs_l)

    def _prefill_context(self, params, caches, page_scores, batch,
                         greedy_only=False, is_last=True, logprobs_l=0):
        """One chunk of a chunked prefill (or the uncached suffix after a
        prefix-cache hit): chunk queries attend to the already-cached
        context through the block table plus the chunk itself
        (reference chunked-prefill path, scheduler.py:1167 +
        ops/prefix_prefill.py — re-derived as a fixed-shape program)."""
        from ..ops.quant import QuantKV, dequantize_kv

        def attn_fn(q, k, v, layer_cache):
            kc, vc = layer_cache
            kc, vc = write_kv_pages(kc, vc, k, v, batch["write_pages"])
            k_ctx = index_cache_pages(kc, batch["ctx_tables"])
            v_ctx = index_cache_pages(vc, batch["ctx_tables"])
            if isinstance(k_ctx, QuantKV):
                k_ctx = dequantize_kv(k_ctx).astype(q.dtype)
                v_ctx = dequantize_kv(v_ctx).astype(q.dtype)
            cp, ps = k_ctx.shape[0], k_ctx.shape[1]
            k_ctx = k_ctx.reshape(cp * ps, *k_ctx.shape[2:])
            v_ctx = v_ctx.reshape(cp * ps, *v_ctx.shape[2:])
            out = self._ctx_attn(q, k_ctx, v_ctx, k, v, self.scale,
                                 batch["q_len"], batch["ctx_len"])
            return out, (kc, vc)

        lk = (self._lora_kwargs(params, batch["lora_idx"])
              if self.lora_enabled else {})
        hidden, new_caches = self.model.forward_hidden(
            params, batch["tokens"], batch["positions"], attn_fn, caches,
            **lk)
        if is_last:
            last = hidden[batch["q_len"] - 1][None]
            logits = self.model.logits(params, last)
            if "bias_ids" in batch:
                logits = logits.astype(jnp.float32).at[
                    jnp.zeros(1, jnp.int32)[:, None],
                    batch["bias_ids"][None]].add(batch["bias_vals"][None])
            if "mask_words" in batch:
                from ..ops.sampling import apply_token_bitmask
                logits = apply_token_bitmask(logits,
                                             batch["mask_words"][None])
            tokens = sample(logits, self._sampling_tensors(batch),
                            greedy_only=greedy_only)
            if logprobs_l > 0:
                lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                tv, ti = jax.lax.top_k(lp, logprobs_l)
                chosen = lp[jnp.arange(1), tokens]
                lp_row = jnp.concatenate(
                    [tv, ti.astype(jnp.float32), chosen[:, None]],
                    axis=1)[0]
                return new_caches, page_scores, tokens, lp_row
        else:
            tokens = jnp.zeros((1,), jnp.int32)
        if logprobs_l > 0:
            return (new_caches, page_scores, tokens,
                    jnp.zeros(2 * logprobs_l + 1, jnp.float32))
        return new_caches, page_scores, tokens

    def _prefill_ctx_prune(self, params, caches, page_scores, batch,
                           greedy_only=False, logprobs_l=0):
        """FINAL chunk of a chunked prefill under paged eviction — the
        superset program both the fork and upstream reject
        (arg_utils.py:1185, torch_cuda_sdpa.py:877).  Earlier chunks
        wrote full pages (_prefill_context); this chunk (a) writes its
        own rows, (b) gathers the WHOLE prompt back from the pages,
        (c) scores it and compacts each layer's keep set into the
        leading pages (attend-then-evict ordering: the chunk's queries
        attend the full context, storage is pruned), after which the
        scheduler shrinks the block table."""
        from ..ops.quant import QuantKV, dequantize_kv

        ev = self.evict
        assert ev is not None
        score_based = ev.evict_method in ("local", "global",
                                          "inverse_key_l2")
        s_pad = batch["prune_pages"].shape[0] * self.block_size

        def attn_fn(q, k, v, layer_cache):
            kc, vc = layer_cache
            kc, vc = write_kv_pages(kc, vc, k, v, batch["write_pages"])
            # Whole prompt (ctx pages + the chunk just written).
            k_all = index_cache_pages(kc, batch["full_tables"])
            v_all = index_cache_pages(vc, batch["full_tables"])
            if isinstance(k_all, QuantKV):
                k_all = dequantize_kv(k_all).astype(q.dtype)
                v_all = dequantize_kv(v_all).astype(q.dtype)
            fp, ps = k_all.shape[0], k_all.shape[1]
            k_full = k_all.reshape(fp * ps, *k_all.shape[2:])
            v_full = v_all.reshape(fp * ps, *v_all.shape[2:])
            if score_based:
                scores = token_scores(k_full, v_full, ev.evict_method)
            else:
                scores = jnp.zeros(k_full.shape[:2], jnp.float32)
            keep_idx = prompt_keep_indices(
                scores, batch["prompt_len"], self.block_size,
                batch["evict_budget"], ev.evict_method, s_pad)
            k_kept, v_kept = gather_pruned_kv(k_full, v_full, keep_idx)
            # Chunk attention over the pre-prune context (static-shape
            # ctx gather, same as _prefill_context; the compaction
            # scatter below orders after these reads functionally).
            k_ctx = index_cache_pages(kc, batch["ctx_tables"])
            v_ctx = index_cache_pages(vc, batch["ctx_tables"])
            if isinstance(k_ctx, QuantKV):
                k_ctx = dequantize_kv(k_ctx).astype(q.dtype)
                v_ctx = dequantize_kv(v_ctx).astype(q.dtype)
            cp = k_ctx.shape[0]
            k_ctx = k_ctx.reshape(cp * ps, *k_ctx.shape[2:])
            v_ctx = v_ctx.reshape(cp * ps, *v_ctx.shape[2:])
            out = self._ctx_attn(q, k_ctx, v_ctx, k, v, self.scale,
                                 batch["q_len"], batch["ctx_len"])
            kc, vc = write_kv_pages(kc, vc, k_kept, v_kept,
                                    batch["prune_pages"])
            return out, (kc, vc)

        lk = (self._lora_kwargs(params, batch["lora_idx"])
              if self.lora_enabled else {})
        hidden, new_caches = self.model.forward_hidden(
            params, batch["tokens"], batch["positions"], attn_fn, caches,
            **lk)
        if self.track_page_scores:
            # Seed the kept pages' value-L2 scores (layer-0 convention,
            # same as _finish_prefill's fill_pages seeding) so the first
            # decode-boundary L2 victim selection after a chunked prefill
            # reads real scores, not the zero-initialized array.
            page_scores = self._update_page_scores(
                page_scores, new_caches[1], batch["prune_pages"])
        last = hidden[batch["q_len"] - 1][None]
        logits = self.model.logits(params, last)
        if "bias_ids" in batch:
            logits = logits.astype(jnp.float32).at[
                jnp.zeros(1, jnp.int32)[:, None],
                batch["bias_ids"][None]].add(batch["bias_vals"][None])
        if "mask_words" in batch:
            from ..ops.sampling import apply_token_bitmask
            logits = apply_token_bitmask(logits,
                                         batch["mask_words"][None])
        tokens = sample(logits, self._sampling_tensors(batch),
                        greedy_only=greedy_only)
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[jnp.arange(1), tokens]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]],
                axis=1)[0]
            return new_caches, page_scores, tokens, lp_row
        return new_caches, page_scores, tokens

    def _prefill_ctx_prune_pp(self, params, caches, page_scores, batch,
                              greedy_only=False, logprobs_l=0):
        """FINAL chunk of a chunked prefill under paged eviction, staged
        over the PP mesh axis — the composition the config rejected
        through round 4.  Same single-microbatch wave as
        _prefill_context_pp; each stage's layers score the whole prompt
        from their own pools and compact their keep sets when they are
        the wave front (per-layer keep sets, exactly like the
        single-stage program).  Page scores are seeded from stage 0
        (layer-0 convention)."""
        from jax.sharding import PartitionSpec as P

        from ..models.llama import rms_norm
        from ..ops.quant import QuantKV, dequantize_kv
        from ..parallel.pipeline import _masked_psum, pp_prefill_wave
        trash_page = self.cache_engine.trash_page
        arch = self.model.arch
        ev = self.evict
        assert ev is not None
        score_based = ev.evict_method in ("local", "global",
                                          "inverse_key_l2")
        s_pad = batch["prune_pages"].shape[0] * self.block_size

        def body(params, caches, page_scores, batch):
            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    wp = jnp.where(active, batch["write_pages"],
                                   trash_page)
                    pp_pages = jnp.where(active, batch["prune_pages"],
                                         trash_page)
                    kc = jax.tree.map(lambda x: x[layer], kc_all)
                    vc = jax.tree.map(lambda x: x[layer], vc_all)
                    kc, vc = write_kv_pages(kc, vc, k, v, wp)
                    # Whole prompt back from the pages; score + compact.
                    k_all = index_cache_pages(kc, batch["full_tables"])
                    v_all = index_cache_pages(vc, batch["full_tables"])
                    if isinstance(k_all, QuantKV):
                        k_all = dequantize_kv(k_all).astype(q.dtype)
                        v_all = dequantize_kv(v_all).astype(q.dtype)
                    fp, ps = k_all.shape[0], k_all.shape[1]
                    k_full = k_all.reshape(fp * ps, *k_all.shape[2:])
                    v_full = v_all.reshape(fp * ps, *v_all.shape[2:])
                    if score_based:
                        scores = token_scores(k_full, v_full,
                                              ev.evict_method)
                    else:
                        scores = jnp.zeros(k_full.shape[:2], jnp.float32)
                    keep_idx = prompt_keep_indices(
                        scores, batch["prompt_len"], self.block_size,
                        batch["evict_budget"], ev.evict_method, s_pad)
                    k_kept, v_kept = gather_pruned_kv(k_full, v_full,
                                                      keep_idx)
                    # Chunk attention over the pre-prune context.
                    k_ctx = index_cache_pages(kc, batch["ctx_tables"])
                    v_ctx = index_cache_pages(vc, batch["ctx_tables"])
                    if isinstance(k_ctx, QuantKV):
                        k_ctx = dequantize_kv(k_ctx).astype(q.dtype)
                        v_ctx = dequantize_kv(v_ctx).astype(q.dtype)
                    cp = k_ctx.shape[0]
                    k_ctx = k_ctx.reshape(cp * ps, *k_ctx.shape[2:])
                    v_ctx = v_ctx.reshape(cp * ps, *v_ctx.shape[2:])
                    out = self._ctx_attn(q, k_ctx, v_ctx, k, v,
                                         self.scale, batch["q_len"],
                                         batch["ctx_len"])
                    kc, vc = write_kv_pages(kc, vc, k_kept, v_kept,
                                            pp_pages)
                    kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          kc_all, kc)
                    vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s),
                                          vc_all, vc)
                    return out, (kc_all, vc_all)
                return attn_fn

            h0 = self.model.embed(params, batch["tokens"])
            if arch.embed_scale is not None:
                h0 = h0 * jnp.asarray(arch.embed_scale, self.model.dtype)
            h, caches = pp_prefill_wave(self, params, caches, h0,
                                        batch["positions"], factory,
                                        lora_idx=batch.get("lora_idx"))
            stage = jax.lax.axis_index("pipe")
            if self.track_page_scores:
                ps_new = self._update_page_scores(
                    page_scores, caches[1], batch["prune_pages"])
                page_scores = _masked_psum(ps_new, stage == 0, "pipe")
            h_final = rms_norm(h, params["final_norm"],
                               arch.rms_norm_eps, arch.norm_unit_offset)
            last = h_final[batch["q_len"] - 1][None]
            logits = self.model.logits(params, last)
            if "bias_ids" in batch:
                logits = logits.astype(jnp.float32).at[
                    jnp.zeros(1, jnp.int32)[:, None],
                    batch["bias_ids"][None]].add(batch["bias_vals"][None])
            if "mask_words" in batch:
                from ..ops.sampling import apply_token_bitmask
                logits = apply_token_bitmask(logits,
                                             batch["mask_words"][None])
            tokens = sample(logits, self._sampling_tensors(batch),
                            greedy_only=greedy_only).astype(jnp.int32)
            tokens = _masked_psum(tokens, stage == self.pp - 1, "pipe")
            if logprobs_l > 0:
                lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                tv, ti = jax.lax.top_k(lp, logprobs_l)
                chosen = lp[jnp.arange(1), tokens]
                lp_row = jnp.concatenate(
                    [tv, ti.astype(jnp.float32), chosen[:, None]],
                    axis=1)[0]
                lp_row = _masked_psum(lp_row, stage == self.pp - 1,
                                      "pipe")
                return caches, page_scores, tokens, lp_row
            return caches, page_scores, tokens

        extra = (P(),) + ((P(),) if logprobs_l > 0 else ())
        return self._pp_shard_call(body, params, caches, page_scores,
                                   batch, extra_out_specs=extra)

    def _prefill_ctx_prune_jit(self, greedy: bool, logprobs_l: int):
        import functools
        key = (greedy, logprobs_l)
        if key not in self._prefill_ctx_prune_jits:
            body = (self._prefill_ctx_prune_pp if self.pp > 1
                    else self._prefill_ctx_prune)
            self._prefill_ctx_prune_jits[key] = jax.jit(
                functools.partial(body, greedy_only=greedy,
                                  logprobs_l=logprobs_l),
                donate_argnums=(1, 2))
        return self._prefill_ctx_prune_jits[key]

    def _spec_verify(self, params, caches, page_scores, batch):
        """Batched greedy verification of ngram proposals: B sequences x
        (k+1) query rows in one forward.  Row j of a sequence sees the
        paged KV up through its own freshly written slot (per-row kv_lens),
        which reuses the paged-decode attention kernel unchanged — the
        reference needs a dedicated multi-query scorer (spec_decode/
        batch_expansion.py); here it is just a bigger decode batch."""
        tables = batch["tables"]                    # [B, P]
        rows = batch["tokens"].shape[0]
        rep = rows // tables.shape[0]
        tables_rep = jnp.repeat(tables, rep, axis=0)

        def attn_fn(q, k, v, state, layer):
            kc_all, vc_all = state
            out, kc_all, vc_all = self._fused_attn(
                q, k, v, kc_all, vc_all, layer, tables_rep,
                batch["kv_lens"], batch["slots"], None)
            return out, (kc_all, vc_all)

        lk = (self._lora_kwargs(params, batch["lora_idx"])
              if self.lora_enabled else {})
        hidden, new_caches = self.model.forward_hidden(
            params, batch["tokens"], batch["positions"], attn_fn,
            self._kv_carry_in(caches), state_mode="carry", **lk)
        new_caches = self._kv_carry_out(new_caches)
        logits = self.model.logits(params, hidden)
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return new_caches, page_scores, toks

    def _spec_verify_pp(self, params, caches, page_scores, batch):
        """Greedy speculative verification under pipeline parallelism: the
        multi-row verify forward runs as one single-microbatch wave (all
        B x (k+1) rows together), cache writes steered to the trash slot
        on inactive ticks.  Host-side proposers (ngram) need nothing from
        the device, so the spec step composes with PP exactly like a
        prefill (reference: spec decode is V0-engine-wide and therefore
        runs under PP's virtual engines, vllm/spec_decode/)."""
        from jax.sharding import PartitionSpec as P

        from ..models.llama import rms_norm
        from ..parallel.pipeline import _masked_psum, pp_prefill_wave
        arch = self.model.arch
        trash_slot = self.cache_engine.trash_slot

        def body(params, caches, page_scores, batch):
            tables = batch["tables"]
            rows = batch["tokens"].shape[0]
            rep = rows // tables.shape[0]
            tables_rep = jnp.repeat(tables, rep, axis=0)

            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    slots = jnp.where(active, batch["slots"], trash_slot)
                    out, kc_all, vc_all = self._fused_attn(
                        q, k, v, kc_all, vc_all, layer, tables_rep,
                        batch["kv_lens"], slots, None)
                    return out, (kc_all, vc_all)
                return attn_fn

            h0 = self.model.embed(params, batch["tokens"])
            if arch.embed_scale is not None:
                h0 = h0 * jnp.asarray(arch.embed_scale, self.model.dtype)
            h, caches = pp_prefill_wave(self, params, caches, h0,
                                        batch["positions"], factory,
                                        lora_idx=batch.get("lora_idx"))
            h_final = rms_norm(h, params["final_norm"], arch.rms_norm_eps,
                               arch.norm_unit_offset)
            logits = self.model.logits(params, h_final)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            stage = jax.lax.axis_index("pipe")
            toks = _masked_psum(toks, stage == self.pp - 1, "pipe")
            return caches, page_scores, toks

        return self._pp_shard_call(body, params, caches, page_scores,
                                   batch, extra_out_specs=(P(),))

    def _spec_verify_sampled_pp(self, params, caches, page_scores, batch):
        """Rejection/typical-acceptance verification under pipeline
        parallelism: the multi-row wave of _spec_verify_pp, with the
        sampling tail (probs + accept/resample) computed on the last
        stage and broadcast via masked psums."""
        from jax.sharding import PartitionSpec as P

        from ..models.llama import rms_norm
        from ..ops.sampling import rejection_sample, sampling_probs
        from ..parallel.pipeline import _masked_psum, pp_prefill_wave
        arch = self.model.arch
        trash_slot = self.cache_engine.trash_slot

        def body(params, caches, page_scores, batch):
            tables = batch["tables"]
            rows = batch["tokens"].shape[0]
            rep = rows // tables.shape[0]
            tables_rep = jnp.repeat(tables, rep, axis=0)

            def factory(active):
                def attn_fn(q, k, v, state, layer):
                    kc_all, vc_all = state
                    slots = jnp.where(active, batch["slots"], trash_slot)
                    out, kc_all, vc_all = self._fused_attn(
                        q, k, v, kc_all, vc_all, layer, tables_rep,
                        batch["kv_lens"], slots, None)
                    return out, (kc_all, vc_all)
                return attn_fn

            h0 = self.model.embed(params, batch["tokens"])
            if arch.embed_scale is not None:
                h0 = h0 * jnp.asarray(arch.embed_scale, self.model.dtype)
            h, caches = pp_prefill_wave(self, params, caches, h0,
                                        batch["positions"], factory,
                                        lora_idx=batch.get("lora_idx"))
            h_final = rms_norm(h, params["final_norm"], arch.rms_norm_eps,
                               arch.norm_unit_offset)
            logits = self.model.logits(params, h_final)
            zeros = jnp.zeros(rows, jnp.int32)
            probs = sampling_probs(logits, SamplingTensors(
                temperature=batch["row_temp"], top_p=batch["row_top_p"],
                top_k=batch["row_top_k"], seed=zeros, step=zeros,
                min_p=batch["row_min_p"]))
            b = batch["proposals"].shape[0]
            probs = probs.reshape(b, rep, -1)
            sc = self.config.speculative
            if sc is not None and \
                    sc.acceptance_method == "typical_acceptance_sampler":
                from ..ops.sampling import typical_acceptance_sample
                toks, n_acc = typical_acceptance_sample(
                    probs, batch["proposals"],
                    sc.typical_posterior_threshold,
                    sc.typical_posterior_alpha)
            else:
                toks, n_acc = rejection_sample(probs, batch["proposals"],
                                               batch["seed"], batch["step"])
            stage = jax.lax.axis_index("pipe")
            toks = _masked_psum(toks, stage == self.pp - 1, "pipe")
            n_acc = _masked_psum(n_acc, stage == self.pp - 1, "pipe")
            return caches, page_scores, (toks, n_acc)

        return self._pp_shard_call(body, params, caches, page_scores,
                                   batch, extra_out_specs=((P(), P()),))

    def _spec_verify_sampled(self, params, caches, page_scores, batch):
        """Rejection-sampling verification (reference
        vllm/model_executor/layers/rejection_sampler.py, here in-graph):
        the same multi-row forward as _spec_verify, then per-row target
        sampling distributions and Leviathan accept/resample."""
        from ..ops.sampling import rejection_sample, sampling_probs
        tables = batch["tables"]
        rows = batch["tokens"].shape[0]
        rep = rows // tables.shape[0]
        tables_rep = jnp.repeat(tables, rep, axis=0)

        def attn_fn(q, k, v, state, layer):
            kc_all, vc_all = state
            out, kc_all, vc_all = self._fused_attn(
                q, k, v, kc_all, vc_all, layer, tables_rep,
                batch["kv_lens"], batch["slots"], None)
            return out, (kc_all, vc_all)

        lk = (self._lora_kwargs(params, batch["lora_idx"])
              if self.lora_enabled else {})
        hidden, new_caches = self.model.forward_hidden(
            params, batch["tokens"], batch["positions"], attn_fn,
            self._kv_carry_in(caches), state_mode="carry", **lk)
        new_caches = self._kv_carry_out(new_caches)
        logits = self.model.logits(params, hidden)          # [rows, V]
        zeros = jnp.zeros(rows, jnp.int32)
        probs = sampling_probs(logits, SamplingTensors(
            temperature=batch["row_temp"], top_p=batch["row_top_p"],
            top_k=batch["row_top_k"], seed=zeros, step=zeros,
            min_p=batch["row_min_p"]))
        b = batch["proposals"].shape[0]
        probs = probs.reshape(b, rep, -1)
        sc = self.config.speculative
        if sc is not None and \
                sc.acceptance_method == "typical_acceptance_sampler":
            from ..ops.sampling import typical_acceptance_sample
            toks, n_acc = typical_acceptance_sample(
                probs, batch["proposals"],
                sc.typical_posterior_threshold,
                sc.typical_posterior_alpha)
        else:
            toks, n_acc = rejection_sample(probs, batch["proposals"],
                                           batch["seed"], batch["step"])
        return new_caches, page_scores, (toks, n_acc)

    def _spec_batch(self, plans):
        n = len(plans)
        kp1 = len(plans[0].slots)
        b = next_bucket(n, self.decode_buckets)
        p = self.max_table_len
        trash_slot = self.cache_engine.trash_slot
        trash_page = self.cache_engine.trash_page
        rows = b * kp1

        tokens = np.zeros(rows, np.int32)
        positions = np.zeros(rows, np.int32)
        slots = np.full(rows, trash_slot, np.int32)
        kv_lens = np.ones(rows, np.int32)
        tables = np.full((b, p), trash_page, np.int32)
        lora_idx = np.zeros(rows, np.int32)
        for i, plan in enumerate(plans):
            seq = plan.seq
            row0 = i * kp1
            tokens[row0] = seq.last_token_id
            tokens[row0 + 1:row0 + kp1] = plan.proposals
            positions[row0:row0 + kp1] = plan.positions
            slots[row0:row0 + kp1] = plan.slots
            kv_lens[row0:row0 + kp1] = plan.base_kv + 1 + np.arange(kp1)
            pages = seq.block_table.pages
            tables[i, :len(pages)] = pages
            lora_idx[row0:row0 + kp1] = seq.lora_slot

        batch = {"tokens": tokens, "positions": positions, "slots": slots,
                 "kv_lens": kv_lens, "tables": tables}
        if self.lora_enabled:
            batch["lora_idx"] = lora_idx
        return batch, n, b, kp1

    def run_spec_verify(self, params, caches, page_scores, plans):
        """Host assembly for one speculative step (greedy verification).
        Returns (caches, page_scores, model_tokens [n, k+1])."""
        batch, n, b, kp1 = self._spec_batch(plans)
        caches, page_scores, toks = self._spec_verify_jit(
            params, caches, page_scores, batch)
        out = np.asarray(toks).reshape(b, kp1)[:n]
        return caches, page_scores, out

    def run_spec_verify_sampled(self, params, caches, page_scores, plans):
        """Speculative step with in-graph rejection sampling (stochastic
        requests; greedy rows reduce to argmax-match).  Returns
        (caches, page_scores, tokens [n, k+1], n_accepted [n])."""
        batch, n, b, kp1 = self._spec_batch(plans)
        k = kp1 - 1
        rows = b * kp1
        samp = self._seq_sampling_arrays([pl.seq for pl in plans], b)
        batch["row_temp"] = np.repeat(samp["temperature"], kp1)
        batch["row_top_p"] = np.repeat(samp["top_p"], kp1)
        batch["row_top_k"] = np.repeat(samp["top_k"], kp1)
        batch["row_min_p"] = np.repeat(samp["min_p"], kp1)
        assert batch["row_temp"].shape == (rows,)
        batch["seed"] = samp["seed"]
        batch["step"] = samp["step"]
        proposals = np.zeros((b, k), np.int32)
        for i, plan in enumerate(plans):
            proposals[i] = plan.proposals
        batch["proposals"] = proposals
        caches, page_scores, (toks, n_acc) = self._spec_verify_sampled_jit(
            params, caches, page_scores, batch)
        return (caches, page_scores, np.asarray(toks)[:n],
                np.asarray(n_acc)[:n])

    def _build_input_embeds(self, params, batch):
        """Pre-built prompt embeddings for prefill, or None when plain
        token embedding suffices.  Composes two splices:

        - image features over the placeholder span (multimodal; reference
          merges inside the llava forward,
          vllm/model_executor/models/llava.py)
        - a soft-prompt virtual prefix over the leading placeholder rows
          (prompt adapters, reference vllm/prompt_adapter/)."""
        if "pixel_values" not in batch and "mm_feats" not in batch \
                and "pa_slot" not in batch:
            return None
        emb = self.model.embed(params, batch["tokens"])
        es = getattr(self.model.arch, "embed_scale", None)
        if es is not None:
            emb = emb * jnp.asarray(es, emb.dtype)
        if "pixel_values" in batch:
            feats = self.model.encode_image(params, batch["pixel_values"])
            emb = jax.lax.dynamic_update_slice(
                emb, feats.astype(emb.dtype),
                (batch["img_start"], jnp.int32(0)))
        if "mm_feats" in batch:
            # Host-assembled features (Llava-Next anyres etc.: variable
            # unpadded layouts are assembled outside the jit).
            emb = jax.lax.dynamic_update_slice(
                emb, batch["mm_feats"].astype(emb.dtype),
                (batch["img_start"], jnp.int32(0)))
        if "pa_slot" in batch:
            table = params["prompt_adapters"]           # [S, T, D]
            max_pa = table.shape[1]
            rows = table[batch["pa_slot"]]
            mask = (jnp.arange(max_pa) < batch["pa_len"])[:, None]
            head = jnp.where(mask, rows.astype(emb.dtype), emb[:max_pa])
            emb = jnp.concatenate([head, emb[max_pa:]], axis=0)
        return emb

    # ------------------------------------------------------------------
    # KV transfer (disaggregated prefill, SURVEY C19)
    # ------------------------------------------------------------------

    def extract_seq_kv(self, caches, pages: list[int]):
        """Gather one sequence's KV pages to host numpy:
        [L, n_pages, page_size, Hkv, d] per pool (leaves of QuantKV for
        quantized pools) — the producer half of a KV transfer."""
        idx = jnp.asarray(pages, jnp.int32)
        k, v = caches
        gather = lambda x: np.asarray(x[:, idx])  # noqa: E731
        return (jax.tree.map(gather, k), jax.tree.map(gather, v))

    def inject_seq_kv(self, caches, kv_host, pages: list[int]):
        """Scatter transferred pages into this engine's pools (consumer
        half).  Returns the updated caches."""
        idx = jnp.asarray(pages, jnp.int32)
        k, v = caches
        kh, vh = kv_host
        put = lambda c, h: c.at[:, idx].set(  # noqa: E731
            jnp.asarray(h, c.dtype))
        return (jax.tree.map(put, k, kh), jax.tree.map(put, v, vh))

    def _finish_prefill(self, params, caches, page_scores, batch,
                        attn_fn, greedy_only=False, logprobs_l=0,
                        state_mode="scan"):
        lk = (self._lora_kwargs(params, batch["lora_idx"])
              if self.lora_enabled else {})
        ie = self._build_input_embeds(params, batch)
        if ie is not None:
            lk["input_embeds"] = ie
        hidden, new_caches = self.model.forward_hidden(
            params, batch["tokens"], batch["positions"], attn_fn, caches,
            state_mode=state_mode, **lk)
        if self.track_page_scores:
            page_scores = self._update_page_scores(
                page_scores, new_caches[1], batch["fill_pages"])
        last = hidden[batch["q_len"] - 1][None]
        logits = self.model.logits(params, last)
        if "bias_ids" in batch:
            logits = logits.astype(jnp.float32).at[
                jnp.zeros(1, jnp.int32)[:, None],
                batch["bias_ids"][None]].add(batch["bias_vals"][None])
        if "mask_words" in batch:
            from ..ops.sampling import apply_token_bitmask
            logits = apply_token_bitmask(logits, batch["mask_words"][None])
        tokens = sample(logits, self._sampling_tensors(batch),
                        greedy_only=greedy_only)
        lp_row = None
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[jnp.arange(1), tokens]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1)[0]
        return new_caches, page_scores, tokens, lp_row

    # ------------------------------------------------------------------
    # host-side batch assembly
    # ------------------------------------------------------------------

    def _seq_sampling_arrays(self, seqs, n_pad):
        temp = np.zeros(n_pad, np.float32)
        top_p = np.ones(n_pad, np.float32)
        min_p = np.zeros(n_pad, np.float32)
        top_k = np.full(n_pad, -1, np.int32)
        seed = np.zeros(n_pad, np.int32)
        step = np.zeros(n_pad, np.int32)
        presence = np.zeros(n_pad, np.float32)
        frequency = np.zeros(n_pad, np.float32)
        repetition = np.ones(n_pad, np.float32)
        for i, seq in enumerate(seqs):
            p = seq.params
            temp[i] = p.temperature
            top_p[i] = p.top_p
            min_p[i] = p.min_p
            top_k[i] = p.top_k
            seed[i] = (p.seed if p.seed is not None
                       else (zlib.crc32(seq.request_id.encode())
                             & 0x7FFFFFFF))
            step[i] = seq.num_output_tokens
            presence[i] = p.presence_penalty
            frequency[i] = p.frequency_penalty
            repetition[i] = p.repetition_penalty
        return {"temperature": temp, "top_p": top_p, "top_k": top_k,
                "seed": seed, "step": step, "presence": presence,
                "frequency": frequency, "repetition": repetition,
                "min_p": min_p}

    def run_decode_window(self, params, caches, page_scores,
                          plans: list[SeqWindowPlan], k: int):
        """Dispatch one window and fetch its results synchronously.
        Returns (caches, scores, tokens [K, n], victims [K, n])."""
        caches, page_scores, handle = self.dispatch_decode_window(
            params, caches, page_scores, plans, k)
        tokens, victims, _lp = handle.fetch()
        return caches, page_scores, tokens, victims

    def dispatch_decode_window(self, params, caches, page_scores,
                               plans: list[SeqWindowPlan], k: int,
                               dyn_state=None):
        """Pack K-step plans for B sequences and dispatch the window jit
        WITHOUT waiting for results: returns (caches, scores, handle).

        ``dyn_state``: a previous window's ``handle.state`` device array —
        the chained window starts from the device-resident end state
        (tables/kv/pages/last-token) so no host round trip sits between
        consecutive windows.  The async-engine analog of the reference's
        multi-step worker lookahead (vllm/worker/multi_step_model_runner),
        which upstream forbids together with eviction
        (arg_utils.py:1255-1257)."""
        n = len(plans)
        b = next_bucket(n, self.decode_buckets)
        p = self.max_table_len
        trash_slot = self.cache_engine.trash_slot
        trash_page = self.cache_engine.trash_page
        nf = len(self._PLAN_FIELDS)

        plan_pack = np.zeros((k, nf, b), np.int32)
        # Sane defaults for padded lanes / sentinel remapping.
        plan_pack[:, 1, :] = trash_slot           # slots
        plan_pack[:, 3, :] = -1                   # victims
        plan_pack[:, 4, :] = trash_slot           # zero_slots
        plan_pack[:, 5, :] = trash_page           # fill_pages
        plan_pack[:, 6, :] = -1                   # new_pages
        for i, plan in enumerate(plans):
            plan_pack[:, 0, i] = plan.positions[:k]
            plan_pack[:, 1, i] = plan.slots[:k]
            plan_pack[:, 2, i] = np.asarray(plan.evict[:k], np.int32)
            plan_pack[:, 3, i] = plan.victims[:k]
            zs = np.asarray(plan.zero_slots[:k], np.int32)
            plan_pack[:, 4, i] = np.where(zs < 0, trash_slot, zs)
            fp = np.asarray(plan.fill_pages[:k], np.int32)
            plan_pack[:, 5, i] = np.where(fp < 0, trash_page, fp)
            plan_pack[:, 6, i] = plan.new_pages[:k]
            plan_pack[:, 7, i] = plan.steps[:k]

        state_pack = np.zeros((b, p + 6), np.int32)
        state_pack[:, :p] = trash_page
        f32_pack = np.zeros((6, b), np.float32)
        f32_pack[1, :] = 1.0  # top_p
        f32_pack[4, :] = 1.0  # repetition
        samp = self._seq_sampling_arrays([pl.seq for pl in plans], b)
        state_pack[:, p + 3] = samp["seed"]
        state_pack[:, p + 4] = samp["top_k"]
        f32_pack[0, :] = samp["temperature"]
        f32_pack[1, :] = samp["top_p"]
        f32_pack[2, :] = samp["presence"]
        f32_pack[3, :] = samp["frequency"]
        f32_pack[4, :] = samp["repetition"]
        f32_pack[5, :] = samp["min_p"]
        for i, plan in enumerate(plans):
            seq = plan.seq
            pages = seq.block_table.pages
            state_pack[i, :len(pages)] = pages
            state_pack[i, p] = seq.block_table.num_kv_slots
            state_pack[i, p + 1] = len(pages)
            state_pack[i, p + 2] = seq.last_token_id
            state_pack[i, p + 5] = seq.lora_slot

        has_penalties = any(
            pl.seq.params.presence_penalty != 0.0
            or pl.seq.params.frequency_penalty != 0.0
            or pl.seq.params.repetition_penalty != 1.0 for pl in plans)
        greedy = (not has_penalties
                  and all(pl.seq.params.greedy for pl in plans))
        counts = None
        if not greedy:
            # Generated-token counts feed the penalty terms (output-only,
            # matching the reference's PenaltyComputer semantics for
            # presence/frequency).
            vocab = self.model.arch.vocab_size
            counts = np.zeros((b, vocab), np.int32)
            for i, pl in enumerate(plans):
                ids, cnt = np.unique(
                    np.asarray(pl.seq.all_output_token_ids, np.int64),
                    return_counts=True)
                if len(ids):
                    counts[i, ids] = cnt
        if dyn_state is not None:
            assert dyn_state.shape == state_pack.shape, \
                (dyn_state.shape, state_pack.shape)
            state_pack = dyn_state
        logprobs_l = max((pl.seq.params.logprobs or 0) for pl in plans)
        logprobs_l = min(logprobs_l, 32)
        mask_pack = None
        if any(self._lane_needs_mask(pl.seq) for pl in plans):
            # Allowed-token bitmasks.  Step-wise constraints (guided FSM,
            # multi-token bad_words) see every token before the next mask,
            # so the engine clamps their windows to one step; static and
            # step-predictable constraints (allowed_token_ids, single-token
            # bad_words, min-tokens stop ban) fill all K rows up front.
            if any(self.lane_needs_stepwise_mask(pl.seq) for pl in plans):
                assert k == 1, \
                    "step-wise-masked decode windows must be single-step"
                assert dyn_state is None
            mask_pack = np.full((k, b, self._mask_w), 0xFFFFFFFF,
                                np.uint32)
            for i, pl in enumerate(plans):
                if not self._lane_needs_mask(pl.seq):
                    continue
                for j in range(k):
                    words = self._lane_mask_words(pl.seq, j)
                    if words is not None:
                        mask_pack[j, i] = words
        bias_pack = self._bias_arrays([pl.seq for pl in plans], b)
        caches, page_scores, out_pack, new_state, lp = \
            self._decode_jit(greedy, logprobs_l)(
                params, caches, page_scores, plan_pack, state_pack,
                f32_pack, counts, mask_pack, bias_pack)
        return caches, page_scores, WindowHandle(out_pack, new_state, k, n,
                                                 lp, logprobs_l)

    def run_prefill(self, params, caches, page_scores,
                    sp: ScheduledPrefill):
        if self.is_mamba:
            return self._run_prefill_mamba(params, caches, page_scores, sp)
        if sp.chunk_start > 0 or not sp.is_last or sp.prune_on_last:
            return self._run_prefill_chunk(params, caches, page_scores, sp)
        seq = sp.seq
        bs = self.block_size
        trash_slot = self.cache_engine.trash_slot
        trash_page = self.cache_engine.trash_page
        prompt = seq.prompt_token_ids
        q_len = len(prompt)
        l_pad = next_bucket(q_len, self.prefill_buckets)
        do_prune = self.evict is not None and sp.stored_len < sp.prompt_len
        stored = sp.stored_len
        pages = seq.block_table.pages

        tokens = np.zeros(l_pad, np.int32)
        tokens[:q_len] = prompt
        positions = np.arange(l_pad, dtype=np.int32)

        if do_prune:
            # One static pruned-output width per config (rounded for tiling
            # and to whole pages).
            s_pad = min(((self.stored_cap + 127) // 128) * 128, l_pad)
            s_pad = -(-s_pad // bs) * bs
        else:
            s_pad = l_pad
        # Page-granular write vector (see ops.cache.write_kv_pages).
        write_pages = np.full(s_pad // bs, trash_page, np.int32)
        n_full = -(-stored // bs)
        write_pages[:n_full] = pages[:n_full]

        f_max = s_pad // bs + 1
        fill_pages = np.full(f_max, trash_page, np.int32)
        for j in range(min(stored // bs, f_max)):
            fill_pages[j] = pages[j]

        batch = {
            "tokens": tokens, "positions": positions,
            "q_len": np.int32(q_len), "stored_len": np.int32(stored),
            "write_pages": write_pages, "fill_pages": fill_pages,
        }
        if do_prune:
            # Per-sequence token budget (percentage prune type resolves
            # it from the prompt length; budget mode: the config value).
            batch["evict_budget"] = np.int32(
                seq.evict_budget if seq.evict_budget is not None
                else self.evict.cache_budget)
        batch.update(self._seq_sampling_arrays([seq], 1))
        if self.lora_enabled:
            batch["lora_idx"] = np.int32(seq.lora_slot)
        if getattr(seq, "mm_feats", None) is not None:
            batch["mm_feats"] = seq.mm_feats
            batch["img_start"] = np.int32(seq.mm_start)
        elif getattr(seq, "pixel_values", None) is not None:
            batch["pixel_values"] = seq.pixel_values
            batch["img_start"] = np.int32(seq.mm_start)
        if getattr(seq, "mrope_positions", None) is not None:
            # Qwen2-VL: [3, T] t/h/w position streams for the prompt;
            # padded columns continue past the max (masked rows anyway).
            p3 = np.zeros((3, l_pad), np.int32)
            p3[:, :q_len] = seq.mrope_positions[:, :q_len]
            if l_pad > q_len:
                p3[:, q_len:] = (seq.mrope_positions.max() + 1
                                 + np.arange(l_pad - q_len))
            batch["positions"] = p3
        if getattr(seq, "pa_len", 0) > 0:
            batch["pa_slot"] = np.int32(seq.pa_slot)
            batch["pa_len"] = np.int32(seq.pa_len)
        if self._lane_needs_mask(seq):
            words = self._lane_mask_words(seq, 0)
            if words is not None:
                batch["mask_words"] = words
        bias = self._bias_arrays([seq], 1)
        if bias is not None:
            batch["bias_ids"], batch["bias_vals"] = (bias[0][0],
                                                     bias[1][0])
        greedy = seq.params.greedy
        logprobs_l = min(seq.params.logprobs or 0, 32)
        fn = self._prefill_jit(do_prune, greedy, logprobs_l)
        caches, page_scores, tok, lp_row = fn(params, caches, page_scores,
                                              batch)
        lp = np.asarray(lp_row) if lp_row is not None else None
        return caches, page_scores, int(np.asarray(tok)[0]), lp

    def _run_prefill_chunk(self, params, caches, page_scores,
                           sp: ScheduledPrefill):
        """Host assembly for one prompt chunk / cached-prefix suffix."""
        seq = sp.seq
        bs = self.block_size
        trash_slot = self.cache_engine.trash_slot
        trash_page = self.cache_engine.trash_page
        pages = seq.block_table.pages
        start, end = sp.chunk_start, sp.chunk_end
        tc = end - start
        tc_pad = next_bucket(tc, self.prefill_buckets)

        tokens = np.zeros(tc_pad, np.int32)
        tokens[:tc] = seq.prompt_token_ids[start:end]
        positions = np.arange(start, start + tc_pad, dtype=np.int32)

        # start is page-aligned (scheduler aligns non-final chunks);
        # page-granular write vector for the chunk span.
        assert start % bs == 0, "chunk start must be page-aligned"
        write_pages = np.full(tc_pad // bs, trash_page, np.int32)
        first_pg = start // bs
        n_full = -(-tc // bs)
        write_pages[:n_full] = pages[first_pg:first_pg + n_full]

        ctx_pages_used = cdiv(start, bs)
        cp_pad = next_bucket(max(ctx_pages_used, 1), self._ctx_page_buckets)
        ctx_tables = np.full(cp_pad, trash_page, np.int32)
        ctx_tables[:ctx_pages_used] = pages[:ctx_pages_used]

        batch = {
            "tokens": tokens, "positions": positions,
            "q_len": np.int32(tc), "ctx_len": np.int32(start),
            "write_pages": write_pages, "ctx_tables": ctx_tables,
        }
        batch.update(self._seq_sampling_arrays([seq], 1))
        if self.lora_enabled:
            batch["lora_idx"] = np.int32(seq.lora_slot)
        if sp.is_last:
            if self._lane_needs_mask(seq):
                words = self._lane_mask_words(seq, 0)
                if words is not None:
                    batch["mask_words"] = words
            bias = self._bias_arrays([seq], 1)
            if bias is not None:
                batch["bias_ids"], batch["bias_vals"] = (bias[0][0],
                                                         bias[1][0])
        logprobs_l = (min(seq.params.logprobs or 0, 32)
                      if sp.is_last else 0)
        if sp.is_last and sp.prune_on_last:
            # Chunked prefill x eviction: the final chunk also scores
            # the whole prompt and compacts the keep set (the engine
            # shrinks the table right after this call).
            prompt_len = sp.prompt_len
            full_pages_used = cdiv(prompt_len, bs)
            fp_pad = next_bucket(max(full_pages_used, 1),
                                 self._ctx_page_buckets)
            full_tables = np.full(fp_pad, trash_page, np.int32)
            full_tables[:full_pages_used] = pages[:full_pages_used]
            s_pad = min(((self.stored_cap + 127) // 128) * 128,
                        fp_pad * bs)
            s_pad = -(-s_pad // bs) * bs
            _, stored = _blocks_after_prune(prompt_len, self.evict, bs,
                                            seq.evict_budget)
            prune_pages = np.full(s_pad // bs, trash_page, np.int32)
            n_keep = cdiv(stored, bs)
            prune_pages[:n_keep] = pages[:n_keep]
            batch["full_tables"] = full_tables
            batch["prune_pages"] = prune_pages
            batch["prompt_len"] = np.int32(prompt_len)
            batch["evict_budget"] = np.int32(
                seq.evict_budget if seq.evict_budget is not None
                else self.evict.cache_budget)
            fn = self._prefill_ctx_prune_jit(seq.params.greedy,
                                             logprobs_l)
        else:
            fn = self._prefill_ctx_jit(seq.params.greedy, sp.is_last,
                                       logprobs_l)
        out = fn(params, caches, page_scores, batch)
        if logprobs_l > 0:
            caches, page_scores, tok, lp_row = out
            return (caches, page_scores, int(np.asarray(tok)[0]),
                    np.asarray(lp_row))
        caches, page_scores, tok = out
        return caches, page_scores, int(np.asarray(tok)[0]), None
