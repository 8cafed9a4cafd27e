"""Pipeline parallelism: GPipe-style stage execution over a "pipe" mesh axis.

TPU-native re-design of the reference's pipeline parallelism (one virtual
engine per PP stage, vllm/engine/llm_engine.py:1331-1338, with
IntermediateTensors sent between stage processes via
parallel_state.py:668-845 send/recv).  Here there are no stage processes:
the decode window runs as ONE shard_map over the "pipe" axis — each device
holds a contiguous slice of the stacked layer parameters and KV pools
(mesh.param_shardings / kv_cache_sharding with pipeline_parallel > 1), and
hidden states hop stages via ``jax.lax.ppermute``.

Decode schedule: the batch is split into S microbatches (S = stage count);
each window step runs 2S-1 ticks — at tick t, stage s processes microbatch
(t - s) through its local layers and permutes the hidden state to stage
s+1.  Stage 0 ingests embeddings; the last stage accumulates finished
hidden states, computes logits, samples, and broadcasts the tokens (and
anything else stage-local: page-score updates live on stage 0 because
global layer 0 is its first local layer) back to every stage via a masked
psum — all replicated values stay bit-identical across stages, which is
what lets every stage run the same plan math without synchronization.

Prefill runs the same wave with a single microbatch (the whole prompt):
stage s is active at tick s; inactive stages execute the same ops with
their cache writes steered to the trash page.

TP composes inside PP: the shard_map is manual over "pipe" ONLY
(axis_names), so "model"-axis weight shardings flow through the boundary
and GSPMD inserts each stage's TP collectives in place — no weight
re-gather (verified: 0 all-gathers of TP weights in the compiled HLO vs 3
with a fully-manual map).

Remaining restriction (asserted at engine construction): llama-family
trunks only.  Speculative decoding composes fully — host-side (ngram)
AND model-based proposers (draft/medusa/mlp/eagle) with greedy, sampled
rejection, or typical-acceptance verification (model_runner's PP
spec-verify waves).  Multi-LoRA serving composes: adapter stacks
[L, S, ...] shard their layer axis over "pipe" exactly like
params["layers"] and ride the same layer scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipe_specs_for(tree, leading_pipe: bool):
    """A matching pytree of PartitionSpecs: P("pipe") on every leaf when
    ``leading_pipe`` (the leading axis is the stacked layer axis),
    replicated otherwise."""
    spec = P("pipe") if leading_pipe else P()
    return jax.tree.map(lambda _: spec, tree)


def lora_specs(lora: dict):
    """Adapter stacks [L, S, in, r]/[L, S, r, out] shard their leading
    (layer) axis over "pipe" like params["layers"]; the per-slot "scale"
    vector replicates."""
    return {k: (P() if k == "scale" else P("pipe"))
            for k in lora}


def param_specs(params: dict):
    """"layers" (llama/mamba stacked depth), "block_list" (Jamba PP
    period blocks), and "dec_layers" (BART decoder stack) lead with the
    pipe-sharded axis; everything else (incl. BART's replicated encoder
    stack) replicates w.r.t. "pipe"."""
    return {k: (lora_specs(v) if k == "lora"
                else pipe_specs_for(v,
                                    leading_pipe=(k in ("layers",
                                                        "block_list",
                                                        "dec_layers"))))
            for k, v in params.items()}


def cache_pipe_specs(caches):
    """Per-leaf pipe specs for cache/state pools: layer-major pools
    (rank >= 4, incl. the hybrid K/V and conv/SSM pools and the llama KV
    pools) shard their leading layer axis over "pipe"; per-slot counters
    (rank 1, e.g. Jamba's position pool) replicate."""
    return jax.tree.map(
        lambda x: P("pipe") if x.ndim >= 4 else P(), caches)


def _masked_psum(value, cond, axis):
    """Broadcast ``value`` from the single stage where ``cond`` holds."""
    z = jax.tree.map(lambda x: jnp.where(cond, x, jnp.zeros_like(x)), value)
    return jax.lax.psum(z, axis)


def _mb_slice(x, m, size, num_mb):
    start = jnp.clip(m, 0, num_mb - 1) * size
    return jax.lax.dynamic_slice_in_dim(x, start, size, axis=0)


def _reset_trash_counters(caches, trash_slot):
    """Zero the trash slot's per-slot counters (rank-1 leaves, e.g.
    Jamba's position pool) so out-of-wave ticks steered at the trash
    slot can't grow them without bound across windows — correctness
    must not lean on scatter/gather index clamping (advisor, round 4)."""
    return jax.tree.map(
        lambda x: x.at[trash_slot].set(0) if x.ndim == 1 else x, caches)


def pp_decode_window_body(runner, params, caches, page_scores, plan_pack,
                          state_pack, f32_pack, token_counts=None,
                          mask_pack=None, bias_pack=None,
                          greedy_only=False, logprobs_l=0):
    """shard_map body over ("pipe",): the PP analog of
    ModelRunner._decode_window.  All plan/table math is replicated; only
    the transformer layers are stage-local."""
    from ..models.llama import rms_norm
    from ..ops.sampling import SamplingTensors, sample

    model = runner.model
    arch = model.arch
    pp = runner.pp
    p = runner.max_table_len
    b = state_pack.shape[0]
    assert b % pp == 0, (b, pp)
    g = b // pp
    stage = jax.lax.axis_index("pipe")
    trash_slot = runner.cache_engine.trash_slot

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
    zero_writes = runner.zero_writes
    iota_b = jnp.arange(b)
    hidden_dim = arch.hidden_size
    dtype = model.dtype

    def body(carry, xs):
        caches, page_scores, tables, kv_lens, num_pages, tokens, \
            counts = carry
        xs_plan, mask = (xs, None) if mask_pack is None else xs
        positions, slots, evict, victims_in, zero_slots, fill_pages, \
            new_pages, stepctr = (xs_plan[i] for i in
                                  range(len(runner._PLAN_FIELDS)))
        eff_tables, eff_kv, num_pages, victims = runner._step_tables(
            page_scores, tables, kv_lens, num_pages, evict, victims_in,
            new_pages)

        # ---- pipelined forward: S microbatches through S stages ----
        h_buf = jnp.zeros((g, hidden_dim), dtype)
        out_h = jnp.zeros((b, hidden_dim), dtype)

        def tick(carry2, t):
            h_buf, caches, out_h = carry2
            m = t - stage
            valid = (m >= 0) & (m < pp)
            toks_mb = _mb_slice(tokens, m, g, pp)
            pos_mb = _mb_slice(positions, m, g, pp)
            emb = model.embed(params, toks_mb)
            if arch.embed_scale is not None:
                emb = emb * jnp.asarray(arch.embed_scale, dtype)
            h_in = jnp.where((stage == 0) & valid, emb, h_buf)

            # Steer writes of out-of-wave ticks to the trash slot.
            slots_mb = jnp.where(valid, _mb_slice(slots, m, g, pp),
                                 trash_slot)
            zslots_mb = (jnp.where(valid, _mb_slice(zero_slots, m, g, pp),
                                   trash_slot) if zero_writes else None)
            tbl_mb = _mb_slice(eff_tables, m, g, pp)
            kv_mb = _mb_slice(eff_kv, m, g, pp)

            def attn_fn(q, k, v, state, layer):
                kc, vc = state
                out, kc, vc = runner._fused_attn(
                    q, k, v, kc, vc, layer, tbl_mb, kv_mb, slots_mb,
                    zslots_mb)
                return out, (kc, vc)

            lk = (runner._lora_kwargs(params,
                                      _mb_slice(lora_slots, m, g, pp))
                  if runner.lora_enabled else {})
            h_out, caches = model.forward_layers(
                params, h_in, pos_mb, attn_fn, caches, state_mode="carry",
                **lk)
            h_out = h_out.astype(dtype)

            h_next = jax.lax.ppermute(
                h_out, "pipe", [(i, i + 1) for i in range(pp - 1)])
            m_out = t - (pp - 1)
            upd = jax.lax.dynamic_update_slice_in_dim(
                out_h, h_out, jnp.clip(m_out, 0, pp - 1) * g, axis=0)
            out_h = jnp.where(
                (stage == pp - 1) & (m_out >= 0) & (m_out < pp), upd, out_h)
            return (h_next, caches, out_h), None

        (h_buf, caches, out_h), _ = jax.lax.scan(
            tick, (h_buf, caches, out_h), jnp.arange(2 * pp - 1))

        if runner.track_page_scores:
            # Global layer 0 lives on stage 0.
            ps_new = runner._update_page_scores(page_scores, caches[1],
                                                fill_pages)
            page_scores = _masked_psum(ps_new, stage == 0, "pipe")

        h_final = rms_norm(out_h, params["final_norm"], arch.rms_norm_eps,
                           arch.norm_unit_offset)
        logits = model.logits(params, h_final)
        if not greedy_only:
            from ..ops.sampling import apply_penalties
            logits = apply_penalties(logits, counts, presence, frequency,
                                     repetition)
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
        toks = _masked_psum(toks, stage == pp - 1, "pipe")
        if counts is not None:
            counts = counts.at[iota_b, toks].add(1)
        carry = (caches, page_scores, eff_tables, eff_kv, num_pages, toks,
                 counts)
        ys = jnp.stack([toks, victims])
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[iota_b, toks]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1)
            lp_row = _masked_psum(lp_row, stage == pp - 1, "pipe")
            ys = (ys, lp_row)
        return carry, ys

    init = (caches, page_scores, tables0, kv0, np0, tok0, token_counts)
    xs = plan_pack if mask_pack is None else (plan_pack, mask_pack)
    carry, ys = jax.lax.scan(body, init, xs)
    (new_caches, page_scores, tables_end, kv_end, np_end, tok_end,
     _counts) = carry
    lp_pack = None
    if logprobs_l > 0:
        ys, lp_pack = ys          # lp_pack: [K, B, 2L+1] f32
    out_pack = jnp.swapaxes(ys, 0, 1)
    new_state = jnp.concatenate([
        tables_end, kv_end[:, None], np_end[:, None], tok_end[:, None],
        state_pack[:, p + 3:],
    ], axis=1)
    return new_caches, page_scores, out_pack, new_state, lp_pack


def pp_decode_window_body_mamba(runner, params, caches, page_scores,
                                plan_pack, state_pack, f32_pack,
                                token_counts=None, mask_pack=None,
                                bias_pack=None, greedy_only=False,
                                logprobs_l=0):
    """shard_map body over ("pipe",) for the Mamba trunk: the PP analog
    of ModelRunner._decode_window_mamba.  Each stage holds its slice of
    the stacked mixer layers AND of the conv/SSM state pools (leading
    layer axis sharded over "pipe"); the hidden state hops stages via
    ppermute exactly like the llama wave.  No block tables / eviction —
    the per-sequence state slot is the whole plan."""
    from ..ops.sampling import SamplingTensors, sample

    model = runner.model
    arch = model.arch
    pp = runner.pp
    p = runner.max_table_len
    b = state_pack.shape[0]
    assert b % pp == 0, (b, pp)
    g = b // pp
    stage = jax.lax.axis_index("pipe")
    trash_slot = runner.cache_engine.trash_page

    slots = state_pack[:, 0]
    tok0 = state_pack[:, p + 2]
    seeds = state_pack[:, p + 3]
    topk = state_pack[:, p + 4]
    temp, top_p, min_p = f32_pack[0], f32_pack[1], f32_pack[5]
    if not greedy_only:
        presence, frequency, repetition = (f32_pack[2], f32_pack[3],
                                           f32_pack[4])
    iota_b = jnp.arange(b)
    hidden_dim = arch.hidden_size
    dtype = model.dtype

    def body(carry, xs):
        caches, tokens, counts = carry
        xs_plan, mask = (xs, None) if mask_pack is None else xs
        stepctr = xs_plan[7]

        h_buf = jnp.zeros((g, hidden_dim), dtype)
        out_h = jnp.zeros((b, hidden_dim), dtype)

        embed_fn = getattr(model, "pp_embed_decode", None)

        def tick(carry2, t):
            h_buf, caches, out_h = carry2
            m = t - stage
            valid = (m >= 0) & (m < pp)
            toks_mb = _mb_slice(tokens, m, g, pp)
            # Out-of-wave ticks write their states to the trash slot.
            slots_mb = jnp.where(valid, _mb_slice(slots, m, g, pp),
                                 trash_slot)
            # Embed hook: BART folds decoder position + embed-LN in
            # (models/bart.py pp_embed_decode); mamba/jamba use the
            # plain table lookup.
            emb = (embed_fn(params, toks_mb, slots_mb, caches)
                   if embed_fn is not None
                   else model.embed(params, toks_mb)).astype(dtype)
            h_in = jnp.where((stage == 0) & valid, emb, h_buf)
            h_out, caches = model.forward_decode_layers(
                params, h_in, slots_mb, caches)
            h_out = h_out.astype(dtype)

            h_next = jax.lax.ppermute(
                h_out, "pipe", [(i, i + 1) for i in range(pp - 1)])
            m_out = t - (pp - 1)
            upd = jax.lax.dynamic_update_slice_in_dim(
                out_h, h_out, jnp.clip(m_out, 0, pp - 1) * g, axis=0)
            out_h = jnp.where(
                (stage == pp - 1) & (m_out >= 0) & (m_out < pp), upd,
                out_h)
            return (h_next, caches, out_h), None

        (h_buf, caches, out_h), _ = jax.lax.scan(
            tick, (h_buf, caches, out_h), jnp.arange(2 * pp - 1))

        fin = getattr(model, "pp_final_hidden", None)
        if fin is not None:
            h_final = fin(params, out_h)
        else:
            from ..models.mamba import _rms
            h_final = _rms(out_h, params["final_norm"],
                           arch.layer_norm_eps)
        logits = model.logits(params, h_final)
        if not greedy_only:
            from ..ops.sampling import apply_penalties
            logits = apply_penalties(logits, counts, presence, frequency,
                                     repetition)
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
        toks = _masked_psum(toks, stage == pp - 1, "pipe")
        if counts is not None:
            counts = counts.at[iota_b, toks].add(1)
        ys = jnp.stack([toks, jnp.full_like(toks, -1)])   # no victims
        if logprobs_l > 0:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            tv, ti = jax.lax.top_k(lp, logprobs_l)
            chosen = lp[iota_b, toks]
            lp_row = jnp.concatenate(
                [tv, ti.astype(jnp.float32), chosen[:, None]], axis=1)
            lp_row = _masked_psum(lp_row, stage == pp - 1, "pipe")
            ys = (ys, lp_row)
        return (caches, toks, counts), ys

    init = (_reset_trash_counters(caches, trash_slot), tok0, token_counts)
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


def pp_prefill_wave_mamba(runner, params, caches, h0, q_len, slot,
                          extra=None):
    """Single-microbatch prefill wave for a state-model trunk: stage s is
    the wave front at tick s; inactive stages run the same math with
    their state writes steered to the trash slot.  ``extra`` carries
    replicated per-request kwargs into forward_prefill_layers (Mllama's
    host-encoded vision states).  Returns (hidden after all layers on
    the LAST stage, caches)."""
    pp = runner.pp
    stage = jax.lax.axis_index("pipe")
    trash = runner.cache_engine.trash_page
    caches = _reset_trash_counters(caches, trash)
    pre = getattr(runner.model, "pp_prefill_precompute", None)
    if pre is not None:
        # BART: one replicated encoder pass before the wave; the wave
        # rows then carry encoder OUTPUT (identical on every stage).
        h0 = pre(params, h0, q_len)
    h_buf = h0   # meaningful on stage 0 only

    def tick(carry, t):
        h_buf, caches = carry
        active = t == stage
        s_eff = jnp.where(active, slot, trash)
        h_out, caches = runner.model.forward_prefill_layers(
            params, h_buf, q_len, s_eff, caches, **(extra or {}))
        h_out = h_out.astype(h_buf.dtype)
        keep = jnp.where(active, h_out, h_buf)
        h_next = jax.lax.ppermute(
            keep, "pipe", [(i, i + 1) for i in range(pp - 1)])
        h_buf = jnp.where((stage == pp - 1) & (t == pp - 1), keep, h_next)
        return (h_buf, caches), None

    (h_buf, caches), _ = jax.lax.scan(tick, (h_buf, caches),
                                      jnp.arange(pp))
    return h_buf, caches


def pp_prefill_wave(runner, params, caches, h0, positions, attn_fn_factory,
                    lora_idx=None):
    """Run one prompt through the staged layers: a single-microbatch wave.
    ``attn_fn_factory(active)`` builds the per-layer attention callback
    with cache writes steered to the trash page when this stage is not the
    wave front.  Returns (hidden-after-all-layers on the LAST stage,
    caches)."""
    pp = runner.pp
    stage = jax.lax.axis_index("pipe")
    h_buf = h0  # meaningful on stage 0 only
    lk = (runner._lora_kwargs(params, lora_idx)
          if runner.lora_enabled and lora_idx is not None else {})

    def tick(carry, t):
        h_buf, caches = carry
        active = t == stage
        attn_fn = attn_fn_factory(active)
        h_out, caches = runner.model.forward_layers(
            params, h_buf, positions, attn_fn, caches, state_mode="carry",
            **lk)
        h_out = h_out.astype(h_buf.dtype)
        keep = jnp.where(active, h_out, h_buf)
        h_next = jax.lax.ppermute(
            keep, "pipe", [(i, i + 1) for i in range(pp - 1)])
        # Every stage adopts what arrives from its predecessor, except the
        # last stage on the FINAL tick, which retains its own output so
        # the caller can read the fully-processed hidden state.
        h_buf = jnp.where((stage == pp - 1) & (t == pp - 1), keep, h_next)
        return (h_buf, caches), None

    (h_buf, caches), _ = jax.lax.scan(tick, (h_buf, caches),
                                      jnp.arange(pp))
    return h_buf, caches
