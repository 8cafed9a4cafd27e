"""KV-cache pool allocation and sizing.

TPU-native analog of the reference CacheEngine (vllm/worker/cache_engine.py:15)
plus the memory-profiling pool sizing of Worker.determine_num_available_blocks
(vllm/worker/worker.py:186).  Differences:

- Sizing is analytic, not profiled: on TPU the weights are materialized
  arrays of known byte size and activation peaks are bounded by the largest
  prefill bucket, so ``HBM * utilization - weights - activation headroom``
  is deterministic.  (The reference must run a dummy forward because torch
  caching allocators make free memory observable only empirically.)
- One extra *trash page* is appended to the pool; padded lanes of scatter
  writes are steered there instead of branching, keeping every cache write a
  fixed-shape op.
- A per-page value-L2 score array rides alongside the pool — the device-side
  state behind decode-time victim selection (replaces the reference's
  host-side BlockL2NormManager, vllm/attention/block_l2norm_manager.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import envs
from ..config import CacheConfig, ModelConfig
from ..utils import init_logger

logger = init_logger(__name__)

# Known per-chip HBM for TPU generations (GiB).  Overridable via
# VPC_HBM_GIB for unlisted platforms.
_HBM_GIB = {
    "TPU v4": 32, "TPU v5 lite": 16, "TPU v5e": 16, "TPU v5": 16,
    "TPU v5p": 95, "TPU v6 lite": 32, "TPU v6e": 32,
}


def device_hbm_bytes() -> int:
    env = envs.VPC_HBM_GIB
    if env:
        return int(env * (1 << 30))
    dev = jax.devices()[0]
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    for k, v in _HBM_GIB.items():
        if dev.device_kind.startswith(k):
            return v << 30
    # CPU simulation: pretend 16 GiB so sizing math is exercised.
    return 16 << 30


def max_pages_per_seq(cache_config: CacheConfig, max_model_len: int) -> int:
    """Widest block table any sequence can reach.  Page-freeing eviction
    bounds it by the cache budget; otherwise by max_model_len."""
    bs = cache_config.block_size
    ev = cache_config.paged_evict
    if ev is not None and ev.enabled and ev.frees_pages:
        from ..config import resolve_evict_budget
        return resolve_evict_budget(ev, 0, bs,
                                    max_model_len=max_model_len) // bs + 2
    return -(-max_model_len // bs)


class CacheEngine:
    def __init__(self, config, model, kv_dtype=jnp.bfloat16,
                 num_shards: int = 1, weight_bytes=None):
        cache_config = config.cache
        self.config = cache_config
        self.block_size = cache_config.block_size
        self.kv_dtype = kv_dtype
        self.num_layers = model.arch.num_layers
        self.num_kv_heads = model.arch.num_kv_heads
        self.head_dim = model.arch.head_dim
        self.quantized_kv = jnp.dtype(kv_dtype).itemsize == 1
        # State-space models (Mamba): constant-size per-sequence state
        # pools instead of paged KV — one "page" per sequence, whose pool
        # index doubles as the state slot (reference MambaCacheManager,
        # vllm/model_executor/models/mamba_cache.py).
        self.is_state_model = getattr(model, "architecture", "") == "mamba"
        if self.is_state_model:
            self.model = model
            self.num_pages = cache_config.num_device_blocks \
                or config.scheduler.max_num_seqs
            self.max_model_len = config.scheduler.max_model_len
            try:
                # Hybrid state models (Jamba) size per-slot KV rows by the
                # serving length.
                self.page_bytes = model.state_bytes_per_seq(
                    jnp.float32, max_len=self.max_model_len)
            except TypeError:
                self.page_bytes = model.state_bytes_per_seq(jnp.float32)
            return
        scale_bytes = (2 * self.block_size * self.num_kv_heads
                       if self.quantized_kv else 0)
        page_bytes = (2 * self.num_layers
                      * (self.block_size * self.num_kv_heads * self.head_dim
                         * jnp.dtype(kv_dtype).itemsize + scale_bytes))
        if cache_config.num_device_blocks is not None:
            self.num_pages = cache_config.num_device_blocks
        else:
            total = device_hbm_bytes()
            weights = (weight_bytes if weight_bytes is not None
                       else model.param_bytes()) // max(num_shards, 1)
            headroom = envs.VPC_ACTIVATION_HEADROOM_MB << 20
            budget = int(total * cache_config.gpu_memory_utilization) \
                - weights - headroom
            # The multi-step decode scan double-buffers the cache carry, so
            # the analytic budget is halved; additionally the pool never
            # needs to exceed what the scheduler can address (all seqs at
            # their widest tables — tiny under eviction budgets).
            addressable = config.scheduler.max_num_seqs * max_pages_per_seq(
                cache_config, config.scheduler.max_model_len) + 8
            # Reserve the scheduler's admission watermark ON TOP of the
            # addressable cap: a budget-bounded pool (budget pages + small
            # margin) otherwise deadlocks admission once 1% of the pool
            # exceeds the margin — at a 64k-token budget the watermark is
            # 41 pages against a 10-page margin, so a prompt that prunes to
            # exactly the budget waits forever (the 128k BASELINE-config-#5
            # rows hit this; reference analog returns AllocStatus.NEVER
            # and aborts, vllm/core/block_manager.py — here the pool is
            # deliberately budget-sized, so growing it is the right fix).
            wm = config.scheduler.watermark
            addressable += max(1, int(wm * addressable)) + 2
            self.num_pages = max(min(budget // (2 * page_bytes),
                                     addressable), 16)
            logger.info(
                "KV pool sizing: hbm=%.2f GiB weights=%.2f GiB "
                "addressable=%d -> %d pages of %d tokens (%.2f GiB)",
                total / (1 << 30), weights / (1 << 30), addressable,
                self.num_pages, self.block_size,
                self.num_pages * page_bytes / (1 << 30))
        self.page_bytes = page_bytes

    @property
    def trash_page(self) -> int:
        """Index of the reserved scratch page (pool index num_pages)."""
        return self.num_pages

    @property
    def trash_slot(self) -> int:
        return self.num_pages * self.block_size

    def allocate(self):
        """Create the stacked (k, v) cache arrays + the page score array.

        Layout [num_layers, num_pages+1, page_size, Hkv, head_dim]: a
        leading layer axis (consumed by the model's scan-over-layers) and
        page-major within a layer so one page is a contiguous
        [page_size, Hkv*d] tile — the DMA unit of the Pallas paged-attention
        kernel (cf. reference layout vllm/attention/ops/paged_attn.py:40-62,
        re-chosen for TPU tiling).
        """
        if self.is_state_model:
            if hasattr(self.model, "make_state_pools"):
                # Hybrid state models (Jamba) own their pool layout.
                pools = self.model.make_state_pools(self.num_pages + 1,
                                                    self.max_model_len)
                return pools, jnp.zeros((self.num_pages + 1,), jnp.float32)
            a = self.model.arch
            conv = jnp.zeros((self.num_layers, self.num_pages + 1,
                              a.d_inner, a.d_conv - 1), jnp.float32)
            ssm = jnp.zeros((self.num_layers, self.num_pages + 1,
                             a.d_inner, a.d_state), jnp.float32)
            return (conv, ssm), jnp.zeros((self.num_pages + 1,),
                                          jnp.float32)
        shape = (self.num_layers, self.num_pages + 1, self.block_size,
                 self.num_kv_heads, self.head_dim)
        if self.quantized_kv:
            from ..ops.quant import QuantKV
            sshape = shape[:-1]

            def pool():
                # Scales in bf16: strip gathers/DMAs ride the decode
                # critical path per layer and bf16 halves their traffic;
                # the ±0.4% scale error is noise under 8-bit values.
                return QuantKV(q=jnp.zeros(shape, self.kv_dtype),
                               s=jnp.zeros(sshape, jnp.bfloat16))

            caches = (pool(), pool())
        else:
            caches = (jnp.zeros(shape, self.kv_dtype),
                      jnp.zeros(shape, self.kv_dtype))
        page_scores = jnp.zeros((self.num_pages + 1,), jnp.float32)
        return caches, page_scores
