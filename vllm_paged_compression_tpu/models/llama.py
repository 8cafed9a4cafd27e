"""Llama-family decoder in functional JAX.

TPU-native re-design of the reference Llama implementation
(vllm/model_executor/models/llama.py:98,210,288,469).  Key differences:

- Pure functions over a params pytree — no module state; the whole model is
  one traced graph under jit, letting XLA fuse norms/rope/elementwise into
  the projection matmuls.
- QKV and gate/up projections are pre-fused at load time (the megatron
  QKVParallelLinear / MergedColumnParallelLinear pattern,
  vllm/model_executor/layers/linear.py:391,635, realized as plain weight
  concatenation + one matmul).
- Attention is injected as a callback ``attn_fn(q, k, v, layer_state) ->
  (out, new_layer_state)`` so the same model code serves prefill, paged
  decode, and eviction variants; the runner owns cache semantics (the
  reference routes this through the Attention layer + backend registry,
  vllm/attention/layer.py:130-168).
- Projections go through ops.quant.matmul, so per-channel int8 weights
  (reference tpu_int8 scheme) drop in without touching model code.
- Per-layer weights are stacked along a leading layer axis: one pytree leaf
  per parameter kind keeps compile time flat and makes TP sharding specs
  uniform.

Weight layout convention: all projection matrices are stored transposed for
right-multiplication (``y = x @ W``), i.e. ``[in_features, out_features]``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import QuantizedWeight, matmul


def _split_int4_stack(stack):
    """Separate layer-stacked packed-int4 leaves from everything else.
    Packed weights must NOT ride through lax.scan's per-iteration slicing:
    a dynamic-slice feeding a Pallas custom call materializes a full copy
    of the layer's weights each step.  They are closed over instead and
    indexed in-kernel via scalar prefetch (StackedInt4View) — the kernel
    reads the stack in place at ~413 GB/s effective (v5e, 8B shapes)."""
    from ..ops.pallas.int4_matmul import PackedInt4, QuantizedWeight4
    big = {k: v for k, v in stack.items()
           if isinstance(v, (QuantizedWeight4, PackedInt4))}
    if not big:
        return stack, None
    return {k: v for k, v in stack.items() if k not in big}, big


def _merge_int4_views(lp_small, big, local_li):
    if not big:
        return lp_small
    from ..ops.pallas.int4_matmul import StackedInt4View
    lp = dict(lp_small)
    for k, v in big.items():
        lp[k] = StackedInt4View(v, local_li)
    return lp
from ..ops.rope import apply_rope, rope_cos_sin


@dataclass
class LlamaArch:
    """Architecture hyperparameters (superset of HF LlamaConfig).

    The variant flags fold the whole Llama-family tree the reference's model
    zoo spells out as separate files (vllm/model_executor/models/llama.py,
    qwen2.py, gemma.py, gemma2.py, phi3.py, mistral→llama.py) into one scan
    body with compile-time branches — all flags are static under jit."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192
    # --- variant flags ---
    qkv_bias: bool = False            # Qwen2: q/k/v projections carry bias
    qk_norm: bool = False             # Qwen3: per-head RMSNorm on q/k
    qk_norm_type: str = "rms"         # "layernorm": per-head LayerNorm
    #                                   with bias (Persimmon qk_layernorm)
    hidden_act: str = "silu"          # gemma: "gelu_tanh"
    norm_unit_offset: bool = False    # gemma RMSNorm scales by (1 + w)
    embed_scale: Optional[float] = None   # gemma: sqrt(hidden_size)
    sandwich_norms: bool = False      # gemma2: post-attn/post-ffw out norms
    sliding_window: Optional[int] = None  # window of the sliding layers;
    #                                   masked exactly by the runner when
    #                                   window < max_model_len (jnp
    #                                   backend; rejected with eviction,
    #                                   matching torch_cuda_sdpa.py:567)
    sliding_window_pattern: int = 0   # 0: ALL layers sliding (Mistral);
    #                                   p > 0: every p-th layer is global
    #                                   (Gemma2 p=2, Cohere2 p=4)
    attn_logit_softcap: Optional[float] = None   # gemma2
    final_logit_softcap: Optional[float] = None  # gemma2
    query_pre_attn_scalar: Optional[float] = None  # gemma2 attn scale base
    num_experts: int = 0              # mixtral: >0 switches the MLP to MoE
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None  # expert width (qwen-moe)
    moe_routing: str = "topk_softmax"  # mixtral: topk then softmax;
    #                                    "softmax_topk": softmax over all
    #                                    logits then topk (qwen/deepseek);
    #                                    "sparsemixer": PhiMoE top-2
    moe_jitter_eps: float = 0.01       # sparsemixer router_jitter_noise
    moe_norm_topk: bool = False       # renormalize the selected weights
    moe_shared_intermediate: int = 0  # qwen-moe: dense shared expert width
    moe_shared_gate: bool = False     # qwen-moe: sigmoid gate on shared out
    moe_hf_style: str = "mixtral"     # checkpoint naming scheme
    moe_layer_frequency: int = 1      # arctic: 2 = alternating dense/MoE
    #                                   (layer i is MoE iff (i+1) % freq
    #                                   == 0; scan runs dense+MoE PAIRS)
    moe_parallel_residual: bool = False  # arctic use_residual: a dense
    #                                   hidden-width MLP branch beside the
    #                                   MoE; MoE reads the normed LAYER
    #                                   INPUT (arctic.py:350-359)

    @property
    def moe_inter(self) -> int:
        return self.moe_intermediate_size or self.intermediate_size
    # --- decoder-shape axes beyond the Llama default (fold the GPT-NeoX /
    # GPT-J / Falcon / StarCoder2 / StableLM / Phi / Cohere branches of the
    # reference model zoo, vllm/model_executor/models/, into one trunk) ---
    norm_type: str = "rmsnorm"        # "layernorm": mean-centering norm
    norm_bias: bool = False           # LayerNorm bias (Cohere: layernorm
    #                                   without bias)
    parallel_residual: bool = False   # h + attn(ln1 h) + mlp(ln2 h)
    shared_input_norm: bool = False   # parallel residual with ONE norm
    #                                   (GPT-J, Falcon-7B, Phi, Cohere)
    mlp_gated: bool = True            # False: up -> act -> down (no gate)
    mlp_bias: bool = False            # biases on the MLP projections
    mlp_down_bias: bool = False       # bias on down_proj ONLY (TeleChat2)
    o_bias: bool = False              # bias on the attention out projection
    lm_head_bias: bool = False        # GPT-J ships an lm_head bias
    partial_rotary_factor: float = 1.0  # rope on the first rot_dim dims only
    rope_interleaved: bool = False    # GPT-J rotate-every-two convention
    logit_scale: Optional[float] = None  # Cohere scales logits
    residual_multiplier: float = 1.0  # Granite/MiniCPM μ-param: sublayer
    #                                   outputs scaled before residual add
    qkv_clip: Optional[float] = None  # OLMo/DBRX clamp on qkv activations
    postnorm: bool = False            # OLMo2: norms act on sublayer OUTPUT
    #                                   (input_norm slot = post-attn norm,
    #                                   post_norm slot = post-mlp norm)
    qk_norm_flat: bool = False        # OLMo2: q/k RMSNorm over the FULL
    #                                   H*d projection (vs per-head)
    # --- position schemes beyond rope (Bloom/MPT/JAIS/GPT-BigCode) ---
    use_rope: bool = True             # False: no rotary embedding
    no_rope_pattern: int = 0          # p > 0: layers with (i+1) % p == 0
    #                                   skip rope (Cohere2 global layers,
    #                                   commandr.py:223 `v1 or
    #                                   sliding_window`)
    mrope_section: Optional[list] = None  # Qwen2-VL M-RoPE: per-stream
    #                                   frequency-dim widths (t/h/w);
    #                                   positions may arrive as [3, T]
    # --- Phi-3-small (phi3_small.py) ---
    gegelu_limit: Optional[float] = None  # gegelu clamp (activation
    #                                   splits the fused up_proj into
    #                                   (gelu, linear+1) halves)
    attn_scale_override: Optional[float] = None  # mup attention scale
    suppress_tokens: Optional[tuple] = None  # dummy_token_indices: vocab
    #                                   ids forced to -inf at the logits
    bs_block: int = 0                 # blocksparse attention block (0=off)
    bs_local_blocks: int = 16
    bs_vert_stride: int = 8
    bs_homo: bool = False
    bs_dense_every_n: Optional[int] = None  # layer (i+1) % n == 0 -> dense
    alibi: bool = False               # additive per-head linear key bias
    alibi_variant: str = "bloom"      # | "mpt" (ceil-pow2, bias_max-scaled)
    alibi_bias_max: float = 8.0       # MPT attn_config.alibi_bias_max
    pos_embed_learned: bool = False   # learned absolute position table
    pos_offset: int = 0               # OPT-style table offset
    embed_ln: bool = False            # Bloom word_embeddings_layernorm
    # --- MLA (DeepSeek V2/V3 multi-head latent attention) ---
    attn_type: str = "mha"            # "mla": latent kv + decoupled rope
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: Optional[int] = None  # < head_dim: v padded in the cache
    # --- pooling-task heads (reference qwen2_cls.py / qwen2_rm.py):
    # a decoder trunk served as a classifier / reward model instead of a
    # generator.  "cls": score.weight [num_labels, D], last-token pooled.
    # "reward": score.{0,2} two-layer ReLU MLP -> per-token values (ALL
    # pooling).  These checkpoints ship no lm_head.
    head_type: str = "none"           # | "cls" | "reward"
    num_labels: int = 0
    # --- DeepSeek-MoE extensions ---
    first_k_dense: int = 0            # dense layers before the MoE stack
    moe_topk_method: str = "greedy"   # | "group_limited_greedy"
    moe_n_group: int = 1
    moe_topk_group: int = 1
    moe_routed_scaling: float = 1.0
    moe_shared_plural: bool = False   # "shared_experts." checkpoint name

    @property
    def rot_dim(self) -> int:
        d = int(round(self.head_dim * self.partial_rotary_factor))
        return d - d % 2

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "LlamaArch":
        num_heads = cfg["num_attention_heads"]
        # Mistral/Phi-3/StarCoder2-style sliding window; Qwen2 carries the
        # key but gates it with use_sliding_window (default off, matching
        # HF Qwen2Attention).
        sw = cfg.get("sliding_window")
        if cfg.get("use_sliding_window") is False:
            sw = None
        return cls(
            sliding_window=sw,
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=cfg.get("num_key_value_heads", num_heads),
            head_dim=cfg.get("head_dim") or
            cfg["hidden_size"] // num_heads,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        )

    @property
    def attn_scale(self) -> float:
        if self.attn_scale_override is not None:
            return self.attn_scale_override
        base = (self.query_pre_attn_scalar
                if self.query_pre_attn_scalar is not None else self.head_dim)
        return base ** -0.5

    def canonicalize_hf(self, tensors: dict) -> dict:
        """Rename/unpack a family's HF state dict into canonical Llama
        names (identity for Llama-named checkpoints); see subclasses."""
        return tensors


@dataclass
class Qwen2Arch(LlamaArch):
    """Qwen2/2.5 (reference vllm/model_executor/models/qwen2.py): Llama
    with biases on the fused QKV projection."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen2Arch":
        a = super().from_hf_config(cfg)
        a.qkv_bias = True
        return a


@dataclass
class Qwen3Arch(LlamaArch):
    """Qwen3 (reference vllm/model_executor/models/qwen3.py): Llama with
    per-head RMSNorm applied to q and k before rope (no qkv bias)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen3Arch":
        a = super().from_hf_config(cfg)
        a.qk_norm = True
        return a


@dataclass
class GemmaArch(LlamaArch):
    """Gemma (reference vllm/model_executor/models/gemma.py): tied
    embeddings scaled by sqrt(hidden), tanh-GELU MLP, (1+w) RMSNorm."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GemmaArch":
        a = super().from_hf_config(cfg)
        a.hidden_act = "gelu_tanh"
        a.norm_unit_offset = True
        a.embed_scale = float(cfg["hidden_size"]) ** 0.5
        a.tie_word_embeddings = True
        return a


@dataclass
class Gemma2Arch(GemmaArch):
    """Gemma2 (reference vllm/model_executor/models/gemma2.py): Gemma plus
    sandwich norms, attn/final logit soft-capping, a query scale from
    query_pre_attn_scalar, and sliding-window attention on every EVEN
    layer (HF Gemma2Attention: sliding iff layer_idx % 2 == 0 — i.e.
    every 2nd layer starting at 0 is sliding, odd layers global)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Gemma2Arch":
        a = super().from_hf_config(cfg)
        a.sandwich_norms = True
        a.sliding_window = cfg.get("sliding_window", 4096)
        a.sliding_window_pattern = 2
        a.attn_logit_softcap = cfg.get("attn_logit_softcapping", 50.0)
        a.final_logit_softcap = cfg.get("final_logit_softcapping", 30.0)
        a.query_pre_attn_scalar = cfg.get("query_pre_attn_scalar")
        return a


@dataclass
class MixtralArch(LlamaArch):
    """Mixtral sparse-MoE (reference vllm/model_executor/models/mixtral.py):
    Llama attention + a top-k routed expert MLP.  Round-1 dispatch computes
    all experts densely and combines by routing weight — exact, MXU-batched
    over the expert axis (a capacity-based sorted dispatch is the round-2
    optimization; the reference's fused_moe CUDA kernels have no TPU
    analog needed for correctness)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MixtralArch":
        a = super().from_hf_config(cfg)
        a.num_experts = cfg.get("num_local_experts", 8)
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 2)
        return a


@dataclass
class Phi3Arch(LlamaArch):
    """Phi-3 (reference vllm/model_executor/models/phi3.py → llama.py):
    Llama layout with HF-side pre-fused qkv_proj / gate_up_proj weights
    (handled by the loader)."""


@dataclass
class Qwen2MoeArch(LlamaArch):
    """Qwen1.5/2-MoE (reference vllm/model_executor/models/qwen2_moe.py):
    Qwen2 attention + softmax-then-topk routed experts PLUS a dense shared
    expert whose output is sigmoid-gated by its own router logit."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen2MoeArch":
        if cfg.get("decoder_sparse_step", 1) != 1 \
                or cfg.get("mlp_only_layers"):
            raise NotImplementedError(
                "heterogeneous dense/sparse layer stacks (scan-over-layers "
                "requires uniform layers)")
        a = super().from_hf_config(cfg)
        a.qkv_bias = True
        a.num_experts = cfg["num_experts"]
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 4)
        a.moe_intermediate_size = cfg["moe_intermediate_size"]
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = cfg.get("norm_topk_prob", False)
        a.moe_shared_intermediate = cfg.get(
            "shared_expert_intermediate_size", 0)
        a.moe_shared_gate = True
        a.moe_hf_style = "qwen"
        return a


@dataclass
class Qwen3MoeArch(LlamaArch):
    """Qwen3-MoE (reference vllm/model_executor/models/qwen3_moe.py):
    Qwen3 attention (per-head q/k RMSNorm) + softmax-then-topk routed
    experts with renormalized weights; no shared expert."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Qwen3MoeArch":
        if cfg.get("decoder_sparse_step", 1) != 1 \
                or cfg.get("mlp_only_layers"):
            raise NotImplementedError(
                "heterogeneous dense/sparse layer stacks (scan-over-layers "
                "requires uniform layers)")
        a = super().from_hf_config(cfg)
        a.qk_norm = True
        a.num_experts = cfg["num_experts"]
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 8)
        a.moe_intermediate_size = cfg["moe_intermediate_size"]
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = cfg.get("norm_topk_prob", True)
        a.moe_hf_style = "qwen"
        return a


def _rename(tensors: dict, table: list[tuple[str, str]]) -> dict:
    out = {}
    for k, v in tensors.items():
        for old, new in table:
            k = k.replace(old, new)
        out[k] = v
    return out


@dataclass
class Starcoder2Arch(LlamaArch):
    """StarCoder2 (reference vllm/model_executor/models/starcoder2.py):
    Llama attention + biased non-gated GELU MLP and biased LayerNorms."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Starcoder2Arch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.mlp_gated = False
        use_bias = cfg.get("use_bias", True)
        a.qkv_bias = use_bias
        a.o_bias = use_bias
        a.mlp_bias = use_bias
        a.hidden_act = "gelu_tanh"     # HF "gelu_pytorch_tanh"
        a.rms_norm_eps = cfg.get("norm_epsilon", 1e-5)
        a.tie_word_embeddings = cfg.get("tie_word_embeddings", True)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        return _rename(tensors, [("mlp.c_fc.", "mlp.up_proj."),
                                 ("mlp.c_proj.", "mlp.down_proj.")])


@dataclass
class StableLmArch(LlamaArch):
    """StableLM-2 (reference vllm/model_executor/models/stablelm.py):
    Llama with partial rotary and biased LayerNorms."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "StableLmArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        # StableLM-2 spells these partial_rotary_factor / layer_norm_eps /
        # use_qkv_bias; the older StableLMEpoch checkpoints (reference maps
        # StableLMEpochForCausalLM to the same impl, stablelm.py) say
        # rope_pct / norm_eps and have no qkv bias.
        a.partial_rotary_factor = cfg.get(
            "partial_rotary_factor", cfg.get("rope_pct", 0.25))
        a.qkv_bias = cfg.get("use_qkv_bias", False)
        a.rms_norm_eps = cfg.get("layer_norm_eps",
                                 cfg.get("norm_eps", 1e-5))
        return a


@dataclass
class InternLMArch(LlamaArch):
    """InternLM v1 (reference vllm/model_executor/models/internlm.py →
    llama trunk): Llama with biases on q/k/v/o controlled by config
    ``bias`` (default true)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "InternLMArch":
        a = super().from_hf_config(cfg)
        a.qkv_bias = cfg.get("bias", True)
        a.o_bias = cfg.get("bias", True)
        return a


@dataclass
class QwenV1Arch(LlamaArch):
    """Qwen v1 (reference vllm/model_executor/models/qwen.py): RMSNorm +
    rotary Llama-shaped trunk with a fused biased ``c_attn`` projection;
    the MLP's gate is ``w2`` and up is ``w1`` (SiluAndMul over [w2|w1]),
    each half of the config's ``intermediate_size``."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "QwenV1Arch":
        num_heads = cfg["num_attention_heads"]
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"] // 2,
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=num_heads,
            head_dim=cfg.get("kv_channels")
            or cfg["hidden_size"] // num_heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            rope_theta=cfg.get("rotary_emb_base", 10000.0),
            tie_word_embeddings=False,
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            cfg.get("seq_length", 8192)),
        )
        a.qkv_bias = True     # c_attn keeps its bias even under no_bias
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.ln_f.weight", "model.norm.weight")
            if k.startswith("transformer.h."):
                k = k.replace("transformer.h.", "model.layers.")
                k = k.replace(".ln_1.", ".input_layernorm.")
                k = k.replace(".ln_2.", ".post_attention_layernorm.")
                k = k.replace(".attn.c_proj.", ".self_attn.o_proj.")
                k = k.replace(".mlp.w2.", ".mlp.gate_proj.")
                k = k.replace(".mlp.w1.", ".mlp.up_proj.")
                k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
                if ".attn.c_attn." in k:
                    v = np.asarray(v)
                    third = v.shape[0] // 3
                    for j, name in enumerate(("q", "k", "v")):
                        out[k.replace(".attn.c_attn.",
                                      f".self_attn.{name}_proj.")] = \
                            v[j * third:(j + 1) * third]
                    continue
            out[k] = v
        return out


@dataclass
class OlmoeArch(LlamaArch):
    """OLMoE (reference vllm/model_executor/models/olmoe.py): Llama
    attention with full-projection q/k RMSNorm (OLMo2-style, pre-reshape)
    and a softmax-then-topk routed MoE; optional qkv clamp."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "OlmoeArch":
        a = super().from_hf_config(cfg)
        a.qk_norm_flat = True
        a.qkv_clip = cfg.get("clip_qkv")
        a.num_experts = cfg["num_experts"]
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 8)
        a.moe_intermediate_size = cfg["intermediate_size"]
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = cfg.get("norm_topk_prob", False)
        a.moe_hf_style = "qwen"
        return a


@dataclass
class Phi3SmallArch(LlamaArch):
    """Phi-3-small (reference vllm/model_executor/models/phi3_small.py):
    biased LayerNorms, head-major fused QKV with bias, gegelu MLP with a
    clamp, μP scaling (embedding multiplier, attention norm factor, logit
    width division), tiktoken dummy-token suppression, and BLOCKSPARSE
    attention (local blocks + per-head vertical strides, dense every n-th
    layer) — the mask is applied exactly in the jnp attention oracles."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Phi3SmallArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.rms_norm_eps = cfg.get("layer_norm_epsilon", 1e-5)
        a.qkv_bias = a.o_bias = a.mlp_bias = True
        a.hidden_act = "gegelu"
        a.gegelu_limit = cfg.get("gegelu_limit")
        a.rope_theta = cfg.get("rope_embedding_base",
                               cfg.get("rope_theta", 10000.0))
        scale = cfg.get("rope_position_scale", 1.0)
        if cfg.get("rope_scaling") is None and scale != 1.0:
            a.rope_scaling = {"rope_type": "linear", "factor": scale}
        a.tie_word_embeddings = True
        if cfg.get("mup_use_scaling", True):
            a.attn_scale_override = (cfg.get("mup_attn_multiplier", 1.0)
                                     / a.head_dim)
            a.logit_scale = 1.0 / cfg.get("mup_width_multiplier", 1.0)
            if cfg.get("mup_embedding_multiplier"):
                a.embed_scale = float(cfg["mup_embedding_multiplier"])
        if cfg.get("dummy_token_indices"):
            a.suppress_tokens = tuple(cfg["dummy_token_indices"])
        a.bs_block = cfg.get("blocksparse_block_size", 64)
        a.bs_local_blocks = cfg.get("blocksparse_num_local_blocks", 16)
        a.bs_vert_stride = cfg.get("blocksparse_vert_stride", 8)
        a.bs_homo = cfg.get("blocksparse_homo_head_pattern", False)
        a.bs_dense_every_n = cfg.get("dense_attention_every_n_layers")
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        g = self.num_heads // self.num_kv_heads
        hd = self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("model.final_layernorm.", "model.norm.")
            k = k.replace(".self_attn.dense.", ".self_attn.o_proj.")
            if ".self_attn.query_key_value." in k:
                # Head-major fused qkv: per kv head [q_0..q_{g-1}, k, v]
                # (phi3_small.py HeadMajorQKVParallelLinear layout).
                v = np.asarray(v)
                parts = v.reshape(self.num_kv_heads, g + 2, hd,
                                  *v.shape[1:])
                names = {"q": parts[:, :g].reshape(
                    self.num_kv_heads * g * hd, *v.shape[1:]),
                    "k": parts[:, g].reshape(self.num_kv_heads * hd,
                                             *v.shape[1:]),
                    "v": parts[:, g + 1].reshape(self.num_kv_heads * hd,
                                                 *v.shape[1:])}
                for nm, val in names.items():
                    out[k.replace(".self_attn.query_key_value.",
                                  f".self_attn.{nm}_proj.")] = val
                continue
            if ".mlp.up_proj." in k:
                # gegelu halves interleave along the output axis
                # (a_gelu = even, a_linear = odd); de-interleave into the
                # canonical gate|up layout.
                v = np.asarray(v)
                out[k.replace(".mlp.up_proj.", ".mlp.gate_proj.")] = \
                    v[0::2]
                out[k] = v[1::2]
                continue
            out[k] = v
        return out


@dataclass
class ArcticArch(LlamaArch):
    """Snowflake Arctic (reference vllm/model_executor/models/arctic.py):
    dense-MoE hybrid — layers alternate dense MLP / 128-expert MoE
    (moe_layer_frequency=2, arctic.py:307), and MoE layers carry a
    parallel hidden-width residual MLP whose sibling MoE branch reads the
    normed layer INPUT (use_residual, arctic.py:350-359).  Routing is
    softmax-then-topk with renormalization (fused_topk, arctic.py:176-179).
    """

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "ArcticArch":
        a = super().from_hf_config(cfg)
        a.num_experts = cfg["num_local_experts"]
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 1)
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = a.num_experts_per_tok > 1
        a.moe_layer_frequency = cfg.get("moe_layer_frequency", 2)
        if a.moe_layer_frequency not in (1, 2):
            raise NotImplementedError("moe_layer_frequency must be 1 or 2")
        a.moe_parallel_residual = cfg.get("use_residual", True)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        # Dense-layer MLPs live under block_sparse_moe.mlp.w1/w3/w2
        # (arctic.py:507-513); rename to the canonical gated-MLP names.
        return _rename(tensors, [
            ("block_sparse_moe.mlp.w1.", "mlp.gate_proj."),
            ("block_sparse_moe.mlp.w3.", "mlp.up_proj."),
            ("block_sparse_moe.mlp.w2.", "mlp.down_proj."),
        ])


@dataclass
class DeepseekV1Arch(LlamaArch):
    """DeepSeek V1 MoE (reference vllm/model_executor/models/deepseek.py):
    plain Llama attention + DeepSeek-MoE — softmax-then-topk routing,
    ungated shared experts ("shared_experts." plural naming), and a dense
    first-k layer prefix."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DeepseekV1Arch":
        a = super().from_hf_config(cfg)
        n_routed = cfg.get("n_routed_experts")
        if n_routed:
            if cfg.get("moe_layer_freq", 1) != 1:
                raise NotImplementedError("moe_layer_freq != 1")
            a.num_experts = n_routed
            a.num_experts_per_tok = cfg.get("num_experts_per_tok", 2)
            a.moe_intermediate_size = cfg["moe_intermediate_size"]
            a.moe_routing = "softmax_topk"
            a.moe_norm_topk = cfg.get("norm_topk_prob", False)
            a.moe_hf_style = "qwen"
            a.first_k_dense = cfg.get("first_k_dense_replace", 0)
            ns = cfg.get("n_shared_experts")
            if ns:
                a.moe_shared_intermediate = \
                    ns * cfg["moe_intermediate_size"]
                a.moe_shared_plural = True
        return a


@dataclass
class BloomArch(LlamaArch):
    """Bloom (reference vllm/model_executor/models/bloom.py): ALiBi
    positions (no rope), biased LayerNorms everywhere incl. a
    word-embedding LayerNorm, per-head-interleaved fused QKV checkpoint,
    non-gated tanh-GELU MLP, tied head."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "BloomArch":
        hidden = cfg.get("hidden_size") or cfg.get("n_embed")
        heads = cfg.get("n_head") or cfg.get("num_attention_heads")
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=4 * hidden,
            num_layers=cfg.get("n_layer") or cfg.get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            2048),
        )
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.mlp_gated = False
        a.hidden_act = "gelu_tanh"     # HF BloomGelu = tanh approximation
        a.qkv_bias = a.o_bias = a.mlp_bias = True
        a.use_rope = False
        a.alibi = True
        a.embed_ln = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        h, d = self.num_heads, self.head_dim
        out = {}
        for k, v in tensors.items():
            if not k.startswith("transformer."):
                out[k] = v
                continue
            k = k[len("transformer."):]
            k = k.replace("word_embeddings_layernorm.", "model.embed_ln.")
            k = k.replace("word_embeddings.weight",
                          "model.embed_tokens.weight")
            k = k.replace("ln_f.", "model.norm.")
            if k.startswith("h."):
                k = "model.layers." + k[2:]
                k = k.replace(".self_attention.dense.",
                              ".self_attn.o_proj.")
                k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
                k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
                if ".self_attention.query_key_value." in k:
                    # Fused layout interleaves (q, k, v) PER HEAD
                    # (HF BloomAttention._reshape views [..., H, 3, d]);
                    # regroup to plain q|k|v.
                    v = np.asarray(v)
                    parts = v.reshape(h, 3, d, *v.shape[1:])
                    for j, name in enumerate(("q", "k", "v")):
                        out[k.replace(
                            ".self_attention.query_key_value.",
                            f".self_attn.{name}_proj.")] = \
                            parts[:, j].reshape(h * d, *v.shape[1:])
                    continue
            out[k] = v
        return out


@dataclass
class MptArch(LlamaArch):
    """MPT (reference vllm/model_executor/models/mpt.py): ALiBi with
    MosaicML's ceil-pow2 slope variant, bias-free LayerNorms (weight
    only), fused Wqkv, non-gated exact-GELU MLP, optional qkv clamp and
    custom softmax scale, tied head."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MptArch":
        attn_cfg = cfg.get("attn_config") or {}
        if hasattr(attn_cfg, "to_dict"):
            attn_cfg = attn_cfg.to_dict()
        if not attn_cfg.get("alibi", True):
            raise NotImplementedError("MPT without ALiBi")
        if attn_cfg.get("qk_ln"):
            raise NotImplementedError("MPT qk_ln")
        hidden = cfg["d_model"]
        heads = cfg["n_heads"]
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=int(cfg.get("expansion_ratio", 4) * hidden),
            num_layers=cfg["n_layers"],
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            max_position_embeddings=cfg.get("max_seq_len", 2048),
        )
        a.norm_type = "layernorm"
        a.norm_bias = False
        a.mlp_gated = False
        a.hidden_act = "gelu"          # HF MptMLP: GELU(approximate=none)
        a.use_rope = False
        a.alibi = True
        a.alibi_variant = "mpt"
        a.alibi_bias_max = attn_cfg.get("alibi_bias_max", 8)
        a.qkv_clip = attn_cfg.get("clip_qkv")
        ss = attn_cfg.get("softmax_scale")
        if ss:
            a.query_pre_attn_scalar = ss ** -2    # attn_scale = base**-0.5
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.norm_f.weight", "model.norm.weight")
            if k.startswith("transformer.blocks."):
                k = "model.layers." + k[len("transformer.blocks."):]
                k = k.replace(".norm_1.", ".input_layernorm.")
                k = k.replace(".norm_2.", ".post_attention_layernorm.")
                k = k.replace(".attn.out_proj.", ".self_attn.o_proj.")
                k = k.replace(".ffn.up_proj.", ".mlp.up_proj.")
                k = k.replace(".ffn.down_proj.", ".mlp.down_proj.")
                if ".attn.Wqkv." in k:
                    v = np.asarray(v)
                    third = v.shape[0] // 3
                    for j, name in enumerate(("q", "k", "v")):
                        out[k.replace(".attn.Wqkv.",
                                      f".self_attn.{name}_proj.")] = \
                            v[j * third:(j + 1) * third]
                    continue
            out[k] = v
        return out


@dataclass
class GPTBigCodeArch(LlamaArch):
    """GPT-BigCode / StarCoder (reference
    vllm/model_executor/models/gpt_bigcode.py): GPT-2-shaped trunk
    (learned positions, biased LayerNorms, tanh-GELU MLP) with
    multi-query attention."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GPTBigCodeArch":
        hidden = cfg.get("n_embd") or cfg.get("hidden_size")
        heads = cfg.get("n_head") or cfg.get("num_attention_heads")
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg.get("n_inner") or 4 * hidden,
            num_layers=cfg.get("n_layer") or cfg.get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=1 if cfg.get("multi_query", True) else heads,
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            max_position_embeddings=cfg.get("n_positions", 1024),
        )
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.mlp_gated = False
        a.hidden_act = "gelu_tanh"     # HF "gelu_pytorch_tanh"
        a.qkv_bias = a.o_bias = a.mlp_bias = True
        a.use_rope = False
        a.pos_embed_learned = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.wpe.weight",
                          "model.embed_pos.weight")
            k = k.replace("transformer.ln_f.", "model.norm.")
            if k.startswith("transformer.h."):
                k = "model.layers." + k[len("transformer.h."):]
                k = k.replace(".ln_1.", ".input_layernorm.")
                k = k.replace(".ln_2.", ".post_attention_layernorm.")
                k = k.replace(".attn.c_proj.", ".self_attn.o_proj.")
                k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
                k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
                if ".attn.c_attn." in k:
                    v = np.asarray(v)
                    if self.num_kv_heads == self.num_heads:
                        # MHA checkpoints interleave (q, k, v) PER HEAD
                        # (HF GPTBigCodeAttention views [.., H, 3, d]).
                        parts = v.reshape(self.num_heads, 3,
                                          self.head_dim, *v.shape[1:])
                        splits = {
                            name: parts[:, j].reshape(q_sz, *v.shape[1:])
                            for j, name in enumerate(("q", "k", "v"))}
                    else:
                        # MQA: plain [q | kv | kv] rows.
                        splits = {"q": v[:q_sz],
                                  "k": v[q_sz:q_sz + kv_sz],
                                  "v": v[q_sz + kv_sz:]}
                    for name, part in splits.items():
                        out[k.replace(".attn.c_attn.",
                                      f".self_attn.{name}_proj.")] = part
                    continue
            out[k] = v
        return out


@dataclass
class JaisArch(LlamaArch):
    """JAIS (reference vllm/model_executor/models/jais.py): GPT-2
    checkpoint layout (Conv1D [in, out] weights) with ALiBi, SwiGLU
    (gate = c_fc2, up = c_fc), muP embedding/logit/attention scales."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "JaisArch":
        if cfg.get("position_embedding_type", "alibi") != "alibi":
            raise NotImplementedError("JAIS without ALiBi")
        hidden = cfg.get("n_embd") or cfg.get("hidden_size")
        heads = cfg.get("n_head") or cfg.get("num_attention_heads")
        swiglu = cfg.get("activation_function", "swiglu") == "swiglu"
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg.get("n_inner") or 4 * hidden,
            num_layers=cfg.get("n_layer") or cfg.get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            max_position_embeddings=cfg.get("n_positions", 2048),
        )
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.mlp_gated = swiglu
        a.hidden_act = "silu" if swiglu else "gelu_tanh"
        a.qkv_bias = a.o_bias = a.mlp_bias = True
        a.use_rope = False
        a.alibi = True
        a.embed_scale = cfg.get("embeddings_scale",
                                cfg.get("mup_embeddings_scale", 1.0))
        a.logit_scale = cfg.get(
            "width_scale", cfg.get("mup_output_alpha", 1.0)
            * cfg.get("mup_width_scale", 1.0))
        if cfg.get("scale_qk_dot_by_d",
                   cfg.get("mup_scale_qk_dot_by_d", False)):
            # scale = 1/d  (attn_scale = base**-0.5 with base = d**2)
            a.query_pre_attn_scalar = (hidden // heads) ** 2
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        d = self.hidden_size
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.ln_f.", "model.norm.")
            if k.startswith("transformer.h."):
                k = "model.layers." + k[len("transformer.h."):]
                k = k.replace(".ln_1.", ".input_layernorm.")
                k = k.replace(".ln_2.", ".post_attention_layernorm.")
                if k.endswith(".weight") and (".attn." in k
                                              or ".mlp." in k):
                    v = np.asarray(v).T      # Conv1D stores [in, out]
                k = k.replace(".attn.c_proj.", ".self_attn.o_proj.")
                k = k.replace(".mlp.c_fc2.", ".mlp.gate_proj.")
                k = k.replace(".mlp.c_fc.", ".mlp.up_proj.")
                k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
                if ".attn.c_attn." in k:
                    v = np.asarray(v)
                    for j, name in enumerate(("q", "k", "v")):
                        out[k.replace(".attn.c_attn.",
                                      f".self_attn.{name}_proj.")] = \
                            v[j * d:(j + 1) * d]
                    continue
            out[k] = v
        return out


@dataclass
class PersimmonArch(LlamaArch):
    """Persimmon (reference vllm/model_executor/models/persimmon.py):
    biased LayerNorms, per-head-interleaved fused QKV with bias, per-head
    q/k LayerNorm (with bias), partial rotary, squared-ReLU non-gated MLP,
    untied head.  (Fuyu's language backbone.)"""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "PersimmonArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.mlp_gated = False
        a.hidden_act = "relu2"
        a.qkv_bias = a.o_bias = a.mlp_bias = True
        a.partial_rotary_factor = cfg.get("partial_rotary_factor", 0.5)
        a.rms_norm_eps = cfg.get("layer_norm_eps", 1e-5)
        if cfg.get("qk_layernorm", True):
            a.qk_norm = True
            a.qk_norm_type = "layernorm"
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        h, d = self.num_heads, self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("model.final_layernorm.", "model.norm.")
            k = k.replace(".self_attn.dense.", ".self_attn.o_proj.")
            k = k.replace(".self_attn.q_layernorm.", ".self_attn.q_norm.")
            k = k.replace(".self_attn.k_layernorm.", ".self_attn.k_norm.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            if ".self_attn.query_key_value." in k:
                # Per-head (q, k, v) interleave (HF
                # PersimmonAttention._split_heads views [.., H, 3, d]).
                v = np.asarray(v)
                parts = v.reshape(h, 3, d, *v.shape[1:])
                for j, name in enumerate(("q", "k", "v")):
                    out[k.replace(".self_attn.query_key_value.",
                                  f".self_attn.{name}_proj.")] = \
                        parts[:, j].reshape(h * d, *v.shape[1:])
                continue
            out[k] = v
        return out


@dataclass
class ChatGLMArch(LlamaArch):
    """ChatGLM2/3 / GLM-4 (trust-remote-code lineage) (reference
    vllm/model_executor/models/chatglm.py): RMSNorm, fused biased QKV with
    grouped MQA, half-dim interleaved rotary (base 10000*rope_ratio),
    SwiGLU with a fused [gate|up] dense_h_to_4h."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "ChatGLMArch":
        heads = cfg["num_attention_heads"]
        hidden = cfg["hidden_size"]
        head_dim = cfg.get("kv_channels") or hidden // heads
        a = cls(
            vocab_size=cfg.get("padded_vocab_size") or cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg["ffn_hidden_size"],
            num_layers=cfg["num_layers"],
            num_heads=heads,
            num_kv_heads=(cfg.get("multi_query_group_num", heads)
                          if cfg.get("multi_query_attention") else heads),
            head_dim=head_dim,
            rms_norm_eps=cfg.get("layernorm_epsilon", 1e-5),
            rope_theta=10000.0 * cfg.get("rope_ratio", 1.0),
            tie_word_embeddings=False,
            max_position_embeddings=cfg.get("seq_length", 8192),
        )
        if not cfg.get("rmsnorm", True):
            a.norm_type = "layernorm"
            a.norm_bias = True
        a.qkv_bias = cfg.get("add_qkv_bias",
                             cfg.get("add_bias_linear", False))
        a.o_bias = cfg.get("add_bias_linear", False)
        a.mlp_bias = cfg.get("add_bias_linear", False)
        a.partial_rotary_factor = 0.5
        a.rope_interleaved = True      # is_neox_style=False in reference
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        ff = self.intermediate_size
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.embedding.word_embeddings.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.encoder.final_layernorm.",
                          "model.norm.")
            k = k.replace("transformer.output_layer.weight",
                          "lm_head.weight")
            if k.startswith("transformer.encoder.layers."):
                k = "model.layers." + \
                    k[len("transformer.encoder.layers."):]
                k = k.replace(".self_attention.dense.",
                              ".self_attn.o_proj.")
                k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
                if ".self_attention.query_key_value." in k:
                    v = np.asarray(v)
                    splits = {"q": v[:q_sz], "k": v[q_sz:q_sz + kv_sz],
                              "v": v[q_sz + kv_sz:]}
                    for name, part in splits.items():
                        out[k.replace(".self_attention.query_key_value.",
                                      f".self_attn.{name}_proj.")] = part
                    continue
                if ".mlp.dense_h_to_4h." in k:
                    # Fused [gate | up] (ChatGLM swiglu chunks in halves,
                    # silu on the FIRST half).
                    v = np.asarray(v)
                    out[k.replace(".mlp.dense_h_to_4h.",
                                  ".mlp.gate_proj.")] = v[:ff]
                    out[k.replace(".mlp.dense_h_to_4h.",
                                  ".mlp.up_proj.")] = v[ff:]
                    continue
            out[k] = v
        return out


@dataclass
class TeleChat2Arch(LlamaArch):
    """TeleChat2 (reference vllm/model_executor/models/telechat2.py):
    Llama trunk with biases ONLY on o_proj and down_proj; separate query +
    per-head-interleaved fused key_value checkpoints."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "TeleChat2Arch":
        heads = cfg.get("n_head") or cfg.get("num_attention_heads")
        hidden = cfg["hidden_size"]
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg.get("ffn_hidden_size")
            or cfg.get("intermediate_size"),
            num_layers=cfg.get("n_layer") or cfg.get("num_hidden_layers"),
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=hidden // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon",
                                 cfg.get("rms_norm_eps", 1e-5)),
            rope_theta=cfg.get("rope_theta", 10000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("seq_length", 8192),
        )
        a.o_bias = True
        a.mlp_down_bias = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        h, d = self.num_heads, self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.word_embeddings.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.ln_f.", "model.norm.")
            if k.startswith("transformer.h."):
                k = "model.layers." + k[len("transformer.h."):]
                k = k.replace(".self_attention.dense.",
                              ".self_attn.o_proj.")
                k = k.replace(".self_attention.query.",
                              ".self_attn.q_proj.")
                if ".self_attention.key_value." in k:
                    # (k, v) interleaved per head (reference
                    # telechat2.py:60-68 degroups the same way).
                    v = np.asarray(v)
                    parts = v.reshape(h, 2, d, *v.shape[1:])
                    for j, name in enumerate(("k", "v")):
                        out[k.replace(".self_attention.key_value.",
                                      f".self_attn.{name}_proj.")] = \
                            parts[:, j].reshape(h * d, *v.shape[1:])
                    continue
            out[k] = v
        return out


@dataclass
class MiniCPM3Arch(LlamaArch):
    """MiniCPM3 (reference vllm/model_executor/models/minicpm3.py):
    DeepSeek-style MLA attention (always q-LoRA) with NEOX-style rope on
    the decoupled rope dims, plus MiniCPM's μ-param scalings."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MiniCPM3Arch":
        num_heads = cfg["num_attention_heads"]
        nope = cfg["qk_nope_head_dim"]
        rope = cfg["qk_rope_head_dim"]
        qk_head_dim = nope + rope
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=num_heads,
            head_dim=qk_head_dim,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            8192),
        )
        a.attn_type = "mla"
        a.q_lora_rank = cfg["q_lora_rank"]
        a.kv_lora_rank = cfg["kv_lora_rank"]
        a.qk_nope_head_dim = nope
        a.qk_rope_head_dim = rope
        a.v_head_dim = cfg.get("v_head_dim",
                               cfg["hidden_size"] // num_heads)
        a.partial_rotary_factor = rope / qk_head_dim
        a.rope_interleaved = False     # get_rope default neox style
        a.query_pre_attn_scalar = qk_head_dim
        se = cfg.get("scale_emb", 1.0)
        if se != 1.0:
            a.embed_scale = se
        sd = cfg.get("scale_depth")
        if sd is not None:
            a.residual_multiplier = sd / (a.num_layers ** 0.5)
        dmb = cfg.get("dim_model_base")
        if dmb is not None and dmb != a.hidden_size:
            a.logit_scale = dmb / a.hidden_size
        return a


@dataclass
class PhiMoEArch(LlamaArch):
    """PhiMoE / Phi-3.5-MoE (reference
    vllm/model_executor/models/phimoe.py): Mixtral checkpoint layout with
    biased LayerNorms, biased qkv/o/lm_head, and the sparsemixer top-2
    router."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "PhiMoEArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.qkv_bias = cfg.get("attention_bias", True)
        a.o_bias = cfg.get("attention_bias", True)
        a.lm_head_bias = cfg.get("lm_head_bias", True)
        a.num_experts = cfg.get("num_local_experts", 16)
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 2)
        a.moe_routing = "sparsemixer"
        a.moe_jitter_eps = cfg.get("router_jitter_noise", 0.01)
        if cfg.get("rope_scaling"):
            raise NotImplementedError("PhiMoE longrope scaling")
        return a


@dataclass
class DeciLMArch(LlamaArch):
    """DeciLM (reference vllm/model_executor/models/decilm.py): Llama
    with VARIABLE grouped-query attention per layer.  Served uniformly at
    max(num_key_value_heads_per_layer) by replicating each layer's KV
    head weights — exact, since duplicated KV heads attend identically
    (the reference's _degroup_weight does the same)."""

    kv_heads_per_layer: tuple = ()

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DeciLMArch":
        a = super().from_hf_config(cfg)
        per_layer = cfg.get("num_key_value_heads_per_layer")
        if per_layer:
            a.kv_heads_per_layer = tuple(per_layer)
            a.num_kv_heads = max(per_layer)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        if not self.kv_heads_per_layer:
            return tensors
        d = self.head_dim
        out = {}
        for k, v in tensors.items():
            if (".self_attn.k_proj." in k or ".self_attn.v_proj." in k) \
                    and "model.layers." in k:
                li = int(k.split("model.layers.")[1].split(".")[0])
                reps = self.num_kv_heads // self.kv_heads_per_layer[li]
                if reps > 1:
                    v = np.asarray(v)
                    kvh = self.kv_heads_per_layer[li]
                    v = np.repeat(v.reshape(kvh, d, *v.shape[1:]), reps,
                                  axis=0).reshape(self.num_kv_heads * d,
                                                  *v.shape[1:])
            out[k] = v
        return out


@dataclass
class PhiArch(LlamaArch):
    """Phi-1/1.5/2 (reference vllm/model_executor/models/phi.py): parallel
    attention+MLP off ONE LayerNorm, biased projections everywhere, partial
    rotary, biased lm_head."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "PhiArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.parallel_residual = True
        a.shared_input_norm = True
        a.mlp_gated = False
        a.qkv_bias = True
        a.o_bias = True
        a.mlp_bias = True
        a.lm_head_bias = True
        a.partial_rotary_factor = cfg.get("partial_rotary_factor", 0.5)
        a.hidden_act = "gelu_tanh"     # HF "gelu_new"
        a.rms_norm_eps = cfg.get("layer_norm_eps", 1e-5)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        return _rename(tensors, [
            ("self_attn.dense.", "self_attn.o_proj."),
            ("mlp.fc1.", "mlp.up_proj."),
            ("mlp.fc2.", "mlp.down_proj."),
            ("model.final_layernorm.", "model.norm.")])


@dataclass
class GPTNeoXArch(LlamaArch):
    """GPT-NeoX / Pythia (reference vllm/model_executor/models/gpt_neox.py):
    parallel residual, biased LayerNorms, non-gated GELU MLP, partial
    rotary, per-head-interleaved fused QKV checkpoint layout."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GPTNeoXArch":
        num_heads = cfg["num_attention_heads"]
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads, num_kv_heads=num_heads,
            head_dim=cfg["hidden_size"] // num_heads,
            rope_theta=cfg.get("rope_theta",
                               cfg.get("rotary_emb_base", 10000.0)),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False))
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.parallel_residual = cfg.get("use_parallel_residual", True)
        a.mlp_gated = False
        bias = cfg.get("attention_bias", True)
        a.qkv_bias = bias
        a.o_bias = bias
        a.mlp_bias = True
        a.partial_rotary_factor = cfg.get("rotary_pct", 0.25)
        a.hidden_act = {"gelu": "gelu", "gelu_new": "gelu_tanh",
                        "gelu_fast": "gelu_tanh"}.get(
            cfg.get("hidden_act", "gelu"), "gelu")
        a.rms_norm_eps = cfg.get("layer_norm_eps", 1e-5)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        h, d = self.num_heads, self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("gpt_neox.layers.", "model.layers.")
            k = k.replace("gpt_neox.final_layer_norm.", "model.norm.")
            k = k.replace("gpt_neox.embed_in.weight",
                          "model.embed_tokens.weight")
            k = k.replace("embed_out.weight", "lm_head.weight")
            k = k.replace(".attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            if ".attention.query_key_value." in k:
                # Fused layout is per-head (q, k, v) interleaved.
                v = np.asarray(v)
                if k.endswith("weight"):
                    w = v.reshape(h, 3, d, v.shape[-1])
                    parts = [w[:, j].reshape(h * d, -1) for j in range(3)]
                else:
                    b = v.reshape(h, 3, d)
                    parts = [b[:, j].reshape(h * d) for j in range(3)]
                for name, p in zip(("q", "k", "v"), parts):
                    out[k.replace(".attention.query_key_value.",
                                  f".self_attn.{name}_proj.")] = p
                continue
            out[k] = v
        return out


@dataclass
class GPTJArch(LlamaArch):
    """GPT-J (reference vllm/model_executor/models/gpt_j.py): parallel
    attention+MLP off one LayerNorm, interleaved (rotate-every-two) partial
    rotary, non-gated GELU MLP, biased lm_head."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GPTJArch":
        hidden = cfg.get("n_embd", cfg.get("hidden_size"))
        num_heads = cfg.get("n_head", cfg.get("num_attention_heads"))
        head_dim = hidden // num_heads
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg.get("n_inner") or 4 * hidden,
            num_layers=cfg.get("n_layer", cfg.get("num_hidden_layers")),
            num_heads=num_heads, num_kv_heads=num_heads,
            head_dim=head_dim,
            rope_theta=10000.0,
            max_position_embeddings=cfg.get("n_positions", 2048),
            tie_word_embeddings=False)
        a.norm_type = "layernorm"
        a.norm_bias = True
        a.parallel_residual = True
        a.shared_input_norm = True
        a.mlp_gated = False
        a.mlp_bias = True
        a.lm_head_bias = True
        a.rope_interleaved = True
        a.partial_rotary_factor = cfg.get("rotary_dim", head_dim) / head_dim
        a.hidden_act = "gelu_tanh"     # HF "gelu_new"
        a.rms_norm_eps = cfg.get("layer_norm_epsilon", 1e-5)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        return _rename(tensors, [
            ("transformer.wte.weight", "model.embed_tokens.weight"),
            ("transformer.h.", "model.layers."),
            ("transformer.ln_f.", "model.norm."),
            (".ln_1.", ".input_layernorm."),
            (".attn.q_proj.", ".self_attn.q_proj."),
            (".attn.k_proj.", ".self_attn.k_proj."),
            (".attn.v_proj.", ".self_attn.v_proj."),
            (".attn.out_proj.", ".self_attn.o_proj."),
            (".mlp.fc_in.", ".mlp.up_proj."),
            (".mlp.fc_out.", ".mlp.down_proj.")])


@dataclass
class FalconArch(LlamaArch):
    """Falcon (reference vllm/model_executor/models/falcon.py): parallel
    attention (7B: one shared LayerNorm; new-decoder 40B/180B: ln_attn +
    ln_mlp), multi-query or grouped fused QKV, non-gated GELU MLP.
    ALiBi variants (falcon-rw) are not supported."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "FalconArch":
        if cfg.get("alibi"):
            raise NotImplementedError("ALiBi Falcon variants (falcon-rw) "
                                      "are not supported")
        num_heads = cfg["num_attention_heads"]
        hidden = cfg["hidden_size"]
        new_arch = cfg.get("new_decoder_architecture", False)
        if new_arch:
            kv = cfg.get("num_kv_heads") or num_heads
        elif cfg.get("multi_query", True):
            kv = 1
        else:
            kv = num_heads
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            intermediate_size=cfg.get("ffn_hidden_size") or 4 * hidden,
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads, num_kv_heads=kv,
            head_dim=hidden // num_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True))
        a.norm_type = "layernorm"
        a.norm_bias = True
        parallel = cfg.get("parallel_attn", True) or new_arch
        a.parallel_residual = parallel
        a.shared_input_norm = parallel and not new_arch
        a.mlp_gated = False
        bias = cfg.get("bias", False)
        a.qkv_bias = bias
        a.o_bias = bias
        a.mlp_bias = bias
        a.hidden_act = "gelu"
        a.rms_norm_eps = cfg.get("layer_norm_epsilon", 1e-5)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        kv, d = self.num_kv_heads, self.head_dim
        group = self.num_heads // kv
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.word_embeddings.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.h.", "model.layers.")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace(".self_attention.dense.", ".self_attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.up_proj.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.down_proj.")
            k = k.replace(".ln_attn.", ".input_layernorm.")
            k = k.replace(".ln_mlp.", ".post_attention_layernorm.")
            if ".self_attention.query_key_value." in k:
                # Fused per-kv-group layout: (q * group, k, v) per group.
                v = np.asarray(v)
                if k.endswith("weight"):
                    w = v.reshape(kv, group + 2, d, v.shape[-1])
                    parts = [w[:, :group].reshape(kv * group * d, -1),
                             w[:, -2].reshape(kv * d, -1),
                             w[:, -1].reshape(kv * d, -1)]
                else:
                    b = v.reshape(kv, group + 2, d)
                    parts = [b[:, :group].reshape(-1),
                             b[:, -2].reshape(-1), b[:, -1].reshape(-1)]
                for name, p in zip(("q", "k", "v"), parts):
                    out[k.replace(".self_attention.query_key_value.",
                                  f".self_attn.{name}_proj.")] = p
                continue
            out[k] = v
        return out


@dataclass
class CohereArch(LlamaArch):
    """Command-R / Cohere (reference vllm/model_executor/models/commandr.py):
    parallel attention+MLP off one bias-free LayerNorm, interleaved rope,
    tied embeddings with a logit scale."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "CohereArch":
        if cfg.get("use_qk_norm"):
            raise NotImplementedError("Cohere use_qk_norm")
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = False
        a.parallel_residual = True
        a.shared_input_norm = True
        a.rope_interleaved = True
        a.logit_scale = cfg.get("logit_scale", 0.0625)
        a.tie_word_embeddings = True
        a.qkv_bias = cfg.get("attention_bias", False)
        a.rms_norm_eps = cfg.get("layer_norm_eps", 1e-5)
        return a


@dataclass
class Cohere2Arch(CohereArch):
    """Command-R7B / Cohere2 (reference
    vllm/model_executor/models/commandr.py:175-185, 223): Cohere trunk
    where 3 of every `sliding_window_pattern` layers use sliding-window
    attention WITH rope and every p-th layer is global attention WITHOUT
    rope.  Sliding-window masking follows the Gemma2 stance (exact for
    contexts <= the window; the window rides the same paged cache)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Cohere2Arch":
        a = super().from_hf_config(cfg)
        # Newer HF configs carry an explicit layer_types list; older ones
        # (and the reference) use sliding_window_pattern.  The Cohere2
        # schedule is always periodic: full attention every p-th layer.
        lt = cfg.get("layer_types")
        if lt and "full_attention" in lt:
            p = lt.index("full_attention") + 1
            if any((t == "full_attention") != ((i + 1) % p == 0)
                   for i, t in enumerate(lt)):
                raise NotImplementedError(
                    f"non-periodic Cohere2 layer_types: {lt}")
        else:
            p = (cfg.get("sliding_window_pattern")
                 or cfg.get("_sliding_window_pattern") or 4)
        a.no_rope_pattern = p
        a.sliding_window = cfg.get("sliding_window")
        a.sliding_window_pattern = p
        return a


@dataclass
class BaichuanArch(LlamaArch):
    """Baichuan/Baichuan2-7B (reference
    vllm/model_executor/models/baichuan.py): Llama with a fused W_pack QKV
    checkpoint; Baichuan2 normalizes the lm_head rows (NormHead).  The
    13B ALiBi variants are not supported (detected as in the reference:
    hidden_size != 4096)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "BaichuanArch":
        # The 13B variants (40 layers) use ALiBi; 7B (32 layers) uses rope
        # (the reference keys the same way, baichuan.py position_embedding).
        if cfg.get("num_hidden_layers", 32) >= 40:
            raise NotImplementedError(
                "Baichuan-13B uses ALiBi positions (unsupported)")
        a = super().from_hf_config(cfg)
        a.norm_head = cfg.get("vocab_size", 0) == 125696  # Baichuan2
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in tensors.items():
            if ".self_attn.W_pack.weight" in k:
                v = np.asarray(v)
                third = v.shape[0] // 3
                for j, name in enumerate(("q", "k", "v")):
                    out[k.replace(".self_attn.W_pack.",
                                  f".self_attn.{name}_proj.")] = \
                        v[j * third:(j + 1) * third]
                continue
            if k == "lm_head.weight" and getattr(self, "norm_head", False):
                v = np.asarray(v, np.float32)
                v = v / np.maximum(
                    np.linalg.norm(v, axis=1, keepdims=True), 1e-7)
            out[k] = v
        return out


@dataclass
class InternLM2Arch(LlamaArch):
    """InternLM2 (reference vllm/model_executor/models/internlm2.py):
    Llama semantics under different names + a grouped-interleaved fused
    wqkv checkpoint layout."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "InternLM2Arch":
        a = super().from_hf_config(cfg)
        a.qkv_bias = cfg.get("bias", False)
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        kv, d = self.num_kv_heads, self.head_dim
        group = self.num_heads // kv
        out = {}
        for k, v in tensors.items():
            k = k.replace("model.tok_embeddings.weight",
                          "model.embed_tokens.weight")
            k = k.replace(".attention.wo.", ".self_attn.o_proj.")
            k = k.replace(".feed_forward.w1.", ".mlp.gate_proj.")
            k = k.replace(".feed_forward.w3.", ".mlp.up_proj.")
            k = k.replace(".feed_forward.w2.", ".mlp.down_proj.")
            k = k.replace(".attention_norm.", ".input_layernorm.")
            k = k.replace(".ffn_norm.", ".post_attention_layernorm.")
            k = k.replace("output.weight", "lm_head.weight") \
                if k == "output.weight" else k
            if ".attention.wqkv." in k:
                # Grouped layout: (q * group, k, v) per kv head.
                v = np.asarray(v)
                if k.endswith("weight"):
                    w = v.reshape(kv, group + 2, d, v.shape[-1])
                    parts = [w[:, :group].reshape(kv * group * d, -1),
                             w[:, -2].reshape(kv * d, -1),
                             w[:, -1].reshape(kv * d, -1)]
                else:
                    b = v.reshape(kv, group + 2, d)
                    parts = [b[:, :group].reshape(-1),
                             b[:, -2].reshape(-1), b[:, -1].reshape(-1)]
                for name, p in zip(("q", "k", "v"), parts):
                    out[k.replace(".attention.wqkv.",
                                  f".self_attn.{name}_proj.")] = p
                continue
            out[k] = v
        return out


@dataclass
class DeepseekV2Arch(LlamaArch):
    """DeepSeek V2/V2-Lite (reference
    vllm/model_executor/models/deepseek_v2.py): multi-head latent
    attention (low-rank compressed KV + decoupled interleaved rope) and
    DeepSeek-MoE (softmax->topk routing with optional device-group
    limiting, routed scaling, ungated shared experts, dense first-k
    layers).

    First-pass cache layout is "naive MLA": the per-head K (nope|rope,
    head_dim = qk_nope + qk_rope) and V (padded from v_head_dim) are
    materialized into the standard paged pools, so every cache feature
    (eviction, quantized KV, swap, prefix cache) applies unchanged.  The
    absorbed latent-cache layout is a later optimization."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DeepseekV2Arch":
        num_heads = cfg["num_attention_heads"]
        nope = cfg["qk_nope_head_dim"]
        rope = cfg["qk_rope_head_dim"]
        qk_head_dim = nope + rope
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=num_heads,      # per-head K in the naive layout
            head_dim=qk_head_dim,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            8192),
        )
        a.attn_type = "mla"
        a.q_lora_rank = cfg.get("q_lora_rank")
        a.kv_lora_rank = cfg["kv_lora_rank"]
        a.qk_nope_head_dim = nope
        a.qk_rope_head_dim = rope
        a.v_head_dim = cfg["v_head_dim"]
        a.partial_rotary_factor = rope / qk_head_dim
        a.rope_interleaved = True        # HF apply_rotary_emb is complex
        #                                  rotation over adjacent pairs
        a.query_pre_attn_scalar = qk_head_dim
        n_routed = cfg.get("n_routed_experts")
        if n_routed:
            a.num_experts = n_routed
            a.num_experts_per_tok = cfg.get("num_experts_per_tok", 2)
            a.moe_intermediate_size = cfg["moe_intermediate_size"]
            a.moe_routing = "softmax_topk"
            a.moe_hf_style = "qwen"      # experts.N.{gate,up,down}_proj
            a.moe_topk_method = cfg.get("topk_method", "greedy")
            a.moe_n_group = cfg.get("n_group", 1)
            a.moe_topk_group = cfg.get("topk_group", 1)
            a.moe_routed_scaling = cfg.get("routed_scaling_factor", 1.0)
            a.first_k_dense = cfg.get("first_k_dense_replace", 0)
            if cfg.get("moe_layer_freq", 1) != 1:
                raise NotImplementedError("moe_layer_freq != 1")
            ns = cfg.get("n_shared_experts")
            if ns:
                a.moe_shared_intermediate = ns * a.moe_intermediate_size
                a.moe_shared_plural = True
        return a


@dataclass
class DeepseekV3Arch(DeepseekV2Arch):
    """DeepSeek V3/R1 (reference vllm/model_executor/models/deepseek_v3
    via deepseek_v2.py): V2's MLA plus the noaux_tc router — sigmoid
    scores, bias-corrected top-2-sum group selection, renormalized
    uncorrected weights — and an mscale²-adjusted attention scale under
    yarn."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DeepseekV3Arch":
        import math
        a = super().from_hf_config(cfg)
        a.rope_interleaved = cfg.get("rope_interleave", True)
        if a.num_experts:
            a.moe_routing = "noaux_tc"
            a.moe_norm_topk = cfg.get("norm_topk_prob", True)
        rs = cfg.get("rope_scaling") or {}
        mad = rs.get("mscale_all_dim", 0)
        if mad:
            factor = rs["factor"]
            mscale = (0.1 * mad * math.log(factor) + 1.0) \
                if factor > 1 else 1.0
            # attn_scale = qk^-0.5 * mscale^2, via query_pre_attn_scalar.
            a.query_pre_attn_scalar = (
                a.head_dim ** -0.5 * mscale * mscale) ** -2
        return a


@dataclass
class OlmoArch(LlamaArch):
    """OLMo (reference vllm/model_executor/models/olmo.py): Llama layout
    with NON-parametric LayerNorms (no learned weight/bias — synthesized
    as ones here) and an optional clamp on the qkv activations."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "OlmoArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.rms_norm_eps = 1e-5          # F.layer_norm default in HF OLMo
        a.qkv_clip = cfg.get("clip_qkv")
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = dict(tensors)
        ones = np.ones(self.hidden_size, np.float32)
        for i in range(self.num_layers):
            out[f"model.layers.{i}.input_layernorm.weight"] = ones
            out[f"model.layers.{i}.post_attention_layernorm.weight"] = ones
        out["model.norm.weight"] = ones
        return out


@dataclass
class Olmo2Arch(LlamaArch):
    """OLMo2 (reference vllm/model_executor/models/olmo2.py): post-norm
    residual placement (norms act on sublayer outputs) and RMSNorm over
    the FULL q/k projections before the head reshape."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Olmo2Arch":
        a = super().from_hf_config(cfg)
        a.postnorm = True
        a.qk_norm_flat = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        # post_attention_layernorm -> input_norm slot (post-attn output
        # norm); post_feedforward_layernorm -> post_norm slot.
        out = {}
        for k, v in tensors.items():
            k = k.replace(".post_attention_layernorm.", ".__tmp_attn__.")
            k = k.replace(".post_feedforward_layernorm.",
                          ".post_attention_layernorm.")
            k = k.replace(".__tmp_attn__.", ".input_layernorm.")
            out[k] = v
        return out


@dataclass
class GraniteArch(LlamaArch):
    """IBM Granite (reference vllm/model_executor/models/granite.py):
    Llama plus four μ-param multipliers (embedding, attention scale,
    residual, logits)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GraniteArch":
        a = super().from_hf_config(cfg)
        em = cfg.get("embedding_multiplier", 1.0)
        if em != 1.0:
            a.embed_scale = em
        am = cfg.get("attention_multiplier")
        if am is not None:
            a.query_pre_attn_scalar = am ** -2
        a.residual_multiplier = cfg.get("residual_multiplier", 1.0)
        ls = cfg.get("logits_scaling", 1.0)
        if ls != 1.0:
            a.logit_scale = 1.0 / ls
        a.qkv_bias = cfg.get("attention_bias", False)
        return a


@dataclass
class GraniteMoeArch(GraniteArch):
    """GraniteMoE (reference vllm/model_executor/models/granitemoe.py):
    Granite multipliers + mixtral-style routing with fused
    input_linear/output_linear expert checkpoints."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GraniteMoeArch":
        a = super().from_hf_config(cfg)
        a.num_experts = cfg["num_local_experts"]
        a.num_experts_per_tok = cfg.get("num_experts_per_tok", 2)
        a.moe_intermediate_size = cfg["intermediate_size"]
        a.moe_routing = "topk_softmax"
        a.moe_hf_style = "granite"
        return a


@dataclass
class NemotronArch(LlamaArch):
    """Nemotron (reference vllm/model_executor/models/nemotron.py):
    LayerNorm1P (unit-offset LayerNorm with bias), squared-ReLU
    non-gated MLP, partial rotary."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "NemotronArch":
        cfg = dict(cfg)
        cfg.setdefault("rms_norm_eps", cfg.get("norm_eps", 1e-5))
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_unit_offset = True
        a.norm_bias = True
        a.hidden_act = "relu2"
        a.mlp_gated = False
        a.partial_rotary_factor = cfg.get(
            "partial_rotary_factor", cfg.get("rope_percent", 0.5))
        return a


@dataclass
class GlmArch(LlamaArch):
    """GLM-4 text (reference vllm/model_executor/models/glm.py): Llama
    trunk with qkv bias, half-width interleaved rotary, fused
    gate_up_proj checkpoints."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GlmArch":
        a = super().from_hf_config(cfg)
        a.qkv_bias = cfg.get("attention_bias", True)
        a.partial_rotary_factor = cfg.get("partial_rotary_factor", 0.5)
        a.rope_interleaved = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in tensors.items():
            if ".mlp.gate_up_proj.weight" in k:
                v = np.asarray(v)
                half = v.shape[0] // 2
                out[k.replace("gate_up_proj", "gate_proj")] = v[:half]
                out[k.replace("gate_up_proj", "up_proj")] = v[half:]
                continue
            out[k] = v
        return out


@dataclass
class Glm4Arch(GlmArch):
    """GLM-4-0414 (reference vllm/model_executor/models/glm4.py): GLM +
    gemma2-style sandwich norms (post-attn-output and post-mlp norms)."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Glm4Arch":
        a = super().from_hf_config(cfg)
        a.sandwich_norms = True
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in super().canonicalize_hf(tensors).items():
            # to gemma2 4-norm names: post_self_attn -> post_attention,
            # post_attention -> pre_feedforward, post_mlp -> post_ffw.
            k = k.replace(".post_attention_layernorm.",
                          ".pre_feedforward_layernorm.")
            k = k.replace(".post_self_attn_layernorm.",
                          ".post_attention_layernorm.")
            k = k.replace(".post_mlp_layernorm.",
                          ".post_feedforward_layernorm.")
            out[k] = v
        return out


@dataclass
class ExaoneArch(LlamaArch):
    """EXAONE-3 (reference vllm/model_executor/models/exaone.py): Llama
    semantics under GPT-style config/weight names."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "ExaoneArch":
        cfg = dict(cfg)
        cfg.setdefault("num_hidden_layers", cfg.get("num_layers"))
        cfg.setdefault("rms_norm_eps", cfg.get("layer_norm_epsilon", 1e-5))
        return super().from_hf_config(cfg)

    def canonicalize_hf(self, tensors: dict) -> dict:
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.ln_f.", "model.norm.")
            k = k.replace("transformer.h.", "model.layers.")
            k = k.replace(".ln_1.", ".input_layernorm.")
            k = k.replace(".ln_2.", ".post_attention_layernorm.")
            k = k.replace(".attn.attention.q_proj.", ".self_attn.q_proj.")
            k = k.replace(".attn.attention.k_proj.", ".self_attn.k_proj.")
            k = k.replace(".attn.attention.v_proj.", ".self_attn.v_proj.")
            k = k.replace(".attn.attention.out_proj.",
                          ".self_attn.o_proj.")
            k = k.replace(".mlp.c_fc_0.", ".mlp.gate_proj.")
            k = k.replace(".mlp.c_fc_1.", ".mlp.up_proj.")
            k = k.replace(".mlp.c_proj.", ".mlp.down_proj.")
            out[k] = v
        return out


@dataclass
class DbrxArch(LlamaArch):
    """DBRX (reference vllm/model_executor/models/dbrx.py): 16-expert MoE
    with fused Wqkv + clip, bias-free LayerNorms, and flattened expert
    GLU checkpoints (w1/v1/w2 stacked over experts) — canonicalized here
    into the mixtral naming so the common MoE loader applies."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DbrxArch":
        attn = cfg.get("attn_config") or {}
        ffn = cfg.get("ffn_config") or {}
        n_heads = cfg["n_heads"]
        a = cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["d_model"],
            intermediate_size=ffn.get("ffn_hidden_size",
                                      4 * cfg["d_model"]),
            num_layers=cfg["n_layers"],
            num_heads=n_heads,
            num_kv_heads=attn.get("kv_n_heads", n_heads),
            head_dim=cfg["d_model"] // n_heads,
            rope_theta=attn.get("rope_theta", 500000.0),
            max_position_embeddings=cfg.get("max_seq_len", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
        a.norm_type = "layernorm"
        a.rms_norm_eps = 1e-5
        a.qkv_clip = attn.get("clip_qkv")
        a.num_experts = ffn.get("moe_num_experts", 16)
        a.num_experts_per_tok = ffn.get("moe_top_k", 4)
        a.moe_intermediate_size = ffn.get("ffn_hidden_size")
        a.moe_routing = "softmax_topk"
        a.moe_norm_topk = ffn.get("moe_normalize_expert_weights",
                                  1) is not None
        return a

    def canonicalize_hf(self, tensors: dict) -> dict:
        e, inter = self.num_experts, self.moe_inter
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        out = {}
        for k, v in tensors.items():
            k = k.replace("transformer.wte.weight",
                          "model.embed_tokens.weight")
            k = k.replace("transformer.norm_f.", "model.norm.")
            k = k.replace("transformer.blocks.", "model.layers.")
            k = k.replace(".norm_attn_norm.norm_1.", ".input_layernorm.")
            k = k.replace(".norm_attn_norm.norm_2.",
                          ".post_attention_layernorm.")
            k = k.replace(".norm_attn_norm.attn.", ".self_attn.")
            k = k.replace(".ffn.router.layer.weight",
                          ".block_sparse_moe.gate.weight")
            if k.endswith(".self_attn.Wqkv.weight"):
                v = np.asarray(v)
                base = k[:-len("Wqkv.weight")]
                out[base + "q_proj.weight"] = v[:q_sz]
                out[base + "k_proj.weight"] = v[q_sz:q_sz + kv_sz]
                out[base + "v_proj.weight"] = v[q_sz + kv_sz:]
                continue
            if k.endswith(".self_attn.out_proj.weight"):
                out[k.replace(".out_proj.", ".o_proj.")] = v
                continue
            if ".ffn.experts.mlp." in k:
                # w1/v1: [E*I, D] gate/up (mixtral w1/w3 layout); w2:
                # [E*I, D] used untransposed in HF (h @ chunk) -> emit
                # the mixtral [D, I] per-expert down weight.
                v = np.asarray(v).reshape(e, inter, -1)
                which = k.rsplit(".", 1)[1]
                name = {"w1": "w1", "v1": "w3", "w2": "w2"}[which]
                base = k.split(".ffn.experts.mlp.")[0]
                for i in range(e):
                    chunk = v[i].T if which == "w2" else v[i]
                    out[f"{base}.block_sparse_moe.experts.{i}."
                        f"{name}.weight"] = chunk
                continue
            out[k] = v
        return out


@dataclass
class OrionArch(LlamaArch):
    """Orion (reference vllm/model_executor/models/orion.py): Llama with
    biased LayerNorms in place of RMSNorm."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "OrionArch":
        a = super().from_hf_config(cfg)
        a.norm_type = "layernorm"
        a.norm_bias = True
        return a


@dataclass
class MiniCPMArch(LlamaArch):
    """MiniCPM (reference vllm/model_executor/models/minicpm.py): Llama
    with μ-param scalings: scale_emb on embeddings, scale_depth/sqrt(L)
    on residual branches, dim_model_base/hidden on logits."""

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "MiniCPMArch":
        a = super().from_hf_config(cfg)
        se = cfg.get("scale_emb", 1.0)
        if se != 1.0:
            a.embed_scale = se
        sd = cfg.get("scale_depth")
        if sd is not None:
            a.residual_multiplier = sd / (a.num_layers ** 0.5)
        dmb = cfg.get("dim_model_base")
        if dmb is not None and dmb != a.hidden_size:
            a.logit_scale = dmb / a.hidden_size
        return a


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float,
             unit_offset: bool = False) -> jnp.ndarray:
    """HF-compatible RMSNorm: fp32 variance, weight applied in model dtype.
    ``unit_offset`` scales by (1 + w) (Gemma's zero-centered weights)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = w + 1 if unit_offset else w
    return (w * xf.astype(dtype)).astype(dtype)


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b, eps: float,
               unit_offset: bool = False) -> jnp.ndarray:
    """Mean-centering LayerNorm in fp32 (GPT-NeoX/J, Falcon, StarCoder2,
    StableLM, Phi; Cohere passes b=None).  ``unit_offset``: scale by
    (1 + w) — Nemotron's LayerNorm1P."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    wf = w.astype(jnp.float32)
    if unit_offset:
        wf = wf + 1.0
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * wf
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)


_ACTS = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    # Nemotron/Persimmon squared ReLU.
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


class LlamaModel:
    """Stateless model: holds only the arch + dtype; params travel as a
    pytree argument so jit/pjit own their placement."""

    architecture = "llama"

    def __init__(self, arch: LlamaArch, dtype=jnp.bfloat16):
        self.arch = arch
        self.dtype = dtype

    # ---- parameter construction ----------------------------------------

    def _mla_layer_shapes(self, moe: bool) -> dict:
        """Per-layer parameter shapes (w/o the leading layer axis) for an
        MLA (DeepSeek) layer."""
        a = self.arch
        qk = a.head_dim
        shapes = {
            "w_kv_a": (a.hidden_size, a.kv_lora_rank + a.qk_rope_head_dim),
            "kv_a_norm": (a.kv_lora_rank,),
            "w_kv_b": (a.kv_lora_rank,
                       a.num_heads * (a.qk_nope_head_dim + a.v_head_dim)),
            "wo": (a.num_heads * a.v_head_dim, a.hidden_size),
            "input_norm": (a.hidden_size,),
            "post_norm": (a.hidden_size,),
        }
        if a.q_lora_rank:
            shapes["wq_a"] = (a.hidden_size, a.q_lora_rank)
            shapes["q_a_norm"] = (a.q_lora_rank,)
            shapes["wq_b"] = (a.q_lora_rank, a.num_heads * qk)
        else:
            shapes["wq"] = (a.hidden_size, a.num_heads * qk)
        if moe:
            shapes["router"] = (a.hidden_size, a.num_experts)
            if a.moe_routing == "noaux_tc":
                shapes["e_corr_bias"] = (a.num_experts,)
            shapes["w_gate_up"] = (a.num_experts, a.hidden_size,
                                   2 * a.moe_inter)
            shapes["w_down"] = (a.num_experts, a.moe_inter, a.hidden_size)
            if a.moe_shared_intermediate:
                si = a.moe_shared_intermediate
                shapes["ws_gate_up"] = (a.hidden_size, 2 * si)
                shapes["ws_down"] = (si, a.hidden_size)
        else:
            shapes["w_gate_up"] = (a.hidden_size, 2 * a.intermediate_size)
            shapes["w_down"] = (a.intermediate_size, a.hidden_size)
        return shapes

    def _init_params_mla(self, w, ones) -> dict:
        a = self.arch
        kd = a.first_k_dense if a.num_experts else a.num_layers
        kd = min(kd, a.num_layers)
        n_moe = a.num_layers - kd if a.num_experts else 0

        def stack(n, moe):
            out = {}
            for name, shape in self._mla_layer_shapes(moe).items():
                if "norm" in name:
                    out[name] = ones((n,) + shape)
                else:
                    out[name] = w(*((n,) + shape))
            return out

        params = {"embed": w(a.vocab_size, a.hidden_size),
                  "final_norm": ones((a.hidden_size,))}
        if n_moe:
            params["layers"] = stack(n_moe, True)
            if kd:
                params["dense_layers"] = stack(kd, False)
        else:
            params["layers"] = stack(a.num_layers, False)
        if not a.tie_word_embeddings:
            params["lm_head"] = w(a.hidden_size, a.vocab_size)
        return params

    def _load_hf_deepseek(self, tensors: dict, as_numpy: bool) -> dict:
        """DeepSeek V2 checkpoint (HF modeling_deepseek_v2 naming) ->
        fused/stacked MLA layout with a dense prefix stack."""
        a = self.arch

        def t(name):
            return np.asarray(tensors[name])

        def proj(name):
            return t(name).T

        def stack(xs):
            arr = np.stack(xs)
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        kd = min(a.first_k_dense if a.num_experts else a.num_layers,
                 a.num_layers)
        n_moe = a.num_layers - kd if a.num_experts else 0

        def collect(lo, hi, moe):
            acc = {k: [] for k in self._mla_layer_shapes(moe)}
            for i in range(lo, hi):
                p = f"model.layers.{i}."
                if a.q_lora_rank:
                    acc["wq_a"].append(proj(p + "self_attn.q_a_proj"
                                            ".weight"))
                    acc["q_a_norm"].append(t(p + "self_attn.q_a_layernorm"
                                             ".weight"))
                    acc["wq_b"].append(proj(p + "self_attn.q_b_proj"
                                            ".weight"))
                else:
                    acc["wq"].append(proj(p + "self_attn.q_proj.weight"))
                acc["w_kv_a"].append(proj(
                    p + "self_attn.kv_a_proj_with_mqa.weight"))
                acc["kv_a_norm"].append(t(
                    p + "self_attn.kv_a_layernorm.weight"))
                acc["w_kv_b"].append(proj(p + "self_attn.kv_b_proj"
                                          ".weight"))
                acc["wo"].append(proj(p + "self_attn.o_proj.weight"))
                acc["input_norm"].append(t(p + "input_layernorm.weight"))
                acc["post_norm"].append(t(
                    p + "post_attention_layernorm.weight"))
                if moe:
                    acc["router"].append(proj(p + "mlp.gate.weight"))
                    if a.moe_routing == "noaux_tc":
                        acc["e_corr_bias"].append(t(
                            p + "mlp.gate.e_score_correction_bias"))
                    acc["w_gate_up"].append(np.stack([
                        np.concatenate([
                            proj(p + f"mlp.experts.{e}.gate_proj.weight"),
                            proj(p + f"mlp.experts.{e}.up_proj.weight"),
                        ], axis=1) for e in range(a.num_experts)]))
                    acc["w_down"].append(np.stack([
                        proj(p + f"mlp.experts.{e}.down_proj.weight")
                        for e in range(a.num_experts)]))
                    if a.moe_shared_intermediate:
                        acc["ws_gate_up"].append(np.concatenate([
                            proj(p + "mlp.shared_experts.gate_proj"
                                 ".weight"),
                            proj(p + "mlp.shared_experts.up_proj.weight"),
                        ], axis=1))
                        acc["ws_down"].append(proj(
                            p + "mlp.shared_experts.down_proj.weight"))
                else:
                    acc["w_gate_up"].append(np.concatenate([
                        proj(p + "mlp.gate_proj.weight"),
                        proj(p + "mlp.up_proj.weight")], axis=1))
                    acc["w_down"].append(proj(p + "mlp.down_proj.weight"))
            return {k: stack(v) for k, v in acc.items()}

        params = {
            "embed": leaf(t("model.embed_tokens.weight")),
            "final_norm": leaf(t("model.norm.weight")),
        }
        if n_moe:
            params["layers"] = collect(kd, a.num_layers, True)
            if kd:
                params["dense_layers"] = collect(0, kd, False)
        else:
            params["layers"] = collect(0, a.num_layers, False)
        if not a.tie_word_embeddings:
            params["lm_head"] = leaf(t("lm_head.weight").T)
        return params

    def init_params(self, seed: int = 0, as_numpy: bool = False) -> dict:
        """Random init (benchmark/synthetic use; real serving loads HF
        weights).  Scaled-normal like HF's default init.

        Default path generates **on device** with jax.random — for multi-GiB
        synthetic models, host RNG + the host→device upload dominate engine
        construction (measured: ~200 s for 1B over the chip tunnel vs <5 s
        on-device).  ``as_numpy`` keeps leaves on host (float32) — required
        when weights are quantized before upload so the bf16 tree never
        hits HBM."""
        a = self.arch
        std = 0.02

        if as_numpy:
            rng = np.random.default_rng(seed)

            def w(*shape):
                return rng.standard_normal(shape, dtype=np.float32) * std

            ones = np.ones
        else:
            key_box = [jax.random.PRNGKey(seed)]

            def w(*shape):
                key_box[0], sub = jax.random.split(key_box[0])
                return (jax.random.normal(sub, shape, self.dtype) * std)

            ones = lambda sh: jnp.ones(sh, self.dtype)  # noqa: E731
        if a.attn_type == "mla":
            return self._init_params_mla(w, ones)
        qkv_out = (a.num_heads + 2 * a.num_kv_heads) * a.head_dim
        mlp_out = (2 if a.mlp_gated else 1) * a.intermediate_size

        def make_layers(n: int, moe: bool) -> dict:
            layers = {
                "wqkv": w(n, a.hidden_size, qkv_out),
                "wo": w(n, a.num_heads * a.head_dim, a.hidden_size),
                "input_norm": ones((n, a.hidden_size)),
            }
            if not a.shared_input_norm:
                layers["post_norm"] = ones((n, a.hidden_size))
            if moe:
                layers["router"] = w(n, a.hidden_size, a.num_experts)
                layers["w_gate_up"] = w(n, a.num_experts,
                                        a.hidden_size, 2 * a.moe_inter)
                layers["w_down"] = w(n, a.num_experts,
                                     a.moe_inter, a.hidden_size)
                if a.moe_shared_intermediate:
                    si = a.moe_shared_intermediate
                    layers["ws_gate_up"] = w(n, a.hidden_size, 2 * si)
                    layers["ws_down"] = w(n, si, a.hidden_size)
                    if a.moe_shared_gate:
                        layers["ws_gate"] = w(n, a.hidden_size, 1)
                if a.moe_parallel_residual:
                    layers["res_norm"] = ones((n, a.hidden_size))
                    layers["wr_gate_up"] = w(n, a.hidden_size,
                                             2 * a.hidden_size)
                    layers["wr_down"] = w(n, a.hidden_size, a.hidden_size)
            else:
                layers["w_gate_up"] = w(n, a.hidden_size, mlp_out)
                layers["w_down"] = w(n, a.intermediate_size, a.hidden_size)
            if a.qkv_bias:
                layers["bqkv"] = w(n, qkv_out)
            if a.o_bias:
                layers["bo"] = w(n, a.hidden_size)
            if a.mlp_bias:
                layers["b_gate_up"] = w(n, mlp_out)
                layers["b_down"] = w(n, a.hidden_size)
            elif a.mlp_down_bias:
                layers["b_down"] = w(n, a.hidden_size)
            if a.qk_norm:
                layers["q_norm"] = ones((n, a.head_dim))
                layers["k_norm"] = ones((n, a.head_dim))
                if a.qk_norm_type == "layernorm":
                    layers["q_norm_b"] = w(n, a.head_dim)
                    layers["k_norm_b"] = w(n, a.head_dim)
            elif a.qk_norm_flat:
                layers["q_norm"] = ones((n, a.num_heads * a.head_dim))
                layers["k_norm"] = ones((n, a.num_kv_heads * a.head_dim))
            if a.norm_type == "layernorm" and a.norm_bias:
                layers["input_norm_b"] = w(n, a.hidden_size)
                if not a.shared_input_norm:
                    layers["post_norm_b"] = w(n, a.hidden_size)
            if a.sandwich_norms:
                layers["post_attn_out_norm"] = ones((n, a.hidden_size))
                layers["post_ffw_norm"] = ones((n, a.hidden_size))
            return layers

        # DeepSeek-V1-style dense first-k prefix on the generic (non-MLA)
        # trunk: dense layers and MoE layers form separate scan stacks.
        # Arctic's alternating pattern (frequency 2) reuses the same two
        # stacks, executed interleaved by forward_layers.
        if a.num_experts and a.moe_layer_frequency == 2:
            n_moe = a.num_layers // 2
            params = {
                "embed": w(a.vocab_size, a.hidden_size),
                "layers": make_layers(n_moe, True),
                "dense_layers": make_layers(a.num_layers - n_moe, False),
                "final_norm": ones((a.hidden_size,)),
            }
            kd = 0
        else:
            kd = min(a.first_k_dense, a.num_layers) if a.num_experts else 0
            params = {
                "embed": w(a.vocab_size, a.hidden_size),
                "layers": make_layers(a.num_layers - kd,
                                      bool(a.num_experts)),
                "final_norm": ones((a.hidden_size,)),
            }
        if kd:
            params["dense_layers"] = make_layers(kd, False)
        if a.pos_embed_learned:
            params["embed_pos"] = w(
                a.max_position_embeddings + a.pos_offset, a.hidden_size)
        if a.embed_ln:
            params["embed_ln_w"] = ones((a.hidden_size,))
            params["embed_ln_b"] = w(a.hidden_size)
        if a.norm_type == "layernorm" and a.norm_bias:
            params["final_norm_b"] = w(a.hidden_size)
        if a.head_type == "cls":
            params["score"] = w(a.hidden_size, a.num_labels)
        elif a.head_type == "reward":
            params["score_w0"] = w(a.hidden_size, a.hidden_size)
            params["score_b0"] = w(a.hidden_size)
            params["score_w1"] = w(a.hidden_size, a.num_labels)
            params["score_b1"] = w(a.num_labels)
        if not a.tie_word_embeddings:
            params["lm_head"] = w(a.hidden_size, a.vocab_size)
            if a.lm_head_bias:
                params["lm_head_b"] = w(a.vocab_size)
        return params

    def init_params_int8(self, seed: int = 0) -> dict:
        """Random weights directly in int8 (synthetic benchmarking): skips
        the fp32-generate + quantize pass, which costs minutes for 8B on a
        small host."""
        from ..ops.quant import QuantizedWeight
        a = self.arch
        key_box = [jax.random.PRNGKey(seed)]

        def _randint8(shape):
            key_box[0], sub = jax.random.split(key_box[0])
            return jax.random.randint(sub, shape, -127, 128, jnp.int8)

        def qw(*shape):
            s = jnp.full(shape[:-2] + shape[-1:] if len(shape) >= 2
                         else shape, 0.02 / 127, jnp.float32)
            return QuantizedWeight(q=_randint8(shape), s=s)

        def emb(v, d):
            return QuantizedWeight(q=_randint8((v, d)),
                                   s=jnp.full((v,), 0.02 / 127,
                                              jnp.float32))

        qkv_out = (a.num_heads + 2 * a.num_kv_heads) * a.head_dim
        layers = {
            "wqkv": qw(a.num_layers, a.hidden_size, qkv_out),
            "wo": qw(a.num_layers, a.num_heads * a.head_dim, a.hidden_size),
            "w_gate_up": qw(a.num_layers, a.hidden_size,
                            2 * a.intermediate_size),
            "w_down": qw(a.num_layers, a.intermediate_size, a.hidden_size),
            "input_norm": jnp.ones((a.num_layers, a.hidden_size),
                                   self.dtype),
            "post_norm": jnp.ones((a.num_layers, a.hidden_size), self.dtype),
        }
        params = {
            "embed": emb(a.vocab_size, a.hidden_size),
            "layers": layers,
            "final_norm": jnp.ones((a.hidden_size,), self.dtype),
        }
        if not a.tie_word_embeddings:
            params["lm_head"] = qw(a.hidden_size, a.vocab_size)
        return params

    def init_params_int4(self, seed: int = 0) -> dict:
        """Random weights directly in packed int4 (synthetic benchmarking;
        layout per ops.pallas.int4_matmul.QuantizedWeight4).  The embed
        table stays per-row int8 (consumed by gather, not matmul)."""
        from ..ops.pallas.int4_matmul import (GROUP, QuantizedWeight4,
                                              pack_int4_scales)
        from ..ops.quant import QuantizedWeight
        a = self.arch
        key_box = [jax.random.PRNGKey(seed)]

        def _randi8(shape):
            key_box[0], sub = jax.random.split(key_box[0])
            return jax.random.randint(sub, shape, -128, 128, jnp.int8)

        def qw4(*shape):
            k_in, n_out = shape[-2], shape[-1]
            packed = shape[:-2] + (k_in // 2, n_out)
            # Tiny (test-sized) models shrink the group the same way
            # quantize_weight_int4 does, so the scale array is never
            # empty and group_of stays well-defined.
            group = GROUP
            while k_in % group:
                group //= 2
            gshape = shape[:-2] + (k_in // group, n_out)
            key_box[0], sub = jax.random.split(key_box[0])
            return pack_int4_scales(QuantizedWeight4(
                qp=jax.random.randint(sub, packed, 0, 256,
                                      jnp.int32).astype(jnp.uint8),
                s=jnp.full(gshape, 0.02 / 15, jnp.float32),
                z=jnp.full(gshape, 8.0, jnp.float32)))

        qkv_out = (a.num_heads + 2 * a.num_kv_heads) * a.head_dim
        layers = {
            "wqkv": qw4(a.num_layers, a.hidden_size, qkv_out),
            "wo": qw4(a.num_layers, a.num_heads * a.head_dim,
                      a.hidden_size),
            "w_gate_up": qw4(a.num_layers, a.hidden_size,
                             2 * a.intermediate_size),
            "w_down": qw4(a.num_layers, a.intermediate_size,
                          a.hidden_size),
            "input_norm": jnp.ones((a.num_layers, a.hidden_size),
                                   self.dtype),
            "post_norm": jnp.ones((a.num_layers, a.hidden_size),
                                  self.dtype),
        }
        params = {
            "embed": QuantizedWeight(
                q=_randi8((a.vocab_size, a.hidden_size)),
                s=jnp.full((a.vocab_size,), 0.02 / 127, jnp.float32)),
            "layers": layers,
            "final_norm": jnp.ones((a.hidden_size,), self.dtype),
        }
        if not a.tie_word_embeddings:
            params["lm_head"] = qw4(a.hidden_size, a.vocab_size)
        return params

    def load_hf_state_dict(self, tensors: dict[str, np.ndarray],
                           as_numpy: bool = False) -> dict:
        """Convert an HF Llama state dict (numpy arrays) into our fused,
        transposed layout.  Non-Llama-named families (GPT-NeoX/J, Falcon,
        Phi, InternLM2, Baichuan, StarCoder2) are first renamed/unpacked to
        the canonical Llama names by their arch's ``canonicalize_hf``."""
        a = self.arch
        if ("model.embed_tokens.weight" not in tensors
                and "embed_tokens.weight" in tensors):
            # Bare-trunk checkpoints (HF AutoModel: LlamaModel/MistralModel/
            # Qwen2Model embedding variants — reference registry.py maps
            # "*Model" to the same decoder impls) store weights without the
            # "model." prefix; normalize to the ForCausalLM layout.
            tensors = {k if k.startswith(("lm_head", "score", "v_head"))
                       else "model." + k: v for k, v in tensors.items()}
        tensors = a.canonicalize_hf(tensors)
        if a.attn_type == "mla":
            return self._load_hf_deepseek(tensors, as_numpy)

        def t(name):
            return np.asarray(tensors[name])

        def proj(name):
            # HF stores [out, in]; we want [in, out].
            return t(name).T

        # Phi-3 checkpoints ship the projections pre-fused.
        hf_fused = "model.layers.0.self_attn.qkv_proj.weight" in tensors

        def stack(xs):
            arr = np.stack(xs)
            return arr if as_numpy else jnp.asarray(arr, self.dtype)

        def leaf(x):
            return np.asarray(x) if as_numpy \
                else jnp.asarray(x, self.dtype)

        shared_prefix = "mlp.shared_experts." if a.moe_shared_plural \
            else "mlp.shared_expert."

        def collect(idxs, moe: bool) -> dict:
            wqkv, bqkv, wo, gate_up, down, router = [], [], [], [], [], []
            bo, b_gate_up, b_down = [], [], []
            ws_gu, ws_dn, ws_g = [], [], []
            res_n, wr_gu, wr_dn = [], [], []
            qn, kn, qnb, knb = [], [], [], []
            in_n, post_n, pao_n, pff_n = [], [], [], []
            in_nb, post_nb = [], []
            for i in idxs:
                p = f"model.layers.{i}."
                if moe:
                    if a.moe_hf_style == "qwen":
                        # Qwen2/3-MoE + DeepSeek-MoE: mlp.{gate,
                        # experts.N.gate/up/down_proj, shared_expert(s).*,
                        # shared_expert_gate}.
                        router.append(proj(p + "mlp.gate.weight"))
                        gate_up.append(np.stack([
                            np.concatenate([
                                proj(p +
                                     f"mlp.experts.{e}.gate_proj.weight"),
                                proj(p + f"mlp.experts.{e}.up_proj.weight"),
                            ], axis=1) for e in range(a.num_experts)]))
                        down.append(np.stack([
                            proj(p + f"mlp.experts.{e}.down_proj.weight")
                            for e in range(a.num_experts)]))
                    elif a.moe_hf_style == "granite":
                        # GraniteMoe: block_sparse_moe.{router.layer,
                        # input_linear [E, 2I, D] (chunk -> gate|up),
                        # output_linear [E, D, I]} (HF modeling_granitemoe).
                        router.append(proj(
                            p + "block_sparse_moe.router.layer.weight"))
                        il = t(p + "block_sparse_moe.input_linear.weight")
                        gate_up.append(np.transpose(il, (0, 2, 1)))
                        ol = t(p + "block_sparse_moe.output_linear.weight")
                        down.append(np.transpose(ol, (0, 2, 1)))
                    elif a.moe_hf_style == "aria":
                        # Aria (reference aria.py:283-338, :251-280):
                        # router_weight [E, D]; experts ship PRE-PACKED —
                        # fc1 [E, D, 2I] (gate | up halves: FusedMoE
                        # applies silu to the first half), fc2 [E, I, D].
                        router.append(t(p + "mlp.router_weight").T)
                        gate_up.append(t(p + "mlp.experts.fc1.weight"))
                        down.append(t(p + "mlp.experts.fc2.weight"))
                    else:
                        # Mixtral: block_sparse_moe.{gate,
                        # experts.N.w1/w2/w3} (w1 = gate, w3 = up,
                        # w2 = down).
                        router.append(proj(
                            p + "block_sparse_moe.gate.weight"))
                        gate_up.append(np.stack([
                            np.concatenate([
                                proj(p + f"block_sparse_moe.experts.{e}"
                                     ".w1.weight"),
                                proj(p + f"block_sparse_moe.experts.{e}"
                                     ".w3.weight"),
                            ], axis=1) for e in range(a.num_experts)]))
                        down.append(np.stack([
                            proj(p + f"block_sparse_moe.experts.{e}"
                                 ".w2.weight")
                            for e in range(a.num_experts)]))
                    wqkv.append(np.concatenate([
                        proj(p + "self_attn.q_proj.weight"),
                        proj(p + "self_attn.k_proj.weight"),
                        proj(p + "self_attn.v_proj.weight")], axis=1))
                    if a.moe_shared_intermediate:
                        ws_gu.append(np.concatenate([
                            proj(p + shared_prefix + "gate_proj.weight"),
                            proj(p + shared_prefix + "up_proj.weight")],
                            axis=1))
                        ws_dn.append(proj(
                            p + shared_prefix + "down_proj.weight"))
                        if a.moe_shared_gate:
                            ws_g.append(proj(
                                p + "mlp.shared_expert_gate.weight"))
                    if a.moe_parallel_residual:
                        # Arctic residual_mlp (hidden-width gated MLP,
                        # arctic.py:500-504: w13 <- w1|w3, w2).
                        res_n.append(t(p + "residual_layernorm.weight"))
                        wr_gu.append(np.concatenate([
                            proj(p + "residual_mlp.w1.weight"),
                            proj(p + "residual_mlp.w3.weight")], axis=1))
                        wr_dn.append(proj(p + "residual_mlp.w2.weight"))
                elif hf_fused:
                    wqkv.append(proj(p + "self_attn.qkv_proj.weight"))
                    gate_up.append(proj(p + "mlp.gate_up_proj.weight"))
                elif not a.mlp_gated:
                    wqkv.append(np.concatenate([
                        proj(p + "self_attn.q_proj.weight"),
                        proj(p + "self_attn.k_proj.weight"),
                        proj(p + "self_attn.v_proj.weight")], axis=1))
                    gate_up.append(proj(p + "mlp.up_proj.weight"))
                else:
                    wqkv.append(np.concatenate([
                        proj(p + "self_attn.q_proj.weight"),
                        proj(p + "self_attn.k_proj.weight"),
                        proj(p + "self_attn.v_proj.weight")], axis=1))
                    gate_up.append(np.concatenate([
                        proj(p + "mlp.gate_proj.weight"),
                        proj(p + "mlp.up_proj.weight")], axis=1))
                if a.qkv_bias:
                    bqkv.append(np.concatenate([
                        t(p + "self_attn.q_proj.bias"),
                        t(p + "self_attn.k_proj.bias"),
                        t(p + "self_attn.v_proj.bias")]))
                if a.o_bias:
                    bo.append(t(p + "self_attn.o_proj.bias"))
                if a.mlp_bias:
                    if a.mlp_gated:
                        b_gate_up.append(np.concatenate([
                            t(p + "mlp.gate_proj.bias"),
                            t(p + "mlp.up_proj.bias")]))
                    else:
                        b_gate_up.append(t(p + "mlp.up_proj.bias"))
                    b_down.append(t(p + "mlp.down_proj.bias"))
                elif a.mlp_down_bias:
                    b_down.append(t(p + "mlp.down_proj.bias"))
                if a.qk_norm or a.qk_norm_flat:
                    qn.append(t(p + "self_attn.q_norm.weight"))
                    kn.append(t(p + "self_attn.k_norm.weight"))
                if a.qk_norm and a.qk_norm_type == "layernorm":
                    qnb.append(t(p + "self_attn.q_norm.bias"))
                    knb.append(t(p + "self_attn.k_norm.bias"))
                wo.append(proj(p + "self_attn.o_proj.weight"))
                if not moe:
                    down.append(proj(p + "mlp.down_proj.weight"))
                in_n.append(t(p + "input_layernorm.weight"))
                if a.norm_type == "layernorm" and a.norm_bias:
                    in_nb.append(t(p + "input_layernorm.bias"))
                    if not a.shared_input_norm:
                        post_nb.append(t(
                            p + "post_attention_layernorm.bias"))
                if a.sandwich_norms:
                    pao_n.append(t(p + "post_attention_layernorm.weight"))
                    post_n.append(t(p + "pre_feedforward_layernorm"
                                    ".weight"))
                    pff_n.append(t(p + "post_feedforward_layernorm"
                                   ".weight"))
                elif not a.shared_input_norm:
                    post_n.append(t(p + "post_attention_layernorm.weight"))

            layers = {
                "wqkv": stack(wqkv),
                "wo": stack(wo),
                "w_gate_up": stack(gate_up),
                "w_down": stack(down),
                "input_norm": stack(in_n),
            }
            if post_n:
                layers["post_norm"] = stack(post_n)
            if a.qkv_bias:
                layers["bqkv"] = stack(bqkv)
            if a.o_bias:
                layers["bo"] = stack(bo)
            if a.mlp_bias:
                layers["b_gate_up"] = stack(b_gate_up)
                layers["b_down"] = stack(b_down)
            elif a.mlp_down_bias:
                layers["b_down"] = stack(b_down)
            if in_nb:
                layers["input_norm_b"] = stack(in_nb)
            if post_nb:
                layers["post_norm_b"] = stack(post_nb)
            if a.qk_norm or a.qk_norm_flat:
                layers["q_norm"] = stack(qn)
                layers["k_norm"] = stack(kn)
            if qnb:
                layers["q_norm_b"] = stack(qnb)
                layers["k_norm_b"] = stack(knb)
            if moe:
                layers["router"] = stack(router)
                if a.moe_shared_intermediate:
                    layers["ws_gate_up"] = stack(ws_gu)
                    layers["ws_down"] = stack(ws_dn)
                    if a.moe_shared_gate:
                        layers["ws_gate"] = stack(ws_g)
                if res_n:
                    layers["res_norm"] = stack(res_n)
                    layers["wr_gate_up"] = stack(wr_gu)
                    layers["wr_down"] = stack(wr_dn)
            if a.sandwich_norms:
                layers["post_attn_out_norm"] = stack(pao_n)
                layers["post_ffw_norm"] = stack(pff_n)
            return layers

        if a.num_experts and a.moe_layer_frequency == 2:
            # Arctic alternating pattern: MoE layers are the odd indices
            # ((i+1) % 2 == 0, arctic.py:307), dense the even.
            moe_idx = range(1, a.num_layers, 2)
            dense_idx = range(0, a.num_layers, 2)
            params = {
                "embed": leaf(t("model.embed_tokens.weight")),
                "layers": collect(moe_idx, True),
                "dense_layers": collect(dense_idx, False),
                "final_norm": leaf(t("model.norm.weight")),
            }
            kd = 0
        else:
            kd = min(a.first_k_dense, a.num_layers) if a.num_experts else 0
            params = {
                "embed": leaf(t("model.embed_tokens.weight")),
                "layers": collect(range(kd, a.num_layers),
                                  bool(a.num_experts)),
                "final_norm": leaf(t("model.norm.weight")),
            }
            if kd:
                params["dense_layers"] = collect(range(kd), False)
        if a.pos_embed_learned:
            params["embed_pos"] = leaf(t("model.embed_pos.weight"))
        if a.embed_ln:
            params["embed_ln_w"] = leaf(t("model.embed_ln.weight"))
            params["embed_ln_b"] = leaf(t("model.embed_ln.bias"))
        if a.norm_type == "layernorm" and a.norm_bias:
            params["final_norm_b"] = leaf(t("model.norm.bias"))
        if a.head_type == "cls":
            params["score"] = leaf(proj("score.weight"))
        elif a.head_type == "reward":
            params["score_w0"] = leaf(proj("score.0.weight"))
            params["score_b0"] = leaf(t("score.0.bias"))
            params["score_w1"] = leaf(proj("score.2.weight"))
            params["score_b1"] = leaf(t("score.2.bias"))
        if not a.tie_word_embeddings:
            if "lm_head.weight" not in tensors:
                # Pooling-task and bare-trunk embedding checkpoints ship no
                # lm_head; fall back to tied embeddings (the head / pooled
                # hidden replaces it functionally).
                params["lm_head"] = leaf(t("model.embed_tokens.weight").T)
            else:
                params["lm_head"] = leaf(t("lm_head.weight").T)
                if a.lm_head_bias:
                    params["lm_head_b"] = leaf(t("lm_head.bias"))
        return params

    # ---- forward --------------------------------------------------------

    def forward_hidden(
        self, params: dict, token_ids: jnp.ndarray,
        positions: jnp.ndarray,
        attn_fn: Callable,
        attn_state: Any = None,
        lora: Any = None,
        lora_idx: Any = None,
        state_mode: str = "scan",
        input_embeds: Any = None,
    ):
        """token_ids/positions [T] -> (hidden [T, D], new_attn_state).

        ``input_embeds`` [T, D]: pre-built (and pre-scaled) hidden inputs —
        the multimodal path splices projected image features over the
        placeholder span and bypasses token embedding.

        ``lora``: optional adapter stacks from lora.manager.empty_lora_params
        (leaves [L, S, ...]); ``lora_idx``: adapter slot per token ([T]) or
        for the whole call (scalar).  Slot 0 is the zero adapter.

        The transformer stack is a ``lax.scan`` over the stacked layer
        parameters: one layer is traced/compiled regardless of depth —
        essential for compile latency (remote XLA compiles) and what keeps
        the step programs small.

        ``attn_fn(q, k, v, layer_state) -> (attn_out, new_layer_state)``
        receives post-rope q [T, H, d], k/v [T, Hkv, d] and the per-layer
        slice of ``attn_state`` (a pytree whose leaves have a leading
        num_layers axis — e.g. the stacked KV cache).  Pass
        ``attn_state=None`` for stateless attention (full-context oracle).

        ``state_mode`` controls how ``attn_state`` threads through the
        layer scan:

        - "scan" (default): state leaves are scanned over their leading
          layer axis; attn_fn sees only its layer's slice.  XLA
          materializes the slice (a copy) — fine for small state or
          prefill where the copy amortizes over many tokens.
        - "carry": the WHOLE state is the scan carry and
          ``attn_fn(q, k, v, state, layer_idx)`` receives it plus the
          layer index.  In-place kernels (Pallas aliased input/output,
          e.g. ops.pallas.fused_decode) then update multi-GiB KV pools
          with zero copies — the decode hot path.
        """
        a = self.arch
        if input_embeds is not None:
            h = input_embeds
        else:
            h = self.embed(params, token_ids)
            if a.embed_scale is not None:
                # Gemma normalizer: cast to model dtype first (HF rounds
                # the sqrt(hidden) constant to bf16 before multiplying).
                h = h * jnp.asarray(a.embed_scale, self.dtype)
        if a.pos_embed_learned:
            h = h + params["embed_pos"][positions + a.pos_offset]
        if a.embed_ln:
            # Bloom word_embeddings_layernorm.
            h = layer_norm(h, params["embed_ln_w"], params["embed_ln_b"],
                           a.rms_norm_eps)
        h, new_state = self.forward_layers(params, h, positions, attn_fn,
                                           attn_state, lora, lora_idx,
                                           state_mode)
        if a.norm_type == "layernorm":
            return layer_norm(h, params["final_norm"],
                              params.get("final_norm_b"),
                              a.rms_norm_eps, a.norm_unit_offset), new_state
        return rms_norm(h, params["final_norm"], a.rms_norm_eps,
                        a.norm_unit_offset), new_state

    def forward_layers(
        self, params: dict, h: jnp.ndarray, positions: jnp.ndarray,
        attn_fn: Callable,
        attn_state: Any = None,
        lora: Any = None,
        lora_idx: Any = None,
        state_mode: str = "scan",
    ):
        """The decoder stack WITHOUT embedding and final norm: hidden
        states in, hidden states out.  The number of layers run is the
        leading axis of ``params["layers"]`` — a pipeline stage passes its
        local slice (parallel/pipeline.py) and carry-mode layer indices
        are local to that slice."""
        a = self.arch
        if a.use_rope:
            if a.mrope_section is not None and positions.ndim == 2:
                # Qwen2-VL multimodal prompts carry [3, T] t/h/w streams;
                # 1D positions (text-only / decode with the per-seq delta)
                # fall through to standard rope, which M-RoPE equals when
                # the three streams coincide.
                from ..ops.rope import mrope_cos_sin
                cos, sin = mrope_cos_sin(positions, a.rot_dim,
                                         a.rope_theta, a.mrope_section)
            else:
                cos, sin = rope_cos_sin(positions, a.rot_dim, a.rope_theta,
                                        scaling=a.rope_scaling,
                                        interleaved=a.rope_interleaved)
        else:
            cos = sin = None           # ALiBi / learned-position models
        q_sz = a.num_heads * a.head_dim
        kv_sz = a.num_kv_heads * a.head_dim
        t = h.shape[0]
        num_layers = jax.tree.leaves(params["layers"])[0].shape[0]
        act = _ACTS.get(a.hidden_act)    # None for "gegelu" (special-cased)
        norm = functools.partial(rms_norm, eps=a.rms_norm_eps,
                                 unit_offset=a.norm_unit_offset)

        if lora is not None:
            lora_scale = lora["scale"]
            lora_layers = {k: v for k, v in lora.items() if k != "scale"}
            lidx = jnp.asarray(lora_idx, jnp.int32)
            lora_on = True
        else:
            lora_layers = None
            lora_on = False

        def layer_body(h, lp, ll, state, layer_idx=None, rope_li=None):

            def with_lora(y, name, x):
                if not lora_on or f"A_{name}" not in ll:
                    return y
                from ..lora.models import lora_delta
                return y + lora_delta(x, ll[f"A_{name}"], ll[f"B_{name}"],
                                      lidx, lora_scale)

            def lnorm(y, name):
                if a.norm_type == "layernorm":
                    return layer_norm(y, lp[name],
                                      lp.get(name + "_b"), a.rms_norm_eps,
                                      a.norm_unit_offset)
                return norm(y, lp[name])

            # OLMo2 post-norm: sublayers read the raw residual stream and
            # their OUTPUTS are normalized before the residual add (HF
            # modeling_olmo2.Olmo2DecoderLayer).
            x = h if a.postnorm else lnorm(h, "input_norm")
            if a.attn_type == "mla":
                # DeepSeek multi-head latent attention (HF
                # modeling_deepseek_v2.DeepseekV2Attention): low-rank
                # q (optional) and kv; per-head K = [nope | shared roped
                # k_pe]; V materialized from the latent and zero-padded
                # to head_dim for the shared paged-cache layout.
                nope, rot = a.qk_nope_head_dim, a.qk_rope_head_dim
                if a.q_lora_rank:
                    qa = rms_norm(matmul(x, lp["wq_a"]), lp["q_a_norm"],
                                  a.rms_norm_eps)
                    q = matmul(qa, lp["wq_b"])
                else:
                    q = matmul(x, lp["wq"])
                q = q.reshape(t, a.num_heads, a.head_dim)
                ckv = matmul(x, lp["w_kv_a"])          # [T, d_c + rot]
                latent = rms_norm(ckv[:, :a.kv_lora_rank],
                                  lp["kv_a_norm"], a.rms_norm_eps)
                kvb = matmul(latent, lp["w_kv_b"]).reshape(
                    t, a.num_heads, nope + a.v_head_dim)
                q_pe, k_pe = apply_rope(
                    q[..., nope:], ckv[:, None, a.kv_lora_rank:],
                    cos, sin, interleaved=a.rope_interleaved)
                q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)
                k = jnp.concatenate(
                    [kvb[..., :nope],
                     jnp.broadcast_to(k_pe, (t, a.num_heads, rot))],
                    axis=-1)
                v = jnp.concatenate(
                    [kvb[..., nope:],
                     jnp.zeros((t, a.num_heads, a.head_dim - a.v_head_dim),
                               kvb.dtype)], axis=-1)
            else:
                qkv = with_lora(matmul(x, lp["wqkv"]), "wqkv", x)
                if a.qkv_bias:
                    qkv = qkv + lp["bqkv"]
                q2d = qkv[:, :q_sz]
                k2d = qkv[:, q_sz:q_sz + kv_sz]
                v2d = qkv[:, q_sz + kv_sz:]
                if a.qk_norm_flat:
                    # OLMo2/OLMoE: RMSNorm over the whole projection,
                    # pre-reshape.
                    q2d = rms_norm(q2d, lp["q_norm"], a.rms_norm_eps)
                    k2d = rms_norm(k2d, lp["k_norm"], a.rms_norm_eps)
                if a.qkv_clip is not None:
                    # OLMo/DBRX clip_qkv (no qk norms: same as clipping
                    # the fused projection); OLMoE clamps AFTER its flat
                    # q/k norms (HF modeling_olmoe.OlmoeAttention).
                    q2d = jnp.clip(q2d, -a.qkv_clip, a.qkv_clip)
                    k2d = jnp.clip(k2d, -a.qkv_clip, a.qkv_clip)
                    v2d = jnp.clip(v2d, -a.qkv_clip, a.qkv_clip)
                q = q2d.reshape(t, a.num_heads, a.head_dim)
                k = k2d.reshape(t, a.num_kv_heads, a.head_dim)
                v = v2d.reshape(t, a.num_kv_heads, a.head_dim)
                if a.qk_norm:
                    # Qwen3: per-head RMSNorm on q/k BEFORE rope (HF
                    # Qwen3Attention applies q_norm/k_norm to head_dim);
                    # Persimmon uses a per-head LayerNorm with bias.
                    if a.qk_norm_type == "layernorm":
                        q = layer_norm(q, lp["q_norm"], lp["q_norm_b"],
                                       a.rms_norm_eps)
                        k = layer_norm(k, lp["k_norm"], lp["k_norm_b"],
                                       a.rms_norm_eps)
                    else:
                        q = rms_norm(q, lp["q_norm"], a.rms_norm_eps)
                        k = rms_norm(k, lp["k_norm"], a.rms_norm_eps)
                if a.use_rope:
                    q_r, k_r = apply_rope(q, k, cos, sin, rot_dim=a.rot_dim,
                                          interleaved=a.rope_interleaved)
                    if a.no_rope_pattern:
                        # Cohere2: every p-th layer is global attention
                        # WITHOUT positional encoding (commandr.py:223).
                        li = rope_li if rope_li is not None else layer_idx
                        on = ((li + 1) % a.no_rope_pattern) != 0
                        q = jnp.where(on, q_r, q)
                        k = jnp.where(on, k_r, k)
                    else:
                        q, k = q_r, k_r
            if layer_idx is None:
                attn_out, new_state = attn_fn(q, k, v, state)
            else:
                attn_out, new_state = attn_fn(q, k, v, state, layer_idx)
            if a.attn_type == "mla":
                attn2d = attn_out[..., :a.v_head_dim].reshape(
                    t, a.num_heads * a.v_head_dim)
            else:
                attn2d = attn_out.reshape(t, q_sz)
            attn_res = with_lora(matmul(attn2d, lp["wo"]), "wo", attn2d)
            if a.o_bias:
                attn_res = attn_res + lp["bo"]
            if a.sandwich_norms:
                attn_res = norm(attn_res, lp["post_attn_out_norm"])
            if a.postnorm:
                attn_res = lnorm(attn_res, "input_norm")
            if a.residual_multiplier != 1.0:
                attn_res = attn_res * a.residual_multiplier

            if a.parallel_residual:
                # GPT-NeoX/J, Falcon, Phi, Cohere: attention and MLP read
                # the same (or sibling-normed) input; one residual add.
                x = x if a.shared_input_norm else lnorm(h, "post_norm")
            else:
                h_in = h               # pre-attention layer input
                h = h + attn_res
                x = h if a.postnorm else lnorm(h, "post_norm")
            if "router" in lp and "wr_gate_up" in lp:
                # Arctic use_residual (arctic.py:350-359): the MoE branch
                # reads the normed LAYER INPUT, not the post-attention
                # stream.
                x = lnorm(h_in, "post_norm")
            if "router" in lp:
                # Routing (HF MixtralSparseMoeBlock: topk then softmax;
                # Qwen2/3-MoE + DeepSeek: softmax over ALL logits then
                # topk, optional renorm / group limiting / routed
                # scaling), dense expert compute.
                router_logits = (x @ lp["router"]).astype(jnp.float32)
                if a.moe_routing == "noaux_tc":
                    # DeepSeek V3 (HF DeepseekV3TopkRouter): sigmoid
                    # scores; selection by bias-corrected scores with
                    # top-2-sum group limiting; weights are the UNcorrected
                    # scores of the selected experts, renormalized.
                    scores = jax.nn.sigmoid(router_logits)
                    choice = scores + lp["e_corr_bias"].astype(jnp.float32)
                    g = a.moe_n_group
                    pg = choice.reshape(*choice.shape[:-1], g, -1)
                    g2, _ = jax.lax.top_k(pg, min(2, pg.shape[-1]))
                    gscore = jnp.sum(g2, axis=-1)
                    gtop, _ = jax.lax.top_k(gscore, a.moe_topk_group)
                    gmask = gscore >= gtop[..., -1:]
                    choice = jnp.where(
                        jnp.repeat(gmask, choice.shape[-1] // g, axis=-1),
                        choice, 0.0)
                    _, topi = jax.lax.top_k(choice, a.num_experts_per_tok)
                    rw = jnp.take_along_axis(scores, topi, axis=-1)
                    if a.moe_norm_topk:
                        rw = rw / (jnp.sum(rw, axis=-1, keepdims=True)
                                   + 1e-20)
                    rw = rw * a.moe_routed_scaling
                elif a.moe_routing == "sparsemixer":
                    # PhiMoE inference-time sparsemixer (HF
                    # modeling_phimoe.sparsemixer, training=False): pick
                    # argmax, weight = softmax over the near-max set
                    # ((max - s)/max(|s|, max) <= 2*jitter_eps); mask the
                    # winner out and repeat for the second expert.
                    eps2 = 2.0 * a.moe_jitter_eps
                    ninf = jnp.float32(-jnp.inf)

                    def pick(sel_from, ref_scores):
                        m = jnp.max(sel_from, axis=-1, keepdims=True)
                        e = jnp.argmax(sel_from, axis=-1)
                        factor = jnp.maximum(jnp.abs(ref_scores), m)
                        far = (m - ref_scores) / factor > eps2
                        g = jax.nn.softmax(
                            jnp.where(far, ninf, sel_from), axis=-1)
                        w_ = jnp.take_along_axis(g, e[..., None],
                                                 axis=-1)
                        return e, w_

                    e1, w1 = pick(router_logits, router_logits)
                    masked = jnp.where(
                        jax.nn.one_hot(e1, a.num_experts, dtype=bool),
                        ninf, router_logits)
                    e2, w2 = pick(masked, router_logits)
                    topi = jnp.stack([e1, e2], axis=-1)
                    rw = jnp.concatenate([w1, w2], axis=-1)
                elif a.moe_routing == "softmax_topk":
                    probs = jax.nn.softmax(router_logits, axis=-1)
                    if a.moe_topk_method == "group_limited_greedy":
                        # DeepSeek V2: keep only the top `topk_group`
                        # device groups (by max score within the group)
                        # before the expert top-k.
                        g = a.moe_n_group
                        pg = probs.reshape(*probs.shape[:-1], g, -1)
                        gscore = jnp.max(pg, axis=-1)
                        gtop, _ = jax.lax.top_k(gscore, a.moe_topk_group)
                        gmask = gscore >= gtop[..., -1:]
                        probs = jnp.where(
                            jnp.repeat(gmask, probs.shape[-1] // g,
                                       axis=-1), probs, 0.0)
                    rw, topi = jax.lax.top_k(probs, a.num_experts_per_tok)
                else:
                    topv, topi = jax.lax.top_k(router_logits,
                                               a.num_experts_per_tok)
                    rw = jax.nn.softmax(topv, axis=-1)
                if a.moe_routing != "noaux_tc":   # noaux applied its own
                    if a.moe_norm_topk:
                        rw = rw / jnp.sum(rw, axis=-1, keepdims=True)
                    if a.moe_routed_scaling != 1.0:
                        rw = rw * a.moe_routed_scaling
                combine = jnp.sum(
                    jax.nn.one_hot(topi, a.num_experts, dtype=jnp.float32)
                    * rw[..., None], axis=1)                  # [T, E]
                gu = jnp.einsum("td,edf->etf", x, lp["w_gate_up"])
                gate = gu[..., :a.moe_inter]
                up = gu[..., a.moe_inter:]
                h_e = jnp.einsum("etf,efd->etd", act(gate) * up,
                                 lp["w_down"])
                mlp_res = jnp.einsum("etd,te->td",
                                     h_e.astype(jnp.float32),
                                     combine).astype(x.dtype)
                if a.moe_shared_intermediate:
                    # Qwen-MoE shared expert: a dense gated MLP whose
                    # output is sigmoid-gated by its own router logit.
                    sgu = matmul(x, lp["ws_gate_up"])
                    si = a.moe_shared_intermediate
                    s_out = matmul(act(sgu[:, :si]) * sgu[:, si:],
                                   lp["ws_down"])
                    if a.moe_shared_gate:
                        s_out = s_out * jax.nn.sigmoid(
                            (x @ lp["ws_gate"]).astype(jnp.float32)
                        ).astype(x.dtype)
                    mlp_res = mlp_res + s_out
                if "wr_gate_up" in lp:
                    # Arctic residual_mlp: hidden-width gated SiLU MLP on
                    # the post-attention stream, summed with the MoE out.
                    rm_in = lnorm(h, "res_norm")
                    rgu = matmul(rm_in, lp["wr_gate_up"])
                    rm = matmul(act(rgu[:, :a.hidden_size])
                                * rgu[:, a.hidden_size:], lp["wr_down"])
                    mlp_res = mlp_res + rm
            else:
                gate_up = with_lora(matmul(x, lp["w_gate_up"]),
                                    "w_gate_up", x)
                if a.mlp_bias:
                    gate_up = gate_up + lp["b_gate_up"]
                if a.mlp_gated:
                    gate = gate_up[:, :a.intermediate_size]
                    up = gate_up[:, a.intermediate_size:]
                    if a.hidden_act == "gegelu":
                        # Phi-3-small gegelu (phi3_small.py:63-75): the
                        # fused up_proj interleaves (gelu, linear) halves
                        # (de-interleaved at load); quick-gelu of the
                        # clamped gate times (clamped linear + 1).
                        lim = a.gegelu_limit
                        g = gate if lim is None else jnp.minimum(gate, lim)
                        u = up if lim is None else jnp.clip(up, -lim, lim)
                        gated = (g * jax.nn.sigmoid(1.702 * g)) * (u + 1.0)
                    else:
                        gated = act(gate) * up
                else:
                    gated = act(gate_up)
                mlp_res = with_lora(matmul(gated, lp["w_down"]),
                                    "w_down", gated)
                if a.mlp_bias or a.mlp_down_bias:
                    mlp_res = mlp_res + lp["b_down"]
            if a.sandwich_norms:
                mlp_res = norm(mlp_res, lp["post_ffw_norm"])
            if a.postnorm:
                mlp_res = lnorm(mlp_res, "post_norm")
            if a.residual_multiplier != 1.0:
                mlp_res = mlp_res * a.residual_multiplier
            if a.parallel_residual:
                h = h + attn_res + mlp_res
            else:
                h = h + mlp_res
            return h, new_state

        if a.num_experts and a.moe_layer_frequency == 2:
            return self._forward_interleaved(params, h, attn_state,
                                             layer_body, state_mode,
                                             lora)

        # Heterogeneous stacks (DeepSeek-MoE first_k_dense_replace): the
        # dense prefix and the MoE body have different per-layer param
        # structures, so each gets its own lax.scan; one layer of each
        # kind is traced regardless of depth.
        stacks = [params["layers"]]
        if "dense_layers" in params:
            assert lora is None, \
                "LoRA with a dense-prefix (DeepSeek-MoE) stack is " \
                "unsupported"
            stacks = [params["dense_layers"], params["layers"]]

        if state_mode == "carry":
            carry = (h, attn_state)
            off = 0
            for stack in stacks:
                n = jax.tree.leaves(stack)[0].shape[0]
                ll = lora_layers if len(stacks) == 1 else None
                small, big = _split_int4_stack(stack)
                o = off

                def layer_fn(carry, xs, big=big, o=o):
                    h, state = carry
                    lp, ll, li = xs
                    lp = _merge_int4_views(lp, big, li - o)
                    h, state = layer_body(h, lp, ll, state, li)
                    return (h, state), None

                carry, _ = jax.lax.scan(
                    layer_fn, carry,
                    (small, ll, jnp.arange(off, off + n, dtype=jnp.int32)))
                off += n
            h, new_state = carry
        else:
            if len(stacks) == 1:
                small, big = _split_int4_stack(params["layers"])

                def layer_fn(h, xs, big=big):
                    lp, ll, state, li = xs
                    lp = _merge_int4_views(lp, big, li)
                    return layer_body(h, lp, ll, state, rope_li=li)

                h, new_state = jax.lax.scan(
                    layer_fn, h,
                    (small, lora_layers, attn_state,
                     jnp.arange(num_layers, dtype=jnp.int32)))
            else:
                def layer_fn(h, xs):
                    lp, ll, state, li = xs
                    return layer_body(h, lp, ll, state, rope_li=li)

                nd = jax.tree.leaves(stacks[0])[0].shape[0]
                nm = jax.tree.leaves(stacks[1])[0].shape[0]
                s_dense = jax.tree.map(lambda x: x[:nd], attn_state)
                s_moe = jax.tree.map(lambda x: x[nd:], attn_state)
                h, ns_d = jax.lax.scan(
                    layer_fn, h,
                    (stacks[0], None, s_dense,
                     jnp.arange(nd, dtype=jnp.int32)))
                h, ns_m = jax.lax.scan(
                    layer_fn, h,
                    (stacks[1], None, s_moe,
                     jnp.arange(nd, nd + nm, dtype=jnp.int32)))
                new_state = jax.tree.map(
                    lambda a_, b_: jnp.concatenate([a_, b_], axis=0),
                    ns_d, ns_m)
        return h, new_state

    def _forward_interleaved(self, params, h, attn_state, layer_body,
                             state_mode, lora):
        """Alternating dense/MoE stacks (Arctic moe_layer_frequency=2,
        arctic.py:307): scan over (dense, MoE) layer PAIRS — one pair is
        traced regardless of depth — with an unpaired trailing dense layer
        when the layer count is odd.  Global layer indices: pair i maps to
        layers 2i (dense) and 2i+1 (MoE)."""
        assert lora is None, \
            "LoRA is unsupported with alternating dense/MoE stacks"
        dl, ml = params["dense_layers"], params["layers"]
        np_ = jax.tree.leaves(ml)[0].shape[0]
        tail = jax.tree.leaves(dl)[0].shape[0] - np_
        dl_pairs = jax.tree.map(lambda x: x[:np_], dl)

        if state_mode == "carry":
            def pair_fn(carry, xs):
                hh, state = carry
                lpd, lpm, i = xs
                hh, state = layer_body(hh, lpd, None, state, 2 * i)
                hh, state = layer_body(hh, lpm, None, state, 2 * i + 1)
                return (hh, state), None

            (h, new_state), _ = jax.lax.scan(
                pair_fn, (h, attn_state),
                (dl_pairs, ml, jnp.arange(np_, dtype=jnp.int32)))
            if tail:
                h, new_state = layer_body(
                    h, jax.tree.map(lambda x: x[np_], dl), None,
                    new_state, jnp.int32(2 * np_))
            return h, new_state

        # scan mode: per-layer state slices interleave even (dense) / odd
        # (MoE) along the layer axis.
        s_d = jax.tree.map(lambda x: x[0:2 * np_:2], attn_state)
        s_m = jax.tree.map(lambda x: x[1:2 * np_:2], attn_state)

        def pair_fn(hh, xs):
            lpd, lpm, sd, sm, i = xs
            hh, nsd = layer_body(hh, lpd, None, sd, rope_li=2 * i)
            hh, nsm = layer_body(hh, lpm, None, sm, rope_li=2 * i + 1)
            return hh, (nsd, nsm)

        h, (ns_d, ns_m) = jax.lax.scan(
            pair_fn, h,
            (dl_pairs, ml, s_d, s_m, jnp.arange(np_, dtype=jnp.int32)))
        new_state = jax.tree.map(
            lambda d_, m_: jnp.stack([d_, m_], 1).reshape(
                (2 * np_,) + d_.shape[1:]), ns_d, ns_m)
        if tail:
            h, ns_t = layer_body(
                h, jax.tree.map(lambda x: x[np_], dl), None,
                jax.tree.map(lambda x: x[2 * np_], attn_state),
                rope_li=2 * np_)
            new_state = jax.tree.map(
                lambda ab, t_: jnp.concatenate([ab, t_[None]], 0),
                new_state, ns_t)
        return h, new_state

    def embed(self, params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
        e = params["embed"]
        if isinstance(e, QuantizedWeight):
            # embed quantized per-row: q [V, D] int8, s [V].
            return (e.q[token_ids].astype(self.dtype)
                    * e.s[token_ids][..., None].astype(self.dtype))
        return e[token_ids]

    def logits(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.arch.tie_word_embeddings:
            e = params["embed"]
            if isinstance(e, QuantizedWeight):
                y = jnp.dot(hidden, e.q.T.astype(hidden.dtype),
                            preferred_element_type=jnp.float32)
                y = (y * e.s).astype(hidden.dtype)
            else:
                y = hidden @ e.T
        else:
            y = matmul(hidden, params["lm_head"])
        if self.arch.lm_head_bias:
            y = y + params["lm_head_b"]
        if self.arch.logit_scale is not None:
            # Cohere applies the scale to fp32 logits.
            y = (y.astype(jnp.float32) * self.arch.logit_scale).astype(
                y.dtype)
        cap = self.arch.final_logit_softcap
        if cap is not None:
            y = (cap * jnp.tanh(y.astype(jnp.float32) / cap)).astype(y.dtype)
        if self.arch.suppress_tokens:
            # Phi-3-small dummy_token_indices: unused tiktoken slots are
            # forced to -inf (phi3_small.py:436-440).
            y = y.at[..., jnp.asarray(self.arch.suppress_tokens)].set(
                jnp.finfo(jnp.float32).min)
        return y

    def head_forward(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        """Pooling-task head on final hidden states [*, D] -> [*, num_labels]
        (reference qwen2_cls.py score RowParallelLinear; qwen2_rm.py score
        Sequential(Linear, ReLU, Linear))."""
        a = self.arch
        h = hidden.astype(jnp.float32)
        if a.head_type == "cls":
            return h @ params["score"].astype(jnp.float32)
        if a.head_type == "reward":
            x = jnp.maximum(
                h @ params["score_w0"].astype(jnp.float32)
                + params["score_b0"].astype(jnp.float32), 0.0)
            return (x @ params["score_w1"].astype(jnp.float32)
                    + params["score_b1"].astype(jnp.float32))
        raise ValueError(f"model has no pooling head (head_type="
                         f"{a.head_type!r})")

    # ---- sizing ---------------------------------------------------------

    def param_bytes(self) -> int:
        a = self.arch
        itemsize = jnp.dtype(self.dtype).itemsize
        per_layer = (a.hidden_size * (a.num_heads + 2 * a.num_kv_heads)
                     * a.head_dim
                     + a.num_heads * a.head_dim * a.hidden_size
                     + 3 * a.hidden_size * a.intermediate_size
                     + 2 * a.hidden_size)
        emb = a.vocab_size * a.hidden_size
        total = emb * (1 if a.tie_word_embeddings else 2) \
            + a.num_layers * per_layer + a.hidden_size
        return total * itemsize

    def kv_bytes_per_token(self, kv_dtype=jnp.bfloat16) -> int:
        a = self.arch
        return (2 * a.num_kv_heads * a.head_dim * a.num_layers
                * jnp.dtype(kv_dtype).itemsize)
