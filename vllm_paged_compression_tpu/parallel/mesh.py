"""Device mesh + sharding specs: tensor/data parallelism via GSPMD.

TPU-native replacement for the reference's distributed stack
(vllm/distributed/parallel_state.py GroupCoordinator + pynccl +
custom_all_reduce + shm_broadcast, SURVEY C10/C11): a single-controller JAX
program annotates weights, KV pages, and batch arrays with NamedShardings
over a ("data", "model") mesh and lets XLA insert the collectives over ICI.
The megatron TP pattern (vllm/model_executor/layers/linear.py:252,391,635,963)
maps to:

- column-parallel (qkv, gate/up):  out-features on "model"
- row-parallel (o_proj, down):     in-features on "model" (psum fused by XLA)
- vocab-parallel embed / lm_head:  vocab dim on "model"
- KV pages:                        kv-head axis on "model"
- decode batch arrays:             batch axis on "data"
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(tensor_parallel: int = 1, data_parallel: int = 1,
               pipeline_parallel: int = 1, devices=None) -> Mesh:
    """("data", "pipe", "model") mesh.  "pipe" is placed between data and
    model so TP collectives ride the fastest (innermost) axis and stage
    hops cross it once per microbatch tick."""
    devices = devices if devices is not None else jax.devices()
    need = tensor_parallel * data_parallel * pipeline_parallel
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices (tp={tensor_parallel} x "
            f"dp={data_parallel} x pp={pipeline_parallel}), "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(
        data_parallel, pipeline_parallel, tensor_parallel)
    return Mesh(grid, axis_names=("data", "pipe", "model"))


# ---- parameter shardings -------------------------------------------------

_LLAMA_PARAM_SPECS = {
    "embed": P("model", None),
    "final_norm": P(None),
    "lm_head": P(None, "model"),
    "layers": {
        "wqkv": P(None, None, "model"),
        "bqkv": P(None, "model"),
        "wo": P(None, "model", None),
        "bo": P(None, None),
        "w_gate_up": P(None, None, "model"),
        "w_down": P(None, "model", None),
        "b_gate_up": P(None, "model"),
        "b_down": P(None, None),
        "router": P(None, None, None),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "input_norm": P(None, None),
        "post_norm": P(None, None),
        "input_norm_b": P(None, None),
        "post_norm_b": P(None, None),
        "post_attn_out_norm": P(None, None),
        "post_ffw_norm": P(None, None),
        # Qwen-MoE shared expert (dense, column/row-parallel like the MLP)
        "ws_gate_up": P(None, None, "model"),
        "ws_down": P(None, "model", None),
        "ws_gate": P(None, None, None),
        # MLA (DeepSeek): head-spanning projections shard over "model";
        # the shared low-rank latents replicate.
        "wq": P(None, None, "model"),
        "wq_a": P(None, None, None),
        "q_a_norm": P(None, None),
        "wq_b": P(None, None, "model"),
        "w_kv_a": P(None, None, None),
        "kv_a_norm": P(None, None),
        "w_kv_b": P(None, None, "model"),
    },
}
_LLAMA_PARAM_SPECS["dense_layers"] = _LLAMA_PARAM_SPECS["layers"]

_OPT_PARAM_SPECS = {
    "embed": P("model", None),
    "embed_pos": P(None, None),
    "final_ln_w": P(None),
    "final_ln_b": P(None),
    "layers": {
        "wqkv": P(None, None, "model"),
        "bqkv": P(None, "model"),
        "wo": P(None, "model", None),
        "bo": P(None, None),
        "attn_ln_w": P(None, None), "attn_ln_b": P(None, None),
        "fc1_w": P(None, None, "model"), "fc1_b": P(None, "model"),
        "fc2_w": P(None, "model", None), "fc2_b": P(None, None),
        "final_ln_w": P(None, None), "final_ln_b": P(None, None),
    },
}

# Mamba (state-space) TP: shard the d_inner axis over "model" — in_proj /
# conv / dt / A / D / gates are column-parallel, x_proj and out_proj are
# row-parallel (GSPMD inserts the psum), and the per-sequence conv/SSM
# state slots shard their feature axis so recurrent state never crosses
# chips.  The reference runs Mamba under megatron TP the same way
# (vllm/model_executor/models/mamba.py MambaMixer with Column/Row
# ParallelLinear).
_MAMBA_PARAM_SPECS = {
    "embed": P("model", None),
    "final_norm": P(None),
    "lm_head": P(None, "model"),
    "layers": {
        "in_proj": P(None, None, "model"),
        "conv_w": P(None, None, "model"),
        "conv_b": P(None, "model"),
        "x_proj": P(None, "model", None),
        "dt_w": P(None, None, "model"),
        "dt_b": P(None, "model"),
        "A_log": P(None, "model", None),
        "Dskip": P(None, "model"),
        "out_proj": P(None, "model", None),
        "norm": P(None, None),
        # FalconMamba/Jamba dt/b/c norm weights are tiny; replicate.
        "dt_norm": P(None, None),
        "b_norm": P(None, None),
        "c_norm": P(None, None),
    },
}

PARAM_SPECS = {"llama": _LLAMA_PARAM_SPECS, "opt": _OPT_PARAM_SPECS,
               "mamba": _MAMBA_PARAM_SPECS}

# ---- hybrid state-slot families (Jamba / BART / Mllama) ------------------
# These trunks keep per-layer param dicts (heterogeneous layer kinds:
# attention / mamba mixer / MoE / cross-attention) or family-specific
# stacked arrays instead of the homogeneous stacked "layers" tree, so the
# structural spec trees above don't apply.  Their TP shardings follow the
# same megatron column/row pattern, assigned by leaf NAME with the sharded
# axis counted from the RIGHT — a per-layer [in, out], stacked [L, in, out],
# or MoE [E, in, out] leaf all resolve correctly.  The reference runs these
# families under the identical Column/RowParallelLinear pattern
# (vllm/model_executor/models/jamba.py:95-230, bart.py BartAttention,
# mllama.py MllamaTextCrossAttention).

# output features on "model" (column-parallel); also 1-axis per-channel
# mamba leaves whose channel axis is last (Dskip).
_HYBRID_COL_NAMES = frozenset({
    "wqkv", "bqkv", "wq", "wk", "wv", "in_proj", "conv_w", "conv_b",
    "dt_w", "dt_b", "w_gate_up", "b_gate_up", "fc1_w", "fc1_b",
    "lm_head", "Dskip",
    "sa_q_w", "sa_q_b", "sa_k_w", "sa_k_b", "sa_v_w", "sa_v_b",
    "ca_q_w", "ca_q_b", "ca_k_w", "ca_k_b", "ca_v_w", "ca_v_b",
})
# input features on "model" (row-parallel, XLA fuses the psum); embed
# tables shard their vocab axis, which is also axis -2.
_HYBRID_ROW_NAMES = frozenset({
    "wo", "out_proj", "x_proj", "fc2_w", "w_down", "sa_o_w", "ca_o_w",
    "A_log", "embed", "shared",
})


def _hybrid_spec(name: str, shape, tp: int, pipe: bool = False) -> P:
    ndim = len(shape)
    spec = [None] * ndim
    if pipe and ndim:
        # Leading axis is the stacked period-BLOCK axis (Jamba PP
        # block_list leaves): each stage owns its run of whole blocks.
        spec[0] = "pipe"
    if name in _HYBRID_COL_NAMES:
        axis = ndim - 1
    elif name in _HYBRID_ROW_NAMES:
        axis = ndim - 2
    else:
        axis = -1
    # device_put needs the sharded axis divisible by the shard count
    # (e.g. 2 kv heads on tp=4): replicate such leaves — correctness is
    # layout-independent under GSPMD.
    if axis >= (1 if pipe else 0) and shape[axis] % tp == 0:
        spec[axis] = "model"
    return P(*spec)


def hybrid_param_shardings(mesh: Mesh, params: dict,
                           pipeline_parallel: int = 1):
    """NamedSharding pytree for a hybrid state-slot family's params:
    name-keyed megatron column/row specs; norms, gates, routers, position
    tables, and anything unrecognized replicate (correctness under GSPMD
    is layout-independent — the specs only steer where the bandwidth
    goes).  With PP on, ``block_list`` leaves (Jamba period blocks) and
    the ``dec_layers`` stack (BART) additionally shard their leading
    layer/block axis over "pipe"."""
    tp = mesh.shape["model"]
    pp_on = pipeline_parallel > 1

    def walk(node, name="", pipe=False):
        if isinstance(node, dict):
            return {k: walk(v, k, pipe or (pp_on and k == "dec_layers"))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, name, pipe or (pp_on and name == "block_list"))
                for v in node)
        return NamedSharding(mesh, _hybrid_spec(name, node.shape, tp,
                                                pipe))
    return walk(params)


def param_shardings(mesh: Mesh, architecture: str, params: dict,
                    pipeline_parallel: int = 1):
    """Pytree of NamedShardings matching ``params``' structure.

    QuantizedWeight leaves get the weight spec on ``q`` and the spec minus
    the contraction axis on ``s`` (scales follow the output channels).
    With ``pipeline_parallel > 1`` the stacked layer axis (leading axis of
    every ``layers`` leaf) is sharded over "pipe" — each stage holds its
    own slice of the depth."""
    from ..ops.quant import QuantizedWeight
    specs = PARAM_SPECS[architecture]
    if pipeline_parallel > 1:
        def pipe_spec(spec):
            return P(*(("pipe",) + tuple(spec[1:])))
        specs = dict(specs)
        specs["layers"] = {k: pipe_spec(v)
                           for k, v in specs["layers"].items()}
        if "lora" in params:
            # Adapter stacks [L, S, ...] shard the layer axis like
            # params["layers"]; the per-slot scale vector replicates.
            specs["lora"] = {k: (P() if k == "scale" else P("pipe"))
                             for k in params["lora"]}

    def fit(spec, ndim):
        """MoE expert leaves carry an extra axis after the layer axis:
        widen the dense spec with Nones there."""
        if len(spec) >= ndim or len(spec) == 0:
            return spec
        return P(*((spec[0],) + (None,) * (ndim - len(spec)) + spec[1:]))

    def walk(spec_node, param_node):
        from ..ops.pallas.int4_matmul import PackedInt4, QuantizedWeight4
        if isinstance(param_node, PackedInt4):
            # Same rationale as QuantizedWeight4 below: in-features stays
            # unsharded; qp and the sz stream share the out-axis spec.
            spec = fit(spec_node, param_node.qp.ndim)
            spec = P(*(spec[:-2] + (None,) + spec[-1:]))
            sh = NamedSharding(mesh, spec)
            return PackedInt4(qp=sh, sz=sh)
        if isinstance(param_node, QuantizedWeight4):
            # Packed int4: the nibble pairing couples rows j and j + K/2,
            # so the in-features axis must stay unsharded (GSPMD would
            # otherwise split packed rows across ranks whose x slices
            # don't match).  Shard the out axis only; scales/zeros share
            # the qp rank and follow the same spec.
            spec = fit(spec_node, param_node.qp.ndim)
            spec = P(*(spec[:-2] + (None,) + spec[-1:]))
            sh = NamedSharding(mesh, spec)
            return QuantizedWeight4(qp=sh, s=sh, z=sh)
        if isinstance(param_node, QuantizedWeight):
            spec = fit(spec_node, param_node.q.ndim)
            s_spec = P(*(spec[:-2] + spec[-1:])) if len(spec) >= 2 else spec
            return QuantizedWeight(q=NamedSharding(mesh, spec),
                                   s=NamedSharding(mesh, s_spec))
        if isinstance(param_node, dict):
            # Unknown keys (adapter stacks, family-specific biases)
            # replicate rather than fail; all bandwidth-relevant weights
            # carry explicit specs above.
            return {k: walk(spec_node.get(k, P()) if isinstance(
                spec_node, dict) else P(), v)
                for k, v in param_node.items()}
        return NamedSharding(mesh, fit(spec_node, param_node.ndim))

    return walk(specs, params)


def kv_cache_sharding(mesh: Mesh,
                      pipeline_parallel: int = 1) -> NamedSharding:
    """[layers, pages, page_size, Hkv, head_dim]: KV heads sharded over
    "model", layers over "pipe" when PP is on (pages replicated across
    "data" in round 1 — DP replicas serve disjoint request sets but share
    the pool layout)."""
    layer_axis = "pipe" if pipeline_parallel > 1 else None
    return NamedSharding(mesh, P(layer_axis, None, None, "model", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: dict, mesh: Mesh, architecture: str,
                 pipeline_parallel: int = 1) -> dict:
    if architecture == "mamba" and any(
            k in params for k in ("layer_list", "block_list",
                                  "enc_layers")):
        # Hybrid state-slot family (Jamba / BART / Mllama): per-layer
        # dicts / family-specific stacks — name-keyed specs.
        return jax.device_put(
            params,
            hybrid_param_shardings(mesh, params, pipeline_parallel))
    return jax.device_put(params,
                          param_shardings(mesh, architecture, params,
                                          pipeline_parallel))


def shard_caches(caches, mesh: Mesh, pipeline_parallel: int = 1,
                 state_model: bool = False):
    if state_model:
        # State pools, rank-keyed (covers pure Mamba AND the hybrid
        # families' mixed tuples):
        #   rank 5  [L, slots, T, H, d]    — K/V / cross-KV rows: the
        #           head axis shards over "model" to match the
        #           column-parallel q/k/v projections;
        #   rank 4  [L, slots, I, S|k-1]   — conv/SSM states: the feature
        #           (d_inner) axis shards to match the mixer outputs;
        #   rank 1  per-slot counters      — replicated.
        # The layer axis shards over "pipe" when PP is on (each stage
        # owns its layers' states; pure-Mamba only today).
        layer_axis = "pipe" if pipeline_parallel > 1 else None
        tp = mesh.shape["model"]

        def put(x):
            if x.ndim == 5:
                feat = "model" if x.shape[3] % tp == 0 else None
                s = P(layer_axis, None, None, feat, None)
            elif x.ndim == 4:
                feat = "model" if x.shape[2] % tp == 0 else None
                s = P(layer_axis, None, feat, None)
            else:
                s = P()
            return jax.device_put(x, NamedSharding(mesh, s))
        return jax.tree.map(put, caches)
    s = kv_cache_sharding(mesh, pipeline_parallel)
    k, v = caches
    return (jax.device_put(k, s), jax.device_put(v, s))
