"""The serving engine: request lifecycle + continuous-batching step loop.

TPU-native re-design of the reference LLMEngine
(vllm/engine/llm_engine.py:122): single-controller — the scheduler and all
block tables live on the host; the device runs one jitted program per step.
The reference's eviction feedback loop (attention impl → SamplerOutput →
engine → scheduler → block manager, SURVEY F9) collapses to reading the
``victims`` array that the decode step returns alongside the sampled tokens.
"""

from __future__ import annotations

import time
from typing import Optional, Union

import jax.numpy as jnp

from ..config import EngineConfig
from ..core.scheduler import Scheduler, SchedulerOutput
from ..core.sequence import Sequence, SequenceStatus, FINISH_REASON
from ..models.registry import build_model
from ..models.weights import (is_sharded_state_dir as
                              _is_sharded_state_dir, load_hf_config,
                              load_state_dict)
from ..outputs import CompletionOutput, RequestMetrics, RequestOutput
from ..runner.cache_engine import CacheEngine
from ..runner.model_runner import ModelRunner
from ..sampling_params import SamplingParams
from ..utils import init_logger
from .metrics import EngineMetrics
from .tokenizer_util import detokenize_incrementally, maybe_load_tokenizer

logger = init_logger(__name__)

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}
_KV_DTYPES = {"auto": None, "bfloat16": jnp.bfloat16,
              "float32": jnp.float32, "int8": jnp.int8,
              "fp8": jnp.float8_e4m3fn, "fp8_e4m3": jnp.float8_e4m3fn}


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: decode/prefill programs compile once
    per (config, shape) across processes (reference analog: VllmConfig
    compute_hash-keyed torch.compile caching, vllm/config.py)."""
    import os

    import jax

    from .. import envs
    path = envs.VPC_JAX_CACHE_DIR
    if path and path != "0":
        try:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass


class LLMEngine:
    def __init__(self, config: EngineConfig, params=None):
        _enable_compile_cache()
        config.verify()
        self.config = config
        mc = config.model
        dtype = _DTYPES[mc.dtype]

        gguf_tensors = None
        if mc.model:
            from ..models.gguf import find_gguf_file, load_gguf_checkpoint
            gguf_path = find_gguf_file(mc.model)
        else:
            gguf_path = None
        if mc.hf_config is not None:
            hf_cfg = mc.hf_config
        elif gguf_path is not None:
            logger.info("Loading GGUF checkpoint %s", gguf_path)
            hf_cfg, gguf_tensors = load_gguf_checkpoint(gguf_path)
        else:
            hf_cfg = load_hf_config(mc.model)
        self.model = build_model(hf_cfg, dtype=dtype)
        self._hf_config = hf_cfg
        self.eos_token_id = hf_cfg.get("eos_token_id")
        if isinstance(self.eos_token_id, list):
            self.eos_token_id = self.eos_token_id[0]

        qc = hf_cfg.get("quantization_config") if mc.model else None
        if (mc.weight_dtype is None and qc
                and (qc.get("quant_method") or "").lower()
                in ("awq", "gptq") and qc.get("bits", 4) == 4):
            # 4-bit checkpoints execute natively by default: dequantize to
            # the HF layout, then repack into the engine's int4 scheme on
            # the checkpoint's own group size (every value stays within
            # half the checkpoint's original quantization step; reference
            # runs these through the marlin int4 GEMM,
            # csrc/quantization/gptq_marlin/).
            logger.info("4-bit %s checkpoint: serving with the native "
                        "int4 kernel", qc.get("quant_method"))
            mc.weight_dtype = "int4"
        as_numpy = mc.weight_dtype in ("int8", "int4") and params is None
        if params is not None:
            self.params = params
        elif gguf_tensors is not None:
            self.params = self.model.load_hf_state_dict(
                gguf_tensors, as_numpy=as_numpy)
        elif mc.model and _is_sharded_state_dir(mc.model):
            # Engine-native sharded state (save_sharded_state): params
            # land already quantized/packed — no dequant/re-quant pass
            # (reference ShardedStateLoader fast path).
            from ..models.weights import load_sharded_state
            logger.info("Loading sharded engine state from %s", mc.model)
            self.params, saved_wd = load_sharded_state(mc.model)
            if saved_wd:
                mc.weight_dtype = saved_wd
                self._pre_quantized = True
        elif mc.model:
            logger.info("Loading weights from %s", mc.model)
            tensors = load_state_dict(mc.model)
            if qc:
                # AWQ/GPTQ/fp8 checkpoints: dequantize to fp at load;
                # weight_dtype int8/int4 re-quantizes to the engine scheme.
                from ..models.weights import dequantize_checkpoint
                logger.info("Dequantizing %s checkpoint",
                            qc.get("quant_method"))
                tensors = dequantize_checkpoint(tensors, qc)
            self.params = self.model.load_hf_state_dict(
                tensors, as_numpy=as_numpy)
        else:
            logger.info("Initializing random weights (synthetic mode)")
            if (mc.weight_dtype == "int8"
                    and hasattr(self.model, "init_params_int8")):
                # Synthetic int8: skip the fp32-generate + quantize pass.
                self.params = self.model.init_params_int8(mc.seed)
                self._pre_quantized = True
            elif (mc.weight_dtype == "int4"
                    and hasattr(self.model, "init_params_int4")):
                self.params = self.model.init_params_int4(mc.seed)
                self._pre_quantized = True
            else:
                self.params = self.model.init_params(mc.seed,
                                                     as_numpy=as_numpy)

        # Encoder-only models (BERT/Roberta embedders, cross-encoder
        # rerankers — reference vllm pooling models): no paged cache, no
        # scheduler, no decode phase.  encode()/classify() run bucketed
        # stateless forwards; generation APIs raise.
        self.encode_only = getattr(self.model, "encode_only", False)
        if self.encode_only:
            for bad, name in ((config.lora, "LoRA"),
                              (config.speculative, "speculative decoding"),
                              (config.kv_transfer, "KV transfer"),
                              (config.prompt_adapter, "prompt adapters"),
                              (mc.weight_dtype in ("int8", "int4") or None,
                               "quantized weights")):
                if bad is not None:
                    raise ValueError(f"{name} is not supported for "
                                     "encoder-only models")
            self.tokenizer = maybe_load_tokenizer(mc.tokenizer or mc.model)
            self.cache_engine = None
            self.runner = None
            self.scheduler = None
            self.mesh = None
            self.tracer = None
            self._seqs = {}
            self._req_counter = 0
            self._inflight = None
            self._guided_vocab = None
            self._encoder_jits = {}
            return

        if (mc.weight_dtype in ("int8", "int4")
                and not getattr(self, "_pre_quantized", False)):
            from ..ops.quant import quantize_params_tree
            bits = 4 if mc.weight_dtype == "int4" else 8
            # Re-quantizing a 4-bit checkpoint on its own group size keeps
            # the values within half the checkpoint's quantization step.
            group = (qc or {}).get("group_size") if bits == 4 else None
            if isinstance(group, int) and group <= 0:
                group = None  # GPTQ group_size=-1 means per-column
            logger.info("Quantizing weights to int%d (int8: per-channel "
                        "symmetric; int4: group-%s asymmetric)", bits,
                        group or 128)
            # Host-side quantization: only the packed ints + scales hit HBM.
            self.params = quantize_params_tree(
                self.params,
                ("wqkv", "wo", "w_gate_up", "w_down", "lm_head", "embed"),
                model_dtype=dtype, bits=bits, group=group)

        self.prompt_adapter_manager = None
        if config.prompt_adapter is not None:
            from ..prompt_adapter import (PromptAdapterManager,
                                          empty_prompt_adapter_params)
            config.prompt_adapter.verify()
            self.prompt_adapter_manager = PromptAdapterManager(
                self.model.arch, config.prompt_adapter, dtype=dtype)
            self.params = {**self.params,
                           "prompt_adapters": empty_prompt_adapter_params(
                               self.model.arch, config.prompt_adapter,
                               dtype)}

        self.lora_manager = None
        if config.lora is not None:
            from ..lora import LoRAManager
            from ..lora.manager import empty_lora_params
            self.lora_manager = LoRAManager(self.model.arch, config.lora,
                                            dtype=dtype)
            self.params = {**self.params,
                           "lora": empty_lora_params(self.model.arch,
                                                     config.lora, dtype)}

        self.tokenizer = maybe_load_tokenizer(mc.tokenizer or mc.model)
        if self.tokenizer is None and gguf_path is not None:
            from ..models.gguf import read_gguf, tokenizer_from_gguf_meta
            self.tokenizer = tokenizer_from_gguf_meta(
                read_gguf(gguf_path, meta_only=True)[0])

        self.draft_proposer = None
        sc = config.speculative
        if sc is not None and sc.method == "draft":
            from ..spec_decode.draft import DraftProposer
            if sc.draft_hf_config is not None:
                draft_model = build_model(sc.draft_hf_config, dtype=dtype)
                draft_params = draft_model.init_params(mc.seed + 1)
            else:
                logger.info("Loading draft weights from %s", sc.draft_model)
                draft_model = build_model(load_hf_config(sc.draft_model),
                                          dtype=dtype)
                draft_params = draft_model.load_hf_state_dict(
                    load_state_dict(sc.draft_model))
            self.draft_proposer = DraftProposer(
                draft_model, draft_params, sc.num_speculative_tokens,
                sc.draft_window)

        if self.model.architecture == "mamba":
            # State-space serving: one page per sequence (block_size =
            # max_model_len) whose index is the state slot; paged-KV-only
            # features are rejected (the reference's Mamba path similarly
            # bypasses the KV block machinery).
            cc, sc2 = config.cache, config.scheduler
            for bad, name in (
                    (cc.paged_evict and cc.paged_evict.enabled or None,
                     "paged eviction"),
                    (cc.enable_prefix_caching or None, "prefix caching"),
                    (sc2.enable_chunked_prefill or None, "chunked prefill"),
                    (config.speculative, "speculative decoding"),
                    (config.lora, "LoRA"),
                    (config.prompt_adapter, "prompt adapters"),
                    (config.kv_transfer, "KV transfer"),
                    (cc.cache_dtype not in ("auto", "float32") or None,
                     "quantized KV"),
                    ((config.parallel is not None
                      and config.parallel.pipeline_parallel_size > 1
                      and type(self.model).__name__ not in
                      ("MambaModel", "JambaModel", "BartModel",
                       "MllamaModel"))
                     or None,
                     "pipeline parallelism on this state-slot trunk "
                     "(Mamba/Jamba/BART/Mllama support TP+PP)"),
                    ((config.parallel is not None
                      and config.parallel.data_parallel_size > 1)
                     or None,
                     "data parallelism (Mamba supports TP and PP)"),
                    (sc2.preemption_mode == "swap" or None,
                     "preemption by swap")):
                if bad is not None:
                    raise ValueError(
                        f"{name} is not supported with Mamba models")
            cc.block_size = sc2.max_model_len
            if cc.num_device_blocks is None:
                # +spares: a window planned across the max_model_len
                # boundary may reserve one page before the stop check
                # retires the sequence.
                cc.num_device_blocks = sc2.max_num_seqs + 4
            logger.info("Mamba state pools: %d slots", cc.num_device_blocks)

        if getattr(self.model.arch, "bs_block", 0):
            # Blocksparse attention (Phi-3-small): the structured mask is
            # position-exact, so page-moving features are rejected.
            cc, sc2 = config.cache, config.scheduler
            for bad, name in (
                    (cc.paged_evict and cc.paged_evict.enabled or None,
                     "paged eviction"),
                    (cc.enable_prefix_caching or None, "prefix caching"),
                    (sc2.enable_chunked_prefill or None, "chunked prefill"),
                    (config.speculative, "speculative decoding")):
                if bad is not None:
                    raise ValueError(f"{name} is not supported with "
                                     "blocksparse-attention models")

        kv_dtype = _KV_DTYPES.get(config.cache.cache_dtype) or dtype
        import jax
        weight_bytes = sum(x.nbytes for x in jax.tree.leaves(self.params))
        pc = config.parallel
        num_shards = (pc.tensor_parallel_size * pc.pipeline_parallel_size
                      if pc is not None else 1)
        self.cache_engine = CacheEngine(config, self.model,
                                        kv_dtype=kv_dtype,
                                        weight_bytes=weight_bytes,
                                        num_shards=num_shards)
        self.kv_caches, self.page_scores = self.cache_engine.allocate()

        self.mesh = None
        if pc is not None and pc.world_size > 1:
            from ..parallel.mesh import (build_mesh, replicated,
                                         shard_caches, shard_params)
            pp = pc.pipeline_parallel_size
            if pp > 1:
                if self.model.architecture not in ("llama", "mamba"):
                    raise ValueError("pipeline parallelism currently "
                                     "supports llama-family and Mamba "
                                     "trunks")
                if self.model.architecture == "mamba":
                    if type(self.model).__name__ in ("JambaModel",
                                                     "MllamaModel"):
                        # Stages own whole period blocks (layer kinds are
                        # block-periodic: jamba.py / mllama.py
                        # to_block_form; pp_block_len raises for
                        # aperiodic Mllama cross patterns).
                        blk = self.model.pp_block_len
                        nl = self.model.arch.num_layers
                        if nl % blk or (nl // blk) % pp:
                            raise ValueError(
                                f"period-block PP needs num_layers "
                                f"divisible into {blk}-layer blocks "
                                f"spread evenly over stages: "
                                f"num_layers={nl}, pp={pp}")
                        if self.model.arch.head_type == "cls":
                            raise ValueError(
                                "classification heads do not support "
                                "pipeline parallelism")
                        self.params = self.model.to_block_form(
                            self.params)
                    elif type(self.model).__name__ == "BartModel":
                        if self.model.arch.decoder_layers % pp:
                            raise ValueError(
                                f"BART PP needs decoder_layers % pp == "
                                f"0, got "
                                f"{self.model.arch.decoder_layers} % "
                                f"{pp}")
                    elif self.model.arch.num_layers % pp:
                        raise ValueError(
                            f"Mamba PP needs num_layers % pp == 0, got "
                            f"{self.model.arch.num_layers} % {pp}")
                elif self.model.arch.attn_type == "mla" \
                        or self.model.arch.first_k_dense:
                    raise ValueError("pipeline parallelism with MLA / "
                                     "dense-prefix (DeepSeek) stacks is "
                                     "not supported yet")
                # Speculative proposers all compose with PP: ngram is
                # host-side; draft runs its own (replicated) params in a
                # separate jit; medusa/mlp/eagle ride the pipe-sharded
                # target params under GSPMD auto partitioning (their
                # stateless window forwards are correct over any layout).
                # Verification runs via _spec_verify_pp (greedy) or
                # _spec_verify_sampled_pp (rejection / typical
                # acceptance).
            self.mesh = build_mesh(pc.tensor_parallel_size,
                                   pc.data_parallel_size, pp)
            self.params = shard_params(self.params, self.mesh,
                                       self.model.architecture, pp)
            self.kv_caches = shard_caches(
                self.kv_caches, self.mesh, pp,
                state_model=self.model.architecture == "mamba")
            self.page_scores = jax.device_put(self.page_scores,
                                              replicated(self.mesh))
        if sc is not None and sc.method in ("medusa", "mlp_speculator"):
            # Head-based proposers ride on the (possibly sharded) target
            # params, so they are built after mesh placement.
            from ..spec_decode.heads import (MedusaProposer,
                                             MLPSpeculatorProposer)
            k = sc.num_speculative_tokens
            if sc.method == "medusa":
                if sc.heads_path:
                    hp = MedusaProposer.load_hf_heads(
                        load_state_dict(sc.heads_path), k)
                else:
                    hp = MedusaProposer.init_head_params(
                        self.model.arch, k, sc.medusa_num_layers,
                        seed=mc.seed + 2)
                self.draft_proposer = MedusaProposer(
                    self.model, self.params, hp, k, sc.draft_window)
            else:
                if sc.heads_path:
                    hp = MLPSpeculatorProposer.load_hf_heads(
                        load_state_dict(sc.heads_path), k,
                        self.model.arch.hidden_size)
                else:
                    hp = MLPSpeculatorProposer.init_head_params(
                        self.model.arch, k, sc.speculator_inner_dim,
                        seed=mc.seed + 2)
                self.draft_proposer = MLPSpeculatorProposer(
                    self.model, self.params, hp, k, sc.draft_window)
        if sc is not None and sc.method == "eagle":
            # EAGLE rides on the target params (hidden extraction), so it
            # is built after mesh placement like the head proposers.
            from ..spec_decode.eagle import (EagleProposer, init_eagle_params,
                                             load_hf_eagle)
            if sc.eagle_hf_config is not None:
                inner = dict(sc.eagle_hf_config.get("model")
                             or sc.eagle_hf_config)
                inner.setdefault("architectures", ["LlamaForCausalLM"])
                eagle_model = build_model(inner, dtype=dtype)
                eagle_params, fcp = init_eagle_params(
                    self.model, eagle_model, seed=mc.seed + 3)
            else:
                logger.info("Loading EAGLE weights from %s", sc.eagle_model)
                ecfg = load_hf_config(sc.eagle_model)
                inner = dict(ecfg.get("model") or ecfg)
                inner.setdefault("architectures", ["LlamaForCausalLM"])
                eagle_model = build_model(inner, dtype=dtype)
                eagle_params, fcp = load_hf_eagle(
                    load_state_dict(sc.eagle_model), eagle_model)
            self.draft_proposer = EagleProposer(
                self.model, self.params, eagle_model, eagle_params, fcp,
                sc.num_speculative_tokens, sc.draft_window)
        self.runner = ModelRunner(self.model, config, self.cache_engine,
                                  mesh=self.mesh)
        self.scheduler = Scheduler(config.scheduler, config.cache,
                                   self.cache_engine.num_pages)
        # Preemption-by-swap hooks: the scheduler owns the queue/paging,
        # the engine owns the device arrays (reference CacheEngine
        # swap_in/swap_out, vllm/worker/cache_engine.py + CPU tier of
        # CpuGpuBlockAllocator).
        self._swap_bytes_used = 0
        self._swap_bytes_budget = int(config.cache.swap_space_gb * (1 << 30))
        if config.scheduler.preemption_mode == "swap":
            self.scheduler.swap_out_fn = self._swap_out_seq
            self.scheduler.swap_in_fn = self._swap_in_seq
        self.metrics = EngineMetrics(self)
        from .tracing import Tracer
        self.tracer = Tracer(config.observability.otlp_traces_endpoint)
        self.kv_pipe = None
        self.kv_lookup = None
        if config.kv_transfer is not None:
            from ..kv_transfer import KVLookupBuffer, build_pipe
            config.kv_transfer.verify()
            self.kv_pipe = build_pipe(config.kv_transfer)
            if config.kv_transfer.role == "consumer":
                self.kv_lookup = KVLookupBuffer(self.kv_pipe)

        self._seqs: dict[str, Sequence] = {}
        self._req_counter = 0
        # Streaming consumers attached right now (api_server SSE): while
        # nonzero, decode windows are capped at stream_scheduler_steps so
        # tokens reach clients in small bursts instead of K-step dumps.
        self._stream_clients = 0
        # Guided decoding: token id -> bytes vocabulary (lazily derived
        # from the tokenizer; tests and token-id-space callers inject one
        # via set_guided_vocab).
        self._guided_vocab = None
        # A dispatched-but-unfetched decode window: (plans, k, handle,
        # sim-end).  While it is in flight the device keeps decoding; the
        # host fetches its results one step later (see _decode_pipelined).
        self._inflight = None

    # ------------------------------------------------------------------
    # request API
    # ------------------------------------------------------------------

    def add_request(self, request_id: Optional[str] = None,
                    prompt: Optional[str] = None,
                    prompt_token_ids: Optional[list[int]] = None,
                    sampling_params: Optional[SamplingParams] = None,
                    arrival_time: Optional[float] = None,
                    priority: int = 0,
                    lora_request=None,
                    multi_modal_data: Optional[dict] = None,
                    prompt_adapter_request=None) -> str:
        if getattr(self, "encode_only", False):
            raise ValueError("encoder-only model: use encode()/classify()")
        if getattr(self.model.arch, "head_type", "none") != "none":
            raise ValueError("pooling-task model (classifier/reward head, "
                             "no lm_head): use classify()")
        if request_id is None:
            request_id = f"req-{self._req_counter}"
            self._req_counter += 1
        if prompt_token_ids is None:
            if prompt is None:
                raise ValueError("need prompt or prompt_token_ids")
            if self.tokenizer is None:
                raise ValueError("no tokenizer available; pass token ids")
            prompt_token_ids = self.tokenizer.encode(prompt).ids
        pixel_values = None
        mm_feats = None
        mm_start = -1
        mrope = None
        if multi_modal_data:
            pixel_values, mm_feats, prompt_token_ids, mm_start, mrope = \
                self._prepare_image(multi_modal_data, prompt_token_ids)
        pa_slot, pa_len = 0, 0
        if prompt_adapter_request is not None:
            if self.prompt_adapter_manager is None:
                raise ValueError("engine built without a "
                                 "PromptAdapterConfig")
            if self.config.scheduler.enable_chunked_prefill \
                    or self.config.cache.enable_prefix_caching:
                raise ValueError("prompt adapters with chunked prefill / "
                                 "prefix caching are not supported yet")
            pa_slot, pa_len = self.prompt_adapter_manager.slot_of(
                prompt_adapter_request.prompt_adapter_int_id)
            # Placeholder tokens reserve the virtual-prefix positions; the
            # prefill program overwrites their embedding rows.
            prompt_token_ids = [0] * pa_len + list(prompt_token_ids)
            if mm_start >= 0:
                mm_start += pa_len
        seq = Sequence(request_id, prompt_token_ids,
                       sampling_params or SamplingParams(),
                       arrival_time=arrival_time, priority=priority,
                       eos_token_id=self.eos_token_id)
        sp_ = seq.params
        if self.config.speculative is not None and (
                sp_.logit_bias or sp_.allowed_token_ids or sp_.bad_words):
            raise ValueError("logit_bias / allowed_token_ids / bad_words "
                             "with speculative decoding are not supported")
        gd = seq.params.guided_decoding
        if gd is not None:
            if self.config.speculative is not None:
                raise ValueError("guided decoding is incompatible with "
                                 "speculative decoding (the FSM must "
                                 "observe each token before the next)")
            from ..guided import GuidedState, get_guided_fsm
            seq.guided = GuidedState(get_guided_fsm(
                gd, self.guided_vocab(), self.eos_token_id,
                self.model.arch.vocab_size))
        seq.pixel_values = pixel_values
        seq.mm_feats = mm_feats
        seq.mm_start = mm_start
        if mrope is not None:
            seq.mrope_positions, seq.mrope_delta = mrope
        seq.pa_slot = pa_slot
        seq.pa_len = pa_len
        if lora_request is not None:
            if self.lora_manager is None:
                raise ValueError("engine built without a LoRAConfig")
            seq.lora_slot = self.lora_manager.slot_of(
                lora_request.lora_int_id)
        self._seqs[request_id] = seq
        self.scheduler.add_seq(seq)
        return request_id

    # ---- guided decoding (SURVEY C13: guided_json/regex/choice +
    # response_format; reference vllm/model_executor/guided_decoding/) ----

    def guided_vocab(self) -> list[bytes]:
        """Token id -> byte string table for FSM compilation."""
        if self._guided_vocab is None:
            if self.tokenizer is None:
                raise ValueError(
                    "guided decoding needs a tokenizer (or an injected "
                    "vocabulary via set_guided_vocab)")
            from ..guided import token_bytes_from_tokenizer
            self._guided_vocab = token_bytes_from_tokenizer(
                self.tokenizer, self.model.arch.vocab_size)
        return self._guided_vocab

    def set_guided_vocab(self, vocab: list[bytes]) -> None:
        self._guided_vocab = list(vocab)

    def _prepare_image(self, multi_modal_data: dict,
                       prompt_token_ids: list[int]):
        """Validate an image request and expand its placeholder.

        The prompt may carry the image token once (expanded here to
        ``num_image_tokens`` copies, HF-processor style) or already
        expanded.  Returns (pixel_values, expanded_prompt, span_start)."""
        import numpy as np
        if not any(hasattr(self.model, h) for h in
                   ("encode_image", "assemble_image_features",
                    "encode_image_tokens", "encode_cross_states")):
            raise ValueError("model has no vision tower; cannot accept "
                             "multi_modal_data")
        if self.config.scheduler.enable_chunked_prefill \
                or self.config.cache.enable_prefix_caching:
            raise ValueError("image inputs with chunked prefill / prefix "
                             "caching are not supported yet")
        is_video = False
        raw = multi_modal_data.get("image")
        if raw is None:
            # Audio models (Qwen2-Audio): mel spectrogram rides the same
            # splice path (reference vllm/multimodal/ audio plugin).
            raw = multi_modal_data.get("audio")
        if raw is None and "video" in multi_modal_data:
            raw = multi_modal_data["video"]
            is_video = True
        if raw is None:
            raise ValueError("multi_modal_data needs 'image', 'audio' or "
                             "'video'")
        pixel_values = np.asarray(raw, np.float32)
        mm_feats = None
        if hasattr(self.model, "encode_image_tokens"):
            # Chameleon: images become DISCRETE vocabulary tokens (VQGAN
            # codes); substitute the placeholder and serve a plain text
            # request (reference ChameleonModel.get_image_tokens).
            ids = self.model.encode_image_tokens(self.params, pixel_values)
            tok = self.model.image_token_id
            spans = [i for i, t in enumerate(prompt_token_ids) if t == tok]
            if len(spans) != 1:
                raise ValueError("prompt must contain the image token "
                                 "exactly once")
            s = spans[0]
            prompt_token_ids = (list(prompt_token_ids[:s]) + ids
                                + list(prompt_token_ids[s + 1:]))
            return None, None, prompt_token_ids, -1, None
        if hasattr(self.model, "encode_cross_states"):
            # Encoder-decoder multimodal (Mllama): the vision tower runs
            # host-side at admission and its states feed CROSS attention;
            # the decoder prompt keeps its single image token (no span
            # expansion — reference mllama.py runs vision as the encoder
            # phase of an enc-dec request).
            mm_feats = np.asarray(self.model.encode_cross_states(
                self.params, pixel_values, multi_modal_data))
            pixel_values = None
            n = 1
        elif hasattr(self.model, "assemble_image_features"):
            # Anyres families (Llava-Next): crop features + unpadded
            # spatial layout are assembled HOST-side at admission (the
            # result length is data-dependent); the prefill jit splices a
            # precomputed feature block.
            mm_feats = np.asarray(self.model.assemble_image_features(
                self.params, pixel_values, multi_modal_data))
            pixel_values = None
            n = mm_feats.shape[0]
        elif hasattr(self.model, "validate_image"):
            # Variable-resolution families (Fuyu): the model checks shape
            # and derives the placeholder span from the image itself.
            pixel_values = self.model.validate_image(pixel_values)
            n = self.model.num_image_tokens_for(pixel_values)
        else:
            va = self.model.vision.arch
            if pixel_values.shape != (3, va.image_size, va.image_size):
                raise ValueError(
                    f"expected pixel_values [3, {va.image_size}, "
                    f"{va.image_size}], got {pixel_values.shape}")
            n = self.model.num_image_tokens
        img_tok = (self.model.video_token_id if is_video
                   else self.model.image_token_id)
        spans = [i for i, t in enumerate(prompt_token_ids) if t == img_tok]
        if len(spans) == 1:
            start = spans[0]
            prompt_token_ids = (prompt_token_ids[:start] + [img_tok] * n
                                + prompt_token_ids[start + 1:])
        elif len(spans) == n and spans == list(range(spans[0],
                                                     spans[0] + n)):
            start = spans[0]
        else:
            raise ValueError(
                "prompt must contain the image token exactly once (or one "
                "contiguous pre-expanded span)")
        mrope = None
        if hasattr(self.model, "compute_mrope"):
            # Qwen2-VL M-RoPE: [3, L] prompt position streams + the decode
            # position delta (vllm mrope_position_delta).
            mrope = self.model.compute_mrope(
                prompt_token_ids, [multi_modal_data.get("image_grid_thw")])
        return pixel_values, mm_feats, prompt_token_ids, start, mrope

    # ------------------------------------------------------------------
    # LoRA adapters (reference vllm/entrypoints add_lora RPC + worker
    # manager, SURVEY C15)
    # ------------------------------------------------------------------

    def add_lora(self, lora_int_id: int, tensors: dict,
                 scaling: float = 1.0) -> None:
        """Load an adapter into a free device slot.  ``tensors``:
        {target: (A [L, in, r], B [L, r, out])} numpy arrays."""
        if self.lora_manager is None:
            raise ValueError("engine built without a LoRAConfig")
        self.params = {**self.params,
                       "lora": self.lora_manager.add_adapter(
                           self.params["lora"], lora_int_id, tensors,
                           scaling)}

    def remove_lora(self, lora_int_id: int) -> None:
        if self.lora_manager is None:
            return
        self.params = {**self.params,
                       "lora": self.lora_manager.remove_adapter(
                           self.params["lora"], lora_int_id)}

    def add_prompt_adapter(self, adapter_id: int, embeddings) -> None:
        """Load a soft-prompt adapter ([n, hidden] virtual-token
        embeddings) into a free device slot."""
        if self.prompt_adapter_manager is None:
            raise ValueError("engine built without a PromptAdapterConfig")
        import numpy as np
        self.params = {
            **self.params,
            "prompt_adapters": self.prompt_adapter_manager.add_adapter(
                self.params["prompt_adapters"], adapter_id,
                np.asarray(embeddings, np.float32))}

    def remove_prompt_adapter(self, adapter_id: int) -> None:
        if self.prompt_adapter_manager is None:
            return
        self.params = {
            **self.params,
            "prompt_adapters": self.prompt_adapter_manager.remove_adapter(
                self.params["prompt_adapters"], adapter_id)}

    # ---- profiling (reference: torch profiler via VLLM_TORCH_PROFILER_DIR,
    # vllm/worker/worker.py:103-128 + api_server start/stop RPC :444-451;
    # here jax.profiler traces viewable in TensorBoard/Perfetto) ----------

    def start_profile(self) -> str:
        import os

        from .. import envs
        path = envs.VPC_PROFILE_DIR
        if getattr(self, "_profiling", False):
            return path
        import jax
        os.makedirs(path, exist_ok=True)
        jax.profiler.start_trace(path)
        self._profiling = True
        logger.info("jax.profiler trace started -> %s", path)
        return path

    def stop_profile(self) -> None:
        if not getattr(self, "_profiling", False):
            return
        import jax
        jax.profiler.stop_trace()
        self._profiling = False
        logger.info("jax.profiler trace stopped")

    def save_sharded_state(self, path: str,
                           max_size: int = 4 * 1024 ** 3) -> None:
        """Dump the engine-resident (quantized/packed) params so a later
        boot with model=<path> skips checkpoint dequant + re-quant
        (reference Worker.save_sharded_state, worker.py:166-176)."""
        import json as _json
        import os as _os
        from ..models.weights import save_sharded_state
        params = self.params
        if "block_list" in params:
            # PP restacked hybrid params (jamba/mllama to_block_form);
            # dump layer-form so the shards reload under any layout.
            params = self.model.from_block_form(params)
        save_sharded_state(params, path,
                           weight_dtype=self.config.model.weight_dtype,
                           max_size=max_size)
        # config.json rides along so model=<path> boots standalone.
        with open(_os.path.join(path, "config.json"), "w") as f:
            _json.dump(self._hf_config, f, indent=1)

    def stream_attach(self) -> None:
        self._stream_clients += 1

    def stream_detach(self) -> None:
        self._stream_clients = max(0, self._stream_clients - 1)

    def abort_request(self, request_id: str) -> bool:
        # The in-flight window writes into pages the abort will free:
        # commit it first.
        self._drain_inflight([], [])
        seq = self._seqs.get(request_id)
        ok = self.scheduler.abort(request_id)
        if seq is not None and seq.swap_payload is not None:
            self._swap_bytes_used -= seq.swap_payload[3]
            seq.swap_payload = None
        self._seqs.pop(request_id, None)
        return ok

    # ---- preemption by swap (reference cache_engine.py swap ops) -------

    def _swap_out_seq(self, seq: Sequence) -> bool:
        """Copy the sequence's KV pages (and their eviction scores) to host
        memory and free the device pages.  Returns False when the host swap
        budget is exhausted — the scheduler then falls back to recompute."""
        import numpy as np
        table = seq.block_table
        nbytes = len(table.pages) * self.cache_engine.page_bytes
        if self._swap_bytes_used + nbytes > self._swap_bytes_budget:
            return False
        kv = self.runner.extract_seq_kv(self.kv_caches, table.pages)
        scores = None
        if self.runner.track_page_scores:
            scores = np.asarray(
                self.page_scores[jnp.asarray(table.pages, jnp.int32)])
        seq.swap_payload = (kv, scores, table.num_kv_slots, nbytes)
        seq.swapped_kv_len = table.num_kv_slots
        self._swap_bytes_used += nbytes
        table.free()
        seq.block_table = None
        return True

    def _swap_in_seq(self, seq: Sequence) -> None:
        """Scatter a swapped sequence's pages back into the pool (the
        scheduler has already allocated the target table)."""
        kv, scores, kv_len, nbytes = seq.swap_payload
        pages = seq.block_table.pages
        assert seq.block_table.num_kv_slots == kv_len
        self.kv_caches = self.runner.inject_seq_kv(self.kv_caches, kv, pages)
        if scores is not None:
            self.page_scores = self.page_scores.at[
                jnp.asarray(pages, jnp.int32)].set(jnp.asarray(scores))
        self._swap_bytes_used -= nbytes
        seq.swap_payload = None

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished()

    def get_num_unfinished_requests(self) -> int:
        return (self.scheduler.num_waiting + self.scheduler.num_running
                + self.scheduler.num_swapped)

    # ------------------------------------------------------------------
    # the step
    # ------------------------------------------------------------------

    def step(self) -> list[RequestOutput]:
        finished: list[Sequence] = []
        results: list[RequestOutput] = []
        num_gen_tokens = 0

        # Course change ahead (prefill admission / speculative step):
        # commit the in-flight decode window before tables move.
        if self._inflight is not None and (
                self.scheduler.num_waiting or self.scheduler.num_swapped
                or self.config.speculative is not None):
            num_gen_tokens += self._drain_inflight(results, finished)

        if self.kv_lookup is not None and self.scheduler.num_waiting:
            ingested = self._kv_consumer_intake()
            for seq in ingested:
                num_gen_tokens += 1
                self._postprocess(seq, results, finished)

        out: SchedulerOutput = self.scheduler.schedule()

        if out.prefills:
            for sp in out.prefills:
                self.kv_caches, self.page_scores, tok, lp_row = \
                    self.runner.run_prefill(self.params, self.kv_caches,
                                            self.page_scores, sp)
                if not sp.is_last:
                    continue  # mid-prompt chunk: no token sampled yet
                if sp.prune_on_last:
                    # Chunked prefill x eviction: the device compacted
                    # the keep set; free the tail pages now.
                    self.scheduler.shrink_after_prefill_prune(sp.seq)
                self.scheduler.register_prefix(sp.seq)
                sp.seq.append_token(int(tok))
                if lp_row is not None:
                    self._record_logprobs(sp.seq, lp_row)
                num_gen_tokens += 1
                if self.kv_pipe is not None and self.kv_lookup is None:
                    self._kv_produce(sp.seq)
                self._postprocess(sp.seq, results, finished)
        elif self.scheduler.num_running and \
                self.config.speculative is not None:
            # Speculative decoding (reference spec_decode/): ngram or
            # draft-model proposals; greedy batches verify by argmax
            # match, stochastic batches by in-graph rejection sampling.
            sc = self.config.speculative
            proposals = None
            if self.draft_proposer is not None and self.scheduler.running:
                running = list(self.scheduler.running)
                props = self.draft_proposer.propose(
                    [s.prompt_token_ids + list(s.output_token_ids)
                     for s in running])
                proposals = {s.request_id: props[i].tolist()
                             for i, s in enumerate(running)}
            plans, _pre = self.scheduler.plan_spec_step(
                sc.num_speculative_tokens, sc.ngram_prompt_lookup_max,
                sc.ngram_prompt_lookup_min, proposals=proposals)
            if plans:
                for plan in plans:
                    p = plan.seq.params
                    if (p.presence_penalty != 0.0
                            or p.frequency_penalty != 0.0
                            or p.repetition_penalty != 1.0):
                        raise NotImplementedError(
                            "speculative decoding with token penalties")
                    if p.logprobs:
                        raise NotImplementedError(
                            "speculative decoding with logprobs")
                accepted: list[list[int]] = []
                if all(pl.seq.params.greedy for pl in plans):
                    self.kv_caches, self.page_scores, model_toks = \
                        self.runner.run_spec_verify(
                            self.params, self.kv_caches, self.page_scores,
                            plans)
                    for i, plan in enumerate(plans):
                        m = [int(x) for x in model_toks[i]]
                        props = plan.proposals
                        a = 0
                        while a < len(props) and props[a] == m[a]:
                            a += 1
                        accepted.append(props[:a] + [m[a]])
                else:
                    self.kv_caches, self.page_scores, toks, n_acc = \
                        self.runner.run_spec_verify_sampled(
                            self.params, self.kv_caches, self.page_scores,
                            plans)
                    for i in range(len(plans)):
                        n = int(n_acc[i])
                        accepted.append([int(x) for x in toks[i][:n + 1]])
                scores_np = None
                if self.runner.track_page_scores:
                    # Spec x eviction with L2 selection: the host picks
                    # victims (the in-graph argmin lives in the decode
                    # window, not the verify program) from a fetched
                    # score snapshot — same values the window would see.
                    import numpy as np
                    scores_np = np.asarray(self.page_scores)
                spec_fills: list[int] = []
                for plan, new_tokens in zip(plans, accepted):
                    seq = plan.seq
                    mt = seq.params.max_tokens
                    if mt is not None:
                        new_tokens = new_tokens[
                            :max(mt - seq.num_output_tokens, 1)]
                    spec_fills += self.scheduler.commit_spec(
                        plan, len(new_tokens), page_scores=scores_np)
                    num_gen_tokens += len(new_tokens)
                    for j, tok in enumerate(new_tokens):
                        seq.append_token(tok)
                        if self._postprocess(seq, results, finished,
                                             emit=(j == len(new_tokens)
                                                   - 1)):
                            break
                if spec_fills and self.runner.track_page_scores:
                    self.page_scores = self.runner.update_fill_scores(
                        self.page_scores, self.kv_caches, spec_fills)
        elif self.scheduler.num_running:
            # Multi-step decode: chain K steps on device, one fetch.  Drop
            # to single steps while prefills are waiting so new requests
            # aren't starved (reference multi-step scheduling analog —
            # which upstream forbids together with eviction,
            # arg_utils.py:1255-1257).  Starvation only threatens when
            # admission is actually POSSIBLE: with the pool full, a
            # backlog must not pin every window at k=1 (that was the r4
            # 64->256 offered-load throughput drop); the window planner
            # already truncates at the earliest max_tokens finish, so
            # freed pages surface at the next commit.
            k_max = (1 if ((self.scheduler.num_waiting
                            or self.scheduler.num_swapped)
                           and self.scheduler.can_admit_next())
                     else self.config.scheduler.num_scheduler_steps)
            ss = self.config.scheduler.stream_scheduler_steps
            if self._stream_clients and ss:
                k_max = min(k_max, ss)
            if any(self.runner.lane_needs_stepwise_mask(s)
                   for s in self.scheduler.running):
                # Guided FSMs / multi-token bad_words need a fresh mask
                # after every sampled token: single-step windows.
                k_max = 1
            num_gen_tokens += self._decode_pipelined(k_max, results,
                                                     finished)

        for seq in finished:
            self._seqs.pop(seq.request_id, None)
        self.metrics.observe_step(out, results, num_gen_tokens)
        return results

    # ---- embeddings / pooling (reference LLM.encode + pooling models) --

    def _encoder_buckets(self) -> list[int]:
        from ..utils import next_bucket  # noqa: F401
        out, b = [], 32
        top = self.config.scheduler.max_model_len
        while b < top:
            out.append(b)
            b *= 2
        out.append(top)
        return sorted(set(out))

    def _encode_encoder(self, prompt_token_ids, pooling, normalize,
                        token_type_ids=None):
        """Encoder-model embeddings (BERT-family; bucketed bidirectional
        forwards)."""
        import functools

        import jax
        import numpy as np

        from ..utils import next_bucket
        buckets = self._encoder_buckets()
        out = []
        for i, ids in enumerate(prompt_token_ids):
            l_pad = next_bucket(len(ids), buckets)
            key = ("emb", l_pad, pooling, normalize)
            fn = self._encoder_jits.get(key)
            if fn is None:
                fn = self._encoder_jits[key] = jax.jit(functools.partial(
                    self.model.encode_pooled, pooling=pooling,
                    normalize=normalize))
            toks = np.zeros(l_pad, np.int32)
            toks[:len(ids)] = ids
            tts = np.zeros(l_pad, np.int32)
            if token_type_ids is not None:
                tts[:len(ids)] = token_type_ids[i]
            out.append(np.asarray(fn(self.params, toks,
                                     np.int32(len(ids)),
                                     token_type_ids=tts)))
        return out

    def classify(self, prompt_token_ids: list[list[int]],
                 token_type_ids=None):
        """Cross-encoder classification logits per sequence (reranker
        scoring, reference vllm pooling 'score' task)."""
        import functools

        import jax
        import numpy as np

        from ..utils import next_bucket
        if not getattr(self, "encode_only", False):
            if getattr(self.model.arch, "head_type", "none") != "none":
                return self._classify_decoder(prompt_token_ids)
            raise ValueError("classify() needs a sequence-classification "
                             "model")
        if not self.model.arch.num_labels:
            raise ValueError("classify() needs a sequence-classification "
                             "encoder model")
        buckets = self._encoder_buckets()
        out = []
        for i, ids in enumerate(prompt_token_ids):
            l_pad = next_bucket(len(ids), buckets)
            key = ("cls", l_pad)
            fn = self._encoder_jits.get(key)
            if fn is None:
                fn = self._encoder_jits[key] = jax.jit(
                    functools.partial(self.model.classify))
            toks = np.zeros(l_pad, np.int32)
            toks[:len(ids)] = ids
            tts = np.zeros(l_pad, np.int32)
            if token_type_ids is not None:
                tts[:len(ids)] = token_type_ids[i]
            out.append(np.asarray(fn(self.params, toks,
                                     np.int32(len(ids)),
                                     token_type_ids=tts)))
        return out

    def _classify_decoder(self, prompt_token_ids: list[list[int]]):
        """Pooling-task heads on a decoder trunk (reference qwen2_cls.py:
        LAST pooling; qwen2_rm.py: ALL pooling).  "cls" returns per-sequence
        label logits [num_labels]; "reward" returns per-token values
        [len, num_labels]."""
        import functools

        import jax
        import numpy as np

        from ..ops.attention import prefill_attention
        from ..utils import next_bucket
        model, params = self.model, self.params
        if getattr(model, "architecture", "") == "mamba":
            return self._classify_state_model(prompt_token_ids)
        head_type = model.arch.head_type
        scale = getattr(model.arch, "attn_scale",
                        model.arch.head_dim ** -0.5)
        cache = getattr(self, "_encoder_jits", None)
        if cache is None:
            cache = self._encoder_jits = {}

        def make(l_pad):
            def fn(params, tokens, length):
                h, _ = model.forward_hidden(
                    params, tokens, jnp.arange(l_pad),
                    lambda q, k, v, s: (prefill_attention(
                        q, k, v, scale, length), s))
                if head_type == "cls":
                    return model.head_forward(params, h[length - 1])
                return model.head_forward(params, h)
            return jax.jit(fn)

        out = []
        for ids in prompt_token_ids:
            l_pad = next_bucket(len(ids), self.runner.prefill_buckets)
            key = ("dec_head", l_pad)
            if key not in cache:
                cache[key] = make(l_pad)
            toks = np.zeros(l_pad, np.int32)
            toks[:len(ids)] = ids
            res = np.asarray(cache[key](params, toks, np.int32(len(ids))))
            out.append(res if head_type == "cls" else res[:len(ids)])
        return out

    def _classify_state_model(self, prompt_token_ids: list[list[int]]):
        """Classification on a state-model trunk (Jamba, reference
        jamba.py:600): one prefill per sequence writing into the TRASH
        state slot, head on the last hidden (LAST pooling)."""
        import jax
        import numpy as np

        from ..utils import next_bucket
        model = self.model
        trash = self.cache_engine.num_pages     # pools hold num_pages + 1
        cache = getattr(self, "_encoder_jits", None)
        if cache is None:
            cache = self._encoder_jits = {}

        def make():
            def fn(params, pools, tokens, length):
                last, _ = model.forward_prefill(
                    params, tokens, length, jnp.int32(trash), pools)
                return model.head_forward(params, last[0])
            return jax.jit(fn)

        out = []
        for ids in prompt_token_ids:
            l_pad = next_bucket(len(ids), self.runner.prefill_buckets)
            key = ("state_head", l_pad)
            if key not in cache:
                cache[key] = make()
            toks = np.zeros(l_pad, np.int32)
            toks[:len(ids)] = ids
            out.append(np.asarray(cache[key](self.params, self.kv_caches,
                                             toks, np.int32(len(ids)))))
        return out

    def encode(self, prompt_token_ids: list[list[int]],
               pooling: str = "last", normalize: bool = True,
               token_type_ids=None):
        """Pooled final hidden states (embedding requests have no decode
        phase, so they bypass the paged cache: each prompt is one bucketed
        stateless forward)."""
        import functools

        import jax
        import numpy as np

        from ..ops.attention import prefill_attention
        from ..utils import next_bucket
        if getattr(self, "encode_only", False):
            if pooling == "last":
                pooling = "mean"     # encoder default (BGE/e5 convention)
            return self._encode_encoder(prompt_token_ids, pooling,
                                        normalize, token_type_ids)
        if pooling not in ("last", "mean"):
            raise ValueError("pooling must be 'last' or 'mean'")
        model, params = self.model, self.params
        scale = getattr(model.arch, "attn_scale",
                        model.arch.head_dim ** -0.5)
        cache = getattr(self, "_encode_jits", None)
        if cache is None:
            cache = self._encode_jits = {}

        def make(l_pad):
            def fn(params, tokens, length):
                h, _ = model.forward_hidden(
                    params, tokens, jnp.arange(l_pad),
                    lambda q, k, v, s: (prefill_attention(
                        q, k, v, scale, length), s))
                if pooling == "last":
                    pooled = h[length - 1]
                else:
                    mask = (jnp.arange(l_pad) < length)[:, None]
                    pooled = jnp.sum(jnp.where(mask, h, 0.0), axis=0) \
                        / jnp.maximum(length, 1)
                pooled = pooled.astype(jnp.float32)
                if normalize:
                    pooled = pooled / jnp.maximum(
                        jnp.linalg.norm(pooled), 1e-12)
                return pooled
            return jax.jit(fn)

        out = []
        for ids in prompt_token_ids:
            l_pad = next_bucket(len(ids), self.runner.prefill_buckets)
            key = (l_pad, pooling, normalize)
            if key not in cache:
                cache[key] = make(l_pad)
            toks = np.zeros(l_pad, np.int32)
            toks[:len(ids)] = ids
            out.append(np.asarray(cache[key](params, toks,
                                             np.int32(len(ids)))))
        return out

    # ---- KV transfer (disaggregated prefill, SURVEY C19) --------------

    def _kv_produce(self, seq: Sequence) -> None:
        """Export a finished prefill: pruned KV pages + first token."""
        from ..kv_transfer import prompt_key
        table = seq.block_table
        kv = self.runner.extract_seq_kv(self.kv_caches, table.pages)
        self.kv_pipe.send({
            "key": prompt_key(seq.prompt_token_ids),
            "prompt_len": seq.num_prompt_tokens,
            "kv_len": table.num_kv_slots,
            "kv": kv,
            "first_token": seq.output_token_ids[-1],
        })

    def _kv_consumer_intake(self) -> list[Sequence]:
        """Claim transferred prefills for waiting requests: allocate a
        table, scatter the pages in, append the producer's first token,
        and admit straight to decode (no prefill compute)."""
        from ..kv_transfer import prompt_key
        ingested = []
        for seq in list(self.scheduler.waiting):
            payload = self.kv_lookup.take(prompt_key(seq.prompt_token_ids))
            if payload is None:
                continue
            n_pages = -(-payload["kv_len"] // self.config.cache.block_size)
            if not self.scheduler.allocator.can_allocate(n_pages):
                continue
            from ..core.block_table import BlockTable
            table = BlockTable(self.config.cache.block_size,
                               self.scheduler.allocator)
            table.allocate_prompt(payload["kv_len"])
            self.kv_caches = self.runner.inject_seq_kv(
                self.kv_caches, payload["kv"], table.pages)
            seq.block_table = table
            seq.prefill_pos = seq.num_prompt_tokens
            self.scheduler.admit_prefilled(seq)
            seq.append_token(int(payload["first_token"]))
            ingested.append(seq)
        return ingested

    # ---- pipelined decode windows ------------------------------------

    def _dispatch_decode(self, k_max: int, resume=None, dyn_state=None):
        """Plan + dispatch one decode window (no fetch).  Returns
        (plans, k, handle, sim-end) or None when nothing could be planned
        (resume mode never preempts — the caller just doesn't chain)."""
        plans, k, _pre = self.scheduler.plan_decode_window(k_max,
                                                           resume=resume)
        if k == 0:
            return None
        self.kv_caches, self.page_scores, handle = \
            self.runner.dispatch_decode_window(
                self.params, self.kv_caches, self.page_scores, plans, k,
                dyn_state=dyn_state)
        return (plans, k, handle, self.scheduler.last_window_sim)

    def _can_chain(self, plans) -> bool:
        """A follow-up window may be dispatched before this one's results
        arrive iff no external state can interleave (prefill admission)
        and sampling needs no host-side token feedback (penalty counts)."""
        # Opt-in: on hosts with cheap dispatch, chaining hides the fetch
        # round trip entirely.  On the tunneled bench chip, argument
        # uploads of the chained window serialize against the running
        # window and LOSE throughput (measured 91 -> 51 tok/s), so the
        # default stays synchronous-per-window.
        from .. import envs
        if not envs.VPC_WINDOW_CHAIN:
            return False
        if self.scheduler.num_waiting or self.scheduler.num_swapped \
                or self.config.speculative is not None:
            return False
        for plan in plans:
            p = plan.seq.params
            if (p.presence_penalty != 0.0 or p.frequency_penalty != 0.0
                    or p.repetition_penalty != 1.0):
                return False
            if self.runner._lane_needs_mask(plan.seq):
                # Mask contents depend on commit-time sequence state
                # (FSM cursor / output tail / min-tokens countdown) that a
                # pre-dispatched chained window would compute stale.
                return False
        return True

    def _window_finishes_any(self, batches) -> bool:
        """Conservative host-side preview of the stop checks over fetched
        (but not yet appended) window tokens — before finish_seq may free
        tables, any chained in-flight window must be committed."""
        eos = self.eos_token_id
        max_len = self.config.scheduler.max_model_len
        for plans_b, k_b, toks_b, _lp_b in batches:
            for i, plan in enumerate(plans_b):
                seq, p = plan.seq, plan.seq.params
                if p.stop:       # stop strings: assume they can fire
                    return True
                n0 = seq.num_output_tokens
                for step in range(k_b):
                    n = n0 + step + 1
                    if p.max_tokens is not None and n >= p.max_tokens:
                        return True
                    if seq.get_len() + step + 1 >= max_len:
                        return True
                    if n < p.min_tokens:
                        continue
                    t = int(toks_b[step][i])
                    if (not p.ignore_eos and eos is not None and t == eos) \
                            or t in p.stop_token_ids:
                        return True
        return False

    def _record_logprobs(self, seq, lp_row) -> None:
        """lp_row [2L+1] f32 = (top-L values, top-L ids, chosen-token
        logprob) -> vLLM-style {token_id: logprob} for the last appended
        token; also accumulates the beam-search cumulative score."""
        half = (len(lp_row) - 1) // 2
        d = {int(lp_row[half + j]): float(lp_row[j]) for j in range(half)}
        d[seq.output_token_ids[-1]] = float(lp_row[-1])
        seq.logprobs.append(d)
        seq.cumulative_logprob += float(lp_row[-1])

    def _process_batches(self, batches, results, finished) -> int:
        num_gen = 0
        done: set[str] = set()
        for plans_b, k_b, toks_b, lp_b in batches:
            for i, plan in enumerate(plans_b):
                seq = plan.seq
                if seq.request_id in done or seq.is_finished():
                    continue
                for step in range(k_b):
                    seq.append_token(int(toks_b[step][i]))
                    if lp_b is not None:
                        self._record_logprobs(seq, lp_b[step][i])
                    num_gen += 1
                    if self._postprocess(seq, results, finished,
                                         emit=(step == k_b - 1)):
                        done.add(seq.request_id)
                        break
        return num_gen

    def _drain_inflight(self, results, finished) -> int:
        if self._inflight is None:
            return 0
        plans, k, handle, _sim = self._inflight
        self._inflight = None
        toks, victims, lp = handle.fetch()
        self.scheduler.commit_window(plans, k, victims)
        return self._process_batches([(plans, k, toks, lp)], results,
                                     finished)

    def _decode_pipelined(self, k_max: int, results, finished) -> int:
        """One decode turn with depth-1 window lookahead: fetch window W
        while window W+1 already runs on device — the host<->device round
        trip (46 ms on a tunneled chip) disappears from the critical path."""
        if self._inflight is None:
            self._inflight = self._dispatch_decode(k_max)
            if self._inflight is None:
                return 0
        plans, k, handle, sim = self._inflight
        self._inflight = None
        nxt = (self._dispatch_decode(k_max, resume=sim,
                                     dyn_state=handle.state)
               if self._can_chain(plans) else None)

        toks, victims, lp = handle.fetch()
        self.scheduler.commit_window(plans, k, victims)
        batches = [(plans, k, toks, lp)]
        if nxt is not None and self._window_finishes_any(batches):
            # Someone is about to stop: retire the chained window now so
            # its table/page commits land before finish_seq frees them.
            p2, k2, h2, _ = nxt
            t2, v2, lp2 = h2.fetch()
            self.scheduler.commit_window(p2, k2, v2)
            batches.append((p2, k2, t2, lp2))
            nxt = None
        self._inflight = nxt
        return self._process_batches(batches, results, finished)

    def _postprocess(self, seq: Sequence, results, finished,
                     emit: bool = True) -> bool:
        """Stop-check one appended token; returns True if the sequence
        finished (further window tokens are discarded)."""
        new_text = self._detokenize(seq)
        status = self._check_stop(seq, new_text)
        if status is not None:
            # Flush any held-back partial-UTF8 tail into the final text
            # (no-op when a stop string already truncated the text).
            self._detokenize(seq, flush=True)
            seq.finish_time = time.monotonic()
            self.scheduler.finish_seq(seq, status)
            self.tracer.record_request(seq, seq.finish_time)
            finished.append(seq)
            results.append(self._make_output(seq))
            return True
        if emit:
            results.append(self._make_output(seq))
        return False

    # ------------------------------------------------------------------

    def _detokenize(self, seq: Sequence, flush: bool = False) -> str:
        """Incrementally decode tokens appended since the last call and
        grow seq.output_text by the delta (O(new tokens) per step;
        reference transformers_utils/detokenizer.py)."""
        if self.tokenizer is None:
            return ""
        delta, pre, read = detokenize_incrementally(
            self.tokenizer, seq.output_token_ids,
            seq._detok_prefix_len, seq._detok_read_len, finished=flush)
        seq._detok_prefix_len = pre
        seq._detok_read_len = read
        if delta:
            seq.output_text += delta
        return delta

    def _check_stop(self, seq: Sequence,
                    new_text: str = "") -> Optional[SequenceStatus]:
        p = seq.params
        last = seq.output_token_ids[-1]
        if p.max_tokens is not None and \
                seq.num_output_tokens >= p.max_tokens:
            return SequenceStatus.FINISHED_LENGTH
        if seq.get_len() >= self.config.scheduler.max_model_len:
            return SequenceStatus.FINISHED_LENGTH
        if seq.num_output_tokens < p.min_tokens:
            return None
        if not p.ignore_eos and self.eos_token_id is not None \
                and last == self.eos_token_id:
            return SequenceStatus.FINISHED_STOPPED
        if last in p.stop_token_ids:
            return SequenceStatus.FINISHED_STOPPED
        if p.stop and self.tokenizer is not None and new_text:
            # A stop string can straddle the old/new text boundary: scan
            # only the tail that could contain it (O(1) per step).
            text = seq.output_text
            max_stop = max(len(s) for s in p.stop)
            start = max(0, len(text) - len(new_text) - max_stop + 1)
            for s in p.stop:
                idx = text.find(s, start)
                if idx != -1:
                    seq.output_text = text[:idx]
                    # Pin detok offsets so the finish-flush is a no-op
                    # and cannot append past the truncation point.
                    seq._detok_prefix_len = len(seq.output_token_ids)
                    seq._detok_read_len = len(seq.output_token_ids)
                    return SequenceStatus.FINISHED_STOPPED
        return None

    def _make_output(self, seq: Sequence) -> RequestOutput:
        finished = seq.is_finished()
        # output_text is maintained incrementally by _detokenize; no
        # full re-decode here (was O(n^2) across a request's lifetime).
        text = seq.output_text
        reason = FINISH_REASON.get(seq.status) if finished else None
        return RequestOutput(
            request_id=seq.request_id,
            prompt_token_ids=seq.prompt_token_ids,
            outputs=[CompletionOutput(
                0, text, list(seq.all_output_token_ids), reason,
                logprobs=(list(seq.logprobs) if seq.logprobs else None),
                cumulative_logprob=seq.cumulative_logprob)],
            finished=finished,
            metrics=RequestMetrics(
                arrival_time=seq.arrival_time,
                first_token_time=seq.first_token_time,
                finished_time=seq.finish_time,
                num_preemptions=seq.num_preemptions))
