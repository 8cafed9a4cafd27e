"""CLI argument surface (reference vllm/engine/arg_utils.py).

Reproduces the fork's eviction flags exactly (arg_utils.py:971-1036:
--enable-paged-eviction --disable-evict-prefill --cache-prune-type
--evict-method --cache-budget --topk-blocks) plus the TPU-native extensions,
and enforces the CLI-level constraints the reference asserts (budget >= 128,
vllm/config.py:971; eviction rejects chunked prefill, arg_utils.py:1185).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from ..config import (CacheConfig, EngineConfig, ModelConfig,
                      PagedEvictConfig, ParallelConfig, SchedulerConfig,
                      EVICT_METHODS)


@dataclasses.dataclass
class EngineArgs:
    model: str = ""
    tokenizer: Optional[str] = None
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: int = 8192
    quantization: Optional[str] = None
    block_size: int = 16
    gpu_memory_utilization: float = 0.9
    num_device_blocks: Optional[int] = None
    kv_cache_dtype: str = "auto"
    max_num_seqs: int = 64
    max_num_batched_tokens: int = 8192
    num_scheduler_steps: int = 1
    stream_scheduler_steps: int = 8
    scheduling_policy: str = "fcfs"
    preemption_mode: str = "recompute"
    swap_space: float = 4.0
    enable_chunked_prefill: bool = False
    enable_prefix_caching: bool = False
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # LoRA
    enable_lora: bool = False
    max_loras: int = 4
    max_lora_rank: int = 16
    # speculative decoding
    num_speculative_tokens: Optional[int] = None
    ngram_prompt_lookup_max: int = 3
    ngram_prompt_lookup_min: int = 1
    speculative_method: str = "ngram"
    speculative_draft_model: str = ""
    speculative_draft_window: int = 128
    speculative_heads: str = ""
    speculative_eagle_model: str = ""
    spec_decoding_acceptance_method: str = "rejection_sampler"
    typical_acceptance_sampler_posterior_threshold: float = 0.09
    typical_acceptance_sampler_posterior_alpha: float = 0.3
    # paged eviction (fork surface)
    hf_config_json: Optional[str] = None
    enable_paged_eviction: bool = False
    disable_evict_prefill: bool = False
    cache_prune_type: str = "budget"
    evict_method: str = "streamingLLM"
    cache_budget: int = 1024
    topk_blocks: int = -1
    evict_freq: int = 1
    # TPU-native extensions
    evict_selection: str = "l2"

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        g = parser.add_argument_group("model")
        g.add_argument("--model", type=str, default="")
        g.add_argument("--tokenizer", type=str, default=None)
        g.add_argument("--dtype", type=str, default="bfloat16",
                       choices=["bfloat16", "float32", "float16"])
        g.add_argument("--seed", type=int, default=0)
        g.add_argument("--max-model-len", type=int, default=8192)
        g.add_argument("--quantization", "-q", type=str, default=None,
                       choices=["int8", "int4"])
        g.add_argument("--hf-config-json", type=str, default=None,
                       help="inline JSON architecture config for "
                            "synthetic-weight serving/benchmarks (used "
                            "when --model is empty)")

        g = parser.add_argument_group("cache")
        g.add_argument("--block-size", type=int, default=16,
                       choices=[8, 16, 32, 64, 128])
        g.add_argument("--gpu-memory-utilization", type=float, default=0.9)
        g.add_argument("--num-device-blocks", type=int, default=None)
        g.add_argument("--kv-cache-dtype", type=str, default="auto")

        g = parser.add_argument_group("scheduler")
        g.add_argument("--max-num-seqs", type=int, default=64)
        g.add_argument("--max-num-batched-tokens", type=int, default=8192)
        g.add_argument("--num-scheduler-steps", type=int, default=1)
        g.add_argument("--stream-scheduler-steps", type=int, default=8)
        g.add_argument("--scheduling-policy", type=str, default="fcfs",
                       choices=["fcfs", "priority"])
        g.add_argument("--preemption-mode", type=str, default="recompute",
                       choices=["recompute", "swap"],
                       help="what preemption does with the victim's KV "
                            "(reference PreemptionMode)")
        g.add_argument("--swap-space", type=float, default=4.0,
                       help="host swap space in GiB for "
                            "--preemption-mode swap (reference "
                            "CacheConfig.swap_space)")
        g.add_argument("--enable-chunked-prefill", action="store_true")
        g.add_argument("--enable-prefix-caching", action="store_true")

        g = parser.add_argument_group("lora")
        g.add_argument("--enable-lora", action="store_true")
        g.add_argument("--max-loras", type=int, default=4)
        g.add_argument("--max-lora-rank", type=int, default=16)

        g = parser.add_argument_group("speculative decoding")
        g.add_argument("--num-speculative-tokens", type=int, default=None,
                       help="enable ngram speculative decoding with this "
                            "many proposed tokens per step")
        g.add_argument("--ngram-prompt-lookup-max", type=int, default=3)
        g.add_argument("--ngram-prompt-lookup-min", type=int, default=1)
        g.add_argument("--speculative-method", type=str, default="ngram",
                       choices=["ngram", "draft", "medusa",
                                "mlp_speculator", "eagle"])
        g.add_argument("--speculative-draft-model", type=str, default="",
                       help="HF path of the small draft model "
                            "(--speculative-method draft)")
        g.add_argument("--speculative-draft-window", type=int, default=128)
        g.add_argument(
            "--spec-decoding-acceptance-method", type=str,
            default="rejection_sampler",
            choices=["rejection_sampler", "typical_acceptance_sampler"],
            help="verification policy for stochastic speculative batches")
        g.add_argument(
            "--typical-acceptance-sampler-posterior-threshold",
            type=float, default=0.09)
        g.add_argument(
            "--typical-acceptance-sampler-posterior-alpha",
            type=float, default=0.3)
        g.add_argument("--speculative-heads", type=str, default="",
                       help="safetensors dir with Medusa / mlp_speculator "
                            "heads")
        g.add_argument("--speculative-eagle-model", type=str, default="",
                       help="EAGLE checkpoint dir (fc + 1-layer decoder, "
                            "--speculative-method eagle)")

        g = parser.add_argument_group("parallel")
        g.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
        g.add_argument("--data-parallel-size", "-dp", type=int, default=1)
        g.add_argument("--pipeline-parallel-size", "-pp", type=int,
                       default=1)

        g = parser.add_argument_group(
            "paged eviction",
            "online KV-cache compression "
            "(reference arg_utils.py:971-1036)")
        g.add_argument("--enable-paged-eviction", action="store_true")
        g.add_argument("--disable-evict-prefill", action="store_true")
        g.add_argument("--cache-prune-type", type=str, default="budget",
                       choices=["budget", "percentage"])
        g.add_argument("--evict-method", type=str, default="streamingLLM",
                       choices=list(EVICT_METHODS))
        g.add_argument("--cache-budget", type=int, default=1024)
        g.add_argument("--topk-blocks", type=int, default=-1)
        g.add_argument("--evict-freq", type=int, default=1,
                       help="evict at every Nth page boundary past the "
                            "budget (1 = every boundary; the old "
                            "README's --evict-freq, README.md:36-45)")
        g.add_argument("--evict-selection", type=str, default="l2",
                       choices=["l2", "random"])
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in fields})

    def create_engine_config(self) -> EngineConfig:
        evict = None
        if self.enable_paged_eviction:
            if (self.cache_prune_type == "budget"
                    and self.cache_budget < 128):
                raise ValueError("cache_budget must be >= 128 "
                                 "(reference vllm/config.py:971)")
            evict = PagedEvictConfig(
                enabled=True,
                disable_evict_prefill=self.disable_evict_prefill,
                cache_prune_type=self.cache_prune_type,
                evict_method=self.evict_method,
                cache_budget=self.cache_budget,
                topk_blocks=self.topk_blocks,
                evict_freq=self.evict_freq,
                selection=self.evict_selection)
        hf_config = None
        if self.hf_config_json and not self.model:
            import json
            hf_config = json.loads(self.hf_config_json)
        cfg = EngineConfig(
            model=ModelConfig(model=self.model, tokenizer=self.tokenizer,
                              hf_config=hf_config,
                              dtype=self.dtype, seed=self.seed,
                              max_model_len=self.max_model_len,
                              weight_dtype=self.quantization),
            cache=CacheConfig(
                block_size=self.block_size,
                gpu_memory_utilization=self.gpu_memory_utilization,
                num_device_blocks=self.num_device_blocks,
                cache_dtype=self.kv_cache_dtype,
                enable_prefix_caching=self.enable_prefix_caching,
                swap_space_gb=self.swap_space,
                paged_evict=evict),
            scheduler=SchedulerConfig(
                max_num_seqs=self.max_num_seqs,
                max_num_batched_tokens=self.max_num_batched_tokens,
                max_model_len=self.max_model_len,
                policy=self.scheduling_policy,
                preemption_mode=self.preemption_mode,
                enable_chunked_prefill=self.enable_chunked_prefill,
                num_scheduler_steps=self.num_scheduler_steps,
                stream_scheduler_steps=self.stream_scheduler_steps),
            parallel=ParallelConfig(
                tensor_parallel_size=self.tensor_parallel_size,
                data_parallel_size=self.data_parallel_size,
                pipeline_parallel_size=self.pipeline_parallel_size))
        if self.enable_lora:
            from ..lora import LoRAConfig
            cfg.lora = LoRAConfig(max_loras=self.max_loras,
                                  max_lora_rank=self.max_lora_rank)
        if self.num_speculative_tokens is not None:
            from ..spec_decode import SpeculativeConfig
            cfg.speculative = SpeculativeConfig(
                method=self.speculative_method,
                num_speculative_tokens=self.num_speculative_tokens,
                ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
                ngram_prompt_lookup_min=self.ngram_prompt_lookup_min,
                draft_model=self.speculative_draft_model,
                draft_window=self.speculative_draft_window,
                heads_path=self.speculative_heads,
                eagle_model=self.speculative_eagle_model,
                acceptance_method=self.spec_decoding_acceptance_method,
                typical_posterior_threshold=(
                    self.typical_acceptance_sampler_posterior_threshold),
                typical_posterior_alpha=(
                    self.typical_acceptance_sampler_posterior_alpha))
        cfg.verify()
        return cfg
