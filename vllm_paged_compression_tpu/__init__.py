"""TPU-native paged-compression LLM serving engine.

A from-scratch JAX/XLA/Pallas serving stack with the capabilities of the
reference vLLM fork `krishnateja95/vllm-Paged-Compression`: paged KV-cache
attention with online per-request eviction (streamingLLM / value-L2 local /
global block scoring), continuous batching, tensor-parallel execution over a
TPU mesh, and an OpenAI-compatible serving front end.
"""

from .config import (CacheConfig, EngineConfig, ModelConfig, PagedEvictConfig,
                     ParallelConfig, SchedulerConfig)
from .sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelConfig",
    "PagedEvictConfig",
    "ParallelConfig",
    "SamplingParams",
    "SchedulerConfig",
    "LLM",
    "LLMEngine",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import vllm_paged_compression_tpu` light (no JAX
    # initialization) for config-only consumers like the CLI parser.
    if name == "LLM":
        from .entrypoints.llm import LLM
        return LLM
    if name == "LLMEngine":
        from .engine.llm_engine import LLMEngine
        return LLMEngine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
