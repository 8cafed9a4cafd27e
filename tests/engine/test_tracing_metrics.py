"""Tracing + metrics subsystems (reference analogs: tests/tracing/,
engine/metrics.py counters)."""

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 256,
    "tie_word_embeddings": True,
}


def test_request_spans_recorded():
    llm = LLM(hf_config=TINY, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64)
    llm.generate(prompt_token_ids=[[1, 2, 3], [4, 5, 6, 7]],
                 sampling_params=SamplingParams(temperature=0.0,
                                                max_tokens=4))
    spans = llm.engine.tracer.spans
    assert len(spans) == 2
    for s in spans:
        assert s.name == "llm_request"
        a = s.attributes
        assert a["gen_ai.usage.completion_tokens"] == 4
        assert a["gen_ai.latency.e2e"] > 0
        assert a["gen_ai.latency.time_to_first_token"] is not None


def test_metrics_counters():
    llm = LLM(hf_config=TINY, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64)
    llm.generate(prompt_token_ids=[[1, 2, 3]],
                 sampling_params=SamplingParams(temperature=0.0,
                                                max_tokens=5))
    snap = llm.engine.metrics.snapshot()
    assert snap["num_finished"] == 1
    assert snap["num_prompt_tokens"] == 3
    assert snap["num_generation_tokens"] == 5
    assert snap["kv_cache_usage"] == 0.0
