"""Percentage prune type (cache_prune_type="percentage"): cache_budget
is a percent of each sequence's prompt length, resolved per request.
The reference names this type in its configs but asserts it away
(vllm/config.py:969) — here it is defined: a SURVEY §0 superset item."""

import pytest

from vllm_paged_compression_tpu.config import (PagedEvictConfig,
                                               resolve_evict_budget)

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


class TestResolve:
    def test_budget_mode_passthrough(self):
        ev = PagedEvictConfig(cache_budget=256)
        assert resolve_evict_budget(ev, 1000, 16) == 256

    def test_percentage_rounds_to_pages_and_floors(self):
        ev = PagedEvictConfig(cache_prune_type="percentage",
                              cache_budget=50)
        ev.verify(16)
        assert resolve_evict_budget(ev, 1000, 16) == 496   # 500 -> 496
        assert resolve_evict_budget(ev, 100, 16) == 48     # floor 3 pages
        assert resolve_evict_budget(ev, 0, 16,
                                    max_model_len=8192) == 4096

    def test_verify_rejects_bad_percent(self):
        with pytest.raises(ValueError, match="1, 100"):
            PagedEvictConfig(cache_prune_type="percentage",
                             cache_budget=1024).verify(16)


class TestEngine:
    def _gen(self, prune_type, budget, prompt_len=200, method="global"):
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
                  max_model_len=512, num_device_blocks=64, seed=0,
                  enable_paged_eviction=True, evict_method=method,
                  cache_prune_type=prune_type, cache_budget=budget,
                  evict_selection="l2", num_scheduler_steps=4)
        prompt = [(i * 11) % 127 + 1 for i in range(prompt_len)]
        outs = llm.generate(prompt_token_ids=[prompt],
                            sampling_params=SamplingParams(
                                temperature=0.0, max_tokens=16))
        return outs[0].outputs[0].token_ids, llm.engine

    def test_percentage_matches_equivalent_token_budget(self):
        # 50% of a 200-token prompt resolves to 96 tokens (page-rounded)
        assert resolve_evict_budget(
            PagedEvictConfig(cache_prune_type="percentage",
                             cache_budget=50), 200, 16) == 96
        toks_pct, eng = self._gen("percentage", 50)
        toks_tok, _ = self._gen("budget", 96)
        assert toks_pct == toks_tok

    def test_per_request_budgets_differ(self):
        """Two prompts of different lengths get different budgets in the
        same engine — the defining property of the percentage type."""
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
                  max_model_len=512, num_device_blocks=64, seed=0,
                  enable_paged_eviction=True, evict_method="global",
                  cache_prune_type="percentage", cache_budget=50,
                  evict_selection="l2", num_scheduler_steps=4)
        eng = llm.engine
        eng.add_request(request_id="short",
                        prompt_token_ids=list(range(1, 101)),
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=4))
        eng.add_request(request_id="long",
                        prompt_token_ids=list(range(1, 401)),
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=4))
        budgets = {}
        while eng.has_unfinished_requests():
            eng.step()
            for s in eng.scheduler.running:
                budgets[s.request_id] = s.evict_budget
        assert budgets["short"] == 48     # floor(50% of 100) -> 3 pages
        assert budgets["long"] == 192     # 50% of 400, page-rounded


def test_percentage_with_chunked_prefill_eviction():
    """percentage budgets compose with chunked prefill x eviction: the
    final-chunk prune uses the per-request resolved budget."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_prune_type="percentage", cache_budget=50,
              evict_selection="l2", enable_chunked_prefill=True,
              max_num_batched_tokens=64, disable_evict_prefill=True,
              num_scheduler_steps=1)
    eng = llm.engine
    prompt = [(i * 3) % 127 + 1 for i in range(200)]   # budget -> 96
    eng.add_request(prompt_token_ids=prompt,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=4))
    for _ in range(24):
        eng.step()
        running = eng.scheduler.running
        if running and running[0].num_output_tokens >= 1:
            break
    seq = running[0]
    assert seq.evict_budget == 96
    # stored <= budget + tail page slack, far below the 13-page prompt
    assert seq.block_table.num_pages <= 96 // 16 + 2
    while eng.has_unfinished_requests():
        eng.step()
    alloc = eng.scheduler.allocator
    assert alloc.num_free_blocks == alloc.num_blocks
