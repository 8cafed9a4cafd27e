"""Chunked prefill x paged eviction — the superset combination both the
fork and upstream reject (vllm/engine/arg_utils.py:1185,
torch_cuda_sdpa.py:877).  Semantics here: chunks write full pages; the
final chunk scores the whole prompt, compacts each layer's keep set into
the leading pages (attend-then-evict ordering), and the scheduler
shrinks the block table to the pruned size."""

import pytest

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def _gen(enable_chunked, method, prompt, max_tokens=24, **kw):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method=method,
              cache_budget=128, evict_selection="l2",
              enable_chunked_prefill=enable_chunked,
              max_num_batched_tokens=64 if enable_chunked else 8192,
              disable_evict_prefill=True,   # attend-then-evict ordering
              num_scheduler_steps=4, **kw)
    outs = llm.generate(prompt_token_ids=[list(prompt)],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=max_tokens))
    eng = llm.engine
    return outs[0].outputs[0].token_ids, eng


@pytest.mark.parametrize("method", ["global", "streamingLLM"])
def test_chunked_matches_nonchunked_attend_then_evict(method):
    prompt = [(i * 7) % 127 + 1 for i in range(200)]
    toks_plain, _ = _gen(False, method, prompt)
    toks_chunk, eng = _gen(True, method, prompt)
    assert toks_chunk == toks_plain, (toks_chunk, toks_plain)


def test_table_shrinks_to_budget_and_pages_released():
    prompt = [(i * 5) % 127 + 1 for i in range(200)]
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, evict_selection="l2",
              enable_chunked_prefill=True, max_num_batched_tokens=64,
              disable_evict_prefill=True, num_scheduler_steps=1)
    eng = llm.engine
    eng.add_request(prompt_token_ids=prompt,
                    sampling_params=SamplingParams(temperature=0.0,
                                                   max_tokens=2))
    free0 = eng.scheduler.allocator.num_free_blocks
    # Step through the chunks; right after the final chunk the table
    # must hold only ceil(stored/bs) pages.
    for _ in range(16):
        eng.step()
        running = eng.scheduler.running
        if running and running[0].num_output_tokens >= 1:
            break
    seq = running[0]
    from vllm_paged_compression_tpu.core.paging import (
        num_required_blocks_after_prune)
    blocks, stored = num_required_blocks_after_prune(
        200, eng.config.cache.paged_evict, 16)
    # +1: the first decode token may have opened a fresh page.
    assert seq.block_table.num_pages <= blocks + 1, \
        (seq.block_table.num_pages, blocks)
    assert seq.block_table.num_kv_slots <= stored + 1
    while eng.has_unfinished_requests():
        eng.step()
    assert eng.scheduler.allocator.num_free_blocks == \
        eng.scheduler.allocator.num_blocks


@pytest.mark.parametrize("method", ["global", "streamingLLM"])
def test_pp_chunked_evict_matches_single_stage(method):
    """Chunked prefill x eviction under PP (the last config-rejected
    chunked composition, lifted round 5): the staged final-chunk prune
    wave produces the same tokens as the single-stage program."""
    prompt = [(i * 7) % 127 + 1 for i in range(200)]
    toks_plain, _ = _gen(True, method, prompt)
    toks_pp, eng = _gen(True, method, prompt, pipeline_parallel_size=2)
    assert toks_pp == toks_plain, (toks_pp, toks_plain)


def test_ppxtp_chunked_evict_matches_single_stage():
    prompt = [(i * 11) % 127 + 1 for i in range(200)]
    toks_plain, _ = _gen(True, "global", prompt)
    toks_pt, _ = _gen(True, "global", prompt, pipeline_parallel_size=2,
                      tensor_parallel_size=2)
    assert toks_pt == toks_plain, (toks_pt, toks_plain)


def test_chunked_prune_seeds_page_scores():
    """After a chunked x eviction prefill with L2 selection, the KEPT
    pages' value-L2 scores must be seeded (regression: the final-chunk
    prune program used to leave page_scores at the zero init, so the
    first decode-boundary victim argmin read all-zero scores)."""
    import numpy as np
    prompt = [(i * 7) % 127 + 1 for i in range(200)]
    _, eng = _gen(True, "global", prompt, max_tokens=2)
    seq_pages = None
    # the request finished; recover its kept pages from the last table
    # the scheduler saw via a fresh identical request stopped mid-way
    eng2 = None
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, evict_selection="l2",
              enable_chunked_prefill=True, max_num_batched_tokens=64,
              disable_evict_prefill=True, num_scheduler_steps=1)
    eng2 = llm.engine
    eng2.add_request(prompt_token_ids=prompt,
                     sampling_params=SamplingParams(temperature=0.0,
                                                    max_tokens=4))
    for _ in range(20):
        eng2.step()
        running = eng2.scheduler.running
        if running and running[0].num_output_tokens >= 1:
            break
    seq_pages = list(running[0].block_table.pages)
    scores = np.asarray(eng2.page_scores)
    kept = scores[seq_pages[:-1]]   # last page may be mid-fill
    assert (kept > 0).all(), (seq_pages, kept)


def test_chunked_evict_with_quantized_kv():
    """The final-chunk prune program dequantizes int8 pools for scoring
    and re-quantizes the compacted keep set — generation completes and
    the table still shrinks."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, evict_selection="l2",
              kv_cache_dtype="int8", enable_chunked_prefill=True,
              max_num_batched_tokens=64, disable_evict_prefill=True,
              num_scheduler_steps=4)
    prompt = [(i * 13) % 127 + 1 for i in range(200)]
    outs = llm.generate(prompt_token_ids=[prompt],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=16))
    assert len(outs[0].outputs[0].token_ids) == 16
    alloc = llm.engine.scheduler.allocator
    assert alloc.num_free_blocks == alloc.num_blocks
