"""Prompt adapters (soft-prompt virtual prefixes): oracle parity + slot
management.  Reference analog: vllm/prompt_adapter/ + tests/prompt_adapter/.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.ops.attention import prefill_attention
from vllm_paged_compression_tpu.prompt_adapter import PromptAdapterRequest
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 512,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}

PROMPT = [1, 17, 33, 5, 99, 2, 8, 61]


def _llm(**kw):
    return LLM(hf_config=CFG, dtype="float32", block_size=4,
               max_model_len=256, num_device_blocks=64, seed=0,
               enable_prompt_adapter=True, max_prompt_adapter_tokens=8,
               max_num_seqs=4, **kw)


def _oracle(llm, virtual, prompt, n_tokens):
    """Greedy continuation via full-context forwards with the adapter
    embeddings prepended (no paging)."""
    model = llm.engine.model
    params = llm.engine.params
    scale = model.arch.head_dim ** -0.5
    ids = list(prompt)
    out = []
    for _ in range(n_tokens):
        emb = model.embed(params, jnp.asarray(ids))
        full = jnp.concatenate([jnp.asarray(virtual, emb.dtype), emb])
        t = full.shape[0]
        h, _ = model.forward_hidden(
            params, jnp.zeros(t, jnp.int32), jnp.arange(t),
            lambda q, k, v, s: (prefill_attention(q, k, v, scale, t), s),
            input_embeds=full)
        tok = int(jnp.argmax(model.logits(params, h)[-1]))
        out.append(tok)
        ids.append(tok)
    return out


def test_prompt_adapter_matches_oracle():
    llm = _llm()
    rng = np.random.default_rng(0)
    virtual = rng.standard_normal((5, 64)).astype(np.float32) * 0.1
    llm.engine.add_prompt_adapter(7, virtual)
    outs = llm.generate(
        prompt_token_ids=[PROMPT],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=10),
        prompt_adapter_request=PromptAdapterRequest(7))
    got = list(outs[0].outputs[0].token_ids)
    assert got == _oracle(llm, virtual, PROMPT, 10)


def test_prompt_adapter_writes_virtual_kv_and_slots_recycle():
    """The prefix KV written for an adapted request must differ from the
    placeholder-token KV (direct evidence the embedding splice ran —
    token-level assertions are useless on a near-degenerate tiny model)."""
    llm = _llm()
    eng = llm.engine
    rng = np.random.default_rng(1)
    virtual = rng.standard_normal((6, 64)).astype(np.float32) * 50
    eng.add_prompt_adapter(1, virtual)
    padded = [0] * 6 + PROMPT       # what the adapter request expands to
    sp = SamplingParams(temperature=0.0, max_tokens=1)
    eng.add_request(request_id="plain", prompt_token_ids=padded,
                    sampling_params=sp)
    eng.add_request(request_id="pa", prompt_token_ids=PROMPT,
                    sampling_params=sp,
                    prompt_adapter_request=PromptAdapterRequest(1))
    seqs = {s.request_id: s for s in eng.scheduler.waiting}
    tables = {}
    orig_free = eng.scheduler._release

    def no_free(seq):
        tables[seq.request_id] = list(seq.block_table.pages)
        return orig_free(seq)

    eng.scheduler._release = no_free
    while eng.has_unfinished_requests():
        eng.step()
    assert seqs["pa"].prompt_token_ids == padded
    k = np.asarray(eng.kv_caches[0])
    kp = k[:, tables["plain"]][:, :2]   # first 2 pages = 8 tokens
    ka = k[:, tables["pa"]][:, :2]
    flat_p = kp.reshape(kp.shape[0], -1, *kp.shape[3:])
    flat_a = ka.reshape(ka.shape[0], -1, *ka.shape[3:])
    # Layer 0: the first 6 rows (virtual prefix) differ, rows 6..7 (real
    # tokens, same positions) are identical.  (Later layers differ
    # everywhere — their inputs depend on the prefix through attention.)
    assert np.abs(flat_p[0, :6] - flat_a[0, :6]).max() > 0.05
    np.testing.assert_allclose(flat_p[0, 6:8], flat_a[0, 6:8], atol=1e-5)

    eng.remove_prompt_adapter(1)
    for i in range(2, 2 + 4):     # fills all 4 slots again
        eng.add_prompt_adapter(
            i, rng.standard_normal((3, 64)).astype(np.float32))
    with pytest.raises(RuntimeError, match="no free"):
        eng.add_prompt_adapter(
            99, rng.standard_normal((3, 64)).astype(np.float32))
    llm.engine.remove_prompt_adapter(1)
    for i in range(2, 2 + 4):     # fills all 4 slots again
        llm.engine.add_prompt_adapter(
            i, rng.standard_normal((3, 64)).astype(np.float32))
    with pytest.raises(RuntimeError, match="no free"):
        llm.engine.add_prompt_adapter(
            99, rng.standard_normal((3, 64)).astype(np.float32))


def test_prompt_adapter_rejects_oversize():
    llm = _llm()
    with pytest.raises(ValueError, match="virtual tokens"):
        llm.engine.add_prompt_adapter(
            1, np.zeros((9, 64), np.float32))
