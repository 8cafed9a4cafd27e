"""Sampler behavior (reference analog: tests/samplers/)."""

import numpy as np

import jax
import jax.numpy as jnp

from vllm_paged_compression_tpu.ops.sampling import (SamplingTensors,
                                                     apply_penalties, sample)


def make_tensors(b, temperature=0.0, top_p=1.0, top_k=-1, seed=0):
    return SamplingTensors(
        temperature=jnp.full((b,), temperature, jnp.float32),
        top_p=jnp.full((b,), top_p, jnp.float32),
        top_k=jnp.full((b,), top_k, jnp.int32),
        seed=seed + jnp.arange(b, dtype=jnp.int32),
        step=jnp.zeros(b, jnp.int32))


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.standard_normal((5, 50)), jnp.float32)
    ids = sample(logits, make_tensors(5, temperature=0.0))
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_top_k_restricts_support():
    logits = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0]] * 64, jnp.float32)
    t = make_tensors(64, temperature=1.0, top_k=2)
    ids = np.asarray(sample(logits, t))
    assert set(ids.tolist()) <= {3, 4}


def test_top_p_restricts_support():
    # token 4 has ~98% mass; top_p=0.5 keeps only it.
    logits = jnp.array([[0.0, 0.0, 0.0, 0.0, 5.0]] * 32, jnp.float32)
    t = make_tensors(32, temperature=1.0, top_p=0.5)
    ids = np.asarray(sample(logits, t))
    assert set(ids.tolist()) == {4}


def test_sampling_respects_distribution():
    logits = jnp.array([[np.log(0.7), np.log(0.3)]] * 512, jnp.float32)
    t = make_tensors(512, temperature=1.0, seed=123)
    ids = np.asarray(sample(logits, t))
    frac = (ids == 0).mean()
    assert 0.6 < frac < 0.8


def test_penalties():
    logits = jnp.array([[2.0, 1.0, -1.0]], jnp.float32)
    counts = jnp.array([[3, 0, 1]], jnp.int32)
    out = apply_penalties(logits, counts,
                          presence=jnp.array([0.5]),
                          frequency=jnp.array([0.1]),
                          repetition=jnp.array([2.0]))
    out = np.asarray(out)[0]
    # token0: 2.0 - 0.5 - 0.3 = 1.2, then /2 (seen, positive) = 0.6
    assert np.isclose(out[0], 0.6)
    # token1: untouched
    assert np.isclose(out[1], 1.0)
    # token2: -1 - 0.5 - 0.1 = -1.6, then *2 (seen, negative) = -3.2
    assert np.isclose(out[2], -3.2)


class TestPenalties:
    CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "max_position_embeddings": 512,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True, "eos_token_id": None}

    def _gen(self, **sp_kw):
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import SamplingParams
        llm = LLM(hf_config=self.CFG, dtype="float32", block_size=16,
                  max_model_len=256, num_device_blocks=48, seed=0,
                  max_num_seqs=4, num_scheduler_steps=4)
        sp = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True, **sp_kw)
        outs = llm.generate(prompt_token_ids=[list(range(1, 40))],
                            sampling_params=sp)
        return outs[0].outputs[0].token_ids

    def test_repetition_penalty_reduces_repeats(self):
        """Tiny random models degenerate into one repeated token greedily;
        a strong repetition penalty must break the loop."""
        plain = self._gen()
        assert len(set(plain)) <= 3  # the degenerate baseline
        penalized = self._gen(repetition_penalty=50.0)
        assert len(set(penalized)) > len(set(plain))

    def test_presence_penalty_changes_output(self):
        plain = self._gen()
        pres = self._gen(presence_penalty=6.0)
        assert pres != plain

    def test_zero_penalties_match_greedy_fast_path(self):
        """Explicit no-op penalties route through the penalty-enabled jit
        and must reproduce the greedy fast path exactly."""
        fast = self._gen()
        slow = self._gen(repetition_penalty=1.0 + 1e-12)
        assert fast == slow
