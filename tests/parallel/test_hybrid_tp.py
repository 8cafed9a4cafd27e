"""TP for the hybrid state-slot families (Jamba / BART / Mllama): sharded
engine execution on the virtual CPU mesh must be token-identical to
single-device execution.  The reference serves these families under the
same megatron Column/RowParallel pattern (vllm/model_executor/models/
jamba.py:95-230, bart.py BartAttention, mllama.py
MllamaTextCrossAttention); here the name-keyed NamedShardings
(parallel/mesh.py hybrid_param_shardings) + rank-keyed state-pool specs
let GSPMD insert the collectives."""

import numpy as np
import pytest

import jax

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

JAMBA_CFG = {
    "architectures": ["JambaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 96,
    "num_hidden_layers": 4, "num_attention_heads": 4,
    "num_key_value_heads": 2, "num_experts": 4, "num_experts_per_tok": 2,
    "expert_layer_period": 2, "expert_layer_offset": 1,
    "attn_layer_period": 4, "attn_layer_offset": 2,
    "mamba_d_state": 8, "mamba_d_conv": 4, "mamba_expand": 2,
    "tie_word_embeddings": False, "rms_norm_eps": 1e-6,
    "eos_token_id": None,
}

BART_CFG = {
    "architectures": ["BartForConditionalGeneration"],
    "vocab_size": 128, "d_model": 32, "encoder_layers": 2,
    "decoder_layers": 2, "encoder_attention_heads": 4,
    "decoder_attention_heads": 4, "encoder_ffn_dim": 64,
    "decoder_ffn_dim": 64, "max_position_embeddings": 64,
    "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": None,
    "decoder_start_token_id": 2, "forced_bos_token_id": None,
    "scale_embedding": False, "activation_function": "gelu",
}

MLLAMA_CFG = {
    "architectures": ["MllamaForConditionalGeneration"],
    "model_type": "mllama",
    "vision_config": dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_global_layers=1, attention_heads=4, image_size=16,
        patch_size=8, max_num_tiles=2, intermediate_layers_indices=[1],
        vision_output_dim=32 * 2, norm_eps=1e-5,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]]),
    "text_config": dict(
        vocab_size=120, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, rope_theta=10000.0,
        rms_norm_eps=1e-5, max_position_embeddings=256,
        cross_attention_layers=[1, 3], tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0),
    "image_token_index": 116, "eos_token_id": None,
}

PROMPT = [3, 77, 15, 42, 9, 88, 21, 5]


@pytest.fixture(scope="module", autouse=True)
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def _generate(cfg, tp, prompt, n=10):
    kw = {"tensor_parallel_size": tp} if tp > 1 else {}
    llm = LLM(hf_config=dict(cfg), dtype="float32", max_model_len=64,
              num_device_blocks=8, seed=0, **kw)
    outs = llm.generate(
        prompt_token_ids=[list(prompt)],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                       ignore_eos=True))
    return list(outs[0].outputs[0].token_ids)


@pytest.mark.parametrize("cfg,prompt", [
    pytest.param(JAMBA_CFG, PROMPT, id="jamba"),
    pytest.param(BART_CFG, [5, 17, 9, 33, 42, 8], id="bart"),
    pytest.param(MLLAMA_CFG, PROMPT, id="mllama-text"),
])
def test_tp2_token_identical(cfg, prompt):
    want = _generate(cfg, 1, prompt)
    got = _generate(cfg, 2, prompt)
    assert got == want


def test_jamba_tp4_and_batched():
    """tp=4 (kv heads < shards on attention layers exercises GSPMD's
    uneven-head handling) + a mixed-length batch."""
    cfg = dict(JAMBA_CFG)
    prompts = [[1, 5, 9], [22, 41, 3, 17, 8], [7] * 10]

    def run(tp):
        kw = {"tensor_parallel_size": tp} if tp > 1 else {}
        llm = LLM(hf_config=dict(cfg), dtype="float32", max_model_len=64,
                  num_device_blocks=8, seed=0, max_num_seqs=4, **kw)
        outs = llm.generate(
            prompt_token_ids=[list(p) for p in prompts],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True))
        return [list(o.outputs[0].token_ids) for o in outs]

    assert run(4) == run(1)


class TestMllamaPipeline:
    """Mllama PP: cross-attention layers sit on a regular period
    (cross_attention_layers=[1, 3] here, [3, 8, 13, ...] in real
    Llama-3.2-Vision), so the Jamba period-block machinery applies;
    host-encoded vision states reach every stage's prefill wave tick
    via the replicated batch."""

    def _run(self, pp=1, tp=1, image=False, n=8):
        kw = {}
        if pp > 1:
            kw["pipeline_parallel_size"] = pp
        if tp > 1:
            kw["tensor_parallel_size"] = tp
        llm = LLM(hf_config=dict(MLLAMA_CFG), dtype="float32",
                  max_model_len=64, num_device_blocks=8, seed=0,
                  max_num_seqs=4, **kw)
        gen_kw = {}
        prompt = list(PROMPT)
        if image:
            rng = np.random.default_rng(7)
            tiles = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
            prompt = [MLLAMA_CFG["image_token_index"], 4, 9, 13, 27]
            gen_kw["multi_modal_data"] = {"image": tiles,
                                          "aspect_ratio_id": 2}
        outs = llm.generate(
            prompt_token_ids=[prompt],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                           ignore_eos=True), **gen_kw)
        return list(outs[0].outputs[0].token_ids)

    def test_pp2_text_token_identical(self):
        assert self._run(pp=2) == self._run()

    def test_pp2_batched_text(self):
        """b=4 over 2 stages: 2-lane microbatches through the wave."""
        prompts = [[1, 5, 9], [22, 41, 3, 17, 8], [90, 2], [7] * 9]

        def run(pp):
            kw = {"pipeline_parallel_size": pp} if pp > 1 else {}
            llm = LLM(hf_config=dict(MLLAMA_CFG), dtype="float32",
                      max_model_len=64, num_device_blocks=8, seed=0,
                      max_num_seqs=4, **kw)
            outs = llm.generate(
                prompt_token_ids=[list(p) for p in prompts],
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=6,
                                               ignore_eos=True))
            return [list(o.outputs[0].token_ids) for o in outs]

        assert run(2) == run(1)

    def test_pp2_tp2_image_token_identical(self):
        assert self._run(pp=2, tp=2, image=True) == self._run(image=True)

    def test_pp_rejects_aperiodic_cross(self):
        cfg = dict(MLLAMA_CFG)
        cfg["text_config"] = dict(cfg["text_config"],
                                  cross_attention_layers=[0, 3])
        with pytest.raises(ValueError, match="periodic"):
            LLM(hf_config=cfg, dtype="float32", max_model_len=64,
                num_device_blocks=8, seed=0, pipeline_parallel_size=2)


class TestBartPipeline:
    """BART encoder-decoder PP: the stacked decoder shards over "pipe"
    (stage-local self-/cross-KV pool slices); the encoder replicates and
    re-runs inside each stage's prefill wave tick; the decoder hidden
    rides a trailing row of the wave buffer.  Reference analog:
    vllm/model_executor/models/bart.py decoder under PP partitioning."""

    def _run(self, pp=1, tp=1, prompts=([5, 17, 9, 33, 42, 8],), n=8):
        kw = {}
        if pp > 1:
            kw["pipeline_parallel_size"] = pp
        if tp > 1:
            kw["tensor_parallel_size"] = tp
        llm = LLM(hf_config=dict(BART_CFG), dtype="float32",
                  max_model_len=64, num_device_blocks=8, seed=0,
                  max_num_seqs=4, **kw)
        outs = llm.generate(
            prompt_token_ids=[list(p) for p in prompts],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                           ignore_eos=True))
        return [list(o.outputs[0].token_ids) for o in outs]

    def test_pp2_token_identical(self):
        assert self._run(pp=2) == self._run()

    def test_pp2_tp2_batched(self):
        prompts = [[5, 17, 9], [33, 42, 8, 21, 60], [90, 2], [7] * 9]
        assert self._run(pp=2, tp=2, prompts=prompts) == \
            self._run(prompts=prompts)

    def test_pp_rejects_ragged_decoder(self):
        cfg = dict(BART_CFG, decoder_layers=3)
        with pytest.raises(ValueError, match="decoder_layers"):
            LLM(hf_config=cfg, dtype="float32", max_model_len=64,
                num_device_blocks=8, seed=0, pipeline_parallel_size=2)


class TestJambaPipeline:
    """Jamba PP: stages own whole period blocks (layer kinds are
    block-periodic), params restacked to block_list [num_blocks, ...]
    leaves sharded over "pipe", layer-major hybrid pools sliced evenly.
    Reference analog: vllm/model_executor/models/jamba.py partitions
    layers across PP stage processes via make_layers."""

    # attn period 2 / offset 1, expert period 2 / offset 0 -> block len
    # 2 (pos 0: mamba mixer + MoE ffn, pos 1: attention + dense ffn);
    # 8 layers -> 4 blocks -> 2 per stage at pp=2, 1 at pp=4.
    CFG = {
        "architectures": ["JambaForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 8, "num_attention_heads": 4,
        "num_key_value_heads": 2, "num_experts": 4,
        "num_experts_per_tok": 2,
        "expert_layer_period": 2, "expert_layer_offset": 0,
        "attn_layer_period": 2, "attn_layer_offset": 1,
        "mamba_d_state": 8, "mamba_d_conv": 4, "mamba_expand": 2,
        "tie_word_embeddings": False, "rms_norm_eps": 1e-6,
        "eos_token_id": None,
    }

    def _run(self, pp=1, tp=1, prompts=(PROMPT,), n=8):
        kw = {}
        if pp > 1:
            kw["pipeline_parallel_size"] = pp
        if tp > 1:
            kw["tensor_parallel_size"] = tp
        llm = LLM(hf_config=dict(self.CFG), dtype="float32",
                  max_model_len=64, num_device_blocks=8, seed=0,
                  max_num_seqs=4, **kw)
        outs = llm.generate(
            prompt_token_ids=[list(p) for p in prompts],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                           ignore_eos=True))
        return [list(o.outputs[0].token_ids) for o in outs]

    def test_pp2_token_identical(self):
        assert self._run(pp=2) == self._run()

    def test_pp2_tp2_batched(self):
        prompts = [[1, 5, 9], [22, 41, 3, 17, 8], [90, 2], [7] * 10]
        assert self._run(pp=2, tp=2, prompts=prompts) == \
            self._run(prompts=prompts)

    def test_pp4_token_identical(self):
        assert self._run(pp=4) == self._run()

    def test_pp_rejects_ragged_blocks(self):
        cfg = dict(self.CFG, num_hidden_layers=6)
        with pytest.raises(ValueError, match="period-block"):
            LLM(hf_config=cfg, dtype="float32", max_model_len=64,
                num_device_blocks=8, seed=0, pipeline_parallel_size=4)


def test_mllama_image_tp2_matches_single():
    """Cross-attention path under TP: an image request must be
    token-identical to single-device (vision tower + cross-KV pools all
    sharded)."""
    rng = np.random.default_rng(7)
    tiles = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    img_tok = MLLAMA_CFG["image_token_index"]
    prompt = [img_tok, 4, 9, 13, 27]

    def run(tp):
        kw = {"tensor_parallel_size": tp} if tp > 1 else {}
        llm = LLM(hf_config=dict(MLLAMA_CFG), dtype="float32",
                  max_model_len=64, num_device_blocks=8, seed=0, **kw)
        outs = llm.generate(
            prompt_token_ids=[list(prompt)],
            multi_modal_data={"image": tiles, "aspect_ratio_id": 2},
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                           ignore_eos=True))
        return list(outs[0].outputs[0].token_ids)

    assert run(2) == run(1)
