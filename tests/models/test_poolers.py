"""Pooling-task decoder models: classification / reward heads and
bare-trunk embedding checkpoints.

Reference analogs: vllm/model_executor/models/qwen2_cls.py (score
RowParallelLinear, LAST pooling), qwen2_rm.py (score Sequential MLP, ALL
pooling), gritlm.py and the registry's "*Model" embedding aliases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import (
    build_model, supported_architectures)
from vllm_paged_compression_tpu.models.weights import (
    torch_state_dict_to_numpy)
from vllm_paged_compression_tpu.ops.attention import prefill_attention

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_qwen2_cfg(**kw):
    return transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0, **kw)


def _full_attn(scale):
    def fn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state
    return fn


def _forward_hidden(model, params, ids):
    h, _ = model.forward_hidden(
        params, jnp.array(ids), jnp.arange(len(ids)),
        _full_attn(model.arch.attn_scale))
    return h


def test_qwen2_seq_classification_matches_hf():
    cfg = _tiny_qwen2_cfg(num_labels=3)
    torch.manual_seed(0)
    hf = transformers.Qwen2ForSequenceClassification(cfg).eval()
    ids = [1, 5, 9, 33, 77, 2, 4, 100]
    with torch.no_grad():
        # HF pools the last (non-pad) token's logits.
        hf_logits = hf(torch.tensor([ids])).logits[0].float().numpy()

    model = build_model(
        {**cfg.to_dict(),
         "architectures": ["Qwen2ForSequenceClassification"]},
        dtype=jnp.float32)
    assert model.arch.head_type == "cls" and model.arch.num_labels == 3
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    h = _forward_hidden(model, params, ids)
    ours = np.asarray(model.head_forward(params, h[-1]))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_qwen2_reward_model_matches_manual_torch():
    cfg = _tiny_qwen2_cfg()
    torch.manual_seed(1)
    trunk = transformers.Qwen2Model(cfg).eval()
    score = torch.nn.Sequential(
        torch.nn.Linear(cfg.hidden_size, cfg.hidden_size),
        torch.nn.ReLU(),
        torch.nn.Linear(cfg.hidden_size, 1)).eval()
    ids = [3, 17, 42, 99, 5]
    with torch.no_grad():
        hidden = trunk(torch.tensor([ids])).last_hidden_state[0]
        expect = score(hidden).float().numpy()          # [T, 1] ALL pooling

    # Reward checkpoints store the trunk without the "model." prefix plus
    # score.{0,2}; exercises the loader's prefix normalization too.
    sd = dict(trunk.state_dict())
    sd.update({f"score.{k}": v for k, v in score.state_dict().items()})
    model = build_model(
        {**cfg.to_dict(), "architectures": ["Qwen2ForRewardModel"]},
        dtype=jnp.float32)
    assert model.arch.head_type == "reward"
    params = model.load_hf_state_dict(torch_state_dict_to_numpy(sd))
    h = _forward_hidden(model, params, ids)
    ours = np.asarray(model.head_forward(params, h))
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-4)


def test_bare_trunk_embedding_checkpoint_loads():
    """"Qwen2Model"/"MistralModel" checkpoints: no "model." prefix, no
    lm_head -> loader normalizes and falls back to tied embeddings."""
    cfg = _tiny_qwen2_cfg()
    torch.manual_seed(2)
    trunk = transformers.Qwen2Model(cfg).eval()
    ids = [7, 3, 88, 14, 2, 61]
    with torch.no_grad():
        hidden = trunk(torch.tensor([ids])).last_hidden_state[0]
        expect = hidden.mean(dim=0).float().numpy()

    model = build_model(
        {**cfg.to_dict(), "architectures": ["Qwen2Model"]},
        dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(dict(trunk.state_dict())))
    h = _forward_hidden(model, params, ids)
    np.testing.assert_allclose(np.asarray(h.mean(axis=0)), expect,
                               rtol=2e-4, atol=2e-4)


def test_registry_aliases_present():
    archs = supported_architectures()
    for name in ("GritLM", "LlamaModel", "MistralModel", "Qwen2Model",
                 "Qwen2EmbeddingModel", "Gemma2Model",
                 "InternLM2VEForCausalLM", "Qwen2ForSequenceClassification",
                 "Qwen2ForRewardModel", "RobertaForMaskedLM",
                 "BertEmbeddingModel"):
        assert name in archs, name


def test_engine_classify_decoder(tmp_path):
    """End-to-end: engine.classify() on a saved classifier checkpoint."""
    import json

    from safetensors.torch import save_file

    from vllm_paged_compression_tpu.config import EngineConfig, ModelConfig
    from vllm_paged_compression_tpu.engine.llm_engine import LLMEngine

    cfg = _tiny_qwen2_cfg(num_labels=2)
    torch.manual_seed(3)
    hf = transformers.Qwen2ForSequenceClassification(cfg).eval()
    d = tmp_path / "ckpt"
    d.mkdir()
    cfg_dict = cfg.to_dict()
    cfg_dict["architectures"] = ["Qwen2ForSequenceClassification"]
    (d / "config.json").write_text(json.dumps(cfg_dict))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    engine = LLMEngine(EngineConfig(model=ModelConfig(
        model=str(d), dtype="float32", max_model_len=128)))
    ids = [4, 9, 2, 55, 31]
    with torch.no_grad():
        expect = hf(torch.tensor([ids])).logits[0].float().numpy()
    (got,) = engine.classify([ids])
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)
    with pytest.raises(ValueError):
        engine.add_request(prompt_token_ids=ids)
