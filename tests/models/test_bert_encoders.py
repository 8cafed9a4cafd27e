"""BERT-family encoders: hidden-state/classifier parity vs HuggingFace
and the encode-only engine surface (reference
vllm/model_executor/models/bert.py + pooling-model serving)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.models.weights import (
    torch_state_dict_to_numpy)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IDS = [2, 45, 17, 88, 9, 33, 61, 5]


def _bert_cfg(**kw):
    base = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=64, type_vocab_size=2,
                layer_norm_eps=1e-12, hidden_act="gelu")
    base.update(kw)
    return base


def test_bert_hidden_states_match_hf():
    cfg = transformers.BertConfig(**_bert_cfg())
    torch.manual_seed(40)
    hf = transformers.BertModel(cfg).eval()
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).last_hidden_state[0].numpy()
    d = cfg.to_dict(); d["architectures"] = ["BertModel"]
    model = build_model(d, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    got = np.asarray(model.hidden_states(
        params, jnp.asarray(IDS, jnp.int32), jnp.int32(len(IDS))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_bert_padding_masked_out():
    """Embedding of a padded batch row must equal the unpadded one."""
    cfg = transformers.BertConfig(**_bert_cfg())
    torch.manual_seed(41)
    hf = transformers.BertModel(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["BertModel"]
    model = build_model(d, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    short = np.asarray(model.encode_pooled(
        params, jnp.asarray(IDS, jnp.int32), jnp.int32(len(IDS))))
    padded = np.asarray(model.encode_pooled(
        params, jnp.asarray(IDS + [0] * 8, jnp.int32),
        jnp.int32(len(IDS))))
    np.testing.assert_allclose(padded, short, rtol=1e-5, atol=1e-5)


def test_roberta_position_offset_matches_hf():
    cfg = transformers.RobertaConfig(**_bert_cfg(
        max_position_embeddings=66, pad_token_id=1))
    torch.manual_seed(42)
    hf = transformers.RobertaModel(cfg).eval()
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).last_hidden_state[0].numpy()
    d = cfg.to_dict(); d["architectures"] = ["RobertaModel"]
    model = build_model(d, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    got = np.asarray(model.hidden_states(
        params, jnp.asarray(IDS, jnp.int32), jnp.int32(len(IDS))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_bert_cross_encoder_logits_match_hf():
    cfg = transformers.BertConfig(**_bert_cfg(num_labels=1))
    torch.manual_seed(43)
    hf = transformers.BertForSequenceClassification(cfg).eval()
    tts = [0] * 4 + [1] * 4
    with torch.no_grad():
        want = hf(torch.tensor([IDS]),
                  token_type_ids=torch.tensor([tts])).logits[0].numpy()
    d = cfg.to_dict(); d["architectures"] = ["BertForSequenceClassification"]
    model = build_model(d, dtype=jnp.float32)
    assert model.arch.num_labels == 1
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    got = np.asarray(model.classify(
        params, jnp.asarray(IDS, jnp.int32), jnp.int32(len(IDS)),
        token_type_ids=jnp.asarray(tts, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


class TestEncodeOnlyEngine:
    def _llm(self, arch, **cfg_kw):
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        d = _bert_cfg(**cfg_kw)
        d["architectures"] = [arch]
        return LLM(hf_config=d, dtype="float32", max_model_len=64,
                   num_device_blocks=8, seed=0)

    def test_encode_through_engine(self):
        llm = self._llm("BertModel")
        vecs = llm.engine.encode([IDS, IDS[:4]])
        assert len(vecs) == 2
        for v in vecs:
            assert v.shape == (64,)
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)

    def test_classify_through_engine(self):
        llm = self._llm("BertForSequenceClassification", num_labels=1)
        logits = llm.engine.classify([IDS], token_type_ids=[[0] * 8])
        assert logits[0].shape == (1,)

    def test_generation_rejected(self):
        llm = self._llm("BertModel")
        with pytest.raises(ValueError, match="encoder-only"):
            llm.engine.add_request(prompt_token_ids=IDS)
