"""Incremental detokenization + pure-Python sentencepiece tokenizer.

Reference analogs: vllm/transformers_utils/detokenizer.py (incremental
decode, partial-UTF8 holdback) and transformers_utils/tokenizer.py
(sentencepiece `tokenizer.model` loading).
"""

import os

from vllm_paged_compression_tpu.engine.sp_tokenizer import (
    BYTE, CONTROL, NORMAL, SentencePieceTokenizer, parse_model_proto,
    serialize_model_proto)
from vllm_paged_compression_tpu.engine.tokenizer_util import (
    detokenize_incrementally, maybe_load_tokenizer)
from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

TINY_LLAMA_CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def make_unigram(extra=(), byte_fallback=True):
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, CONTROL),
              ("</s>", 0.0, CONTROL)]
    if byte_fallback:
        pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [(p, s, NORMAL) for p, s in extra]
    blob = serialize_model_proto(pieces, model_type=1,
                                 byte_fallback=byte_fallback)
    return SentencePieceTokenizer(parse_model_proto(blob))


class TestSpModelParsing:
    def test_roundtrip_fields(self):
        blob = serialize_model_proto(
            [("<unk>", 0.0, 2), ("▁a", -1.5, NORMAL)],
            model_type=2, byte_fallback=True, add_dummy_prefix=False)
        m = parse_model_proto(blob)
        assert m.model_type == 2 and m.byte_fallback
        assert not m.add_dummy_prefix
        assert m.pieces[1].piece == "▁a"
        assert abs(m.pieces[1].score - (-1.5)) < 1e-6

    def test_maybe_load_tokenizer_model_file(self, tmp_path):
        blob = serialize_model_proto(
            [("<unk>", 0.0, 2), ("▁hi", -1.0, NORMAL)])
        (tmp_path / "tokenizer.model").write_bytes(blob)
        tok = maybe_load_tokenizer(str(tmp_path))
        assert isinstance(tok, SentencePieceTokenizer)
        assert tok.decode(tok.encode("hi").ids) == "hi"


class TestSpEncodeDecode:
    def test_unigram_viterbi_prefers_longer_pieces(self):
        tok = make_unigram([("▁hello", -1.0), ("▁hell", -2.0),
                            ("o", -2.0), ("▁world", -1.0),
                            ("▁", -5.0)])
        ids = tok.encode("hello world").ids
        toks = [tok.id_to_token(i) for i in ids]
        assert toks == ["▁hello", "▁world"]
        assert tok.decode(ids) == "hello world"

    def test_byte_fallback_unicode(self):
        tok = make_unigram([("▁", -1.0)])
        text = "é€🎉"
        ids = tok.encode(text).ids
        assert tok.decode(ids) == text

    def test_bpe_merge_by_score(self):
        pieces = [("<unk>", 0.0, 2)]
        pieces += [(c, -10.0, NORMAL) for c in "▁abcd"]
        pieces += [("ab", -1.0, NORMAL), ("abc", -0.5, NORMAL),
                   ("▁abc", -0.2, NORMAL), ("cd", -3.0, NORMAL)]
        blob = serialize_model_proto(pieces, model_type=2)
        tok = SentencePieceTokenizer(parse_model_proto(blob))
        ids = tok.encode("abcd").ids
        toks = [tok.id_to_token(i) for i in ids]
        assert toks == ["▁abc", "d"]
        assert tok.decode(ids) == "abcd"

    def test_control_tokens_skipped_in_decode(self):
        tok = make_unigram([("▁ok", -1.0)])
        ids = [1] + tok.encode("ok").ids + [2]   # <s> ... </s>
        assert tok.decode(ids) == "ok"

    def test_get_vocab_interface(self):
        tok = make_unigram([("▁x", -1.0)])
        v = tok.get_vocab()
        assert v["▁x"] == tok.token_to_id("▁x")
        assert tok.get_vocab_size() == len(v)


class TestIncrementalDetok:
    def drive(self, tok, ids):
        """Feed ids one at a time; return (deltas, final_text)."""
        deltas, pre, read = [], 0, 0
        fed = []
        for t in ids:
            fed.append(t)
            d, pre, read = detokenize_incrementally(tok, fed, pre, read)
            deltas.append(d)
        d, pre, read = detokenize_incrementally(tok, fed, pre, read,
                                                finished=True)
        deltas.append(d)
        return deltas, "".join(deltas)

    def test_deltas_concat_to_full_decode(self):
        tok = make_unigram([("▁the", -1.0), ("▁cat", -1.0),
                            ("s", -2.0), ("▁sat", -1.0)])
        ids = tok.encode("the cats sat").ids
        _, text = self.drive(tok, ids)
        assert text == tok.decode(ids)

    def test_partial_utf8_held_back(self):
        tok = make_unigram([("▁", -1.0)])
        ids = tok.encode("🎉").ids    # 4 byte-pieces
        assert len(ids) > 1
        deltas, text = self.drive(tok, ids)
        # Nothing emitted until the multi-byte char completes; never a
        # replacement char mid-stream.
        assert all("�" not in d for d in deltas[:-1])
        assert text == "🎉"
        assert deltas[-2] or deltas[-1]  # emitted at/after completion

    def test_multibyte_then_ascii(self):
        tok = make_unigram([("▁x", -1.0), ("y", -2.0)])
        ids = tok.encode("é xy").ids
        _, text = self.drive(tok, ids)
        assert text == tok.decode(ids)


class _ByteTok:
    """Toy tokenizer: token id i <-> single char chr(32+i%90) (engine
    vocab is 128 so every sampled id maps to a printable char)."""

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(32 + int(i) % 90) for i in ids)


class TestEngineStopStrings:
    def make_llm(self):
        return LLM(hf_config=TINY_LLAMA_CFG, dtype="float32", block_size=4,
                   max_model_len=256, num_device_blocks=128, seed=0,
                   max_num_seqs=8)

    def test_incremental_text_matches_full_decode(self):
        llm = self.make_llm()
        llm.engine.tokenizer = _ByteTok()
        outs = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=16))
        o = outs[0].outputs[0]
        assert o.text == _ByteTok().decode(o.token_ids)
        assert len(o.token_ids) == 16

    def test_stop_string_truncates(self):
        llm = self.make_llm()
        llm.engine.tokenizer = _ByteTok()
        base = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=16))
        full = base[0].outputs[0].text
        stop = full[6:9]   # a substring the greedy run will re-produce
        assert stop
        cut = full.index(stop)  # first occurrence wins
        llm2 = self.make_llm()
        llm2.engine.tokenizer = _ByteTok()
        outs = llm2.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=16,
                                           stop=[stop]))
        o = outs[0].outputs[0]
        assert o.text == full[:cut]
        assert o.finish_reason == "stop"
        assert stop not in o.text


class TestSpNormalization:
    """NormalizerSpec handling: nfkc-family names apply unicodedata NFKC
    + NMT folds; remove_extra_whitespaces collapses runs.  llama-style
    identity models pass text through untouched."""

    def _tok(self, normalizer, remove_extra_ws, extra):
        from vllm_paged_compression_tpu.engine.sp_tokenizer import (
            parse_model_proto, serialize_model_proto,
            SentencePieceTokenizer)
        pieces = [("<unk>", 0.0, 2)]
        pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
        pieces += [(p, s, NORMAL) for p, s in extra]
        blob = serialize_model_proto(pieces, byte_fallback=True,
                                     normalizer=normalizer,
                                     remove_extra_ws=remove_extra_ws)
        return SentencePieceTokenizer(parse_model_proto(blob))

    def test_nfkc_folds_compatibility_codepoints(self):
        tok = self._tok("nmt_nfkc", True, [("▁ﬁt", -1.0), ("▁fit", -1.5)])
        # U+FB01 LATIN SMALL LIGATURE FI -> "fi" under NFKC, so the
        # ligature input must hit the SAME piece as plain "fit".
        assert tok.encode("ﬁt").ids == tok.encode("fit").ids

    def test_nmt_space_family_folds_to_ascii_space(self):
        tok = self._tok("nmt_nfkc", True, [("▁a", -1.0), ("▁b", -1.0)])
        # NBSP / ideographic space / zero-width-joiner all normalize.
        assert tok.encode("a b").ids == tok.encode("a b").ids
        assert tok.encode("a　b").ids == tok.encode("a b").ids
        assert tok.encode("a‍b").ids == tok.encode("ab").ids

    def test_remove_extra_whitespaces_collapses_runs(self):
        tok = self._tok("nmt_nfkc", True, [("▁a", -1.0), ("▁b", -1.0)])
        assert tok.encode("  a   b  ").ids == tok.encode("a b").ids

    def test_identity_preserves_text(self):
        tok = self._tok("identity", False, [("▁a", -1.0), ("▁b", -1.0)])
        # Double space must stay two pieces under identity.
        assert tok.encode("a  b").ids != tok.encode("a b").ids
        assert tok.encode("ﬁ").ids != tok.encode("fi").ids

    def test_nfkc_cf_casefolds(self):
        tok = self._tok("nmt_nfkc_cf", True, [("▁abc", -1.0)])
        assert tok.encode("ABC").ids == tok.encode("abc").ids
