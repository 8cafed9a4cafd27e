"""CI proof of the lm-eval quality harness (benchmarks/lm_eval_quality.py
— mirror of /root/reference/.buildkite/lm-eval-harness/
test_lm_eval_correctness.py): answer extraction matches lm-eval's gsm8k
rules, and the full pipeline (checkpoint load -> n-shot prompts ->
greedy generate -> budget/method grid -> report) runs end to end on a
tiny on-disk checkpoint.  Scores on random weights are meaningless; the
test asserts mechanics, not accuracy."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from benchmarks.lm_eval_quality import (build_prompt, extract_flexible,
                                        extract_strict, gold_answer,
                                        score, synthetic_records)


class TestExtraction:
    def test_strict_match(self):
        assert extract_strict("blah blah\n#### 42") == "42"
        assert extract_strict("#### 1,234") == "1234"
        assert extract_strict("#### -7.5") == "-7.5"
        assert extract_strict("no marker 12") is None

    def test_flexible_last_number(self):
        assert extract_flexible("has 3 + 4 = 7 apples") == "7"
        assert extract_flexible("costs $1,200 total") == "1200"
        assert extract_flexible("nothing here") is None

    def test_gold_and_score(self):
        recs = synthetic_records(4)
        golds = [gold_answer(r) for r in recs]
        # perfect completions score 1.0 on both metrics
        comps = [f"reasoning... #### {g}" for g in golds]
        s = score(comps, golds)
        assert s["exact_match,strict-match"] == 1.0
        assert s["exact_match,flexible-extract"] == 1.0
        # flexible-only completions score 0 strict, 1 flexible
        comps = [f"the answer is {g}" for g in golds]
        s = score(comps, golds)
        assert s["exact_match,strict-match"] == 0.0
        assert s["exact_match,flexible-extract"] == 1.0

    def test_prompt_assembly(self):
        recs = synthetic_records(3)
        p = build_prompt(recs[:2], recs[2]["question"])
        assert p.count("Question:") == 3
        assert p.endswith("Answer:")
        assert "####" in p  # shots carry worked answers


def _write_tiny_checkpoint(d):
    """Tiny random Llama checkpoint + WordLevel tokenizer covering the
    synthetic task's vocabulary."""
    from safetensors.numpy import save_file
    words = set()
    for r in synthetic_records(64):
        words.update((r["question"] + " " + r["answer"]).split())
    for i in range(200):
        words.add(str(i))
    words.update(["Question:", "Answer:", "####", "\n"])
    vocab = {"<unk>": 0, "<s>": 1}
    for w in sorted(words):
        vocab[w] = len(vocab)
    tok = {
        "version": "1.0",
        "truncation": None, "padding": None,
        "added_tokens": [],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab,
                  "unk_token": "<unk>"},
    }
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tok, f)
    v = len(vocab)
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": v,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "max_position_embeddings": 2048,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True, "bos_token_id": 1,
           "eos_token_id": None}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(0)
    h, im, L = 64, 128, 2
    t = {"model.embed_tokens.weight": rng.standard_normal(
        (v, h)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones((h,), np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = rng.standard_normal(
            (h, h)).astype(np.float32) * 0.05
        t[p + "self_attn.k_proj.weight"] = rng.standard_normal(
            (h // 2, h)).astype(np.float32) * 0.05
        t[p + "self_attn.v_proj.weight"] = rng.standard_normal(
            (h // 2, h)).astype(np.float32) * 0.05
        t[p + "self_attn.o_proj.weight"] = rng.standard_normal(
            (h, h)).astype(np.float32) * 0.05
        t[p + "mlp.gate_proj.weight"] = rng.standard_normal(
            (im, h)).astype(np.float32) * 0.05
        t[p + "mlp.up_proj.weight"] = rng.standard_normal(
            (im, h)).astype(np.float32) * 0.05
        t[p + "mlp.down_proj.weight"] = rng.standard_normal(
            (h, im)).astype(np.float32) * 0.05
        t[p + "input_layernorm.weight"] = np.ones((h,), np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(
            (h,), np.float32)
    save_file(t, os.path.join(d, "model.safetensors"))
    return v


class TestHarnessEndToEnd:
    def test_cli_smoke(self, tmp_path):
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        _write_tiny_checkpoint(str(ckpt))
        out = tmp_path / "report.json"
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, "benchmarks/lm_eval_quality.py",
             "--model-path", str(ckpt), "--data", "synthetic",
             "--limit", "4", "--num-fewshot", "2",
             "--max-new-tokens", "8", "--max-model-len", "512",
             "--budget-fracs", "1.0", "0.5",
             "--methods", "global", "streamingLLM",
             "--batch", "4", "--json-out", str(out)],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=900)
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        rep = json.load(open(out))
        configs = [row["config"] for row in rep["rows"]]
        assert configs == ["full_cache", "global@0.5",
                           "streamingLLM@0.5"], configs
        for row in rep["rows"]:
            for m in ("exact_match,strict-match",
                      "exact_match,flexible-extract"):
                assert 0.0 <= row[m] <= 1.0
            assert row["n"] == 4
        assert "full_cache=" in r.stdout
