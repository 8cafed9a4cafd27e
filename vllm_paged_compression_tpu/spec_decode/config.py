"""Speculative decoding configuration (reference SpeculativeConfig,
vllm/config.py)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SpeculativeConfig:
    method: str = "ngram"
    num_speculative_tokens: int = 4
    ngram_prompt_lookup_max: int = 3
    ngram_prompt_lookup_min: int = 1

    def verify(self) -> None:
        if self.method != "ngram":
            raise NotImplementedError(
                "round 1 ships the ngram proposer (draft-model / Medusa "
                "proposers are follow-ups)")
        if self.num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1")
        if self.ngram_prompt_lookup_min < 1 or \
                self.ngram_prompt_lookup_max < self.ngram_prompt_lookup_min:
            raise ValueError("need 1 <= ngram_min <= ngram_max")
