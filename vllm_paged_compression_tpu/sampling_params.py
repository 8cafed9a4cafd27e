"""Per-request sampling parameters (reference vllm/sampling_params.py,
reduced to the surface the engine actually samples with; the full OpenAI
parameter set maps onto this in entrypoints/openai)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class GuidedDecodingParams:
    """Structured-output constraint (reference
    vllm/sampling_params.py GuidedDecodingParams / guided_* request
    fields).  Exactly one of the constraint fields may be set."""

    json: Optional[object] = None        # JSON schema (dict or str)
    regex: Optional[str] = None
    choice: Optional[list] = None
    grammar: Optional[str] = None        # accepted for parity; rejected
    json_object: bool = False            # response_format json_object

    def __init__(self, json=None, regex=None, choice=None, grammar=None,
                 json_object: bool = False):
        self.json = json
        self.regex = regex
        self.choice = list(choice) if choice is not None else None
        self.grammar = grammar
        self.json_object = bool(json_object)
        n_set = sum(x is not None for x in
                    (self.json, self.regex, self.choice, self.grammar))
        n_set += 1 if self.json_object else 0
        if n_set != 1:
            raise ValueError("GuidedDecodingParams needs exactly one of "
                             "json / regex / choice / grammar / "
                             "json_object")
        if self.choice is not None and not self.choice:
            raise ValueError("guided choice list is empty")


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: list[str] = field(default_factory=list)
    stop_token_ids: list[int] = field(default_factory=list)
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None
    guided_decoding: Optional[GuidedDecodingParams] = None
    # OpenAI logit_bias: {token_id: additive bias}; applied in-graph.
    logit_bias: Optional[dict] = None
    # Restrict sampling to exactly these token ids (reference
    # SamplingParams.allowed_token_ids).
    allowed_token_ids: Optional[list[int]] = None
    # Token-id phrases that must not be completed (reference
    # SamplingParams.bad_words, pre-tokenized).
    bad_words: Optional[list[list[int]]] = None

    def __post_init__(self) -> None:
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError("top_k must be -1 (disabled) or >= 1")
        if self.n < 1:
            raise ValueError("n must be >= 1")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if self.logit_bias is not None:
            if len(self.logit_bias) > 64:
                raise ValueError("logit_bias supports at most 64 entries")
            self.logit_bias = {int(k): float(v)
                               for k, v in self.logit_bias.items()}
        if self.allowed_token_ids is not None:
            if not self.allowed_token_ids:
                raise ValueError("allowed_token_ids must not be empty")
            self.allowed_token_ids = [int(t) for t in
                                      self.allowed_token_ids]
        if self.bad_words is not None:
            self.bad_words = [[int(t) for t in w] for w in self.bad_words]
            if any(not w for w in self.bad_words):
                raise ValueError("bad_words entries must not be empty")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
