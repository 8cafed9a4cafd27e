"""Speculative decoding configuration (reference SpeculativeConfig,
vllm/config.py)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SpeculativeConfig:
    method: str = "ngram"              # "ngram" | "draft"
    num_speculative_tokens: int = 4
    ngram_prompt_lookup_max: int = 3
    ngram_prompt_lookup_min: int = 1
    # draft-model proposer (method="draft"): an HF path or an inline hf
    # config dict (synthetic weights) for the small model; the draft is
    # stateless over a recent token window (spec_decode/draft.py).
    draft_model: str = ""
    draft_hf_config: dict | None = None
    draft_window: int = 128
    # EAGLE proposer (method="eagle"): checkpoint dir holding fc + the
    # 1-layer feature-level decoder (reference eagle.py), or an inline hf
    # config dict like {"model": {<llama cfg>}} for synthetic weights.
    eagle_model: str = ""
    eagle_hf_config: dict | None = None
    # Head-based proposers (method="medusa" | "mlp_speculator"): path to a
    # safetensors dir holding the heads (HF medusa / IBM mlp_speculator
    # naming, spec_decode/heads.py); empty => synthetic random heads
    # (benchmarks/tests — proposal quality only affects acceptance rate).
    heads_path: str = ""
    speculator_inner_dim: int = 0
    medusa_num_layers: int = 1
    # Stochastic-verification acceptance policy (reference
    # --spec-decoding-acceptance-method + typical-acceptance knobs,
    # vllm/model_executor/layers/typical_acceptance_sampler.py).
    acceptance_method: str = "rejection_sampler"
    typical_posterior_threshold: float = 0.09
    typical_posterior_alpha: float = 0.3

    def verify(self) -> None:
        if self.method not in ("ngram", "draft", "medusa",
                               "mlp_speculator", "eagle"):
            raise NotImplementedError(
                "speculative method must be one of ngram, draft, medusa, "
                "mlp_speculator, eagle")
        if self.method == "draft" and not self.draft_model \
                and self.draft_hf_config is None:
            raise ValueError("method='draft' needs draft_model or "
                             "draft_hf_config")
        if self.method == "eagle" and not self.eagle_model \
                and self.eagle_hf_config is None:
            raise ValueError("method='eagle' needs eagle_model or "
                             "eagle_hf_config")
        if self.num_speculative_tokens < 1:
            raise ValueError("num_speculative_tokens must be >= 1")
        if self.ngram_prompt_lookup_min < 1 or \
                self.ngram_prompt_lookup_max < self.ngram_prompt_lookup_min:
            raise ValueError("need 1 <= ngram_min <= ngram_max")
        if self.acceptance_method not in ("rejection_sampler",
                                          "typical_acceptance_sampler"):
            raise ValueError(
                "acceptance_method must be rejection_sampler or "
                "typical_acceptance_sampler")
