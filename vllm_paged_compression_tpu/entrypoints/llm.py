"""Offline batch inference API (reference vllm/entrypoints/llm.py:45)."""

from __future__ import annotations

from typing import Optional, Sequence as Seq, Union

from ..config import (CacheConfig, EngineConfig, ModelConfig,
                      PagedEvictConfig, ParallelConfig, SchedulerConfig)
from ..engine.llm_engine import LLMEngine
from ..outputs import RequestOutput
from ..sampling_params import SamplingParams


class LLM:
    """Synchronous generate-everything front end over LLMEngine."""

    def __init__(self, model: str = "", hf_config: Optional[dict] = None,
                 tokenizer: Optional[str] = None,
                 dtype: str = "bfloat16", block_size: int = 16,
                 max_model_len: int = 8192, max_num_seqs: int = 64,
                 num_device_blocks: Optional[int] = None,
                 gpu_memory_utilization: float = 0.9,
                 enable_paged_eviction: bool = False,
                 evict_method: str = "streamingLLM",
                 cache_budget: int = 1024, topk_blocks: int = -1,
                 cache_prune_type: str = "budget",
                 disable_evict_prefill: bool = False,
                 evict_freq: int = 1,
                 evict_selection: str = "l2",
                 kv_cache_dtype: str = "auto",
                 num_scheduler_steps: int = 1,
                 quantization: Optional[str] = None,
                 enable_prefix_caching: bool = False,
                 enable_chunked_prefill: bool = False,
                 max_num_batched_tokens: Optional[int] = None,
                 enable_lora: bool = False, max_loras: int = 4,
                 max_lora_rank: int = 16,
                 enable_prompt_adapter: bool = False,
                 max_prompt_adapters: int = 4,
                 max_prompt_adapter_tokens: int = 16,
                 speculative_config: Optional[dict] = None,
                 kv_transfer_config: Optional[dict] = None,
                 tensor_parallel_size: int = 1,
                 data_parallel_size: int = 1,
                 pipeline_parallel_size: int = 1,
                 preemption_mode: str = "recompute",
                 swap_space: float = 4.0,
                 params=None, seed: int = 0):
        evict = None
        if enable_paged_eviction:
            evict = PagedEvictConfig(
                enabled=True, evict_method=evict_method,
                cache_budget=cache_budget, topk_blocks=topk_blocks,
                cache_prune_type=cache_prune_type,
                disable_evict_prefill=disable_evict_prefill,
                evict_freq=evict_freq,
                selection=evict_selection)
        lora_cfg = None
        if enable_lora:
            from ..lora import LoRAConfig
            lora_cfg = LoRAConfig(max_loras=max_loras,
                                  max_lora_rank=max_lora_rank)
        spec_cfg = None
        if speculative_config is not None:
            from ..spec_decode import SpeculativeConfig
            spec_cfg = SpeculativeConfig(**speculative_config)
        pa_cfg = None
        if enable_prompt_adapter:
            from ..prompt_adapter import PromptAdapterConfig
            pa_cfg = PromptAdapterConfig(
                max_prompt_adapters=max_prompt_adapters,
                max_prompt_adapter_tokens=max_prompt_adapter_tokens)
        kv_cfg = None
        if kv_transfer_config is not None:
            from ..kv_transfer import KVTransferConfig
            kv_cfg = KVTransferConfig(**kv_transfer_config)
        config = EngineConfig(
            lora=lora_cfg,
            speculative=spec_cfg,
            kv_transfer=kv_cfg,
            prompt_adapter=pa_cfg,
            model=ModelConfig(model=model, hf_config=hf_config, dtype=dtype,
                              tokenizer=tokenizer,
                              max_model_len=max_model_len, seed=seed,
                              weight_dtype=quantization),
            cache=CacheConfig(block_size=block_size,
                              num_device_blocks=num_device_blocks,
                              gpu_memory_utilization=gpu_memory_utilization,
                              cache_dtype=kv_cache_dtype,
                              enable_prefix_caching=enable_prefix_caching,
                              swap_space_gb=swap_space,
                              paged_evict=evict),
            scheduler=SchedulerConfig(
                max_num_seqs=max_num_seqs,
                max_model_len=max_model_len,
                num_scheduler_steps=num_scheduler_steps,
                preemption_mode=preemption_mode,
                enable_chunked_prefill=enable_chunked_prefill,
                **({"max_num_batched_tokens": max_num_batched_tokens}
                   if max_num_batched_tokens is not None else {})),
            parallel=ParallelConfig(
                tensor_parallel_size=tensor_parallel_size,
                data_parallel_size=data_parallel_size,
                pipeline_parallel_size=pipeline_parallel_size))
        self.engine = LLMEngine(config, params=params)

    def save_sharded_state(self, path: str,
                           max_size: int = 4 * 1024 ** 3) -> None:
        """Reference LLM.llm_engine...save_sharded_state parity: dump
        the engine-resident (quantized) weights for fast reload via
        LLM(model=<path>)."""
        self.engine.save_sharded_state(path, max_size=max_size)

    def generate(
        self,
        prompts: Optional[Union[str, Seq[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        Seq[SamplingParams]]] = None,
        prompt_token_ids: Optional[Seq[Seq[int]]] = None,
        lora_request=None,
        multi_modal_data: Optional[Union[dict, Seq[Optional[dict]]]] = None,
        prompt_adapter_request=None,
    ) -> list[RequestOutput]:
        if prompts is not None and isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts) if prompts is not None else len(prompt_token_ids)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n
        if lora_request is not None and not isinstance(lora_request, list):
            lora_request = [lora_request] * n
        if isinstance(multi_modal_data, dict):
            multi_modal_data = [multi_modal_data] * n
        if prompt_adapter_request is not None and not isinstance(
                prompt_adapter_request, list):
            prompt_adapter_request = [prompt_adapter_request] * n

        # n > 1 (parallel sampling): fan out n engine requests per prompt
        # with derived seeds and merge their completions (reference keeps
        # n inside the engine via sequence groups; one-request-per-sample
        # is equivalent under continuous batching).
        from dataclasses import replace as _replace
        ids: list[list[str]] = []
        for i in range(n):
            sp = sampling_params[i]
            rids = []
            for j in range(max(sp.n, 1)):
                spj = sp if sp.n == 1 else _replace(
                    sp, n=1,
                    seed=(sp.seed + j if sp.seed is not None else None))
                rid = self.engine.add_request(
                    prompt=prompts[i] if prompts is not None else None,
                    prompt_token_ids=(list(prompt_token_ids[i])
                                      if prompt_token_ids is not None
                                      else None),
                    sampling_params=spj,
                    lora_request=(lora_request[i] if lora_request
                                  else None),
                    multi_modal_data=(multi_modal_data[i]
                                      if multi_modal_data else None),
                    prompt_adapter_request=(prompt_adapter_request[i]
                                            if prompt_adapter_request
                                            else None))
                rids.append(rid)
            ids.append(rids)

        finals: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if out.finished:
                    finals[out.request_id] = out
        results = []
        for rids in ids:
            outs = [finals[r] for r in rids]
            merged = outs[0]
            if len(outs) > 1:
                from dataclasses import replace as _r
                merged = _r(outs[0], outputs=[
                    _r(o.outputs[0], index=j) for j, o in enumerate(outs)])
            results.append(merged)
        return results


from dataclasses import dataclass, field  # noqa: E402


@dataclass
class BeamSearchParams:
    """Reference analog: vllm/sampling_params.py BeamSearchParams (used by
    LLM.beam_search, which upstream implements at the entrypoint level on
    top of 1-token generate calls with logprobs)."""

    beam_width: int = 4
    max_tokens: int = 16
    ignore_eos: bool = False
    length_penalty: float = 1.0


@dataclass
class BeamSearchSequence:
    tokens: list[int]              # prompt + generated
    cum_logprob: float
    finish_reason: Optional[str] = None


@dataclass
class BeamSearchOutput:
    sequences: list[BeamSearchSequence] = field(default_factory=list)


def _beam_score(seq: BeamSearchSequence, prompt_len: int,
                length_penalty: float) -> float:
    gen_len = max(len(seq.tokens) - prompt_len, 1)
    return seq.cum_logprob / (gen_len ** length_penalty)


def _llm_beam_search(self, prompt_token_ids, params: BeamSearchParams
                     ) -> list[BeamSearchOutput]:
        """Deterministic beam search (reference vllm/entrypoints/llm.py
        beam_search): expands every live beam with its top-2w next-token
        logprobs each round via 1-token greedy generate calls, keeps the w
        best by cumulative logprob, and finally ranks completed beams by
        length-normalized score."""
        w = params.beam_width
        eos = self.engine.eos_token_id
        results = []
        for prompt in prompt_token_ids:
            prompt = list(prompt)
            beams = [BeamSearchSequence(tokens=prompt, cum_logprob=0.0)]
            completed: list[BeamSearchSequence] = []
            for _ in range(params.max_tokens):
                if not beams:
                    break
                outs = self.generate(
                    prompt_token_ids=[b.tokens for b in beams],
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=1, logprobs=2 * w,
                        ignore_eos=True))
                new_beams = []
                for b, o in zip(beams, outs):
                    dist = o.outputs[0].logprobs[0]
                    top = sorted(dist.items(),
                                 key=lambda kv: -kv[1])[:2 * w]
                    for tok, lp in top:
                        cand = BeamSearchSequence(
                            tokens=b.tokens + [tok],
                            cum_logprob=b.cum_logprob + lp)
                        if tok == eos and not params.ignore_eos:
                            cand.finish_reason = "stop"
                            completed.append(cand)
                        else:
                            new_beams.append(cand)
                beams = sorted(new_beams,
                               key=lambda b: -b.cum_logprob)[:w]
            for b in beams:
                b.finish_reason = "length"
            completed.extend(beams)
            completed.sort(key=lambda s: -_beam_score(
                s, len(prompt), params.length_penalty))
            results.append(BeamSearchOutput(sequences=completed[:w]))
        return results


LLM.beam_search = _llm_beam_search


@dataclass
class EmbeddingOutput:
    embedding: list[float]


@dataclass
class EmbeddingRequestOutput:
    request_id: str
    outputs: EmbeddingOutput
    prompt_token_ids: list[int]


def _llm_encode(self, prompts=None, prompt_token_ids=None,
                pooling: str = "last", normalize: bool = True
                ) -> list[EmbeddingRequestOutput]:
    """Embedding/pooling API (reference LLM.encode, vllm/entrypoints/
    llm.py:572 + PoolingParams): pooled final hidden states, optionally
    L2-normalized.  Delegates to LLMEngine.encode."""
    eng = self.engine
    if prompt_token_ids is None:
        if eng.tokenizer is None:
            raise ValueError("no tokenizer; pass prompt_token_ids")
        if isinstance(prompts, str):
            prompts = [prompts]
        prompt_token_ids = [eng.tokenizer.encode(p).ids for p in prompts]
    vecs = eng.encode(prompt_token_ids, pooling=pooling,
                      normalize=normalize)
    return [EmbeddingRequestOutput(
        request_id=f"embd-{i}", prompt_token_ids=list(ids),
        outputs=EmbeddingOutput(embedding=v.tolist()))
        for i, (ids, v) in enumerate(zip(prompt_token_ids, vecs))]


LLM.encode = _llm_encode


def _llm_chat(self, messages, sampling_params=None, chat_template=None,
              tools=None):
    """Chat API (reference LLM.chat, vllm/entrypoints/llm.py:708): apply
    the checkpoint's chat template (or the supplied one / the llama3-style
    fallback) and generate.  ``messages``: one conversation (list of
    {role, content} dicts) or a list of conversations."""
    from .chat_utils import apply_chat_template, load_chat_template
    if self.engine.tokenizer is None:
        raise ValueError("chat requires a tokenizer")
    if messages and isinstance(messages[0], dict):
        messages = [messages]
    tpl = chat_template
    if tpl is None:
        tpl = load_chat_template(self.engine.config.model.model or None)
    prompts = [apply_chat_template(conv, tpl, tools=tools)
               for conv in messages]
    return self.generate(prompts=prompts, sampling_params=sampling_params)


LLM.chat = _llm_chat


@dataclass
class ScoringOutput:
    score: float


@dataclass
class ScoringRequestOutput:
    request_id: str
    outputs: ScoringOutput


def _llm_score(self, text_1, text_2) -> list[ScoringRequestOutput]:
    """Similarity scoring API (reference LLM.score, vllm/entrypoints/
    llm.py): cosine similarity of pooled embeddings between ``text_1``
    (one query, or one per pair) and each of ``text_2``.  With a
    cross-encoder model (BertForSequenceClassification-family rerankers)
    the pair is classified jointly instead (reference cross-encoder
    score task)."""
    import numpy as np
    if isinstance(text_2, str):
        text_2 = [text_2]
    if isinstance(text_1, str):
        text_1 = [text_1] * len(text_2)
    if len(text_1) == 1 and len(text_2) > 1:
        text_1 = text_1 * len(text_2)
    if len(text_1) != len(text_2):
        raise ValueError("text_1 and text_2 must pair up")
    eng = self.engine
    if getattr(eng, "encode_only", False) and eng.model.arch.num_labels:
        # Cross-encoder: tokenize each (query, doc) pair jointly.
        if eng.tokenizer is None:
            raise ValueError("cross-encoder scoring needs a tokenizer")
        ids, tts = [], []
        for a, b in zip(text_1, text_2):
            enc = eng.tokenizer.encode(a, b)
            ids.append(enc.ids)
            tts.append(list(getattr(enc, "type_ids", None)
                            or [0] * len(enc.ids)))
        logits = eng.classify(ids, token_type_ids=tts)
        out = []
        for i, lg in enumerate(logits):
            s = float(lg[0]) if lg.shape[-1] == 1 else float(
                np.exp(lg[-1]) / np.exp(lg).sum())
            out.append(ScoringRequestOutput(
                request_id=f"score-{i}",
                outputs=ScoringOutput(score=s)))
        return out
    emb1 = self.encode(prompts=list(text_1))
    emb2 = self.encode(prompts=list(text_2))
    out = []
    for i, (a, b) in enumerate(zip(emb1, emb2)):
        va = np.asarray(a.outputs.embedding)
        vb = np.asarray(b.outputs.embedding)
        out.append(ScoringRequestOutput(
            request_id=f"score-{i}",
            outputs=ScoringOutput(score=float(va @ vb))))
    return out


LLM.score = _llm_score
