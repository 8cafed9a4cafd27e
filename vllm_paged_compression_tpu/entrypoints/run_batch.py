"""Offline batch runner (reference vllm/entrypoints/openai/run_batch.py):
reads an OpenAI-batch-format JSONL of /v1/(chat/)completions requests,
runs them through one engine, writes a JSONL of responses.

Usage:
    python -m vllm_paged_compression_tpu.entrypoints.run_batch \
        -i requests.jsonl -o results.jsonl --model /path/to/ckpt [...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import uuid

from ..engine.arg_utils import EngineArgs
from ..engine.llm_engine import LLMEngine
from ..sampling_params import SamplingParams
from .chat_utils import apply_chat_template, load_chat_template


def _params_from_body(body: dict) -> SamplingParams:
    return SamplingParams(
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", -1)),
        max_tokens=int(body.get("max_tokens", 16)),
        seed=body.get("seed"),
        stop=([body["stop"]] if isinstance(body.get("stop"), str)
              else list(body.get("stop") or [])),
        ignore_eos=bool(body.get("ignore_eos", False)))


def run_batch(engine: LLMEngine, lines: list[str],
              model_name: str) -> list[dict]:
    tpl = load_chat_template(engine.config.model.model or None)
    meta: dict[str, dict] = {}
    for line in lines:
        if not line.strip():
            continue
        req = json.loads(line)
        body = req.get("body", {})
        chat = "chat" in (req.get("url") or "/v1/chat/completions")
        if chat:
            prompt = apply_chat_template(body.get("messages", []), tpl)
            prompt_ids = None
        else:
            p = body.get("prompt")
            prompt, prompt_ids = (p, None) if isinstance(p, str) \
                else (None, p)
        rid = engine.add_request(
            prompt=prompt, prompt_token_ids=prompt_ids,
            sampling_params=_params_from_body(body))
        meta[rid] = {"custom_id": req.get("custom_id"), "chat": chat}

    results = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            if not out.finished:
                continue
            m = meta[out.request_id]
            co = out.outputs[0]
            if m["chat"]:
                choice = {"index": 0, "message": {
                    "role": "assistant", "content": co.text},
                    "finish_reason": co.finish_reason}
                obj = "chat.completion"
            else:
                choice = {"index": 0, "text": co.text,
                          "finish_reason": co.finish_reason}
                obj = "text_completion"
            results.append({
                "id": f"batch-{uuid.uuid4().hex[:16]}",
                "custom_id": m["custom_id"],
                "response": {"status_code": 200, "body": {
                    "id": out.request_id, "object": obj,
                    "created": int(time.time()),
                    "model": model_name, "choices": [choice],
                    "usage": {
                        "prompt_tokens": len(out.prompt_token_ids),
                        "completion_tokens": len(co.token_ids),
                        "total_tokens": len(out.prompt_token_ids)
                        + len(co.token_ids)}}}})
    return results


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input-file", required=True)
    parser.add_argument("-o", "--output-file", required=True)
    EngineArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    engine = LLMEngine(EngineArgs.from_cli_args(args).create_engine_config())
    with open(args.input_file) as f:
        lines = f.readlines()
    results = run_batch(engine, lines, args.model or "synthetic")
    with open(args.output_file, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(results)} results to {args.output_file}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
