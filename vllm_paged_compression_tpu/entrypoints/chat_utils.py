"""Chat templating (reference vllm/entrypoints/chat_utils.py).

Renders the checkpoint's own jinja chat template (tokenizer_config.json
``chat_template``) when present; falls back to a llama3-style layout so
chat works for synthetic/tokenizer-less configs too.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_TEMPLATE_CACHE: dict[str, Optional[str]] = {}


def load_chat_template(model_path: Optional[str]) -> Optional[str]:
    if not model_path:
        return None
    if model_path in _TEMPLATE_CACHE:
        return _TEMPLATE_CACHE[model_path]
    tpl = None
    cfg = os.path.join(model_path, "tokenizer_config.json")
    try:
        with open(cfg) as f:
            tpl = json.load(f).get("chat_template")
        if isinstance(tpl, list):   # multi-template form
            tpl = next((t.get("template") for t in tpl
                        if t.get("name") == "default"), None)
    except (OSError, json.JSONDecodeError):
        tpl = None
    _TEMPLATE_CACHE[model_path] = tpl
    return tpl


def _fallback_template(messages: list[dict],
                       tools: Optional[list] = None) -> str:
    parts = []
    if tools:
        # Hermes-style tool prelude: declare the functions and the
        # <tool_call> convention in a leading system block.
        decls = "\n".join(json.dumps(t.get("function", t)) for t in tools)
        parts.append(
            "<|start_header_id|>system<|end_header_id|>\n\n"
            "You have access to the following functions. To call a "
            "function, respond with a JSON object {\"name\": ..., "
            "\"arguments\": {...}} inside <tool_call></tool_call> tags.\n"
            f"{decls}<|eot_id|>")
    for m in messages:
        role = m.get("role", "user")
        content = m.get("content", "")
        if role == "assistant" and m.get("tool_calls"):
            content = (content or "") + "".join(
                "<tool_call>" + json.dumps(
                    {"name": c["function"]["name"],
                     "arguments": json.loads(c["function"]["arguments"])
                     if isinstance(c["function"].get("arguments"), str)
                     else c["function"].get("arguments", {})})
                + "</tool_call>" for c in m["tool_calls"])
        parts.append(f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                     f"{content}<|eot_id|>")
    parts.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(parts)


def apply_chat_template(messages: list[dict],
                        template: Optional[str] = None,
                        bos_token: str = "",
                        add_generation_prompt: bool = True,
                        tools: Optional[list] = None) -> str:
    if template is None:
        return _fallback_template(messages, tools=tools)
    import jinja2
    env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
    env.globals["raise_exception"] = lambda msg: (_ for _ in ()).throw(
        ValueError(msg))
    return env.from_string(template).render(
        messages=messages, bos_token=bos_token,
        add_generation_prompt=add_generation_prompt, tools=tools)
