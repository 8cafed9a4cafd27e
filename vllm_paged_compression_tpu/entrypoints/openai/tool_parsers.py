"""Tool-call extraction from generated text.

Reference analog: vllm/entrypoints/openai/tool_parsers/ (hermes, mistral,
llama3-json, ...).  Each parser turns the model's raw completion into
(plain content, [tool calls]); a tool call is OpenAI-shaped:
{"id", "type": "function", "function": {"name", "arguments": <json str>}}.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Optional

_HERMES_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
_MISTRAL_PREFIX = "[TOOL_CALLS]"
_PYTHON_TAG = "<|python_tag|>"


def _mk_call(name: str, arguments) -> dict:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments)
    return {"id": f"chatcmpl-tool-{uuid.uuid4().hex[:24]}",
            "type": "function",
            "function": {"name": name, "arguments": arguments}}


def _from_obj(obj) -> Optional[list[dict]]:
    """Accept {"name": ..., "arguments"|"parameters": ...} or a list of
    such objects (the llama3.1 / mistral JSON shapes)."""
    if isinstance(obj, dict):
        obj = [obj]
    if not isinstance(obj, list):
        return None
    calls = []
    for item in obj:
        if not isinstance(item, dict) or "name" not in item:
            return None
        args = item.get("arguments", item.get("parameters", {}))
        calls.append(_mk_call(item["name"], args))
    return calls or None


def _parse_hermes(text: str):
    matches = list(_HERMES_RE.finditer(text))
    if not matches:
        return text, []
    calls = []
    for m in matches:
        try:
            got = _from_obj(json.loads(m.group(1)))
        except json.JSONDecodeError:
            got = None
        if got:
            calls.extend(got)
    content = _HERMES_RE.sub("", text).strip()
    return content, calls


def _parse_json(text: str):
    s = text.strip()
    if s.startswith(_MISTRAL_PREFIX):
        s = s[len(_MISTRAL_PREFIX):].strip()
    if s.startswith(_PYTHON_TAG):
        s = s[len(_PYTHON_TAG):].strip()
    if not (s.startswith("{") or s.startswith("[")):
        return text, []
    # Allow multiple ';'-separated calls (llama3.1 emits them joined).
    try:
        got = _from_obj(json.loads(s))
    except json.JSONDecodeError:
        parts = [p for p in s.split(";") if p.strip()]
        got = []
        try:
            for p in parts:
                sub = _from_obj(json.loads(p))
                if not sub:
                    return text, []
                got.extend(sub)
        except json.JSONDecodeError:
            return text, []
    if not got:
        return text, []
    return "", got


def parse_tool_calls(text: str, parser: str = "auto"):
    """Returns (content, tool_calls).  ``parser``: "hermes" (XML-tagged
    JSON), "json" (bare JSON object/array, mistral/llama3.1 prefixes), or
    "auto" (hermes tags if present, else bare JSON)."""
    if parser == "hermes":
        return _parse_hermes(text)
    if parser == "json":
        return _parse_json(text)
    if parser == "auto":
        content, calls = _parse_hermes(text)
        if calls:
            return content, calls
        return _parse_json(text)
    raise ValueError(f"unknown tool parser {parser!r}")
