"""JSON-schema -> regex for guided decoding.

Analog of outlines' ``build_regex_from_schema`` used by the reference
(vllm/model_executor/guided_decoding/outlines_decoding.py).  Supports the
common constrained-output subset:

- type: string (minLength/maxLength/pattern/enum/const), integer, number,
  boolean, null
- object with ``properties`` (emitted in declaration order; all properties
  are emitted — the usual simplification for function-call-style output)
- array with ``items`` (+ minItems/maxItems)
- enum / const of arbitrary JSON values
- anyOf / oneOf (alternation), local $ref into $defs / definitions
- missing/absent type: a generic JSON value with bounded nesting depth
  (regexes cannot express unbounded nesting; depth 3 covers practical use
  and is the same trade chosen for ``json_object`` mode)
"""

from __future__ import annotations

import json

_WS = r"[ ]?"    # optional single space between structural tokens

_STRING_CHAR = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{_STRING_CHAR}*"'
INTEGER = r"(?:-?(?:0|[1-9][0-9]*))"
NUMBER = r"(?:-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"
BOOLEAN = r"(?:true|false)"
NULL = r"null"


def _escape_literal(text: str) -> str:
    """Regex-escape a literal string (our parser's metacharacters)."""
    out = []
    for ch in text:
        if ch in r"\.[]{}()*+?|^$":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _const_regex(value) -> str:
    return _escape_literal(json.dumps(value, separators=(", ", ": ")))


def json_value_regex(depth: int = 3) -> str:
    """Generic JSON value with nesting bounded by ``depth`` (for
    ``response_format={"type": "json_object"}`` requests)."""
    prim = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
    v = prim
    for _ in range(depth):
        member = f"{STRING}{_WS}:{_WS}{v}"
        obj = (rf"\{{{_WS}(?:{member}(?:{_WS},{_WS}{member})*)?{_WS}\}}")
        arr = rf"\[{_WS}(?:{v}(?:{_WS},{_WS}{v})*)?{_WS}\]"
        v = f"(?:{prim}|{obj}|{arr})"
    return v


def build_regex_from_schema(schema, max_depth: int = 8) -> str:
    """``schema``: dict or JSON string."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict):
        raise ValueError(f"schema must be an object, got {type(schema)}")
    root = schema
    return _to_regex(schema, root, max_depth)


def _resolve_ref(ref: str, root: dict) -> dict:
    if not ref.startswith("#/"):
        raise ValueError(f"only local $ref supported, got {ref!r}")
    node = root
    for part in ref[2:].split("/"):
        part = part.replace("~1", "/").replace("~0", "~")
        node = node[part]
    return node


def _to_regex(schema: dict, root: dict, depth: int) -> str:
    if depth <= 0:
        raise ValueError("schema nesting too deep")
    if "$ref" in schema:
        return _to_regex(_resolve_ref(schema["$ref"], root), root, depth - 1)
    if "const" in schema:
        return _const_regex(schema["const"])
    if "enum" in schema:
        opts = "|".join(_const_regex(v) for v in schema["enum"])
        return f"(?:{opts})"
    for key in ("anyOf", "oneOf"):
        if key in schema:
            opts = "|".join(_to_regex(s, root, depth - 1)
                            for s in schema[key])
            return f"(?:{opts})"

    t = schema.get("type")
    if isinstance(t, list):
        opts = "|".join(_to_regex({**schema, "type": tt}, root, depth - 1)
                        for tt in t)
        return f"(?:{opts})"
    if t == "string":
        if "pattern" in schema:
            return f'"(?:{schema["pattern"]})"'
        lo = schema.get("minLength", 0)
        hi = schema.get("maxLength")
        if lo or hi is not None:
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{_STRING_CHAR}{rep}"'
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            return json_value_regex(2)
        members = []
        for name, sub in props.items():
            key = _escape_literal(json.dumps(name))
            members.append(
                f"{key}{_WS}:{_WS}{_to_regex(sub, root, depth - 1)}")
        body = f"{_WS},{_WS}".join(members)
        return rf"\{{{_WS}{body}{_WS}\}}"
    if t == "array" or "items" in schema:
        item = _to_regex(schema.get("items", {}), root, depth - 1)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        if lo == 0:
            rest = (f"(?:{_WS},{_WS}{item}){{0,{hi - 1}}}" if hi
                    else f"(?:{_WS},{_WS}{item})*")
            body = f"(?:{item}{rest})?"
        else:
            rep = (f"{{{lo - 1},{hi - 1}}}" if hi is not None
                   else f"{{{lo - 1},}}")
            body = f"{item}(?:{_WS},{_WS}{item}){rep}"
        return rf"\[{_WS}{body}{_WS}\]"
    # no type: generic value
    return json_value_regex(2)
