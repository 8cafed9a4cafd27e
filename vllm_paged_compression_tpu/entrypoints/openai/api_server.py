"""OpenAI-compatible HTTP server on stdlib asyncio.

Reference analog: vllm/entrypoints/openai/api_server.py (FastAPI + uvicorn).
This image ships neither, so the server is a minimal HTTP/1.1 implementation
over asyncio streams: routes /v1/completions, /v1/chat/completions,
/v1/models, /health, /metrics, /version with SSE streaming — the protocol
subset the reference's benchmark clients (benchmarks/backend_request_func.py)
and OpenAI SDK basic usage exercise.
"""

from __future__ import annotations

import asyncio
import json
import os
import time
import uuid
from typing import Optional

from ...engine.async_engine import AsyncLLMEngine
from ...sampling_params import SamplingParams
from ...utils import init_logger

logger = init_logger(__name__)

MAX_BODY = 32 << 20
MAX_HEADER_BYTES = 64 << 10
MAX_HEADERS = 128
# Idle/slow-client read timeout per read call and a server-wide
# connection cap (reference serving hardening surface:
# vllm/entrypoints/openai/api_server.py uvicorn timeouts + limits).
from ... import envs

READ_TIMEOUT = envs.VPC_HTTP_READ_TIMEOUT
MAX_CONNECTIONS = envs.VPC_HTTP_MAX_CONNECTIONS


class HTTPError(Exception):
    def __init__(self, status: int, message: str):
        self.status = status
        self.message = message


def _guided_from_request(body: dict):
    """guided_json / guided_regex / guided_choice extra fields +
    OpenAI ``response_format`` (json_object / json_schema) -> the engine's
    GuidedDecodingParams (reference: vllm/entrypoints/openai/protocol.py
    to_sampling_params guided handling)."""
    from ...sampling_params import GuidedDecodingParams
    rf = body.get("response_format")
    n_set = sum(body.get(k) is not None for k in
                ("guided_json", "guided_regex", "guided_choice",
                 "guided_grammar"))
    if n_set > 1:
        raise HTTPError(400, "at most one guided_* field may be set")
    try:
        if body.get("guided_json") is not None:
            return GuidedDecodingParams(json=body["guided_json"])
        if body.get("guided_regex") is not None:
            return GuidedDecodingParams(regex=body["guided_regex"])
        if body.get("guided_choice") is not None:
            return GuidedDecodingParams(choice=body["guided_choice"])
        if body.get("guided_grammar") is not None:
            raise HTTPError(400, "guided_grammar is not supported; use "
                                 "guided_json / guided_regex / "
                                 "guided_choice")
        if isinstance(rf, dict):
            if rf.get("type") == "json_object":
                return GuidedDecodingParams(json_object=True)
            if rf.get("type") == "json_schema":
                js = rf.get("json_schema") or {}
                schema = js.get("schema", js if "properties" in js
                                else None)
                if schema is None:
                    raise HTTPError(400,
                                    "response_format.json_schema.schema "
                                    "missing")
                return GuidedDecodingParams(json=schema)
    except HTTPError:
        raise
    except (TypeError, ValueError) as e:
        raise HTTPError(400, f"invalid guided-decoding request: {e}")
    return None


def tool_choice_guided_params(tools: list, tool_choice):
    """Forced tool calls (``tool_choice="required"`` or a named function):
    constrain the completion to the tool-call JSON shape
    ``{"name": ..., "arguments": {...}}`` via guided decoding, which the
    json tool parser then lifts into OpenAI tool_calls (reference:
    vllm/entrypoints/openai/serving_chat.py tool_choice -> guided json)."""
    from ...sampling_params import GuidedDecodingParams
    defs = {t["function"]["name"]: t["function"]
            for t in tools
            if t.get("type") == "function" and "function" in t}
    if isinstance(tool_choice, dict):
        name = (tool_choice.get("function") or {}).get("name")
        if name not in defs:
            raise HTTPError(400, f"tool_choice function {name!r} is not "
                                 f"one of the request's tools")
        defs = {name: defs[name]}
    if not defs:
        raise HTTPError(400, "tool_choice given but no function tools "
                             "defined")
    call_schemas = [
        {"type": "object", "properties": {
            "name": {"const": n},
            "arguments": f.get("parameters", {"type": "object"})}}
        for n, f in defs.items()]
    return GuidedDecodingParams(json=(
        call_schemas[0] if len(call_schemas) == 1
        else {"anyOf": call_schemas}))


def _sampling_from_request(body: dict) -> SamplingParams:
    def get(k, d):
        v = body.get(k, d)
        return d if v is None else v
    try:
        return SamplingParams(
            guided_decoding=_guided_from_request(body),
            n=int(get("n", 1)),
            temperature=float(get("temperature", 1.0)),
            top_p=float(get("top_p", 1.0)),
            top_k=int(get("top_k", -1)),
            min_p=float(get("min_p", 0.0)),
            presence_penalty=float(get("presence_penalty", 0.0)),
            frequency_penalty=float(get("frequency_penalty", 0.0)),
            repetition_penalty=float(get("repetition_penalty", 1.0)),
            max_tokens=int(get("max_tokens", 16)),
            min_tokens=int(get("min_tokens", 0)),
            stop=([get("stop", [])] if isinstance(get("stop", []), str)
                  else list(get("stop", []))),
            stop_token_ids=list(get("stop_token_ids", [])),
            ignore_eos=bool(get("ignore_eos", False)),
            seed=body.get("seed"),
            logprobs=body.get("logprobs"),
            logit_bias=({int(k): float(v) for k, v in
                         body["logit_bias"].items()}
                        if body.get("logit_bias") else None),
            allowed_token_ids=body.get("allowed_token_ids"),
            bad_words=body.get("bad_words_token_ids"),
        )
    except (TypeError, ValueError) as e:
        raise HTTPError(400, f"invalid sampling parameters: {e}")


class OpenAIServer:
    def __init__(self, async_engine: AsyncLLMEngine, model_name: str,
                 tool_call_parser: str = "auto"):
        self.engine = async_engine
        self.model_name = model_name
        self.tool_call_parser = tool_call_parser
        self.start_time = time.time()
        self.num_connections = 0

    # ---- HTTP plumbing --------------------------------------------------

    async def _readline(self, reader) -> bytes:
        return await asyncio.wait_for(reader.readline(), READ_TIMEOUT)

    async def _read_headers(self, reader) -> Optional[dict]:
        headers: dict[str, str] = {}
        total = 0
        while True:
            h = await self._readline(reader)
            if h in (b"\r\n", b"\n", b""):
                return headers
            total += len(h)
            if total > MAX_HEADER_BYTES or len(headers) >= MAX_HEADERS:
                return None
            k, _, v = h.decode("latin-1").partition(":")
            headers[k.strip().lower()] = v.strip()

    async def _read_chunked_body(self, reader) -> Optional[bytes]:
        """RFC 7230 chunked transfer-encoding request body; returns None
        when the cumulative size exceeds MAX_BODY."""
        parts: list[bytes] = []
        total = 0
        while True:
            size_line = await self._readline(reader)
            try:
                size = int(size_line.split(b";")[0].strip() or b"0", 16)
            except ValueError:
                raise HTTPError(400, "malformed chunk size")
            if size == 0:
                # consume trailers up to the final blank line
                while True:
                    t = await self._readline(reader)
                    if t in (b"\r\n", b"\n", b""):
                        return b"".join(parts)
            total += size
            if total > MAX_BODY:
                return None
            parts.append(await asyncio.wait_for(
                reader.readexactly(size), READ_TIMEOUT))
            await self._readline(reader)  # trailing CRLF after chunk data

    async def handle_conn(self, reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter) -> None:
        if self.num_connections >= MAX_CONNECTIONS:
            try:
                await self._send(writer, 503,
                                 {"error": {"message": "too many open "
                                            "connections"}})
                writer.close()
            except Exception:
                pass
            return
        self.num_connections += 1
        try:
            while True:
                line = await self._readline(reader)
                if not line:
                    return
                try:
                    method, path, _ = line.decode().split(" ", 2)
                except (ValueError, UnicodeDecodeError):
                    return
                headers = await self._read_headers(reader)
                if headers is None:
                    await self._send(writer, 431,
                                     {"error": {"message":
                                                "headers too large"}})
                    return
                body = b""
                if "chunked" in headers.get("transfer-encoding",
                                            "").lower():
                    maybe = await self._read_chunked_body(reader)
                    if maybe is None:
                        await self._send(writer, 413,
                                         {"error": {"message":
                                                    "body too large"}})
                        return
                    body = maybe
                else:
                    try:
                        n = int(headers.get("content-length", 0))
                    except ValueError:
                        raise HTTPError(400, "bad content-length")
                    if n > MAX_BODY:
                        await self._send(writer, 413,
                                         {"error": {"message":
                                                    "body too large"}})
                        return
                    if n:
                        body = await asyncio.wait_for(
                            reader.readexactly(n), READ_TIMEOUT)
                keep = await self._route(writer, method, path, body)
                if not keep or \
                        headers.get("connection", "").lower() == "close":
                    return
        except (ConnectionError, asyncio.IncompleteReadError,
                asyncio.TimeoutError):
            pass
        except HTTPError as e:
            try:
                await self._send(writer, e.status,
                                 {"error": {"message": e.message}})
            except Exception:
                pass
        finally:
            self.num_connections -= 1
            try:
                writer.close()
            except Exception:
                pass

    async def _route(self, writer, method: str, path: str,
                     body: bytes) -> bool:
        path = path.split("?")[0]
        try:
            if method == "GET" and path in ("/health", "/ping"):
                await self._send(writer, 200, {"status": "ok"})
            elif method == "GET" and path == "/version":
                from ... import __version__
                await self._send(writer, 200, {"version": __version__})
            elif method == "GET" and path == "/v1/models":
                await self._send(writer, 200, {
                    "object": "list",
                    "data": [{"id": self.model_name, "object": "model",
                              "created": int(self.start_time),
                              "owned_by": "vpc-tpu"}]})
            elif method == "GET" and path == "/metrics":
                await self._send_metrics(writer)
            elif method == "POST" and path == "/v1/completions":
                return await self._completions(writer, body, chat=False)
            elif method == "POST" and path == "/v1/chat/completions":
                return await self._completions(writer, body, chat=True)
            elif method == "POST" and path == "/v1/embeddings":
                await self._embeddings(writer, body)
            elif method == "POST" and path in ("/score", "/v1/score"):
                await self._score(writer, body)
            elif method == "POST" and path == "/tokenize":
                await self._tokenize(writer, body)
            elif method == "POST" and path == "/detokenize":
                await self._detokenize(writer, body)
            elif method == "POST" and path == "/start_profile":
                path_out = self.engine.engine.start_profile()
                await self._send(writer, 200, {"status": "ok",
                                               "dir": path_out})
            elif method == "POST" and path == "/stop_profile":
                self.engine.engine.stop_profile()
                await self._send(writer, 200, {"status": "ok"})
            else:
                await self._send(writer, 404,
                                 {"error": {"message": f"no route {path}"}})
        except HTTPError as e:
            await self._send(writer, e.status,
                             {"error": {"message": e.message,
                                        "type": "invalid_request_error"}})
        except Exception as e:  # noqa: BLE001
            logger.exception("handler error")
            await self._send(writer, 500, {"error": {"message": str(e)}})
        return True

    async def _send(self, writer, status: int, obj: dict) -> None:
        data = json.dumps(obj).encode()
        writer.write(
            f"HTTP/1.1 {status} X\r\ncontent-type: application/json\r\n"
            f"content-length: {len(data)}\r\n\r\n".encode() + data)
        await writer.drain()

    async def _send_metrics(self, writer) -> None:
        snap = self.engine.metrics_snapshot()
        lines = []
        for k, v in snap.items():
            lines.append(f"vpc:{k} {v}")
        data = ("\n".join(lines) + "\n").encode()
        writer.write(
            f"HTTP/1.1 200 OK\r\ncontent-type: text/plain\r\n"
            f"content-length: {len(data)}\r\n\r\n".encode() + data)
        await writer.drain()

    async def _embeddings(self, writer, body: bytes) -> None:
        """OpenAI /v1/embeddings (reference api_server.py embeddings
        route): input as string(s) or pre-tokenized id list(s)."""
        import json as _json
        req = _json.loads(body or b"{}")
        inp = req.get("input")
        if inp is None:
            raise HTTPError(400, "missing 'input'")
        if isinstance(inp, str):
            inp = [inp]
        if inp and isinstance(inp[0], int):
            inp = [inp]
        engine = self.engine.engine  # AsyncLLMEngine -> LLMEngine
        token_lists = []
        for item in inp:
            if isinstance(item, str):
                if engine.tokenizer is None:
                    raise HTTPError(400, "server has no tokenizer; send "
                                    "token id lists")
                token_lists.append(engine.tokenizer.encode(item).ids)
            else:
                token_lists.append([int(t) for t in item])
        vecs = engine.encode(token_lists,
                             pooling=req.get("pooling", "last"))
        total = sum(len(t) for t in token_lists)
        await self._send(writer, 200, {
            "object": "list",
            "model": req.get("model", self.model_name),
            "data": [{"object": "embedding", "index": i,
                      "embedding": v.tolist()}
                     for i, v in enumerate(vecs)],
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    async def _score(self, writer, body: bytes) -> None:
        """Similarity scoring (reference /score route): cosine similarity
        of pooled embeddings between text_1 and each text_2."""
        import numpy as np
        req = json.loads(body or b"{}")
        t1, t2 = req.get("text_1"), req.get("text_2")
        if t1 is None or t2 is None:
            raise HTTPError(400, "need 'text_1' and 'text_2'")
        if isinstance(t2, str):
            t2 = [t2]
        if not isinstance(t1, str):
            raise HTTPError(400, "text_1 must be a string")
        engine = self.engine.engine
        if engine.tokenizer is None:
            raise HTTPError(400, "server has no tokenizer")
        if getattr(engine, "encode_only", False) \
                and engine.model.arch.num_labels:
            # Cross-encoder reranker: classify each (query, doc) pair.
            ids, tts = [], []
            for doc in t2:
                enc = engine.tokenizer.encode(t1, doc)
                ids.append(enc.ids)
                tts.append(list(getattr(enc, "type_ids", None)
                                or [0] * len(enc.ids)))
            logits = engine.classify(ids, token_type_ids=tts)
            scores = [float(lg[0]) if lg.shape[-1] == 1 else float(
                np.exp(lg[-1]) / np.exp(lg).sum()) for lg in logits]
            await self._send(writer, 200, {
                "object": "list",
                "model": req.get("model", self.model_name),
                "data": [{"object": "score", "index": i, "score": s}
                         for i, s in enumerate(scores)],
                "usage": {"prompt_tokens": sum(len(t) for t in ids),
                          "total_tokens": sum(len(t) for t in ids)},
            })
            return
        toks = [engine.tokenizer.encode(t).ids for t in [t1] + list(t2)]
        vecs = engine.encode(toks)
        q = np.asarray(vecs[0])
        await self._send(writer, 200, {
            "object": "list",
            "model": req.get("model", self.model_name),
            "data": [{"object": "score", "index": i,
                      "score": float(q @ np.asarray(v))}
                     for i, v in enumerate(vecs[1:])],
            "usage": {"prompt_tokens": sum(len(t) for t in toks),
                      "total_tokens": sum(len(t) for t in toks)},
        })

    # ---- tokenize / detokenize (reference api_server.py:310-429) -------

    async def _tokenize(self, writer, body: bytes) -> None:
        req = json.loads(body or b"{}")
        if self.engine.tokenizer is None:
            raise HTTPError(400, "server has no tokenizer")
        text = req.get("prompt") or req.get("text")
        if not isinstance(text, str):
            raise HTTPError(400, "need a string 'prompt'")
        ids = self.engine.tokenizer.encode(text).ids
        await self._send(writer, 200, {"tokens": ids, "count": len(ids)})

    async def _detokenize(self, writer, body: bytes) -> None:
        req = json.loads(body or b"{}")
        if self.engine.tokenizer is None:
            raise HTTPError(400, "server has no tokenizer")
        toks = req.get("tokens")
        if not isinstance(toks, list):
            raise HTTPError(400, "need a 'tokens' list")
        await self._send(writer, 200,
                         {"prompt": self.engine.tokenizer.decode(toks)})

    # ---- completions ----------------------------------------------------

    def _chat_to_prompt(self, messages: list[dict],
                        tools: Optional[list] = None) -> str:
        """Chat templating: the checkpoint's own jinja template when
        available, llama3-style fallback otherwise.  ``tools`` are passed
        through to the template (or a hermes-style prelude is prepended by
        the fallback)."""
        from ..chat_utils import apply_chat_template, load_chat_template
        tpl = load_chat_template(getattr(self.engine, "model_path", None))
        return apply_chat_template(messages, tpl, tools=tools)

    async def _completions(self, writer, body: bytes, chat: bool) -> bool:
        try:
            req = json.loads(body or b"{}")
        except json.JSONDecodeError:
            raise HTTPError(400, "invalid JSON body")
        params = _sampling_from_request(req)
        stream = bool(req.get("stream", False))
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"

        prompt: Optional[str] = None
        prompt_token_ids: Optional[list[int]] = None
        tools = None
        if chat:
            messages = req.get("messages")
            if not isinstance(messages, list) or not messages:
                raise HTTPError(400, "messages must be a non-empty list")
            tools = req.get("tools")
            tc = req.get("tool_choice")
            if tc == "none":
                tools = None
            elif tools and (tc == "required"
                            or (isinstance(tc, dict)
                                and tc.get("type") == "function")):
                if params.guided_decoding is not None:
                    raise HTTPError(400, "tool_choice forcing cannot be "
                                         "combined with guided_* fields")
                params.guided_decoding = tool_choice_guided_params(tools,
                                                                   tc)
            prompt = self._chat_to_prompt(messages, tools=tools)
        else:
            p = req.get("prompt")
            if isinstance(p, str):
                prompt = p
            elif isinstance(p, list) and p and isinstance(p[0], int):
                prompt_token_ids = p
            elif isinstance(p, list) and p and isinstance(p[0], str):
                prompt = p[0]
            else:
                raise HTTPError(400, "prompt must be a string or token list")
        if prompt is not None and self.engine.tokenizer is None:
            raise HTTPError(400, "server has no tokenizer; send token ids")

        created = int(time.time())
        obj = "chat.completion" if chat else "text_completion"

        if not stream:
            final = None
            async for out in self.engine.generate(
                    rid, params, prompt=prompt,
                    prompt_token_ids=prompt_token_ids):
                final = out
            await self._send(writer, 200, self._response_json(
                rid, created, obj, final, chat,
                parse_tools=tools is not None))
            return True

        # SSE streaming
        writer.write(b"HTTP/1.1 200 OK\r\ncontent-type: text/event-stream\r\n"
                     b"cache-control: no-cache\r\n"
                     b"transfer-encoding: chunked\r\n\r\n")
        await writer.drain()
        sent_text_len = 0
        sent_ntok = 0
        async for out in self.engine.generate(
                rid, params, prompt=prompt,
                prompt_token_ids=prompt_token_ids, streaming=True):
            co = out.outputs[0]
            delta_text = co.text[sent_text_len:]
            sent_text_len = len(co.text)
            sent_ntok = len(co.token_ids)
            if chat:
                chunk = {"id": rid, "object": "chat.completion.chunk",
                         "created": created, "model": self.model_name,
                         "choices": [{"index": 0,
                                      "delta": {"content": delta_text},
                                      "finish_reason": co.finish_reason}]}
            else:
                chunk = {"id": rid, "object": "text_completion",
                         "created": created, "model": self.model_name,
                         "choices": [{"index": 0, "text": delta_text,
                                      "finish_reason": co.finish_reason}]}
            await self._write_chunk(writer,
                                    f"data: {json.dumps(chunk)}\n\n")
        await self._write_chunk(writer, "data: [DONE]\n\n")
        writer.write(b"0\r\n\r\n")
        await writer.drain()
        return False  # close after stream

    async def _write_chunk(self, writer, text: str) -> None:
        data = text.encode()
        writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
        await writer.drain()

    def _response_json(self, rid, created, obj, out, chat: bool,
                       parse_tools: bool = False) -> dict:
        co = out.outputs[0]
        usage = {"prompt_tokens": len(out.prompt_token_ids),
                 "completion_tokens": len(co.token_ids),
                 "total_tokens": len(out.prompt_token_ids)
                 + len(co.token_ids)}
        if chat:
            message = {"role": "assistant", "content": co.text}
            finish = co.finish_reason
            if parse_tools:
                from .tool_parsers import parse_tool_calls
                content, calls = parse_tool_calls(co.text,
                                                  self.tool_call_parser)
                if calls:
                    message = {"role": "assistant",
                               "content": content or None,
                               "tool_calls": calls}
                    finish = "tool_calls"
            choice = {"index": 0, "message": message,
                      "finish_reason": finish}
        else:
            choice = {"index": 0, "text": co.text,
                      "finish_reason": co.finish_reason}
        return {"id": rid, "object": obj, "created": created,
                "model": self.model_name, "choices": [choice],
                "usage": usage}


async def serve(async_engine: AsyncLLMEngine, model_name: str,
                host: str = "0.0.0.0", port: int = 8000,
                tool_call_parser: str = "auto"):
    server = OpenAIServer(async_engine, model_name,
                          tool_call_parser=tool_call_parser)
    srv = await asyncio.start_server(server.handle_conn, host, port)
    logger.info("OpenAI-compatible server listening on %s:%d", host, port)
    async with srv:
        await srv.serve_forever()


def run_server(engine_args, host: str = "0.0.0.0", port: int = 8000,
               tool_call_parser: str = "auto") -> None:
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    name = engine_args.model or "synthetic"
    asyncio.run(serve(engine, name, host, port,
                      tool_call_parser=tool_call_parser))
