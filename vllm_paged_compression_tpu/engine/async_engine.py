"""Async engine wrapper for online serving.

Reference analog: vllm/engine/async_llm_engine.py:569 (AsyncLLMEngine) —
here much simpler because the engine is single-controller: one background
step loop runs blocking device calls in a thread-pool executor; per-request
asyncio queues deliver incremental outputs to HTTP handlers.
"""

from __future__ import annotations

import asyncio
import threading
from typing import AsyncIterator, Optional

from ..config import EngineConfig
from ..outputs import RequestOutput
from ..sampling_params import SamplingParams
from ..utils import init_logger
from .llm_engine import LLMEngine

logger = init_logger(__name__)


class AsyncLLMEngine:
    def __init__(self, config: EngineConfig, params=None):
        self.engine = LLMEngine(config, params=params)
        self._lock = threading.Lock()  # serializes engine mutations
        self._queues: dict[str, asyncio.Queue] = {}
        self._loop_task: Optional[asyncio.Task] = None
        self.errored: Optional[BaseException] = None

    @classmethod
    def from_engine_args(cls, engine_args) -> "AsyncLLMEngine":
        return cls(engine_args.create_engine_config())

    async def generate(self, request_id: str,
                       sampling_params: SamplingParams,
                       prompt: Optional[str] = None,
                       prompt_token_ids: Optional[list[int]] = None,
                       priority: int = 0,
                       streaming: bool = False
                       ) -> AsyncIterator[RequestOutput]:
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()
        self._queues[request_id] = queue
        try:
            with self._lock:
                self.engine.add_request(
                    request_id=request_id, prompt=prompt,
                    prompt_token_ids=prompt_token_ids,
                    sampling_params=sampling_params, priority=priority)
                if streaming:
                    # Cap decode windows while SSE consumers are live so
                    # tokens arrive in small bursts (stream_scheduler_steps)
                    # instead of window-sized dumps.
                    self.engine.stream_attach()
            self._ensure_loop(loop)
            while True:
                out = await queue.get()
                if isinstance(out, BaseException):
                    raise out
                yield out
                if out.finished:
                    return
        finally:
            if streaming:
                self.engine.stream_detach()
            self._queues.pop(request_id, None)

    async def abort(self, request_id: str) -> None:
        with self._lock:
            self.engine.abort_request(request_id)
        q = self._queues.pop(request_id, None)
        if q is not None:
            out = RequestOutput(request_id=request_id, prompt_token_ids=[],
                                finished=True)
            q.put_nowait(out)

    def _ensure_loop(self, loop: asyncio.AbstractEventLoop) -> None:
        if self._loop_task is None or self._loop_task.done():
            self._loop_task = loop.create_task(self._step_loop())

    async def _step_loop(self) -> None:
        loop = asyncio.get_running_loop()
        try:
            while True:
                with self._lock:
                    busy = self.engine.has_unfinished_requests()
                if not busy:
                    # Idle: poll for new requests cheaply.
                    await asyncio.sleep(0.002)
                    if not self._queues:
                        return
                    continue
                outs = await loop.run_in_executor(None, self._locked_step)
                for out in outs:
                    q = self._queues.get(out.request_id)
                    if q is not None:
                        q.put_nowait(out)
        except (asyncio.CancelledError, GeneratorExit):
            raise
        except BaseException as e:  # propagate to all waiters
            logger.exception("engine step loop failed")
            self.errored = e
            for q in self._queues.values():
                q.put_nowait(e)

    def _locked_step(self):
        with self._lock:
            return self.engine.step()

    # passthroughs used by the API server
    @property
    def tokenizer(self):
        return self.engine.tokenizer

    @property
    def model_path(self):
        return self.engine.config.model.model or None

    def metrics_snapshot(self) -> dict:
        return self.engine.metrics.snapshot()
