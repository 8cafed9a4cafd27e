"""Out-of-process engine over the native shared-memory queue.

Reference analog: MQLLMEngine + MQLLMEngineClient
(vllm/engine/multiprocessing/engine.py:32, client.py:59) — the engine owns
the accelerator in its own process; front ends (API server workers) talk
to it over IPC.  The reference transports over ZMQ; here the transport is
the C++ SPSC shm ring (csrc/shm_msgq.cpp), so the client side stays free
of jax/TPU initialization entirely (one process owns the chip).

Protocol (pickled tuples):
  client -> engine: ("add_request", kwargs) | ("abort", request_id)
                    | ("ping",) | ("shutdown",)
  engine -> client: ("output", RequestOutput) | ("pong",)
                    | ("error", repr) | ("bye",)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time
from typing import Optional

from ..config import EngineConfig
from ..parallel.shm_msgq import ShmMessageQueue
from ..utils import init_logger

logger = init_logger(__name__)


def _engine_main(config: EngineConfig, req_name: str, out_name: str) -> None:
    req_q = ShmMessageQueue(req_name, create=False)
    out_q = ShmMessageQueue(out_name, create=False)
    try:
        # Honor an explicit platform request from the parent: the host's
        # sitecustomize imports jax and pins the TPU platform before env
        # vars are consulted, so a bare JAX_PLATFORMS=cpu (e.g. tests
        # isolating the chip) would otherwise be ignored here.
        if os.environ.get("JAX_PLATFORMS"):
            import jax
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        from .llm_engine import LLMEngine
        engine = LLMEngine(config)
        out_q.send(("ready",))
    except Exception as e:  # construction failure must reach the client
        out_q.send(("error", repr(e)))
        return
    running = True
    while running:
        # Drain control messages; block only when idle.
        block = not engine.has_unfinished_requests()
        while True:
            try:
                msg = req_q.recv(timeout=None if block else 0.0)
            except TimeoutError:
                break
            block = False
            kind = msg[0]
            if kind == "add_request":
                try:
                    engine.add_request(**msg[1])
                except Exception as e:
                    out_q.send(("error", repr(e)))
            elif kind == "abort":
                engine.abort_request(msg[1])
            elif kind == "ping":
                out_q.send(("pong",))
            elif kind == "shutdown":
                running = False
                break
        if running and engine.has_unfinished_requests():
            try:
                for out in engine.step():
                    out_q.send(("output", out))
            except Exception as e:
                out_q.send(("error", repr(e)))
                running = False
    out_q.send(("bye",))


class MPEngineClient:
    """Runs LLMEngine in a child process; this side never touches jax."""

    def __init__(self, config: EngineConfig,
                 start_timeout: float = 600.0):
        tag = f"vpc-{os.getpid()}-{int(time.time() * 1e3) & 0xFFFFFF}"
        self._req_q = ShmMessageQueue(f"/{tag}-req", create=True)
        self._out_q = ShmMessageQueue(f"/{tag}-out", create=True)
        self._stashed: list = []
        ctx = mp.get_context("spawn")
        self._proc = ctx.Process(
            target=_engine_main,
            args=(config, f"/{tag}-req", f"/{tag}-out"), daemon=True)
        self._proc.start()
        kind, *rest = self._out_q.recv(timeout=start_timeout)
        if kind == "error":
            raise RuntimeError(f"engine process failed: {rest[0]}")
        assert kind == "ready", kind

    def add_request(self, **kwargs) -> None:
        self._req_q.send(("add_request", kwargs))

    def abort_request(self, request_id: str) -> None:
        self._req_q.send(("abort", request_id))

    def ping(self, timeout: float = 30.0) -> bool:
        self._req_q.send(("ping",))
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            kind, *rest = self._out_q.recv(timeout=deadline
                                           - time.monotonic())
            if kind == "pong":
                return True
            self._stash(kind, rest)
        return False

    def _stash(self, kind, rest):
        self._stashed.append((kind, *rest))

    def get_output(self, timeout: Optional[float] = None):
        """Next RequestOutput (raises on engine error)."""
        while True:
            if self._stashed:
                msg = self._stashed.pop(0)
            else:
                msg = self._out_q.recv(timeout=timeout)
            kind = msg[0]
            if kind == "output":
                return msg[1]
            if kind == "error":
                raise RuntimeError(f"engine error: {msg[1]}")
            if kind == "bye":
                raise EOFError("engine shut down")
            # pong outside ping(): drop

    def shutdown(self) -> None:
        if self._proc.is_alive():
            try:
                self._req_q.send(("shutdown",), timeout=5.0)
            except TimeoutError:
                pass
            self._proc.join(timeout=30)
            if self._proc.is_alive():
                self._proc.terminate()
        self._req_q.close()
        self._out_q.close()
