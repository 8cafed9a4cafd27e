"""KV transfer: disaggregated prefill/decode (SURVEY C19).

Reference analog: vllm/distributed/kv_transfer/ — connector + lookup
buffer + pipe abstractions that let a *prefill instance* compute prompt
KV and a *decode instance* consume it (PyNccl / Mooncake pipes).

TPU-native re-design: KV pages are plain jax arrays, so "transfer" is a
page gather (device->host) on the producer and a page scatter
(host->device) on the consumer — no NCCL pipe layer.  Transports:

- "mem":  in-process queue (two engines in one process; tests, and the
          building block for a same-host prefill+decode split across
          threads)
- "dir":  filesystem spool directory (cross-process / cross-host via
          shared storage; each payload is one atomic pickle file)
- "shm":  the native C++ shared-memory ring (csrc/shm_msgq.cpp) for
          same-host cross-process transfer

Payloads are keyed by a hash of the prompt tokens; the consumer's lookup
buffer absorbs whatever the pipe delivers and requests claim their entry
on arrival (engine._kv_consumer_intake), skipping prefill compute
entirely — including the first sampled token, which rides the payload.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from collections import deque
from dataclasses import dataclass
from typing import Optional


@dataclass
class KVTransferConfig:
    """role: "producer" engines export each finished prefill;
    "consumer" engines import matching prompts and skip prefill."""

    role: str                    # "producer" | "consumer"
    pipe: str = "mem"            # "mem" | "dir" | "shm"
    name: str = "vpc-kv"         # queue name / spool directory

    def verify(self) -> None:
        if self.role not in ("producer", "consumer"):
            raise ValueError("kv_transfer role must be producer|consumer")
        if self.pipe not in ("mem", "dir", "shm"):
            raise ValueError("kv_transfer pipe must be mem|dir|shm")


def prompt_key(token_ids) -> str:
    h = hashlib.sha256()
    h.update(bytes(str(tuple(token_ids)), "utf-8"))
    return h.hexdigest()


# ---- pipes ---------------------------------------------------------------

class MemPipe:
    """In-process queue, shared by name."""

    _registry: dict[str, deque] = {}

    def __init__(self, name: str):
        self.q = MemPipe._registry.setdefault(name, deque())

    def send(self, payload: dict) -> None:
        self.q.append(payload)

    def recv_all(self) -> list[dict]:
        out = []
        while self.q:
            out.append(self.q.popleft())
        return out


class DirPipe:
    """Filesystem spool: one atomic pickle file per payload."""

    def __init__(self, name: str):
        self.dir = name
        os.makedirs(self.dir, exist_ok=True)
        self._n = 0

    def send(self, payload: dict) -> None:
        fn = os.path.join(self.dir,
                          f"{os.getpid()}-{time.time_ns()}-{self._n}")
        self._n += 1
        with open(fn + ".tmp", "wb") as f:
            pickle.dump(payload, f)
        os.rename(fn + ".tmp", fn + ".kv")

    def recv_all(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if not fn.endswith(".kv"):
                continue
            path = os.path.join(self.dir, fn)
            try:
                with open(path, "rb") as f:
                    out.append(pickle.load(f))
                os.remove(path)
            except (OSError, pickle.UnpicklingError):
                continue
        return out


class ShmPipe:
    """Same-host cross-process transfer over the native shm ring."""

    def __init__(self, name: str, create: bool):
        from ..parallel.shm_msgq import ShmMessageQueue
        self.q = ShmMessageQueue(f"/{name}", create=create,
                                 capacity=64 << 20)

    def send(self, payload: dict) -> None:
        self.q.send(payload)

    def recv_all(self) -> list[dict]:
        out = []
        while True:
            try:
                out.append(self.q.recv(timeout=0.0))
            except TimeoutError:
                return out


def build_pipe(config: KVTransferConfig):
    if config.pipe == "mem":
        return MemPipe(config.name)
    if config.pipe == "dir":
        return DirPipe(config.name)
    return ShmPipe(config.name, create=(config.role == "consumer"))


class KVLookupBuffer:
    """Consumer-side store: prompt-key -> payload (reference
    kv_lookup_buffer/).  drain() absorbs newly arrived payloads."""

    def __init__(self, pipe):
        self.pipe = pipe
        self._store: dict[str, dict] = {}

    def drain(self) -> None:
        for payload in self.pipe.recv_all():
            self._store[payload["key"]] = payload

    def take(self, key: str) -> Optional[dict]:
        self.drain()
        return self._store.pop(key, None)
