"""ctypes binding + lazy build of the native shared-memory message queue
(csrc/shm_msgq.cpp) — the control-plane transport analog of the
reference's shm_broadcast MessageQueue + multiprocessing ZMQ sockets
(vllm/distributed/device_communicators/shm_broadcast.py,
vllm/engine/multiprocessing/).

The .so builds on first use with g++ (no pybind11 in the image; plain C
ABI via ctypes) and is cached keyed by a source hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pickle
import subprocess
from pathlib import Path
from typing import Any, Optional

_CSRC = Path(__file__).resolve().parents[2] / "csrc" / "shm_msgq.cpp"
_LIB = None


def _build_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _CSRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    from .. import envs
    cache_dir = Path(envs.VPC_NATIVE_CACHE)
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / f"shm_msgq-{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             str(_CSRC), "-o", str(tmp), "-lrt"],
            check=True, capture_output=True)
        tmp.rename(so)
    lib = ctypes.CDLL(str(so))
    lib.shmq_create.restype = ctypes.c_void_p
    lib.shmq_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                ctypes.c_uint32]
    lib.shmq_open.restype = ctypes.c_void_p
    lib.shmq_open.argtypes = [ctypes.c_char_p]
    lib.shmq_send.restype = ctypes.c_int
    lib.shmq_send.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_uint32, ctypes.c_int64]
    lib.shmq_recv.restype = ctypes.c_int
    lib.shmq_recv.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_uint32, ctypes.c_int64]
    lib.shmq_pending.restype = ctypes.c_int
    lib.shmq_pending.argtypes = [ctypes.c_void_p]
    lib.shmq_max_msg.restype = ctypes.c_uint32
    lib.shmq_max_msg.argtypes = [ctypes.c_void_p]
    lib.shmq_close.argtypes = [ctypes.c_void_p]
    lib.shmq_unlink.argtypes = [ctypes.c_char_p]
    _LIB = lib
    return lib


class ShmMessageQueue:
    """SPSC byte/object queue over POSIX shared memory.

    One queue per direction; ``create=True`` on the owning side.  send/recv
    of Python objects pickle through the ring (max_msg bounds one message).
    """

    def __init__(self, name: str, create: bool = False,
                 capacity: int = 64, max_msg: int = 1 << 20):
        self._lib = _build_lib()
        self.name = name
        if create:
            self._q = self._lib.shmq_create(name.encode(), capacity, max_msg)
        else:
            self._q = self._lib.shmq_open(name.encode())
        if not self._q:
            raise OSError(f"could not {'create' if create else 'open'} "
                          f"shm queue {name!r}")
        self._buf = ctypes.create_string_buffer(
            self._lib.shmq_max_msg(self._q))

    def send_bytes(self, data: bytes, timeout: Optional[float] = None):
        t = -1 if timeout is None else int(timeout * 1e6)
        rc = self._lib.shmq_send(self._q, data, len(data), t)
        if rc == -1:
            raise TimeoutError(f"send on {self.name}")
        if rc == -2:
            raise ValueError(f"message of {len(data)} B exceeds max_msg")

    def recv_bytes(self, timeout: Optional[float] = None) -> bytes:
        t = -1 if timeout is None else int(timeout * 1e6)
        n = self._lib.shmq_recv(self._q, self._buf, len(self._buf), t)
        if n == -1:
            raise TimeoutError(f"recv on {self.name}")
        if n == -2:
            raise ValueError("receive buffer too small")
        return ctypes.string_at(self._buf, n)

    def send(self, obj: Any, timeout: Optional[float] = None) -> None:
        self.send_bytes(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL),
                        timeout)

    def recv(self, timeout: Optional[float] = None) -> Any:
        return pickle.loads(self.recv_bytes(timeout))

    def pending(self) -> int:
        return self._lib.shmq_pending(self._q)

    def close(self) -> None:
        if self._q:
            self._lib.shmq_close(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
