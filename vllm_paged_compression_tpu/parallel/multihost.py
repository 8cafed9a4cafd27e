"""Multi-host control plane for pod-slice serving (SURVEY §7 phase 6).

Reference analog: the fork broadcasts scheduler outputs to local workers
over a shared-memory ring + ZMQ (vllm/distributed/device_communicators/
shm_broadcast.py MessageQueue, 527 LoC) and places multi-node workers via
Ray (vllm/executor/ray_gpu_executor.py).  The TPU-native design is
multi-controller SPMD instead: every host runs the same engine binary,
``jax.distributed`` wires the hosts into one global device mesh, and the
compiled step functions execute collectives over ICI/DCN.  What remains
host-side — and what this module provides — is the CONTROL PLANE that
keeps every host executing an IDENTICAL schedule, because under SPMD a
single divergent jit argument deadlocks the slice:

- ``sync_requests``: hosts ingest requests independently (each API
  frontend takes its own traffic); an allgather + deterministic merge
  gives every host the same request stream in the same order.
- ``broadcast_plan``: scheduling decisions are made ONCE, by host 0's
  scheduler, and the packed per-step plan arrays (the same
  ``_PLAN_FIELDS`` pack the single-host runner consumes) are broadcast;
  follower hosts feed the received plan into their local shards of the
  jitted step.
- ``assert_same_across_hosts``: cheap digest allgather used by tests and
  debug mode to prove schedule determinism instead of assuming it.

Transport is jax's own collectives (gloo on CPU hosts, DCN on pods) via
``jax.experimental.multihost_utils`` — no ZMQ layer, no custom ring.
The intra-host analog (driver ↔ out-of-process API server) remains the
native shm ring in csrc/shm_msgq.cpp; this module is the cross-host
tier the reference implements with Ray + NCCL broadcast.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Optional

import numpy as np


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host slice (idempotent; must run before anything
    touches the XLA backend — call it first in the serving entrypoint).

    Arguments default to jax's standard environment discovery
    (COORDINATOR_ADDRESS / on-TPU metadata); on a real pod slice
    ``jax.distributed.initialize()`` with no arguments is sufficient.
    """
    global _initialized
    if _initialized:
        return
    import jax
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    _initialized = True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    """Host 0 owns the scheduler; everyone else follows its plan."""
    return process_index() == 0


def _to_bytes(obj: Any) -> np.ndarray:
    raw = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    return np.frombuffer(raw, np.uint8)


def _from_bytes(arr: np.ndarray) -> Any:
    return pickle.loads(arr.tobytes())


def _allgather_bytes(payload: np.ndarray) -> list[np.ndarray]:
    """Variable-length uint8 allgather: pad to the global max length
    (one scalar allgather first), then gather the padded buffers."""
    from jax.experimental import multihost_utils
    n = np.asarray([payload.size], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [gathered[i, :int(sizes[i])] for i in range(len(sizes))]


def sync_requests(local_requests: list) -> list:
    """Per-host ingestion merge: every host contributes the requests its
    own frontend accepted since the last sync; all hosts return the SAME
    globally-ordered list (host-major, arrival-order within host).

    Each request must be picklable (request_id, prompt ids, params);
    request_ids must be globally unique — prefix with the host id at the
    frontend (the reference gets uniqueness from the single Ray driver).
    """
    if process_count() == 1:
        return list(local_requests)
    parts = _allgather_bytes(_to_bytes(list(local_requests)))
    merged: list = []
    for p in parts:
        merged.extend(_from_bytes(p))
    return merged


def broadcast_plan(plan: Any) -> Any:
    """Ship host 0's scheduling decision to every host.

    ``plan`` is an arbitrary picklable pytree (token arrays, the
    [K, NF, B] plan pack, prefill chunk descriptors...).  Host 0 passes
    its real plan; followers pass anything (ignored) and receive host
    0's.  Returns the authoritative plan on every host.
    """
    if process_count() == 1:
        return plan
    from jax.experimental import multihost_utils
    payload = _to_bytes(plan) if is_primary() else np.zeros(0, np.uint8)
    # Length first (followers don't know it), then the buffer.
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([payload.size], np.int64))
    buf = np.zeros(int(n[0]), np.uint8)
    if is_primary():
        buf[:] = payload
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf),
                     np.uint8)
    return _from_bytes(out)


def digest(obj: Any) -> str:
    return hashlib.sha256(pickle.dumps(obj,
                                       protocol=4)).hexdigest()[:16]


def assert_same_across_hosts(obj: Any, what: str = "object") -> None:
    """Deterministic-schedule assertion: all hosts must hold an
    identical ``obj`` (digest allgather; raises on divergence).  Cheap
    enough to leave on in debug serving (VPC_MULTIHOST_CHECK=1)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    d = np.frombuffer(digest(obj).encode(), np.uint8)
    all_d = np.asarray(multihost_utils.process_allgather(d))
    for i in range(all_d.shape[0]):
        if not np.array_equal(all_d[i], all_d[0]):
            raise AssertionError(
                f"multi-host schedule divergence in {what}: host {i} "
                f"digest {all_d[i].tobytes().decode()} != host 0 "
                f"{all_d[0].tobytes().decode()}")


def check_enabled() -> bool:
    from .. import envs
    return envs.VPC_MULTIHOST_CHECK


def global_mesh(tp: int, dp: int = 1, pp: int = 1):
    """Mesh over ALL hosts' devices (jax.devices() is global after
    initialize()); same axis layout as parallel.mesh.build_mesh but
    spanning the slice.  tp*dp*pp must equal the global device count —
    shardings over this mesh make GSPMD emit ICI/DCN collectives."""
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices())
    assert tp * dp * pp == devs.size, (tp, dp, pp, devs.size)
    return Mesh(devs.reshape(pp, dp, tp), ("pipe", "data", "model"))
