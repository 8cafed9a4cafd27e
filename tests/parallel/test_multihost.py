"""Multi-host control plane: 2 simulated hosts x 4 CPU devices each
(reference analog: .buildkite/run-multi-node-test.sh simulates multi-node
with containers on one machine; shm_broadcast.py test_shm_broadcast.py
covers the intra-node ring — here the cross-host tier is jax.distributed
+ multihost_utils, SURVEY §5 "Distributed communication backend").

Two drills, both exposed as `run_drill` so the driver dryrun
(__graft_entry__.dryrun_multichip) exercises them by default:

- positive: per-host request ingestion -> deterministic global merge ->
  host-0 scheduling -> plan broadcast -> one SPMD step over the GLOBAL
  mesh; every cross-host assertion must pass on both hosts.
- negative: a follower whose ingestion DIVERGES (tampered stream) must
  be *caught* by assert_same_across_hosts on every host — symmetric
  digest allgather, no deadlock — and then converge by adopting host
  0's authoritative stream via broadcast_plan.
"""

import os
import subprocess
import sys
import textwrap

import pytest

_PORT = 29871
_PORT_NEG = 29873

_PREAMBLE = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "@REPO@")
    from vllm_paged_compression_tpu.parallel import multihost as mh
    mh.initialize("localhost:@PORT@", num_processes=2, process_id=pid)
    assert mh.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())
""")

_WORKER = _PREAMBLE + textwrap.dedent("""
    # ---- per-host request ingestion -> identical global stream -------
    local = [(f"h{pid}-r{i}", list(range(1, 8 + pid + i)))
             for i in range(2 + pid)]   # hosts ingest DIFFERENT requests
    stream = mh.sync_requests(local)
    assert len(stream) == 5, stream
    mh.assert_same_across_hosts(stream, "request stream")

    # ---- host-0 scheduling, plan broadcast ---------------------------
    from vllm_paged_compression_tpu.config import (CacheConfig,
                                                   SchedulerConfig)
    from vllm_paged_compression_tpu.core.scheduler import Scheduler
    from vllm_paged_compression_tpu.core.sequence import Sequence
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sched = Scheduler(SchedulerConfig(max_num_seqs=8,
                                      max_num_batched_tokens=512,
                                      max_model_len=128),
                      CacheConfig(block_size=4), 64)
    for rid, toks in stream:
        sched.add_seq(Sequence(rid, toks,
                               SamplingParams(max_tokens=4,
                                              temperature=0.0)))
    out = sched.schedule()
    local_plan = [(p.seq.request_id, p.prompt_len, p.chunk_start,
                   p.chunk_end) for p in out.prefills]
    # Determinism property the design relies on: identical streams =>
    # identical schedules on every host.
    mh.assert_same_across_hosts(local_plan, "schedule")
    # Authoritative path: host 0's decision is what executes.  A
    # follower feeding a DIFFERENT plan must still end with host 0's.
    plan = mh.broadcast_plan(local_plan if pid == 0 else ["wrong"])
    assert plan == local_plan, (pid, plan)

    # ---- one SPMD step over the GLOBAL mesh --------------------------
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = mh.global_mesh(tp=8)
    rng = np.random.default_rng(0)        # same weights on every host
    w_host = rng.standard_normal((32, 64)).astype(np.float32)
    w = jax.make_array_from_callback(
        (32, 64), NamedSharding(mesh, P(None, "model")),
        lambda idx: w_host[idx])          # TP-sharded over both hosts
    toks = np.asarray([t[:4] for _, t in stream], np.int32)
    x = jax.make_array_from_callback(
        toks.shape + (32,), NamedSharding(mesh, P()),
        lambda idx: np.eye(32, dtype=np.float32)[toks % 32][idx])

    @jax.jit
    def step(x, w):
        y = jnp.einsum("btd,df->btf", x, w)     # GSPMD: allgather-free
        return jnp.sum(y, axis=-1)              # psum over "model"

    y = np.asarray(step(x, w))
    mh.assert_same_across_hosts(y.tolist(), "step output")
    expect = np.eye(32, dtype=np.float32)[toks % 32] @ w_host
    np.testing.assert_allclose(y, expect.sum(-1), rtol=1e-4, atol=1e-4)
    print(f"WORKER{pid}_OK", flush=True)
""")

_WORKER_NEG = _PREAMBLE + textwrap.dedent("""
    # Both hosts merge the same stream, then host 1's copy is tampered
    # (simulating a frontend that missed a sync or reordered arrivals).
    local = [(f"h{pid}-r{i}", list(range(1, 6 + i))) for i in range(2)]
    stream = mh.sync_requests(local)
    if pid == 1:
        stream = stream[::-1]
    caught = False
    try:
        mh.assert_same_across_hosts(stream, "request stream")
    except AssertionError as e:
        caught = True
        assert "request stream" in str(e)
    # EVERY host must detect the divergence (the digest allgather is
    # symmetric) — and detection must not deadlock the slice.
    assert caught, f"host {pid}: divergence not caught"
    print(f"DIVERGENCE_CAUGHT{pid}", flush=True)
    # Recovery: adopt host 0's authoritative stream and re-verify.
    stream = mh.broadcast_plan(stream)
    mh.assert_same_across_hosts(stream, "recovered stream")
    print(f"WORKER{pid}_OK", flush=True)
""")


def run_drill(tmp_path, negative: bool = False, timeout: int = 300):
    """Spawn the 2-host drill (used by pytest AND the driver dryrun)."""
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    script = tmp_path / ("worker_neg.py" if negative else "worker.py")
    worker = _WORKER_NEG if negative else _WORKER
    port = _PORT_NEG if negative else _PORT
    script.write_text(worker.replace("@REPO@", repo)
                      .replace("@PORT@", str(port)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env,
                              text=True)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"host {i} failed:\n{out}"
    for i, out in enumerate(outs):
        assert f"WORKER{i}_OK" in out, out
        if negative:
            assert f"DIVERGENCE_CAUGHT{i}" in out, out
    return outs


@pytest.mark.skipif(os.environ.get("VPC_TEST_REAL_DEVICE") == "1",
                    reason="multi-process CPU drill")
def test_two_host_control_plane(tmp_path):
    run_drill(tmp_path, negative=False)


@pytest.mark.skipif(os.environ.get("VPC_TEST_REAL_DEVICE") == "1",
                    reason="multi-process CPU drill")
def test_divergent_ingestion_detected(tmp_path):
    run_drill(tmp_path, negative=True)
