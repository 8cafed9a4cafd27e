"""Native shm message queue + out-of-process engine tests
(reference analogs: tests/distributed/test_shm_broadcast.py and
tests/mq_llm_engine/).
"""

import multiprocessing as mp
import os
import time

import pytest

from vllm_paged_compression_tpu.parallel.shm_msgq import ShmMessageQueue


def _echo_child(req_name, out_name, n):
    req = ShmMessageQueue(req_name, create=False)
    out = ShmMessageQueue(out_name, create=False)
    out.send("ready")
    for _ in range(n):
        out.send(req.recv())


def test_roundtrip_objects_across_processes():
    tag = f"/vpc-test-{os.getpid()}"
    req = ShmMessageQueue(tag + "-req", create=True)
    out = ShmMessageQueue(tag + "-out", create=True)
    ctx = mp.get_context("spawn")
    n = 200
    p = ctx.Process(target=_echo_child,
                    args=(tag + "-req", tag + "-out", n), daemon=True)
    p.start()
    assert out.recv(timeout=120) == "ready"   # spawn + imports
    t0 = time.perf_counter()
    for i in range(n):
        req.send({"i": i, "payload": b"x" * 1000})
        got = out.recv(timeout=30)
        assert got["i"] == i
    dt = time.perf_counter() - t0
    p.join(timeout=30)
    assert p.exitcode == 0
    # Ping-pong latency should be well under a millisecond per message.
    assert dt / n < 0.01, f"{dt / n * 1e6:.0f} us/roundtrip"
    req.close()
    out.close()


def test_timeout_and_oversize():
    tag = f"/vpc-test2-{os.getpid()}"
    q = ShmMessageQueue(tag, create=True, capacity=2, max_msg=128)
    with pytest.raises(TimeoutError):
        q.recv_bytes(timeout=0.05)
    with pytest.raises(ValueError):
        q.send_bytes(b"y" * 1000)
    q.send_bytes(b"a")
    q.send_bytes(b"b")
    with pytest.raises(TimeoutError):
        q.send_bytes(b"c", timeout=0.05)   # ring full
    assert q.recv_bytes() == b"a"
    q.close()


def test_mp_engine_client_generates():
    from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                                   ModelConfig,
                                                   SchedulerConfig)
    from vllm_paged_compression_tpu.engine.multiprocessing import (
        MPEngineClient)
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = EngineConfig(
        model=ModelConfig(hf_config={
            "architectures": ["LlamaForCausalLM"], "vocab_size": 128,
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 256,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": True, "eos_token_id": None,
        }, dtype="float32", max_model_len=256),
        cache=CacheConfig(block_size=16, num_device_blocks=32),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256))
    client = MPEngineClient(cfg)
    try:
        assert client.ping()
        client.add_request(request_id="r0",
                           prompt_token_ids=list(range(1, 40)),
                           sampling_params=SamplingParams(temperature=0.0,
                                                          max_tokens=8))
        final = None
        deadline = time.monotonic() + 900
        while time.monotonic() < deadline:
            out = client.get_output(timeout=900)
            if out.finished:
                final = out
                break
        assert final is not None
        assert len(final.outputs[0].token_ids) == 8
    finally:
        client.shutdown()
