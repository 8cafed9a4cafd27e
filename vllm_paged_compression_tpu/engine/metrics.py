"""Engine stats (reference vllm/engine/metrics.py — Prometheus gauges +
periodic console logger).  Prometheus export is attached lazily by the API
server; offline use gets the rolling counters and the 5-second logger."""

from __future__ import annotations

import time

from ..utils import init_logger

logger = init_logger(__name__)


class EngineMetrics:
    LOG_INTERVAL_S = 5.0

    def __init__(self, engine):
        self.engine = engine
        self.num_prompt_tokens = 0
        self.num_generation_tokens = 0
        self.num_finished = 0
        self._window_gen_tokens = 0
        self._window_prompt_tokens = 0
        self._last_log = time.monotonic()

    def observe_step(self, sched_out, results, num_gen_tokens: int) -> None:
        for sp in sched_out.prefills:
            self.num_prompt_tokens += sp.prompt_len
            self._window_prompt_tokens += sp.prompt_len
        self.num_generation_tokens += num_gen_tokens
        self._window_gen_tokens += num_gen_tokens
        self.num_finished += sum(r.finished for r in results)
        now = time.monotonic()
        dt = now - self._last_log
        if dt >= self.LOG_INTERVAL_S:
            sched = self.engine.scheduler
            logger.info(
                "Avg prompt throughput: %.1f tok/s, avg generation "
                "throughput: %.1f tok/s, Running: %d reqs, Waiting: %d "
                "reqs, KV cache usage: %.1f%%, preemptions: %d",
                self._window_prompt_tokens / dt,
                self._window_gen_tokens / dt,
                sched.num_running, sched.num_waiting,
                100.0 * sched.kv_usage(), sched.num_preemptions)
            self._window_gen_tokens = 0
            self._window_prompt_tokens = 0
            self._last_log = now

    def snapshot(self) -> dict:
        sched = self.engine.scheduler
        return {
            "num_prompt_tokens": self.num_prompt_tokens,
            "num_generation_tokens": self.num_generation_tokens,
            "num_finished": self.num_finished,
            "num_running": sched.num_running,
            "num_waiting": sched.num_waiting,
            "kv_cache_usage": sched.kv_usage(),
            "num_preemptions": sched.num_preemptions,
        }
