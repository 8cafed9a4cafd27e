"""Request tracing (reference vllm/tracing.py:1-119 — OpenTelemetry OTLP
spans with graceful no-op when the SDK is absent, plus the engine's
per-request span attributes: queue time, prefill time, e2e).

The zero-egress TPU image does not ship opentelemetry; the tracer degrades
to a structured-log span sink so span data stays observable (and tests can
assert on it).  When the OTLP SDK is importable and an endpoint is
configured, real spans are exported.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from ..utils import init_logger

logger = init_logger(__name__)


@dataclass
class Span:
    name: str
    start: float
    attributes: dict = field(default_factory=dict)
    end: Optional[float] = None


class Tracer:
    """Span sink: OTLP if available+configured, else in-memory ring +
    debug log."""

    MAX_KEPT = 512

    def __init__(self, otlp_endpoint: Optional[str] = None):
        self.spans: list[Span] = []
        self._otel = None
        if otlp_endpoint:
            try:
                from opentelemetry import trace
                from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
                    import OTLPSpanExporter
                from opentelemetry.sdk.trace import TracerProvider
                from opentelemetry.sdk.trace.export import (
                    BatchSpanProcessor)
                provider = TracerProvider()
                provider.add_span_processor(BatchSpanProcessor(
                    OTLPSpanExporter(endpoint=otlp_endpoint)))
                self._otel = trace.get_tracer("vpc-tpu",
                                              tracer_provider=provider)
            except ImportError:
                logger.warning(
                    "otlp endpoint configured but opentelemetry is not "
                    "installed; falling back to log spans")

    def record_request(self, seq, finished_time: float) -> None:
        """Emit the per-request span the reference's do_tracing emits
        (llm_engine.py:1232: arrival/queue/prefill/e2e timings)."""
        attrs = {
            "gen_ai.request.id": seq.request_id,
            "gen_ai.usage.prompt_tokens": seq.num_prompt_tokens,
            "gen_ai.usage.completion_tokens": seq.num_output_tokens,
            "gen_ai.latency.time_to_first_token":
                (seq.first_token_time - seq.arrival_time)
                if seq.first_token_time else None,
            "gen_ai.latency.e2e": finished_time - seq.arrival_time,
            "gen_ai.num_preemptions": seq.num_preemptions,
        }
        span = Span(name="llm_request", start=seq.arrival_time,
                    attributes=attrs, end=finished_time)
        self.spans.append(span)
        if len(self.spans) > self.MAX_KEPT:
            del self.spans[:len(self.spans) - self.MAX_KEPT]
        if self._otel is not None:
            with self._otel.start_as_current_span(
                    "llm_request",
                    start_time=int(seq.arrival_time * 1e9)) as s:
                for k, v in attrs.items():
                    if v is not None:
                        s.set_attribute(k, v)
        else:
            logger.debug("span %s", attrs)
