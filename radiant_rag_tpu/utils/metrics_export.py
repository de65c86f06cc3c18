"""Prometheus + OpenTelemetry metric/trace export.

Capability parity with reference `utils/metrics_export.py`:
`PrometheusMetricsExporter` (counters/gauges/histograms with latency buckets,
graceful no-op when the client lib is missing, `metrics_export.py:24-230`),
`OpenTelemetryExporter` (`trace_agent` span context manager with
`AgentMetrics.to_otel_attributes()`, OTLP endpoint, `:258-430`), and the
unified `MetricsCollector.create()` facade + global singleton (`:441-576`).
"""

from __future__ import annotations

import logging
import threading
from contextlib import contextmanager
from typing import Any, Dict, Iterator, Optional

logger = logging.getLogger(__name__)

_LATENCY_BUCKETS = (0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class PrometheusMetricsExporter:
    """No-ops cleanly if prometheus_client is unavailable."""

    def __init__(self, port: int = 0, namespace: str = "radiant_tpu") -> None:
        self.enabled = False
        try:
            from prometheus_client import Counter, Gauge, Histogram, start_http_server

            self._executions = Counter(
                f"{namespace}_agent_executions_total", "Agent executions", ["agent"])
            self._errors = Counter(
                f"{namespace}_agent_errors_total", "Agent errors", ["agent"])
            self._duration = Histogram(
                f"{namespace}_agent_duration_seconds", "Agent duration", ["agent"],
                buckets=_LATENCY_BUCKETS)
            self._confidence = Gauge(
                f"{namespace}_agent_confidence", "Last confidence", ["agent"])
            self._active = Gauge(
                f"{namespace}_active_runs", "Active pipeline runs")
            if port:
                start_http_server(port)
            self.enabled = True
        except ImportError:
            logger.info("prometheus_client not installed; metrics export disabled")

    def record_agent(self, metrics) -> None:
        if not self.enabled:
            return
        labels = metrics.to_prometheus_labels()
        self._executions.labels(**labels).inc()
        self._duration.labels(**labels).observe(metrics.duration_ms / 1000.0)
        if metrics.confidence is not None:
            self._confidence.labels(**labels).set(metrics.confidence)

    def record_error(self, agent_name: str) -> None:
        if self.enabled:
            self._errors.labels(agent=agent_name).inc()

    @contextmanager
    def track_run(self) -> Iterator[None]:
        if self.enabled:
            self._active.inc()
        try:
            yield
        finally:
            if self.enabled:
                self._active.dec()


class OpenTelemetryExporter:
    """Span-per-agent tracing; no-ops if the OTel SDK is unavailable."""

    def __init__(self, endpoint: str = "", service_name: str = "radiant-tpu") -> None:
        self.enabled = False
        self._tracer = None
        try:
            from opentelemetry import trace
            from opentelemetry.sdk.resources import Resource
            from opentelemetry.sdk.trace import TracerProvider
            from opentelemetry.sdk.trace.export import BatchSpanProcessor

            provider = TracerProvider(
                resource=Resource.create({"service.name": service_name}))
            if endpoint:
                from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
                    OTLPSpanExporter,
                )

                provider.add_span_processor(
                    BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint)))
            trace.set_tracer_provider(provider)
            self._tracer = trace.get_tracer(service_name)
            self.enabled = True
        except ImportError:
            logger.info("opentelemetry SDK not installed; tracing disabled")

    @contextmanager
    def trace_agent(self, agent_name: str, metrics=None) -> Iterator[Any]:
        if not self.enabled:
            yield None
            return
        with self._tracer.start_as_current_span(f"agent.{agent_name}") as span:
            try:
                yield span
            finally:
                if metrics is not None:
                    for k, v in metrics.to_otel_attributes().items():
                        span.set_attribute(k, v)


class UnifiedMetrics:
    """Facade over both exporters (reference `MetricsCollector.create`)."""

    def __init__(self, prometheus: Optional[PrometheusMetricsExporter] = None,
                 otel: Optional[OpenTelemetryExporter] = None) -> None:
        self.prometheus = prometheus
        self.otel = otel

    @classmethod
    def create(cls, prometheus_enabled: bool = False, prometheus_port: int = 0,
               otel_enabled: bool = False, otel_endpoint: str = "") -> "UnifiedMetrics":
        return cls(
            prometheus=PrometheusMetricsExporter(prometheus_port) if prometheus_enabled else None,
            otel=OpenTelemetryExporter(otel_endpoint) if otel_enabled else None,
        )

    def record_agent(self, metrics) -> None:
        if self.prometheus is not None:
            self.prometheus.record_agent(metrics)

    @contextmanager
    def trace_agent(self, agent_name: str, metrics=None) -> Iterator[Any]:
        if self.otel is not None:
            with self.otel.trace_agent(agent_name, metrics) as span:
                yield span
        else:
            yield None


_global: Optional[UnifiedMetrics] = None
_lock = threading.Lock()


def get_metrics_exporter(**kwargs: Any) -> UnifiedMetrics:
    global _global
    with _lock:
        if _global is None:
            _global = UnifiedMetrics.create(**kwargs)
        return _global
