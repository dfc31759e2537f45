"""Observability: pipeline metrics without extra scans.

Reference: lib/metrics/ (prometheus/statsd/cloudwatch sinks,
rename/whitelist wrappers) and the `metric` processor
(lib/processor/metric.go:22,280-308).

Engine mapping:
- batch: `pyspark.sql.Observation` — named aggregates attached to a
  plan, collected as a side effect of the query's own action (no
  second scan, unlike a .count()).
- streaming: `StreamingQueryListener` forwarding
  `progress.observedMetrics` plus the built-in rate/row counters
  (numInputRows, inputRowsPerSecond — the reference's msg/s counters).

Export adapters (prometheus etc.) read `snapshot()`; Spark's own metric
sinks already cover infrastructure metrics, so this layer only carries
pipeline-level counters like the reference's.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql import Column, DataFrame, Observation


class ObservedFrame:
    """A DataFrame with named observed metrics (the `metric` processor,
    batch form).  Metrics become available after ANY action on `df`.

        obs = ObservedFrame(df, total=F.sum("v"), rows=F.count(F.lit(1)))
        obs.df.write...    # runs the pipeline
        obs.get()          # {'total': ..., 'rows': ...}
    """

    def __init__(self, df: DataFrame, **metrics: Column):
        self._observation = Observation()
        first = next(iter(metrics))
        cols = [metrics[first].alias(first)] + [
            c.alias(n) for n, c in metrics.items() if n != first]
        self.df = df.observe(self._observation, *cols)

    def get(self) -> dict:
        return self._observation.get


class StreamingMetrics:
    """StreamingQueryListener collecting per-batch progress counters
    and observed metrics for every active query (the reference's
    metrics endpoint payload, SURVEY §2.7)."""

    def __init__(self, spark):
        self.spark = spark
        self._lock = threading.Lock()
        self._progress: dict[str, list[dict]] = defaultdict(list)
        self._listener = None

    def attach(self) -> "StreamingMetrics":
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                try:
                    row = {
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "inputRowsPerSecond": p.inputRowsPerSecond,
                        "processedRowsPerSecond": p.processedRowsPerSecond,
                        "observedMetrics": {
                            k: v.asDict() if hasattr(v, "asDict") else v
                            for k, v in (p.observedMetrics or {}).items()},
                    }
                    outer._record(p.name or p.id, row)
                except Exception:
                    pass  # metrics must never fail the stream

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _Listener()
        self.spark.streams.addListener(self._listener)
        return self

    def detach(self) -> None:
        if self._listener is not None:
            self.spark.streams.removeListener(self._listener)
            self._listener = None

    def _record(self, name: str, row: dict) -> None:
        with self._lock:
            self._progress[str(name)].append(row)

    def snapshot(self) -> dict[str, list[dict]]:
        with self._lock:
            return {k: list(v) for k, v in self._progress.items()}

    def totals(self, name: str) -> dict:
        """Aggregate counters for one query (the /stats payload)."""
        rows = self.snapshot().get(str(name), [])
        return {
            "batches": len(rows),
            "rows_in": sum(r["numInputRows"] or 0 for r in rows),
        }


# ---------------------------------------------------------------- exporters

def prometheus_text(metrics: dict, prefix: str = "benthos_spark",
                    labels: dict[str, str] | None = None) -> str:
    """Render a metrics dict (ObservedFrame.get() / StreamingMetrics
    .totals()) in Prometheus exposition format — the `prometheus`
    metric sink (lib/metrics/prometheus.go) as a pull-model text
    endpoint: serve this from any HTTP handler (or node_exporter's
    textfile collector) instead of running a push loop.

    Non-numeric values are skipped; metric names sanitize to the
    exposition charset."""
    import numbers
    import re as _re

    label_str = ""
    if labels:
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        label_str = "{" + inner + "}"
    lines = []
    for name, value in sorted(metrics.items()):
        if not isinstance(value, numbers.Number) or isinstance(value, bool):
            continue
        mname = _re.sub(r"[^a-zA-Z0-9_:]", "_", f"{prefix}_{name}")
        lines.append(f"# TYPE {mname} gauge")
        lines.append(f"{mname}{label_str} {float(value):g}")
    return "\n".join(lines) + ("\n" if lines else "")


def statsd_lines(metrics: dict, prefix: str = "benthos_spark") -> list[str]:
    """The same dict as statsd gauge lines (lib/metrics/statsd.go) —
    push each over UDP with a plain socket.sendto."""
    import numbers
    out = []
    for name, value in sorted(metrics.items()):
        if isinstance(value, numbers.Number) and not isinstance(value, bool):
            out.append(f"{prefix}.{name}:{float(value):g}|g")
    return out


def influx_lines(metrics: dict, measurement: str = "benthos_spark",
                 tags: dict[str, str] | None = None,
                 timestamp_ns: int | None = None) -> list[str]:
    """The same dict in InfluxDB line protocol (the `influxdb` metric
    target, lib/metrics/influxdb.go): one line per metric with
    comma-escaped tags; pass `timestamp_ns` for a pinned timestamp or
    leave None to let the server assign one."""
    import numbers

    def esc(s: str) -> str:
        return (str(s).replace("\\", "\\\\").replace(",", "\\,")
                .replace(" ", "\\ ").replace("=", "\\="))

    tag_str = "".join(f",{esc(k)}={esc(v)}"
                      for k, v in sorted((tags or {}).items()))
    suffix = f" {int(timestamp_ns)}" if timestamp_ns is not None else ""
    out = []
    for name, value in sorted(metrics.items()):
        if isinstance(value, numbers.Number) and not isinstance(value,
                                                                bool):
            out.append(f"{measurement}{tag_str} "
                       f"{esc(name)}={float(value):g}{suffix}")
    return out


class SpanTracer:
    """Config-pipeline tracing (reference `tracer:` section,
    lib/tracer/jaeger.go).  The jaeger agent protocol needs a thrift
    client that isn't in-container, so spans export as OTLP-shaped
    JSON lines instead — each span carries trace/span/parent ids,
    wall-clock bounds in µs, and free-form attributes.  Stage
    EXECUTION time lives in the Spark UI / event log (the documented
    scale-path tracer); these spans cover the config-build and
    action phases the UI can't attribute to Benthos components."""

    def __init__(self, path: str | None = None, exporter=None):
        import uuid
        self.path = path
        self.exporter = exporter  # e.g. jaeger_udp.JaegerUdpExporter
        self.trace_id = uuid.uuid4().hex
        self.spans: list[dict] = []
        self._stack: list[str] = []

    def span(self, name: str, **attrs):
        import time
        import uuid
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            sid = uuid.uuid4().hex[:16]
            parent = self._stack[-1] if self._stack else None
            self._stack.append(sid)
            t0 = time.time()
            try:
                yield
            finally:
                self._stack.pop()
                self.spans.append({
                    "trace_id": self.trace_id, "span_id": sid,
                    "parent_span_id": parent, "name": name,
                    "start_us": int(t0 * 1e6),
                    "end_us": int(time.time() * 1e6),
                    "attributes": {str(k): str(v)
                                   for k, v in attrs.items()},
                })
        return _cm()

    def flush(self) -> list[dict]:
        if self.path:
            import json
            with open(self.path, "a") as fh:
                for s in self.spans:
                    fh.write(json.dumps(s, sort_keys=True) + "\n")
        if self.exporter is not None and self.spans:
            self.exporter.emit(self.spans)
        return self.spans
