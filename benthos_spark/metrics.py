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


# ---------------------------------------------------------------- sinks

class MetricsExporter:
    """The `metrics:` config section (lib/metrics/constructor.go): a
    sink type plus optional path-mapping wrappers.

    Sinks: stdout (JSON event per metric, lib/metrics/stdout.go),
    statsd (UDP gauge lines), influxdb (line protocol POSTed to
    /write), prometheus (exposition text; PUT to `push_url` when set —
    the pushgateway mode — otherwise held for the streams-mode
    /metrics endpoint), aws_cloudwatch (put_metric_data through an
    injectable boto3-contract client), http_server (served by the
    streams-mode API — held like prometheus), none.

    Wrappers: whitelist/blacklist (path prefixes + RE2 patterns,
    lib/metrics/{whitelist,blacklist}.go) and rename by_regexp
    (lib/metrics/rename.go) nest a child sink and rewrite the metric
    name space before it.

    One `publish(dict)` flush per batch run — the engine's natural
    flush point is stream completion; continuous serving is the
    streams-mode API's job."""

    def __init__(self, kind: str, spec: dict, client_factory=None):
        import re as _re
        self.kind = kind
        self.spec = spec or {}
        self.client_factory = client_factory
        self.last_render: str | None = None
        self._filters = []          # (include: bool, match fn)
        self._renames = []          # (compiled pattern, replacement)
        self.child: MetricsExporter | None = None
        if kind in ("whitelist", "blacklist"):
            pats = [_re.compile(p) for p in self.spec.get("patterns") or []]
            prefixes = [str(p) for p in self.spec.get("paths") or []]
            include = kind == "whitelist"

            def match(name, prefixes=prefixes, pats=pats):
                return (any(name.startswith(p) for p in prefixes)
                        or any(p.search(name) for p in pats))

            self._filters.append((include, match))
        elif kind == "rename":
            for rule in self.spec.get("by_regexp") or []:
                self._renames.append((_re.compile(str(rule["pattern"])),
                                      str(rule.get("value", ""))))
        if kind in ("whitelist", "blacklist", "rename"):
            child_conf = self.spec.get("child")
            if child_conf:
                ckind = next(iter(child_conf))
                self.child = MetricsExporter(ckind, child_conf[ckind]
                                             or {}, client_factory)

    def _mapped(self, metrics: dict) -> dict:
        out = {}
        for name, value in metrics.items():
            keep = True
            for include, match in self._filters:
                hit = match(name)
                keep = hit if include else not hit
            if not keep:
                continue
            for pat, repl in self._renames:
                name = pat.sub(repl, name)
            out[name] = value
        return out

    def publish(self, metrics: dict) -> None:
        metrics = self._mapped(metrics)
        if self.child is not None:
            self.child.publish(metrics)
            self.last_render = self.child.last_render
            return
        kind = self.kind
        if kind in ("none", "http_server"):
            # http_server = the reference's own API endpoint; the
            # streams-mode api.py serves /metrics — nothing to push
            self.last_render = prometheus_text(metrics)
            return
        if kind == "stdout":
            import json as _json
            for name, value in sorted(metrics.items()):
                print(_json.dumps({"metric": name, "value": value},
                                  sort_keys=True))
            return
        if kind == "statsd":
            import socket
            address = str(self.spec.get("address", "localhost:8125"))
            host, _, port = address.rpartition(":")
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            try:
                for line in statsd_lines(
                        metrics, prefix=str(self.spec.get("prefix",
                                                          "benthos"))):
                    s.sendto(line.encode(), (host or "localhost",
                                             int(port)))
            finally:
                s.close()
            return
        if kind == "influxdb":
            import urllib.request
            url = str(self.spec.get("url", "http://localhost:8086"))
            db = str(self.spec.get("db", "benthos"))
            body = "\n".join(influx_lines(
                metrics,
                measurement=str(self.spec.get("measurement",
                                              "benthos_spark"))))
            req = urllib.request.Request(
                f"{url.rstrip('/')}/write?db={db}",
                data=body.encode(), method="POST")
            urllib.request.urlopen(req, timeout=10).read()
            return
        if kind == "prometheus":
            text = prometheus_text(
                metrics, prefix=str(self.spec.get("prefix",
                                                  "benthos_spark")))
            self.last_render = text
            push_url = self.spec.get("push_url")
            if push_url:  # pushgateway mode (prometheus.go push_url)
                import urllib.request
                req = urllib.request.Request(
                    str(push_url), data=text.encode(), method="PUT")
                urllib.request.urlopen(req, timeout=10).read()
            return
        if kind == "aws_cloudwatch":
            if self.client_factory is None:
                raise RuntimeError(
                    "aws_cloudwatch metrics: no boto3 client in this "
                    "environment; set client_resource to a registered "
                    "factory (contract: put_metric_data)")
            client = self.client_factory()
            data = [{"MetricName": n, "Value": float(v), "Unit": "Count"}
                    for n, v in sorted(metrics.items())
                    if isinstance(v, (int, float))
                    and not isinstance(v, bool)]
            if data:
                client.put_metric_data(
                    Namespace=str(self.spec.get("namespace", "Benthos")),
                    MetricData=data)
            return
        raise ValueError(f"metrics type {self.kind!r} not recognised")
