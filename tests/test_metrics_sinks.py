"""`metrics:` config section — sink types + path-mapping wrappers
(lib/metrics/constructor.go)."""

from __future__ import annotations

import json
import socket
import threading

import pytest


def test_metrics_statsd_udp_end_to_end(spark):
    """A YAML stream with a `metric` processor and a statsd sink pushes
    gauge lines (observed metric + output_sent) over real UDP."""
    from benthos_spark.stream import run_stream

    got = []
    done = threading.Event()
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(60)  # covers a cold Spark/JVM start before publish
    port = srv.getsockname()[1]

    def listen():
        # read until BOTH expected gauges arrive (the snapshot may
        # also carry process-level interp_fallback{...} counters from
        # mappings compiled earlier in the test session)
        while not (any(l.startswith("bs.output_sent:") for l in got)
                   and any(l.startswith("bs.total_v:") for l in got)):
            try:
                data, _ = srv.recvfrom(65536)
            except socket.timeout:
                break
            got.append(data.decode())
        done.set()

    t = threading.Thread(target=listen, daemon=True)
    t.start()
    try:
        run_stream(spark, f"""
input:
  generate: {{count: 4, mapping: 'root.v = this.id'}}
pipeline:
  processors:
    - metric: {{name: total_v, value: this.v}}
output: {{drop: {{}}}}
metrics:
  statsd: {{address: "127.0.0.1:{port}", prefix: bs}}
""")
        done.wait(60)
    finally:
        srv.close()
    lines = sorted(got)
    assert any(line.startswith("bs.output_sent:4|g") for line in lines), lines
    assert any(line.startswith("bs.total_v:6|g") for line in lines), lines


def test_metrics_stdout_and_wrappers(capsys):
    """stdout sink prints one JSON event per metric; whitelist and
    rename wrappers rewrite the name space before the child sink."""
    from benthos_spark.metrics import MetricsExporter

    MetricsExporter("stdout", {}).publish({"a": 1, "b": 2.5})
    events = [json.loads(line) for line
              in capsys.readouterr().out.strip().splitlines()]
    assert events == [{"metric": "a", "value": 1},
                      {"metric": "b", "value": 2.5}]

    exp = MetricsExporter("whitelist", {
        "paths": ["input"], "patterns": [r".*\.latency"],
        "child": {"stdout": {}}})
    exp.publish({"input.received": 7, "output.sent": 9,
                 "proc.latency": 1.5})
    names = {json.loads(line)["metric"] for line
             in capsys.readouterr().out.strip().splitlines()}
    assert names == {"input.received", "proc.latency"}

    exp = MetricsExporter("rename", {
        "by_regexp": [{"pattern": r"^input\.", "value": "in_"}],
        "child": {"stdout": {}}})
    exp.publish({"input.received": 7})
    assert json.loads(capsys.readouterr().out)["metric"] == "in_received"

    exp = MetricsExporter("blacklist", {"paths": ["debug"],
                                        "child": {"stdout": {}}})
    exp.publish({"debug.x": 1, "keep.y": 2})
    assert json.loads(capsys.readouterr().out)["metric"] == "keep.y"


def test_metrics_influxdb_post(spark):
    """influxdb sink POSTs line protocol to /write?db=..."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from benthos_spark.stream import run_stream

    bodies = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            bodies.append((self.path, self.rfile.read(n).decode()))
            self.send_response(204)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        run_stream(spark, f"""
input:
  generate: {{count: 2, mapping: 'root.v = 1'}}
output: {{drop: {{}}}}
metrics:
  influxdb: {{url: "http://127.0.0.1:{port}", db: testdb}}
""")
    finally:
        srv.shutdown()
        srv.server_close()
    assert bodies and bodies[0][0] == "/write?db=testdb"
    assert "output_sent=2" in bodies[0][1]


def test_metrics_cloudwatch_contract_double(spark):
    """aws_cloudwatch sink publishes through an injectable
    put_metric_data client (boto3 contract)."""
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream

    calls = []

    class FakeCW:
        def put_metric_data(self, Namespace, MetricData):
            calls.append((Namespace, MetricData))

    register_resource("cw_double", lambda: FakeCW())
    run_stream(spark, """
input:
  generate: {count: 3, mapping: 'root.v = 1'}
output: {drop: {}}
metrics:
  aws_cloudwatch: {namespace: TestNS, client_resource: cw_double}
""")
    assert calls and calls[0][0] == "TestNS"
    published = {d["MetricName"]: d["Value"] for d in calls[0][1]}
    assert published["output_sent"] == 3.0
    # any extra keys are process-level interp_fallback counters
    assert all(k == "output_sent" or k.startswith("interp_fallback")
               for k in published)


def test_metrics_prometheus_render_and_unknown_type(spark):
    """prometheus sink holds the exposition text; unknown metrics
    types are rejected at config time."""
    from benthos_spark.metrics import MetricsExporter
    from benthos_spark.stream import ConfigError, run_stream

    exp = MetricsExporter("prometheus", {"prefix": "bs"})
    exp.publish({"output_sent": 5})
    assert "bs_output_sent 5" in exp.last_render

    with pytest.raises(ConfigError, match="metrics type"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: 'root.x = 1'}}
output: {drop: {}}
metrics: {bogus: {}}
""")
