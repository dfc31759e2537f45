"""Streams-mode manager, metrics, schema-codec gating, config
try/catch + batching/buffer sections."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.metrics import ObservedFrame, StreamingMetrics
from benthos_spark.operators.schema_codecs import (MissingSparkPackage,
                                                   avro_to_struct)
from benthos_spark.stream import ConfigError, build_stream, run_stream
from benthos_spark.streaming.manager import StreamManager


def test_stream_manager_crud(spark):
    mgr = StreamManager(spark)
    h = mgr.create("s1", """
input:
  generate: {count: 5, mapping: "root.id = this.id"}
""")
    assert h.result.count() == 5
    assert "s1" in mgr.list() and mgr.list()["s1"]["active"] is False
    with pytest.raises(ValueError, match="already exists"):
        mgr.create("s1", "input:\n  generate: {count: 1, mapping: 'root.id = this.id'}\n")
    h2 = mgr.update("s1", """
input:
  generate: {count: 7, mapping: "root.id = this.id"}
""")
    assert h2.result.count() == 7
    mgr.delete("s1")
    assert mgr.list() == {}


def test_observed_frame_no_extra_scan(spark):
    df = spark.range(10)
    obs = ObservedFrame(df, total=F.sum("id"), rows=F.count(F.lit(1)))
    obs.df.write.format("noop").mode("overwrite").save()
    got = obs.get()
    assert got == {"total": 45, "rows": 10}


def test_streaming_metrics_listener(spark):
    import shutil
    import tempfile
    src = tempfile.mkdtemp(prefix="bs_metrics_src")
    ckpt = tempfile.mkdtemp(prefix="bs_metrics_ckpt")
    metrics = StreamingMetrics(spark).attach()
    try:
        spark.range(100).select(F.col("id")).write.mode("overwrite") \
            .parquet(src)
        stream = spark.readStream.schema("id LONG").parquet(src)
        q = (stream.writeStream.format("memory").queryName("metrics_test")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        # listener delivery is async; poll briefly
        for _ in range(40):
            if metrics.totals("metrics_test")["rows_in"] >= 100:
                break
            time.sleep(0.25)
        assert metrics.totals("metrics_test")["rows_in"] == 100
    finally:
        metrics.detach()
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_avro_gated_with_actionable_error(spark):
    with pytest.raises(MissingSparkPackage, match="spark-avro"):
        avro_to_struct(F.encode(F.lit("x"), "UTF-8"), '"long"')


def test_config_try_catch_error_protocol(spark):
    out = run_stream(spark, """
input:
  generate:
    count: 6
    mapping: |
      root.content = this.id.string()
      root._error = if this.id % 2 == 0 { "boom" } else { null }
pipeline:
  processors:
    - try:
        - bloblang: root = content() + "_ok"
    - catch:
        - bloblang: root = "recovered"
""")
    got = sorted(r.content for r in out.collect())
    assert got == ["1_ok", "3_ok", "5_ok", "recovered", "recovered",
                   "recovered"]
    assert all(r._error is None for r in out.collect())


def test_config_input_batching(spark):
    # global_order pins the reference-exact single sequence
    out = run_stream(spark, """
input:
  generate: {count: 10, mapping: "root.id = this.id"}
  batching: {count: 4, order_by: [id], global_order: true}
""")
    got = {r.id: (r.batch_id, r.part_index) for r in out.collect()}
    assert got[0] == (0, 0) and got[3] == (0, 3) and got[4] == (1, 0)

    # default batching is sharded: every row batched, batches ≤ count,
    # indexes contiguous within each batch
    out = run_stream(spark, """
input:
  generate: {count: 10, mapping: "root.id = this.id"}
  batching: {count: 4, order_by: [id]}
""")
    rows = out.collect()
    assert len(rows) == 10
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r.part_index)
    for parts in by_batch.values():
        assert sorted(parts) == list(range(len(parts)))
        assert len(parts) <= 4


def test_config_buffer_none_ok_others_rejected(spark):
    build_stream(spark, """
input:
  generate: {count: 1, mapping: "root.id = this.id"}
buffer: {none: {}}
""")
    # memory (lib/buffer/memory.go) is accepted as a no-op — Spark owns
    # producer/consumer flow control
    build_stream(spark, """
input:
  generate: {count: 1, mapping: "root.id = this.id"}
buffer: {memory: {limit: 1000}}
""")
    # disk-backed buffers WOULD change delivery guarantees: loud reject
    with pytest.raises(ConfigError, match="buffer"):
        build_stream(spark, """
input:
  generate: {count: 1, mapping: "root.id = this.id"}
buffer: {sqlite: {path: /tmp/x.db}}
""")


def test_prometheus_and_statsd_exporters():
    from benthos_spark.metrics import prometheus_text, statsd_lines
    m = {"rows_in": 120, "batches": 3, "rate": 1.5, "name": "skipme"}
    text = prometheus_text(m, labels={"stream": "s1"})
    assert '# TYPE benthos_spark_rows_in gauge' in text
    assert 'benthos_spark_rows_in{stream="s1"} 120' in text
    assert "skipme" not in text
    assert text.endswith("\n")
    lines = statsd_lines(m)
    assert "benthos_spark.rows_in:120|g" in lines
    assert all(":" in line and "|g" in line for line in lines)


def test_streams_rest_api(spark):
    """REST layer (lib/api/api.go parity): CRUD a stream over HTTP,
    read stats and prometheus metrics."""
    import json
    import urllib.request
    from urllib.error import HTTPError

    from benthos_spark.api import StreamsAPI
    from benthos_spark.streaming.manager import StreamManager

    mgr = StreamManager(spark)
    api = StreamsAPI(mgr)
    host, port = api.start()
    base = f"http://{host}:{port}"

    def call(path, method="GET", body=None):
        req = urllib.request.Request(
            base + path, method=method,
            data=body.encode() if body else None)
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read().decode()

    try:
        assert call("/ping")[1] == "pong"
        assert json.loads(call("/ready")[1])["ready"] is True
        assert json.loads(call("/streams")[1]) == {}

        conf = """
input: {generate: {count: 5, mapping: "root.id = this.id"}}
output: {memory: {}}
"""
        assert call("/streams/s1", "POST", conf)[0] == 200
        listing = json.loads(call("/streams")[1])
        assert "s1" in listing and listing["s1"]["active"] is False

        doc = json.loads(call("/streams/s1")[1])
        assert doc["name"] == "s1" and "input" in doc["config"]

        stats = json.loads(call("/streams/s1/stats")[1])
        assert stats["batch_complete"] == 1

        metrics = call("/metrics")[1]
        assert "benthos_spark_s1_batch_complete" in metrics

        # duplicate create → 400; unknown stream → 404
        try:
            call("/streams/s1", "POST", conf)
            raise AssertionError("expected 400")
        except HTTPError as e:
            assert e.code == 400
        try:
            call("/streams/nope/stats")
            raise AssertionError("expected 404")
        except HTTPError as e:
            assert e.code == 404

        assert call("/streams/s1", "DELETE")[0] == 200
        assert json.loads(call("/streams")[1]) == {}
    finally:
        api.stop()
        mgr.stop_all()


def test_tracer_json_file(spark, tmp_path):
    """tracer section: processor + output spans export as OTLP-shaped
    JSON lines; jaeger raises the documented migration."""
    import json
    import pytest
    from benthos_spark.stream import ConfigError, run_stream

    path = tmp_path / "spans.jsonl"
    run_stream(spark, f"""
tracer:
  json_file: {{path: "{path}"}}
input:
  generate: {{count: 3, mapping: "root.content = this.id.string()"}}
pipeline:
  processors:
    - bloblang: |
        root = this
        root.up = this.content.uppercase()
    - filter: this.content != "1"
output:
  memory: {{}}
""")
    spans = [json.loads(l) for l in path.read_text().splitlines()]
    names = {s["name"] for s in spans}
    assert {"processor:bloblang", "processor:filter",
            "output:memory"} <= names
    assert len({s["trace_id"] for s in spans}) == 1
    assert all(s["end_us"] >= s["start_us"] for s in spans)

def test_tracer_jaeger_udp_agent(spark):
    """tracer.jaeger ships compact-thrift emitBatch datagrams to a
    live UDP socket (the agent's 6831 surface)."""
    import socket

    from benthos_spark.stream import run_stream

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(5)
    port = sock.getsockname()[1]
    run_stream(spark, f"""
tracer:
  jaeger:
    agent_address: "127.0.0.1:{port}"
    service_name: svc-under-test
input: {{generate: {{count: 2, mapping: 'root.id = this.id'}}}}
pipeline:
  processors:
    - bloblang: 'root.id2 = this.id + 1'
output: {{memory: {{}}}}
""")
    data, _ = sock.recvfrom(65536)
    sock.close()
    # compact message header: protocol id, ONEWAY<<5 | version 1
    assert data[0] == 0x82 and data[1] == (4 << 5) | 0x01
    assert b"emitBatch" in data
    assert b"svc-under-test" in data
    assert b"processor:bloblang" in data


def test_jaeger_compact_encoding_roundtrip():
    """Decode our own emitBatch datagram with an independent minimal
    compact-protocol reader: ids, times, names and tags all survive."""
    from benthos_spark.jaeger_udp import encode_emit_batch

    spans = [{
        "trace_id": "00000000000000ab00000000000000cd",
        "span_id": "00000000000000ef",
        "parent_span_id": None,
        "name": "op-one",
        "start_us": 1_700_000_000_000_000,
        "end_us": 1_700_000_000_250_000,
        "attributes": {"k1": "v1", "k2": "v2"},
    }]
    data = encode_emit_batch(spans, "svc", seq_id=7)

    pos = 0

    def u8():
        nonlocal pos
        pos += 1
        return data[pos - 1]

    def varint():
        nonlocal pos
        shift = out = 0
        while True:
            b = u8()
            out |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return out

    def zig():
        n = varint()
        return (n >> 1) ^ -(n & 1)

    def read_binary():
        nonlocal pos
        n = varint()
        pos += n
        return data[pos - n:pos]

    def read_struct():
        last = 0
        fields = {}
        while True:
            b = u8()
            if b == 0:
                return fields
            ctype = b & 0x0F
            delta = b >> 4
            fid = last + delta if delta else zig()
            last = fid
            if ctype == 0x06 or ctype == 0x05:
                fields[fid] = zig()
            elif ctype == 0x08:
                fields[fid] = read_binary()
            elif ctype == 0x0C:
                fields[fid] = read_struct()
            elif ctype == 0x09:
                head = u8()
                n = head >> 4
                if n == 15:
                    n = varint()
                fields[fid] = [read_struct() for _ in range(n)]
            elif ctype in (0x01, 0x02):
                fields[fid] = ctype == 0x01
            else:
                raise AssertionError(f"unexpected ctype {ctype}")

    assert u8() == 0x82
    assert u8() == (4 << 5) | 0x01
    assert varint() == 7                      # seq id
    assert read_binary() == b"emitBatch"
    args = read_struct()
    batch = args[1]
    assert batch[1][1] == b"svc"              # Process.serviceName
    (span,) = batch[2]
    assert span[1] == 0xCD and span[2] == 0xAB  # traceIdLow/High
    assert span[3] == 0xEF and span[4] == 0
    assert span[5] == b"op-one"
    assert span[8] == 1_700_000_000_000_000
    assert span[9] == 250_000
    tags = {t[1]: t[3] for t in span[10]}
    assert tags == {b"k1": b"v1", b"k2": b"v2"}


def test_tracer_flushes_in_sync_response_path(spark, tmp_path):
    """A tracer configured alongside http_server sync_response must
    still flush its spans — the sync branch of run_stream has its own
    finally path."""
    import json
    import threading
    import time
    import urllib.request
    from benthos_spark.stream import run_stream

    port_file = tmp_path / "port.txt"
    spans_path = tmp_path / "spans.jsonl"

    def client():
        for _ in range(150):
            if port_file.exists() and port_file.read_text():
                break
            time.sleep(0.02)
        req = urllib.request.Request(
            f"http://{port_file.read_text()}/post", data=b"hi")
        with urllib.request.urlopen(req, timeout=30) as r:
            r.read()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    run_stream(spark, f"""
tracer:
  json_file: {{path: "{spans_path}"}}
input:
  http_server:
    address: "127.0.0.1:0"
    path: /post
    port_file: "{port_file}"
    drain_ms: 2000
    sync_response: true
    sync_timeout: 30
pipeline:
  processors:
    - bloblang: |
        root = this
        root.content = this.content.uppercase()
    - sync_response: {{}}
output:
  memory: {{}}
""")
    t.join(timeout=60)
    spans = [json.loads(l) for l in spans_path.read_text().splitlines()]
    assert any(s["name"] == "processor:bloblang" for s in spans)


def test_influx_lines():
    from benthos_spark.metrics import influx_lines
    lines = influx_lines({"batches": 3, "rate": 1.5, "skip": "str"},
                         tags={"host": "a b", "env": "dev"},
                         timestamp_ns=1700000000000000000)
    assert lines == [
        "benthos_spark,env=dev,host=a\\ b batches=3 1700000000000000000",
        "benthos_spark,env=dev,host=a\\ b rate=1.5 1700000000000000000",
    ]
