"""Deprecated/v3 processor registrations (lib/processor/constructor.go):
conditional, process_map, process_dag, batch, throttle, encode/decode,
hash, json_schema and lambda aliases."""

from __future__ import annotations

import base64
import hashlib

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "content string")


def test_conditional_routes_both_arms(spark):
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
input:
  generate:
    count: 4
    mapping: 'root.v = this.id'
pipeline:
  processors:
    - conditional:
        condition: {bloblang: 'this.v > 1'}
        processors:
          - bloblang: |
              root.v = this.v
              root.tag = "big"

        else_processors:
          - bloblang: |
              root.v = this.v
              root.tag = "small"

output: {memory: {}}
""")
    got = {r.v: r.tag for r in out.collect()}
    assert got == {0: "small", 1: "small", 2: "big", 3: "big"}


def test_process_map_premap_postmap(spark):
    """premap builds the child payload, postmap merges the child's
    result back onto the original row (process_map.go)."""
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
input:
  generate:
    count: 2
    mapping: |
      root.a = this.id
      root.b = this.id * 10
pipeline:
  processors:
    - process_map:
        premap: {".": "b"}
        processors:
          - bloblang: 'root = this + 1'
        postmap: {"b_plus": "."}
output: {memory: {}}
""")
    got = sorted((r.a, r.b, r.b_plus) for r in out.collect())
    assert got == [(0, 0, 1), (1, 10, 11)]


def test_process_dag_dependency_order(spark):
    """process_dag branches run in dependency order like workflow."""
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.x = 2'}
pipeline:
  processors:
    - process_dag:
        double:
          premap: {".": "x"}
          processors: [{bloblang: 'root = this * 2'}]
          postmap: {"doubled": "."}
        plus_one:
          dependencies: [double]
          premap: {".": "doubled"}
          processors: [{bloblang: 'root = this + 1'}]
          postmap: {"final": "."}
output: {memory: {}}
""")
    r = out.collect()[0]
    assert (r.x, r.doubled, r.final) == (2, 4, 5)


def test_batch_processor_rebatches(spark):
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
input:
  generate: {count: 6, mapping: 'root.content = this.id.string()'}
pipeline:
  processors:
    - batch: {count: 3, order_by: [content]}
output: {memory: {}}
""")
    rows = out.collect()
    assert len(rows) == 6
    sizes = {}
    for r in rows:
        sizes.setdefault(r.batch_id, []).append(r.part_index)
    assert all(sorted(v) == list(range(len(v))) for v in sizes.values())
    assert sorted(len(v) for v in sizes.values()) == [3, 3]


def test_encode_decode_hash_roundtrip(spark):
    from benthos_spark.stream import ConfigError, run_stream

    out = run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "hello world"'}
pipeline:
  processors:
    - encode: {scheme: base64}
output: {memory: {}}
""")
    assert out.collect()[0].content == \
        base64.b64encode(b"hello world").decode()

    out = run_stream(spark, f"""
input:
  generate: {{count: 1, mapping: 'root.content = "{base64.b64encode(b"xyz").decode()}"'}}
pipeline:
  processors:
    - decode: {{scheme: base64}}
output: {{memory: {{}}}}
""")
    assert out.collect()[0].content == "xyz"

    out = run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "abc"'}
pipeline:
  processors:
    - hash: {algorithm: sha256}
output: {memory: {}}
""")
    assert out.collect()[0].content == hashlib.sha256(b"abc").hexdigest()

    out = run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "abc"'}
pipeline:
  processors:
    - hash: {algorithm: hmac-sha256, key: secret}
output: {memory: {}}
""")
    import hmac as _hmac
    assert out.collect()[0].content == _hmac.new(
        b"secret", b"abc", hashlib.sha256).hexdigest()

    with pytest.raises(ConfigError, match="scheme"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: 'root.content = "x"'}}
pipeline:
  processors: [{encode: {scheme: rot13}}]
output: {drop: {}}
""")


def test_throttle_and_aliases_compile(spark):
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
input:
  generate: {count: 2, mapping: 'root.content = "{\\"n\\": 1}"'}
pipeline:
  processors:
    - throttle: {period: 1ms}
    - json_schema:
        schema: '{"type": "object", "properties": {"n": {"type": "number"}}}'
output: {memory: {}}
""")
    assert out.count() == 2


def test_json_schema_condition(spark):
    """v3 json_schema condition: true when the payload validates
    (lib/condition/json_schema.go)."""
    from benthos_spark.operators.conditions import compile_condition_spec

    df = spark.createDataFrame(
        [('{"n": 1}',), ('{"n": "x"}',), ("nope",)], "content string")
    cond = compile_condition_spec({"json_schema": {"schema":
        '{"type":"object","properties":{"n":{"type":"number"}},'
        '"required":["n"]}'}})
    got = [r.content for r in df.filter(cond).collect()]
    assert got == ['{"n": 1}']
