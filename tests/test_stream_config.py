"""YAML config front-end tests (reference: benthos -c config.yaml path,
lib/stream/type.go wiring; declarative YAML test style of
lib/service/test)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from benthos_spark.stream import (ConfigError, build_stream,
                                  compile_condition, run_stream)


def test_generate_bloblang_pipeline(spark):
    out = run_stream(spark, """
input:
  generate:
    count: 10
    mapping: |
      root.id = this.id
      root.sq = this.id * this.id
pipeline:
  processors:
    - filter: this.sq >= 9
    - bloblang: |
        root = this
        root.label = "n_" + this.id.string()
output:
  memory: {}
""")
    got = {r.id: (r.sq, r.label) for r in out.collect()}
    assert got == {i: (i * i, f"n_{i}") for i in range(3, 10)}


def test_file_input_and_switch(spark, sf_dir):
    out = run_stream(spark, f"""
input:
  file:
    paths: ["{sf_dir}/orders.parquet"]
pipeline:
  processors:
    - switch:
        - check: this.o_totalprice > 200000
          processors:
            - bloblang: |
                root.o_orderkey = this.o_orderkey
                root.lane = "big"
        - processors:
            - bloblang: |
                root.o_orderkey = this.o_orderkey
                root.lane = "small"
output:
  memory: {{}}
""")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_big = orders.filter("o_totalprice > 200000").count()
    got = out.groupBy("lane").count().collect()
    lanes = {r.lane: r["count"] for r in got}
    assert lanes.get("big", 0) == n_big
    assert lanes["big"] + lanes["small"] == orders.count()


def test_dedupe_and_bounds_check(spark):
    out = run_stream(spark, """
input:
  generate:
    count: 20
    mapping: |
      root.k = this.id % 5
      root.v = this.id
pipeline:
  processors:
    - dedupe: {key: [k], order_by: [v]}
    - bounds_check: {field: this.v, min: 1, max: 3}
output:
  memory: {}
""")
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(1, 1), (2, 2), (3, 3)]  # first-wins then bounds


def test_broker_union_and_file_output(spark):
    tmp = tempfile.mkdtemp(prefix="bs_out")
    try:
        run_stream(spark, f"""
input:
  broker:
    inputs:
      - generate: {{count: 3, mapping: "root.id = this.id"}}
      - generate: {{count: 2, mapping: "root.id = this.id + 100"}}
output:
  file: {{path: "{tmp}/out", format: parquet}}
""")
        back = spark.read.parquet(f"{tmp}/out")
        assert sorted(r.id for r in back.collect()) == [0, 1, 2, 100, 101]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_build_stream_is_lazy(spark):
    df = build_stream(spark, """
input:
  generate: {count: 5, mapping: "root.id = this.id"}
pipeline:
  processors:
    - filter: this.id > 2
""")
    # no sink ran; plan present and filter visible in it
    assert "Filter" in df._jdf.queryExecution().optimizedPlan().toString()


def test_compile_condition():
    c = compile_condition("this.a > 1 && this.b == \"x\"")
    assert "a" in str(c) and "x" in str(c)


def test_streaming_config_end_to_end(spark):
    """input.file.stream → window processor → memory sink: the config
    front-end driving the real incremental engine."""
    src = tempfile.mkdtemp(prefix="bs_cfg_stream")
    try:
        rows = [("a", "2024-01-01 00:01:00", 1.0),
                ("a", "2024-01-01 00:02:00", 2.0),
                ("b", "2024-01-01 00:06:00", 5.0)]
        df = spark.createDataFrame(rows, "k STRING, ts STRING, v DOUBLE") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(src)
        out = run_stream(spark, f"""
input:
  file:
    paths: ["{src}"]
    stream: true
    schema: "k STRING, ts TIMESTAMP, v DOUBLE"
pipeline:
  processors:
    - window:
        ts: ts
        duration: 5 minutes
        keys: [k]
        aggs: {{n: count, total: "sum:v"}}
        watermark: 10 minutes
output:
  memory: {{name: cfg_stream_out, output_mode: complete}}
""")
        got = {(r.k, str(r.window.start)): (r.n, r.total)
               for r in out.collect()}
        assert got[("a", "2024-01-01 00:00:00")] == (2, 3.0)
        assert got[("b", "2024-01-01 00:05:00")] == (1, 5.0)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_window_processor_batch_mode(spark):
    out = run_stream(spark, """
input:
  generate: {count: 100, mapping: "root.id = this.id\\nroot.g = this.id % 2"}
pipeline:
  processors:
    - bloblang: |
        root = this
        root.ts = "2024-01-01 00:00:00".parse_timestamp("2006-01-02 15:04:05")
    - window: {ts: ts, duration: 1 hour, keys: [g], aggs: {n: count, mx: "max:id"}}
""")
    got = {r.g: (r.n, r.mx) for r in out.collect()}
    assert got == {0: (50, 98), 1: (50, 99)}


def test_unknown_components_error(spark):
    with pytest.raises(ConfigError, match="unknown input type 'kafkaz'"):
        build_stream(spark, "input:\n  kafkaz: {}\n")
    with pytest.raises(ConfigError, match="unknown processor type"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: "root.id = this.id"}}
pipeline:
  processors:
    - frobnicate: {}
""")
    with pytest.raises(ConfigError, match="needs an `input`"):
        build_stream(spark, "pipeline: {}\n")


def test_for_each_and_process_batch_alias(spark):
    # for_each (lib/processor/for_each.go:19) and its deprecated alias
    # process_batch (for_each.go:37) run children sequentially.
    for kind in ("for_each", "process_batch"):
        out = run_stream(spark, f"""
input:
  generate:
    count: 4
    mapping: root.id = this.id
pipeline:
  processors:
    - {kind}:
        - bloblang: root.id = this.id + 1
        - filter: this.id >= 2
output:
  memory: {{}}
""")
        assert sorted(r.id for r in out.collect()) == [2, 3, 4]
