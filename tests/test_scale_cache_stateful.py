"""Salting/bucketing, cache store verbs, custom stateful operators."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.cache_store import CacheStore
from benthos_spark.operators.scale import (bucketed_join, salted_join,
                                           write_bucketed)


def test_salted_join_matches_plain_join(spark):
    # one pathological key (90% of rows) + uniform tail
    skewed = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("v"))
    dim = spark.range(50).select(F.col("id").alias("k"),
                                 (F.col("id") * 100).alias("w"))
    plain = skewed.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("w").alias("s")).collect()[0]
    salted = salted_join(skewed, dim, "k", salt=8).agg(
        F.count("*").alias("n"), F.sum("w").alias("s")).collect()[0]
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k INT, v STRING")
    right = spark.createDataFrame([(1, "x")], "k INT, w STRING")
    out = salted_join(left, right, "k", salt=4, how="left").collect()
    got = {r.k: r.w for r in out}
    assert got == {1: "x", 99: None}
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full_outer")


def test_bucketed_join_skips_shuffle(spark):
    left = spark.range(1000).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"),
                                     (F.col("id") * 3).alias("b"))
    write_bucketed(left, "bt_left", ["k"], buckets=8)
    write_bucketed(right, "bt_right", ["k"], buckets=8)
    try:
        joined = bucketed_join(spark, "bt_left", "bt_right", "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed tables: sort-merge join with NO shuffle exchange
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_cache_store_verbs(spark):
    tmp = tempfile.mkdtemp(prefix="bs_cache")
    path = f"{tmp}/store"
    try:
        cache = CacheStore(spark, path)
        kv = lambda rows: spark.createDataFrame(rows, "key STRING, val INT")  # noqa: E731

        cache.set(kv([("a", 1), ("b", 2)]))
        cache.add(kv([("b", 99), ("c", 3)]))       # b exists: first wins
        got = {r.key: r.val for r in cache._read().collect()}
        assert got == {"a": 1, "b": 2, "c": 3}

        cache.set(kv([("a", 10)]))                 # set: last wins
        got = {r.key: r.val for r in cache._read().collect()}
        assert got["a"] == 10

        cache.delete(spark.createDataFrame([("b",)], "key STRING"))
        enriched = cache.get(
            spark.createDataFrame([("a",), ("b",), ("z",)], "key STRING"))
        got = {r.key: r.val for r in enriched.collect()}
        assert got == {"a": 10, "b": None, "z": None}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _drain(spark, stream_df, name, ckpt):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_running_counter_stateful(spark):
    from benthos_spark.streaming.stateful import running_counter
    src = tempfile.mkdtemp(prefix="bs_state_src")
    ckpt = tempfile.mkdtemp(prefix="bs_state_ckpt")
    try:
        rows = [("u1",), ("u1",), ("u2",), ("u1",)]
        spark.createDataFrame(rows, "user STRING").write \
            .mode("overwrite").parquet(src)
        stream = spark.readStream.schema("user STRING").parquet(src)
        out = _drain(spark, running_counter(stream, "user"),
                     "counter_test", ckpt)
        got = sorted((r.user, r.n) for r in out.collect())
        assert got == [("u1", 1), ("u1", 2), ("u1", 3), ("u2", 1)]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_first_wins_dedupe_state(spark):
    from benthos_spark.streaming.stateful import first_wins_dedupe_state
    src = tempfile.mkdtemp(prefix="bs_fw_src")
    ckpt = tempfile.mkdtemp(prefix="bs_fw_ckpt")
    try:
        rows = [("k1", "first"), ("k1", "second"), ("k2", "only")]
        spark.createDataFrame(rows, "k STRING, payload STRING") \
            .coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("k STRING, payload STRING") \
            .parquet(src)
        out = _drain(spark,
                     first_wins_dedupe_state(stream, "k", ["payload"]),
                     "fw_test", ckpt)
        got = sorted((r.k, r.payload) for r in out.collect())
        assert got == [("k1", "first"), ("k2", "only")]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
