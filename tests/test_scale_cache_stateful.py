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


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the same key + bucket count join with NO
    Exchange on either side — the co-located-join primitive that makes
    repeated 100 TB fact-to-fact joins pay shuffle once at write time."""
    from benthos_spark.sinks.writers import write_bucketed
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", "k", n_buckets=8, sort_by="k")
    write_bucketed(b, "bkt_b", "k", n_buckets=8, sort_by="k")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == 5000
        got = j.filter("k = 7").collect()[0]
        assert (got.va, got.vb) == (14, 21)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    """Salting spreads one hot key over `salt` reducers without
    changing the join result (inner and left)."""
    from benthos_spark.operators.joins import salted_join
    import random
    left_rows = [("hot", i) for i in range(5000)] + \
        [(f"k{i % 50}", i) for i in range(2000)] + [("orphan", -1)]
    left = spark.createDataFrame(left_rows, "k string, v long")
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"R{i}") for i in range(50)],
        "k string, payload string")

    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k", salt=8, how="inner")
    assert salted.count() == plain.count() == 7000
    ps = sorted((r.k, r.v, r.payload) for r in plain.collect())
    ss = sorted((r.k, r.v, r.payload) for r in salted.collect())
    assert ps == ss
    # left join keeps unmatched rows exactly once
    lj = salted_join(left, right, "k", salt=4, how="left")
    assert lj.count() == left.count()
    assert lj.filter("k = 'orphan'").collect()[0].payload is None


def test_memory_cache_resource(spark):
    """resources.caches type: memory (the reference default cache) —
    a session-scoped store; set → get roundtrip through YAML."""
    from benthos_spark.stream import run_stream

    out = run_stream(spark, """
resources:
  caches:
    scratch: {type: memory, key: k}
input:
  generate:
    count: 3
    mapping: |
      root.k = "id-" + this.id.string()
      root.v = this.id * 10
pipeline:
  processors:
    - cache: {resource: scratch, operator: set, key: this.k, value: this.v}
    - cache: {resource: scratch, operator: get, key: this.k, keep_key: true}
output: {memory: {}}
""")
    rows = {r["k"]: r["value"] for r in out.collect()}
    assert rows == {"id-0": 0, "id-1": 10, "id-2": 20}


def test_salted_join_actually_balances_the_hot_key(spark):
    """The point of salting is runtime balance, not just equivalence:
    with one key holding 90% of rows, the plain shuffle puts ~90% of
    the join input in one partition; salt=16 spreads the hot key so no
    shuffle partition holds more than a few times its fair share."""
    import pyspark.sql.functions as F

    from benthos_spark.operators.scale import salted_join

    n = 200_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"))
    dim = spark.range(1000).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("w"))

    def max_partition_share(df):
        sizes = (df.groupBy(F.spark_partition_id().alias("p")).count()
                 .agg(F.max("count")).first()[0])
        return sizes / n

    # AQE would re-coalesce these small test partitions and hide the
    # layout; disable it so partition ids reflect the shuffle hash.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = skewed.hint("shuffle_hash").join(dim, "k")
        salted = salted_join(skewed.hint("shuffle_hash"), dim, "k",
                             salt=16)
        assert salted.count() == plain.count()
        share_plain = max_partition_share(plain)
        share_salted = max_partition_share(salted)
        # hot key ≈ 0.9 of rows in ONE partition unsalted; salted
        # spreads it across 16 salt values → worst partition falls
        # below a third of the unsalted straggler
        assert share_plain > 0.8
        assert share_salted < max(0.3, share_plain / 3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_kv_client_cache_yaml_roundtrip(spark, tmp_path):
    """redis-type cache resource through an injected flat-KV double:
    a cache `set` writes executor-side, a later `get` enriches rows
    (lib/cache/redis.go via the KVClientCache bridge)."""
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import fake_kv_cache_client_factory

    store = tmp_path / "kv"
    store.mkdir()
    register_resource("kv_double",
                      fake_kv_cache_client_factory(str(store)))
    run_stream(spark, """
input:
  generate:
    count: 3
    mapping: |
      root.k = "u" + this.id.string()
      root.name = "name" + this.id.string()
pipeline:
  processors:
    - cache: {resource: users, operator: set, key: this.k, value: this.name}
output: {drop: {}}
resources:
  caches:
    users: {type: redis, client_resource: kv_double}
""")
    # the double's files are the remote store: read back through a get
    out = run_stream(spark, """
input:
  generate: {count: 3, mapping: 'root.k = "u" + this.id.string()'}
pipeline:
  processors:
    - cache: {resource: users, operator: get, key: this.k}
output: {memory: {}}
resources:
  caches:
    users: {type: redis, client_resource: kv_double}
""")
    got = {r.k: r.value for r in out.select("k", "value").collect()}
    assert got == {"u0": "name0", "u1": "name1", "u2": "name2"}


def test_multilevel_cache_fallthrough_and_writeback(spark, tmp_path):
    """multilevel (lib/cache/multilevel.go): get falls through to the
    first level holding the key and writes the hit back to earlier
    levels; set fans out to every level."""
    from benthos_spark.operators.cache_store import (CacheStore,
                                                     MultilevelCache)

    l1 = CacheStore(spark, str(tmp_path / "l1"))
    l2 = CacheStore(spark, str(tmp_path / "l2"))
    ml = MultilevelCache([l1, l2])
    # seed only the BOTTOM level
    l2.set(spark.createDataFrame([("a", "1"), ("b", "2")],
                                 "key string, value string"))
    stream = spark.createDataFrame([("a",), ("b",), ("missing",)],
                                   "key string")
    got = {r.key: r.value for r in ml.get(stream).collect()}
    assert got == {"a": "1", "b": "2", "missing": None}
    # write-back: the hits are now ALSO in level 1
    wb = {r.key: r.value for r in l1.get(stream).collect()}
    assert wb["a"] == "1" and wb["b"] == "2"
    # set fans out to both levels
    ml.set(spark.createDataFrame([("c", "3")], "key string, value string"))
    for lvl in (l1, l2):
        assert {r.value for r in lvl.get(
            spark.createDataFrame([("c",)], "key string")).collect()} \
            == {"3"}
    # add: a key in ANY level blocks; a fresh key lands in all levels
    ml.add(spark.createDataFrame([("a", "X"), ("d", "4")],
                                 "key string, value string"))
    assert {r.value for r in ml.get(
        spark.createDataFrame([("a",), ("d",)], "key string"))
        .collect()} == {"1", "4"}
    # delete fans out
    ml.delete(spark.createDataFrame([("a",)], "key string"))
    assert [r.value for r in ml.get(
        spark.createDataFrame([("a",)], "key string")).collect()] == [None]


def test_multilevel_yaml_and_ristretto_alias(spark, tmp_path):
    """YAML wiring: a multilevel cache naming two flat caches builds
    and serves the cache processor; `ristretto` is accepted as the
    in-proc memory form."""
    from benthos_spark.stream import ConfigError, run_stream

    out = run_stream(spark, f"""
input:
  generate:
    count: 2
    mapping: |
      root.k = "k" + this.id.string()
      root.v = "v" + this.id.string()
pipeline:
  processors:
    - cache: {{resource: combo, operator: set, key: this.k, value: this.v}}
    - cache: {{resource: combo, operator: get, key: this.k}}
output: {{memory: {{}}}}
resources:
  caches:
    hot: {{type: ristretto}}
    cold: {{type: file, path: "{tmp_path / 'cold'}"}}
    combo: {{type: multilevel, levels: [hot, cold]}}
""")
    got = {r.k: r.value for r in out.select("k", "value").collect()}
    assert got == {"k0": "v0", "k1": "v1"}

    with pytest.raises(ConfigError, match="multilevel"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: 'root.x = 1'}}
output: {drop: {}}
resources:
  caches:
    broken: {type: multilevel, levels: [nope]}
""")
