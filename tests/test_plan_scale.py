"""Physical-plan audits: the 100 TB discipline, asserted.

Each assertion encodes a scale property from the build brief: filters
reach the parquet scan, projections prune the read schema, small dims
broadcast (no fact shuffle), aggregates run partial+final (map-side
combine), and no operator sneaks in an unbounded extra shuffle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


def plan_of(spark, sf_dir, name) -> str:
    # base_queries: one operator per name — suite hosts in queries()
    # union extra members (some deliberately 🐼) for the driver's
    # correctness sweep, which would pollute per-operator plan audits
    df = entry.base_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_predicate")
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan
    # the 4-column projection must prune the 16-column lineitem schema
    read = plan.split("ReadSchema:")[1]
    assert "l_comment" not in read and "l_orderkey" in read


def test_q1_partial_aggregation_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan          # map-side combine
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_dim_joins_broadcast_not_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "lookup_join_enrich")
    assert "BroadcastHashJoin" in plan
    # the customer fact side must NOT be exchanged for the joins: the
    # only hash exchange is the final groupBy
    assert plan.count("Exchange hashpartitioning") == 1


def test_similarity_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "similarity_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # corpus is never hash-exchanged for scoring; only the per-query
    # top-k window sorts within partitions
    assert "SortMergeJoin" not in plan


def test_switch_routing_is_one_projection(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "switch_routing")
    # CASE routing must not materialize per-case branches: one scan
    assert plan.count("FileScan") == 1


def test_minhash_reuses_exchange_for_self_join(spark, sf_dir):
    # ReuseExchange is applied by AQE at runtime — execute, then read
    # the final plan: the banded self-join must reuse the signature
    # exchange instead of recomputing scan+shingles+signatures twice
    df = entry.queries()["dedup_minhash_lsh"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_bloblang_mapping_stays_scan_projection(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "bloblang_compiled")
    assert plan.count("Exchange") == 0     # pure scan→filter→project
    assert plan.count("FileScan") == 1
    assert "BatchEvalPython" not in plan   # no Python in the hot path


def test_no_python_udfs_in_core_queries(spark, sf_dir):
    """Everything except the explicitly-🐼 operators must stay JVM-side."""
    for name in ["q1_pricing_summary", "string_methods", "text_analysis",
                 "doc_fingerprint", "window_tumbling", "sessionize",
                 "dedupe_first_wins", "topk_per_group", "yaml_config_stream"]:
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


@pytest.mark.parametrize("name", ["hash_sample", "dedup_exact"])
def test_single_scan_queries(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("FileScan") == 1


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    # the 100 TB train side must meet the eval grams in a broadcast
    # hash join — never a corpus shuffle (SortMergeJoin)
    plan = plan_of(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_shard_exchange(spark, sf_dir):
    # one hash exchange on the shard key; the window runs per-shard —
    # no global sort / single-partition window anywhere
    plan = plan_of(spark, sf_dir, "pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "partitionBy=[shard" not in plan or "Window" in plan


def test_mixture_sample_is_scan_plus_filter(spark, sf_dir):
    # map-only: no exchange of any kind; 2-column read schema
    plan = plan_of(spark, sf_dir, "mixture_sample")
    assert "Exchange" not in plan
    read = plan.split("ReadSchema:")[1]
    assert "text" not in read and "doc_id" in read


def test_repetition_gram_counts_partial_agg(spark, sf_dir):
    # the per-(doc,n,gram) count must map-side combine before shuffling
    plan = plan_of(spark, sf_dir, "text_repetition")
    assert "partial_count" in plan


def test_ensure_scan_parallelism_floor_and_noop(spark, tmp_path):
    """ensure_scan_parallelism: an under-partitioned scan (single
    row-group file) is repartitioned to default parallelism; an
    already-parallel frame passes through untouched (same plan, no
    Exchange added)."""
    from benthos_spark.operators.scale import ensure_scan_parallelism

    p = str(tmp_path / "one.parquet")
    spark.range(0, 10_000).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert narrow.rdd.getNumPartitions() <= 2
    floored = ensure_scan_parallelism(narrow)
    assert (floored.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    assert floored.count() == 10_000

    wide = spark.range(0, 1000, numPartitions=64)
    assert ensure_scan_parallelism(wide) is wide
