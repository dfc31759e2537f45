"""Scale techniques: salting for skew, bucketing for co-located joins.

These are engine-level tools the reference never needed (single-node,
no shuffles) but that the 100 TB deployment of every join/groupBy in
this repo depends on.  AQE's skew-join split (enabled in session.py)
handles moderate skew automatically; salting is the explicit tool for
pathological keys (a handful of keys holding most rows), and bucketing
pre-pays the shuffle for repeated joins on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Join where `skewed[on]` has pathological hot keys.

    The skewed side gets a random salt in [0, salt); the other side is
    replicated `salt` ways (explode of a literal range — cheap when the
    other side is the smaller one).  The hot key's rows then spread over
    `salt` shuffle partitions instead of one straggler task.

    Contract mirrors a plain equi-join (inner/left supported); columns
    out = both sides minus the bookkeeping salt columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = skewed.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = s.join(o, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, on: list[str],
                   buckets: int = 32, sort: bool = True,
                   fmt: str = "parquet") -> None:
    """Persist bucketed by the join/agg key: later joins between tables
    bucketed the same way skip the shuffle entirely (Catalyst sees the
    hash-distribution requirement already satisfied)."""
    writer = df.write.format(fmt).mode("overwrite").bucketBy(buckets, *on)
    if sort:
        writer = writer.sortBy(*on)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables — zero-shuffle when bucket specs
    match (verify with .explain(): no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=on, how=how)


def ensure_scan_parallelism(df: DataFrame,
                            min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame whose upstream scan
    under-parallelizes the cluster — the "50k documents in one parquet
    row group" case, where an expensive per-row kernel (HOF folds,
    n-gram explodes, Arrow-batched classifiers) would otherwise run on
    one or two cores while the rest idle.

    Fires only when the current partition count is below half the
    default parallelism, so on real deployments (a 100 TB table
    arrives as tens of thousands of splits) this is a metadata check
    and NO shuffle.  When it does fire, the one round-robin exchange
    of the small corpus is repaid immediately by the fan-out of the
    kernel work.  Values are unchanged either way — only row placement
    moves, which no operator in this repo depends on except the
    pinned-order batch ops (which order explicitly).
    """
    if df.isStreaming:  # no partition introspection on streams
        return df
    # Derived frames (any shuffle below: join/agg/window/repartition)
    # already run at spark.sql.shuffle.partitions parallelism — and,
    # CRUCIALLY, introspecting their partition count via df.rdd under
    # AQE MATERIALIZES the query stages eagerly (an entire hidden
    # execution of the upstream plan, re-executed again by the real
    # action — measured 5-6× nondeterministic inflation of the
    # composed curation pipeline).  Only scan-shaped plans (scan /
    # filter / project / generate), where .rdd builds lineage without
    # running jobs, get the partition check.  Detection walks the
    # optimized plan's NODE NAMES against an allowlist — never the
    # rendered string, where a column literally named "JoinKey" would
    # false-positive, and an Expand/Deduplicate/CoGroup absent from a
    # denylist would false-negative straight into the AQE trap.
    if not _scan_shaped(df._jdf.queryExecution().optimizedPlan()):
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# Logical node names whose .rdd lineage never launches a job under AQE:
# leaf relations plus the narrow row-preserving/expanding wrappers.
# Everything else (Join, Aggregate, Expand, Deduplicate, CoGroup,
# MapInPandas, ...) is treated as derived.
_SCAN_NODES = frozenset({
    "Relation", "LogicalRelation", "RelationV2", "DataSourceV2Relation",
    "HiveTableRelation", "InMemoryRelation", "LocalRelation",
    "OneRowRelation", "Range", "LogicalRDD",
    "Filter", "Project", "Generate",
})


def _scan_shaped(jplan) -> bool:
    """True iff every node in the optimized logical plan is a leaf
    relation or a narrow Filter/Project/Generate — the shapes where
    df.rdd builds lineage without materializing AQE query stages."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.nodeName() not in _SCAN_NODES:
            return False
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return True
