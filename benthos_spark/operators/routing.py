"""Routing / control-flow operators.

Reference: lib/processor/{switch,group_by,group_by_value,split,
select_parts,insert_part}.go.  Pure-mapping switches compile to CASE
expressions (one projection, no branching); processor-bearing switches
compile to filtered branch unions (see plans.branch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def switch_case(cases: list[tuple[Column | None, Column]],
                alias: str = "case") -> Column:
    """`switch` with pure-mapping cases (lib/processor/switch.go:27):
    first matching check wins, like the reference's case scan.  A `None`
    check is the default (fallthrough) case."""
    expr = None
    default = None
    for check, value in cases:
        if check is None:
            default = value
            continue
        expr = F.when(check, value) if expr is None else expr.when(check, value)
    if expr is None:
        expr = default if default is not None else F.lit(None)
    elif default is not None:
        expr = expr.otherwise(default)
    return expr.alias(alias)


def switch_branches(df: DataFrame,
                    cases: list[tuple[Column | None, Callable[[DataFrame], DataFrame]]],
                    ) -> DataFrame:
    """`switch` with processor-bearing cases: route each row to the first
    matching case's sub-pipeline, union the results.  Each branch is a
    filtered view of the same scan, so Catalyst reuses the exchange."""
    remaining = F.lit(True)
    branches = []
    for check, pipeline in cases:
        if check is None:
            branches.append(pipeline(df.filter(remaining)))
        else:
            branches.append(pipeline(df.filter(remaining & check)))
            remaining = remaining & ~check
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out


def group_by_checks(df: DataFrame,
                    groups: list[tuple[str, Column | None]],
                    alias: str = "group") -> DataFrame:
    """`group_by` (lib/processor/group_by.go:28,108-110): split a batch
    into named groups by the first matching check (None = catch-all).
    Downstream per-group pipelines filter on the label — the compiled
    form of the reference's per-group processor lists."""
    return df.withColumn(alias, switch_case(
        [(cond, F.lit(name)) for name, cond in groups], alias=alias))


def group_by_value(df: DataFrame, value: Column | str) -> DataFrame:
    """`group_by_value` (lib/processor/group_by_value.go:22): re-group the
    stream by an interpolated value (e.g. kafka key).  In Spark this is a
    hash repartition — downstream per-group operators then run without a
    second shuffle."""
    col = F.col(value) if isinstance(value, str) else value
    return df.repartition(col)


_BATCHES_PER_SHARD = 2 ** 40  # batch_id = shard * 2^40 + local batch


def split_batches(df: DataFrame, size: int, order_by: list[Column],
                  batch_col: str = "batch_id",
                  index_col: str = "part_index",
                  n_shards: int = 32,
                  global_order: bool = False) -> DataFrame:
    """`split` (lib/processor/split.go:17): re-batch parts into batches of
    `size`.  The reference gets ordering for free from single-node
    sequencing; we pin a deterministic order explicitly.

    Default is SHARDED: rows hash-shard on the first order key
    (portable 48-bit md5 hash, reproducible in any engine), the
    row_number window partitions by shard, and batch ids embed the
    shard (`shard * 2^40 + local_batch`).  Every batch still holds
    `size` parts in a deterministic order, but the sort runs
    n_shards-way parallel — no single-partition window, so the plan
    survives 100× data by raising n_shards.

    `global_order=True` restores the reference-exact single sequence
    (one global row_number → one partition carries the window); only
    for small, already-grouped data.
    """
    rn_w = (Window.orderBy(*order_by) if global_order
            else Window.partitionBy("__shard").orderBy(*order_by))
    t = df
    if not global_order:
        from benthos_spark.llm.dedup import hash48
        t = df.withColumn(
            "__shard", F.pmod(hash48(order_by[0].cast("string")),
                              F.lit(n_shards)))
    rn = F.row_number().over(rn_w) - 1
    base = (F.lit(0).cast("long") if global_order
            else F.col("__shard") * F.lit(_BATCHES_PER_SHARD))
    return (t.withColumn(batch_col,
                         (base + F.floor(rn / size)).cast("long"))
             .withColumn(index_col, (rn % size).cast("int"))
             .drop("__shard"))


def select_parts(df: DataFrame, indexes: list[int],
                 index_col: str = "part_index",
                 batch_col: str | None = None) -> DataFrame:
    """`select_parts` (lib/processor/select_parts.go:17): keep only the
    given part indexes of each batch.  Negative indexes count from the
    batch end (the reference's len arithmetic, select_parts.go:17):
    they need `batch_col` to derive the batch length — a windowed
    count over the batch key, no extra shuffle when the frame is
    already batch-partitioned."""
    pos = [i for i in indexes if i >= 0]
    neg = [i for i in indexes if i < 0]
    cond = F.col(index_col).isin(pos) if pos else F.lit(False)
    if not neg:
        return df.filter(cond)
    if batch_col is None:
        raise ValueError(
            "select_parts: negative indexes need batch_col to derive "
            "the batch length")
    # windows can't appear in a filter — project the batch size first
    size = F.count("*").over(Window.partitionBy(batch_col))
    return (df.withColumn("__bsz", size)
              .filter(cond | (F.col(index_col) - F.col("__bsz")).isin(neg))
              .drop("__bsz"))


def insert_part(df: DataFrame, part: DataFrame) -> DataFrame:
    """`insert_part` (lib/processor/insert_part.go:19): union a literal
    part into every batch (index bookkeeping left to caller)."""
    return df.unionByName(part, allowMissingColumns=True)
