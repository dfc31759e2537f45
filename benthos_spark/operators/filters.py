"""Filter / predicate / sampling / dedupe operators.

Reference: lib/processor/{filter,bounds_check,sample,hash_sample,dedupe}.go
and the condition set (lib/condition/*.go) — conditions compile to boolean
Column expressions here, so `and/or/not/xor/...` are just `& | ~ ^`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def filter_op(df: DataFrame, cond: Column) -> DataFrame:
    """`filter` processor (lib/processor/filter.go:20): keep rows where the
    condition holds.  Declarative, so Catalyst pushes it into the scan."""
    return df.filter(cond)


def bounds_check(df: DataFrame, length: Column,
                 min_len: int = 0, max_len: int = 2 ** 31 - 1) -> DataFrame:
    """`bounds_check` (lib/processor/bounds_check.go:17): drop parts whose
    payload length is outside [min, max]."""
    return df.filter((length >= F.lit(min_len)) & (length <= F.lit(max_len)))


def sample(df: DataFrame, fraction: float, seed: int = 0) -> DataFrame:
    """`sample` (lib/processor/sample.go:18): retain a random percentage.
    Bernoulli per-row, like the reference's rand.Float64() < retain."""
    return df.sample(fraction=fraction, seed=seed)


def portable_hash(col: Column, buckets: int = 10_000) -> Column:
    """Deterministic, engine-portable hash bucket in [0, buckets).

    Production path would be ``F.xxhash64`` (JVM codegen, zero-copy);
    this md5-based variant produces identical values in any engine that
    has md5 (used by the DuckDB oracle), at the cost of one hex-decode.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10) \
            .cast("long") % buckets


def hash_sample(df: DataFrame, col: Column, retain_min: float,
                retain_max: float, buckets: int = 10_000) -> DataFrame:
    """`hash_sample` (lib/processor/hash_sample.go:18): deterministically
    retain parts whose content hash lands in [min%, max%) of hash space.
    Unlike `sample`, re-runs and retries keep the same rows."""
    h = portable_hash(col, buckets)
    return df.filter(
        (h >= F.lit(int(retain_min * buckets / 100.0)))
        & (h < F.lit(int(retain_max * buckets / 100.0))))


def dedupe(df: DataFrame, key: list[Column | str],
           order_by: list[Column] | None = None) -> DataFrame:
    """`dedupe` (lib/processor/dedupe.go:26): first-wins key dedupe.

    The reference dedupes against a cache resource as messages stream by
    (arrival order defines "first").  A distributed batch engine has no
    arrival order, so "first" must be an explicit deterministic ordering
    (`order_by`); with none given this degrades to Spark's
    `dropDuplicates` (any winner — cheaper, one hash aggregate, no sort).
    Streaming mode: see benthos_spark.streaming.dedupe_within_watermark.

    Scale note: the window variant shuffles once on the key and sorts
    within groups; skewed keys are handled by AQE skew-join/agg split.
    """
    keys = [F.col(k) if isinstance(k, str) else k for k in key]
    if order_by is None:
        if not all(isinstance(k, str) for k in key):
            # dropDuplicates only takes column NAMES; silently widening
            # to every column would dedupe on the wrong key
            raise TypeError(
                "dedupe: Column-expression keys need order_by (the "
                "windowed variant); without order_by pass key column "
                "names")
        return df.dropDuplicates(list(key))
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))
