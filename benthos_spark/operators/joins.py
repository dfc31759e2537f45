"""Join operators.

Reference joins are all hand-rolled single-node affairs:
- `sequence.sharded_join` (lib/input/sequence.go:142-188): out-of-core
  full-outer/outer join by iterating N shard passes over the inputs.
- `cache` / `sql` processor lookups (lib/processor/cache.go:22,
  sql.go:29): per-message point lookups against an external store.

Spark's shuffle replaces the manual sharding; broadcast replaces the
point-lookup round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sharded_join(left: DataFrame, right: DataFrame, on: str | list[str],
                 how: str = "full_outer") -> DataFrame:
    """`sequence.sharded_join` (lib/input/sequence.go:142-154): join two
    sources on an id path with `full-outter`/`outter` semantics.

    The reference shards the key space and makes N passes to stay in
    memory; a shuffle join is the same algorithm executed by the engine —
    AQE picks sort-merge vs shuffled-hash and splits skewed partitions.
    Collision strategies (array/replace/keep, sequence.go:181-188) are
    column-merge policies applied after the join by the caller.
    """
    return left.join(right, on=on, how=how)


def cache_lookup_join(stream: DataFrame, dim: DataFrame,
                      on: str | list[str] | Column,
                      how: str = "left",
                      broadcast: bool = True) -> DataFrame:
    """`cache`/`sql` get-enrichment (lib/processor/cache.go:276-282,
    sql.go:148-156): enrich each part from a keyed store.

    Per-message point lookups (the reference does one cache/SQL
    round-trip per part) become a broadcast hash join against the
    materialized dimension — no network round-trips, no shuffle of the
    fact side when the dim fits in memory (small dims at any fact scale).
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on=on, how=how)


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts: str = "ts", right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row
    with right.ts <= left.ts per key (beyond-reference; the
    time-travel enrichment every event pipeline needs — the cache
    lookup "as it was at event time").

    Spark-first plan: NOT a range join (|left|×|right| blowup) — tag
    both sides, union, and run one `last(ignorenulls)` window per
    payload column ordered by (ts, tag).  Exactly ONE shuffle on the
    key, O(n log n) per key partition, skew governed by AQE.  Right
    rows sort before left rows at equal ts, so `<=` semantics match
    DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` (oracle: asof_join_enrich).

    Right side should be unique per (key, ts); pre-aggregate otherwise
    (the oracle dedupes with max_by)."""
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [c for c in right.columns
                                if c not in keys + [ts]]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    payload = {f"{c}{suffix}": rtypes[c] for c in right_cols}
    payload[f"{ts}{suffix}"] = rtypes[ts]

    l2 = left.withColumn("__tag", F.lit(1))
    for name, typ in payload.items():
        l2 = l2.withColumn(name, F.lit(None).cast(typ))
    r2 = right.select(
        *keys, F.col(ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}")).withColumn("__tag", F.lit(0))
    for c in left.columns:
        if c not in keys + [ts]:
            r2 = r2.withColumn(c, F.lit(None).cast(ltypes[c]))

    from pyspark.sql.window import Window
    u = l2.unionByName(r2)
    w = (Window.partitionBy(*keys).orderBy(F.col(ts), F.col("__tag"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for name in payload:
        u = u.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return u.filter(F.col("__tag") == 1).drop("__tag")
