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


_COLLISION_STRATEGIES = ("array", "replace", "keep")


def _collide(dest, src, strategy: str):
    """Leaf collision (lib/input/sequence.go:262-289): `array` folds
    colliding values into one flat array, `replace` takes the new
    value, `keep` the old."""
    if strategy == "replace":
        return src
    if strategy == "keep":
        return dest
    if isinstance(dest, list):
        return dest + (src if isinstance(src, list) else [src])
    if isinstance(src, list):
        return [dest] + src
    return [dest, src]


def _deep_merge(dest: dict, src: dict, strategy: str) -> None:
    """gabs MergeFn semantics: recurse where both sides are objects,
    collide otherwise (sequence.go:343 jObj.fields.MergeFn)."""
    for k, v in src.items():
        if k not in dest:
            dest[k] = v
        elif isinstance(dest[k], dict) and isinstance(v, dict):
            _deep_merge(dest[k], v, strategy)
        else:
            dest[k] = _collide(dest[k], v, strategy)


def sharded_join_merge(df: DataFrame, id_col: str, doc_col: str,
                       order_cols: list[str],
                       strategy: str = "array",
                       id_path: str | None = None,
                       require_order: int | None = None) -> DataFrame:
    """`sequence.sharded_join` collision semantics
    (lib/input/sequence.go:181-188, 300-355): documents sharing an id
    are deep-merged in sequence order; colliding leaves resolve by
    `strategy` (array/replace/keep); the `id_path` field is dropped
    from every doc after the first so the first occurrence pins it.
    Docs that aren't JSON objects are dropped, like the reference.

    Spark shape: the reference's N-iteration shard passes ARE a
    shuffle — one repartition on the id, a sort within partitions on
    (id, order), then a streaming per-partition merge in mapInPandas
    that carries the open group across Arrow batch boundaries.  No
    driver involvement, no per-group Python call overhead
    (applyInPandas would invoke once per id), memory bounded by one
    group + one batch.

    `require_order`: 'outter' joins flush only ids seen in the LAST
    input of the sequence (sequence.go flushOnLast) — pass that
    input's order value to keep only those groups."""
    import json

    import pandas as pd

    if strategy not in _COLLISION_STRATEGIES:
        raise ValueError(
            f"merge strategy {strategy!r} not recognised; "
            f"use one of {_COLLISION_STRATEGIES}")

    id_type = df.schema[id_col].dataType.simpleString()
    base = (df.select(F.col(id_col), F.col(doc_col).cast("string")
                      .alias("__doc"), *[F.col(c) for c in order_cols])
            .filter(F.col(id_col).isNotNull())
            .repartition(F.col(id_col))
            .sortWithinPartitions(id_col, *order_cols))
    orders = list(order_cols)

    def merge_partition(batches):
        cur_id, cur, seen_orders = None, None, set()
        pending_ids, pending_docs = [], []

        def flush():
            if cur is not None and (require_order is None
                                    or require_order in seen_orders):
                pending_ids.append(cur_id)
                pending_docs.append(json.dumps(
                    cur, sort_keys=True, separators=(",", ":")))

        for pdf in batches:
            for rid, doc, order0 in zip(pdf[id_col], pdf["__doc"],
                                        pdf[orders[0]]):
                try:
                    obj = json.loads(doc) if doc is not None else None
                except ValueError:
                    obj = None
                if not isinstance(obj, dict):
                    continue  # non-object docs are dropped
                if rid != cur_id or cur is None:
                    flush()
                    cur_id, cur, seen_orders = rid, obj, {order0}
                    continue
                seen_orders.add(order0)
                if id_path is not None:
                    obj.pop(id_path, None)
                _deep_merge(cur, obj, strategy)
            if pending_ids:
                yield pd.DataFrame({id_col: pending_ids,
                                    "doc": pending_docs})
                pending_ids, pending_docs = [], []
        flush()
        if pending_ids:
            yield pd.DataFrame({id_col: pending_ids, "doc": pending_docs})

    return base.mapInPandas(merge_partition,
                            schema=f"`{id_col}` {id_type}, doc string")


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


def salted_join(left: DataFrame, right: DataFrame, on: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-beating equi-join: every left row draws a salt in
    [0, salt) (any spread works — the join result is salt-invariant,
    so the salt needs no cross-run stability, only per-row variety);
    the right side replicates `salt`× with every salt value; the join
    key becomes (key, salt), so one hot key spreads over `salt`
    reducers instead of melting a single partition.

    Use when AQE's skew-split isn't enough (a single key holding >
    executor-memory of rows, e.g. the empty-string or null-sentinel
    key in web data).  Cost: the right side shuffles salt× its size —
    appropriate when right ≪ left but too big to broadcast.  Supports
    inner/left/left_semi/left_anti: under right/full-outer the
    replicated right side would emit unmatched rows salt× (raise
    instead).  For aggregations, prefer two-phase partial aggs (Spark
    does this already); salting is specifically for skewed JOINS."""
    from pyspark.sql.functions import spark_partition_id

    if how.replace("outer", "").strip("_") not in (
            "inner", "left", "leftsemi", "left_semi", "leftanti",
            "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched right "
            "rows would replicate salt times; use a plain join or "
            "swap sides")
    l2 = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(on), spark_partition_id(),
                          F.monotonically_increasing_id()),
               F.lit(salt)).cast("int"))
    r2 = (right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn("__salt", F.col("__salt").cast("int")))
    out = l2.join(r2, [on, "__salt"], how)
    return out.drop("__salt")
