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
