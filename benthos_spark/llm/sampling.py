"""Deterministic mixture sampling — hitting a target domain mix when
assembling a training corpus (e.g. 50% web, 30% code, 20% books).

Spark's `df.sample()` / `sampleBy()` draw per-partition pseudo-random
numbers, so results change whenever partitioning, task retries, or
engine version change.  For training-data pipelines the sample must be
REPRODUCIBLE (same docs in, same docs out — across reruns, engines, and
cluster sizes), so we hash the document id instead: keep a row iff
bucket(md5(id)) < rate[stratum].  Map-only, zero shuffle, and the same
row set falls out of any engine that can compute md5 (the DuckDB oracle
reproduces it bit-for-bit).

Salting the hash (`salt=`) yields independent resamples — drawing a
fresh epoch's subsample is a salt change, not a reshuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from benthos_spark.llm.dedup import hash48

_BUCKETS = float(2 ** 48)


def sample_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform [0,1) bucket from a 48-bit md5 prefix of the id."""
    key = F.concat(F.lit(salt), id_col.cast("string"))
    return hash48(key) / F.lit(_BUCKETS)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      key: str = "source", id_col: str = "doc_id",
                      default: float = 0.0, salt: str = "") -> DataFrame:
    """Keep each row of stratum `s` with probability `rates[s]`
    (deterministically, by id hash).  Strata absent from `rates` fall
    back to `default`.

    At 100 TB this is one predicate pushed into the scan — no shuffle,
    no sort, no state; the mixture error vs the target rates is
    O(1/sqrt(n_stratum)) by standard hashing-uniformity arguments.
    """
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(F.element_at(rate_map, F.col(key)),
                      F.lit(float(default)))
    return df.filter(sample_bucket(F.col(id_col), salt) < rate)
