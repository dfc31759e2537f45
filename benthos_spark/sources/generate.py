"""`generate` / `bloblang` input (lib/input/generate.go:25,98).

The reference emits `count` messages from a Bloblang mapping at an
interval.  Batch mode: `spark.range(count)` + the mapping projection.
Streaming mode: the `rate` source (rows/sec ≈ 1/interval) + projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def generate(spark: SparkSession, count: int,
             mapping: dict[str, Column] | None = None,
             partitions: int | None = None) -> DataFrame:
    """Bounded generator: `id` column 0..count-1 plus mapped columns.

    `spark.range` is an embarrassingly parallel source — `partitions`
    controls fan-out (defaults to spark.sql.shuffle.partitions).
    """
    df = spark.range(0, count, 1, numPartitions=partitions)
    if mapping:
        df = df.select("id", *[c.alias(name) for name, c in mapping.items()])
    return df


def generate_stream(spark: SparkSession, rows_per_second: int,
                    mapping: dict[str, Column] | None = None) -> DataFrame:
    """Unbounded generator on the `rate` source; `timestamp`/`value`
    columns mirror the reference's interval-clocked emission."""
    df = (spark.readStream.format("rate")
          .option("rowsPerSecond", rows_per_second).load())
    if mapping:
        df = df.select("timestamp", "value",
                       *[c.alias(name) for name, c in mapping.items()])
    return df
