"""Windowed aggregation + streaming state operators.

Reference: batch policy (lib/message/batch/policy.go:53-60) = the
processing-time tumbling window; dedupe (lib/processor/dedupe.go:26)
with cache TTL = watermarked streaming dedupe; `count()` counters
(functions.go:200) = keyed stateful aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(df: DataFrame, ts: str, duration: str,
                        keys: list[str], aggs: list[Column],
                        watermark: str | None = None) -> DataFrame:
    """Event-time tumbling window aggregation.  Windows are epoch-aligned
    (Spark semantics).  Works identically on batch and streaming frames;
    on streams pass a `watermark` to bound state and drop late rows."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    return df.groupBy(F.window(ts, duration), *keys).agg(*aggs)


def sliding_window_agg(df: DataFrame, ts: str, duration: str, slide: str,
                       keys: list[str], aggs: list[Column],
                       watermark: str | None = None) -> DataFrame:
    """Sliding (hopping) window — the feature the reference docs promise
    "eventually" (windowed_processing.md:7); a native upgrade here."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    return df.groupBy(F.window(ts, duration, slide), *keys).agg(*aggs)


def session_agg(df: DataFrame, ts: str, gap: str, keys: list[str],
                aggs: list[Column], watermark: str | None = None) -> DataFrame:
    """Session windows (gap-based) — beyond-reference upgrade."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    return df.groupBy(F.session_window(ts, gap), *keys).agg(*aggs)


def batch_policy_window(df: DataFrame, ts: str, period: str,
                        keys: list[str], aggs: list[Column]) -> DataFrame:
    """Benthos batch policy `period` (policy.go:53-60): the reference
    cuts a batch every wall-clock period; mapped to an event-time
    tumbling window of the same length (deterministic, replayable —
    a deliberate upgrade from wall-clock cutting)."""
    return tumbling_window_agg(df, ts, period, keys, aggs)


def dedupe_within_watermark(df: DataFrame, keys: list[str], ts: str,
                            delay: str) -> DataFrame:
    """Streaming `dedupe` (lib/processor/dedupe.go:26) with cache TTL
    (lib/cache/memory.go) → dropDuplicatesWithinWatermark; TTL = the
    watermark delay, state is bounded exactly like the reference's
    expiring cache."""
    return df.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)


def stateful_counter(df: DataFrame, key: str, ts: str | None = None,
                     watermark: str | None = None) -> DataFrame:
    """`count("name")` (functions.go:200) as a keyed running count.
    Streaming: incremental state per key (update mode).  Batch: a plain
    groupBy count."""
    if watermark and ts and df.isStreaming:
        df = df.withWatermark(ts, watermark)
    return df.groupBy(key).agg(F.count("*").alias("count"))
