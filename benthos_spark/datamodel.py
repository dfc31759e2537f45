"""The message data model: Benthos parts as DataFrame rows.

Reference model (SURVEY §1.1): a *Message* is an ordered batch of
*parts*; each part is a raw byte payload + string→string metadata + a
lazily parsed JSON view (lib/types/message.go:40-80,
lib/message/part.go:26-30).  Here a part is one row:

    batch_id    BIGINT             -- batch membership
    part_index  INT                -- order within the batch
    content     STRING             -- raw payload (UTF-8; BinaryType for
                                      genuinely binary payloads)
    meta        MAP<STRING,STRING> -- flat metadata (lib/types/message.go:18)
    _error      STRING             -- NULL unless a processor flagged the
                                      part failed (metadata key
                                      `benthos_processing_failed`,
                                      lib/types/message.go:12)

Typed/relational DataFrames (parquet tables) are first-class too — the
engine's operators work on either shape; the message shape is only
required by batch-aware operators (batch_index/from_all/archive/...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ERROR_COL = "_error"
META_COL = "meta"
CONTENT_COL = "content"
BATCH_COL = "batch_id"
PART_INDEX_COL = "part_index"

MESSAGE_SCHEMA = T.StructType([
    T.StructField(BATCH_COL, T.LongType(), False),
    T.StructField(PART_INDEX_COL, T.IntegerType(), False),
    T.StructField(CONTENT_COL, T.StringType(), True),
    T.StructField(META_COL, T.MapType(T.StringType(), T.StringType()), True),
    T.StructField(ERROR_COL, T.StringType(), True),
])


def to_messages(df: DataFrame, content: Column | str,
                batch_id: Column | str | None = None,
                part_index: Column | str | None = None,
                meta: Column | None = None) -> DataFrame:
    """Wrap an arbitrary DataFrame into the message shape.

    ``content`` is typically ``F.to_json(F.struct(*df.columns))`` for
    relational rows, mirroring how Benthos sources emit JSON payloads.
    """
    c = F.col(content) if isinstance(content, str) else content
    b = (F.col(batch_id) if isinstance(batch_id, str) else batch_id)
    p = (F.col(part_index) if isinstance(part_index, str) else part_index)
    return df.select(
        (b if b is not None else F.lit(0)).cast("long").alias(BATCH_COL),
        (p if p is not None else F.lit(0)).cast("int").alias(PART_INDEX_COL),
        c.cast("string").alias(CONTENT_COL),
        (meta if meta is not None
         else F.create_map().cast("map<string,string>")).alias(META_COL),
        F.lit(None).cast("string").alias(ERROR_COL),
    )


def rows_to_messages(spark, parts: list[dict]) -> DataFrame:
    """Build a message DataFrame from test fixtures:
    ``[{"content": ..., "meta": {...}, "batch_id": n}, ...]``
    (mirrors the reference test-case input shape,
    lib/service/test/case.go:16-19)."""
    rows = []
    by_batch: dict[int, int] = {}
    for part in parts:
        b = int(part.get("batch_id", 0))
        idx = by_batch.get(b, 0)
        by_batch[b] = idx + 1
        rows.append((b, idx, part.get("content"), dict(part.get("meta") or {}),
                     part.get("_error")))
    from benthos_spark.operators.literals import values_or_pickled
    return values_or_pickled(spark, rows, MESSAGE_SCHEMA)


def meta_get(key: str) -> Column:
    """``meta("key")`` — reference internal/bloblang/query/functions.go:449."""
    return F.col(META_COL).getItem(key)


def meta_set(df: DataFrame, key: str, value: Column) -> DataFrame:
    """``meta key = expr`` assignment (mapping/assignment.go:71)."""
    return df.withColumn(
        META_COL,
        F.map_concat(
            F.map_filter(F.col(META_COL), lambda k, _: k != F.lit(key)),
            F.create_map(F.lit(key), value.cast("string")),
        ),
    )


def with_error(df: DataFrame, cond: Column, message: Column | str) -> DataFrame:
    """Flag rows failed without dropping them (first error wins, like the
    reference's FailFlag, lib/processor/util.go)."""
    msg = F.lit(message) if isinstance(message, str) else message
    return df.withColumn(
        ERROR_COL,
        F.when(F.col(ERROR_COL).isNotNull(), F.col(ERROR_COL))
         .when(cond, msg.cast("string")),
    )


def errored() -> Column:
    """``errored()`` — functions.go:298."""
    return F.col(ERROR_COL).isNotNull()
