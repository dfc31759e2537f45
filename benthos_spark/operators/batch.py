"""Batch-shape operators: archive / unarchive / merge_json.

Reference: lib/processor/{archive,unarchive,merge_json}.go.  A Benthos
"batch" maps to a group key here (batch_id or any grouping column); the
batch-shape ops are aggregations/explodes over that key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def archive_join(df: DataFrame, group: list[str], value: Column,
                 order_by: Column, delimiter: str = "\n",
                 alias: str = "archived") -> DataFrame:
    """`archive` with format `lines`/`concat` (lib/processor/archive.go:27):
    collapse each batch into one part joining payloads with a delimiter.
    Deterministic via sort over (order_by, value) pairs — partial
    aggregation (map-side combine) applies since collect_list is
    shuffle-combined per group."""
    pair = F.struct(order_by.alias("o"), value.alias("v"))
    return df.groupBy(*group).agg(
        F.array_join(F.sort_array(F.collect_list(pair)).getField("v"),
                     delimiter).alias(alias))


def archive_json_array(df: DataFrame, group: list[str], value: Column,
                       order_by: Column, alias: str = "archived") -> DataFrame:
    """`archive` format `json_array`: batch → one JSON array payload."""
    pair = F.struct(order_by.alias("o"), value.alias("v"))
    return df.groupBy(*group).agg(
        F.to_json(F.sort_array(F.collect_list(pair)).getField("v")).alias(alias))


def unarchive_explode(df: DataFrame, parts: Column,
                      alias: str = "content",
                      index_alias: str = "part_index") -> DataFrame:
    """`unarchive` (lib/processor/unarchive.go:26): one part → many.
    `parts` is an array column (e.g. F.split for `lines`,
    from_json(array<...>) for `json_array`); posexplode keeps the part
    index like the reference's ordered part list."""
    exploded = df.select("*", F.posexplode(parts).alias(index_alias, alias))
    return exploded


def unarchive_json_map(df: DataFrame, obj: Column,
                       alias: str = "content",
                       key_meta: str = "archive_key") -> DataFrame:
    """`unarchive` format json_map (lib/processor/unarchive.go:26):
    one JSON object → one part per entry, with the key preserved as
    metadata (the reference sets the `archive_key` metadata field).
    `obj` is a MAP column (e.g. from_json(content, 'map<string,string>'))."""
    exploded = df.select("*", F.explode(obj).alias(key_meta, alias))
    if "meta" in df.columns:
        exploded = exploded.withColumn(
            "meta", F.map_concat(
                F.map_filter(F.col("meta"),
                             lambda k, _: k != F.lit(key_meta)),
                F.create_map(F.lit(key_meta), F.col(key_meta))))
    return exploded


def merge_json(df: DataFrame, group: list[str], doc: Column,
               order_by: Column, alias: str = "merged") -> DataFrame:
    """`merge_json` (lib/processor/merge_json.go:18): fold all JSON
    docs of a batch into one object with gabs Merge semantics —
    objects merge recursively, a leaf-key collision turns the value
    into an array and appends, unparseable parts are skipped.

    One shuffle on the group key (sorted collect_list window), then an
    Arrow kernel runs the recursive merge — the fold is inherently
    dynamic-typed (a leaf may become an array mid-fold), which no
    static Spark expression type can carry."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window

    from benthos_spark.bloblang.interp import _gabs_merge

    # map/struct doc columns serialize to JSON text; strings pass
    # through (CAST of a map isn't JSON — use to_json for complex)
    dt = df.select(doc.alias("__probe")).schema[0].dataType.typeName()
    doc_s = F.to_json(doc) if dt in ("map", "struct", "array") \
        else doc.cast("string")

    w_order = Window.partitionBy(*group).orderBy(order_by)
    w_full = w_order.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    collected = (df.withColumn("__docs",
                               F.collect_list(doc_s).over(w_full))
                   .withColumn("__rn", F.row_number().over(w_order))
                   .filter(F.col("__rn") == 1))

    def _merge_batch(docs_col):
        import json as _json
        out = []
        for docs in docs_col:
            acc: dict = {}
            for d in docs:
                try:
                    v = _json.loads(d)
                except (TypeError, ValueError):
                    continue  # unparseable parts are skipped
                acc = _gabs_merge(acc, v)
            out.append(_json.dumps(acc, separators=(",", ":"),
                                   sort_keys=True, ensure_ascii=False))
        return pd.Series(out)

    _merge_batch.__annotations__ = {}
    merged = pandas_udf(_merge_batch, "string")(F.col("__docs"))
    return collected.select(*group, merged.alias(alias))
