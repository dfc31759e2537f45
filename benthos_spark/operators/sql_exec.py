"""`sql` processor (lib/processor/sql.go:28): run a prepared query per
message; `result_codec: json_array` replaces the payload with the
result rows, `none` leaves the message untouched (write-side use).

Spark-first guidance, in order of preference:

1. Key-lookup SELECTs → don't use this at all: load the table once
   (JDBC/read) and broadcast-join (operators.joins.cache_lookup_join).
   Per-row queries against a database from 1000 executors is a DDoS.
2. Bulk writes → `df.write.jdbc` / foreachBatch MERGE.
3. Genuinely per-row statements (the reference's semantics, kept
   here) → this operator: mapInPandas, ONE connection per partition,
   one transaction per partition (commit at partition end — the same
   at-least-once-on-retry contract as the reference's transactions).

The in-container driver is stdlib `sqlite3` (file DSN); the query uses
`?` placeholders fed from `args_cols`, mirroring the reference's
`args` interpolation list.  clickhouse/mysql/postgres/mssql need their
Python client installed on executors — the connect() factory is the
only thing to swap, and the error message says so.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _connect(driver: str, dsn: str):
    if driver == "sqlite":
        import sqlite3
        con = sqlite3.connect(dsn, timeout=60.0)
        return con
    raise NotImplementedError(
        f"sql driver {driver!r}: install the client package on executors "
        "and extend _connect(); for key-lookup SELECTs prefer a JDBC "
        "read + broadcast join (operators.joins.cache_lookup_join)")


def sql_query(df: DataFrame, dsn: str, query: str,
              args_cols: list[Column] | None = None,
              result_codec: str = "json_array",
              driver: str = "sqlite",
              alias: str = "content") -> DataFrame:
    """Execute `query` once per row with `args_cols` as positional
    parameters.  `json_array` puts the result rows (array of objects,
    keyed by column name) into `alias`; `none` passes rows through.
    Failures set `_error` and never abort the partition."""
    if result_codec not in ("none", "json_array"):
        raise ValueError(f"result_codec {result_codec!r}: none|json_array")
    in_cols = df.columns
    work = df
    arg_names = []
    for i, c in enumerate(args_cols or []):
        arg_names.append(f"__arg{i}")
        work = work.withColumn(f"__arg{i}", c)

    fields = [f for f in work.schema.fields if not f.name.startswith("__")]
    out_names = [f.name for f in fields]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in fields)
    if result_codec == "json_array" and alias not in out_names:
        schema += f", `{alias}` string"
    if "_error" not in in_cols:
        schema += ", `_error` string"

    def run(batches: Iterator) -> Iterator:
        import json

        import pandas as pd

        con = _connect(driver, dsn)
        try:
            cur = con.cursor()
            for pdf in batches:
                results, errs = [], []
                def native(v):
                    # numpy scalars bind as BLOBs in sqlite3 (silent
                    # non-match); NaN/NaT mean SQL NULL
                    if v is None or (isinstance(v, float) and v != v):
                        return None
                    if type(v).__module__ == "numpy":
                        return v.item()
                    return v

                for i in range(len(pdf)):
                    args = tuple(native(pdf[a].iloc[i]) for a in arg_names)
                    try:
                        cur.execute(query, args)
                        if result_codec == "json_array":
                            cols = [d[0] for d in cur.description or []]
                            rows = cur.fetchall() if cols else []
                            results.append(json.dumps(
                                [dict(zip(cols, r)) for r in rows]))
                        else:
                            results.append(None)
                        errs.append(None)
                    except Exception as e:  # per-row error protocol
                        results.append(None)
                        errs.append(f"sql: {e}")
                res = pdf.drop(columns=[c for c in pdf.columns
                                        if c.startswith("__")])
                if result_codec == "json_array":
                    res[alias] = results
                if "_error" in res.columns:
                    res["_error"] = res["_error"].combine_first(
                        pd.Series(errs, index=res.index))
                else:
                    res["_error"] = errs
                yield res
            con.commit()  # one transaction per partition
        finally:
            con.close()

    return work.mapInPandas(run, schema=schema)
