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
the REFERENCE dialect's placeholder style (lib/processor/sql.go:148-156:
`?` for mysql/clickhouse/sqlite, `$1..$n` for postgres, `@p1..@pN` for
mssql) fed from `args_cols`, mirroring the reference's `args`
interpolation list.  prepare_query() translates that style into the
Python client's DBAPI paramstyle (psycopg2/MySQLdb expect %s), with
$N/@pN repetition and reordering honored.  clickhouse/mysql/postgres/
mssql need their client installed on executors — `register_driver()`
is the one swap point (see README "SQL dialects"); contract doubles in
tests/test_sql_dialects.py pin the placeholder-binding behavior each
client will see.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference dialect → the placeholder style its queries are written in
# (lib/processor/sql.go:148-156: mysql/clickhouse use ?, postgres $N,
# mssql @pN) and the DBAPI paramstyle the usual Python client expects
# (psycopg2/MySQLdb are 'format' (%s), sqlite3/pyodbc are 'qmark').
_DIALECTS: dict[str, dict] = {
    "sqlite": {"placeholder": "qmark", "paramstyle": "qmark"},
    "mysql": {"placeholder": "qmark", "paramstyle": "format"},
    "clickhouse": {"placeholder": "qmark", "paramstyle": "format"},
    "postgres": {"placeholder": "dollar", "paramstyle": "format"},
    "mssql": {"placeholder": "at", "paramstyle": "qmark"},
}

_DRIVER_FACTORIES: dict[str, Callable[[str], object]] = {}


def register_driver(name: str, connect: Callable[[str], object],
                    paramstyle: str | None = None,
                    placeholder: str | None = None) -> None:
    """Plug a DBAPI connect factory for `name` (the production swap
    the module docstring promises — psycopg2, MySQLdb, clickhouse
    driver, pyodbc — or a contract double in tests).  `paramstyle`
    overrides the client's expected style ('qmark' → ?, 'format' →
    %s); `placeholder` overrides the dialect's query style ('qmark',
    'dollar' for $N, 'at' for @pN)."""
    _DRIVER_FACTORIES[name] = connect
    d = _DIALECTS.setdefault(
        name, {"placeholder": "qmark", "paramstyle": "qmark"})
    if paramstyle is not None:
        d["paramstyle"] = paramstyle
    if placeholder is not None:
        d["placeholder"] = placeholder


def _connect(driver: str, dsn: str):
    if driver in _DRIVER_FACTORIES:
        return _DRIVER_FACTORIES[driver](dsn)
    if driver == "sqlite":
        import sqlite3
        con = sqlite3.connect(dsn, timeout=60.0)
        return con
    raise NotImplementedError(
        f"sql driver {driver!r}: install the client package on executors "
        "and register_driver(); for key-lookup SELECTs prefer a JDBC "
        "read + broadcast join (operators.joins.cache_lookup_join)")


# Regions placeholder rewriting must never touch: single-quoted
# literals ('' escape), double-quoted identifiers, Postgres
# dollar-quoted strings ($$..$$ / $tag$..$tag$ — the empty-alternation
# tag makes the backreference work for the bare $$ form), and -- / /**/
# comments.  A $N or ? inside any of these is literal text.
_SQL_SKIP = re.compile(
    r"'(?:[^']|'')*'"
    r'|"(?:[^"]|"")*"'
    r"|\$(?P<tag>[A-Za-z_][A-Za-z_0-9]*|)\$.*?\$(?P=tag)\$"
    r"|--[^\n]*"
    r"|/\*.*?\*/",
    re.DOTALL)
_DOLLAR = re.compile(r"\$(\d+)")
_ATP = re.compile(r"@p(\d+)", re.IGNORECASE)


def _sql_chunks(query: str):
    """Yield (is_code, text) — is_code=False for quoted/comment regions
    that pass through verbatim (modulo client %-escaping)."""
    pos = 0
    for m in _SQL_SKIP.finditer(query):
        if m.start() > pos:
            yield True, query[pos:m.start()]
        yield False, m.group(0)
        pos = m.end()
    if pos < len(query):
        yield True, query[pos:]


def prepare_query(query: str, driver: str) -> tuple[str, list[int]]:
    """Translate the reference dialect's placeholder style into the
    Python client's paramstyle.

    Returns (client_query, order): `order[i]` is the 0-based index into
    the reference `args` list for the i-th client placeholder — $N/@pN
    styles may repeat and reorder args ($2 … $1 … $1), qmark is always
    positional.  Quoted literals, dollar-quoted strings, quoted
    identifiers, and comments pass through untouched.  For 'format'
    clients (psycopg2/MySQLdb %-process the WHOLE query, quoted text
    included) every literal '%' is escaped to '%%' so LIKE 'a%' and
    modulo expressions survive.  When no translation is needed (qmark
    query, qmark client — sqlite), order is None and the args tuple
    passes through unchanged, so the client still sees a count
    mismatch as an error."""
    d = _DIALECTS.get(driver, {"placeholder": "qmark",
                               "paramstyle": "qmark"})
    if d["placeholder"] == "qmark" and d["paramstyle"] == "qmark":
        return query, None
    fmt = d["paramstyle"] == "format"
    mark = "?" if d["paramstyle"] == "qmark" else "%s"
    esc = (lambda s: s.replace("%", "%%")) if fmt else (lambda s: s)
    order: list[int] = []
    out: list[str] = []
    for is_code, chunk in _sql_chunks(query):
        if not is_code:
            out.append(esc(chunk))
            continue
        if d["placeholder"] == "qmark":
            parts = chunk.split("?")
            for j, p in enumerate(parts):
                out.append(esc(p))
                if j < len(parts) - 1:
                    order.append(len(order))
                    out.append(mark)
        else:
            pat = _DOLLAR if d["placeholder"] == "dollar" else _ATP
            pos = 0
            for mt in pat.finditer(chunk):
                out.append(esc(chunk[pos:mt.start()]))
                order.append(int(mt.group(1)) - 1)
                out.append(mark)
                pos = mt.end()
            out.append(esc(chunk[pos:]))
    return "".join(out), order


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

    client_query, arg_order = prepare_query(query, driver)
    # resolve a registered factory NOW (driver side): the closure ships
    # it to the Python workers, where the module registry is fresh
    factory = _DRIVER_FACTORIES.get(driver)

    def run(batches: Iterator) -> Iterator:
        import json

        import pandas as pd

        con = factory(dsn) if factory is not None else _connect(driver, dsn)
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
                    vals = [native(pdf[a].iloc[i]) for a in arg_names]
                    try:
                        args = (tuple(vals) if arg_order is None
                                else tuple(vals[j] for j in arg_order))
                        cur.execute(client_query, args)
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
