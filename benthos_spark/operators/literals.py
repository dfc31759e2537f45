"""Tiny literal DataFrames as JVM LocalRelations.

`spark.createDataFrame(python_rows)` builds a pickled-RDD scan: EVERY
execution of the plan (including every broadcast build that joins the
frame) pays a Python worker round-trip — measured ~5 s per execution
in this container for a 10-row frame, repeated per bench pass.  A SQL
`VALUES` relation is a pure-JVM LocalRelation: it collects in
milliseconds, broadcasts instantly, and constant-folds into the plan.

Use for small literal tables in HOT query paths (query-term frames,
pinned sample sets, synthetic fixtures).  Not for big data — a VALUES
list is parsed SQL text, so keep it to hundreds of rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def sql_literal(v) -> str:
    """Render one Python value as a Spark SQL literal.  Strings escape
    both single quotes and backslashes (Spark's default string parser
    treats backslash as an escape); bytes render as X'..' binary
    literals; dicts as map(...) calls."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr() of the specials is not valid SQL ('nan'/'inf') —
        # render the typed literals Spark parses; everything else
        # round-trips exactly via the shortest repr
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(v)
    if isinstance(v, int):
        # outside long range a CAST would yield NULL under non-ANSI
        # mode where createDataFrame raises — match createDataFrame
        if not -(1 << 63) <= v < (1 << 63):
            raise TypeError(f"int literal {v} overflows BIGINT")
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return f"X'{bytes(v).hex()}'"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, dict):
        inner = ", ".join(f"{sql_literal(k)}, {sql_literal(x)}"
                          for k, x in v.items())
        return f"map({inner})"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(sql_literal(x) for x in v) + ")"
    raise TypeError(f"no SQL literal rendering for {type(v).__name__}")


def _split_schema(schema: str) -> list[tuple[str, str]]:
    """'a int, b map<string,string>' → [(a,int), (b,map<string,string>)]
    — splits on commas not nested inside <> / ()."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    cols = []
    for item in out:
        name, typ = item.strip().split(None, 1)
        cols.append((name, typ))
    return cols


_LIT_MAX_ROWS = 512
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def values_or_pickled(spark: SparkSession, rows: list, schema,
                      max_rows: int = _LIT_MAX_ROWS) -> DataFrame:
    """Build small driver-side row sets as a VALUES LocalRelation,
    falling back to createDataFrame (pickled-RDD scan) when the rows
    are too many or not literal-renderable.  Use at every bridge that
    turns Python-polled data into a DataFrame (bus polls, HTTP ingest,
    test-fixture messages): the frame is re-read by EVERY downstream
    execution, and the pickled scan pays a Python worker round-trip
    each time.

    `schema` is a DDL string or StructType; dict rows are reordered by
    the schema's column order."""
    sch = (schema if isinstance(schema, str) else ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields))
    if len(rows) <= max_rows:
        try:
            if rows and isinstance(rows[0], dict):
                names = [n.strip("`") for n, _ in _split_schema(sch)]
                tup = [tuple(r.get(n) for n in names) for r in rows]
            else:
                tup = [tuple(r) for r in rows]
            return literal_frame(spark, tup, sch)
        except Exception:
            pass  # unrenderable value/oversized literal → pickled path
    return spark.createDataFrame(rows, schema)


def dict_literal_frame(spark: SparkSession, d: dict) -> DataFrame | None:
    """One literal row from a plain dict, inferring the same types
    createDataFrame would (int→bigint, float→double, homogeneous
    lists, string maps).  Returns None — caller falls back to
    createDataFrame — when a value needs real inference (None, empty
    or mixed containers, nesting) or a key isn't a plain identifier."""
    if not d or not all(isinstance(k, str) and _IDENT.match(k)
                        for k in d):
        return None

    def typ(v) -> str | None:
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        if (isinstance(v, dict) and v
                and all(isinstance(k, str) for k in v)
                and all(isinstance(x, str) for x in v.values())):
            return "map<string,string>"
        if isinstance(v, list) and v:
            et = {typ(x) for x in v}
            if len(et) == 1 and None not in et and not any(
                    isinstance(x, (dict, list)) for x in v):
                return f"array<{et.pop()}>"
        return None

    cols = []
    for k, v in d.items():
        t = typ(v)
        if t is None:
            return None
        cols.append((k, t))
    schema = ", ".join(f"{k} {t}" for k, t in cols)
    return literal_frame(spark, [tuple(d.values())], schema)


def literal_frame(spark: SparkSession, rows: list[tuple],
                  schema: str) -> DataFrame:
    """Build `rows` as a VALUES LocalRelation with the given schema
    string ('name type, ...'); every column is cast explicitly so the
    frame's schema matches createDataFrame's exactly."""
    cols = _split_schema(schema)
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return spark.sql(f"SELECT {sel}").limit(0)
    vals = ", ".join(
        "(" + ", ".join(sql_literal(v) for v in row) + ")"
        for row in rows)
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}"
                    for i, (n, t) in enumerate(cols))
    return spark.sql(f"SELECT {sel} FROM (VALUES {vals}) AS t({names})")
