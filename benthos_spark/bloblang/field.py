"""String interpolation: `prefix ${! query } suffix` config fields.

Reference: internal/bloblang/field/expression.go:42-77 with the static
fast-path (:20-38) — a field with no `${!}` never evaluates per
message.  Here: no-interpolation templates compile to one F.lit
(Catalyst folds it); dynamic templates become a concat of literal and
compiled-query Columns.  `${…}` without `!` is env-var interpolation in
the reference's config loader and stays a config-load concern.

Also covered, matching the reference field parser byte-for-byte:
- `${{!…}}` escapes resolve to the literal `${!…}` text
  (field_parser.go escaped sequences)
- unterminated `${!` / `${{!` stay literal
- the v3 colon-argument function forms (`${!metadata:key,part}`,
  `${!json_field:path}`, `${!echo:x}`, …) translate onto the modern
  functions (query/deprecated_functions.go), including the legacy
  part-0 default vs the current-part default
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTERP = re.compile(r"\$\{!\s*(.*?)\s*\}")

# v3 colon-form function names (query/deprecated_functions.go:145)
_DEPRECATED = {
    "json_field", "metadata", "metadata_json_object", "error",
    "content", "echo", "count", "hostname", "timestamp",
    "timestamp_utc", "timestamp_unix", "timestamp_unix_nano",
    "batch_size", "uuid_v4",
}


def _scan(template: str):
    """-> [(kind, text)] with kind 'lit' | 'query'; handles `${{!`
    escapes and unterminated openers (both stay literal)."""
    out = []
    i = 0
    lit_start = 0

    def flush(end):
        if end > lit_start:
            out.append(("lit", template[lit_start:end]))

    while i < len(template):
        if template.startswith("${{!", i):
            end = template.find("}}", i + 4)
            if end < 0:
                i += 4
                continue
            flush(i)
            out.append(("lit", "${!" + template[i + 4:end] + "}"))
            i = end + 2
            lit_start = i
        elif template.startswith("${!", i):
            # brace-matched body (queries may contain object literals)
            depth = 1
            j = i + 3
            while j < len(template) and depth:
                if template[j] == "{":
                    depth += 1
                elif template[j] == "}":
                    depth -= 1
                j += 1
            if depth:
                i += 3
                continue
            flush(i)
            out.append(("query", template[i + 3:j - 1].strip()))
            i = j
            lit_start = i
        else:
            i += 1
    flush(len(template))
    return out


def _split_part_suffix(arg: str):
    """`key,3` → (key, 3); a trailing comma or non-numeric tail keeps
    the whole arg (deprecated_functions.go LastIndex parse)."""
    ix = arg.rfind(",")
    if ix > 0:
        # the prefix becomes the key regardless; only a numeric
        # suffix sets the part (so `duck,1,` keys "duck,1")
        try:
            part = int(arg[ix + 1:])
        except ValueError:
            part = None
        return arg[:ix], part
    return arg, None


def _sorted_meta_json(m: Column) -> Column:
    """metadata map → Go-marshal JSON (sorted keys)."""
    return F.to_json(F.map_from_entries(
        F.array_sort(F.map_entries(m))))


def _at_part(col: Column, part: int | None, scope,
             default: Column | None = None) -> Column:
    """`col` evaluated at an explicit batch part (None = current
    row).  Needs the message shape for cross-part reads; falls back to
    the current row when batch bookkeeping is absent."""
    if part is None:
        return col
    from benthos_spark.bloblang.compiler import _batch_index_map
    if scope.df is None or "batch_id" not in scope.df.columns:
        return col
    m, n = _batch_index_map(col, scope, "from")
    pos = F.lit(part) if part >= 0 else (n + F.lit(part)).cast("int")
    res = m[pos]
    return F.coalesce(res, default) if default is not None else res


def _legacy_column(name: str, arg: str, scope, legacy: bool,
                   this: Column | None):
    """One v3 colon-form function → Column (already string-rendered).
    Returns None for names that translate through the modern query
    path instead."""
    from benthos_spark.bloblang.compiler import (_dig, _this_dtype,
                                                 _walk_schema)
    from benthos_spark.datamodel import ERROR_COL, META_COL

    def dflt_part(p):
        # legacy resolution reads part 0 by default; modern reads the
        # current part (deprecated_functions.go:28-31)
        if p is None and legacy:
            return 0
        return p

    if name == "echo":
        return F.lit(arg)
    if name == "metadata":
        key, part = _split_part_suffix(arg)
        if not key:
            return F.lit("")
        val = F.col(META_COL)[key]
        return F.coalesce(
            _at_part(val, dflt_part(part), scope), F.lit(""))
    if name == "metadata_json_object":
        part = int(arg) if arg.strip().isdigit() else None
        val = _sorted_meta_json(F.col(META_COL))
        return F.coalesce(
            _at_part(val, dflt_part(part), scope), F.lit("{}"))
    if name == "error":
        part = int(arg) if arg.strip().isdigit() else None
        val = F.coalesce(F.col(ERROR_COL), F.lit(""))
        return F.coalesce(
            _at_part(val, dflt_part(part), scope), F.lit(""))
    if name == "content":
        part = int(arg) if arg.strip().isdigit() else None
        return F.coalesce(
            _at_part(F.col("content"), dflt_part(part), scope),
            F.lit(""))
    if name == "json_field":
        path, part = _split_part_suffix(arg)
        segs = [s for s in path.split(".") if s]
        if this is None:
            return None
        val = _dig(this, segs) if segs else this
        dt = None
        base = _this_dtype(scope)
        if base is not None:
            dt = _walk_schema(base, segs) if segs else base
        from pyspark.sql import types as T
        if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
            val = F.to_json(val)
        else:
            val = val.cast("string")
        return F.coalesce(
            _at_part(val, dflt_part(part), scope), F.lit("null"))
    return None


def interpolate(template: str, this: Column | None = None,
                df=None, legacy: bool = False,
                escaped: bool = False) -> Column:
    """Compile an interpolated field to a Column.

    ``this`` (optional) binds the document context so `json(...)` /
    `this.x` inside the query read the parsed payload rather than
    top-level columns; ``df`` enables compile-time schema dispatch.
    ``legacy`` selects the v3 part-0 default for colon-form
    functions; ``escaped`` quotes double-quotes in RESOLVED segments
    (expression.go BytesEscaped)."""
    from pyspark.sql import types as T

    from benthos_spark.bloblang.compiler import (Scope, _node_dtype,
                                                 compile_expr)
    from benthos_spark.bloblang.parser import parse_query

    scope = Scope(this_col=this, root_fields={}, df=df)
    parts: list[Column] = []
    dynamic = False
    for kind, text in _scan(template):
        if kind == "lit":
            parts.append(F.lit(text))
            continue
        dynamic = True
        m = re.match(r"^([a-z_0-9]+)(?::(.*))?$", text, re.S)
        col = None
        if m and m.group(1) in _DEPRECATED:
            col = _legacy_column(m.group(1), m.group(2) or "",
                                 scope, legacy, this)
            if col is None and m.group(2) is None:
                # bare deprecated name (hostname, batch_size, …):
                # the modern zero-arg function call
                node = parse_query(f"{m.group(1)}()")
                col = compile_expr(node, scope).cast("string")
        if col is None:
            node = parse_query(text)
            col = compile_expr(node, scope)
            dt = _node_dtype(node, scope)
            if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
                col = F.to_json(col)
            else:
                col = col.cast("string")
            col = F.coalesce(col, F.lit("null"))
        if escaped:
            col = F.replace(col, F.lit('"'), F.lit('\\"'))
        parts.append(col)
    if not dynamic:
        # static fast-path: one literal (escape-resolved)
        return F.lit("".join(t for _, t in _scan(template)))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def is_static(template: str) -> bool:
    """True when the field has no `${!}` (expression.go:20-38)."""
    return _INTERP.search(template) is None
