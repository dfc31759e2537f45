"""String interpolation: `prefix ${! query } suffix` config fields.

Reference: internal/bloblang/field/expression.go:42-77 with the static
fast-path (:20-38) — a field with no `${!}` never evaluates per
message.  Here: no-interpolation templates compile to one F.lit
(Catalyst folds it); dynamic templates become a concat of literal and
compiled-query Columns.  `${…}` without `!` is env-var interpolation in
the reference's config loader and stays a config-load concern.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTERP = re.compile(r"\$\{!\s*(.*?)\s*\}")


def interpolate(template: str, this: Column | None = None,
                df=None) -> Column:
    """Compile an interpolated field to a Column.

    ``this`` (optional) binds the document context so `json(...)` /
    `this.x` inside the query read the parsed payload rather than
    top-level columns; ``df`` enables compile-time schema dispatch."""
    from benthos_spark.bloblang.compiler import Scope, compile_expr
    from benthos_spark.bloblang.parser import parse_query

    parts: list[Column] = []
    pos = 0
    for m in _INTERP.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        node = parse_query(m.group(1))
        col = compile_expr(node, Scope(this_col=this, root_fields={},
                                       df=df))
        parts.append(col.cast("string"))
        pos = m.end()
    if pos == 0:
        return F.lit(template)  # static fast-path
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def is_static(template: str) -> bool:
    """True when the field has no `${!}` (expression.go:20-38)."""
    return _INTERP.search(template) is None
