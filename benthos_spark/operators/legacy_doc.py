"""v3 legacy content-doctrine processors: `json` and `text`.

Reference: lib/processor/json.go (point operations on the payload's
JSON document, interpolated value/path fields) and lib/processor/
text.go (string operations on the raw payload).  These predate
Bloblang; modern configs use mappings (the compiled fast path), but a
migrating v3 config still carries them, and their semantics are
per-document dynamic — one batch may hold conflicting JSON shapes, so
they run through the dynamic-document interpreter (bloblang/interp.py)
in an Arrow-batched kernel rather than schema inference.
"""

from __future__ import annotations

import json as _json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _doc_kernel(df: DataFrame, fn):
    """mapInPandas over (content, meta) preserving all other columns;
    fn(content_str, meta_dict) -> new content_str."""
    import pandas as pd

    _ = pd
    schema = df.schema

    def op(batches):
        for pdf in batches:
            metas = pdf["meta"] if "meta" in pdf.columns else None
            out = []
            for i, c in enumerate(pdf["content"]):
                meta = (metas.iloc[i] if metas is not None else {}) or {}
                out.append(fn(c, dict(meta)))
            pdf = pdf.copy()
            pdf["content"] = out
            yield pdf

    return df.mapInPandas(op, schema=schema)


def json_stage(df: DataFrame, spec: dict) -> DataFrame:
    """`json` processor (lib/processor/json.go): operator over the
    payload document at `path`.  Supported: set, delete, append,
    clean, select, copy, move, split (documented subset — the
    remaining fold operators error with guidance)."""
    from benthos_spark.bloblang.interp import compile_template

    op = str(spec.get("operator", "set"))
    path = [p for p in str(spec.get("path", "")).split(".") if p]
    raw_value = spec.get("value")
    render = (compile_template(raw_value)
              if isinstance(raw_value, str) else None)

    def loads(c):
        try:
            return _json.loads(c) if c is not None else None
        except ValueError:
            return None

    def dumps(doc):
        return _json.dumps(doc, separators=(",", ":"), sort_keys=True,
                           ensure_ascii=False)

    def set_path(doc, path, value):
        cur = doc
        for seg in path[:-1]:
            nxt = cur.get(seg) if isinstance(cur, dict) else None
            if not isinstance(nxt, (dict, list)):
                nxt = {}
                cur[seg] = nxt
            cur = nxt
        cur[path[-1]] = value
        return doc

    def one(content, meta):
        doc = loads(content)
        if doc is None and op != "set":
            return content  # non-JSON passthrough (error-flag protocol)
        if op == "set":
            value = (render(doc, meta, content) if render is not None
                     else raw_value)
            if doc is None or not isinstance(doc, (dict, list)):
                doc = {}
            if not path:
                return value if isinstance(value, str) else dumps(value)
            return dumps(set_path(doc, path, value))
        if op == "delete":
            cur = doc
            for seg in path[:-1]:
                cur = cur.get(seg) if isinstance(cur, dict) else None
                if cur is None:
                    return dumps(doc)
            if isinstance(cur, dict):
                cur.pop(path[-1], None)
            return dumps(doc)
        if op == "append":
            cur = doc
            for seg in path[:-1]:
                cur = cur.setdefault(seg, {}) \
                    if isinstance(cur, dict) else None
            value = (render(doc, meta, content) if render is not None
                     else raw_value)
            tgt = cur.get(path[-1]) if isinstance(cur, dict) else None
            if not isinstance(tgt, list):
                tgt = [] if tgt is None else [tgt]
            tgt.append(value)
            cur[path[-1]] = tgt
            return dumps(doc)
        if op == "clean":
            def clean(v):
                if isinstance(v, dict):
                    return {k: clean(x) for k, x in v.items()
                            if x not in ("", None, [], {})}
                if isinstance(v, list):
                    return [clean(x) for x in v
                            if x not in ("", None, [], {})]
                return v
            return dumps(clean(doc))
        if op == "select":
            from benthos_spark.bloblang.interp import _MISSING, _dig
            got = _dig(doc, path)
            if got is _MISSING:
                return content
            return got if isinstance(got, str) else dumps(got)
        raise ValueError(
            f"json processor operator {op!r}: supported subset is "
            "set|delete|append|clean|select (use a bloblang mapping "
            "for the rest)")

    return _doc_kernel(df, one)


def unarchive_content_stage(df: DataFrame, fmt: str) -> DataFrame:
    """`unarchive` in its content-doctrine form (lib/processor/
    unarchive.go): one payload becomes N parts.  Row-expanding Arrow
    kernel; part_index renumbers within each source row's batch."""
    import pandas as pd

    _ = pd
    schema = df.schema
    has_meta = "meta" in df.columns

    def op(batches):
        import pandas as pd
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                c = row["content"]
                if fmt == "lines":
                    parts = [(ln, None) for ln in (c or "").split("\n")
                             if ln]
                elif fmt == "json_array":
                    try:
                        arr = _json.loads(c)
                    except ValueError:
                        arr = None
                    if not isinstance(arr, list):
                        parts = [(c, None)]
                    else:
                        parts = [(x if isinstance(x, str)
                                  else _json.dumps(
                                      x, separators=(",", ":"),
                                      sort_keys=True,
                                      ensure_ascii=False), None)
                                 for x in arr]
                elif fmt == "json_map":
                    try:
                        obj = _json.loads(c)
                    except ValueError:
                        obj = None
                    if not isinstance(obj, dict):
                        parts = [(c, None)]
                    else:
                        parts = [(v if isinstance(v, str)
                                  else _json.dumps(
                                      v, separators=(",", ":"),
                                      sort_keys=True,
                                      ensure_ascii=False), k)
                                 for k, v in sorted(obj.items())]
                else:
                    raise ValueError(
                        f"unarchive format {fmt!r}: content-doctrine "
                        "subset is lines|json_array|json_map")
                for i, (content, key) in enumerate(parts):
                    new = row.copy()
                    new["content"] = content
                    if "part_index" in pdf.columns:
                        new["part_index"] = i
                    if key is not None and has_meta:
                        m = dict(new["meta"] or {})
                        m["archive_key"] = key
                        new["meta"] = m
                    out_rows.append(new)
            yield pd.DataFrame(out_rows, columns=pdf.columns) \
                if out_rows else pdf.iloc[0:0]

    return df.mapInPandas(op, schema=schema)


def text_stage(df: DataFrame, spec: dict) -> DataFrame:
    """`text` processor (lib/processor/text.go): string operator over
    the raw payload; `value` interpolates per document."""
    from benthos_spark.bloblang.interp import compile_template

    op = str(spec.get("operator", "set"))
    raw_value = str(spec.get("value", ""))
    render = compile_template(raw_value)

    def one(content, meta):
        def val(doc=None):
            try:
                doc = _json.loads(content) if content else None
            except ValueError:
                doc = None
            return render(doc, meta, content)
        if op == "set":
            return val()
        if op == "append":
            return (content or "") + val()
        if op == "prepend":
            return val() + (content or "")
        if op == "to_upper":
            return (content or "").upper()
        if op == "to_lower":
            return (content or "").lower()
        if op == "trim_space":
            return (content or "").strip()
        if op == "trim":
            return (content or "").strip(str(spec.get("arg", "")))
        if op == "quote":
            return _json.dumps(content or "")
        if op == "unquote":
            try:
                return _json.loads(content)
            except ValueError:
                return content
        if op == "replace":
            return (content or "").replace(
                str(spec.get("arg", "")), val())
        if op == "replace_regexp":
            import re
            return re.sub(str(spec.get("arg", "")), val(), content or "")
        if op == "strip_html":
            import re
            return re.sub(r"<[^>]*>", "", content or "")
        raise ValueError(
            f"text processor operator {op!r}: supported subset is "
            "set|append|prepend|to_upper|to_lower|trim|trim_space|"
            "quote|unquote|replace|replace_regexp|strip_html")

    return _doc_kernel(df, one)
