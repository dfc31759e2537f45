"""`jq` processor (lib/processor/jq.go:18) — jq queries over message JSON.

The reference executes a gojq program per message: the message content is
replaced with the query result; *no* emitted value filters the message;
multiple values become an array; metadata is reachable as `$metadata`;
failures leave content unchanged and flag the part (jq.go:34-45 summary,
error-handling doc).

Spark-first split:

- **Pure path queries** (`.a.b.c`, the overwhelmingly common case) compile
  to `to_json(try_variant_get(parse_json(content), '$.a.b.c', 'variant'))`
  — one JVM-side Project, whole-stage codegen, no Python.
- **General queries** run a small jq interpreter (streaming semantics:
  every expression maps one value to a *stream* of values, pipes compose
  streams) inside ONE Arrow-batched pandas iterator — the documented slow
  path, same shape as the reference's per-message gojq closure but
  vectorized over record batches.

Supported subset: identity, field access (+ optional `?`), indexing,
iteration `[]`, pipe `|`, comma `,`, `select`, object/array construction,
arithmetic `+ - * / %` with jq type rules (string/array concat, object
merge), comparisons, `and/or/not`, alternative `//`, `$metadata`, string
functions (`split/join/test/startswith/endswith/ltrimstr/rtrimstr`,
`ascii_downcase/upcase`, `tostring/tonumber`), array functions
(`length/keys/has/map/add/sort/sort_by/unique/reverse/first/last/min/max/
range/flatten`), `floor/ceil/fabs`, `empty`, `type`. Unsupported syntax
raises `JQCompileError` at plan-build time, never mid-job.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from itertools import product
from typing import Any, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["JQCompileError", "JQError", "parse_jq", "jq_eval_text",
           "jq_static_path", "jq_transform"]


class JQCompileError(ValueError):
    """Query uses syntax outside the supported subset (raised at build)."""


class JQError(RuntimeError):
    """Runtime jq error for one message (→ `_error`, content unchanged)."""


# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\.\.|//|==|!=|<=|>=|\||\.|\[|\]|\{|\}|\(|\)|,|:|\?|\+|-|\*|/|%|<|>)
""", re.VERBOSE)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JQCompileError(f"jq: bad character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------- AST

@dataclass
class N:
    kind: str
    a: Any = None
    b: Any = None
    c: Any = None


class _Parser:
    """Recursive descent; precedence (low→high): `|`, `,`, `//`, or, and,
    comparison, additive, multiplicative, unary, postfix."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.next()
        if v != val:
            raise JQCompileError(f"jq: expected {val!r}, got {v!r}")

    def parse(self) -> N:
        n = self.pipe()
        if self.peek()[0] != "eof":
            raise JQCompileError(f"jq: trailing input at {self.peek()[1]!r}")
        return n

    def pipe(self) -> N:
        n = self.comma()
        while self.peek()[1] == "|":
            self.next()
            n = N("pipe", n, self.comma())
        return n

    def pipe_nocomma(self) -> N:
        # jq object values are ExpD: pipes allowed, commas separate pairs
        n = self.alt()
        while self.peek()[1] == "|":
            self.next()
            n = N("pipe", n, self.alt())
        return n

    def comma(self) -> N:
        n = self.alt()
        while self.peek()[1] == ",":
            self.next()
            n = N("comma", n, self.alt())
        return n

    def alt(self) -> N:
        n = self.or_()
        while self.peek()[1] == "//":
            self.next()
            n = N("alt", n, self.or_())
        return n

    def or_(self) -> N:
        n = self.and_()
        while self.peek() == ("ident", "or"):
            self.next()
            n = N("or", n, self.and_())
        return n

    def and_(self) -> N:
        n = self.cmp()
        while self.peek() == ("ident", "and"):
            self.next()
            n = N("and", n, self.cmp())
        return n

    def cmp(self) -> N:
        n = self.add()
        while self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            n = N("cmp", n, self.add(), op)
        return n

    def add(self) -> N:
        n = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            n = N("arith", n, self.mul(), op)
        return n

    def mul(self) -> N:
        n = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            n = N("arith", n, self.unary(), op)
        return n

    def unary(self) -> N:
        if self.peek()[1] == "-":
            self.next()
            return N("neg", self.postfix())
        return self.postfix()

    def postfix(self) -> N:
        n = self.primary()
        while True:
            k, v = self.peek()
            if v == ".":
                # `.foo` chained on an expression result
                self.next()
                k2, v2 = self.next()
                if k2 != "ident":
                    raise JQCompileError("jq: expected field after '.'")
                n = N("field", n, v2)
            elif v == "[":
                self.next()
                if self.peek()[1] == "]":
                    self.next()
                    n = N("iterate", n)
                else:
                    idx = self.pipe()
                    self.expect("]")
                    n = N("index", n, idx)
            elif v == "?":
                self.next()
                n = N("try", n)
            else:
                return n

    def primary(self) -> N:
        k, v = self.next()
        if v == ".":
            k2, v2 = self.peek()
            if k2 == "ident":
                self.next()
                return N("field", N("identity"), v2)
            return N("identity")
        if v == "(":
            n = self.pipe()
            self.expect(")")
            return n
        if v == "[":
            if self.peek()[1] == "]":
                self.next()
                return N("array", None)
            n = self.pipe()
            self.expect("]")
            return N("array", n)
        if v == "{":
            pairs = []
            while self.peek()[1] != "}":
                kk, kv = self.next()
                if kk == "str":
                    key = json.loads(kv)
                elif kk == "ident":
                    key = kv
                else:
                    raise JQCompileError(f"jq: bad object key {kv!r}")
                if self.peek()[1] == ":":
                    self.next()
                    val = self.pipe_nocomma()
                else:  # {foo} shorthand
                    val = N("field", N("identity"), key)
                pairs.append((key, val))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return N("object", pairs)
        if k == "num":
            return N("lit", float(v) if "." in v or "e" in v.lower()
                     else int(v))
        if k == "str":
            return N("lit", json.loads(v))
        if k == "var":
            return N("var", v[1:])
        if k == "ident":
            if v in ("true", "false", "null"):
                return N("lit", {"true": True, "false": False,
                                 "null": None}[v])
            if v == "not":
                return N("call", "not", [])
            if self.peek()[1] == "(":
                self.next()
                args = [self.pipe()]
                while self.peek()[1] == ";":  # jq uses ';' — not tokenized
                    raise JQCompileError("jq: multi-arg ';' unsupported")
                self.expect(")")
                return N("call", v, args)
            return N("call", v, [])
        raise JQCompileError(f"jq: unexpected token {v!r}")


def parse_jq(src: str) -> N:
    return _Parser(_tokenize(src)).parse()


# ---------------------------------------------------------------- eval

def _truthy(v: Any) -> bool:
    return v is not None and v is not False


def _tonum(v: Any) -> float | int:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        if isinstance(v, str):
            try:
                f = float(v)
                return int(f) if f.is_integer() and "." not in v else f
            except ValueError as e:
                raise JQError(f"cannot parse {v!r} as number") from e
        raise JQError(f"{_jqtype(v)} cannot be parsed as number")
    return v


def _jqtype(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _add(a: Any, b: Any) -> Any:
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, bool) or isinstance(b, bool):
        raise JQError("boolean + boolean not defined")
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a + b
    if isinstance(a, str) and isinstance(b, str):
        return a + b
    if isinstance(a, list) and isinstance(b, list):
        return a + b
    if isinstance(a, dict) and isinstance(b, dict):
        return {**a, **b}
    raise JQError(f"{_jqtype(a)} and {_jqtype(b)} cannot be added")


_CMP = {"==": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}


def _eval(n: N, v: Any, env: dict[str, Any]) -> Iterator[Any]:
    kind = n.kind
    if kind == "identity":
        yield v
    elif kind == "lit":
        yield n.a
    elif kind == "var":
        if n.a not in env:
            raise JQError(f"${n.a} is not defined")
        yield env[n.a]
    elif kind == "field":
        for base in _eval(n.a, v, env):
            if base is None:
                yield None
            elif isinstance(base, dict):
                yield base.get(n.b)
            else:
                raise JQError(
                    f"cannot index {_jqtype(base)} with \"{n.b}\"")
    elif kind == "index":
        for base in _eval(n.a, v, env):
            for idx in _eval(n.b, v, env):
                if base is None:
                    yield None
                elif isinstance(base, list) and isinstance(idx, int):
                    yield base[idx] if -len(base) <= idx < len(base) else None
                elif isinstance(base, dict) and isinstance(idx, str):
                    yield base.get(idx)
                else:
                    raise JQError(
                        f"cannot index {_jqtype(base)} with {_jqtype(idx)}")
    elif kind == "iterate":
        for base in _eval(n.a, v, env):
            if isinstance(base, list):
                yield from base
            elif isinstance(base, dict):
                yield from base.values()
            else:
                raise JQError(f"cannot iterate over {_jqtype(base)}")
    elif kind == "pipe":
        for mid in _eval(n.a, v, env):
            yield from _eval(n.b, mid, env)
    elif kind == "comma":
        yield from _eval(n.a, v, env)
        yield from _eval(n.b, v, env)
    elif kind == "try":
        try:
            yield from list(_eval(n.a, v, env))
        except JQError:
            pass
    elif kind == "alt":
        got = False
        try:
            for x in _eval(n.a, v, env):
                if _truthy(x):
                    got = True
                    yield x
        except JQError:
            pass
        if not got:
            yield from _eval(n.b, v, env)
    elif kind == "or":
        for a in _eval(n.a, v, env):
            if _truthy(a):
                yield True
            else:
                for b in _eval(n.b, v, env):
                    yield _truthy(b)
    elif kind == "and":
        for a in _eval(n.a, v, env):
            if not _truthy(a):
                yield False
            else:
                for b in _eval(n.b, v, env):
                    yield _truthy(b)
    elif kind == "cmp":
        for a in _eval(n.a, v, env):
            for b in _eval(n.b, v, env):
                try:
                    yield _CMP[n.c](a, b)
                except TypeError as e:
                    raise JQError(
                        f"{_jqtype(a)} {n.c} {_jqtype(b)}") from e
    elif kind == "arith":
        for a in _eval(n.a, v, env):
            for b in _eval(n.b, v, env):
                if n.c == "+":
                    yield _add(a, b)
                elif n.c == "-" and isinstance(a, list) and isinstance(b, list):
                    yield [x for x in a if x not in b]
                elif n.c == "/" and isinstance(a, str) and isinstance(b, str):
                    yield a.split(b)
                else:
                    x, y = _tonum(a), _tonum(b)
                    if n.c == "-":
                        yield x - y
                    elif n.c == "*":
                        yield x * y
                    elif n.c == "/":
                        if y == 0:
                            raise JQError("division by zero")
                        yield x / y
                    else:
                        if y == 0:
                            raise JQError("division by zero")
                        yield int(x) % int(y)
    elif kind == "neg":
        for a in _eval(n.a, v, env):
            yield -_tonum(a)
    elif kind == "array":
        yield list(_eval(n.a, v, env)) if n.a is not None else []
    elif kind == "object":
        streams = [list(_eval(val, v, env)) for _, val in n.a]
        keys = [k for k, _ in n.a]
        for combo in product(*streams):
            yield dict(zip(keys, combo))
    elif kind == "call":
        yield from _call(n.a, n.b, v, env)
    else:  # pragma: no cover
        raise JQCompileError(f"jq: unknown node {kind}")


def _call(name: str, args: list[N], v: Any,
          env: dict[str, Any]) -> Iterator[Any]:
    def one(i: int) -> Any:
        outs = list(_eval(args[i], v, env))
        if len(outs) != 1:
            raise JQError(f"{name}: argument must yield one value")
        return outs[0]

    if name == "select":
        for cond in _eval(args[0], v, env):
            if _truthy(cond):
                yield v
    elif name == "empty":
        return
    elif name == "map":
        if not isinstance(v, list):
            raise JQError(f"cannot map over {_jqtype(v)}")
        yield [o for x in v for o in _eval(args[0], x, env)]
    elif name == "sort_by":
        if not isinstance(v, list):
            raise JQError(f"cannot sort {_jqtype(v)}")
        yield sorted(v, key=lambda x: _single(args[0], x, env))
    elif name == "length":
        if v is None:
            yield 0
        elif isinstance(v, bool):
            raise JQError("boolean has no length")
        elif isinstance(v, (int, float)):
            yield abs(v)
        else:
            yield len(v)
    elif name == "keys":
        if isinstance(v, dict):
            yield sorted(v.keys())
        elif isinstance(v, list):
            yield list(range(len(v)))
        else:
            raise JQError(f"{_jqtype(v)} has no keys")
    elif name == "has":
        k = one(0)
        if isinstance(v, dict):
            yield k in v
        elif isinstance(v, list):
            yield isinstance(k, int) and 0 <= k < len(v)
        else:
            raise JQError(f"cannot check has() on {_jqtype(v)}")
    elif name == "add":
        acc = None
        for x in (v if isinstance(v, list) else ()):
            acc = _add(acc, x)
        yield acc
    elif name == "join":
        sep = one(0)
        if not isinstance(v, list):
            raise JQError(f"cannot join {_jqtype(v)}")
        yield sep.join("" if x is None else
                       (x if isinstance(x, str) else _dumps(x)) for x in v)
    elif name == "split":
        yield _as_str(v, name).split(one(0))
    elif name == "test":
        yield re.search(one(0), _as_str(v, name)) is not None
    elif name == "startswith":
        yield _as_str(v, name).startswith(one(0))
    elif name == "endswith":
        yield _as_str(v, name).endswith(one(0))
    elif name == "ltrimstr":
        p = one(0)
        yield v[len(p):] if isinstance(v, str) and v.startswith(p) else v
    elif name == "rtrimstr":
        p = one(0)
        yield v[:-len(p)] if isinstance(v, str) and p and v.endswith(p) else v
    elif name == "ascii_downcase":
        yield _as_str(v, name).lower()
    elif name == "ascii_upcase":
        yield _as_str(v, name).upper()
    elif name == "tostring":
        yield v if isinstance(v, str) else _dumps(v)
    elif name == "tonumber":
        yield _tonum(v)
    elif name == "type":
        yield _jqtype(v)
    elif name == "not":
        yield not _truthy(v)
    elif name == "sort":
        if not isinstance(v, list):
            raise JQError(f"cannot sort {_jqtype(v)}")
        yield sorted(v, key=_sort_key)
    elif name == "unique":
        if not isinstance(v, list):
            raise JQError(f"cannot unique {_jqtype(v)}")
        out: list[Any] = []
        for x in sorted(v, key=_sort_key):
            if not out or out[-1] != x:
                out.append(x)
        yield out
    elif name == "reverse":
        yield list(reversed(v))
    elif name == "first":
        yield v[0] if v else None
    elif name == "last":
        yield v[-1] if v else None
    elif name in ("min", "max"):
        if not isinstance(v, list):
            raise JQError(f"cannot {name} {_jqtype(v)}")
        yield None if not v else (min if name == "min" else max)(
            v, key=_sort_key)
    elif name == "flatten":
        out = []
        for x in v:
            out.extend(x if isinstance(x, list) else [x])
        yield out
    elif name == "range":
        yield from range(int(one(0)))
    elif name == "floor":
        yield math.floor(_tonum(v))
    elif name == "ceil":
        yield math.ceil(_tonum(v))
    elif name == "fabs":
        yield abs(_tonum(v))
    else:
        raise JQCompileError(f"jq: unsupported function {name!r}")


def _as_str(v: Any, fn: str) -> str:
    if not isinstance(v, str):
        raise JQError(f"{fn}: input must be a string, got {_jqtype(v)}")
    return v


def _single(node: N, v: Any, env: dict[str, Any]) -> Any:
    outs = list(_eval(node, v, env))
    return outs[0] if outs else None


def _sort_key(v: Any):
    order = {"null": 0, "boolean": 1, "number": 2, "string": 3,
             "array": 4, "object": 5}
    t = _jqtype(v)
    if t == "object":
        return (5, sorted(v.items()))
    if t == "array":
        return (4, [_sort_key(x) for x in v])
    if t == "null":
        return (0, 0)
    if t == "boolean":
        return (1, int(v))
    return (order[t], v)


def _dumps(v: Any) -> str:
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False,
                      sort_keys=False)


def jq_eval_text(prog: N, text: str | None, raw: bool = False,
                 metadata: dict | None = None) -> str | None:
    """Run a parsed program against one message. Returns the new content
    (JSON text), or None when the query emitted no value (= filter the
    message, jq.go summary). Raises JQError on runtime failure."""
    if raw:
        value: Any = text
    else:
        try:
            value = json.loads(text) if text is not None else None
        except (json.JSONDecodeError, TypeError) as e:
            raise JQError(f"invalid JSON content: {e}") from e
    env = {"metadata": metadata or {}}
    outs = list(_eval(prog, value, env))
    if not outs:
        return None
    return _dumps(outs[0] if len(outs) == 1 else outs)


# ---------------------------------------------------------------- static

def _static_segments(prog: N) -> list[tuple[str, object]] | None:
    """`.a.b[0].c` → [("field","a"),("field","b"),("index",0),
    ("field","c")]; None when the program needs the interpreter.
    `?`-suffixed paths are NOT static: jq's try yields *nothing* on a
    traversal error (= message filtered), which only the interpreter
    tier models."""
    segs: list[tuple[str, object]] = []
    n = prog
    while True:
        if n.kind == "field":
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n.b):
                return None
            segs.append(("field", n.b))
            n = n.a
        elif n.kind == "index" and n.b.kind == "lit" \
                and isinstance(n.b.a, int) and n.b.a >= 0:
            segs.append(("index", n.b.a))
            n = n.a
        elif n.kind == "identity":
            return list(reversed(segs))
        else:
            return None


def jq_static_path(prog: N) -> str | None:
    """Variant path text for a pure path program (`$.a[0].b`), else
    None."""
    segs = _static_segments(prog)
    if segs is None:
        return None
    path = "$"
    for kind, val in segs:
        path += f".{val}" if kind == "field" else f"[{val}]"
    return path


# ---------------------------------------------------------------- operator

def jq_transform(df: DataFrame, query: str, content: str = "content",
                 raw: bool = False, error_col: str = "_error") -> DataFrame:
    """The `jq` processor as a DataFrame transform.

    Pure path queries stay JVM-side (variant extraction, codegen); general
    queries run the interpreter in one Arrow-batched pandas UDF. Reference
    semantics (jq.go): no value → row filtered; multiple values → array;
    runtime error → content unchanged + `error_col` set.
    """
    prog = parse_jq(query)
    segs = None if raw else _static_segments(prog)
    if segs is not None:
        # JVM tier, full gojq error semantics: a missing key yields
        # null, but TRAVERSING a non-object (".p.p" on {"p":0}) is an
        # error → content unchanged + error flag, exactly like the
        # interpreter tier (divergence originally caught by the
        # tier-equivalence property test).
        v = F.try_parse_json(F.col(content))
        err = v.isNull()  # invalid JSON or NULL content
        prefix = "$"
        for kind, val in segs:
            sch = F.schema_of_variant(
                F.try_variant_get(v, prefix, "variant"))
            ok = (sch.isNull() | (sch == "VOID") |
                  sch.startswith("OBJECT" if kind == "field" else "ARRAY"))
            err = err | ~ok
            prefix += f".{val}" if kind == "field" else f"[{val}]"
        out = F.coalesce(
            F.to_json(F.try_variant_get(v, prefix, "variant")),
            F.lit("null"))
        # both columns must evaluate against the ORIGINAL content —
        # chained withColumn would re-resolve `err` on the rewritten one
        res = df.withColumns({
            "__jq_out": F.when(err, F.col(content)).otherwise(out),
            "__jq_err": F.when(err, F.lit(
                f"jq: cannot index value in path {prefix}"))})
        res = res.withColumn(content, F.col("__jq_out"))
        if error_col in df.columns:
            res = res.withColumn(error_col, F.coalesce(
                F.col("__jq_err"), F.col(error_col)))
        else:
            res = res.withColumn(error_col, F.col("__jq_err"))
        return res.drop("__jq_out", "__jq_err")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    has_meta = "meta" in df.columns

    # NOTE: no type annotations on the UDF — `from __future__ import
    # annotations` turns them into strings pandas_udf cannot resolve.
    @pandas_udf("struct<content:string,filtered:boolean,error:string>")
    def run(content_s, meta_s):
        new_c, filt, errs = [], [], []
        for text, md in zip(content_s, meta_s):
            try:
                res = jq_eval_text(prog, text, raw=raw,
                                   metadata=dict(md) if md is not None
                                   else {})
                new_c.append(text if res is None else res)
                filt.append(res is None)
                errs.append(None)
            except JQError as e:
                new_c.append(text)
                filt.append(False)
                errs.append(f"jq: {e}")
        return pd.DataFrame(
            {"content": new_c, "filtered": filt, "error": errs})

    meta_col = F.col("meta") if has_meta else \
        F.create_map().cast("map<string,string>")
    res = df.withColumn("__jq", run(F.col(content), meta_col))
    res = res.filter(~F.col("__jq.filtered"))
    res = res.withColumn(content, F.col("__jq.content"))
    if error_col in df.columns:
        res = res.withColumn(
            error_col, F.coalesce(F.col("__jq.error"), F.col(error_col)))
    else:
        res = res.withColumn(error_col, F.col("__jq.error"))
    return res.drop("__jq")
