"""Dynamic-document Bloblang evaluator — the content-doctrine fallback.

The compiler (compiler.py) is the fast path: mappings become Column
expressions over typed frames.  The v3 legacy processors (`json`,
`text`) and their interpolated fields operate on arbitrary per-message
JSON where one batch can hold conflicting shapes — schema inference
would mangle them.  This module interprets a *parsed query AST*
directly over a Python document, Arrow-batched by the caller, covering
the expression subset those surfaces use: paths, literals, arithmetic/
comparison/boolean/coalesce operators, if/match, common methods, and
the json/meta/content functions.

Reference: internal/bloblang/query/ (Exec semantics); clean-room
interpretation of the same public grammar the compiler handles.
"""

from __future__ import annotations

import datetime as _dt
import json as _json
import math
import re

from benthos_spark.bloblang import ast
from benthos_spark.bloblang.parser import parse_query

_MONTH_ABBR = ["", "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
               "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_FULL = ["", "January", "February", "March", "April", "May",
               "June", "July", "August", "September", "October",
               "November", "December"]
_DAY_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_DAY_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]

# Go reference-time layout fragments, longest-match-first
# (time/format.go); the interpreter implements the subset the
# reference's own test tables and documented layouts exercise
_GO_SPECS = ["2006", "January", "Jan", "Monday", "Mon", "-07:00",
             "-0700", "Z07:00", "Z0700", "15", "01", "02", "03", "04",
             "05", "06", "MST", "PM", "pm", "_2", "1", "2", "3", "4",
             "5"]


def _go_tokens(layout: str):
    toks = []
    i = 0
    while i < len(layout):
        ch = layout[i]
        if ch in ".," and i + 1 < len(layout) and layout[i + 1] in "09":
            d = layout[i + 1]
            j = i + 1
            while j < len(layout) and layout[j] == d:
                j += 1
            toks.append(("frac", d, j - i - 1, ch))
            i = j
            continue
        for s in _GO_SPECS:
            if layout.startswith(s, i):
                toks.append(("spec", s))
                i += len(s)
                break
        else:
            toks.append(("lit", ch))
            i += 1
    return toks


def _fmt_offset(off: _dt.timedelta, colon: bool, z_for_utc: bool) -> str:
    total = int(off.total_seconds())
    if z_for_utc and total == 0:
        return "Z"
    sign = "-" if total < 0 else "+"
    total = abs(total)
    hh, mm = divmod(total // 60, 60)
    return f"{sign}{hh:02d}:{mm:02d}" if colon else f"{sign}{hh:02d}{mm:02d}"


def go_format_time(dt: _dt.datetime, layout: str) -> str:
    """Format a datetime with a Go reference-time layout
    (time/format.go Format)."""
    off = dt.utcoffset() or _dt.timedelta(0)
    h12 = dt.hour % 12 or 12
    out = []
    for t in _go_tokens(layout):
        if t[0] == "lit":
            out.append(t[1])
        elif t[0] == "frac":
            _, d, n, sep = t
            frac = (f"{dt.microsecond:06d}" + "000")[:min(n, 9)]
            frac += "0" * (n - len(frac))
            if d == "9":
                frac = frac.rstrip("0")
                if not frac:
                    continue
            out.append(sep + frac)
        else:
            s = t[1]
            out.append({
                "2006": f"{dt.year:04d}", "06": f"{dt.year % 100:02d}",
                "January": _MONTH_FULL[dt.month],
                "Jan": _MONTH_ABBR[dt.month],
                "01": f"{dt.month:02d}", "1": str(dt.month),
                "Monday": _DAY_FULL[dt.weekday()],
                "Mon": _DAY_ABBR[dt.weekday()],
                "02": f"{dt.day:02d}", "2": str(dt.day),
                "_2": f"{dt.day:2d}",
                "15": f"{dt.hour:02d}", "03": f"{h12:02d}",
                "3": str(h12),
                "04": f"{dt.minute:02d}", "4": str(dt.minute),
                "05": f"{dt.second:02d}", "5": str(dt.second),
                "PM": "PM" if dt.hour >= 12 else "AM",
                "pm": "pm" if dt.hour >= 12 else "am",
                "MST": (dt.tzname() or "UTC"),
                "-07:00": _fmt_offset(off, True, False),
                "-0700": _fmt_offset(off, False, False),
                "Z07:00": _fmt_offset(off, True, True),
                "Z0700": _fmt_offset(off, False, True),
            }[s])
    return "".join(out)


def go_parse_time(s: str, layout: str) -> _dt.datetime:
    """Parse with a Go reference-time layout (time/format.go Parse);
    no zone in the layout → UTC, matching the reference."""
    pat, order = [], []

    def grp(name, rx):
        order.append(name)
        pat.append(f"({rx})")

    for t in _go_tokens(layout):
        if t[0] == "lit":
            pat.append(re.escape(t[1]))
        elif t[0] == "frac":
            _, d, n, sep = t
            if d == "9":
                pat.append(f"(?:{re.escape(sep)}(\\d+))?")
            else:
                pat.append(f"{re.escape(sep)}(\\d+)")
            order.append("frac")
        else:
            s2 = t[1]
            {"2006": lambda: grp("Y", r"\d{4}"),
             "06": lambda: grp("y", r"\d{2}"),
             "January": lambda: grp("B", r"[A-Za-z]+"),
             "Jan": lambda: grp("b", r"[A-Za-z]{3}"),
             "01": lambda: grp("m", r"\d{2}"),
             "1": lambda: grp("m", r"\d{1,2}"),
             "Monday": lambda: grp("wd", r"[A-Za-z]+"),
             "Mon": lambda: grp("wd", r"[A-Za-z]{3}"),
             "02": lambda: grp("d", r"\d{2}"),
             "2": lambda: grp("d", r"\d{1,2}"),
             "_2": lambda: grp("d", r"\s?\d{1,2}"),
             "15": lambda: grp("H", r"\d{2}"),
             "03": lambda: grp("I", r"\d{2}"),
             "3": lambda: grp("I", r"\d{1,2}"),
             "04": lambda: grp("M", r"\d{2}"),
             "4": lambda: grp("M", r"\d{1,2}"),
             "05": lambda: grp("S", r"\d{2}"),
             "5": lambda: grp("S", r"\d{1,2}"),
             "PM": lambda: grp("p", r"[AP]M"),
             "pm": lambda: grp("p", r"[ap]m"),
             "MST": lambda: grp("zn", r"[A-Za-z]{3,5}"),
             "-07:00": lambda: grp("z", r"[+-]\d{2}:\d{2}"),
             "-0700": lambda: grp("z", r"[+-]\d{4}"),
             "Z07:00": lambda: grp("z", r"Z|[+-]\d{2}:\d{2}"),
             "Z0700": lambda: grp("z", r"Z|[+-]\d{4}"),
             }[s2]()
    m = re.fullmatch("".join(pat), s.strip())
    if m is None:
        raise EvalError(
            f"cannot parse {s!r} with layout {layout!r}")
    f = dict(zip(order, m.groups()))
    year = int(f.get("Y") or (2000 + int(f["y"]) if f.get("y") else 1))
    if f.get("b"):
        month = _MONTH_ABBR.index(f["b"].capitalize())
    elif f.get("B"):
        month = _MONTH_FULL.index(f["B"].capitalize())
    else:
        month = int(f.get("m") or 1)
    day = int((f.get("d") or "1").strip())
    hour = int(f.get("H") or f.get("I") or 0)
    if f.get("p") and f["p"].upper() == "PM" and hour < 12:
        hour += 12
    if f.get("p") and f["p"].upper() == "AM" and hour == 12:
        hour = 0
    minute, second = int(f.get("M") or 0), int(f.get("S") or 0)
    us = int((f.get("frac") or "0").ljust(6, "0")[:6])
    tz = _dt.timezone.utc
    z = f.get("z")
    if z and z != "Z":
        zs = z.replace(":", "")
        sign = 1 if zs[0] == "+" else -1
        tz = _dt.timezone(sign * _dt.timedelta(
            hours=int(zs[1:3]), minutes=int(zs[3:5])))
    return _dt.datetime(year, month, day, hour, minute, second, us, tz)


def _rfc3339(dt: _dt.datetime) -> str:
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        s += f".{dt.microsecond:06d}".rstrip("0")
    off = dt.utcoffset()
    if off is None or int(off.total_seconds()) == 0:
        return s + "Z"
    return s + _fmt_offset(off, True, False)


class EvalError(ValueError):
    """Evaluation failure.  `recovered` mirrors the reference's
    ErrRecoverable: a fallback value contexts like .from_all() and
    ExecToString substitute for the failed evaluation."""

    def __init__(self, msg, recovered=None):
        super().__init__(msg)
        self.recovered = recovered


_MISSING = object()
_DELETED = object()   # deleted() sentinel — removes keys/elements/rows
_UNSET = object()     # mapping root before any assignment
_INVALID_DOC = object()   # non-empty content that isn't JSON:
#                           structured access raises (recoverable)


def parse_doc(content):
    """Message content → document: `_MISSING` for an empty part,
    `_INVALID_DOC` for non-empty unparseable content (structured access
    raises, message/part.go JSON()), else the parsed JSON value."""
    if content in (None, ""):
        return _MISSING
    try:
        return _json.loads(content)
    except ValueError:
        return _INVALID_DOC


def _dig(doc, path):
    cur = doc
    for seg in path:
        if isinstance(cur, dict):
            if seg not in cur:
                return _MISSING
            cur = cur[seg]
        elif isinstance(cur, list) and seg.lstrip("-").isdigit():
            i = int(seg)
            if -len(cur) <= i < len(cur):
                cur = cur[i]
            else:
                return _MISSING
        else:
            return _MISSING
    return cur


def _num(v):
    if isinstance(v, bool):
        raise EvalError("bool in numeric op")
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        try:
            f = float(v)
            return int(f) if f.is_integer() and "." not in v else f
        except ValueError as e:
            raise EvalError(f"not a number: {v!r}") from e
    raise EvalError(f"not a number: {v!r}")


def _type_name(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, _dt.datetime):
        return "timestamp"
    if isinstance(v, list):
        return "array"
    return "object"


def _as_str(v, method: str) -> str:
    """String-doctrine coercion for string methods: bytes decode as
    UTF-8 (the reference treats string/bytes interchangeably for
    these, query/methods_strings.go)."""
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        # surrogateescape keeps arbitrary bytes round-trippable
        # through the string doctrine (Go strings are raw bytes)
        return bytes(v).decode("utf-8", "surrogateescape")
    raise EvalError(
        f".{method}(): expected string value, got {_type_name(v)}")


def _as_bytes(v) -> bytes:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("utf-8", "surrogateescape")
    return serialize_value(v).encode("utf-8")


def _ts_of(v) -> _dt.datetime:
    """Any timestamp-ish value → tz-aware datetime (numbers are epoch
    seconds in UTC; strings RFC3339 with their own offset)."""
    if isinstance(v, _dt.datetime):
        return v if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
    if isinstance(v, bool):
        raise EvalError("expected timestamp value, got bool")
    if isinstance(v, (int, float)):
        return _dt.datetime.fromtimestamp(v, tz=_dt.timezone.utc)
    s = _as_str(v, "timestamp")
    try:
        dt = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError as e:
        raise EvalError(f"cannot parse timestamp {s!r}") from e
    return dt if dt.tzinfo else dt.replace(tzinfo=_dt.timezone.utc)


def _sprintf(tmpl: str, args: list) -> str:
    """Go fmt.Sprintf subset for `.format()`: %v %s %d %f %q %%
    (query/methods_strings.go format)."""
    out = []
    i = ai = 0
    while i < len(tmpl):
        c = tmpl[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        if i + 1 < len(tmpl) and tmpl[i + 1] == "%":
            out.append("%")
            i += 2
            continue
        verb = tmpl[i + 1] if i + 1 < len(tmpl) else "v"
        a = args[ai] if ai < len(args) else None
        ai += 1
        if verb == "d":
            out.append(str(int(_num(a))))
        elif verb == "f":
            out.append(f"{_num(a):f}")
        elif verb == "q":
            out.append(_json.dumps(_as_str(a, "format")))
        else:  # %v / %s
            out.append(a if isinstance(a, str) else serialize_value(a))
        i += 2
    return "".join(out)


def _gabs_merge(dest, src):
    """Reference .merge() semantics (gabs Merge): objects merge
    recursively; a leaf collision turns the destination into an array
    and appends; merging into an array appends."""
    if isinstance(dest, dict) and isinstance(src, dict):
        out = dict(dest)
        for k, v in src.items():
            out[k] = _gabs_merge(out[k], v) if k in out else v
        return out
    if isinstance(dest, list):
        return dest + (src if isinstance(src, list) else [src])
    return [dest, src]


def _truthy_pair(op, left, right):
    if op == "+":
        # arithmetic.go sumOp (:181-210): `+` dispatches on the LEFT
        # operand's type class and never coerces across classes —
        # number-left needs a number right (IGetNumber refuses
        # bool/null/containers), string/bytes-left concats (handled
        # by the caller before reaching here), anything else is a
        # TypeMismatch naming BOTH actual types (errors.go:131).  The
        # numeric-string coercion below is kept only for the OTHER
        # operators (documented lenience).  r8 ADVICE: the mismatch
        # message used to label every non-string operand "number"
        # ('"a" + true' claimed string-and-number), and bool-left
        # errored with the internal '_num' wording instead of the
        # TypeMismatch shape.
        lt, rt = _type_name(left), _type_name(right)
        if lt == "number" and rt == "number":
            return _num(left) + _num(right)
        if lt in ("string", "bytes") and rt in ("string", "bytes"):
            return _as_str(left, "add") + _as_str(right, "add")
        raise EvalError(f"cannot add types {lt} and {rt}")
    ln, rn = _num(left), _num(right)
    if op == "-":
        return ln - rn
    if op == "*":
        return ln * rn
    if op == "/":
        return ln / rn
    if op == "%":
        # Go semantics (arithmetic.go ArithmeticMod: `lhs % rhs` on
        # int64): TRUNCATED modulo — result takes the DIVIDEND's sign
        # (-1 % 2 == -1), where Python's native % is floored (== 1).
        # The compiled path inherits trunc from the JVM's %, so the
        # two engines diverged on negative dividends until the r7
        # differential fuzzer caught it (test_fuzz_bloblang.py).
        # r7 ADVICE: int/int pairs compute exact truncated mod in
        # integer arithmetic — math.fmod routes through float64 and
        # loses exactness past 2^53 ((2**60+3) % 7 is 4, fmod said 1).
        if isinstance(ln, int) and isinstance(rn, int):
            q = abs(ln) % abs(rn)
            return -q if ln < 0 else q
        return math.fmod(ln, rn)
    raise EvalError(f"op {op}")


class Interp:
    """Evaluate query ASTs against one document (+ metadata)."""

    def __init__(self, doc, meta=None, content=None, maps=None,
                 error=None, batch=None, part_index=0):
        self.doc = doc
        self.meta = meta or {}
        # input-part snapshot: meta() reads the part being mapped,
        # while assignments build the NEW part's meta (read via
        # root_meta()) — mapping/executor.go keeps query context and
        # assignment target separate
        self.meta_in = dict(self.meta)
        self.content = content
        self.error_flag = error   # the part's failure flag (error())
        # batch context for .from/.from_all/batch_index/batch_size:
        # list of {content, meta, error} dicts, this part's position
        self.batch = batch
        self.part_index = part_index
        self.vars: dict = {}
        self.maps: dict = maps or {}   # named map defs for .apply()
        self.root_val = _UNSET         # root under construction
        self._depth = 0

    # -- entry points ------------------------------------------------
    def eval(self, node):
        v = self._eval(node)
        return None if v is _MISSING else v

    # -- core --------------------------------------------------------
    def _eval(self, node):
        if isinstance(node, ast.Literal):
            return node.value
        if isinstance(node, ast.Context):
            if node.path and node.path[0] in self.vars:
                return _dig({node.path[0]: self.vars[node.path[0]]},
                            node.path)
            if self.doc is _INVALID_DOC:
                raise EvalError(
                    "unable to reference message as structured "
                    "(with 'this')")
            if node.path:
                if self.doc is _MISSING:
                    # field access on an empty part: part.JSON() fails
                    # (message is empty), unlike bare `this` which
                    # reads nil
                    raise EvalError(
                        "unable to reference message as structured "
                        "(message is empty)")
                return _dig(self.doc, node.path)
            # bare `this` with no content at all → nil (the
            # reference's field function on an empty part)
            return None if self.doc is _MISSING else self.doc
        if isinstance(node, ast.VarRef):
            if node.name not in self.vars:
                raise EvalError(f"unknown variable ${node.name}")
            return self.vars[node.name]
        if isinstance(node, ast.FieldAccess):
            base = self._eval(node.target)
            if base is _MISSING or base is None:
                return _MISSING
            return _dig(base, [node.name])
        if isinstance(node, ast.RootRef):
            base = self.root_val
            if base is _UNSET:
                return _MISSING
            return _dig(base, node.path) if node.path else base
        if isinstance(node, ast.ArrayLit):
            out = []
            for i in node.items:
                v = self._eval(i)
                if v is not _MISSING and v is not _DELETED:
                    out.append(v)
            return out
        if isinstance(node, ast.ObjectLit):
            out = {}
            for k, v in node.entries:
                key = self._eval(k) if not isinstance(k, ast.Literal) \
                    else k.value
                val = self._eval(v)
                if val is not _MISSING and val is not _DELETED:
                    out[str(key)] = val
            return out
        if isinstance(node, ast.Unary):
            v = self._eval(node.operand)
            return (not bool(v)) if node.op == "!" else -_num(v)
        if isinstance(node, ast.Binary):
            return self._binary(node)
        if isinstance(node, ast.IfExpr):
            for cond, val in node.branches:
                if self._bool(self._eval(cond)):
                    return self._eval(val)
            return self._eval(node.otherwise) \
                if node.otherwise is not None else _MISSING
        if isinstance(node, ast.MatchExpr):
            subject = (self._eval(node.subject)
                       if node.subject is not None else self.doc)
            saved = self.doc
            try:
                self.doc = subject
                for case, val in node.cases:
                    if case is None:
                        return self._eval(val)
                    cv = self._eval(case)
                    hit = (cv is True if isinstance(cv, bool)
                           else cv == subject)
                    if hit:
                        return self._eval(val)
            finally:
                self.doc = saved
            return _MISSING
        if isinstance(node, ast.FuncCall):
            return self._func(node)
        if isinstance(node, ast.Method):
            return self._method(node)
        raise EvalError(f"cannot interpret node {type(node).__name__}")

    def _bool(self, v):
        if v is _MISSING or v is None:
            raise EvalError("null/missing used as condition")
        return bool(v)

    def _binary(self, node):
        op = node.op
        if op == "|":
            # the coalesce pipe recovers errors too (arithmetic.go
            # ArithmeticPipe wraps the left side in a try)
            try:
                left = self._eval(node.left)
            except EvalError:
                left = _MISSING
            if left is _MISSING or left is None or left is _DELETED:
                return self._eval(node.right)
            return left
        if op == "&&":
            return self._bool(self._eval(node.left)) \
                and self._bool(self._eval(node.right))
        if op == "||":
            return self._bool(self._eval(node.left)) \
                or self._bool(self._eval(node.right))
        left = self._eval(node.left)
        right = self._eval(node.right)
        if op in ("==", "!="):
            def norm(v):
                if v is _MISSING:
                    return None
                if isinstance(v, bool):
                    return v
                if isinstance(v, (int, float)):
                    return float(v)
                return v
            eq = norm(left) == norm(right)
            return eq if op == "==" else not eq
        if left is _MISSING or right is _MISSING:
            raise EvalError("missing operand")
        if op in (">", "<", ">=", "<="):
            if isinstance(left, str) and isinstance(right, str):
                # two strings compare lexicographically
                # (query/arithmetic.go compareStrFn)
                ln, rn = left, right
            else:
                ln, rn = _num(left), _num(right)
            return {"<": ln < rn, ">": ln > rn,
                    "<=": ln <= rn, ">=": ln >= rn}[op]
        if op == "+" and isinstance(left, str) and isinstance(right, str):
            return left + right
        return _truthy_pair(op, left, right)

    # -- functions ---------------------------------------------------
    def _func(self, node):
        name = node.name
        args = [self.eval(a) for a in node.args]
        if name == "json":
            doc = self.doc
            if doc is _INVALID_DOC or doc is _MISSING:
                raise EvalError("failed to parse message as JSON")
            if args:
                return _dig(doc, str(args[0]).split("."))
            return doc
        if name in ("meta", "metadata", "root_meta"):
            # meta() queries the input part; root_meta() the new part
            # under construction (functions.go meta vs root_meta)
            src = self.meta if name == "root_meta" else self.meta_in
            if args:
                key = str(args[0])
                if not src.get(key):
                    # functions.go meta: missing/empty key is a
                    # RECOVERABLE error (ErrRecoverable, recovered="")
                    raise EvalError(
                        f"metadata value {key!r} not found",
                        recovered="")
                return src[key]
            return dict(src)
        if name == "content":
            return self.content if self.content is not None \
                else _json.dumps(self.doc, separators=(",", ":"),
                                 sort_keys=True)
        if name == "env":
            import os
            return os.environ.get(str(args[0]), "")
        if name == "error":
            # the fail-flag metadata string; "" when unset
            # (functions.go error → Metadata().Get(FailFlagKey))
            return self.error_flag if self.error_flag else ""
        if name == "errored":
            return bool(self.error_flag)
        if name == "batch_index":
            return self.part_index
        if name == "batch_size":
            return len(self.batch) if self.batch is not None else 1
        if name == "deleted":
            return _DELETED
        if name == "nothing":
            return _MISSING
        if name == "var":
            key = str(args[0])
            if key not in self.vars:
                raise EvalError(f"var({key!r}): variable not defined")
            return self.vars[key]
        if name == "throw":
            raise EvalError(str(args[0]))
        raise EvalError(f"function {name}() not interpretable "
                        "(dynamic-document subset)")

    # -- methods -----------------------------------------------------
    def _method(self, node):
        name = node.name

        def arg(i, default=None):
            if i < len(node.args):
                return self.eval(node.args[i])
            return default

        # catch/or intercept target ERRORS (reference TryMethod/Or):
        # evaluate the target inside the guard, before anything else
        if name == "catch":
            try:
                t = self._eval(node.target)
                if t is _MISSING:
                    raise EvalError("missing")
                return t
            except EvalError:
                return arg(0)
        if name == "or":
            try:
                t = self._eval(node.target)
            except EvalError:
                return arg(0)
            return t if t not in (_MISSING, _DELETED) \
                and t is not None else arg(0)
        if name == "from":
            return self._eval_in_part(node.target,
                                      int(self.eval(node.args[0])))
        if name == "from_all":
            if self.batch is None:
                raise EvalError(".from_all() needs batch context")
            out = []
            for i in range(len(self.batch)):
                try:
                    out.append(self._eval_in_part(node.target, i))
                except EvalError as e:
                    # ErrRecoverable semantics: the recovered value
                    # stands in for the failed part
                    out.append(e.recovered)
            return out
        target = self._eval(node.target)
        if target is _MISSING:
            if name == "exists":
                return False
            raise EvalError(f".{name}() on a missing value")
        if name == "number":
            try:
                return _num(target)
            except EvalError:
                if node.args:
                    return arg(0)
                raise
        if name == "string":
            if isinstance(target, str):
                return target
            if isinstance(target, (bytes, bytearray)):
                return bytes(target).decode("utf-8", "surrogateescape")
            if isinstance(target, _dt.datetime):
                return _rfc3339(target)
            if isinstance(target, bool):
                return "true" if target else "false"
            if isinstance(target, float) and target.is_integer():
                return str(int(target))
            if isinstance(target, (int, float)):
                return str(target)
            return _json.dumps(target, separators=(",", ":"),
                               sort_keys=True)
        if name == "bool":
            # methods.go bool: strconv.ParseBool coercion; optional
            # default recovers a failed parse
            def _to_bool(v):
                if isinstance(v, bool):
                    return v
                if isinstance(v, (int, float)):
                    return v != 0
                if isinstance(v, str):
                    s = v.strip().lower()
                    if s in ("true", "t", "1"):
                        return True
                    if s in ("false", "f", "0"):
                        return False
                return None
            b = _to_bool(target)
            if b is None:
                if node.args:
                    return arg(0)
                raise EvalError(
                    f"expected bool value, got {_type_name(target)}")
            return b
        if name == "map":
            # query/methods.go map: apply the query arg with `this`
            # rebound to the target value
            return self._eval_bound(node.args[0], target)
        if name == "append":
            if not isinstance(target, list):
                raise EvalError("expected array value")
            return target + [self.eval(a) for a in node.args]
        if name == "flatten":
            if not isinstance(target, list):
                raise EvalError("expected array value")
            out = []
            for x in target:
                if isinstance(x, list):
                    out.extend(x)
                else:
                    out.append(x)
            return out
        if name == "merge":
            return _gabs_merge(target, arg(0))
        if name == "without":
            import copy
            if not isinstance(target, dict):
                raise EvalError("expected object value")
            out = copy.deepcopy(target)
            for a in node.args:
                segs = str(self.eval(a)).split(".")
                cur = out
                ok = True
                for seg in segs[:-1]:
                    if isinstance(cur, dict) \
                            and isinstance(cur.get(seg), dict):
                        cur = cur[seg]
                    else:
                        ok = False
                        break
                if ok and isinstance(cur, dict):
                    cur.pop(segs[-1], None)
            return out
        if name == "explode":
            import copy
            segs = str(arg(0)).split(".")
            inner = _dig(target, segs)
            def _swap(v):
                d = copy.deepcopy(target)
                _assign_path(d, segs, v)
                return d
            if isinstance(inner, list):
                return [_swap(v) for v in inner]
            if isinstance(inner, dict):
                return {k: _swap(v) for k, v in inner.items()}
            raise EvalError(
                f"expected array or object value at path "
                f"'{'.'.join(segs)}', found: "
                f"{_type_name(None if inner is _MISSING else inner)}")
        if name in ("all", "any"):
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            hit = False
            for i, item in enumerate(target):
                v = self._eval_bound(node.args[0], item)
                if not isinstance(v, bool):
                    raise EvalError(
                        f"element {i}: expected bool value, got "
                        f"{_type_name(v)}")
                if name == "any" and v:
                    return True
                if name == "all" and not v:
                    return False
                hit = True
            # empty arrays: nothing satisfied the check → false
            return hit if name == "all" else False
        if name == "uppercase":
            return _as_str(target, name).upper()
        if name == "lowercase":
            return _as_str(target, name).lower()
        if name == "capitalize":
            # Go strings.Title: title-case the rune after every word
            # separator, rest untouched (methods_strings.go
            # capitalize).  Separator per Go strings.isSeparator:
            # ASCII non-[0-9A-Za-z_]; non-ASCII only whitespace — so
            # digits glue words and Unicode letters title-case (r7
            # ADVICE fix, mirrors functions/strings.py capitalize).
            # r8 ADVICE: first runes map through the shared
            # casemap.TITLE_MAP (titlecase digraphs ǳ→ǲ, Georgian,
            # Greek prosgegrammeni) before the upper() fallback —
            # identical table to the compiled engine.
            from benthos_spark.bloblang.casemap import TITLE_MAP
            s = _as_str(target, name)
            out, prev_sep = [], True
            for ch in s:
                u = TITLE_MAP.get(ch) or ch.upper()
                out.append(u if prev_sep and len(u) == 1 else ch)
                o = ord(ch)
                if o <= 0x7F:
                    prev_sep = not (ch == "_" or "0" <= ch <= "9"
                                    or "a" <= ch <= "z"
                                    or "A" <= ch <= "Z")
                else:
                    prev_sep = (not (ch.isalpha() or ch.isdigit())
                                and ch.isspace())
            return "".join(out)
        if name == "trim":
            return str(target).strip(str(arg(0))) if node.args \
                else str(target).strip()
        if name == "trim_space":
            return str(target).strip()
        if name == "length":
            return len(target)
        if name == "split":
            return str(target).split(str(arg(0)))
        if name == "join":
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            sep = str(arg(0, ""))
            for i, x in enumerate(target):
                if not isinstance(x, str):
                    raise EvalError(
                        f"failed to join element {i}: expected string "
                        f"value, got {_type_name(x)}")
            return sep.join(target)
        if name == "contains":
            if isinstance(target, str):
                return str(arg(0)) in target
            if isinstance(target, dict):
                return arg(0) in target.values()
            return arg(0) in target
        if name == "replace":
            return str(target).replace(str(arg(0)), str(arg(1)))
        if name == "re_replace":
            # Go replacement group refs ($1 / ${name}) → Python \g<>
            repl = re.sub(r"\$\{?(\w+)\}?", r"\\g<\1>", str(arg(1)))
            return re.sub(str(arg(0)), repl, str(target))
        if name == "re_match":
            return re.search(str(arg(0)), str(target)) is not None
        if name == "slice":
            if not isinstance(target, (list, str)):
                raise EvalError(
                    f"expected array or string value, got "
                    f"{_type_name(target)}")
            lo = int(arg(0, 0))
            hi = arg(1)
            return target[lo:int(hi)] if hi is not None else target[lo:]
        if name == "index":
            if not isinstance(target, (list, str)):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            i = int(arg(0, 0))
            if not -len(target) <= i < len(target):
                raise EvalError(f"index {i} out of bounds")
            return target[i]
        if name == "keys":
            return sorted(target.keys())
        if name == "values":
            return list(target.values())
        if name == "sum":
            # methods.go sum is strict: string elements are errors,
            # never coerced
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            acc = 0
            for i, x in enumerate(target):
                if isinstance(x, bool) or not isinstance(x,
                                                         (int, float)):
                    raise EvalError(
                        f"index {i}: expected number value, got "
                        f"{_type_name(x)}")
                acc += x
            return acc
        if name in ("min", "max"):
            # methods_numbers.go min/max: numeric elements only (no
            # string coercion — IGetNumber), empty array is an error.
            # r8 fuzzer find: the interp lacked these while the
            # compiled path had array_min/array_max.
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            if not target:
                raise EvalError("the array was empty")
            for i, x in enumerate(target):
                if isinstance(x, bool) or not isinstance(x,
                                                         (int, float)):
                    raise EvalError(f"index {i} of array: expected "
                                    f"number, got {_type_name(x)}")
            return min(target) if name == "min" else max(target)
        if name == "floor":
            return math.floor(_num(target))
        if name == "ceil":
            return math.ceil(_num(target))
        if name == "round":
            # Go math.Round (methods_numbers.go): half AWAY FROM ZERO
            # (2.5 → 3, -2.5 → -3), matching JVM/DuckDB round —
            # Python's round() is banker's (2.5 → 2).  r8 fuzzer find.
            # r8 ADVICE: floor(x+0.5) is WRONG for
            # 0.49999999999999994 — x+0.5 rounds up to 1.0 in float64
            # so it returned 1 where Go math.Round (and F.round in
            # the compiled path) give 0.  Compare the fractional part
            # against 0.5 exactly instead of adding.
            # On |x|, a - floor(a) is EXACT (Sterbenz: fl <= a <
            # fl+1 <= 2*fl for a>=1; fl=0 below 1) — computing the
            # fraction on the signed value is NOT (x=-0.49999…994 has
            # ulp 2^-54 but x-(-1) lands in the [0.5,1) binade whose
            # ulp is 2^-53, so the true 0.5+2^-54 rounds to 0.5).
            x = _num(target)
            if isinstance(x, int):
                return x
            a = abs(x)
            fl = math.floor(a)
            r = fl + 1 if a - fl >= 0.5 else fl
            return r if x >= 0 else -r
        if name == "abs":
            return abs(_num(target))
        if name == "type":
            if target is None:
                return "null"
            if isinstance(target, bool):
                return "bool"
            if isinstance(target, (int, float)):
                return "number"
            if isinstance(target, str):
                return "string"
            if isinstance(target, list):
                return "array"
            return "object"
        if name == "exists":
            return _dig(target, str(arg(0)).split(".")) is not _MISSING
        if name == "get":
            got = _dig(target, str(arg(0)).split("."))
            return None if got is _MISSING else got
        if name == "parse_json":
            return _json.loads(str(target))
        if name == "format_json" or name == "string_json":
            return _json.dumps(target, separators=(",", ":"),
                               sort_keys=True)
        if name == "uppercase_first":
            s = str(target)
            return s[:1].upper() + s[1:]
        if name == "apply":
            return self._run_map(str(arg(0)), target)
        if name == "unescape_html":
            import html
            return html.unescape(str(target))
        if name == "escape_html":
            import html
            return html.escape(str(target))
        if name == "map_each":
            lam = node.args[0]
            if isinstance(target, dict):
                # object form: lambda binds each {key, value} pair;
                # result replaces the value, deleted() removes the key
                # (reference: query/methods.go MapEach object branch)
                out_obj = {}
                for k, v in target.items():
                    mv = self._eval_bound(lam, {"key": k, "value": v})
                    if mv is not _MISSING and mv is not _DELETED:
                        out_obj[k] = mv
                return out_obj
            out = []
            for item in target:
                out.append(self._eval_bound(lam, item))
            return [x for x in out
                    if x is not _MISSING and x is not _DELETED]
        if name == "filter":
            lam = node.args[0]
            if isinstance(target, dict):
                # object form binds {key, value} like map_each
                return {k: v for k, v in target.items()
                        if self._bool(self._eval_bound(
                            lam, {"key": k, "value": v}))}
            return [item for item in target
                    if self._bool(self._eval_bound(lam, item))]
        if name == "collapse":
            # methods_structured.go:150: flatten to dot-path keys;
            # empty objects/arrays kept only with collapse(true)
            keep_empty = bool(arg(0, False))
            out = {}

            def walk(v, prefix):
                if isinstance(v, dict) and v:
                    for k, x in v.items():
                        walk(x, f"{prefix}.{k}" if prefix else str(k))
                elif isinstance(v, list) and v:
                    for i, x in enumerate(v):
                        walk(x, f"{prefix}.{i}" if prefix else str(i))
                elif isinstance(v, (dict, list)):
                    if keep_empty:
                        out[prefix] = v
                else:
                    out[prefix] = v

            walk(target, "")
            return out
        if name == "map_each_key":
            # methods_structured.go:830: lambda maps each key;
            # nothing() (or a bare if with no else) keeps the key,
            # deleted() removes the entry
            lam = node.args[0]
            out = {}
            for k, v in target.items():
                nk = self._eval_bound(lam, k)
                if nk is _DELETED:
                    continue
                if nk is _MISSING or nk is None:
                    out[k] = v
                else:
                    out[str(nk)] = v
            return out
        if name == "sort":
            if not node.args:
                return sorted(target)
            # custom comparator: the arg is a less(left, right) query
            # (methods_structured.go sort) — true sorts left first
            import functools

            def cmp(a, b):
                if self._bool(self._eval_bound(
                        node.args[0], {"left": a, "right": b})):
                    return -1
                if self._bool(self._eval_bound(
                        node.args[0], {"left": b, "right": a})):
                    return 1
                return 0
            return sorted(target, key=functools.cmp_to_key(cmp))
        if name == "unique":
            # methods_structured.go unique: string/number elements
            # only; numbers compare numerically (3 == 3.0), strings as
            # strings ("5" != 5)
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            seen, out = set(), []
            for i, x in enumerate(target):
                v = self._eval_bound(node.args[0], x) if node.args \
                    else x
                if isinstance(v, bool) or not isinstance(
                        v, (str, int, float)):
                    raise EvalError(
                        f"index {i}: expected string or number "
                        f"value, got {_type_name(v)}")
                k = ("s", v) if isinstance(v, str) else ("n", float(v))
                if k not in seen:
                    seen.add(k)
                    out.append(x)
            return out
        ext = self._method_ext(name, node, target, arg)
        if ext is not _MISSING:
            return ext
        raise EvalError(f".{name}() not interpretable "
                        "(dynamic-document subset)")

    def _method_ext(self, name, node, target, arg):
        """Extended method surface (strings/encoding/crypto/timestamps/
        folds) — returns _MISSING when the name is unknown."""
        if name == "bytes":
            return _as_bytes(target)
        if name == "not_null":
            if target is None:
                raise EvalError("value is null")
            return target
        if name == "has_prefix":
            return _as_str(target, name).startswith(
                _as_str(arg(0), name))
        if name == "has_suffix":
            return _as_str(target, name).endswith(_as_str(arg(0), name))
        if name == "index_of":
            return _as_str(target, name).find(_as_str(arg(0), name))
        if name == "reverse":
            if isinstance(target, list):
                return list(reversed(target))
            return _as_str(target, name)[::-1]
        if name == "quote":
            return _json.dumps(_as_str(target, name),
                               ensure_ascii=False)
        if name == "unquote":
            s = _as_str(target, name)
            try:
                v = _json.loads(s)
            except ValueError as e:
                raise EvalError(f"unquote: {e}") from e
            if not isinstance(v, str):
                raise EvalError("unquote: not a quoted string")
            return v
        if name == "replace_many":
            pairs = arg(0)
            if not isinstance(pairs, list) or len(pairs) % 2:
                raise EvalError(
                    "replace_many expects an even-length array")
            s = _as_str(target, name)
            for i in range(0, len(pairs), 2):
                s = s.replace(_as_str(pairs[i], name),
                              _as_str(pairs[i + 1], name))
            return s
        if name == "strip_html":
            return re.sub(r"<[^>]*>", "", _as_str(target, name))
        if name == "escape_url_query":
            from urllib.parse import quote_plus
            return quote_plus(_as_str(target, name))
        if name == "unescape_url_query":
            from urllib.parse import unquote_plus
            return unquote_plus(_as_str(target, name))
        if name == "format":
            return _sprintf(_as_str(target, name),
                            [self.eval(a) for a in node.args])
        if name == "re_find_all":
            return [m.group(0) for m in re.finditer(
                str(arg(0)), _as_str(target, name))]
        if name == "re_find_all_submatch":
            return [[m.group(0)] + ["" if g is None else g
                                    for g in m.groups()]
                    for m in re.finditer(str(arg(0)),
                                         _as_str(target, name))]
        if name == "re_find_object":
            m = re.search(str(arg(0)), _as_str(target, name))
            if m is None:
                return {}
            out = {"0": m.group(0)}
            for i, g in enumerate(m.groups(), 1):
                out[str(i)] = "" if g is None else g
            for k, v in m.groupdict().items():
                out[k] = "" if v is None else v
            return out
        if name == "re_find_all_object":
            out = []
            for m in re.finditer(str(arg(0)), _as_str(target, name)):
                d = {"0": m.group(0)}
                for i, g in enumerate(m.groups(), 1):
                    d[str(i)] = "" if g is None else g
                for k, v in m.groupdict().items():
                    d[k] = "" if v is None else v
                out.append(d)
            return out
        if name == "parse_csv":
            import csv
            import io
            rows = list(csv.reader(io.StringIO(_as_str(target, name))))
            if not rows:
                raise EvalError("parse_csv: empty input")
            hdr = rows[0]
            for i, r in enumerate(rows[1:], 2):
                if len(r) != len(hdr):
                    # encoding/csv ErrFieldCount parity
                    raise EvalError(f"record on line {i}: wrong "
                                    "number of fields")
            return [dict(zip(hdr, r)) for r in rows[1:]]
        if name == "encode":
            scheme = str(arg(0))
            b = _as_bytes(target)
            import base64
            if scheme == "base64":
                return base64.b64encode(b).decode("ascii")
            if scheme == "base64url":
                return base64.urlsafe_b64encode(b).decode("ascii")
            if scheme == "hex":
                return b.hex()
            if scheme == "ascii85":
                return base64.a85encode(b).decode("ascii")
            if scheme == "z85":
                if len(b) % 4:
                    raise EvalError("z85 encode: data length not a "
                                    "multiple of 4")
                from benthos_spark.functions.strings import _Z85_ALPHA
                out = []
                for i in range(0, len(b), 4):
                    n = int.from_bytes(b[i:i + 4], "big")
                    chunk = []
                    for _ in range(5):
                        chunk.append(_Z85_ALPHA[n % 85])
                        n //= 85
                    out.extend(reversed(chunk))
                return "".join(out)
            raise EvalError(f"encode scheme {scheme!r} unknown")
        if name == "decode":
            scheme = str(arg(0))
            s = _as_str(target, name)
            import base64
            try:
                if scheme == "base64":
                    return base64.b64decode(s)
                if scheme == "base64url":
                    return base64.urlsafe_b64decode(s)
                if scheme == "hex":
                    return bytes.fromhex(s)
                if scheme == "ascii85":
                    return base64.a85decode(s)
                if scheme == "z85":
                    if len(s) % 5:
                        raise EvalError("z85 decode: length not a "
                                        "multiple of 5")
                    from benthos_spark.functions.strings import _Z85_REV
                    out = bytearray()
                    for i in range(0, len(s), 5):
                        n = 0
                        for ch in s[i:i + 5]:
                            n = n * 85 + _Z85_REV[ch]
                        out += n.to_bytes(4, "big")
                    return bytes(out)
            except EvalError:
                raise
            except Exception as e:  # noqa: BLE001
                raise EvalError(f"decode {scheme}: {e}") from e
            raise EvalError(f"decode scheme {scheme!r} unknown")
        if name == "hash":
            alg = str(arg(0))
            b = _as_bytes(target)
            import hashlib
            import hmac as _hmac
            if alg == "xxhash64":
                from benthos_spark.functions.strings import _xxh64
                return str(_xxh64(b)).encode("ascii")
            if alg == "crc32":
                import zlib
                return str(zlib.crc32(b)).encode("ascii")
            if alg.startswith("hmac_"):
                key = _as_bytes(arg(1))
                try:
                    return _hmac.new(key, b, alg[5:]).digest()
                except ValueError as e:
                    raise EvalError(str(e)) from e
            try:
                return hashlib.new(alg, b).digest()
            except ValueError as e:
                raise EvalError(f"hash algorithm {alg!r}: {e}") from e
        if name in ("encrypt_aes", "decrypt_aes"):
            scheme = str(arg(0))
            key, iv = _as_bytes(arg(1)), _as_bytes(arg(2))
            data = _as_bytes(target)
            try:
                from cryptography.hazmat.primitives.ciphers import (
                    Cipher, algorithms, modes)
            except ImportError as e:  # pragma: no cover
                raise EvalError("AES unavailable: cryptography "
                                "missing") from e
            mode = {"ctr": modes.CTR, "ofb": modes.OFB,
                    "cbc": modes.CBC}.get(scheme)
            if mode is None:
                raise EvalError(f"AES scheme {scheme!r} unsupported "
                                "(ctr|ofb|cbc)")
            if scheme == "cbc" and len(data) % 16:
                raise EvalError("cbc: input not a multiple of the "
                                "block size")
            c = Cipher(algorithms.AES(key), mode(iv))
            op = (c.encryptor() if name == "encrypt_aes"
                  else c.decryptor())
            out = op.update(data) + op.finalize()
            return out if name == "decrypt_aes" else out
        if name == "fold":
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            acc = arg(0)
            for x in target:
                acc = self._eval_bound(
                    node.args[1], {"tally": acc, "value": x})
            return acc
        if name == "enumerated":
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            return [{"index": i, "value": v}
                    for i, v in enumerate(target)]
        if name == "sort_by":
            if not isinstance(target, list):
                raise EvalError(
                    f"expected array value, got {_type_name(target)}")
            return sorted(target, key=lambda x: self._eval_bound(
                node.args[0], x))
        if name == "parse_timestamp":
            s = _as_str(target, name)
            if node.args:
                return go_parse_time(s, str(arg(0)))
            return _ts_of(s)
        if name == "parse_timestamp_strptime":
            try:
                dt = _dt.datetime.strptime(_as_str(target, name),
                                           str(arg(0)))
            except ValueError as e:
                raise EvalError(str(e)) from e
            return dt if dt.tzinfo \
                else dt.replace(tzinfo=_dt.timezone.utc)
        if name == "parse_timestamp_unix":
            s = _as_str(target, name)
            dt = go_parse_time(s, str(arg(0))) if node.args \
                else _ts_of(s)
            return int(dt.timestamp())
        if name in ("format_timestamp", "format_timestamp_strftime"):
            layout = str(arg(0, "2006-01-02T15:04:05.999999999Z07:00"))
            tz = arg(1)
            dt = _ts_of(target)
            if tz is not None:
                try:
                    from zoneinfo import ZoneInfo
                    dt = dt.astimezone(ZoneInfo(str(tz)))
                except KeyError as e:
                    raise EvalError(f"unknown timezone {tz!r}") from e
            if name == "format_timestamp_strftime":
                return dt.strftime(layout)
            return go_format_time(dt, layout)
        if name == "format_timestamp_unix":
            return int(_ts_of(target).timestamp())
        if name == "format_timestamp_unix_nano":
            dt = _ts_of(target)
            return int(_dt.datetime.timestamp(
                dt.replace(microsecond=0))) * 10 ** 9 \
                + dt.microsecond * 1000
        return _MISSING

    def _eval_in_part(self, node, i: int):
        """Evaluate `node` with the message context rebound to batch
        part `i` (query/functions.go from / from_all)."""
        batch = self.batch or []
        if i < 0:
            i += len(batch)
        # out-of-range reads an EMPTY part (message.go Get → NewPart),
        # not an error
        p = batch[i] if 0 <= i < len(batch) else {}
        saved = (self.doc, self.meta_in, self.content, self.error_flag,
                 self.part_index)
        self.doc = parse_doc(p.get("content"))
        self.meta_in = dict(p.get("meta") or {})
        self.content = p.get("content")
        self.error_flag = p.get("error")
        self.part_index = i
        try:
            v = self._eval(node)
            return None if v is _MISSING else v
        finally:
            (self.doc, self.meta_in, self.content, self.error_flag,
             self.part_index) = saved

    def _eval_bound(self, lam, item):
        if isinstance(lam, ast.Lambda):
            saved = self.vars.get(lam.param, _MISSING)
            self.vars[lam.param] = item
            try:
                return self._eval(lam.body)
            finally:
                if saved is _MISSING:
                    self.vars.pop(lam.param, None)
                else:
                    self.vars[lam.param] = saved
        saved_doc = self.doc
        try:
            self.doc = item
            return self._eval(lam)
        finally:
            self.doc = saved_doc

    def _run_map(self, name: str, value):
        """`.apply("name")` — run a named map with `this` bound to the
        target.  Unlike the static compiler, recursion is fine here:
        the reference interprets with a 10000-deep cap
        (mapping/executor.go:241-248), mirrored exactly."""
        if name not in self.maps:
            raise EvalError(f".apply({name!r}): map not defined")
        self._depth += 1
        if self._depth > 10000:
            self._depth -= 1
            raise EvalError("map recursion limit of 10000 exceeded")
        saved = (self.doc, self.vars, self.root_val)
        self.doc, self.vars, self.root_val = value, {}, _UNSET
        try:
            root = _UNSET
            for stmt in self.maps[name]:
                if isinstance(stmt, ast.LetAssign):
                    self.vars[stmt.name] = self.eval(stmt.value)
                    continue
                if not isinstance(stmt, ast.RootAssign):
                    raise EvalError(
                        f"map {name!r}: only root/let statements are "
                        "supported inside named maps")
                v = self._eval(stmt.value)
                if not stmt.path:
                    root = v
                else:
                    if v is _MISSING:
                        continue
                    if not isinstance(root, dict):
                        root = {}
                    _assign_path(root, stmt.path, v)
                self.root_val = root
            if root is _UNSET:
                raise EvalError(f"map {name!r} assigned nothing")
            return root
        finally:
            self.doc, self.vars, self.root_val = saved
            self._depth -= 1


def _assign_path(obj: dict, path: list, value) -> None:
    cur = obj
    for seg in path[:-1]:
        nxt = cur.get(seg)
        if not isinstance(nxt, (dict, list)):
            nxt = {}
            cur[seg] = nxt
        cur = nxt
    if value is _DELETED:
        if isinstance(cur, dict):
            cur.pop(path[-1], None)
    else:
        cur[path[-1]] = value


def serialize_value(v) -> str:
    """Document → message content, matching the reference's part
    serialization: strings are raw bytes, scalars their JSON text,
    objects/arrays compact JSON preserving key order (message/part.go)."""
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, _dt.datetime):
        return _rfc3339(v)
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (int, float)):
        return str(v)
    return _json.dumps(v, separators=(",", ":"), ensure_ascii=False,
                       default=_json_default)


def _json_default(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, _dt.datetime):
        return _rfc3339(v)
    return str(v)


class DynamicMapping:
    """Interpret a FULL mapping per-document — the fallback for
    mappings the static compiler cannot express (recursive named
    maps).  Content-doctrine only: operates on (content, meta) and
    re-serializes.  Reference: mapping/executor.go Exec loop."""

    def __init__(self, mapping: ast.Mapping):
        self.map_defs = {s.name: s.statements
                         for s in mapping.statements
                         if isinstance(s, ast.MapDef)}
        self.statements = [s for s in mapping.statements
                           if not isinstance(s, ast.MapDef)]

    def run_one(self, content, meta, error=None, batch=None,
                part_index=0):
        """-> (new_content | None when the row is deleted, new_meta)."""
        it = Interp(parse_doc(content), dict(meta or {}), content,
                    maps=self.map_defs, error=error, batch=batch,
                    part_index=part_index)
        root = _UNSET
        for stmt in self.statements:
            if isinstance(stmt, ast.LetAssign):
                it.vars[stmt.name] = it.eval(stmt.value)
                continue
            if isinstance(stmt, ast.MetaAssign):
                v = it._eval(stmt.value)
                if stmt.key is None:
                    if v is _DELETED:
                        it.meta = {}
                    elif isinstance(v, dict):
                        it.meta = {str(k): x for k, x in v.items()}
                    elif v is not _MISSING:
                        # mapping/assignment.go MetaAssignment: whole-
                        # meta assignment requires an object
                        raise EvalError(
                            "setting root meta to a non-object value "
                            f"({_type_name(v)})")
                elif v is _DELETED:
                    it.meta.pop(stmt.key, None)
                elif v is not _MISSING:
                    it.meta[stmt.key] = v
                continue
            if not isinstance(stmt, ast.RootAssign):
                raise EvalError(
                    f"statement {type(stmt).__name__} not supported in "
                    "the dynamic-document mapping fallback")
            v = it._eval(stmt.value)
            if not stmt.path:
                if v is _DELETED:
                    return None, it.meta
                if v is _MISSING:
                    continue
                root = v
            else:
                if v is _MISSING:
                    continue
                if not isinstance(root, (dict, list)):
                    root = {}
                _assign_path(root, stmt.path, v)
            it.root_val = root
        if root is _UNSET:
            return content, it.meta
        return serialize_value(root), it.meta


def uses_batch_context(mapping: ast.Mapping) -> bool:
    """True when any statement reads cross-part batch state
    (.from/.from_all/batch_index/batch_size) — the dynamic executor
    then needs whole batches co-located (groupBy batch_id)."""
    hit = False

    def walk(n):
        nonlocal hit
        if hit or n is None or isinstance(n, (str, int, float, bool)):
            return
        if isinstance(n, ast.Method) and n.name in ("from",
                                                    "from_all"):
            hit = True
            return
        if isinstance(n, ast.FuncCall) and n.name in ("batch_index",
                                                      "batch_size"):
            hit = True
            return
        for f in getattr(n, "__dataclass_fields__", {}):
            v = getattr(n, f)
            if isinstance(v, (list, tuple)):
                for x in v:
                    walk(x)
            else:
                walk(v)

    for stmt in mapping.statements:
        walk(stmt)
    return hit


class DynamicCheck:
    """A Bloblang boolean query evaluated per message (content
    doctrine) — the check form of lib/condition/bloblang.go for frames
    where the document lives in `content`.  Evaluation errors resolve
    to False (the reference logs and fails the condition)."""

    def __init__(self, node):
        self.node = node

    def run_one(self, content, meta, error=None) -> bool:
        it = Interp(parse_doc(content), dict(meta or {}), content,
                    error=error)
        try:
            return it.eval(self.node) is True
        except Exception:  # noqa: BLE001
            return False


_INTERP_RE = re.compile(r"\$\{!\s*(.*?)\s*\}")


def _legacy_function_part(src: str):
    """v0.x `${!name:arg}` function-variable forms
    (lib/util/text/function_vars.go) that aren't Bloblang queries.
    Returns a parsed query, a literal string, or None (unknown)."""
    name, _, arg = src.partition(":")
    if name == "echo":
        return ("lit", arg)
    if name == "json_field":
        return ("query", parse_query(f'json({_json.dumps(arg)})'))
    if name == "metadata":
        return ("query", parse_query(f'meta({_json.dumps(arg)})'))
    return None


def compile_template(template: str, escape_json: bool = False):
    """Pre-parse an interpolated template → callable(doc, meta,
    content) -> str.  Mirrors field.interpolate for the dynamic
    kernel.  With `escape_json`, dynamic results are string-escaped
    before substitution (BytesEscapedLegacy — embedding values inside
    a JSON document template)."""
    parts: list = []
    pos = 0
    for m in _INTERP_RE.finditer(template):
        if m.start() > pos:
            parts.append(template[pos:m.start()])
        try:
            parts.append(parse_query(m.group(1)))
        except Exception:
            legacy = _legacy_function_part(m.group(1))
            if legacy is None:
                raise
            if legacy[0] == "lit":
                # static legacy function: substituted verbatim (still
                # escaped under escape_json, matching escapeBytes)
                parts.append(("__legacy_lit__", legacy[1]))
            else:
                parts.append(legacy[1])
        pos = m.end()
    if pos < len(template):
        parts.append(template[pos:])

    def esc(s: str) -> str:
        if not escape_json:
            return s
        return _json.dumps(s, ensure_ascii=False)[1:-1]

    def render(doc, meta=None, content=None, batch=None,
               part_index=0) -> str:
        out = []
        for p in parts:
            if isinstance(p, str):
                out.append(p)
                continue
            if isinstance(p, tuple) and p[0] == "__legacy_lit__":
                out.append(esc(p[1]))
                continue
            v = Interp(doc, meta, content, batch=batch,
                       part_index=part_index).eval(p)
            if v is None:
                out.append("null")
            elif isinstance(v, bool):
                out.append("true" if v else "false")
            elif isinstance(v, float) and v.is_integer():
                out.append(esc(str(int(v))))
            elif isinstance(v, (dict, list)):
                out.append(esc(_json.dumps(v, separators=(",", ":"),
                                           sort_keys=True)))
            else:
                out.append(esc(str(v)))
        return "".join(out)

    return render
