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

import json as _json
import math
import re

from benthos_spark.bloblang import ast
from benthos_spark.bloblang.parser import parse_query


class EvalError(ValueError):
    pass


_MISSING = object()
_DELETED = object()   # deleted() sentinel — removes keys/elements/rows
_UNSET = object()     # mapping root before any assignment


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
    if isinstance(v, list):
        return "array"
    return "object"


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
    ln, rn = _num(left), _num(right)
    if op == "+":
        if isinstance(left, str) or isinstance(right, str):
            # string concat wins when either side is a string literal
            if isinstance(left, str) and isinstance(right, str):
                return left + right
        return ln + rn
    if op == "-":
        return ln - rn
    if op == "*":
        return ln * rn
    if op == "/":
        return ln / rn
    if op == "%":
        return ln % rn
    raise EvalError(f"op {op}")


class Interp:
    """Evaluate query ASTs against one document (+ metadata)."""

    def __init__(self, doc, meta=None, content=None, maps=None):
        self.doc = doc
        self.meta = meta or {}
        self.content = content
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
            if node.path:
                return _dig(self.doc, node.path)
            # bare `this` with no parseable document → nil (the
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
            if args:
                return _dig(doc, str(args[0]).split("."))
            return doc
        if name in ("meta", "metadata", "root_meta"):
            if args:
                key = str(args[0])
                if key not in self.meta:
                    # functions.go meta: missing key is a runtime
                    # error (recover with .catch()/.or())
                    raise EvalError(
                        f"metadata value {key!r} not found")
                return self.meta[key]
            return dict(self.meta)
        if name == "content":
            return self.content if self.content is not None \
                else _json.dumps(self.doc, separators=(",", ":"),
                                 sort_keys=True)
        if name == "env":
            import os
            return os.environ.get(str(args[0]), "")
        if name == "error":
            return None
        if name == "errored":
            return False
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
            return t if t is not _MISSING and t is not None else arg(0)
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
            if not isinstance(target, str):
                raise EvalError(
                    f"expected string value, got {_type_name(target)}")
            return target.upper()
        if name == "lowercase":
            if not isinstance(target, str):
                raise EvalError(
                    f"expected string value, got {_type_name(target)}")
            return target.lower()
        if name == "capitalize":
            return str(target).capitalize()
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
        if name == "floor":
            return math.floor(_num(target))
        if name == "ceil":
            return math.ceil(_num(target))
        if name == "round":
            return round(_num(target))
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
            return sorted(target)
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
        raise EvalError(f".{name}() not interpretable "
                        "(dynamic-document subset)")

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
                       default=str)


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

    def run_one(self, content, meta):
        """-> (new_content | None when the row is deleted, new_meta)."""
        doc = _MISSING
        if content not in (None, ""):
            try:
                doc = _json.loads(content)
            except ValueError:
                doc = _MISSING
        it = Interp(doc, dict(meta or {}), content, maps=self.map_defs)
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


_INTERP_RE = re.compile(r"\$\{!\s*(.*?)\s*\}")


def compile_template(template: str):
    """Pre-parse an interpolated template → callable(doc, meta,
    content) -> str.  Mirrors field.interpolate for the dynamic
    kernel."""
    parts: list = []
    pos = 0
    for m in _INTERP_RE.finditer(template):
        if m.start() > pos:
            parts.append(template[pos:m.start()])
        parts.append(parse_query(m.group(1)))
        pos = m.end()
    if pos < len(template):
        parts.append(template[pos:])

    def render(doc, meta=None, content=None) -> str:
        out = []
        for p in parts:
            if isinstance(p, str):
                out.append(p)
                continue
            v = Interp(doc, meta, content).eval(p)
            if v is None:
                out.append("null")
            elif isinstance(v, bool):
                out.append("true" if v else "false")
            elif isinstance(v, float) and v.is_integer():
                out.append(str(int(v)))
            elif isinstance(v, (dict, list)):
                out.append(_json.dumps(v, separators=(",", ":"),
                                       sort_keys=True))
            else:
                out.append(str(v))
        return "".join(out)

    return render
