"""Extract the reference's Go-constructed Bloblang query test tables
(internal/bloblang/query/methods_test.go TestMethods and
functions_test.go TestFunctions) into runnable vectors.

Each Go case builds a Function AST with regular constructor helpers
(literalFn/jsonFn/function/method/methods/arithmetic/NewFieldFunction);
this tool parses those constructor calls and renders the equivalent
Bloblang source expression, so the cases replay VERBATIM through the
engine's own parser/compiler:

  {name, file, line, expr, vars: {..}|null, value: <lit>|absent,
   messages: [{content, meta}], index, output: <lit>|absent,
   output_bytes: bool, err: str|absent}

Usage: python tools/extract_ref_method_tests.py \
           > tests/golden/ref_method_cases.json
"""

from __future__ import annotations

import json
import re
import sys

QDIR = "/root/reference/internal/bloblang/query/"
SOURCES = [QDIR + "methods_test.go", QDIR + "functions_test.go"]

LINEBREAK_STR = "foo\nbar\nbaz"

ARITH_OPS = {
    "ArithmeticAdd": "+", "ArithmeticSub": "-", "ArithmeticMul": "*",
    "ArithmeticDiv": "/", "ArithmeticMod": "%", "ArithmeticEq": "==",
    "ArithmeticNeq": "!=", "ArithmeticGt": ">", "ArithmeticLt": "<",
    "ArithmeticGte": ">=", "ArithmeticLte": "<=",
    "ArithmeticAnd": "&&", "ArithmeticOr": "||",
    "ArithmeticPipe": "|",
}


class P:
    """Tiny recursive-descent reader over the Go case body."""

    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def ws(self):
        while self.i < len(self.t):
            c = self.t[self.i]
            if c in " \t\n,":
                self.i += 1
            elif self.t.startswith("//", self.i):
                self.i = self.t.index("\n", self.i)
            elif self.t.startswith("/*", self.i):
                self.i = self.t.index("*/", self.i) + 2
            else:
                break

    def peek(self, s: str) -> bool:
        self.ws()
        return self.t.startswith(s, self.i)

    def eat(self, s: str):
        self.ws()
        if not self.t.startswith(s, self.i):
            raise ValueError(
                f"expected {s!r} at ...{self.t[self.i:self.i+60]!r}")
        self.i += len(s)

    def go_string(self) -> str:
        self.ws()
        t, i = self.t, self.i
        if t[i] == "`":
            j = t.index("`", i + 1)
            self.i = j + 1
            return t[i + 1:j]
        if t[i] != '"':
            raise ValueError(f"not a string at {t[i:i+40]!r}")
        out, j = [], i + 1
        while t[j] != '"':
            if t[j] == "\\":
                nxt = t[j + 1]
                if nxt == "u":
                    out.append(chr(int(t[j + 2:j + 6], 16)))
                    j += 6
                    continue
                if nxt == "x":
                    out.append(chr(int(t[j + 2:j + 4], 16)))
                    j += 4
                    continue
                mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                          "\\": "\\", "'": "'", "0": "\0",
                          "a": "\a", "b": "\b", "f": "\f",
                          "v": "\v"}.get(nxt)
                if mapped is None:
                    raise ValueError(f"escape \\{nxt}")
                out.append(mapped)
                j += 2
            else:
                out.append(t[j])
                j += 1
        self.i = j + 1
        return "".join(out)

    # ---- Go literal values (plain data, no Function constructors) ----

    def go_value(self):
        self.ws()
        t, i = self.t, self.i
        if t[i] in "`\"":
            return self.go_string()
        if t.startswith("[]byte(", i):
            self.i = i + len("[]byte(")
            v = self.go_value()
            self.eat(")")
            return {"__bytes__": v if isinstance(v, str) else str(v)}
        for pre in ("[]interface{}{", "[]string{"):
            if t.startswith(pre, i):
                self.i = i + len(pre)
                out = []
                while not self.peek("}"):
                    out.append(self.go_value())
                self.eat("}")
                return out
        for pre in ("map[string]interface{}{", "map[string]string{"):
            if not t.startswith(pre, i):
                continue
            self.i = i + len(pre)
            out = {}
            while not self.peek("}"):
                k = self.go_string()
                self.eat(":")
                out[k] = self.go_value()
            self.eat("}")
            return out
        if t.startswith("jn(", i):
            self.i = i + 3
            v = self.go_value()
            self.eat(")")
            return int(v)
        for pre, conv in (("int64(", int), ("int32(", int), ("int(", int),
                          ("uint64(", int), ("float64(", float),
                          ("float32(", float), ("json.Number(", str)):
            if t.startswith(pre, i):
                self.i = i + len(pre)
                v = self.go_value()
                self.eat(")")
                return conv(v)
        if t.startswith("[]struct{}{}", i):
            self.i = i + len("[]struct{}{}")
            return []
        if t.startswith("struct{}{}", i):
            self.i = i + len("struct{}{}")
            return {}
        if t.startswith("linebreakStr", i):
            self.i = i + len("linebreakStr")
            return LINEBREAK_STR
        if t.startswith("true", i):
            self.i = i + 4
            return True
        if t.startswith("false", i):
            self.i = i + 5
            return False
        if t.startswith("nil", i):
            self.i = i + 3
            return None
        m = re.match(r"-?\d+\.\d+(e-?\d+)?|-?\d+e-?\d+", t[i:])
        if m:
            self.i = i + m.end()
            return float(m.group(0))
        m = re.match(r"-?\d+", t[i:])
        if m:
            self.i = i + m.end()
            return int(m.group(0))
        raise ValueError(f"go_value at {t[i:i+60]!r}")

    # ---- Function-AST constructors → bloblang expression text ----

    def expr(self) -> str:
        self.ws()
        t, i = self.t, self.i
        for alias in ("literalFn(", "jsonFn("):
            if t.startswith(alias, i):
                self.i = i + len(alias)
                if alias == "jsonFn(":
                    v = json.loads(self.go_string())
                else:
                    v = self.go_value()
                self.eat(")")
                return _blobl_lit(v)
        for alias in ("function(", "mustFunc("):
            if t.startswith(alias, i):
                self.i = i + len(alias)
                name = self.go_string()
                args = []
                while not self.peek(")"):
                    args.append(self.arg())
                self.eat(")")
                return f"{name}({', '.join(args)})"
        for alias in ("methods(", ):
            if t.startswith(alias, i):
                self.i = i + len(alias)
                base = self.expr()
                while not self.peek(")"):
                    self.eat("method(")
                    name = self.go_string()
                    args = []
                    while not self.peek(")"):
                        args.append(self.arg())
                    self.eat(")")
                    base = f"{base}.{name}({', '.join(args)})"
                self.eat(")")
                return base
        if t.startswith("mustMethod(", i):
            self.i = i + len("mustMethod(")
            base = self.expr()
            name = self.go_string()
            args = []
            while not self.peek(")"):
                args.append(self.arg())
            self.eat(")")
            return f"{base}.{name}({', '.join(args)})"
        if t.startswith("arithmetic(", i):
            self.i = i + len("arithmetic(")
            left = self.expr()
            right = self.expr()
            self.ws()
            m = re.match(r"Arithmetic[A-Za-z]+", t[self.i:])
            if not m:
                raise ValueError(f"op at {t[self.i:self.i+40]!r}")
            self.i += m.end()
            self.eat(")")
            return f"({left} {ARITH_OPS[m.group(0)]} {right})"
        if t.startswith("NewFieldFunction(", i):
            self.i = i + len("NewFieldFunction(")
            path = self.go_string()
            self.eat(")")
            return "this" if not path else f"this.{path}"
        if t.startswith("NewLiteralFunction(", i):
            self.i = i + len("NewLiteralFunction(")
            self.go_string()  # label, always ""
            v = self.go_value()
            self.eat(")")
            return _blobl_lit(v)
        raise ValueError(f"expr at {t[i:i+60]!r}")

    def arg(self) -> str:
        """A method/function argument: either a nested Function
        constructor (query arg) or a plain Go literal."""
        self.ws()
        t, i = self.t, self.i
        if re.match(r"(methods|mustMethod|literalFn|jsonFn|function|"
                    r"mustFunc|arithmetic|NewFieldFunction|"
                    r"NewLiteralFunction)\(", t[i:]):
            return self.expr()
        return _blobl_lit(self.go_value())


def _blobl_lit(v) -> str:
    """Render a Python value as Bloblang literal source (JSON is a
    subset of Bloblang literal syntax)."""
    if isinstance(v, dict) and set(v) == {"__bytes__"}:
        return json.dumps(v["__bytes__"]) + ".bytes()"
    return json.dumps(v)


def _block_end(text: str, i: int) -> int:
    depth = 0
    while i < len(text):
        c = text[i]
        if c == "`":
            i = text.index("`", i + 1) + 1
            continue
        if c == '"':
            j = i + 1
            while text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            i = j + 1
            continue
        if text.startswith("//", i):
            i = text.index("\n", i)
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def _parse_value_iife(blk: str):
    """value: func() *interface{} { var s interface{} = X; return &s }()
    — the `= X` part is absent for a nil value."""
    m = re.search(r"var\s+\w+\s+interface\{\}\s*=\s*", blk)
    if not m:
        if re.search(r"var\s+\w+\s+interface\{\}\s*[\n;]", blk):
            return None
        raise ValueError(f"value IIFE shape: {blk[:80]!r}")
    p = P(blk)
    p.i = m.end()
    return p.go_value()


def _parse_messages(seg: str):
    """[]easyMsg{{content: ..., meta: ...}, ...} body (inside outer {})."""
    out = []
    p = P(seg)
    p.eat("{")
    while not p.peek("}"):
        p.eat("{")
        msg = {"content": "", "meta": {}}
        while not p.peek("}"):
            if p.peek("content:"):
                p.eat("content:")
                msg["content"] = p.go_string()
            elif p.peek("meta:"):
                p.eat("meta:")
                msg["meta"] = p.go_value()
            else:
                raise ValueError(f"easyMsg field at {p.t[p.i:p.i+40]!r}")
        p.eat("}")
        out.append(msg)
    return out


def _strip_comments(text: str) -> str:
    """Blank out // and /* */ comments (string-aware, newline-
    preserving) so commented-out reference cases are not extracted."""
    out, i = [], 0
    while i < len(text):
        c = text[i]
        if c == "`":
            j = text.index("`", i + 1) + 1
            out.append(text[i:j])
            i = j
        elif c == '"':
            j = i + 1
            while text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            j += 1
            out.append(text[i:j])
            i = j
        elif text.startswith("//", i):
            j = text.index("\n", i)
            out.append(" " * (j - i))
            i = j
        elif text.startswith("/*", i):
            j = text.index("*/", i) + 2
            out.append("".join(ch if ch == "\n" else " "
                               for ch in text[i:j]))
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def extract_file(path: str, test_fn: str) -> list[dict]:
    src = _strip_comments(open(path).read())
    fn = src[src.index(f"func {test_fn}"):]
    table = fn[fn.index("tests := map[string]struct {"):]
    start = table.index("}{") + 1
    end = _block_end(table, start)
    body = table[start + 1:end - 1]
    line0 = (src[:src.index(f"func {test_fn}")].count("\n")
             + fn[:fn.index("tests := map")].count("\n")
             + table[:start].count("\n") + 1)

    out = []
    i = 0
    pat = re.compile(r'"((?:[^"\\]|\\.)*)":\s*\{')
    while True:
        m = pat.search(body, i)
        if not m:
            break
        name = m.group(1)
        blk_start = m.end() - 1
        blk_end = _block_end(body, blk_start)
        blk = body[blk_start + 1:blk_end - 1]
        i = blk_end
        case = {"name": name, "file": path.rsplit("/", 1)[-1],
                "line": line0 + body[:m.start()].count("\n") + 1}
        try:
            mm = re.search(r"input:\s*", blk)
            p = P(blk)
            p.i = mm.end()
            case["expr"] = p.expr()

            mo = re.search(r"\boutput:\s*", blk)
            if mo:
                p = P(blk)
                p.i = mo.end()
                v = p.go_value()
                if isinstance(v, dict) and set(v) == {"__bytes__"}:
                    case["output"] = v["__bytes__"]
                    case["output_bytes"] = True
                else:
                    case["output"] = v
            me = re.search(r"\berr:\s*", blk)
            if me:
                p = P(blk)
                p.i = me.end()
                case["err"] = p.go_string()

            mv = re.search(r"\bvalue:\s*", blk)
            if mv:
                seg = blk[mv.end():]
                case["value"] = _parse_value_iife(seg[:_go_stmt_end(seg)])
            mvv = re.search(r"\bvars:\s*map\[string\]interface\{\}", blk)
            if mvv:
                p = P(blk)
                p.i = blk.index("map[string]interface{}", mvv.start())
                case["vars"] = p.go_value()
            mi = re.search(r"\bindex:\s*(\d+)", blk)
            case["index"] = int(mi.group(1)) if mi else 0
            mmsg = re.search(r"messages:\s*\[\]easyMsg", blk)
            if mmsg:
                seg = blk[blk.index("{", mmsg.end()):]
                seg = seg[:_block_end(seg, 0)]
                case["messages"] = _parse_messages(seg)
            else:
                case["messages"] = []
        except Exception as e:  # noqa: BLE001
            case["extract_error"] = f"{type(e).__name__}: {e}"
        out.append(case)
    return out


def _go_stmt_end(seg: str) -> int:
    """End of a value: IIFE — through the `}()` closer."""
    j = seg.index("{")
    k = _block_end(seg, j)
    return seg.index(")", k) + 1


def main() -> int:
    vectors = []
    vectors += extract_file(SOURCES[0], "TestMethods")
    vectors += extract_file(SOURCES[1], "TestFunctions")
    bad = [v for v in vectors if "extract_error" in v]
    json.dump(vectors, sys.stdout, indent=1)
    sys.stdout.write("\n")
    print(f"{len(vectors)} vectors, {len(bad)} extract errors",
          file=sys.stderr)
    for v in bad:
        print(f"  {v['name']}: {v['extract_error']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
