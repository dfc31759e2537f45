"""AWK language subset: lexer, parser, tree-walking evaluator.

Reference: lib/processor/awk.go embeds the public goawk interpreter
(POSIX AWK).  This is an original pure-Python implementation of the
AWK subset that reference configs exercise: pattern-action rules with
BEGIN/END, user functions, fields ($0..$NF, assignment re-splits),
associative arrays (`in`, delete, for-in), the full expression grammar
(ternary, ||/&&, ~/!~ with ERE literals, comparison, concatenation,
arithmetic incl. ^ and %/++/--/op-assign), control flow (if/else,
while, do-while, for(;;), for-in, break/continue/next/exit/return),
print/printf and the POSIX string/arith built-ins (length, substr,
index, split, sub, gsub, match, sprintf, tolower/upper, sin..srand).

Value semantics follow POSIX "strnum": input-derived strings that look
numeric compare numerically against numbers; uninitialized values are
"" / 0.  I/O redirection, getline, pipes, and system() are out of
scope (they raise AwkError — message processors have no terminal).

Execution model per message (awk.go:700-880 contract): BEGIN rules,
then each input record against every pattern-action pair, then END
rules; `exit` skips to END.  Host functions (json_*/metadata_*/
timestamp_*, awk.go:520-628) are injected via the `funcs` table.
"""

from __future__ import annotations

import math
import re


class AwkError(ValueError):
    pass


class Strnum(str):
    """Input-derived string (POSIX "numeric string" provenance).

    Fields, FS-split values, interpreter input variables, and host
    function results carry this marker; string *constants* and
    concatenation results do not.  Comparison applies numeric
    semantics only when both operands are numbers or numeric-looking
    strnums — `"10" < "9"` stays a string comparison (true)."""
    __slots__ = ()


# ---------------------------------------------------------------- lexer

_KEYWORDS = {"BEGIN", "END", "function", "if", "else", "while", "for",
             "do", "break", "continue", "next", "exit", "delete",
             "return", "print", "printf", "in", "getline"}

_BUILTIN_FUNCS = {"length", "substr", "index", "split", "sub", "gsub",
                  "match", "sprintf", "tolower", "toupper", "sin",
                  "cos", "atan2", "exp", "log", "sqrt", "int", "rand",
                  "srand", "system"}

_TWO_CHAR = ("&&", "||", "==", "!=", "<=", ">=", "!~", "++", "--",
             "+=", "-=", "*=", "/=", "%=", "^=")


class Tok:
    __slots__ = ("kind", "val", "pos")

    def __init__(self, kind, val, pos):
        self.kind, self.val, self.pos = kind, val, pos

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


def _lex(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(src)
    # '/' starts a regex unless the previous meaningful token could
    # end an expression (name, number, string, ')', ']', '$'-field)
    def regex_ok():
        for t in reversed(toks):
            if t.kind == "nl":
                continue
            return not (t.kind in ("name", "num", "str", "ere", "funcname")
                        or (t.kind == "op" and t.val in (")", "]", "++",
                                                         "--")))
        return True

    while i < n:
        c = src[i]
        if c in " \t":
            i += 1
            continue
        if c == "\\" and i + 1 < n and src[i + 1] == "\n":
            i += 2  # line continuation
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "\n":
            toks.append(Tok("nl", "\n", i))
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r",
                                "\\": "\\", '"': '"', "/": "/",
                                "a": "\a", "b": "\b", "f": "\f",
                                "v": "\v"}.get(esc, "\\" + esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise AwkError("unterminated string literal")
            toks.append(Tok("str", "".join(buf), i))
            i = j + 1
            continue
        if c == "/" and regex_ok():
            j = i + 1
            buf = []
            while j < n and src[j] != "/":
                if src[j] == "\\" and j + 1 < n:
                    if src[j + 1] == "/":
                        buf.append("/")
                    else:
                        buf.append(src[j])
                        buf.append(src[j + 1])
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise AwkError("unterminated regex literal")
            toks.append(Tok("ere", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = re.match(r"(?:0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?"
                         r"|\.\d+(?:[eE][+-]?\d+)?)", src[i:])
            lit = m.group(0)
            toks.append(Tok("num", float(int(lit, 16)) if
                            lit[:2].lower() == "0x" else float(lit), i))
            i += len(lit)
            continue
        if c.isalpha() or c == "_":
            m = re.match(r"[A-Za-z_][A-Za-z_0-9]*", src[i:])
            name = m.group(0)
            i += len(name)
            if name in _KEYWORDS:
                toks.append(Tok("kw", name, i))
            elif i < n and src[i] == "(" and name in _BUILTIN_FUNCS:
                toks.append(Tok("funcname", name, i))
            elif i < n and src[i] == "(":
                toks.append(Tok("funcname", name, i))
            else:
                toks.append(Tok("name", name, i))
            continue
        two = src[i:i + 2]
        if two in _TWO_CHAR:
            toks.append(Tok("op", two, i))
            i += 2
            continue
        if c in "{}()[];,<>=!~?:+-*/%^$&|":
            toks.append(Tok("op", c, i))
            i += 1
            continue
        raise AwkError(f"unexpected character {c!r} at {i}")
    toks.append(Tok("eof", None, n))
    return toks


# ---------------------------------------------------------------- AST

# Nodes are plain tuples ("kind", ...) — compact and picklable for
# shipping the compiled program to executors.

class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, skip_nl=False):
        j = self.i
        if skip_nl:
            while self.toks[j].kind == "nl":
                j += 1
        return self.toks[j]

    def next(self, skip_nl=False):
        if skip_nl:
            while self.toks[self.i].kind == "nl":
                self.i += 1
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, kind, val=None, skip_nl=False):
        t = self.next(skip_nl=skip_nl)
        if t.kind != kind or (val is not None and t.val != val):
            raise AwkError(f"expected {val or kind}, got {t!r}")
        return t

    def at(self, kind, val=None, skip_nl=False):
        t = self.peek(skip_nl=skip_nl)
        return t.kind == kind and (val is None or t.val == val)

    def skip_terms(self):
        while self.at("nl") or self.at("op", ";"):
            self.next()

    # -- program
    def parse_program(self):
        items = []
        funcs = {}
        self.skip_terms()
        while not self.at("eof"):
            if self.at("kw", "function"):
                name, params, body = self.parse_function()
                funcs[name] = (params, body)
            else:
                items.append(self.parse_item())
            self.skip_terms()
        return items, funcs

    def parse_function(self):
        self.eat("kw", "function")
        t = self.next()
        if t.kind not in ("name", "funcname"):
            raise AwkError(f"bad function name {t!r}")
        name = t.val
        self.eat("op", "(")
        params = []
        while not self.at("op", ")", skip_nl=True):
            params.append(self.eat("name", skip_nl=True).val)
            if self.at("op", ",", skip_nl=True):
                self.next(skip_nl=True)
        self.eat("op", ")", skip_nl=True)
        body = self.parse_block()
        return name, params, body

    def parse_item(self):
        pattern = None
        if self.at("kw", "BEGIN"):
            self.next()
            return ("begin", self.parse_block())
        if self.at("kw", "END"):
            self.next()
            return ("end", self.parse_block())
        if not self.at("op", "{"):
            pattern = self.parse_expr()
        if self.at("op", "{"):
            return ("rule", pattern, self.parse_block())
        return ("rule", pattern, [("print", [], None)])

    def parse_block(self):
        self.eat("op", "{", skip_nl=True)
        stmts = self.parse_stmt_list("}")
        self.eat("op", "}", skip_nl=True)
        return stmts

    def parse_stmt_list(self, end_tok):
        stmts = []
        self.skip_terms()
        while not self.at("op", end_tok, skip_nl=False):
            stmts.append(self.parse_stmt())
            self.skip_terms()
        return stmts

    # -- statements
    def parse_stmt(self):
        t = self.peek()
        if t.kind == "op" and t.val == "{":
            return ("block", self.parse_block())
        if t.kind == "kw":
            kw = t.val
            if kw == "if":
                self.next()
                self.eat("op", "(")
                cond = self.parse_expr()
                self.eat("op", ")")
                then = self.parse_opt_stmt()
                els = None
                save = self.i
                self.skip_terms()
                if self.at("kw", "else"):
                    self.next()
                    self.skip_terms()
                    els = self.parse_stmt()
                else:
                    self.i = save
                return ("if", cond, then, els)
            if kw == "while":
                self.next()
                self.eat("op", "(")
                cond = self.parse_expr()
                self.eat("op", ")")
                return ("while", cond, self.parse_opt_stmt())
            if kw == "do":
                self.next()
                self.skip_terms()
                body = self.parse_stmt()
                self.skip_terms()
                self.eat("kw", "while")
                self.eat("op", "(")
                cond = self.parse_expr()
                self.eat("op", ")")
                return ("dowhile", cond, body)
            if kw == "for":
                self.next()
                self.eat("op", "(")
                # for (k in arr) — lookahead
                if (self.at("op", "(") is False and self.peek().kind
                        == "name" and self.toks[self.i + 1].kind == "kw"
                        and self.toks[self.i + 1].val == "in"):
                    var = self.next().val
                    self.next()  # in
                    arr = self.eat("name").val
                    self.eat("op", ")")
                    return ("forin", var, arr, self.parse_opt_stmt())
                init = None if self.at("op", ";") else self.parse_simple()
                self.eat("op", ";")
                cond = None if self.at("op", ";") else self.parse_expr()
                self.eat("op", ";")
                step = None if self.at("op", ")") else self.parse_simple()
                self.eat("op", ")")
                return ("for", init, cond, step, self.parse_opt_stmt())
            if kw == "break":
                self.next()
                return ("break",)
            if kw == "continue":
                self.next()
                return ("continue",)
            if kw == "next":
                self.next()
                return ("next",)
            if kw == "exit":
                self.next()
                code = None
                if not (self.at("nl") or self.at("op", ";")
                        or self.at("op", "}") or self.at("eof")):
                    code = self.parse_expr()
                return ("exit", code)
            if kw == "return":
                self.next()
                val = None
                if not (self.at("nl") or self.at("op", ";")
                        or self.at("op", "}") or self.at("eof")):
                    val = self.parse_expr()
                return ("return", val)
            if kw == "delete":
                self.next()
                name = self.eat("name").val
                if self.at("op", "["):
                    self.next()
                    idx = self.parse_expr_list("]")
                    self.eat("op", "]")
                    return ("delete", name, idx)
                return ("delete_all", name)
            if kw in ("print", "printf"):
                self.next()
                args = []
                if not (self.at("nl") or self.at("op", ";")
                        or self.at("op", "}") or self.at("eof")):
                    args.append(self.parse_expr(no_gt=True))
                    while self.at("op", ","):
                        self.next(skip_nl=False)
                        while self.at("nl"):
                            self.next()
                        args.append(self.parse_expr(no_gt=True))
                if self.at("op", ">") or self.at("op", "|"):
                    raise AwkError(
                        "print redirection/pipes unsupported: message "
                        "processors write message content, not files")
                return (t.val, args, None)
        return ("expr", self.parse_simple())

    def parse_opt_stmt(self):
        self.skip_terms()
        return self.parse_stmt()

    def parse_simple(self):
        return self.parse_expr()

    def parse_expr_list(self, end_tok):
        exprs = [self.parse_expr()]
        while self.at("op", ","):
            self.next()
            exprs.append(self.parse_expr())
        return exprs

    # -- expressions (precedence climbing)
    def parse_expr(self, no_gt=False):
        return self.parse_assign(no_gt)

    def parse_assign(self, no_gt=False):
        left = self.parse_ternary(no_gt)
        if self.at("op") and self.peek().val in ("=", "+=", "-=", "*=",
                                                 "/=", "%=", "^="):
            if left[0] not in ("var", "index", "field"):
                raise AwkError(f"cannot assign to {left[0]}")
            op = self.next().val
            right = self.parse_assign(no_gt)
            return ("assign", op, left, right)
        return left

    def parse_ternary(self, no_gt):
        cond = self.parse_or(no_gt)
        if self.at("op", "?"):
            self.next()
            a = self.parse_ternary(no_gt)
            self.eat("op", ":", skip_nl=True)
            b = self.parse_ternary(no_gt)
            return ("ternary", cond, a, b)
        return cond

    def parse_or(self, no_gt):
        left = self.parse_and(no_gt)
        while self.at("op", "||"):
            self.next()
            while self.at("nl"):
                self.next()
            left = ("or", left, self.parse_and(no_gt))
        return left

    def parse_and(self, no_gt):
        left = self.parse_in(no_gt)
        while self.at("op", "&&"):
            self.next()
            while self.at("nl"):
                self.next()
            left = ("and", left, self.parse_in(no_gt))
        return left

    def parse_in(self, no_gt):
        left = self.parse_matchop(no_gt)
        while self.at("kw", "in"):
            self.next()
            arr = self.eat("name").val
            left = ("in", [left], arr)
        return left

    def parse_matchop(self, no_gt):
        left = self.parse_rel(no_gt)
        while self.at("op", "~") or self.at("op", "!~"):
            neg = self.next().val == "!~"
            right = self.parse_rel(no_gt)
            left = ("match", left, right, neg)
        return left

    def parse_rel(self, no_gt):
        left = self.parse_concat(no_gt)
        ops = ["<", "<=", "==", "!=", ">="] + ([] if no_gt else [">"])
        if self.at("op") and self.peek().val in ops:
            op = self.next().val
            right = self.parse_concat(no_gt)
            return ("rel", op, left, right)
        return left

    _CONCAT_STARTERS_OP = ("$", "(", "!", "-", "+", "++", "--")

    def parse_concat(self, no_gt):
        left = self.parse_add()
        while True:
            t = self.peek()
            if t.kind in ("num", "str", "name", "funcname", "ere"):
                left = ("concat", left, self.parse_add())
            elif t.kind == "op" and t.val in ("$", "("):
                left = ("concat", left, self.parse_add())
            elif t.kind == "op" and t.val == "!":
                left = ("concat", left, self.parse_add())
            else:
                return left

    def parse_add(self):
        left = self.parse_mul()
        while self.at("op", "+") or self.at("op", "-"):
            op = self.next().val
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.at("op") and self.peek().val in ("*", "/", "%"):
            op = self.next().val
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("op", "!"):
            self.next()
            return ("not", self.parse_unary())
        if self.at("op", "-"):
            self.next()
            return ("neg", self.parse_unary())
        if self.at("op", "+"):
            self.next()
            return ("pos", self.parse_unary())
        return self.parse_pow()

    def parse_pow(self):
        left = self.parse_postfix()
        if self.at("op", "^"):
            self.next()
            return ("arith", "^", left, self.parse_unary())  # right assoc
        return left

    def parse_postfix(self):
        node = self.parse_primary()
        while self.at("op", "++") or self.at("op", "--"):
            if node[0] not in ("var", "index", "field"):
                break
            op = self.next().val
            node = ("postincr", op, node)
        return node

    def parse_primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return ("num", t.val)
        if t.kind == "str":
            self.next()
            return ("strlit", t.val)
        if t.kind == "ere":
            self.next()
            return ("ere", t.val)
        if t.kind == "op" and t.val == "(":
            self.next()
            e = self.parse_expr()
            self.eat("op", ")", skip_nl=True)
            return ("group", e)
        if t.kind == "op" and t.val == "$":
            self.next()
            return ("field", self.parse_primary_for_field())
        if t.kind == "op" and t.val in ("++", "--"):
            self.next()
            target = self.parse_postfix()
            if target[0] not in ("var", "index", "field"):
                raise AwkError(f"cannot {t.val} a {target[0]}")
            return ("preincr", t.val, target)
        if t.kind == "funcname":
            self.next()
            self.eat("op", "(")
            args = []
            while not self.at("op", ")", skip_nl=True):
                args.append(self.parse_expr())
                if self.at("op", ",", skip_nl=True):
                    self.next(skip_nl=True)
            self.eat("op", ")", skip_nl=True)
            return ("call", t.val, args)
        if t.kind == "name":
            self.next()
            if self.at("op", "["):
                self.next()
                idx = self.parse_expr_list("]")
                self.eat("op", "]")
                return ("index", t.val, idx)
            return ("var", t.val)
        if t.kind == "kw" and t.val == "getline":
            # Plain `getline` / `getline var` read the NEXT record of
            # the message (the reference wires message content to
            # goawk's stdin, awk.go:828-832).  File/command forms
            # have no meaning for a message processor and raise.
            self.next()
            target = None
            nt = self.peek()
            if nt.kind == "name":
                self.next()
                if self.at("op", "["):
                    self.next()
                    idx = self.parse_expr_list("]")
                    self.eat("op", "]")
                    target = ("index", nt.val, idx)
                else:
                    target = ("var", nt.val)
            elif nt.kind == "op" and nt.val == "$":
                self.next()
                target = ("field", self.parse_primary_for_field())
            if self.at("op", "<"):
                raise AwkError(
                    "getline from a file unsupported: the message is "
                    "the only input")
            return ("getline", target)
        raise AwkError(f"unexpected token {t!r} in expression")

    def parse_primary_for_field(self):
        # $ binds tighter than arithmetic: $NF-1 is ($NF)-1
        t = self.peek()
        if t.kind == "num":
            self.next()
            return ("num", t.val)
        if t.kind == "name":
            self.next()
            return ("var", t.val)
        if t.kind == "op" and t.val == "(":
            self.next()
            e = self.parse_expr()
            self.eat("op", ")", skip_nl=True)
            return ("group", e)
        if t.kind == "op" and t.val == "$":
            self.next()
            return ("field", self.parse_primary_for_field())
        raise AwkError(f"bad field reference ${t!r}")


def parse_program(src: str):
    """Compile AWK source → (items, functions) AST."""
    return _Parser(_lex(src)).parse_program()


# ------------------------------------------------------------ evaluator

class _Next(Exception):
    pass


class _Exit(Exception):
    def __init__(self, code):
        self.code = code


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


_NUMERIC_RE = re.compile(r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?"
                         r"|\.\d+([eE][+-]?\d+)?)$")

UNINIT = Strnum("")


def _to_num(v) -> float:
    if isinstance(v, float):
        return v
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    s = str(v).strip()
    m = re.match(r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)",
                 s)
    return float(m.group(0)) if m and m.group(0) not in ("+", "-") else 0.0


def _to_str(v, ofmt="%.6g") -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return ofmt % v
    return str(v)


def _truthy(v) -> bool:
    if isinstance(v, float):
        return v != 0.0
    return str(v) != ""


_POSIX_CLASSES = {
    "alpha": "a-zA-Z", "digit": "0-9", "alnum": "a-zA-Z0-9",
    "upper": "A-Z", "lower": "a-z", "space": r" \t\n\r\f\v",
    "blank": r" \t", "xdigit": "0-9A-Fa-f",
    "punct": r"!-/:-@\[-`{-~", "cntrl": r"\x00-\x1f\x7f",
    "print": r"\x20-\x7e", "graph": r"\x21-\x7e",
}


def _ere(pattern: str):
    # POSIX ERE ∩ Python re is near-total for practical patterns once
    # bracket classes ([[:digit:]] etc.) translate to ranges
    pattern = re.sub(
        r"\[:(\w+):\]",
        lambda m: _POSIX_CLASSES.get(m.group(1), m.group(0)), pattern)
    try:
        return re.compile(pattern)
    except re.error as exc:
        raise AwkError(f"bad regex /{pattern}/: {exc}") from exc


class Interp:
    """One program execution over one logical input (a message)."""

    def __init__(self, program, funcs=None, vars=None):
        self.items, self.userfuncs = program
        self.hostfuncs = dict(funcs or {})
        self.globals: dict[str, object] = {
            "FS": " ", "OFS": " ", "ORS": "\n", "RS": "\n", "NR": 0.0,
            "NF": 0.0, "FNR": 0.0, "SUBSEP": "\x1c", "RSTART": 0.0,
            "RLENGTH": -1.0, "FILENAME": "", "CONVFMT": "%.6g",
            "OFMT": "%.6g",
        }
        for k, v in (vars or {}).items():
            self.globals[k] = Strnum(v) if isinstance(v, str) else v
        self.fields: list[str] = [""]
        self.out: list[str] = []
        self.locals_stack: list[dict] = []
        self.exit_code = 0
        self._rand = __import__("random").Random(0)
        self._records: list[str] = []
        self._rec_i = 0

    # -- scoping
    def _scope_get(self, name):
        if self.locals_stack and name in self.locals_stack[-1]:
            return self.locals_stack[-1][name]
        return self.globals.get(name, UNINIT)

    def _scope_set(self, name, val):
        if self.locals_stack and name in self.locals_stack[-1]:
            self.locals_stack[-1][name] = val
        else:
            self.globals[name] = val

    def _array(self, name) -> dict:
        scope = (self.locals_stack[-1]
                 if self.locals_stack and name in self.locals_stack[-1]
                 else self.globals)
        arr = scope.get(name)
        if arr is None or not isinstance(arr, dict):
            arr = {}
            scope[name] = arr
        return arr

    # -- fields
    def set_record(self, line: str):
        self.fields = [Strnum(line)]
        fs = _to_str(self._scope_get("FS"))
        if fs == " ":
            parts = line.split()
        elif len(fs) == 1:
            parts = line.split(fs)
        else:
            parts = re.split(fs, line)
        self.fields += [Strnum(p) for p in parts]
        self.globals["NF"] = float(len(parts))

    def _rebuild_record(self):
        ofs = _to_str(self._scope_get("OFS"))
        self.fields[0] = ofs.join(self.fields[1:])

    def get_field(self, idx: int) -> str:
        if idx == 0:
            return self.fields[0]
        if 1 <= idx < len(self.fields):
            return self.fields[idx]
        return ""

    def set_field(self, idx: int, val: str):
        if idx == 0:
            self.set_record(val)
            return
        while len(self.fields) <= idx:
            self.fields.append("")
        self.fields[idx] = val
        self.globals["NF"] = max(_to_num(self.globals["NF"]),
                                 float(idx))
        self._rebuild_record()

    # -- record stream (shared with getline: one cursor, POSIX-style)
    def _next_record(self) -> str | None:
        if self._rec_i >= len(self._records):
            return None
        rec = self._records[self._rec_i]
        self._rec_i += 1
        self.globals["NR"] = _to_num(self.globals["NR"]) + 1
        self.globals["FNR"] = _to_num(self.globals["FNR"]) + 1
        return rec

    # -- program driver
    def run(self, records: list[str]) -> int:
        self._records = records
        self._rec_i = 0
        try:
            for item in self.items:
                if item[0] == "begin":
                    self.exec_stmts(item[1])
            while True:
                rec = self._next_record()
                if rec is None:
                    break
                self.set_record(rec)
                try:
                    for item in self.items:
                        if item[0] != "rule":
                            continue
                        _, pattern, body = item
                        if pattern is None or _truthy(self.eval(pattern)):
                            self.exec_stmts(body)
                except _Next:
                    continue
        except _Exit as e:
            if e.code is not None:
                self.exit_code = int(_to_num(e.code))
        except (_Break, _Continue, _Return) as e:
            raise AwkError(f"{type(e).__name__.lstrip('_').lower()} "
                           "statement outside its scope") from e
        try:
            for item in self.items:
                if item[0] == "end":
                    self.exec_stmts(item[1])
        except _Exit as e:
            if e.code is not None:
                self.exit_code = int(_to_num(e.code))
        except (_Next, _Break, _Continue, _Return) as e:
            # stray control flow in END must surface as an awk error,
            # not an internal exception escaping the interpreter
            raise AwkError(f"{type(e).__name__.lstrip('_').lower()} "
                           "statement used in END action") from e
        return self.exit_code

    def output(self) -> str:
        return "".join(self.out)

    # -- statements
    def exec_stmts(self, stmts):
        for s in stmts:
            self.exec_stmt(s)

    def exec_stmt(self, s):
        kind = s[0]
        if kind == "expr":
            self.eval(s[1])
        elif kind == "print":
            args = s[1]
            ofs = _to_str(self._scope_get("OFS"))
            ors = _to_str(self._scope_get("ORS"))
            if not args:
                self.out.append(self.get_field(0) + ors)
            else:
                self.out.append(
                    ofs.join(self._out_str(self.eval(a))
                             for a in args) + ors)
        elif kind == "printf":
            if not s[1]:
                raise AwkError("printf needs a format")
            fmt = _to_str(self.eval(s[1][0]))
            vals = [self.eval(a) for a in s[1][1:]]
            self.out.append(_sprintf(fmt, vals))
        elif kind == "block":
            self.exec_stmts(s[1])
        elif kind == "if":
            if _truthy(self.eval(s[1])):
                self.exec_stmt(s[2])
            elif s[3] is not None:
                self.exec_stmt(s[3])
        elif kind == "while":
            while _truthy(self.eval(s[1])):
                try:
                    self.exec_stmt(s[2])
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "dowhile":
            while True:
                try:
                    self.exec_stmt(s[2])
                except _Break:
                    break
                except _Continue:
                    pass
                if not _truthy(self.eval(s[1])):
                    break
        elif kind == "for":
            if s[1] is not None:
                self.eval(s[1])
            while s[2] is None or _truthy(self.eval(s[2])):
                try:
                    self.exec_stmt(s[4])
                except _Break:
                    break
                except _Continue:
                    pass
                if s[3] is not None:
                    self.eval(s[3])
        elif kind == "forin":
            arr = self._array(s[2])
            for key in list(arr.keys()):
                self._scope_set(s[1], key)
                try:
                    self.exec_stmt(s[3])
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "next":
            raise _Next()
        elif kind == "exit":
            raise _Exit(None if s[1] is None else self.eval(s[1]))
        elif kind == "return":
            raise _Return(UNINIT if s[1] is None else self.eval(s[1]))
        elif kind == "delete":
            arr = self._array(s[1])
            arr.pop(self._subscript(s[2]), None)
        elif kind == "delete_all":
            self._array(s[1]).clear()
        else:  # pragma: no cover
            raise AwkError(f"unknown statement {kind!r}")

    def _out_str(self, v):
        if isinstance(v, float):
            if not math.isfinite(v):
                return _to_str(v)
            if v == int(v) and abs(v) < 1e16:
                return str(int(v))
            return _to_str(self._scope_get("OFMT")) % v
        return str(v)

    def _subscript(self, idx_exprs):
        sub = _to_str(self._scope_get("SUBSEP"))
        return sub.join(_to_str(self.eval(e)) for e in idx_exprs)

    # -- expressions
    def eval(self, node):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "strlit":
            return node[1]
        if kind == "ere":
            # bare regex → match against $0 (1/0)
            return 1.0 if _ere(node[1]).search(self.get_field(0)) else 0.0
        if kind == "group":
            return self.eval(node[1])
        if kind == "getline":
            rec = self._next_record()
            if rec is None:
                return 0.0
            target = node[1]
            if target is None:
                self.set_record(rec)
            elif target[0] == "var":
                self._scope_set(target[1], Strnum(rec))
            elif target[0] == "index":
                arr = self._array(target[1])
                key = self._subscript(target[2])
                arr[key] = Strnum(rec)
            elif target[0] == "field":
                self.set_field(int(_to_num(self.eval(target[1]))),
                               Strnum(rec))
            return 1.0
        if kind == "var":
            v = self._scope_get(node[1])
            if isinstance(v, dict):
                raise AwkError(f"array {node[1]} used as scalar")
            return v
        if kind == "index":
            return self._array(node[1]).get(self._subscript(node[2]),
                                            UNINIT)
        if kind == "field":
            return self.get_field(int(_to_num(self.eval(node[1]))))
        if kind == "assign":
            return self._do_assign(node[1], node[2], node[3])
        if kind == "ternary":
            return (self.eval(node[2]) if _truthy(self.eval(node[1]))
                    else self.eval(node[3]))
        if kind == "or":
            return 1.0 if (_truthy(self.eval(node[1]))
                           or _truthy(self.eval(node[2]))) else 0.0
        if kind == "and":
            return 1.0 if (_truthy(self.eval(node[1]))
                           and _truthy(self.eval(node[2]))) else 0.0
        if kind == "in":
            return 1.0 if (self._subscript(node[1])
                           in self._array(node[2])) else 0.0
        if kind == "match":
            target = _to_str(self.eval(node[1]))
            pat = (node[2][1] if node[2][0] == "ere"
                   else _to_str(self.eval(node[2])))
            hit = _ere(pat).search(target) is not None
            return 1.0 if hit != node[3] else 0.0
        if kind == "rel":
            return self._compare(node[1], self.eval(node[2]),
                                 self.eval(node[3]))
        if kind == "concat":
            return (self._str_for_concat(self.eval(node[1]))
                    + self._str_for_concat(self.eval(node[2])))
        if kind == "arith":
            a = _to_num(self.eval(node[2]))
            b = _to_num(self.eval(node[3]))
            op = node[1]
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                if b == 0:
                    raise AwkError("division by zero")
                return a / b
            if op == "%":
                if b == 0:
                    raise AwkError("division by zero in %")
                return math.fmod(a, b)
            return a ** b
        if kind == "not":
            return 0.0 if _truthy(self.eval(node[1])) else 1.0
        if kind == "neg":
            return -_to_num(self.eval(node[1]))
        if kind == "pos":
            return _to_num(self.eval(node[1]))
        if kind in ("preincr", "postincr"):
            target = node[2]
            old = _to_num(self._lvalue_get(target))
            new = old + (1.0 if node[1] == "++" else -1.0)
            self._lvalue_set(target, new)
            return new if kind == "preincr" else old
        if kind == "call":
            return self.call(node[1], node[2])
        raise AwkError(f"unknown expression {kind!r}")  # pragma: no cover

    def _str_for_concat(self, v):
        if isinstance(v, float):
            if not math.isfinite(v):
                return _to_str(v)
            conv = _to_str(self._scope_get("CONVFMT"))
            if v == int(v) and abs(v) < 1e16:
                return str(int(v))
            return conv % v
        return str(v)

    @staticmethod
    def _numericish(v) -> bool:
        # POSIX: numbers always; strnums when numeric-looking or
        # uninitialized; plain string constants never
        if isinstance(v, float):
            return True
        if isinstance(v, Strnum):
            s = str.strip(v)
            return s == "" or _NUMERIC_RE.match(s) is not None
        return False

    def _compare(self, op, a, b):
        # strnum semantics: numeric compare only when both operands
        # are numeric or input-derived numeric strings — a string
        # *constant* forces string comparison ("10" < "9" is true)
        if self._numericish(a) and self._numericish(b):
            x, y = _to_num(a), _to_num(b)
        else:
            x, y = _to_str(a), _to_str(b)
        hit = {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y,
               "==": x == y, "!=": x != y}[op]
        return 1.0 if hit else 0.0

    def _lvalue_get(self, node):
        if node[0] == "var":
            return self._scope_get(node[1])
        if node[0] == "index":
            return self._array(node[1]).get(self._subscript(node[2]),
                                            UNINIT)
        if node[0] == "field":
            return self.get_field(int(_to_num(self.eval(node[1]))))
        raise AwkError(f"bad lvalue {node[0]}")

    def _lvalue_set(self, node, val):
        if node[0] == "var":
            self._scope_set(node[1], val)
        elif node[0] == "index":
            self._array(node[1])[self._subscript(node[2])] = val
        elif node[0] == "field":
            self.set_field(int(_to_num(self.eval(node[1]))),
                           _to_str(val))
        else:
            raise AwkError(f"bad lvalue {node[0]}")

    def _do_assign(self, op, target, value_expr):
        val = self.eval(value_expr)
        if op != "=":
            old = _to_num(self._lvalue_get(target))
            num = _to_num(val)
            if op == "+=":
                val = old + num
            elif op == "-=":
                val = old - num
            elif op == "*=":
                val = old * num
            elif op == "/=":
                if num == 0:
                    raise AwkError("division by zero")
                val = old / num
            elif op == "%=":
                if num == 0:
                    raise AwkError("division by zero in %=")
                val = math.fmod(old, num)
            elif op == "^=":
                val = old ** num
        self._lvalue_set(target, val)
        return val

    # -- function calls
    def call(self, name, arg_exprs):
        if name in self.userfuncs:
            params, body = self.userfuncs[name]
            frame = {}
            for i, p in enumerate(params):
                if i < len(arg_exprs):
                    ae = arg_exprs[i]
                    if (ae[0] == "var" and
                            isinstance(self._scope_get(ae[1]), dict)):
                        frame[p] = self._array(ae[1])  # arrays by ref
                    else:
                        frame[p] = self.eval(ae)
                else:
                    frame[p] = UNINIT
            self.locals_stack.append(frame)
            try:
                self.exec_stmts(body)
                return UNINIT
            except _Return as r:
                return r.value
            finally:
                self.locals_stack.pop()
        if name in self.hostfuncs:
            args = [self.eval(a) for a in arg_exprs]
            res = self.hostfuncs[name](*args)
            # host functions read message data → strnum provenance
            return Strnum(res) if type(res) is str else res
        return self._builtin(name, arg_exprs)

    def _builtin(self, name, arg_exprs):
        ev = lambda i: self.eval(arg_exprs[i])  # noqa: E731
        s = lambda i: _to_str(ev(i))  # noqa: E731
        n = lambda i: _to_num(ev(i))  # noqa: E731
        argc = len(arg_exprs)
        if name == "length":
            if argc == 0:
                return float(len(self.get_field(0)))
            v = ev(0)
            if isinstance(v, dict):
                return float(len(v))
            if arg_exprs[0][0] == "var":
                maybe = self._scope_get(arg_exprs[0][1])
                if isinstance(maybe, dict):
                    return float(len(maybe))
            return float(len(_to_str(v)))
        if name == "substr":
            st = s(0)
            m = int(n(1))
            ln = int(n(2)) if argc > 2 else len(st) - m + 1
            start = max(m, 1)
            end = m + max(ln, 0)
            return st[start - 1:max(end - 1, start - 1)]
        if name == "index":
            return float(s(0).find(s(1)) + 1)
        if name == "split":
            st = s(0)
            if arg_exprs[1][0] != "var":
                raise AwkError("split target must be an array name")
            arr = self._array(arg_exprs[1][1])
            arr.clear()
            fs = s(2) if argc > 2 else _to_str(self._scope_get("FS"))
            if st == "":
                parts = []
            elif fs == " ":
                parts = st.split()
            elif len(fs) == 1:
                parts = st.split(fs)
            else:
                parts = re.split(fs, st)
            for i, p in enumerate(parts):
                arr[str(i + 1)] = Strnum(p)
            return float(len(parts))
        if name in ("sub", "gsub"):
            pat = (arg_exprs[0][1] if arg_exprs[0][0] == "ere"
                   else _to_str(self.eval(arg_exprs[0])))
            repl = s(1)
            target = arg_exprs[2] if argc > 2 else ("field", ("num", 0.0))
            old = _to_str(self._lvalue_get(target))
            # & → matched text; \& → literal &
            def _repl(mo):
                outp = []
                i = 0
                while i < len(repl):
                    c = repl[i]
                    if c == "\\" and i + 1 < len(repl) and \
                            repl[i + 1] in ("&", "\\"):
                        outp.append(repl[i + 1])
                        i += 2
                    elif c == "&":
                        outp.append(mo.group(0))
                        i += 1
                    else:
                        outp.append(c)
                        i += 1
                return "".join(outp)
            new, cnt = _ere(pat).subn(_repl, old,
                                      count=0 if name == "gsub" else 1)
            if cnt:
                self._lvalue_set(target, new)
            return float(cnt)
        if name == "match":
            st = s(0)
            pat = (arg_exprs[1][1] if arg_exprs[1][0] == "ere"
                   else _to_str(self.eval(arg_exprs[1])))
            mo = _ere(pat).search(st)
            if mo:
                self.globals["RSTART"] = float(mo.start() + 1)
                self.globals["RLENGTH"] = float(mo.end() - mo.start())
                return float(mo.start() + 1)
            self.globals["RSTART"] = 0.0
            self.globals["RLENGTH"] = -1.0
            return 0.0
        if name == "sprintf":
            return _sprintf(s(0), [ev(i) for i in range(1, argc)])
        if name == "tolower":
            return s(0).lower()
        if name == "toupper":
            return s(0).upper()
        if name == "sin":
            return math.sin(n(0))
        if name == "cos":
            return math.cos(n(0))
        if name == "atan2":
            return math.atan2(n(0), n(1))
        if name == "exp":
            try:
                return math.exp(n(0))
            except OverflowError:
                return float("inf")
        if name == "log":
            # goawk/Go math: log(0) = -inf, log(<0) = NaN (not a raise)
            v = n(0)
            if v == 0:
                return float("-inf")
            return math.log(v) if v > 0 else float("nan")
        if name == "sqrt":
            v = n(0)
            return math.sqrt(v) if v >= 0 else float("nan")
        if name == "int":
            v = n(0)
            return v if not math.isfinite(v) else float(int(v))
        if name == "rand":
            return self._rand.random()
        if name == "srand":
            self._rand.seed(n(0) if argc else 0)
            return 0.0
        if name == "system":
            raise AwkError("system() unsupported: use the subprocess "
                           "processor for external commands")
        raise AwkError(f"calling undefined function {name}")


def _sprintf(fmt: str, vals: list) -> str:
    """AWK printf: %c takes a number (chr) or a string's first char;
    %i is an alias of %d; numeric conversions coerce strings."""
    out = []
    vi = 0
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        m = re.match(r"%([-+ #0]*)(\*|\d+)?(?:\.(\*|\d+))?([diouxXeEfgGcs%])",
                     fmt[i:])
        if not m:
            raise AwkError(f"bad printf format near {fmt[i:i+8]!r}")
        flags, width, prec, conv = m.groups()
        i += m.end()
        if conv == "%":
            out.append("%")
            continue
        if width == "*":
            width = str(int(_to_num(vals[vi])))
            vi += 1
        if prec == "*":
            prec = str(int(_to_num(vals[vi])))
            vi += 1
        val = vals[vi] if vi < len(vals) else UNINIT
        vi += 1
        spec = "%" + flags + (width or "") + (("." + prec)
                                              if prec is not None else "")
        if conv in "di":
            out.append((spec + "d") % int(_to_num(val)))
        elif conv in "ouxX":
            out.append((spec + conv) % int(_to_num(val)))
        elif conv in "eEfgG":
            out.append((spec + conv) % _to_num(val))
        elif conv == "c":
            if isinstance(val, float):
                out.append((spec + "s") % chr(int(val)))
            else:
                sv = str(val)
                out.append((spec + "s") % (sv[0] if sv else ""))
        else:  # s
            out.append((spec + "s") % _to_str(val))
    return "".join(out)
