"""Bloblang parser: tokenizer + recursive descent.

Reference grammar: internal/bloblang/parser/{mapping_parser.go:51-65,
query_parser.go, query_arithmetic_parser.go (precedence climbing),
query_expression_parser.go (if/match), query_literal_parser.go,
query_function_parser.go (functions, methods, dot chains)}.  The
reference uses hand-rolled parser combinators (parser/combinators.go);
this is an equivalent hand-rolled recursive-descent parser producing
the AST in bloblang/ast.py.

Supported surface (v1): root/meta/let assignments, literals, arrays,
objects, `this`/`root`/`$var`/relative paths, function calls, method
chains, field access, arithmetic/comparison/boolean/coalesce operators,
unary !/-, if and match expressions, comments, quoted path segments.
Named maps (`map x {}`) and `import` are deliberately deferred.
"""

from __future__ import annotations

import re

from benthos_spark.bloblang import ast


class BloblangParseError(ValueError):
    def __init__(self, msg: str, line: int, col: int):
        super().__init__(f"line {line}:{col}: {msg}")
        self.line = line
        self.col = col


_TOKEN_RE = re.compile(r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>\#[^\n]*)
  | (?P<newline>\n)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<tstring>"{3}(?:[^"]|"(?!"{2}))*"{3})
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|>=|<=|&&|\|\||=>|->|[-+*/%=<>!|.,:()\[\]{}_])
""", re.VERBOSE)

_KEYWORDS = {"root", "meta", "let", "if", "else", "match", "true", "false",
             "null", "this", "not_used_map", "import"}


class _Tok:
    __slots__ = ("kind", "text", "line", "col")

    def __init__(self, kind: str, text: str, line: int, col: int):
        self.kind = kind
        self.text = text
        self.line = line
        self.col = col

    def __repr__(self):  # pragma: no cover
        return f"Tok({self.kind},{self.text!r})"


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    line, col, i = 1, 1, 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise BloblangParseError(f"unexpected character {src[i]!r}", line, col)
        kind = m.lastgroup
        text = m.group()
        if kind == "newline":
            toks.append(_Tok("NEWLINE", "\n", line, col))
            line += 1
            col = 1
        else:
            if kind == "tstring":
                # triple-quoted raw string (query_parser.go tripleQuote):
                # surfaces as a STRING token; may span lines
                toks.append(_Tok("STRING", text, line, col))
                nl = text.count("\n")
                if nl:
                    line += nl
                    col = len(text) - text.rfind("\n")
                else:
                    col += len(text)
            else:
                if kind not in ("ws", "comment"):
                    toks.append(_Tok(kind.upper(), text, line, col))
                col += len(text)
        i = m.end()
    toks.append(_Tok("EOF", "", line, col))
    return toks


def _rebase_coalesce(target, inner):
    """`x.(a | b)`: rebase each coalesce alternative onto the target
    path (`x.a | x.b`); non-path operands stay as written."""
    from benthos_spark.bloblang import ast as _ast
    if isinstance(inner, _ast.Binary) and inner.op == "|":
        return _ast.Binary("|", _rebase_coalesce(target, inner.left),
                           _rebase_coalesce(target, inner.right))
    if isinstance(inner, _ast.Context):
        node = target
        for seg in inner.path:
            node = _ast.FieldAccess(node, seg)
        return node
    if isinstance(inner, _ast.FieldAccess):
        return _ast.FieldAccess(_rebase_coalesce(target, inner.target),
                                inner.name)
    return inner


def _unquote(s: str) -> str:
    if s.startswith('"""'):
        return s[3:-3]  # triple-quoted strings are raw, no escapes
    body = s[1:-1]
    # single left-to-right pass: sequential replace() corrupts mixed
    # sequences (`\\n` is backslash + literal n, not backslash + LF)
    out = []
    i = 0
    esc = {'"': '"', "n": "\n", "t": "\t", "r": "\r", "\\": "\\",
           "'": "'", "/": "/", "0": "\0", "a": "\a", "b": "\b",
           "f": "\f", "v": "\v"}
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                try:
                    out.append(chr(int(body[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _Parser:
    def __init__(self, src: str, base_dir: str = "."):
        self.toks = _tokenize(src)
        self.pos = 0
        self.depth = 0  # bracket depth; newlines are soft when > 0
        self.base_dir = base_dir  # resolves `import "relative.blobl"`

    # ---- token plumbing ----

    def peek(self, skip_nl: bool | None = None) -> _Tok:
        skip = self.depth > 0 if skip_nl is None else skip_nl
        p = self.pos
        while skip and self.toks[p].kind == "NEWLINE":
            p += 1
        return self.toks[p]

    def next(self, skip_nl: bool | None = None) -> _Tok:
        skip = self.depth > 0 if skip_nl is None else skip_nl
        while skip and self.toks[self.pos].kind == "NEWLINE":
            self.pos += 1
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    def peek_at(self, offset: int) -> _Tok:
        """Lookahead by `offset` significant tokens (newline-skipping
        mirrors peek())."""
        skip = self.depth > 0
        p, seen = self.pos, 0
        while True:
            while skip and self.toks[p].kind == "NEWLINE":
                p += 1
            if seen == offset:
                return self.toks[p]
            p += 1
            seen += 1

    def expect(self, kind: str, text: str | None = None,
               skip_nl: bool | None = None) -> _Tok:
        tok = self.next(skip_nl)
        if tok.kind != kind or (text is not None and tok.text != text):
            want = text or kind
            raise BloblangParseError(
                f"expected {want!r}, found {tok.text!r}", tok.line, tok.col)
        return tok

    def accept(self, kind: str, text: str | None = None) -> _Tok | None:
        tok = self.peek()
        if tok.kind == kind and (text is None or tok.text == text):
            return self.next()
        return None

    def _err(self, msg: str) -> BloblangParseError:
        tok = self.peek()
        return BloblangParseError(msg + f" (found {tok.text!r})",
                                  tok.line, tok.col)

    # ---- statements (mapping_parser.go:51-65) ----

    def parse_mapping(self) -> ast.Mapping:
        start_pos = self.pos
        try:
            return self._parse_mapping_statements()
        except BloblangParseError as first_err:
            # singleRootMapping fallback (mapping_parser.go:141): when
            # the input isn't statements, the WHOLE mapping may be one
            # query expression, equivalent to `root = <expr>`
            self.pos, self.depth = start_pos, 0
            try:
                while self.accept("NEWLINE"):
                    pass
                expr = self.parse_expr()
                while self.accept("NEWLINE"):
                    pass
                if self.peek(skip_nl=False).kind != "EOF":
                    raise first_err
                return ast.Mapping([ast.RootAssign([], expr)])
            except BloblangParseError:
                raise first_err from None

    def _parse_mapping_statements(self) -> ast.Mapping:
        stmts: list[ast.Statement] = []
        while True:
            while self.accept("NEWLINE"):
                pass
            if self.peek(skip_nl=False).kind == "EOF":
                break
            tok = self.peek()
            if (tok.kind == "IDENT" and tok.text == "from"
                    and not stmts
                    and self.peek_at(1).kind == "STRING"):
                # `from "file.blobl"` (mapping_parser.go:105
                # singleRootImport): the file IS the whole mapping
                return self._parse_from()
            if tok.kind == "IDENT" and tok.text == "import":
                stmts.extend(self._parse_import())
                continue
            stmts.append(self.parse_statement())
            tok = self.peek(skip_nl=False)
            if tok.kind not in ("NEWLINE", "EOF"):
                raise BloblangParseError(
                    f"expected end of statement, found {tok.text!r}",
                    tok.line, tok.col)
        seen: set[str] = set()
        for s in stmts:
            if isinstance(s, ast.MapDef):
                if s.name in seen:  # mapping_parser.go:231 collisions
                    raise BloblangParseError(
                        f"map name collision: {s.name!r}", 0, 0)
                seen.add(s.name)
        return ast.Mapping(stmts)

    def _parse_from(self) -> ast.Mapping:
        """`from "file.blobl"` (mapping_parser.go:105): read the file
        and parse its contents as the entire mapping; nothing may
        follow the directive."""
        import os

        tok = self.next()  # 'from'
        ptok = self.expect("STRING")
        fpath = _unquote(ptok.text)
        if not os.path.isabs(fpath):
            fpath = os.path.join(self.base_dir, fpath)
        try:
            with open(fpath, encoding="utf-8") as fh:
                contents = fh.read()
        except OSError as e:
            raise BloblangParseError(
                f"failed to read import: {e}", tok.line, tok.col) from e
        while self.accept("NEWLINE"):
            pass
        end = self.peek(skip_nl=False)
        if end.kind != "EOF":
            raise BloblangParseError(
                f"expected end of input after `from`, found "
                f"{end.text!r}", end.line, end.col)
        sub = _Parser(contents, base_dir=os.path.dirname(fpath))
        return sub.parse_mapping()

    def _parse_import(self) -> list[ast.Statement]:
        """`import "file.blobl"` (mapping_parser.go:192): read the file
        at parse time, splice in its named maps. Errors mirror the
        reference: unreadable file, no maps to import, name collisions."""
        import os

        tok = self.next()  # 'import'
        ptok = self.expect("STRING")
        fpath = _unquote(ptok.text)
        if not os.path.isabs(fpath):
            fpath = os.path.join(self.base_dir, fpath)
        try:
            with open(fpath, encoding="utf-8") as fh:
                contents = fh.read()
        except OSError as e:
            raise BloblangParseError(
                f"failed to read import: {e}", tok.line, tok.col) from e
        sub = _Parser(contents, base_dir=os.path.dirname(fpath))
        imported = [s for s in sub.parse_mapping().statements
                    if isinstance(s, ast.MapDef)]
        if not imported:
            raise BloblangParseError(
                f"no maps to import from '{fpath}'", tok.line, tok.col)
        return imported

    def parse_statement(self) -> ast.Statement:
        tok = self.peek()
        if tok.kind == "IDENT" and tok.text == "root":
            self.next()
            path = self._parse_path_tail()
            self.expect("OP", "=")
            return ast.RootAssign(path, self.parse_expr())
        if tok.kind == "IDENT" and tok.text == "meta":
            self.next()
            key = None
            nxt = self.peek()
            if nxt.kind == "IDENT":
                key = self.next().text
            elif nxt.kind == "STRING":
                key = _unquote(self.next().text)
            self.expect("OP", "=")
            return ast.MetaAssign(key, self.parse_expr())
        if tok.kind == "IDENT" and tok.text == "let":
            self.next()
            ntok = self.peek()
            if ntok.kind == "STRING":   # let "quoted name" = ...
                name = _unquote(self.next().text)
            else:
                name = self.expect("IDENT").text
            self.expect("OP", "=")
            return ast.LetAssign(name, self.parse_expr())
        if tok.kind == "IDENT" and tok.text == "map":
            self.next()
            name = self.expect("IDENT").text
            self.expect("OP", "{", skip_nl=True)
            stmts: list[ast.Statement] = []
            while True:
                while self.accept("NEWLINE"):
                    pass
                nxt = self.peek(skip_nl=True)
                if nxt.kind == "OP" and nxt.text == "}":
                    self.next()
                    break
                stmts.append(self.parse_statement())
            return ast.MapDef(name, stmts)
        if tok.kind == "IDENT" and tok.text not in _KEYWORDS:
            # naked relative assignment `path = expr` ≡ `root.path = expr`
            # (mapping_parser.go:78 — assignment targets default to root)
            save = self.pos
            head = self.next().text
            path = [head] + self._parse_path_tail()
            nxt = self.peek(skip_nl=False)
            if nxt.kind == "OP" and nxt.text == "=":
                self.next()
                return ast.RootAssign(path, self.parse_expr())
            self.pos = save
        raise BloblangParseError(
            f"expected 'root', 'meta' or 'let' statement, found {tok.text!r}",
            tok.line, tok.col)

    def _parse_path_tail(self) -> list[str]:
        path: list[str] = []
        while self.accept("OP", "."):
            seg = self.next()
            if seg.kind == "IDENT":
                path.append(seg.text)
            elif seg.kind == "STRING":
                path.append(_unquote(seg.text))
            elif seg.kind == "NUMBER" and "." not in seg.text:
                path.append(seg.text)  # array index segment (gabs `.0`)
            else:
                raise BloblangParseError(
                    f"expected path segment, found {seg.text!r}",
                    seg.line, seg.col)
        return path

    # ---- expressions: precedence climbing ----
    # (query_arithmetic_parser.go; pipe lowest, then ||, &&, comparisons,
    #  additive, multiplicative — matching the reference's resolution)

    def parse_expr(self) -> ast.Node:
        return self._parse_pipe()

    def _parse_pipe(self) -> ast.Node:
        left = self._parse_or()
        while self.accept("OP", "|"):
            left = ast.Binary("|", left, self._parse_or())
        return left

    def _parse_or(self) -> ast.Node:
        left = self._parse_and()
        while self.accept("OP", "||"):
            left = ast.Binary("||", left, self._parse_and())
        return left

    def _parse_and(self) -> ast.Node:
        left = self._parse_cmp()
        while self.accept("OP", "&&"):
            left = ast.Binary("&&", left, self._parse_cmp())
        return left

    def _parse_cmp(self) -> ast.Node:
        left = self._parse_add()
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text in ("==", "!=", ">", "<", ">=", "<="):
                self.next()
                left = ast.Binary(tok.text, left, self._parse_add())
            else:
                return left

    def _parse_add(self) -> ast.Node:
        left = self._parse_mul()
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text in ("+", "-"):
                self.next()
                left = ast.Binary(tok.text, left, self._parse_mul())
            else:
                return left

    def _parse_mul(self) -> ast.Node:
        left = self._parse_unary()
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text in ("*", "/", "%"):
                self.next()
                left = ast.Binary(tok.text, left, self._parse_unary())
            else:
                return left

    def _parse_unary(self) -> ast.Node:
        tok = self.peek()
        if tok.kind == "OP" and tok.text == "!":
            self.next()
            return ast.Unary("!", self._parse_unary())
        if tok.kind == "OP" and tok.text == "-":
            self.next()
            return ast.Unary("-", self._parse_unary())
        return self._parse_postfix()

    def _parse_postfix(self) -> ast.Node:
        node = self._parse_primary()
        while True:
            if self.accept("OP", "."):
                # a trailing dot continues the chain on the next line
                # (reference style: `this.xs.\n  filter(...)`)
                nxt = self.peek(skip_nl=True)
                if nxt.kind == "OP" and nxt.text == "(":
                    # parenthesized path-coalesce segment
                    # `x.(a | b).c` ≡ (x.a | x.b).c (field_parser.go
                    # path expressions)
                    self.next(skip_nl=True)
                    inner = self.parse_expr()
                    self.expect("OP", ")")
                    node = _rebase_coalesce(node, inner)
                    continue
                seg = self.next(skip_nl=True)
                if seg.kind == "NUMBER" and "." not in seg.text:
                    node = ast.FieldAccess(node, seg.text)
                    continue
                if seg.kind not in ("IDENT", "STRING"):
                    raise BloblangParseError(
                        f"expected field or method name, found {seg.text!r}",
                        seg.line, seg.col)
                name = _unquote(seg.text) if seg.kind == "STRING" else seg.text
                if self.peek(skip_nl=False).kind == "OP" and \
                        self.peek(skip_nl=False).text == "(":
                    node = ast.Method(node, name, self._parse_args())
                else:
                    node = ast.FieldAccess(node, name)
            else:
                return node

    def _parse_arg(self) -> ast.Node:
        # named lambda `x -> expr` (query_parser.go arrow functions):
        # binds the element name while leaving `this` on the outer
        # context — unlike the bare this-rebind form `map_each(this+1)`
        tok = self.peek()
        if tok.kind == "IDENT" and tok.text not in _KEYWORDS:
            nxt = self.peek_at(1)
            if nxt.kind == "OP" and nxt.text == "->":
                self.next()
                self.next()
                return ast.Lambda(tok.text, self.parse_expr())
        return self.parse_expr()

    def _parse_args(self) -> list[ast.Node]:
        self.expect("OP", "(")
        self.depth += 1
        args: list[ast.Node] = []
        if not (self.peek().kind == "OP" and self.peek().text == ")"):
            args.append(self._parse_arg())
            while self.accept("OP", ","):
                # trailing comma before ')' is fine (query_parser.go)
                if self.peek().kind == "OP" and self.peek().text == ")":
                    break
                args.append(self._parse_arg())
        self.depth -= 1
        self.expect("OP", ")", skip_nl=True)
        return args

    def _parse_primary(self) -> ast.Node:
        tok = self.peek()
        if tok.kind == "NUMBER":
            self.next()
            text = tok.text
            return ast.Literal(float(text) if ("." in text or "e" in text
                                               or "E" in text) else int(text))
        if tok.kind == "STRING":
            self.next()
            return ast.Literal(_unquote(tok.text))
        if tok.kind == "VAR":
            self.next()
            return ast.VarRef(tok.text[1:])
        if tok.kind == "OP" and tok.text == "(":
            self.next()
            self.depth += 1
            inner = self.parse_expr()
            self.depth -= 1
            self.expect("OP", ")", skip_nl=True)
            return inner
        if tok.kind == "OP" and tok.text == "[":
            return self._parse_array()
        if tok.kind == "OP" and tok.text == "{":
            return self._parse_object()
        if tok.kind == "IDENT":
            return self._parse_ident()
        raise self._err("expected expression")

    def _parse_array(self) -> ast.Node:
        self.expect("OP", "[")
        self.depth += 1
        items: list[ast.Node] = []
        if not (self.peek().kind == "OP" and self.peek().text == "]"):
            items.append(self.parse_expr())
            while self.accept("OP", ","):
                if self.peek().kind == "OP" and self.peek().text == "]":
                    break  # trailing comma
                items.append(self.parse_expr())
        self.depth -= 1
        self.expect("OP", "]", skip_nl=True)
        return ast.ArrayLit(items)

    def _parse_object(self) -> ast.Node:
        self.expect("OP", "{")
        self.depth += 1
        entries: list[tuple[ast.Node, ast.Node]] = []
        if not (self.peek().kind == "OP" and self.peek().text == "}"):
            entries.append(self._parse_object_entry())
            while self.accept("OP", ","):
                if self.peek().kind == "OP" and self.peek().text == "}":
                    break
                entries.append(self._parse_object_entry())
        self.depth -= 1
        self.expect("OP", "}", skip_nl=True)
        return ast.ObjectLit(entries)

    def _parse_object_entry(self) -> tuple[ast.Node, ast.Node]:
        keytok = self.peek()
        if keytok.kind == "STRING":
            self.next()
            key: ast.Node = ast.Literal(_unquote(keytok.text))
        elif keytok.kind == "IDENT" and self.peek_at(1).text == ":":
            self.next()
            key = ast.Literal(keytok.text)
        else:
            # dynamic key: any query expression (query_literal_parser.go:59
            # OneOf(QuotedString, queryParser) — e.g. `("k".uppercase())`)
            key = self.parse_expr()
        self.expect("OP", ":")
        return key, self.parse_expr()

    def _parse_ident(self) -> ast.Node:
        tok = self.next()
        name = tok.text
        if name == "true":
            return ast.Literal(True)
        if name == "false":
            return ast.Literal(False)
        if name == "null":
            return ast.Literal(None)
        if name == "if":
            return self._parse_if()
        if name == "match":
            return self._parse_match()
        if name == "this":
            return ast.Context(self._peek_path_tail())
        if name == "root":
            return ast.RootRef(self._peek_path_tail())
        # function call?
        nxt = self.peek(skip_nl=False)
        if nxt.kind == "OP" and nxt.text == "(":
            return ast.FuncCall(name, self._parse_args())
        # bare relative path == this.<name>[.more] — but a bare ident
        # followed by '.' could also be method chain on the field; the
        # postfix loop handles that, so just return the head here.
        return ast.Context([name])

    def _peek_path_tail(self) -> list[str]:
        """Path tail after this/root, but stop before method calls:
        `this.foo.bar.uppercase()` — foo.bar is path, uppercase() is a
        method handled by the postfix loop."""
        path: list[str] = []
        while True:
            save = self.pos
            if not self.accept("OP", "."):
                return path
            seg = self.peek(skip_nl=False)
            if seg.kind not in ("IDENT", "STRING"):
                self.pos = save
                return path
            after = self.toks[self.pos + 1] if self.pos + 1 < len(self.toks) else None
            if after is not None and after.kind == "OP" and after.text == "(":
                self.pos = save  # it's a method call — leave for postfix
                return path
            self.next()
            path.append(_unquote(seg.text) if seg.kind == "STRING" else seg.text)

    def _parse_if(self) -> ast.Node:
        branches: list[tuple[ast.Node, ast.Node]] = []
        cond = self.parse_expr()
        val = self._parse_block()
        branches.append((cond, val))
        otherwise = None
        while True:
            save = self.pos
            if self.accept("IDENT", "else"):
                if self.accept("IDENT", "if"):
                    c = self.parse_expr()
                    v = self._parse_block()
                    branches.append((c, v))
                    continue
                otherwise = self._parse_block()
                break
            self.pos = save
            break
        return ast.IfExpr(branches, otherwise)

    def _parse_block(self) -> ast.Node:
        self.expect("OP", "{", skip_nl=True)
        self.depth += 1
        val = self.parse_expr()
        self.depth -= 1
        self.expect("OP", "}", skip_nl=True)
        return val

    def _parse_match(self) -> ast.Node:
        subject = None
        nxt = self.peek()
        if not (nxt.kind == "OP" and nxt.text == "{"):
            subject = self.parse_expr()
        self.expect("OP", "{", skip_nl=True)
        self.depth += 1
        cases: list[tuple[ast.Node | None, ast.Node]] = []
        while True:
            nxt = self.peek()
            if nxt.kind == "OP" and nxt.text == "}":
                break
            if nxt.text == "_" and nxt.kind in ("IDENT", "OP"):
                self.next()
                pat: ast.Node | None = None
            else:
                pat = self.parse_expr()
            self.expect("OP", "=>")
            val = self.parse_expr()
            cases.append((pat, val))
            if self.accept("OP", ","):
                continue
            # newline also separates cases (query_expression_parser.go:
            # match cases are line-delimited in block form)
            if self.peek(skip_nl=False).kind == "NEWLINE":
                continue
            break
        self.depth -= 1
        self.expect("OP", "}", skip_nl=True)
        return ast.MatchExpr(subject, cases)


def parse_mapping(src: str, base_dir: str = ".") -> ast.Mapping:
    """Parse a Bloblang mapping into an AST (ParseMapping,
    mapping_parser.go:21). `base_dir` resolves `import` paths."""
    return _Parser(src, base_dir=base_dir).parse_mapping()


def parse_query(src: str) -> ast.Node:
    """Parse a single query expression (benthos blobl-style)."""
    p = _Parser(src)
    node = p.parse_expr()
    tok = p.peek(skip_nl=False)
    while tok.kind == "NEWLINE":
        p.next(skip_nl=False)
        tok = p.peek(skip_nl=False)
    if tok.kind != "EOF":
        raise BloblangParseError(f"trailing input {tok.text!r}",
                                 tok.line, tok.col)
    return node
