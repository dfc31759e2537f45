"""Bloblang AST nodes.

Mirrors the reference IR shape (internal/bloblang/query/: Literal,
FieldFunction, method closures; mapping/statement.go) as plain
dataclasses — the compiler walks these into Spark Columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass
class Literal(Node):
    value: object  # int | float | str | bool | None


@dataclass
class ArrayLit(Node):
    items: list[Node]


@dataclass
class ObjectLit(Node):
    # keys may be dynamic (query/literals.go dynamic fields); v1 requires
    # string-literal keys
    entries: list[tuple[Node, Node]]


@dataclass
class Context(Node):
    """`this` or a bare relative path head (parsed as this.<path>)."""
    path: list[str] = field(default_factory=list)


@dataclass
class RootRef(Node):
    """`root` / `root.path` read on the right-hand side."""
    path: list[str] = field(default_factory=list)


@dataclass
class VarRef(Node):
    """`$name` — a `let` variable (functions.go:745 hidden var fn)."""
    name: str


@dataclass
class FuncCall(Node):
    name: str
    args: list[Node]


@dataclass
class Method(Node):
    """`target.name(args)` — method call on an expression."""
    target: Node
    name: str
    args: list[Node]


@dataclass
class Lambda(Node):
    """Named-argument method lambda `x -> expr` (arrow functions in
    query_parser.go): binds `param` to the element while `this` keeps
    the outer context."""
    param: str
    body: "Node"


@dataclass
class FieldAccess(Node):
    """`expr.field` (non-call postfix)."""
    target: Node
    name: str


@dataclass
class Unary(Node):
    op: str  # '!' | '-'
    operand: Node


@dataclass
class Binary(Node):
    op: str  # + - * / % == != > < >= <= && || |
    left: Node
    right: Node


@dataclass
class IfExpr(Node):
    """if c {a} else if c2 {b} else {d} (query/expression.go:78)."""
    branches: list[tuple[Node, Node]]  # (condition, value)
    otherwise: Node | None


@dataclass
class MatchExpr(Node):
    """match ctx { case => expr, ... } (query/expression.go:22-67);
    first-true wins; `_` / bare boolean cases; value cases compare ==."""
    subject: Node | None
    cases: list[tuple[Node | None, Node]]  # (case pattern|None for _, value)


# ---- statements (mapping/assignment.go) ----

@dataclass
class Statement(Node):
    pass


@dataclass
class RootAssign(Statement):
    path: list[str]  # [] means whole-document `root = ...`
    value: Node


@dataclass
class MetaAssign(Statement):
    key: str | None  # None = whole meta object
    value: Node


@dataclass
class LetAssign(Statement):
    name: str
    value: Node


@dataclass
class MapDef(Statement):
    """`map name { statements }` (parser mapping_parser.go:248)."""
    name: str
    statements: list[Statement]


@dataclass
class Mapping(Node):
    statements: list[Statement]
