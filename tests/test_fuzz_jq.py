"""Grammar-driven differential fuzzing of the jq interpreter
(r7 verdict ask #6).

operators/jq.py is the repo's biggest clean-room interpreter (1800+
LoC) and until r8 had only pinned vectors.  This harness GENERATES jq
programs — paths, arithmetic, pipes, select/map, builtins, object and
array construction, reduce, bindings, try/catch — and diffs THREE
engines:

1. the repo interpreter (`operators.jq._eval`, the general tier that
   jq_transform runs inside its Arrow UDF);
2. the SYSTEM jq 1.6 binary (/usr/bin/jq) — the semantics gojq (which
   the reference embeds, lib/processor/jq.go:18) mirrors.  One
   subprocess per generated program: docs stream in as
   {"i": idx, "d": doc} JSON-lines and the program is wrapped as
   {i: .i, o: [.d | (PROG)]} so each input yields exactly one output
   line carrying the FULL output stream; a doc whose evaluation errors
   drops its line (jq continues with the next input), which must match
   the interpreter raising JQError for that doc;
3. for pure static paths, the JVM variant-extraction tier
   (jq_transform's codegen fast path) via Spark, including the
   traversal-error / missing-key / null-propagation contract.

Generator exclusions (documented jq-1.6-vs-gojq divergence zones, not
engine bugs): `limit(0; …)` (jq-1.6 bug fixed in 1.7), unbounded
generators (`repeat`, bare `recurse`), `now`/`env`, empty-matchable
regex patterns under "g" (engines disagree on empty-match advance),
string×number repetition, >2^53 integers (jq 1.6 is float64-backed),
and NaN/Infinity literals.  r9 widened in (verdict ask #7):
limit(n>=1)/first/last/until/while, literal-pattern
test/match/capture/splits incl. named groups + flags, and the
assignment family over real path expressions.

Values normalize through json round-trips with int/float unification
(jq 1.6 prints 2.0 as 2; the interpreter keeps Python ints exact).
"""

from __future__ import annotations

import json
import math
import os
import subprocess

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# Soak/parity tier: excluded from the default fast run the driver's
# verify budget can finish (pytest.ini); run with -m slow.
pytestmark = __import__('pytest').mark.slow

EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "220"))
# SOAK=1: fresh random seed each run (deep hunting); default is
# derandomized so CI failures reproduce
_SOAK = os.environ.get("SPARK_GRAFT_FUZZ_SOAK", "") == "1"
DOCS_PER_EXAMPLE = 6

_WORDS = ["alpha", "bz", "az kick", "Zed", "", "a9"]


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and not math.isnan(v) and v == int(v) \
            and abs(v) < 1 << 52:
        return int(v)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


# ------------------------------------------------------------ generators

_INT_PATHS = [".a", ".b", ".o.x", ".arr[0]", ".arr[1]", ".maybe"]
_STR_PATHS = [".s", ".o.y"]
_ANY_PATHS = _INT_PATHS + _STR_PATHS + [
    ".arr", ".objs", ".flag", ".missing", ".missing.deep", ".o",
    ".arr[-1]", ".arr[1:3]", ".objs[0].v", ".trap", ".trap.q"]


@st.composite
def num_expr(draw, depth=2):
    if depth == 0:
        kind = draw(st.sampled_from(["path", "lit"]))
        if kind == "path":
            return draw(st.sampled_from(_INT_PATHS))
        return str(draw(st.integers(-40, 40)))
    kind = draw(st.sampled_from(
        ["arith", "arith", "length", "addarr", "floor", "alt", "ifte",
         "reduce", "bind"]))
    if kind == "arith":
        op = draw(st.sampled_from(["+", "-", "*", "%", "/"]))
        le = draw(num_expr(depth=depth - 1))
        if op in ("%", "/"):
            # nonzero literal divisor: division-by-zero parity is
            # covered by the dedicated pin below, and jq reports it
            # per-doc which would just thin the corpus here
            d = draw(st.integers(2, 9))
            return f"(({le}) {op} {d})"
        re_ = draw(num_expr(depth=depth - 1))
        return f"(({le}) {op} ({re_}))"
    if kind == "length":
        return draw(st.sampled_from(
            [".arr | length", ".s | length", ".o | length",
             ".objs | length"]))
    if kind == "addarr":
        return "(.arr | add // 0)"      # add of [] is null in both
    if kind == "floor":
        i = draw(num_expr(depth=depth - 1))
        return f"(({i}) | floor)"
    if kind == "alt":
        v = draw(st.integers(-9, 9))
        return f"(.maybe // {v})"
    if kind == "ifte":
        c = draw(bool_expr(depth=1))
        t = draw(num_expr(depth=depth - 1))
        f = draw(num_expr(depth=depth - 1))
        return f"(if {c} then {t} else {f} end)"
    if kind == "reduce":
        z = draw(st.integers(-5, 5))
        return f"(reduce .arr[] as $x ({z}; . + $x))"
    v = draw(st.integers(-9, 9))
    e = draw(num_expr(depth=depth - 1))
    return f"({v} as $v | ({e}) + $v)"


@st.composite
def bool_expr(draw, depth=1):
    if depth == 0:
        return draw(st.sampled_from([".flag", "true", "false"]))
    kind = draw(st.sampled_from(["cmp", "cmp", "andor", "not"]))
    if kind == "cmp":
        op = draw(st.sampled_from(["<", ">", "<=", ">=", "==", "!="]))
        le = draw(num_expr(depth=0))
        re_ = draw(num_expr(depth=0))
        return f"(({le}) {op} ({re_}))"
    if kind == "andor":
        op = draw(st.sampled_from(["and", "or"]))
        le = draw(bool_expr(depth=depth - 1))
        re_ = draw(bool_expr(depth=depth - 1))
        return f"(({le}) {op} ({re_}))"
    b = draw(bool_expr(depth=depth - 1))
    return f"(({b}) | not)"


@st.composite
def any_expr(draw):
    kind = draw(st.sampled_from(
        ["num", "num", "bool", "path", "stream", "map", "selectarr",
         "obj", "arrlit", "strop", "sort", "entries", "trycatch",
         "typefn", "slice", "strcat", "assign", "paths", "interp",
         "foreach", "del", "limituntil", "regex", "pathassign"]))
    if kind == "limituntil":
        # r8 verdict ask #7: the formerly-excluded generator zone
        # where jq 1.6 and gojq agree — limit with n>=1 (limit(0) is
        # a known jq-1.6 bug fixed in 1.7), first/last over streams,
        # until/while with terminating numeric updates
        n_ = draw(st.integers(1, 3))
        return draw(st.sampled_from([
            f"[limit({n_}; .arr[])]",
            f"[limit({n_}; .objs[] | .v)]",
            "first(.arr[], 99)",
            "[first(range(1; 5))]",
            "last(.arr[], -7)",
            "(.a | until(. >= 21; . + 3))",
            f"[({draw(st.integers(-4, 4))}) | while(. < 9; . + 2)]",
        ]))
    if kind == "regex":
        # literal-ish Oniguruma patterns both engines parse alike —
        # named groups spell (?<g1>…); no empty-matchable patterns
        # (engines disagree on empty-match advance under "g")
        pat = draw(st.sampled_from(
            ["a", "a+", "[a-z]+", "z?k", "(?<g1>[a-z]+)", "(a)(z)?",
             "[0-9]", "^a", "k$", "c[ak]"]))
        fl = draw(st.sampled_from(["", "g", "i", "ig"]))
        tgt = draw(st.sampled_from([".s", ".o.y"]))
        form = draw(st.sampled_from(["match", "test", "capture",
                                     "splits"]))
        if form == "match":
            return f'[{tgt} | match("{pat}"; "{fl}")]'
        if form == "test":
            return f'({tgt} | test("{pat}"; "{fl}"))'
        if form == "capture":
            return f'[{tgt} | capture("{pat}"; "{fl}")]'
        return f'[{tgt} | splits("{pat}")]'
    if kind == "pathassign":
        # assignment family over PATH EXPRESSIONS (stream targets,
        # select inside the path, setpath/delpaths) — the zone the r8
        # fuzzer only covered for simple field targets
        d_ = draw(st.integers(-5, 5))
        return draw(st.sampled_from([
            f"(.objs[].v += {d_})",
            f"((.arr[] | select(. > 0)) |= . + {d_})",
            f'(.o["x"] = {d_})',
            f'(setpath(["o","z"]; {d_}))',
            f'(setpath(["arr",0]; {d_}))',
            f"((.a, .b) = {d_})",
            f"(.arr |= map(. + {d_}))",
            '(delpaths([["o","x"],["a"]]))',
            "(.o.y |= ascii_upcase)",
        ]))
    if kind == "assign":
        tgt = draw(st.sampled_from([".a", ".o.x", ".arr[0]", ".b"]))
        op = draw(st.sampled_from(["=", "|=", "+=", "-=", "*=", "//="]))
        if op == "|=":
            return f"({tgt} |= . + {draw(st.integers(-5, 5))})"
        return f"({tgt} {op} {draw(st.integers(-9, 9))})"
    if kind == "paths":
        return draw(st.sampled_from(
            ["[paths]", "[leaf_paths]", 'getpath(["o","x"])',
             'getpath(["missing","x"])', "(.o | [paths])",
             '[path(.o.y), path(.arr[1])]']))
    if kind == "interp":
        e = draw(st.sampled_from([".a", ".a + .b", ".s", ".o.y"]))
        return f'"v=\\({e})|\\(.flag)"'
    if kind == "foreach":
        z = draw(st.integers(-3, 3))
        return f"[foreach .arr[] as $x ({z}; . + $x; .)]"
    if kind == "del":
        return draw(st.sampled_from(
            ["del(.o.x)", "del(.a, .b)", "del(.arr[0])",
             "(.arr |= sort)", "del(.missing)"]))
    if kind == "num":
        return draw(num_expr(depth=draw(st.integers(1, 3))))
    if kind == "bool":
        return draw(bool_expr(depth=draw(st.integers(1, 2))))
    if kind == "path":
        return draw(st.sampled_from(_ANY_PATHS))
    if kind == "stream":
        # multi-output program: the [..] wrapper keeps alignment
        return draw(st.sampled_from(
            [".arr[]", ".objs[] | .v", "(.a, .b)", ".arr[] | . * 2",
             "range(3)", "(.arr | reverse)[]"]))
    if kind == "map":
        op = draw(st.sampled_from(["+", "*", "-"]))
        return f"(.arr | map(. {op} {draw(st.integers(-5, 5))}))"
    if kind == "selectarr":
        op = draw(st.sampled_from(["<", ">", "==", "!="]))
        v = draw(st.integers(-8, 8))
        return f"[.arr[] | select(. {op} {v})]"
    if kind == "obj":
        a = draw(num_expr(depth=1))
        b = draw(st.sampled_from(_ANY_PATHS))
        return f"{{u: ({a}), w: ({b})}}"
    if kind == "arrlit":
        a = draw(num_expr(depth=1))
        b = draw(bool_expr(depth=1))
        return f"[({a}), ({b}), .s]"
    if kind == "strop":
        return draw(st.sampled_from(
            ["(.s | ascii_upcase)", "(.s | ascii_downcase)",
             '(.s | ltrimstr("a"))', '(.s | rtrimstr("z"))',
             '(.s | split("a"))', "(.s | explode)",
             "(.s | test(\"a\"))", "(.o.y | startswith(\"a\"))",
             "(.s | tojson)", "(.a | tostring)"]))
    if kind == "sort":
        return draw(st.sampled_from(
            ["(.arr | sort)", "(.arr | unique)", "(.arr | reverse)",
             "(.arr | min)", "(.arr | max)", "(.arr | first)",
             "(.arr | last)", "(.objs | sort_by(.v) | map(.v))",
             "(.o | keys)", "(.arr | sort) == (.arr | unique)"]))
    if kind == "entries":
        return draw(st.sampled_from(
            ["(.o | to_entries | sort_by(.key))",
             "(.o | with_entries(.key |= ascii_upcase) | keys)"]))
    if kind == "trycatch":
        e = draw(st.sampled_from([".trap.q", ".s | tonumber",
                                  ".flag + 1"]))
        v = draw(st.integers(-9, 9))
        return f"(try ({e}) catch {v})"
    if kind == "typefn":
        p = draw(st.sampled_from(_ANY_PATHS))
        return f"({p} | type)"
    if kind == "slice":
        lo = draw(st.integers(0, 2))
        hi = draw(st.integers(lo, 4))
        return f".arr[{lo}:{hi}]"
    return "(.s + .o.y)"


_DOC = st.fixed_dictionaries({
    "a": st.integers(-20, 20),
    "b": st.integers(-20, 20),
    "s": st.sampled_from(_WORDS),
    "maybe": st.none() | st.integers(-9, 9),
    "o": st.fixed_dictionaries({"x": st.integers(-9, 9),
                                "y": st.sampled_from(_WORDS)}),
    "arr": st.lists(st.integers(-9, 9), min_size=0, max_size=4),
    "objs": st.lists(
        st.fixed_dictionaries({"k": st.sampled_from(_WORDS),
                               "v": st.integers(-9, 9)}),
        min_size=0, max_size=3),
    "flag": st.booleans(),
    # traversal-error shapes: .trap.q errors on scalars/arrays,
    # propagates null, or succeeds — per-doc
    "trap": st.sampled_from([0, "z", None, [1], {"q": 7}]),
})


def _run_system_jq(prog: str, docs: list[dict]) -> dict[int, list]:
    """One jq 1.6 subprocess over all docs; returns {doc_idx: outputs}
    with erroring docs ABSENT (jq drops their line and continues)."""
    wrapped = f"{{i: .i, o: [.d | ({prog})]}}"
    inp = "\n".join(json.dumps({"i": i, "d": d})
                    for i, d in enumerate(docs))
    res = subprocess.run(["jq", "-c", wrapped], input=inp,
                         capture_output=True, text=True, timeout=60)
    out: dict[int, list] = {}
    for line in res.stdout.splitlines():
        row = json.loads(line)
        out[row["i"]] = row["o"]
    return out


@settings(max_examples=EXAMPLES, deadline=None, derandomize=not _SOAK,
          suppress_health_check=[HealthCheck.too_slow])
@given(any_expr(), st.lists(_DOC, min_size=DOCS_PER_EXAMPLE,
                            max_size=DOCS_PER_EXAMPLE))
def test_interp_matches_system_jq(prog, docs):
    from benthos_spark.operators.jq import JQError, _eval, parse_jq

    try:
        ast = parse_jq(prog)
    except Exception as e:  # generator bug, not an engine divergence
        raise AssertionError(f"generated prog failed to parse: "
                             f"{prog!r}: {e}")
    ref = _run_system_jq(prog, docs)
    for i, doc in enumerate(docs):
        try:
            mine = [_norm(x) for x in
                    _eval(ast, json.loads(json.dumps(doc)),
                          {"metadata": {}, "ENV": {}})]
            err = False
        except JQError:
            err = True
        if i not in ref:
            assert err, (f"system jq errored but interp returned "
                         f"{mine!r} prog={prog!r} doc={doc!r}")
            continue
        assert not err, (f"interp errored but system jq returned "
                         f"{ref[i]!r} prog={prog!r} doc={doc!r}")
        want = [_norm(x) for x in ref[i]]
        assert mine == want, (f"interp={mine!r} jq16={want!r} "
                              f"prog={prog!r} doc={doc!r}")


# ----------------------------------------------- static-path JVM tier

_STATIC_SEG = st.sampled_from(
    ["a", "b", "o", "x", "y", "arr", "objs", "missing", "trap", "q"])


@st.composite
def static_path(draw):
    n = draw(st.integers(1, 3))
    segs = [draw(_STATIC_SEG) for _ in range(n)]
    path = "." + ".".join(segs)
    if draw(st.booleans()):
        path += f"[{draw(st.integers(0, 2))}]"
        if draw(st.booleans()):
            path += f".{draw(_STATIC_SEG)}"
    return path


@settings(max_examples=12, deadline=None, derandomize=not _SOAK,
          suppress_health_check=[
              HealthCheck.too_slow,
              HealthCheck.function_scoped_fixture])
@given(st.lists(static_path(), min_size=4, max_size=4, unique=True),
       st.lists(_DOC, min_size=5, max_size=5))
def test_static_jvm_tier_matches_interp(spark, paths, docs):
    """The variant-extraction fast path (one JVM Project) must agree
    with the interpreter tier on value, null-propagation, and the
    traversal-error contract (content unchanged + _error set)."""
    from benthos_spark.operators.jq import (JQError, _eval, jq_static_path,
                                            jq_transform, parse_jq)

    rows = [(json.dumps(d),) for d in docs]
    df = spark.createDataFrame(rows, "content string")
    for prog in paths:
        ast = parse_jq(prog)
        assert jq_static_path(ast) is not None, prog
        got = jq_transform(df, prog).select("content", "_error") \
                                    .collect()
        assert len(got) == len(docs)   # fast path never filters
        for doc, row in zip(docs, got):
            try:
                outs = list(_eval(ast, json.loads(json.dumps(doc)),
                                  {"metadata": {}, "ENV": {}}))
                want = json.dumps(outs[0] if len(outs) == 1 else outs,
                                  separators=(",", ":"))
                assert row["_error"] is None, (prog, doc, row)
                assert _norm(json.loads(row["content"])) \
                    == _norm(json.loads(want)), (prog, doc, row)
            except JQError:
                assert row["_error"] is not None, (prog, doc, row)
                assert json.loads(row["content"]) == doc, (prog, doc)


# --------------------------------------------------------------- pins

def test_jq_modulo_truncated_pin():
    """r8 jq-fuzzer find #1: jq/gojq `%` is C/Go TRUNCATED int modulo
    (dividend's sign); the interpreter used Python's floored `%`
    (-7 % 3 returned 2 where jq says -1)."""
    from benthos_spark.operators.jq import _eval, parse_jq

    for prog, want in [("-7 % 3", -1), ("7 % -3", 1), ("-7 % -3", -1),
                       ("7 % 3", 1)]:
        assert list(_eval(parse_jq(prog), {}, {})) == [want], prog


def test_jq_division_by_zero_errors():
    from benthos_spark.operators.jq import JQError, _eval, parse_jq

    for prog in ["1 / 0", "1 % 0"]:
        with pytest.raises(JQError):
            list(_eval(parse_jq(prog), {}, {}))


def test_jq_total_order_comparisons_pin():
    """r8 jq-fuzzer find #2: jq comparisons are TOTAL across types
    (null < false < true < numbers < strings < arrays < objects) and
    equality is type-strict — `0 < .arr[0]` on an empty array (null)
    is false, not an error; 1 != true despite Python's True == 1;
    objects compare by sorted key list first."""
    from benthos_spark.operators.jq import _eval, parse_jq

    cases = [("0 < null", False), ("null < false", True),
             ("1 < \"a\"", True), ("\"a\" < [1]", True),
             ("[1] < {\"a\":1}", True), ("false < true", True),
             ("1 == true", False), ("[2,1] < [2,2]", True),
             ("{\"a\":1} < {\"b\":0}", True),
             ("{\"a\":1,\"c\":0} < {\"a\":1,\"b\":9}", False),
             ("[1] - [true]", [1])]
    for prog, want in cases:
        assert list(_eval(parse_jq(prog), {}, {})) == [want], prog


def test_jq_empty_string_split_pin():
    """r8 jq-fuzzer find #3: splitting the empty string yields []
    (Python's "".split(sep) says [""]) — both the builtin and the
    string `/` operator."""
    from benthos_spark.operators.jq import _eval, parse_jq

    assert list(_eval(parse_jq('split("a")'), "", {})) == [[]]
    assert list(_eval(parse_jq('"" / "a"'), None, {})) == [[]]
    assert list(_eval(parse_jq('split("a")'), "bab", {})) == [["b", "b"]]


def test_jq_try_catch_unary_pin():
    """r8 jq-fuzzer find #4: jq 1.6 parses unary-minus terms on both
    sides of try/catch (`try -1 catch -2`)."""
    from benthos_spark.operators.jq import _eval, parse_jq

    assert list(_eval(parse_jq("try -1 catch -2"), {}, {})) == [-1]
    assert list(_eval(parse_jq('try ("x" | tonumber) catch -2'),
                      {}, {})) == [-2]


def test_jq_leaf_paths_truthiness_quirk_pin():
    """r8 jq-fuzzer find #5: builtin.jq's paths(f) SELECTs on the
    truthiness of f's output — the leaf value itself — so leaf_paths
    drops null and false leaves (true in jq 1.6 AND gojq, which share
    the builtin source)."""
    from benthos_spark.operators.jq import _eval, parse_jq

    doc = {"n": None, "f": False, "t": True, "z": 0, "e": [],
           "eo": {}}
    assert list(_eval(parse_jq("[leaf_paths]"), doc, {})) == \
        [[["t"], ["z"]]]
    assert list(_eval(parse_jq("[paths]"), doc, {})) == \
        [[["n"], ["f"], ["t"], ["z"], ["e"], ["eo"]]]


def test_jq_del_pin():
    """r8 jq-fuzzer find #6: `del(f)` (= delpaths([path(f)])) was
    missing while delpaths existed."""
    from benthos_spark.operators.jq import _eval, parse_jq

    doc = {"o": {"x": 1, "y": 2}, "a": 1, "arr": [1, 2]}
    assert list(_eval(parse_jq("del(.o.x)"), dict(doc), {})) == \
        [{"o": {"y": 2}, "a": 1, "arr": [1, 2]}]
    assert list(_eval(parse_jq("del(.arr[0])"), dict(doc), {})) == \
        [{"o": {"x": 1, "y": 2}, "a": 1, "arr": [2]}]


def test_jq_unary_minus_as_binding_pin():
    """r8 jq-fuzzer soak find #7: the `as` token has no declared
    precedence in jq.y, so yacc SHIFTS it under unary minus —
    `-1 as $v | 5, 6` negates the whole binding's output stream
    ([-5, -6]); it does not bind $v = -1.  Parenthesized `(-1) as $v`
    binds the negative value."""
    from benthos_spark.operators.jq import _eval, parse_jq

    assert list(_eval(parse_jq("-1 as $v | 5"), 1, {})) == [-5]
    assert list(_eval(parse_jq("[ -1 as $v | 5, 6]"), 1, {})) == \
        [[-5, -6]]
    assert list(_eval(parse_jq("(-1) as $v | $v"), 1, {})) == [-1]
    assert list(_eval(parse_jq("-1 as $v | .a + .a + $v"),
                      {"a": 1}, {})) == [-3]
