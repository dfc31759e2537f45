"""Grammar-driven differential fuzzing of the AWK interpreter.

operators/awk_lang.py is a 1300-LoC clean-room POSIX-AWK interpreter
(the reference embeds the public goawk — lib/processor/awk.go); r7
gave it 47 pinned reference vectors, this harness GENERATES programs
and diffs the interpreter's stdout against the SYSTEM mawk 1.3.4
binary (/usr/bin/awk) on the same record stream — the jq-fuzzer
pattern (tests/test_fuzz_jq.py) applied to the second-biggest
clean-room engine.

Zones generated: pattern-action rules with comparisons / regex match
/ && || ! over fields, NR/NF, BEGIN/END accumulators, arithmetic
(+ - * / % ^ with nonzero literal divisors), ++/--/op-assign,
ternary, if/else/while/for, associative arrays with string keys,
string builtins (length, substr with in-range args, index, split +
indexed access, sub/gsub with literal-ish EREs, toupper/tolower,
sprintf/printf %d %s %.2f %g), field assignment ($2="x" rebuilds $0
with OFS), and POSIX strnum comparison semantics (field vs number vs
string constant).

Deliberately excluded (implementation-divergence zones, not engine
bugs): for-in iteration order (unspecified by POSIX), srand/rand,
%c, getline/redirection/system (out of scope by design — raise
AwkError), division by a field (mawk exits fatally mid-stream),
substr with non-positive start (historic mawk/gawk drift),
locale-dependent [a-z] ranges beyond ASCII, and words with nan/inf
prefixes (mawk's strtod turns "NaNish" into NaN where gawk/goawk —
and this interpreter — read 0).
"""

from __future__ import annotations

import os
import subprocess

from hypothesis import HealthCheck, given, settings, strategies as st

# Soak/parity tier: excluded from the default fast run the driver's
# verify budget can finish (pytest.ini); run with -m slow.
pytestmark = __import__('pytest').mark.slow

EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "400"))
# SOAK=1: fresh random seed each run (deep hunting); default is
# derandomized so CI failures reproduce
_SOAK = os.environ.get("SPARK_GRAFT_FUZZ_SOAK", "") == "1"

_WORDS = ["abc", "zz", "Kick", "a1", "x", "B9z"]
_FIELD_TOKEN = st.one_of(
    st.integers(-99, 99).map(str),
    st.sampled_from(_WORDS),
    st.integers(1, 999).map(lambda v: f"{v / 10:.1f}"),
    st.sampled_from(["10", "9", "007", "0"]),   # strnum traps
)
_RECORD = st.lists(_FIELD_TOKEN, min_size=3, max_size=5).map(" ".join)


@st.composite
def num_expr(draw, depth=2):
    if depth == 0:
        return draw(st.sampled_from(
            ["$1", "$2", "$3", "NR", "NF", "s",
             str(draw(st.integers(-20, 20)))]))
    kind = draw(st.sampled_from(
        ["arith", "arith", "length", "index", "ternary", "unary"]))
    if kind == "arith":
        op = draw(st.sampled_from(["+", "-", "*", "%", "/", "^"]))
        le = draw(num_expr(depth=depth - 1))
        if op in ("%", "/"):
            return f"(({le}) {op} {draw(st.integers(2, 9))})"
        if op == "^":
            return f"(({le}) ^ {draw(st.integers(0, 3))})"
        re_ = draw(num_expr(depth=depth - 1))
        return f"(({le}) {op} ({re_}))"
    if kind == "length":
        return draw(st.sampled_from(
            ["length($2)", "length($0)", "length($1 $3)"]))
    if kind == "index":
        w = draw(st.sampled_from(["a", "z", "1", "c"]))
        return f'index(${draw(st.integers(1, 3))}, "{w}")'
    if kind == "ternary":
        c = draw(bool_expr(depth=1))
        t = draw(num_expr(depth=depth - 1))
        f = draw(num_expr(depth=depth - 1))
        return f"(({c}) ? ({t}) : ({f}))"
    i = draw(num_expr(depth=depth - 1))
    return f"(-({i}))"


@st.composite
def bool_expr(draw, depth=1):
    if depth == 0:
        kind = draw(st.sampled_from(["cmp", "match"]))
        if kind == "match":
            pat = draw(st.sampled_from(
                ["a", "[0-9]", "^1", "z$", "a1", "[a-c]k?"]))
            neg = draw(st.sampled_from(["~", "!~"]))
            return f"(${draw(st.integers(1, 3))} {neg} /{pat}/)"
        op = draw(st.sampled_from(["<", ">", "<=", ">=", "==", "!="]))
        le = draw(st.sampled_from(["$1", "$2", "$3", "NR", "NF"]))
        re_ = draw(st.sampled_from(
            ["$1", "$2", "$3", str(draw(st.integers(-20, 20))),
             '"10"', '"abc"', '"9"']))
        return f"({le} {op} {re_})"
    kind = draw(st.sampled_from(["andor", "not", "leaf", "leaf"]))
    if kind == "andor":
        op = draw(st.sampled_from(["&&", "||"]))
        le = draw(bool_expr(depth=depth - 1))
        re_ = draw(bool_expr(depth=depth - 1))
        return f"(({le}) {op} ({re_}))"
    if kind == "not":
        return f"(!({draw(bool_expr(depth=depth - 1))}))"
    return draw(bool_expr(depth=0))


@st.composite
def str_expr(draw):
    kind = draw(st.sampled_from(
        ["field", "case", "substr", "concat", "sprintf"]))
    if kind == "field":
        return f"${draw(st.integers(0, 3))}"
    if kind == "case":
        fn = draw(st.sampled_from(["toupper", "tolower"]))
        return f"{fn}(${draw(st.integers(1, 3))})"
    if kind == "substr":
        return (f"substr(${draw(st.integers(1, 3))}, "
                f"{draw(st.integers(1, 3))}, {draw(st.integers(1, 4))})")
    if kind == "concat":
        a = f"${draw(st.integers(1, 3))}"
        return f'({a} "-" ${draw(st.integers(1, 3))})'
    # r8 verdict ask #7: widened into printf's edge formats —
    # %x/%o/%e/%E, flag/width/precision combos, and width/precision
    # taken FROM ARGUMENTS (%*d, %.*f).  Negative values stay out of
    # the %x/%o lane: mawk prints 0 where gawk/goawk print the
    # unsigned 64-bit pattern (POSIX leaves it undefined).
    kind2 = draw(st.sampled_from(["plain", "plain", "edge", "star"]))
    if kind2 == "edge":
        fmt = draw(st.sampled_from(
            ["%x", "%X", "%o", "%e", "%E", "%5d", "%-6d", "%05d",
             "%8.2f", "%+d", "% d", "%.3e", "%.0f", "%i"]))
        n = draw(num_expr(depth=1))
        # abs() keeps the %x/%o lane nonneg; harmless elsewhere
        nn = f"(({n}) < 0 ? -({n}) : ({n}))" \
            if fmt in ("%x", "%X", "%o") else n
        return f'sprintf("{fmt}|%s", {nn}, $2)'
    if kind2 == "star":
        w = draw(st.integers(1, 8))
        p = draw(st.integers(0, 3))
        conv = draw(st.sampled_from(["%*d", "%-*d", "%.*f", "%*.*f"]))
        n = draw(num_expr(depth=1))
        if conv == "%.*f":
            return f'sprintf("%.*f", {p}, {n})'
        if conv == "%*.*f":
            return f'sprintf("%*.*f", {w}, {p}, {n})'
        return f'sprintf("{conv}|", {w}, {n})'
    fmt = draw(st.sampled_from(["%d|%s", "%.2f:%s", "[%g]%s"]))
    n = draw(num_expr(depth=1))
    return f'sprintf("{fmt}", {n}, $2)'


@st.composite
def action(draw):
    kind = draw(st.sampled_from(
        ["printnum", "printnum", "printstr", "accum", "iffy",
         "loop", "fieldset", "arr", "gsubv"]))
    if kind == "printnum":
        return f"print {draw(num_expr(depth=draw(st.integers(1, 2))))}"
    if kind == "printstr":
        e = draw(str_expr())
        sep = draw(st.booleans())
        return f"print {e}, $1" if sep else f"print {e}"
    if kind == "accum":
        op = draw(st.sampled_from(["+=", "-=", "*="]))
        return f"s {op} {draw(num_expr(depth=1))}"
    if kind == "iffy":
        c = draw(bool_expr(depth=1))
        a = f"print {draw(num_expr(depth=1))}"
        b = f'print "E", {draw(num_expr(depth=1))}'
        return f"if ({c}) {{ {a} }} else {{ {b} }}"
    if kind == "loop":
        n = draw(st.integers(1, 3))
        return (f"for (i = 1; i <= {n}; i++) print i, "
                f"{draw(num_expr(depth=1))}")
    if kind == "fieldset":
        w = draw(st.sampled_from(_WORDS))
        return f'$2 = "{w}"; print $0; print NF'
    if kind == "arr":
        return (f"a[$1] += {draw(num_expr(depth=1))}; "
                f'print a[$1]')
    pat = draw(st.sampled_from(["a", "[0-9]", "k", "z"]))
    # "&" in the replacement is the matched text; "\\&" (awk-source
    # "\\\\&") is a literal ampersand — POSIX sub/gsub semantics
    rep = draw(st.sampled_from(["X", "", "<>", "<&>", "&&", "\\\\&"]))
    fn = draw(st.sampled_from(["sub", "gsub"]))
    return (f'v = $2; n = {fn}(/{pat}/, "{rep}", v); '
            f"print n, v")


@st.composite
def program(draw):
    rules = []
    if draw(st.booleans()):
        rules.append(f"BEGIN {{ s = {draw(st.integers(-5, 5))} }}")
    n_rules = draw(st.integers(1, 3))
    for _ in range(n_rules):
        body = "; ".join(draw(action())
                         for _ in range(draw(st.integers(1, 2))))
        if draw(st.booleans()):
            rules.append(f"{draw(bool_expr(depth=1))} {{ {body} }}")
        else:
            rules.append(f"{{ {body} }}")
    if draw(st.booleans()):
        rules.append('END { print "S", s; print "NR", NR }')
    return "\n".join(rules)


def _outputs_match(got: str, want: str) -> bool:
    """Exact match, with ONE documented allowance: mawk prints
    integral doubles beyond C-long range through OFMT ("2.35795e+09")
    where POSIX/gawk/goawk — and this interpreter — print them as
    integers ("2357947691").  Accept when the interpreter token is an
    integer ≥ 2^31 whose %.6g rendering equals mawk's token."""
    if got == want:
        return True
    gl, wl = got.splitlines(), want.splitlines()
    if len(gl) != len(wl):
        return False
    for g, w in zip(gl, wl):
        if g == w:
            continue
        gt, wt = g.split(" "), w.split(" ")
        if len(gt) != len(wt):
            return False
        for a, b in zip(gt, wt):
            if a == b:
                continue
            try:
                v = int(a)
            except ValueError:
                return False
            if abs(v) < 1 << 31 or ("%.6g" % v) != b:
                return False
    return True


def _run_mawk(prog: str, records: list[str]) -> tuple[str, int]:
    res = subprocess.run(["mawk", prog], capture_output=True,
                         input="".join(r + "\n" for r in records),
                         text=True, timeout=30)
    return res.stdout, res.returncode


@settings(max_examples=EXAMPLES, deadline=None, derandomize=not _SOAK,
          suppress_health_check=[HealthCheck.too_slow])
@given(program(), st.lists(_RECORD, min_size=4, max_size=4))
def test_awk_interp_matches_mawk(prog, records):
    from benthos_spark.operators.awk_lang import Interp, parse_program

    want, code = _run_mawk(prog, records)
    assert code == 0, f"mawk rejected generated prog: {prog!r}"
    interp = Interp(parse_program(prog))
    interp.run(records)
    got = interp.output()
    assert _outputs_match(got, want), (
        f"interp={got!r} mawk={want!r} prog={prog!r} "
        f"records={records!r}")


def test_awk_strnum_comparison_pins():
    """POSIX strnum: field-derived numeric-looking strings compare
    numerically against numbers AND against other strnums; string
    CONSTANTS stay string comparisons ("10" < "9" is true)."""
    from benthos_spark.operators.awk_lang import Interp, parse_program

    prog = ('{ print ($1 < $2), ($1 < "9"), ($1 == 10), '
            '($3 == "abc"), ($1 "" < $2 "") }')
    interp = Interp(parse_program(prog))
    interp.run(["10 9 abc"])
    want, code = _run_mawk(prog, ["10 9 abc"])
    assert code == 0 and interp.output() == want
