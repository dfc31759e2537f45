"""jq processor (lib/processor/jq.go) — subset compiler + interpreter."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.jq import (JQCompileError, JQError,
                                        jq_eval_text, jq_static_path,
                                        jq_transform, parse_jq)


def run(query, value, raw=False, metadata=None):
    text = value if raw else json.dumps(value)
    out = jq_eval_text(parse_jq(query), text, raw=raw, metadata=metadata)
    return out if out is None else json.loads(out)


# ---------------------------------------------------------------- eval

def test_paths_and_identity():
    assert run(".", {"a": 1}) == {"a": 1}
    assert run(".a.b", {"a": {"b": 7}}) == 7
    assert run(".a.b", {"a": {}}) is None or run(".a.b", {"a": {}}) == None
    assert run(".xs[1]", {"xs": [10, 20, 30]}) == 20
    assert run(".xs[-1]", {"xs": [10, 20]}) == 20


def test_docs_cities_example():
    """The jq.go:66-88 documented example, verbatim semantics."""
    doc = {"locations": [
        {"name": "Seattle", "state": "WA"},
        {"name": "New York", "state": "NY"},
        {"name": "Bellevue", "state": "WA"},
        {"name": "Olympia", "state": "WA"}]}
    q = ('{Cities: .locations | map(select(.state == "WA").name) '
         '| sort | join(", ")}')
    assert run(q, doc) == {"Cities": "Bellevue, Olympia, Seattle"}


def test_multiple_values_become_array_and_empty_filters():
    assert run(".xs[]", {"xs": [1, 2, 3]}) == [1, 2, 3]
    assert run(".a, .b", {"a": 1, "b": 2}) == [1, 2]
    # select with no match emits nothing → None = message filtered
    assert run("select(.a > 5)", {"a": 1}) is None
    assert run("empty", {"a": 1}) is None


def test_operators_and_functions():
    assert run(".a + .b", {"a": 1, "b": 2}) == 3
    assert run('.s + "!"', {"s": "hi"}) == "hi!"
    assert run(".xs + [4]", {"xs": [1]}) == [1, 4]
    assert run(".o + {b: 2}", {"o": {"a": 1}}) == {"a": 1, "b": 2}
    assert run(".a // 9", {"a": None}) == 9
    assert run(".xs | length", {"xs": [1, 2]}) == 2
    assert run("keys", {"b": 1, "a": 2}) == ["a", "b"]
    assert run(".xs | add", {"xs": [1, 2, 3]}) == 6
    assert run(".xs | unique", {"xs": [3, 1, 3]}) == [1, 3]
    assert run('.s | split(",")', {"s": "a,b"}) == ["a", "b"]
    assert run('.s | test("^a")', {"s": "abc"}) is True
    assert run(".n | tostring", {"n": 5}) == "5"
    assert run('.s | tonumber', {"s": "5"}) == 5
    assert run(".xs | map(. * 2)", {"xs": [1, 2]}) == [2, 4]
    assert run(".xs | sort_by(.k)", {"xs": [{"k": 2}, {"k": 1}]}) \
        == [{"k": 1}, {"k": 2}]
    assert run("[range(3)]", None) == [0, 1, 2]
    assert run(".a and .b", {"a": True, "b": False}) is False
    assert run(".a or .b", {"a": False, "b": True}) is True
    assert run(".s | ascii_upcase", {"s": "hi"}) == "HI"
    assert run('.s | ltrimstr("ab")', {"s": "abc"}) == "c"
    assert run(".x | type", {"x": []}) == "array"
    assert run(".xs | reverse | first", {"xs": [1, 2, 3]}) == 3


def test_raw_and_metadata():
    assert run(". | length", "hello", raw=True) == 5
    assert run("$metadata.topic", {"a": 1},
               metadata={"topic": "t1"}) == "t1"


def test_errors():
    with pytest.raises(JQError):
        run(".a + .b", {"a": [], "b": 1})
    with pytest.raises(JQError):
        run(".[]", 42)
    assert run(".[]?", 42) is None          # ? suppresses the error
    assert run(".a as $x | $x", {"a": 7}) == 7      # bindings now work
    assert run("def f: . + 1; f", 2) == 3           # defs now work
    # formats and destructuring patterns are supported now; a bad
    # format name is still a build-time error
    with pytest.raises(JQCompileError):
        parse_jq("@nosuchformat")


# ---------------------------------------------------------------- static

def test_static_path_detection():
    assert jq_static_path(parse_jq(".a.b.c")) == "$.a.b.c"
    assert jq_static_path(parse_jq(".a[0].b")) == "$.a[0].b"
    assert jq_static_path(parse_jq(".")) == "$"
    assert jq_static_path(parse_jq(".a | .b")) is None
    assert jq_static_path(parse_jq(".a + 1")) is None


# ---------------------------------------------------------------- spark

def test_jq_transform_static_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [('{"a":{"b":3}}',), ('{"a":{}}',)], "content STRING")
    out = jq_transform(df, ".a.b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan          # fast path: no Python at all
    rows = {r.content for r in out.collect()}
    assert rows == {"3", "null"}


def test_jq_transform_general(spark):
    df = spark.createDataFrame(
        [('{"xs":[1,2,3],"k":"a"}',), ('{"xs":[],"k":"b"}',)],
        "content STRING")
    out = jq_transform(df, "{k: .k, n: .xs | length, s: .xs | add}")
    got = {json.loads(r.content)["k"]: json.loads(r.content)
           for r in out.collect()}
    assert got["a"]["n"] == 3 and got["a"]["s"] == 6
    assert got["b"]["s"] is None


def test_jq_transform_filters_and_errors(spark):
    df = spark.createDataFrame(
        [('{"v":1}',), ('{"v":9}',), ('not json',)], "content STRING")
    out = jq_transform(df, "select(.v > 5)").collect()
    # v=1 emits nothing → filtered; bad JSON → error, content unchanged
    by_content = {r.content: r for r in out}
    assert set(by_content) == {'{"v":9}', "not json"}
    assert by_content["not json"]._error and "jq" in by_content["not json"]._error
    assert by_content['{"v":9}']._error is None


def test_jq_transform_metadata(spark):
    df = (spark.createDataFrame([('{"v":1}',)], "content STRING")
          .withColumn("meta", F.create_map(F.lit("site"), F.lit("eu"))))
    out = jq_transform(df, '{v: .v, site: $metadata.site}').collect()
    assert json.loads(out[0].content) == {"v": 1, "site": "eu"}


def test_jq_yaml_config(spark):
    from benthos_spark.stream import build_stream
    out = build_stream(spark, r"""
input:
  generate:
    count: 6
    mapping: |
      root.content = "{\"v\":" + this.id.string() + "}"
pipeline:
  processors:
    - jq:
        query: "select(.v > 2) | .v * 10"
output:
  memory: {}
""")
    assert sorted(r.content for r in out.collect()) == ["30", "40", "50"]


# ------------------------------------------------- jq manual vectors

# (program, input-as-python, expected list of outputs) — re-expressed
# from the public jq 1.6/1.7 manual examples for the round-4 surface:
# reduce/foreach, try/catch, def (filter + value params, recursion),
# the assignment family over path expressions, if/elif/else, as-
# bindings, string interpolation, and the extended builtin set.
MANUAL_VECTORS = [
    ("reduce .[] as $x (0; . + $x)", [1, 2, 3, 4, 5], [15]),
    ("foreach .[] as $item (0; . + $item)", [10, 2, 5, 3],
     [10, 12, 17, 20]),
    ("foreach .[] as $item (0; . + $item; [$item, . * 2])",
     [10, 2, 5], [[10, 20], [2, 24], [5, 34]]),
    ('try error("oops") catch .', None, ["oops"]),
    ('try .a catch "err"', 1, ["err"]),
    ("[.[] | try tonumber]", ["1", "bad", "3"], [[1, 3]]),
    ("def inc: . + 1; [.[] | inc]", [1, 2, 3], [[2, 3, 4]]),
    ("def f(x): x | x; f(.+1)", 1, [3]),
    ("def fact: if . <= 1 then 1 else . * (. - 1 | fact) end; fact",
     5, [120]),
    ("def add($a; $b): $a + $b; add(1; 2)", None, [3]),
    ("reduce range(1; 6) as $i (1; . * $i)", None, [120]),
    (".a |= . + 1", {"a": 1, "b": 2}, [{"a": 2, "b": 2}]),
    (".a = .b", {"a": 1, "b": 2}, [{"a": 2, "b": 2}]),
    (".[] |= . * 2", [1, 2, 3], [[2, 4, 6]]),
    (".a += 10", {"a": 1}, [{"a": 11}]),
    ("(.a, .b) = 0", {"a": 1, "b": 2}, [{"a": 0, "b": 0}]),
    ('.posts[0].title = "x"', {"posts": [{}]},
     [{"posts": [{"title": "x"}]}]),
    (".a //= 5", {"a": None}, [{"a": 5}]),
    (".a.b |= empty", {"a": {"b": 1, "c": 2}}, [{"a": {"c": 2}}]),
    ('if . > 5 then "big" elif . > 2 then "mid" else "small" end',
     3, ["mid"]),
    ('if . then "t" end', False, [False]),
    (".x as $v | {saved: $v, double: (.y * 2)}", {"x": 1, "y": 3},
     [{"saved": 1, "double": 6}]),
    ('"\\(.a) and \\(.b)"', {"a": 1, "b": "two"}, ["1 and two"]),
    ("[limit(3; .[])]", [1, 2, 3, 4, 5], [[1, 2, 3]]),
    ("[range(2;8;2)]", None, [[2, 4, 6]]),
    ("first(.[] | select(. > 2))", [1, 2, 3, 4], [3]),
    ("to_entries", {"a": 1, "b": 2},
     [[{"key": "a", "value": 1}, {"key": "b", "value": 2}]]),
    ("from_entries", [{"key": "a", "value": 1}], [{"a": 1}]),
    ("with_entries(.value += 1)", {"a": 1, "b": 2},
     [{"a": 2, "b": 3}]),
    ("any(. > 2)", [1, 2, 3], [True]),
    ("all(. > 0)", [1, 2, 3], [True]),
    ("path(.a[0].b)", None, [["a", 0, "b"]]),
    ('getpath(["a","b"])', {"a": {"b": 7}}, [7]),
    ('setpath(["a","b"]; 9)', {}, [{"a": {"b": 9}}]),
    ('delpaths([["a"],["b",0]])', {"a": 1, "b": [5, 6], "c": 3},
     [{"b": [6], "c": 3}]),
    ("group_by(.k)", [{"k": 1, "v": "a"}, {"k": 2}, {"k": 1, "v": "b"}],
     [[[{"k": 1, "v": "a"}, {"k": 1, "v": "b"}], [{"k": 2}]]]),
    ("unique_by(.k)",
     [{"k": 1, "v": "a"}, {"k": 1, "v": "b"}, {"k": 2}],
     [[{"k": 1, "v": "a"}, {"k": 2}]]),
    ("min_by(.x), max_by(.x)", [{"x": 3}, {"x": 1}, {"x": 2}],
     [{"x": 1}, {"x": 3}]),
    ("[..]", [[1]], [[[[1]], [1], 1]]),
    ('contains("bar")', "foobar", [True]),
    ('contains({"a":[1]})', {"a": [1, 2], "b": 1}, [True]),
    ("tojson", {"a": 1}, ['{"a":1}']),
    ("fromjson", "[1,2]", [[1, 2]]),
    ('capture("(?P<user>[a-z]+)-(?P<id>[0-9]+)")', "ab-12",
     [{"user": "ab", "id": "12"}]),
    ('gsub("(?P<x>[aeiou])"; "[\\(.x)]")', "hello", ["h[e]ll[o]"]),
    ('sub("l+"; "L")', "hello", ["heLo"]),
    ("until(. > 100; . * 2)", 1, [128]),
    ("[while(. < 20; . * 2)]", 1, [[1, 2, 4, 8, 16]]),
    ("recurse(if . > 0 then . - 1 else empty end)", 2, [2, 1, 0]),
    (".a[-1]", {"a": [1, 2, 3]}, [3]),
    ('.["a b"]', {"a b": 4}, [4]),
    ('."a b"', {"a b": 4}, [4]),
    (".a | .b |= . + 1", {"a": {"b": 1}}, [{"b": 2}]),
    # --- round-4 additions: slices, formats, destructuring, dates ---
    (".[1:3]", [1, 2, 3, 4], [[2, 3]]),
    (".[1:3]", "abcde", ["bc"]),
    (".[:2]", [1, 2, 3], [[1, 2]]),
    (".[-2:]", [1, 2, 3], [[2, 3]]),
    (".a[1:]", {"a": [1, 2, 3]}, [[2, 3]]),
    ("@base64", "hi", ["aGk="]),
    ("@base64d", "aGk=", ["hi"]),
    ("@csv", [1, "a,b", None], ['1,"a,b",']),
    ("@tsv", ["a\tb", 2], ["a\\tb\t2"]),
    ("@uri", "a b&c", ["a%20b%26c"]),
    ("@html", "<i>", ["&lt;i&gt;"]),
    ("@sh", ["a b", "c"], ["'a b' 'c'"]),
    ('@base64 "x\\(.)y"', "Q", ["xUQ==y"]),
    ("{a: 1, c: {d: 1}} * {b: 2, c: {e: 2}}", None,
     [{"a": 1, "b": 2, "c": {"d": 1, "e": 2}}]),
    ('"ab" * 3', None, ["ababab"]),
    ('"ab" * 0', None, [None]),
    ("[.[] | numbers]", [1, "a", None, 2], [[1, 2]]),
    ("[paths]", {"a": {"b": 1}}, [[["a"], ["a", "b"]]]),
    ("[leaf_paths]", {"a": {"b": 1}}, [[["a", "b"]]]),
    ("keys_unsorted", {"b": 1, "a": 2}, [["b", "a"]]),
    ('[splits(",")]', "a,b", [["a", "b"]]),
    ("explode", "hi", [[104, 105]]),
    ("implode", [104, 105], ["hi"]),
    ('indices(",")', "a,b,c", [[1, 3]]),
    ("indices([1,2])", [0, 1, 2, 1, 2], [[1, 3]]),
    ("utf8bytelength", "\u00fc", [2]),
    ("todate", 1700000000, ["2023-11-14T22:13:20Z"]),
    ("fromdate", "2023-11-14T22:13:20Z", [1700000000]),
    ("gmtime | mktime", 1700000000, [1700000000]),
    ('strftime("%Y")', 1700000000, ["2023"]),
    ('strptime("%Y-%m-%d") | mktime', "2023-01-02", [1672617600]),
    ("isnan", 1, [False]),
    ("infinite > 1e308", None, [True]),
    (".[] as [$a, $b] | $a + $b", [[1, 2], [3, 4]], [3, 7]),
    (". as {a: $x, $b} | [$x, $b]", {"a": 1, "b": 2}, [[1, 2]]),
    ("env | type", None, ["object"]),
    ("$ENV | type", None, ["object"]),
    # modal string lexer: nested strings/interpolations inside \( )
    ('"\\(.a // "x")"', {}, ["x"]),
    ('"a\\(.x | join(")"))b"', {"x": ["1", "2"]}, ["a1)2b"]),
    ('"outer \\("inner \\(.v)")"', {"v": 7}, ["outer inner 7"]),
]


@pytest.mark.parametrize("prog,inp,want", MANUAL_VECTORS)
def test_jq_manual_vectors(prog, inp, want):
    out = jq_eval_text(parse_jq(prog), json.dumps(inp))
    got = json.loads(out)
    assert got == (want[0] if len(want) == 1 else want)


def test_jq_def_scoping_and_closures():
    # filter params are call-by-name closures over the caller's env:
    # $n resolves at the argument site even though `twice` never
    # binds it
    assert run(".n as $n | def twice(f): f | f; .n | twice(. + $n)",
               {"n": 5}) == 15
    # shadowing: the later def wins for the rest of its scope
    assert run("def f: 1; def f: 2; f", None) == 2
    # value params fan out over streams
    assert run("def g($x): $x * 10; [g(.[])]", [1, 2]) == [10, 20]


def test_jq_assignment_invalid_path_errors():
    with pytest.raises(JQError):
        run("(.a + 1) = 5", {"a": 1})
    with pytest.raises(JQCompileError):
        parse_jq(".a = .b = 1")  # nonassoc


def test_jq_match_builtin():
    """`match` (jq manual): match objects with codepoint offsets, "g"
    streams every match, named captures via Oniguruma `(?<name>…)`
    syntax (translated to Python's `(?P<name>…)` internally), and
    non-participating groups carry offset -1 / string null — all
    verified against system jq 1.6."""
    assert run('[match("a"; "g") | .offset]', "azbza") == [0, 4]
    m = run('match("(?<h>a)(x)?")', "za")
    assert m == {"offset": 1, "length": 1, "string": "a",
                 "captures": [
                     {"offset": 1, "length": 1, "string": "a",
                      "name": "h"},
                     {"offset": -1, "length": 0, "string": None,
                      "name": None}]}
    # "i" flag + no match → empty stream (run returns None)
    assert run('[match("AB"; "ig") | .string]', "abxAb") == ["ab", "Ab"]
    assert run('[match("q")]', "abc") == []
    # unicode offsets are codepoints, not bytes
    assert run('match("b").offset', "ä½b") == 2
    with pytest.raises(JQError):
        run('match("a"; "q")', "a")


def test_jq_named_group_translation_in_capture_sub():
    """jq's `(?<x>…)` named groups must work in capture/sub/gsub/test
    too — Python re only accepts `(?P<x>…)`, so the clean-room engine
    translates (lookbehind `(?<=`/`(?<!` untouched)."""
    assert run('capture("(?<w>[a-z]+)")', "ab cd") == {"w": "ab"}
    # "g" streams one capture object per match (r9 fuzzer find)
    assert run('[capture("(?<w>[a-z]+)"; "g") | .w]', "ab cd") \
        == ["ab", "cd"]
    assert run('[capture("a"; "g")]', "alpha") == [{}, {}]
    assert run('sub("(?<f>a)"; "<\\(.f)>")', "ab") == "<a>b"
    assert run('test("(?<=a)b")', "ab") is True
    assert run('[splits("a"; "i")]', "zAk") == ["z", "k"]


def test_jq_splits_ignores_capture_groups():
    """r9 fuzzer find: Python re.split interleaves capture-group text
    into the result; jq splits only on the match spans."""
    assert run('[splits("(?<g1>[a-z]+)")]', "alpha") == ["", ""]
    assert run('[splits("(x)|(,)")]', "a,bxc") == ["a", "b", "c"]
    assert run('[splits("a+")]', "") == [""]
    assert run('[splits("z")]', "abc") == ["abc"]
