"""Direct tests for the dynamic-document interpreter (bloblang/
interp.py) and the v3 legacy content-doctrine processors it powers
(operators/legacy_doc.py: json/text/unarchive-content)."""

from __future__ import annotations

import pytest

from benthos_spark.bloblang.interp import Interp, compile_template
from benthos_spark.bloblang.parser import parse_query

# Soak/parity tier: excluded from the default fast run the driver's
# verify budget can finish (pytest.ini); run with -m slow.
pytestmark = __import__('pytest').mark.slow


def ev(src, doc=None, meta=None, content=None):
    return Interp(doc, meta, content).eval(parse_query(src))


def test_interp_paths_and_coalesce():
    doc = {"foo": {"bar": {"baz": 7}}, "arr": [1, 2, 3]}
    assert ev("this.foo.bar.baz", doc) == 7
    assert ev("foo.bar.baz", doc) == 7
    assert ev("this.foo.(missing | bar).baz", doc) == 7
    assert ev("this.nope | 42", doc) == 42
    assert ev("this.arr.1", doc) == 2


def test_interp_arithmetic_string_numbers():
    # text.go themes: "3" + 7 coerces numerically
    assert ev('json("a").number() + json("b").number()',
              {"a": 7, "b": "3"}) == 10
    assert ev('json("a").number() == json("b").number()',
              {"a": 3, "b": "3"}) is True


def test_interp_match_and_lambda():
    doc = {"v": 12, "xs": [1, 8, 20]}
    assert ev('match this.v { this > 10 => "big", _ => "small" }',
              doc) == "big"
    assert ev("this.xs.filter(x -> x > 5)", doc) == [8, 20]
    assert ev("this.xs.map_each(x -> x * 2)", doc) == [2, 16, 40]


def test_template_rendering_go_style():
    r = compile_template(
        'total: ${! json("a").number() + json("b").number() }')
    assert r({"a": 2, "b": 3}) == "total: 5"
    # missing → "null", floats print Go-style
    r2 = compile_template("${! this.nope }")
    assert r2({}) == "null"


def test_json_processor_set_and_delete(spark):
    from benthos_spark.stream import run_stream
    out = run_stream(spark, """
input:
  generate:
    count: 1
    mapping: |
      root.content = "{\\"keep\\":1,\\"drop\\":2}"
pipeline:
  processors:
    - json: {operator: set, path: added, value: '${!json_field:keep}'}
    - json: {operator: delete, path: drop}
output: {memory: {}}
""")
    # YAML value is json.Marshal'd before interpolation
    # (rawJSONValue.UnmarshalYAML) so the rendered "1" stays a string
    assert out.collect()[0].content == '{"added":"1","keep":1}'


def test_text_processor_ops(spark):
    from benthos_spark.stream import run_stream
    out = run_stream(spark, """
input:
  generate:
    count: 1
    mapping: |
      root.content = "hello"
pipeline:
  processors:
    - text: {operator: to_upper}
    - text: {operator: append, value: " WORLD"}
output: {memory: {}}
""")
    assert out.collect()[0].content == "HELLO WORLD"


def test_unarchive_content_json_array(spark):
    from benthos_spark.stream import run_stream
    out = run_stream(spark, """
input:
  generate:
    count: 1
    mapping: |
      root.content = "[{\\"n\\":1},{\\"n\\":2},{\\"n\\":3}]"
pipeline:
  processors:
    - unarchive: {format: json_array}
output: {memory: {}}
""")
    assert sorted(r.content for r in out.collect()) == [
        '{"n":1}', '{"n":2}', '{"n":3}']


def test_unarchive_content_json_map_sets_archive_key(spark):
    from benthos_spark.datamodel import rows_to_messages
    from benthos_spark.operators.legacy_doc import unarchive_content_stage
    df = rows_to_messages(spark, [
        {"content": '{"a":{"v":1},"b":{"v":2}}', "meta": {}}])
    rows = unarchive_content_stage(df, "json_map") \
        .orderBy("part_index").collect()
    assert [r.content for r in rows] == ['{"v":1}', '{"v":2}']
    assert [r.meta.get("archive_key") for r in rows] == ["a", "b"]


def test_interp_unknown_surface_raises():
    from benthos_spark.bloblang.interp import EvalError
    with pytest.raises(EvalError, match="not interpretable"):
        ev('this.x.nonexistent_method_xyz()', {"x": "s"})


# ---- dynamic full-mapping interpreter (recursive named maps) ----

WALK = '''
map unescape_values {
  root = match {
    this.type() == "object" => this.map_each(this.value.apply("unescape_values")),
    this.type() == "array" => this.map_each(this.apply("unescape_values")),
    this.type() == "string" => this.unescape_html(),
    _ => this,
  }
}
root = this.or(content()).apply("unescape_values")
'''


def _run_dyn(src, content, meta=None):
    from benthos_spark.bloblang.interp import DynamicMapping
    from benthos_spark.bloblang.parser import parse_mapping
    return DynamicMapping(parse_mapping(src)).run_one(content, meta or {})


def test_dynamic_mapping_recursive_walk():
    c, _ = _run_dyn(WALK, 'foo &amp; bar')
    assert c == 'foo & bar'
    c, _ = _run_dyn(WALK, '["foo &amp; bar",10,"1 &lt; 2"]')
    assert c == '["foo & bar",10,"1 < 2"]'
    c, _ = _run_dyn(
        WALK, '{"first":{"nested":"foo &amp; bar"},"second":10}')
    assert c == '{"first":{"nested":"foo & bar"},"second":10}'


def test_dynamic_mapping_deleted_and_meta():
    c, _ = _run_dyn('root = deleted()', '{"a":1}')
    assert c is None
    c, m = _run_dyn('meta foo = "bar"\nroot.x = this.a + 1', '{"a":1}')
    assert c == '{"x":2}' and m["foo"] == "bar"
    # unassigned root passes content through unchanged
    c, _ = _run_dyn('meta k = "v"', 'raw text')
    assert c == 'raw text'


def test_dynamic_mapping_recursion_limit():
    from benthos_spark.bloblang.interp import EvalError
    src = 'map f { root = this.apply("f") }\nroot = this.apply("f")'
    with pytest.raises((EvalError, RecursionError)):
        _run_dyn(src, '{"a":1}')


def test_mapping_is_recursive_detection():
    from benthos_spark.bloblang.compiler import mapping_is_recursive
    from benthos_spark.bloblang.parser import parse_mapping
    assert mapping_is_recursive(parse_mapping(WALK))
    # mutual recursion
    assert mapping_is_recursive(parse_mapping(
        'map a { root = this.apply("b") }\n'
        'map b { root = this.apply("a") }\n'
        'root = this.apply("a")'))
    # non-recursive apply chain stays on the compiled path
    assert not mapping_is_recursive(parse_mapping(
        'map a { root = this.apply("b") }\n'
        'map b { root = this.x }\n'
        'root = this.apply("a")'))


# ---- differential gate: dynamic interpreter ≡ compiled engine ----

_DIFF_MAPPINGS = [
    'root.id = this.id\nroot.s = this.a + this.d.y\n'
    'root.t = this.b.uppercase()',
    'root.id = this.id\nroot.n = this.c.sum()\n'
    'root.m = this.c.map_each(x -> x * 2)',
    'root.id = this.id\nroot.k = if this.a > 50 { "big" } else { "small" }',
    'root.id = this.id\nroot.j = this.d.collapse()',
    'root.id = this.id\nroot.w = match { this.e => "yes", _ => "no" }',
    'root.id = this.id\nroot.f = this.b.split("-").length()',
    'root.id = this.id\nroot.g = this.c.filter(x -> x > 10)',
    'root.id = this.id\nroot.u = this.b.contains("x")',
    'root.id = this.id\nroot.v = this.a.string()',
]


def _unify_nums(v):
    import json as _j
    if type(v).__name__ == "VariantVal":
        return _unify_nums(_j.loads(v.toJson()))
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        return int(f) if f == int(f) else f
    if isinstance(v, list):
        return [_unify_nums(x) for x in v]
    if isinstance(v, dict):
        return {k: _unify_nums(x) for k, x in v.items()}
    return v


def test_dynamic_interp_matches_compiled_engine(spark):
    """The same mapping through the static column compiler and the
    dynamic per-document interpreter must produce the same documents —
    the fallback may be slower, never different."""
    import json
    import random

    from pyspark.sql import functions as F

    from benthos_spark.bloblang import compile_mapping
    from benthos_spark.bloblang.interp import DynamicMapping
    from benthos_spark.bloblang.parser import parse_mapping

    rng = random.Random(20260814)
    docs = []
    for i in range(25):
        docs.append({
            "id": i,
            "a": rng.randint(0, 100),
            "b": "-".join(rng.choice(["foo", "bar", "axe", "qux"])
                          for _ in range(3)),
            "c": [rng.randint(0, 20) for _ in range(4)],
            "d": {"x": rng.choice(["u", "v"]),
                  "y": round(rng.uniform(0, 10), 2)},
            "e": rng.random() < 0.5,
        })
    doc_jsons = [json.dumps(d) for d in docs]
    base = spark.read.json(spark.sparkContext.parallelize(doc_jsons))
    for mapping in _DIFF_MAPPINGS:
        this = F.struct(*[F.col(c) for c in base.columns])
        rows = compile_mapping(mapping).apply(base, this=this).collect()
        got = {r["id"]: _unify_nums(
            {k: v for k, v in r.asDict(recursive=True).items()})
            for r in rows}
        dyn = DynamicMapping(parse_mapping(mapping))
        for dj, d in zip(doc_jsons, docs):
            c, _ = dyn.run_one(dj, {})
            want = _unify_nums(json.loads(c))
            assert got[d["id"]] == want, \
                (mapping, d, got[d["id"]], want)

def test_dynamic_interp_matches_compiled_row_drop(spark):
    """deleted() whole-root branches drop the same rows on both
    engines."""
    import json

    from pyspark.sql import functions as F

    from benthos_spark.bloblang import compile_mapping
    from benthos_spark.bloblang.interp import DynamicMapping
    from benthos_spark.bloblang.parser import parse_mapping

    mapping = ('root = if this.a > 50 { deleted() } else { this }')
    docs = [{"id": i, "a": a} for i, a in
            enumerate([10, 60, 50, 51, 100, 0])]
    doc_jsons = [json.dumps(d) for d in docs]
    base = spark.read.json(spark.sparkContext.parallelize(doc_jsons))
    this = F.struct(*[F.col(c) for c in base.columns])
    rows = compile_mapping(mapping).apply(base, this=this).collect()
    kept_compiled = sorted(r["id"] for r in rows)
    dyn = DynamicMapping(parse_mapping(mapping))
    kept_dynamic = sorted(
        d["id"] for dj, d in zip(doc_jsons, docs)
        if dyn.run_one(dj, {})[0] is not None)
    assert kept_compiled == kept_dynamic == [0, 2, 5]


# ---- interp-fallback telemetry (VERDICT r4 ask #6) ----

def test_interp_fallback_warning_and_counter(spark):
    """A mapping-forced fallback to the dynamic interpreter must warn
    at compile time (InterpFallbackWarning naming the construct) and
    increment the reason-keyed counter; the normal pure-message
    doctrine path counts but does NOT warn."""
    import warnings

    from pyspark.sql import functions as F

    from benthos_spark.bloblang.compiler import (INTERP_FALLBACK_COUNTS,
                                                 InterpFallbackWarning,
                                                 map_text)

    # a frame mixing content with typed columns would take the
    # columnar path — the recursive map forces the interpreter
    df = spark.createDataFrame(
        [(0, 0, '{"a":"x &amp; y"}', {"k": "v"})],
        "batch_id long, part_index int, content string, "
        "meta map<string,string>").withColumn("extra", F.lit(1))

    before = dict(INTERP_FALLBACK_COUNTS)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = map_text(df, WALK).collect()
    assert out and '&' in out[0]["content"] or out  # ran through interp
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, InterpFallbackWarning)]
    assert any("recursive named maps" in m for m in msgs), msgs
    key = "recursive named maps (.apply cycle)"
    assert INTERP_FALLBACK_COUNTS[key] == before.get(key, 0) + 1

    # pure message doctrine: counted (reason=pure message-doctrine
    # frame) but not warned — it's the frame's normal v3 shape
    pure = spark.createDataFrame(
        [(0, 0, '{"a":1}', {"k": "v"})],
        "batch_id long, part_index int, content string, "
        "meta map<string,string>")
    before2 = dict(INTERP_FALLBACK_COUNTS)
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        map_text(pure, "root.b = this.a + 1").collect()
    assert not [w for w in caught2
                if issubclass(w.category, InterpFallbackWarning)]
    pk = "pure message-doctrine frame"
    assert INTERP_FALLBACK_COUNTS[pk] == before2.get(pk, 0) + 1


def test_interp_fallback_metrics_export(spark):
    """The fallback counters surface through the stream metrics flush
    as interp_fallback{reason=...}."""
    from benthos_spark.bloblang.compiler import INTERP_FALLBACK_COUNTS
    from benthos_spark.stream import _flush_metrics

    published = {}

    class Exp:
        def publish(self, metrics):
            published.update(metrics)

    INTERP_FALLBACK_COUNTS["unit-test-reason"] += 1
    try:
        _flush_metrics({"metrics_exporter": Exp()}, None)
        key = "interp_fallback{reason='unit-test-reason'}"
        assert published.get(key, 0) >= 1
    finally:
        del INTERP_FALLBACK_COUNTS["unit-test-reason"]
