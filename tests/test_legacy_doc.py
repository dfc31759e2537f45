"""Direct tests for the dynamic-document interpreter (bloblang/
interp.py) and the v3 legacy content-doctrine processors it powers
(operators/legacy_doc.py: json/text/unarchive-content)."""

from __future__ import annotations

import pytest

from benthos_spark.bloblang.interp import Interp, compile_template
from benthos_spark.bloblang.parser import parse_query


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
    - json: {operator: set, path: added, value: '${! json("keep") }'}
    - json: {operator: delete, path: drop}
output: {memory: {}}
""")
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
        ev('this.x.encrypt_aes("cbc","k","iv")', {"x": "s"})


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
