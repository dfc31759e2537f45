"""awk processor: reference test-vector parity + Spark integration.

The vector table re-expresses lib/processor/awk_test.go's cases —
codecs, the json_*/metadata_*/timestamp_* host functions, flattened
variable init, and the output contract (non-empty output replaces
content; JSON mutations persist; errors pass the original through)."""

from __future__ import annotations

import pytest

from benthos_spark.operators.awk_lang import (AwkError, parse_program)
from benthos_spark.operators.awk_proc import run_awk_message

VECTORS = [
    # (codec, program, input, meta, expected_output, expect_err)
    ("none", '{ }', 'hello world', {}, 'hello world', False),
    ("none", '{ print "" }', 'hello world', {}, '', False),
    ("none", '{ print metadata_get("meta.foo") }', 'hi',
     {"meta.foo": "12"}, '12', False),
    ("none", '{ print metadata_get("meta.bar") }', 'hi',
     {"meta.foo": "12"}, '', False),
    ("none", '{ print json_get("obj.foo") }', '{"obj":{"foo":12}}', {},
     '12', False),
    ("none", '{ print json_get("obj.bar") }', '{"obj":{"foo":12}}', {},
     'null', False),
    ("none", '{ print json_get("obj.1.foo") }',
     '{"obj":[{"foo":11},{"foo":12}]}', {}, '12', False),
    ("none", '{ json_set("obj.1.foo", "nope") }',
     '{"obj":[{"foo":11},{"foo":12}]}', {},
     '{"obj":[{"foo":11},{"foo":"nope"}]}', False),
    ("none", '{ print json_get("obj.foo") }', '{"obj":{"foo":"hello"}}',
     {}, 'hello', False),
    ("none", '{ json_set("obj.foo", "hello world") }', '{}', {},
     '{"obj":{"foo":"hello world"}}', False),
    ("none", '{ json_set("obj.foo", "hello world") }',
     'not json content', {}, 'not json content', True),
    ("none", '{ json_delete("obj.foo") }',
     '{"obj":{"foo":"hello world","bar":"baz"}}', {},
     '{"obj":{"bar":"baz"}}', False),
    ("none", '{ json_delete("obj") }', '{"obj":{"foo":"hello"}}', {},
     '{}', False),
    ("none",
     '{\n json_set("obj.foo", "hello world");\n'
     ' json_set("obj.foo", json_get("obj.foo") " 123");\n}',
     '{"obj":{"foo":"nope"}}', {},
     '{"obj":{"foo":"hello world 123"}}', False),
    ("none", '{ json_set_int("obj.foo", 5) }', '{}', {},
     '{"obj":{"foo":5}}', False),
    ("none", '{ json_set_float("obj.foo", 5.3) }', '{}', {},
     '{"obj":{"foo":5.3}}', False),
    ("none", '{ json_set_bool("obj.foo", "foo" == "foo") }', '{}', {},
     '{"obj":{"foo":true}}', False),
    ("json", '{ print obj_foo }', '{"obj":{"foo":"hello"}}', {},
     'hello', False),
    ("text", '{ print $2 " " meta_foo }', 'hello world',
     {"meta.foo": "12", "meta.bar": "34"}, 'world 12', False),
    ("json", '{ print obj_foo " " meta_foo }',
     '{"obj":{"foo":"hello"}}', {"meta.foo": "12"}, 'hello 12', False),
    ("none", '{ print $2 meta_foo }', 'foo', {}, '', False),
    ("text", '{ foo = foostamp; print timestamp_unix(foo) }', 'foo',
     {"foostamp": "2018-12-18T11:57:32"}, '1545134252', False),
    ("text",
     '{ print timestamp_unix(foostamp,'
     ' "2006TOTALLY01CUSTOM02T15:04:05") }',
     'foo', {"foostamp": "2018TOTALLY12CUSTOM18T11:57:32"},
     '1545134252', False),
    ("text", '{ print timestamp_format(foostamp, "02 Jan 06 15:04") }',
     'foo', {"foostamp": "1545134252"}, '18 Dec 18 11:57', False),
    ("text",
     '{ print timestamp_format_nano(foostamp,'
     ' "02 Jan 06 15:04:05.000000000") }',
     'foo', {"foostamp": "1545134252123000064"},
     '18 Dec 18 11:57:32.123000064', False),
    ("none",
     '{ print create_json_object("foo", "1", "bar", "2", "baz", "3") }',
     'x', {}, '{"bar":"2","baz":"3","foo":"1"}', False),
    ("none",
     '{ print create_json_object("foo", "1", "bar", 2, "baz", "true") }',
     'x', {}, '{"bar":"2","baz":"true","foo":"1"}', False),
    ("none", '{ print create_json_object() }', 'x', {}, '{}', False),
    ("none", '{ print create_json_array("1", 2, "3") }', 'x', {},
     '["1","2","3"]', False),
    ("none", '{ print create_json_array() }', 'x', {}, '[]', False),
    ("none", '{ json_append("obj.foo", "hello world") }', '{}', {},
     '{"obj":{"foo":["hello world"]}}', False),
    ("none", '{ json_append("obj.foo", "hello world") }',
     '{"0":"test"}', {}, '{"0":"test","obj":{"foo":["hello world"]}}',
     False),
    ("none", '{ json_append("obj.foo", "hello world") }',
     '{"obj":{"foo":"first"}}', {},
     '{"obj":{"foo":["first","hello world"]}}', False),
    ("none", '{ json_append("obj.foo", "hello world") }',
     '{"obj":{"foo":["first",2]}}', {},
     '{"obj":{"foo":["first",2,"hello world"]}}', False),
    ("none", '{ json_append_int("obj.foo", 1) }', '{}', {},
     '{"obj":{"foo":[1]}}', False),
    ("none", '{ json_append_float("obj.foo", 1.2) }', '{}', {},
     '{"obj":{"foo":[1.2]}}', False),
    ("none", '{ json_append_bool("obj.foo", 1) }', '{}', {},
     '{"obj":{"foo":[true]}}', False),
    ("none", '{ json_append_bool("obj.foo", 0) }', '{}', {},
     '{"obj":{"foo":[false]}}', False),
    ("none", '{ print json_type("foo") }', '{}', {}, 'undefined', False),
    ("none", '{ print json_type("foo") }', '{"foo":null}', {}, 'null',
     False),
    ("none", '{ print json_type("foo") }', '{"foo":5}', {}, 'float',
     False),
    ("none", '{ print json_type("foo") }', '{"foo":"foo"}', {},
     'string', False),
    ("none", '{ print json_type("foo") }', '{"foo":["foo",5,false]}',
     {}, 'array', False),
    ("none", '{ print json_type("foo") }', '{"foo":false}', {}, 'bool',
     False),
    ("none", '{ print json_type("foo") }', '{"foo":{"a":"b"}}', {},
     'object', False),
    ("none", '{ print json_length("foo") }', '{}', {}, '0', False),
    ("none", '{ print json_length("foo") }', '{"foo":5}', {}, '0',
     False),
    ("none", '{ print json_length("foo") }', '{"foo":[1, 2, "three"]}',
     {}, '3', False),
    ("none", '{ exit 1 }', 'hello world', {}, 'hello world', True),
    # plain getline / getline var consume the NEXT record of the
    # message (reference wires content to goawk stdin, awk.go:828-832)
    ("text", '{ if ((getline nxt) > 0) print $0 "+" nxt;'
             ' else print $0 "|last" }',
     'a\nb\nc', {}, 'a+b\nc|last', False),
    ("text", '{ n = 0; while ((getline line) > 0) n++; print NR, n }',
     'x\ny\nz', {}, '3 2', False),
    ("text", '{ getline; print $0, NF }', 'a b\nc d e', {},
     'c d e 3', False),
]


@pytest.mark.parametrize("codec,program,inp,meta,want,want_err", VECTORS)
def test_awk_reference_vectors(codec, program, inp, meta, want, want_err):
    got, _, err = run_awk_message(parse_program(program), codec, inp,
                                  meta)
    assert got == want
    assert bool(err) == want_err


def test_awk_language_features():
    """User functions (recursion), arrays by reference, for-in, split,
    gsub with & and ERE literals, match/RSTART/RLENGTH, printf formats,
    while/do-while/continue, ternary, concatenation, strnum compare."""
    prog = '''
function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2) }
function total(arr,   k, s) { for (k in arr) s += arr[k]; return s }
BEGIN { split("1:2:3", nums, ":") }
{
  gsub(/l+/, "[&]", $0)
  printf "%s|%d|%d|%.2f|%x|%c\\n", $0, fib(10), total(nums), 3.14159, 255, 65
}
'''
    got, _, err = run_awk_message(parse_program(prog), "text", "hello",
                                  {})
    assert err is None
    assert got == "he[ll]o|55|6|3.14|ff|A"


def test_awk_fields_and_nf():
    prog = '{ $2 = "X"; print NF, $0; $5 = "tail"; print NF, $0 }'
    got, _, err = run_awk_message(parse_program(prog), "text",
                                  "a b c", {})
    assert err is None
    assert got == "3 a X c\n5 a X c  tail"


def test_awk_metadata_set_persists():
    _, meta, err = run_awk_message(
        parse_program('{ metadata_set("meta.foo", 24) }'), "none",
        "hello", {})
    assert err is None
    assert meta["meta.foo"] == "24"


def test_awk_multi_record_text():
    prog = '/^a/ { n++ } END { print n, NR }'
    got, _, err = run_awk_message(parse_program(prog), "text",
                                  "apple\nbanana\navocado\n", {})
    assert err is None
    assert got == "2 3"


def test_awk_unsupported_constructs_raise():
    # plain getline is supported (message records); the FILE form is
    # a plan-time error — a message processor has no filesystem input
    with pytest.raises(AwkError, match="getline from a file"):
        parse_program('{ getline line < "f.txt" }')
    with pytest.raises(AwkError, match="redirection"):
        parse_program('{ print "x" > "/tmp/f" }')
    got, _, err = run_awk_message(
        parse_program('{ system("ls") }'), "none", "x", {})
    assert "system" in err
    assert got == "x"


def test_awk_yaml_wiring(spark):
    """YAML `awk:` — the reference's workflow example shape: route on
    a JSON field and compute into the document (awk_test.go:308-318)."""
    from benthos_spark.stream import build_stream
    from benthos_spark.stream import ConfigError

    out = build_stream(spark, """
input:
  generate:
    count: 2
    mapping: |
      root.content = "{\\"doc\\":{\\"val1\\":5,\\"val2\\":10},\\"type\\":\\"" + (if this.id % 2 == 0 { "add" } else { "multiply" }) + "\\"}"
pipeline:
  processors:
    - awk:
        codec: none
        program: |
          function map_add_vals() {
            json_set_int("doc.result", json_get("doc.val1") + json_get("doc.val2"));
          }
          function map_multiply_vals() {
            json_set_int("doc.result", json_get("doc.val1") * json_get("doc.val2"));
          }
          { if (json_get("type") == "add") map_add_vals();
            else if (json_get("type") == "multiply") map_multiply_vals() }
""").collect()
    bodies = sorted(r["content"] for r in out)
    assert bodies == [
        '{"doc":{"result":15,"val1":5,"val2":10},"type":"add"}',
        '{"doc":{"result":50,"val1":5,"val2":10},"type":"multiply"}',
    ]
    with pytest.raises(ConfigError, match="awk"):
        build_stream(spark, """
input: {generate: {count: 1}}
pipeline:
  processors:
    - awk: {codec: nope, program: "{ }"}
""")


def test_awk_posix_character_classes():
    got, _, err = run_awk_message(
        parse_program('{ gsub(/[[:digit:]]+/, "#"); print $0 }'),
        "text", "a1b22c333", {})
    assert err is None and got == "a#b#c#"
    got, _, err = run_awk_message(
        parse_program('{ if ($0 ~ /^[[:upper:]][[:lower:]]+$/)'
                      ' print "name" }'),
        "text", "Alice", {})
    assert err is None and got == "name"


def test_awk_runtime_errors_flag_message_not_task():
    """Data-dependent runtime errors must flag the message and pass
    the original through (awk.go:855), never escape the interpreter:
    math edge cases follow goawk/Go semantics (sqrt(-1)=nan,
    log(0)=-inf), int(inf) stays inf, and a stray `next` in END is an
    awk error, not an internal exception."""
    # goawk math: no raise, IEEE values flow through formatting
    got, _, err = run_awk_message(
        parse_program('BEGIN { print sqrt(-1), log(0), exp(100000) }'),
        "none", "orig", {})
    assert err is None
    assert got == "nan -inf inf"
    got, _, err = run_awk_message(
        parse_program('BEGIN { print int(log(0)) }'), "none", "x", {})
    assert err is None and got == "-inf"
    # stray control flow in END → message-level error, original through
    got, _, err = run_awk_message(
        parse_program('END { next }'), "none", "orig", {})
    assert got == "orig" and err is not None and "next" in err
    # a genuinely unexpected runtime error is trapped, not propagated
    got, _, err = run_awk_message(
        parse_program('BEGIN { printf "%d", exp(100000) }'),
        "none", "orig", {})
    assert got == "orig" and err is not None


def test_awk_empty_text_runs_zero_records():
    """Empty stdin runs zero main-rule records in the reference; only
    BEGIN/END execute (goawk over empty input)."""
    got, _, err = run_awk_message(
        parse_program('{ print "ran" }'), "text", "", {})
    assert err is None and got == ""
    got, _, err = run_awk_message(
        parse_program('BEGIN { print "b" } { print "ran" } '
                      'END { print "e" }'), "text", "", {})
    assert err is None and got == "b\ne"


def test_awk_strnum_comparison_semantics():
    """POSIX strnum: string *constants* compare as strings even when
    numeric-looking; input-derived values (fields, vars, host fns)
    compare numerically when they look numeric."""
    # constants: string comparison ("10" < "9" is true)
    got, _, err = run_awk_message(
        parse_program('BEGIN { print ("10" < "9") ? "yes" : "no" }'),
        "none", "x", {})
    assert err is None and got == "yes"
    # fields vs number: numeric
    got, _, err = run_awk_message(
        parse_program('{ print ($1 < 9) ? "lt" : "ge" }'),
        "text", "10", {})
    assert err is None and got == "ge"
    # field vs string constant: string comparison per POSIX
    got, _, err = run_awk_message(
        parse_program('{ print ($1 < "9") ? "lt" : "ge" }'),
        "text", "10", {})
    assert err is None and got == "lt"
    # two numeric-looking fields: numeric comparison
    got, _, err = run_awk_message(
        parse_program('{ print ($1 < $2) ? "lt" : "ge" }'),
        "text", "9 10", {})
    assert err is None and got == "lt"
    # uninitialized vs number: numeric (uninit == 0)
    got, _, err = run_awk_message(
        parse_program('BEGIN { print (x < 1) ? "lt" : "ge" }'),
        "none", "x", {})
    assert err is None and got == "lt"
    # split()-derived values are strnums
    got, _, err = run_awk_message(
        parse_program('BEGIN { split("10:9", a, ":"); '
                      'print (a[1] > a[2]) ? "num" : "str" }'),
        "none", "x", {})
    assert err is None and got == "num"
