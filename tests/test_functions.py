"""Bloblang function/method library tests — table-driven like the
reference's query/methods_*_test.go."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benthos_spark import functions as fn


def one(spark, col, **kwargs):
    """Evaluate a Column over a single-row frame."""
    df = spark.range(1)
    for k, v in kwargs.items():
        df = df.withColumn(k, F.lit(v))
    return df.select(col.alias("out")).collect()[0].out


# ---- strings ----

@pytest.mark.parametrize("builder,value,expected", [
    (fn.uppercase, "hello", "HELLO"),
    (fn.lowercase, "HeLLo", "hello"),
    (fn.capitalize, "hello world", "Hello World"),
    (fn.trim, "  x  ", "x"),
    (fn.reverse_str, "abc", "cba"),
    (fn.strip_html, "<p>hi <b>there</b></p>", "hi there"),
])
def test_string_unary(spark, builder, value, expected):
    assert one(spark, builder(F.col("s")), s=value) == expected


def test_string_predicates(spark):
    assert one(spark, fn.has_prefix(F.col("s"), "he"), s="hello") is True
    assert one(spark, fn.has_suffix(F.col("s"), "lo"), s="hello") is True
    assert one(spark, fn.index_of(F.col("s"), "ll"), s="hello") == 2
    assert one(spark, fn.index_of(F.col("s"), "zz"), s="hello") == -1


def test_split_is_literal_not_regex(spark):
    got = one(spark, fn.split(F.col("s"), "."), s="a.b.c")
    assert got == ["a", "b", "c"]


def test_replace_and_many(spark):
    assert one(spark, fn.replace(F.col("s"), "a", "X"), s="banana") == "bXnXnX"
    got = one(spark, fn.replace_many(F.col("s"), [("a", "1"), ("b", "2")]),
              s="ab")
    assert got == "12"


def test_encodings_roundtrip(spark):
    s = "hello, benthos!"
    b64 = one(spark, fn.encode_base64(F.col("s")), s=s)
    assert one(spark, fn.decode_base64(F.col("s")), s=b64) == s
    hx = one(spark, fn.encode_hex(F.col("s")), s=s)
    assert hx == s.encode().hex()
    assert one(spark, fn.decode_hex(F.col("s")), s=hx) == s


def test_hashes_match_python(spark):
    import hashlib
    s = "payload"
    assert one(spark, fn.hash_sha256(F.col("s")), s=s) == \
        hashlib.sha256(s.encode()).hexdigest()
    assert one(spark, fn.hash_md5(F.col("s")), s=s) == \
        hashlib.md5(s.encode()).hexdigest()
    assert one(spark, fn.hash_sha1(F.col("s")), s=s) == \
        hashlib.sha1(s.encode()).hexdigest()


def test_regex_methods(spark):
    assert one(spark, fn.re_match(F.col("s"), r"^\d+$"), s="123") is True
    assert one(spark, fn.re_find_all(F.col("s"), r"\d+"), s="a1b22c333") == \
        ["1", "22", "333"]
    assert one(spark, fn.re_replace(F.col("s"), r"\d+", "N"), s="a1b22") == \
        "aNbN"


def test_filepath(spark):
    assert one(spark, fn.filepath_split(F.col("s")), s="/a/b/c.txt") == \
        ["/a/b/", "c.txt"]  # Go filepath.Split keeps the trailing sep
    assert one(spark, fn.filepath_split(F.col("s")), s="c.txt") == \
        ["", "c.txt"]  # no separator -> empty dir (Go filepath.Split)
    got = one(spark, fn.filepath_join(F.array(F.lit("a"), F.lit("b"))))
    assert got == "a/b"


def test_url_escape_roundtrip(spark):
    s = "a b&c=d"
    esc = one(spark, fn.escape_url_query(F.col("s")), s=s)
    assert esc == "a+b%26c%3Dd"
    assert one(spark, fn.unescape_url_query(F.col("s")), s=esc) == s


# ---- structured ----

def test_array_methods(spark):
    arr = F.array(F.lit(3), F.lit(1), F.lit(2), F.lit(3))
    assert one(spark, fn.size(arr)) == 4
    assert one(spark, fn.unique(fn.sort_arr(arr))) == [1, 2, 3]
    assert one(spark, fn.slice_arr(fn.sort_arr(arr), 1, 3)) == [2, 3]
    assert one(spark, fn.sum_arr(arr)) == 9.0
    assert one(spark, fn.arr_all(arr, lambda x: x > 0)) is True
    assert one(spark, fn.arr_any(arr, lambda x: x > 2)) is True
    assert one(spark, fn.append(arr, F.lit(9))) == [3, 1, 2, 3, 9]
    assert one(spark, fn.contains(arr, F.lit(2))) is True
    assert one(spark, fn.index(arr, 0)) == 3
    assert one(spark, fn.index(arr, -1)) == 3
    assert one(spark, fn.fold(arr, F.lit(0).cast("long"),
                              lambda a, x: a + x)) == 9
    assert one(spark, fn.map_each(arr, lambda x: x * 10)) == [30, 10, 20, 30]
    assert one(spark, fn.filter_arr(arr, lambda x: x != 3)) == [1, 2]
    assert one(spark, fn.flatten(F.array(F.array(F.lit(1)),
                                         F.array(F.lit(2))))) == [1, 2]
    got = one(spark, fn.enumerated(F.array(F.lit("a"), F.lit("b"))))
    assert [(r["index"], r["value"]) for r in got] == [(0, "a"), (1, "b")]


def test_map_methods(spark):
    m = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    assert sorted(one(spark, fn.keys(m))) == ["a", "b"]
    assert sorted(one(spark, fn.values(m))) == [1, 2]
    m2 = F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3))
    assert one(spark, fn.merge_maps(m, m2)) == {"a": 1, "b": 9, "c": 3}
    got = one(spark, fn.map_each_key(m, lambda k: F.upper(k)))
    assert got == {"A": 1, "B": 2}


def test_without_dropfields(spark):
    st = F.struct(F.lit(1).alias("a"), F.lit(2).alias("b"))
    got = one(spark, fn.without(st, "a"))
    assert got.asDict() == {"b": 2}


# ---- scalars / numeric ----

def test_numeric_methods(spark):
    assert one(spark, fn.num_abs(F.lit(-3))) == 3
    assert one(spark, fn.num_ceil(F.lit(1.2))) == 2
    assert one(spark, fn.num_floor(F.lit(1.8))) == 1
    assert one(spark, fn.num_round(F.lit(1.25), 1)) == 1.3
    assert one(spark, fn.arr_max(F.array(F.lit(1), F.lit(5)))) == 5
    assert one(spark, fn.arr_min(F.array(F.lit(1), F.lit(5)))) == 1


def test_coercions(spark):
    assert one(spark, fn.to_number(F.lit("1.5"))) == 1.5
    assert one(spark, fn.to_number(F.lit("nope"))) is None  # catchable
    assert one(spark, fn.to_bool(F.lit("true"))) is True
    assert one(spark, fn.to_string(F.lit(42))) == "42"
    assert one(spark, fn.coalesce_or(F.lit(None), F.lit("fb"))) == "fb"
    assert one(spark, fn.catch(fn.to_number(F.lit("x")), F.lit(-1.0))) == -1.0


def test_range_fn_half_open(spark):
    assert one(spark, fn.range_fn(0, 5)) == [0, 1, 2, 3, 4]
    assert one(spark, fn.range_fn(0, 6, 2)) == [0, 2, 4]


def test_uuid_and_random(spark):
    import re as _re
    u = one(spark, fn.uuid_v4())
    assert _re.fullmatch(r"[0-9a-f-]{36}", u)
    df = spark.range(100).select(fn.random_int(7).alias("r"))
    vals = [r.r for r in df.collect()]
    assert all(0 <= v < 2 ** 31 for v in vals)


# ---- timestamps ----

def test_timestamp_formats(spark):
    ts = F.to_timestamp(F.lit("2024-03-05 06:07:08"))
    assert one(spark, fn.format_timestamp_strftime(ts, "%Y-%m-%d")) == \
        "2024-03-05"
    assert one(spark, fn.format_timestamp(ts, "2006-01-02 15:04:05")) == \
        "2024-03-05 06:07:08"
    assert one(spark, fn.format_timestamp_unix(ts)) == 1709618828
    got = one(spark, fn.parse_timestamp(F.lit("05/Mar/2024 06:07:08"),
                                        "02/Jan/2006 15:04:05"))
    assert str(got) == "2024-03-05 06:07:08"
    got = one(spark, fn.parse_timestamp_strptime(
        F.lit("2024-03-05"), "%Y-%m-%d"))
    assert str(got).startswith("2024-03-05")
