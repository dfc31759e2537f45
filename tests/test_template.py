"""Config template tests (reference: internal/template/{config,
template}.go + template/test/*.yaml).  Templates written fresh for
this engine's surface."""

from __future__ import annotations

import pytest

from benthos_spark.stream import run_stream
from benthos_spark.template import (Template, TemplateError,
                                    register_template, run_template_tests)

# A processor template in the reference's shape: typed fields with
# defaults, a Bloblang mapping building the concrete config, embedded
# expansion tests (template/test/*.yaml style).
KEEP_BIG = """
name: keep_big
type: processor
summary: Keeps rows whose field exceeds a threshold, then labels them.
fields:
  - name: field
    description: The numeric column to threshold.
    type: string
  - name: min
    description: Minimum value retained.
    type: int
    default: 100
mapping: |
  root.filter = "this.%s >= %v".format(this.field, this.min)
tests:
  - name: defaults applied
    config: {field: price}
    expected: {filter: "this.price >= 100"}
  - name: explicit min
    config: {field: qty, min: 7}
    expected: {filter: "this.qty >= 7"}
"""

PARQUET_IN = """
name: parquet_dir
type: input
fields:
  - name: dir
    type: string
  - name: table
    type: string
mapping: |
  root.file.paths = [this.dir + "/" + this.table + ".parquet"]
"""


def test_template_expansion_and_embedded_tests(spark):
    t = register_template(KEEP_BIG)
    assert t.expand(spark, {"field": "price"}) == {
        "filter": "this.price >= 100"}
    assert run_template_tests(spark, t) == []


def test_template_field_validation(spark):
    t = Template({"name": "x", "type": "processor",
                  "fields": [{"name": "a", "type": "int"}],
                  "mapping": "root.noop = {}"})
    with pytest.raises(TemplateError, match="required"):
        t.expand(spark, {})
    with pytest.raises(TemplateError, match="unknown fields"):
        t.expand(spark, {"a": 1, "zz": 2})
    with pytest.raises(TemplateError, match="not one of"):
        Template({"name": "y", "type": "frobnicator", "mapping": "root = this"})


def test_template_expanded_config_runs_golden_case(spark, sf_dir):
    """A template-expanded config must behave exactly like the
    hand-written expansion: the yaml_config_stream golden filter
    (orders with status O) built through templates end-to-end."""
    out = run_stream(spark, f"""
templates:
  - |
{_indent(PARQUET_IN, 4)}
  - |
{_indent(KEEP_BIG, 4)}
input:
  parquet_dir: {{dir: "{sf_dir}", table: orders}}
pipeline:
  processors:
    - keep_big: {{field: o_totalprice, min: 200000}}
    - bloblang: |
        root.o_orderkey = this.o_orderkey
        root.lane = "big"
output:
  memory: {{}}
""")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = orders.filter("o_totalprice >= 200000").count()
    rows = out.collect()
    assert len(rows) == want and want > 0
    assert all(r.lane == "big" for r in rows)


def _indent(text: str, n: int) -> str:
    pad = " " * n
    return "\n".join(pad + line for line in text.strip().splitlines())
