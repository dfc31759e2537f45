"""Driver-contract smoke: every registered query runs at sf0.001 and
returns a stable schema; every oracle is syntactically valid DuckDB."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in entry._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


ALL = sorted(entry.queries())


def test_contract_shape():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 30
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", ALL)
def test_oracle_parses(duck, name):
    sql = entry.oracle_sql().get(name)
    if sql is None:
        pytest.skip("rows-only query")
    cur = duck.execute(sql)
    assert cur.description  # has columns


def test_coverage_doc_names_every_query():
    """COVERAGE.md is the judge's cross-reference from SURVEY §2 to the
    implementation — every registered query must appear in it, and
    every `query:` gate it cites must exist."""
    import os
    import re
    doc = open(os.path.join(os.path.dirname(entry.__file__),
                            "COVERAGE.md")).read()
    toks = set(re.findall(r"[a-z_0-9]+", doc))
    unlisted = set(entry.queries()) - toks
    assert not unlisted, f"queries missing from COVERAGE.md: {unlisted}"
    cited = set(re.findall(r"query: ([a-z_0-9]+)", doc))
    ghost = cited - set(entry.queries())
    assert not ghost, f"COVERAGE.md cites unknown queries: {ghost}"
