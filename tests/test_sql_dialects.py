"""Contract doubles for the non-sqlite SQL dialects (VERDICT r4 ask #5).

The reference's sql processor names mysql/postgres/clickhouse/mssql
drivers (lib/processor/sql.go:148-156), each with its own placeholder
style.  No client libraries ship in this container, so these doubles
pin the CONTRACT each production client will see at the DBAPI boundary:
the translated query text and the bound argument tuples — including
$N/@pN repetition and reordering, and quoted-literal immunity.

The double runs inside the Python worker (sql_query ships the
registered factory through the closure), so it reports what it saw the
only way that crosses back: by echoing (query, args) as the canned
result row the json_array codec returns.
"""

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.sql_exec import (_DRIVER_FACTORIES,
                                              prepare_query,
                                              register_driver, sql_query)


# ---------------------------------------------------------- unit level

def test_prepare_query_translations():
    # sqlite: identity, args pass through untranslated
    q, order = prepare_query("SELECT * FROM t WHERE a=? AND b=?",
                             "sqlite")
    assert q == "SELECT * FROM t WHERE a=? AND b=?" and order is None

    # mysql/clickhouse: ? → %s positional
    q, order = prepare_query("INSERT INTO t VALUES (?, ?)", "mysql")
    assert q == "INSERT INTO t VALUES (%s, %s)" and order == [0, 1]
    q, order = prepare_query("SELECT ? AS x", "clickhouse")
    assert q == "SELECT %s AS x" and order == [0]

    # postgres: $N → %s with reorder + repetition
    q, order = prepare_query(
        "SELECT * FROM t WHERE a=$2 AND b=$1 OR c=$1", "postgres")
    assert q == "SELECT * FROM t WHERE a=%s AND b=%s OR c=%s"
    assert order == [1, 0, 0]

    # mssql: @pN → ? with reorder
    q, order = prepare_query("UPDATE t SET a=@p2 WHERE id=@p1", "mssql")
    assert q == "UPDATE t SET a=? WHERE id=?" and order == [1, 0]


def test_prepare_query_quoted_literals_untouched():
    q, order = prepare_query(
        "SELECT '$1 ? not a placeholder' , a FROM t WHERE b=$1",
        "postgres")
    assert q == "SELECT '$1 ? not a placeholder' , a FROM t WHERE b=%s"
    assert order == [0]
    q, order = prepare_query(
        "SELECT 'it''s ?' , ? FROM t", "mysql")
    assert q == "SELECT 'it''s ?' , %s FROM t" and order == [0]


def test_prepare_query_percent_escaped_for_format_clients():
    """psycopg2/MySQLdb %-process the whole query: every literal %
    (LIKE patterns, modulo) must reach them doubled."""
    q, order = prepare_query(
        "SELECT * FROM t WHERE name LIKE 'a%' AND id=$1", "postgres")
    assert q == "SELECT * FROM t WHERE name LIKE 'a%%' AND id=%s"
    assert order == [0]
    q, order = prepare_query("SELECT id % 2 FROM t WHERE id=?", "mysql")
    assert q == "SELECT id %% 2 FROM t WHERE id=%s" and order == [0]
    # qmark clients (mssql/pyodbc) never %-process: leave % alone
    q, order = prepare_query(
        "SELECT * FROM t WHERE name LIKE 'a%' AND id=@p1", "mssql")
    assert q == "SELECT * FROM t WHERE name LIKE 'a%' AND id=?"
    assert order == [0]


def test_prepare_query_skips_dollar_quotes_identifiers_comments():
    # Postgres dollar-quoted strings: $$..$$ and $tag$..$tag$ bodies
    # are literal text — a $1 inside stays verbatim
    q, order = prepare_query(
        "SELECT $$ not $1 here $$, $1 FROM t", "postgres")
    assert q == "SELECT $$ not $1 here $$, %s FROM t" and order == [0]
    q, order = prepare_query(
        "SELECT $fn$ body $other$ $1 $fn$, $2 FROM t", "postgres")
    assert q == "SELECT $fn$ body $other$ $1 $fn$, %s FROM t"
    assert order == [1]
    # double-quoted identifiers
    q, order = prepare_query(
        'SELECT "a?b" FROM t WHERE x=?', "mysql")
    assert q == 'SELECT "a?b" FROM t WHERE x=%s' and order == [0]
    # -- line and /* */ block comments
    q, order = prepare_query(
        "SELECT a -- not ? here\nFROM t WHERE b=?", "mysql")
    assert q == "SELECT a -- not ? here\nFROM t WHERE b=%s"
    assert order == [0]
    q, order = prepare_query(
        "SELECT /* skip $1 */ $1 FROM t", "postgres")
    assert q == "SELECT /* skip $1 */ %s FROM t" and order == [0]
    # literal % inside a dollar-quoted body is still escaped for
    # format clients (the client %-processes the whole string)
    q, order = prepare_query(
        "SELECT $$100%$$ , $1", "postgres")
    assert q == "SELECT $$100%%$$ , %s" and order == [0]


# ------------------------------------------------------ contract double

def _make_echo_factory(paramstyle):
    """A DBAPI double built entirely of CLOSURES so cloudpickle ships
    it by value into the Python worker (a module-level class would
    pickle by reference to this un-importable test module).  It
    validates placeholder discipline and echoes (query, args) back
    through the result row — the only channel from worker to driver."""

    def factory(dsn):
        class EchoCursor:
            def __init__(self):
                self.description = None
                self._rows = []

            def execute(self, query, args=()):
                if paramstyle == "qmark":
                    if "%s" in query:
                        raise AssertionError(
                            "untranslated placeholder reached the "
                            f"client: {query!r}")
                    if query.count("?") != len(args):
                        raise AssertionError(
                            f"binding mismatch: {query!r} got "
                            f"{len(args)} args")
                else:
                    # mimic psycopg2/MySQLdb: the WHOLE query is
                    # %-processed — any % not part of %s or %% is the
                    # production 'unsupported format character' error
                    import re as _re
                    stripped = _re.sub(r"%%|%s", "", query)
                    if "?" in _re.sub(r"'[^']*'", "", stripped):
                        raise AssertionError(
                            "untranslated placeholder reached the "
                            f"client: {query!r}")
                    if "%" in stripped:
                        raise AssertionError(
                            "unsupported format character in "
                            f"{query!r}")
                    if query.replace("%%", "").count("%s") != len(args):
                        raise AssertionError(
                            f"binding mismatch: {query!r} got "
                            f"{len(args)} args")
                self.description = [("q",), ("args",)]
                self._rows = [(query, json.dumps(list(args)))]

            def fetchall(self):
                return self._rows

        class EchoCon:
            def cursor(self):
                return EchoCursor()

            def commit(self):
                pass

            def close(self):
                pass

        return EchoCon()

    return factory


@pytest.fixture
def dialect_double():
    registered = []

    def make(driver, paramstyle):
        register_driver(driver, _make_echo_factory(paramstyle))
        registered.append(driver)

    yield make
    for d in registered:
        _DRIVER_FACTORIES.pop(d, None)


def _run(spark, driver, query):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, name string")
    out = sql_query(df, dsn="ignored", query=query,
                    args_cols=[F.col("id"), F.col("name")],
                    driver=driver)
    return out.orderBy("id").collect()


def _seen(row):
    [echo] = json.loads(row["content"])
    return echo["q"], json.loads(echo["args"])


def test_postgres_double_binds_reordered_args(spark, dialect_double):
    dialect_double("postgres", "format")
    rows = _run(spark, "postgres",
                "SELECT * FROM t WHERE name=$2 AND id=$1 OR id=$1")
    assert [r["_error"] for r in rows] == [None, None]
    q, args = _seen(rows[0])
    assert q == "SELECT * FROM t WHERE name=%s AND id=%s OR id=%s"
    assert args == ["x", 1, 1]
    assert _seen(rows[1])[1] == ["y", 2, 2]


def test_mysql_double_binds_positional_args(spark, dialect_double):
    dialect_double("mysql", "format")
    rows = _run(spark, "mysql",
                "INSERT INTO t (id, name) VALUES (?, ?)")
    assert [r["_error"] for r in rows] == [None, None]
    q, args = _seen(rows[0])
    assert q == "INSERT INTO t (id, name) VALUES (%s, %s)"
    assert args == [1, "x"]
    assert _seen(rows[1])[1] == [2, "y"]


def test_mssql_double_binds_qmark_args(spark, dialect_double):
    dialect_double("mssql", "qmark")
    rows = _run(spark, "mssql",
                "UPDATE t SET name=@p2 WHERE id=@p1")
    assert [r["_error"] for r in rows] == [None, None]
    q, args = _seen(rows[0])
    assert q == "UPDATE t SET name=? WHERE id=?"
    assert args == ["x", 1]


def test_format_double_survives_like_percent(spark, dialect_double):
    """A literal % (LIKE pattern) must reach a %-processing client as
    %% — the double raises 'unsupported format character' otherwise,
    exactly like production psycopg2/MySQLdb."""
    dialect_double("postgres", "format")
    rows = _run(spark, "postgres",
                "SELECT * FROM t WHERE name LIKE 'a%' AND id=$1")
    assert [r["_error"] for r in rows] == [None, None]
    q, args = _seen(rows[0])
    assert q == "SELECT * FROM t WHERE name LIKE 'a%%' AND id=%s"
    assert args == [1]


def test_out_of_range_placeholder_is_per_row_error(spark, dialect_double):
    dialect_double("postgres", "format")
    rows = _run(spark, "postgres", "SELECT $3")
    assert all(r["_error"] and "sql:" in r["_error"] for r in rows)


def test_sqlite_still_binds_directly(spark, tmp_path):
    """The identity path (qmark→qmark) keeps sqlite behavior untouched,
    including count-mismatch-as-error."""
    db = str(tmp_path / "t.db")
    import sqlite3
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (k INTEGER, v TEXT)")
    con.execute("INSERT INTO kv VALUES (1, 'one'), (2, 'two')")
    con.commit()
    con.close()
    df = spark.createDataFrame([(1,), (2,)], "k long")
    ok = sql_query(df, dsn=db, query="SELECT v FROM kv WHERE k=?",
                   args_cols=[F.col("k")]).orderBy("k").collect()
    assert json.loads(ok[0]["content"]) == [{"v": "one"}]
    assert ok[1]["_error"] is None
    # too many args still errors per-row (not silently truncated)
    bad = sql_query(df, dsn=db, query="SELECT v FROM kv WHERE k=?",
                    args_cols=[F.col("k"), F.col("k")]).collect()
    assert all(r["_error"] and "sql:" in r["_error"] for r in bad)
