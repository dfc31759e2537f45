"""redis / mongodb processors — injectable-client contract tests.

The fakes live in benthos_spark.testkit (not this module) so executor
workers unpickle the factory closures by reference; each partition
builds its own instance from the same seed, so assertions target
per-row results (alias/_error columns), not shared client state — the
same doctrine as the aws_lambda fake.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.kv_store import mongodb_map, redis_map
from benthos_spark.stream import build_stream
from benthos_spark.testkit import (fake_mongo_client_factory,
                                   fake_redis_client_factory)


def test_redis_scard(spark):
    df = spark.createDataFrame(
        [("colours", "5"), ("empty", "3"), ("missing", "2")],
        "key string, content string")
    out = redis_map(df, "scard", F.col("key"),
                    client_factory=fake_redis_client_factory
                    ).orderBy("key").collect()
    by_key = {r["key"]: r["redis_result"] for r in out}
    assert by_key == {"colours": "3", "empty": "0", "missing": "0"}
    assert all(r["_error"] is None for r in out)


def test_redis_incrby(spark):
    df = spark.createDataFrame([("hits", "5")],
                               "key string, content string")
    row = redis_map(df, "incrby", F.col("key"),
                    value_col=F.col("content"),
                    client_factory=fake_redis_client_factory).collect()[0]
    assert row["redis_result"] == "15"  # seed 10 + 5


def test_redis_sadd_membership(spark):
    df = spark.createDataFrame(
        [("colours", "red"), ("colours2", "mauve")],
        "key string, content string")
    rows = {r["key"]: r["redis_result"]
            for r in redis_map(
                df, "sadd", F.col("key"),
                client_factory=fake_redis_client_factory).collect()}
    assert rows == {"colours": "0", "colours2": "1"}


def test_redis_unknown_operator_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="operator not recognised"):
        redis_map(df, "hgetall", F.lit("k"),
                  client_factory=fake_redis_client_factory)


def test_redis_error_flag(spark):
    df = spark.createDataFrame([("hits", "not-a-number")],
                               "key string, content string")
    row = redis_map(df, "incrby", F.col("key"),
                    value_col=F.col("content"),
                    client_factory=fake_redis_client_factory).collect()[0]
    assert row["redis_result"] is None
    assert "incrby" in row["_error"]


def test_mongodb_find_one(spark):
    df = spark.createDataFrame([(1,), (2,), (99,)], "want long")
    out = mongodb_map(
        df, "find-one", "db", "people",
        filter_col=F.to_json(F.struct(F.col("want").alias("_id"))),
        client_factory=fake_mongo_client_factory
        ).orderBy("want").collect()
    assert json.loads(out[0]["mongo_result"])["name"] == "ada"
    assert json.loads(out[1]["mongo_result"])["name"] == "grace"
    assert out[2]["mongo_result"] is None
    assert "no documents" in out[2]["_error"]


def test_mongodb_update_and_delete_acks(spark):
    df = spark.createDataFrame([(1, 100)], "id long, score long")
    row = mongodb_map(
        df, "update-one", "db", "people",
        filter_col=F.to_json(F.struct(F.col("id").alias("_id"))),
        document_col=F.to_json(F.struct(F.col("score"))),
        client_factory=fake_mongo_client_factory).collect()[0]
    assert json.loads(row["mongo_result"]) == {"matched": 1, "modified": 1}

    row = mongodb_map(
        df, "delete-many", "db", "people",
        filter_col=F.to_json(F.struct(F.col("id").alias("_id"))),
        client_factory=fake_mongo_client_factory).collect()[0]
    assert json.loads(row["mongo_result"]) == {"deleted": 1}


def test_mongodb_insert_one(spark):
    df = spark.createDataFrame([("zuse", 3)], "name string, score long")
    row = mongodb_map(
        df, "insert-one", "db", "people",
        document_col=F.to_json(F.struct("name", "score")),
        client_factory=fake_mongo_client_factory).collect()[0]
    assert json.loads(row["mongo_result"]) == {"inserted_id": "oid-1"}


def test_mongodb_validation():
    with pytest.raises(ValueError, match="unknown"):
        mongodb_map(None, "upsert-many", "db", "c")
    with pytest.raises(ValueError, match="document_map required"):
        mongodb_map(None, "insert-one", "db", "c")
    with pytest.raises(ValueError, match="filter_map required"):
        mongodb_map(None, "find-one", "db", "c")


def test_yaml_redis_and_mongodb(spark, tmp_path):
    """YAML wiring: interpolated redis key + Bloblang filter/document
    maps evaluate JVM-side; injectable factories via client_resource."""
    from benthos_spark.operators.control import register_resource

    register_resource("fake_redis", fake_redis_client_factory)
    register_resource("fake_mongo", fake_mongo_client_factory)
    src = tmp_path / "in.json"
    src.write_text('{"user": "colours", "id": 1, "score": 42}\n')
    cfg = f"""
input:
  file:
    path: {src}
    format: json
    schema: "user string, id long, score long"
pipeline:
  processors:
    - redis:
        operator: scard
        key: "${{! user }}"
        client_resource: fake_redis
    - mongodb:
        operation: update-one
        database: db
        collection: people
        client_resource: fake_mongo
        filter_map: |
          root._id = this.id
        document_map: |
          root.score = this.score
"""
    out = build_stream(spark, cfg).collect()
    assert len(out) == 1
    assert out[0]["redis_result"] == "3"
    assert json.loads(out[0]["mongo_result"]) == {"matched": 1,
                                                  "modified": 1}


def test_dynamodb_partiql(spark):
    from benthos_spark.operators.kv_store import dynamodb_partiql_map
    from benthos_spark.testkit import fake_dynamodb_client_factory

    df = spark.createDataFrame([("u1", 5)], "user string, n long")
    row = dynamodb_partiql_map(
        df, 'SELECT * FROM tbl WHERE "id" = ?',
        args_cols=[F.col("user"), F.col("n")],
        client_factory=fake_dynamodb_client_factory).collect()[0]
    items = json.loads(row["partiql_result"])
    assert items[0]["params"]["S"] == "['u1', 5]"
    assert row["_error"] is None

    row = dynamodb_partiql_map(
        df, "INSERT INTO tbl VALUE {'id': ?}",
        args_cols=[F.col("user")],
        client_factory=fake_dynamodb_client_factory).collect()[0]
    assert json.loads(row["partiql_result"]) == []


def test_dynamodb_partiql_yaml(spark, tmp_path):
    from benthos_spark.operators.control import register_resource
    from benthos_spark.testkit import fake_dynamodb_client_factory

    register_resource("fake_ddb", fake_dynamodb_client_factory)
    src = tmp_path / "in.json"
    src.write_text('{"id": "k1"}\n')
    out = build_stream(spark, f"""
input:
  file: {{path: "{src}", format: json, schema: "id string"}}
pipeline:
  processors:
    - dynamodb_partiql:
        query: 'SELECT * FROM t WHERE "pk" = ?'
        args: ["id"]
        client_resource: fake_ddb
""").collect()
    assert json.loads(out[0]["partiql_result"])[0]["params"]["S"] == "['k1']"


def test_dynamodb_partiql_null_arg_preserves_position(spark):
    """A null argument must survive as an explicit null parameter —
    Spark's to_json default (ignoreNullFields) would drop it and shift
    every later positional PartiQL parameter left."""
    from benthos_spark.operators.kv_store import dynamodb_partiql_map
    from benthos_spark.testkit import fake_dynamodb_client_factory

    df = spark.createDataFrame([(1, "c")], "a long, c string")
    row = dynamodb_partiql_map(
        df, 'SELECT * FROM tbl WHERE "x" = ? AND "y" = ? AND "z" = ?',
        args_cols=[F.col("a"), F.lit(None).cast("string"), F.col("c")],
        client_factory=fake_dynamodb_client_factory).collect()[0]
    items = json.loads(row["partiql_result"])
    assert items[0]["params"]["S"] == "[1, None, 'c']"
    assert row["_error"] is None


def test_mongodb_filter_map_preserves_null_fields(spark):
    """A document/filter map that sets a field to null must keep the
    field in the serialized JSON ({"deleted_at": null} is a real
    Mongo filter, not the same query as {})."""
    from benthos_spark.stream import _mapping_json_col

    df = spark.createDataFrame([("u1",)], "id string")
    out = _mapping_json_col(
        df, "root._id = this.id\nroot.deleted_at = null",
        "mongo_filter").collect()[0]
    assert json.loads(out["mongo_filter"]) == {"_id": "u1",
                                               "deleted_at": None}
