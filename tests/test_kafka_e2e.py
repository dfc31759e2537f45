"""Jar-gated Kafka end-to-end integration test (VERDICT r4 ask #3).

The container ships neither the spark-sql-kafka package nor a broker,
so this test is CI-style gated on BOTH:

  SPARK_GRAFT_KAFKA_JARS       comma-separated jar paths providing the
                               `kafka` data source (spark-sql-kafka-0-10
                               + kafka-clients + spark-token-provider +
                               commons-pool2 — all public Maven
                               artifacts matching the Spark version)
  SPARK_GRAFT_KAFKA_BOOTSTRAP  a reachable broker, e.g. localhost:9092

When both are present it proves the production path the wrappers
document: `output.kafka` (rows → JSON messages, keyed) → broker →
`input.kafka` (payload in `content`, the reference's metadata keys in
`meta` — lib/input/kafka.go:60 kafka_topic/partition/offset/key/
timestamp_unix).  Run it against a local broker with:

  SPARK_GRAFT_KAFKA_JARS=$(ls ~/kafka-jars/*.jar | paste -sd,) \
  SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
  python -m pytest tests/test_kafka_e2e.py -v
"""

import os
import socket
import uuid

import pytest

JARS = os.environ.get("SPARK_GRAFT_KAFKA_JARS", "")
BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


def _broker_reachable(bootstrap: str) -> bool:
    try:
        host, port = bootstrap.split(",")[0].rsplit(":", 1)
        with socket.create_connection((host, int(port)), timeout=3):
            return True
    except (OSError, ValueError):
        return False


pytestmark = pytest.mark.skipif(
    not (JARS and BOOTSTRAP and _broker_reachable(BOOTSTRAP)),
    reason="kafka e2e needs SPARK_GRAFT_KAFKA_JARS + a reachable "
           "SPARK_GRAFT_KAFKA_BOOTSTRAP broker (jar-gated: neither the "
           "spark-sql-kafka package nor a broker ship in this container)")


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("kafka-e2e")
         .config("spark.jars", JARS)
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
    yield s
    s.stop()


def test_kafka_roundtrip_with_metadata_parity(kafka_spark):
    """write_kafka → broker → read_kafka: payloads survive and every
    reference metadata key is populated."""
    import json

    from benthos_spark.sinks.writers import write_kafka
    from benthos_spark.sources.files import read_kafka

    topic = f"bspark-e2e-{uuid.uuid4().hex[:12]}"
    rows = [(str(i), i, f"msg-{i}") for i in range(20)]
    df = kafka_spark.createDataFrame(rows, "k string, i long, body string")
    write_kafka(df, BOOTSTRAP, topic, key="k")

    got = (read_kafka(kafka_spark, BOOTSTRAP, topic, streaming=False)
           .collect())
    assert len(got) == 20

    payloads = {json.loads(r["content"])["i"] for r in got}
    assert payloads == set(range(20))
    for r in got:
        meta = r["meta"]
        # the reference's kafka metadata contract (lib/input/kafka.go:60)
        assert meta["kafka_topic"] == topic
        assert meta["kafka_partition"].isdigit()
        assert meta["kafka_offset"].isdigit()
        assert meta["kafka_key"] == str(json.loads(r["content"])["i"])
        assert int(meta["kafka_timestamp_unix"]) > 0


def test_kafka_streaming_input_available_now(kafka_spark, tmp_path):
    """input.kafka in streaming mode drains existing offsets with
    Trigger.AvailableNow and lands the mapped datamodel frame."""
    from benthos_spark.sinks.writers import write_kafka
    from benthos_spark.sources.files import read_kafka

    topic = f"bspark-e2e-{uuid.uuid4().hex[:12]}"
    df = kafka_spark.createDataFrame(
        [(str(i), f"s-{i}") for i in range(10)], "k string, v string")
    write_kafka(df, BOOTSTRAP, topic, key="k")

    stream = read_kafka(kafka_spark, BOOTSTRAP, topic, streaming=True)
    out = str(tmp_path / "out")
    q = (stream.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    landed = kafka_spark.read.parquet(out)
    assert landed.count() == 10
    assert set(landed.columns) >= {"content", "meta"}
