"""Message-bus bridge: publisher outputs + bounded poll inputs.

Reference: the ~15 broker output families (lib/output/{nats,nsq,mqtt,
amqp_0_9,redis_streams,redis_pubsub,redis_list,gcp_pubsub,aws_sqs,
aws_kinesis,aws_sns,pulsar,zmq4}.go) and their input twins.  None of
those brokers run in this container and their client SDKs aren't
installed, so every family compiles onto ONE shared bridge with an
injectable client (the aws_lambda / kv_store pattern):

- output: `publish_output` — one client per partition, each row's
  content published to the interpolatable target; the client contract
  is a zero-arg factory returning an object with
  `publish(target: str, payload: bytes)` and optional `close()`.
- input: `poll_input` — bounded driver-side polls at build time (the
  http_client doctrine), client contract `poll(target, max_n) ->
  iterable[str | (str, dict)]`.

Default factories raise an actionable error naming the client package,
exactly like sql_exec's absent-driver gate.  At 100 TB the publish
path is partition-parallel but per-record by construction — the same
caveat the reference docs put on per-message brokers; bulk egress
should use the file/object-store sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# family → (client pip package, the reference output file)
BUS_FAMILIES = {
    "nats": ("nats-py", "lib/output/nats.go"),
    "nsq": ("pynsq", "lib/output/nsq.go"),
    "mqtt": ("paho-mqtt", "lib/output/mqtt.go"),
    "amqp_0_9": ("pika", "lib/output/amqp_0_9.go"),
    "amqp_1": ("python-qpid-proton", "lib/output/amqp_1.go"),
    "redis_streams": ("redis", "lib/output/redis_streams.go"),
    "redis_pubsub": ("redis", "lib/output/redis_pubsub.go"),
    "redis_list": ("redis", "lib/output/redis_list.go"),
    "gcp_pubsub": ("google-cloud-pubsub", "lib/output/gcp_pubsub.go"),
    "aws_sqs": ("boto3", "lib/output/sqs.go"),
    "aws_kinesis": ("boto3", "lib/output/kinesis.go"),
    "aws_sns": ("boto3", "lib/output/sns.go"),
    "pulsar": ("pulsar-client", "lib/output/pulsar.go"),
    "zmq_push": ("pyzmq", "lib/output/zmq4.go"),
}


def _default_factory(kind: str):
    pkg, ref = BUS_FAMILIES[kind]

    def factory():
        raise RuntimeError(
            f"{kind} connector ({ref}): the {pkg!r} client package is "
            f"not installed in this environment; register a zero-arg "
            f"factory returning an object with publish(target, payload) "
            f"/ poll(target, max_n) under resources and pass it via "
            f"client_resource")
    return factory


def publish_output(df: DataFrame, kind: str, target,
                   client_factory=None,
                   content_col: str = "content") -> None:
    """Publish every row's content to `target` (a Column — interpolated
    targets evaluate JVM-side).  One client per partition; the
    foreachPartition IS the output action (no second pass over the
    frame)."""
    if kind not in BUS_FAMILIES:
        raise ValueError(
            f"bus output {kind!r} unknown (have: {sorted(BUS_FAMILIES)})")
    if client_factory is None:
        _default_factory(kind)()  # raises the package-naming error
    factory = client_factory
    if isinstance(target, str):
        target = F.lit(target)
    body = (F.col(content_col) if content_col in df.columns
            else F.to_json(F.struct(*df.columns)))
    work = df.select(target.cast("string").alias("__target"),
                     body.cast("string").alias("__payload"))

    def send(rows):
        client = factory()
        try:
            for r in rows:
                client.publish(r["__target"],
                               (r["__payload"] or "").encode())
        finally:
            close = getattr(client, "close", None)
            if close is not None:
                close()

    work.foreachPartition(send)


def poll_input(spark: SparkSession, kind: str, target: str,
               count: int = 1, max_per_poll: int = 100,
               client_factory=None) -> DataFrame:
    """Bounded-drain consume: `count` driver-side polls at build time.
    Each polled item is a str payload or a (payload, meta) pair."""
    if kind not in BUS_FAMILIES:
        raise ValueError(
            f"bus input {kind!r} unknown (have: {sorted(BUS_FAMILIES)})")
    from benthos_spark.sources.http_ingest import INGEST_SCHEMA
    factory = client_factory or _default_factory(kind)
    client = factory()
    rows = []
    try:
        for i in range(int(count)):
            for item in client.poll(target, int(max_per_poll)):
                if isinstance(item, tuple):
                    payload, meta = item
                else:
                    payload, meta = item, {}
                meta = {str(k): str(v) for k, v in dict(meta).items()}
                meta.setdefault("bus_kind", kind)
                meta.setdefault("bus_poll", str(i))
                rows.append((str(payload), meta))
    finally:
        close = getattr(client, "close", None)
        if close is not None:
            close()
    return spark.createDataFrame(rows, INGEST_SCHEMA)


# family → (client pip package, reference output file) for keyed
# document stores — write(target, key, document) contract
DOC_STORE_FAMILIES = {
    "elasticsearch": ("elasticsearch", "lib/output/elasticsearch.go"),
    "aws_dynamodb": ("boto3", "lib/output/aws_dynamodb.go"),
    "cassandra": ("cassandra-driver", "lib/output/cassandra.go"),
    "azure_table_storage": ("azure-data-tables",
                            "lib/output/azure_table_storage.go"),
    "redis_hash": ("redis", "lib/output/redis_hash.go"),
}


def doc_store_output(df: DataFrame, kind: str, target,
                     key, client_factory=None,
                     content_col: str = "content") -> None:
    """Keyed document-store outputs: one client per partition, each
    row written as `client.write(target, key, document_json)` — the
    minimal common contract of the ES index call, the DynamoDB
    put_item, the Cassandra INSERT, the Azure table upsert, and the
    redis HMSET.  `target` (index/table) and `key` (document id) are
    Columns, so interpolations evaluate JVM-side.  Real SDK adapters
    implement `write` over their native call; the default factory
    raises the package-naming error like the bus bridge."""
    if kind not in DOC_STORE_FAMILIES:
        raise ValueError(
            f"doc-store output {kind!r} unknown "
            f"(have: {sorted(DOC_STORE_FAMILIES)})")
    pkg, ref = DOC_STORE_FAMILIES[kind]

    def default_factory():
        raise RuntimeError(
            f"{kind} output ({ref}): the {pkg!r} client package is not "
            f"installed in this environment; register a zero-arg "
            f"factory returning an object with "
            f"write(target, key, document) under resources and pass it "
            f"via client_resource")

    if client_factory is None:
        default_factory()  # raises at config time, driver-side
    factory = client_factory
    if isinstance(target, str):
        target = F.lit(target)
    if isinstance(key, str):
        key = F.col(key)
    body = (F.col(content_col) if content_col in df.columns
            else F.to_json(F.struct(*df.columns)))
    work = df.select(target.cast("string").alias("__target"),
                     key.cast("string").alias("__key"),
                     body.cast("string").alias("__doc"))

    def send(rows):
        client = factory()
        try:
            for r in rows:
                client.write(r["__target"], r["__key"], r["__doc"])
        finally:
            close = getattr(client, "close", None)
            if close is not None:
                close()

    work.foreachPartition(send)
