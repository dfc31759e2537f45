"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no media codecs, so the decode kernels are STUBS with
a deterministic fake (clearly marked); the Spark-side plumbing — schema,
Arrow batch shape, mapInPandas partitioning — is real and tested, and a
real decoder (PIL/ffmpeg) drops into `_decode_image_batch` unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "width int, height int, features array<float>")


def _decode_image_batch(payload_bytes: bytes | None) -> tuple[int, int, list[float]]:
    """STUB decode: media libraries are not installed in this
    environment.  Returns a deterministic fake (dims derived from the
    byte length, 8 fake features from byte stats) so pipelines are
    testable end-to-end; replace the body with PIL/torchvision for real
    decoding — the signature and batch shape stay the same."""
    if payload_bytes is None:
        return 0, 0, [0.0] * 8
    n = len(payload_bytes)
    width, height = (n % 640) + 1, (n % 480) + 1
    head = payload_bytes[:64]
    features = [float(sum(head[i::8]) % 256) / 255.0 for i in range(8)]
    return width, height, features


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas: executors stream Arrow
    batches of binary payloads through the (stubbed) decode kernel.
    Partition-parallel, constant memory per batch — payloads never
    concentrate on the driver."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_decode_image_batch(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def fake_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media rows for tests: payload bytes are a
    function of media_id, so every run (and every engine) agrees."""
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    F.lit("image").alias("kind"),
                    F.encode(F.concat(F.lit("media-payload-"),
                                      F.col("id").cast("string"),
                                      F.repeat(F.lit("x"),
                                               (F.col("id") % 97).cast("int"))),
                             "UTF-8").alias("payload"),
                    F.lit("image/fake").alias("mime"),
                    F.create_map(F.lit("source"),
                                 F.lit("synthetic")).alias("meta")))
