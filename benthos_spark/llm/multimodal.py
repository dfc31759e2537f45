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


def _decode_audio_batch(payload_bytes: bytes | None) -> tuple[int, int, list[float]]:
    """STUB audio decode (no codecs in this environment): returns
    (sample_rate, n_samples, mfcc-ish features) deterministically from
    byte stats; replace with soundfile/librosa — batch shape is real."""
    if payload_bytes is None:
        return 0, 0, [0.0] * 4
    n = len(payload_bytes)
    rate = 16000 if n % 2 == 0 else 44100
    feats = [float(sum(payload_bytes[i::4]) % 101) / 100.0 for i in range(4)]
    return rate, n * 4, feats


def _sample_video_frames(payload_bytes: bytes | None,
                         every_n: int = 30) -> list[list[float]]:
    """STUB frame sampler: deterministic fake frames (one 4-float
    signature per sampled frame); replace with ffmpeg/decord — the
    mapInPandas batch shape and output schema stay identical."""
    if payload_bytes is None:
        return []
    n_frames = max(1, len(payload_bytes) // 16)
    out = []
    for f in range(0, n_frames, every_n):
        chunk = payload_bytes[f * 16:(f + 1) * 16] or payload_bytes[:16]
        out.append([float(b % 64) / 64.0 for b in chunk[:4]])
    return out


AUDIO_SCHEMA = ("media_id long, sample_rate int, n_samples long, "
                "features array<float>")
FRAMES_SCHEMA = "media_id long, frame_no int, frame_features array<float>"


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio path of the multimodal pipeline (same plumbing as
    extract_features; stubbed kernel)."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_decode_audio_batch(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": [d[0] for d in decoded],
                "n_samples": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return media.mapInPandas(op, schema=AUDIO_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode inside
    the pandas batch — rows fan out without driver involvement)."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, frame_nos, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in enumerate(
                        _sample_video_frames(payload, every_n)):
                    ids.append(mid)
                    frame_nos.append(i)
                    feats.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_no": frame_nos,
                                "frame_features": feats})

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """`resize` kernel placeholder: passes payload through with target
    dims recorded in meta (a real implementation re-encodes bytes in
    the same mapInPandas shape)."""
    return media.withColumn(
        "meta", F.map_concat(
            F.map_filter(F.col("meta"),
                         lambda k, _: ~k.isin(["resize_w", "resize_h"])),
            F.create_map(F.lit("resize_w"), F.lit(str(width)),
                         F.lit("resize_h"), F.lit(str(height)))))


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
