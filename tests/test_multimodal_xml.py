"""Multimodal kernels (image/audio/video stubs over real Spark
plumbing), parse_xml, unarchive json_map."""

from __future__ import annotations

from pyspark.sql import functions as F

from benthos_spark.bloblang import map_text
from benthos_spark.functions import parse_xml
from benthos_spark.llm.multimodal import (extract_audio_features,
                                          extract_features,
                                          fake_media_table, resize_stub,
                                          sample_video_frames)
from benthos_spark.operators.batch import unarchive_json_map


def test_extract_features_deterministic(spark):
    media = fake_media_table(spark, n=16)
    a = {r.media_id: r.features for r in extract_features(media).collect()}
    b = {r.media_id: r.features for r in extract_features(media).collect()}
    assert a == b and len(a) == 16
    assert all(len(v) == 8 for v in a.values())


def test_audio_and_frames(spark):
    media = fake_media_table(spark, n=8)
    audio = extract_audio_features(media).collect()
    assert len(audio) == 8
    assert all(r.sample_rate in (16000, 44100) for r in audio)

    frames = sample_video_frames(media, every_n=1).collect()
    assert len(frames) >= 8          # ≥1 frame per media row
    assert all(len(r.frame_features) <= 4 for r in frames)


def test_resize_stub_records_meta(spark):
    media = fake_media_table(spark, n=2)
    out = resize_stub(media, 224, 224).collect()[0]
    assert out.meta["resize_w"] == "224" and out.meta["resize_h"] == "224"


def test_parse_xml_function_and_method(spark):
    df = spark.createDataFrame([("<r><a>5</a><b>hi</b></r>",)], "s STRING")
    got = df.select(parse_xml(F.col("s"), "a INT, b STRING").alias("x")) \
        .collect()[0].x
    assert (got.a, got.b) == (5, "hi")
    out = map_text(df, 'root.v = this.s.parse_xml("a INT, b STRING")')
    assert out.collect()[0].v.a == 5


def test_unarchive_json_map(spark):
    df = spark.createDataFrame([("b1",)], "id STRING").withColumn(
        "obj", F.from_json(F.lit('{"k1":"v1","k2":"v2"}'),
                           "map<string,string>"))
    out = unarchive_json_map(df, F.col("obj")).collect()
    got = sorted((r.archive_key, r.content) for r in out)
    assert got == [("k1", "v1"), ("k2", "v2")]
