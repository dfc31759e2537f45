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


def test_real_wav_decode(spark):
    """WAV payloads decode through stdlib `wave`: true rate, true
    frame count, genuine PCM stats (peak near 20000/32768 for the
    synthetic sine)."""
    from benthos_spark.llm.multimodal import real_media_table
    media = real_media_table(spark, n=8).filter("kind = 'audio'")
    got = {r.media_id: r for r in extract_audio_features(media).collect()}
    for i, r in got.items():
        assert r.sample_rate == 8000 + 4000 * ((i // 3) % 3)
        assert r.n_samples == 100 + i
        peak = r.features[2]
        assert 0.55 < peak < 0.65  # 20000/32768 ≈ 0.61
        assert 0.0 <= r.features[3] <= 1.0  # zero-crossing rate


def test_real_image_header_decode(spark):
    """BMP payloads yield true pixel dimensions; PNG and JPEG headers
    parse too (pure struct, no PIL)."""
    from benthos_spark.llm.multimodal import (_image_dims, bmp_bytes,
                                              real_media_table)
    media = real_media_table(spark, n=8).filter("kind = 'image'")
    got = {r.media_id: (r.width, r.height)
           for r in extract_features(media).collect()}
    assert got == {i: (8 + i, 4 + i) for i in range(8) if i % 3 == 1}
    # PNG IHDR and JPEG SOF0 header parses
    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08")
    assert _image_dims(png) == (640, 480)
    jpeg = (b"\xff\xd8\xff\xe0\x00\x10" + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0\x00\x11\x08" + (120).to_bytes(2, "big")
            + (160).to_bytes(2, "big") + b"\x03" + b"\x00" * 10)
    assert _image_dims(jpeg) == (160, 120)
    assert _image_dims(bmp_bytes(33, 21)) == (33, 21)


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


def test_xml_to_json_docs_example(spark):
    """lib/processor/xml.go:40-60 documented example, verbatim."""
    import json
    from benthos_spark.operators.parsing import xml_to_json
    xml = ("<root><title>This is a title</title>"
           '<description tone="boring">This is a description</description>'
           '<elements id="1">foo1</elements>'
           '<elements id="2">foo2</elements>'
           "<elements>foo3</elements></root>")
    df = spark.createDataFrame([(xml,), ("<broken",)], "content STRING")
    rows = {r.content: r for r in xml_to_json(df).collect()}
    good = next(v for k, v in rows.items() if k and k.startswith("{"))
    assert json.loads(good.content) == {"root": {
        "title": "This is a title",
        "description": {"-tone": "boring", "#text": "This is a description"},
        "elements": [{"-id": "1", "#text": "foo1"},
                     {"-id": "2", "#text": "foo2"}, "foo3"]}}
    assert good._error is None
    bad = rows["<broken"]
    assert bad._error and bad._error.startswith("xml:")


def test_process_field(spark):
    from benthos_spark.operators.control import process_field
    from benthos_spark.bloblang import map_text
    df = spark.createDataFrame([(1, "ab", "keep"), (2, "xyz", "keep2")],
                               "id INT, f STRING, content STRING")
    out = process_field(
        df, "f", [lambda d: map_text(d, "root = this\n"
                                        "root.content = this.content.uppercase()")])
    got = {r.id: (r.f, r.content) for r in out.collect()}
    assert got == {1: ("AB", "keep"), 2: ("XYZ", "keep2")}

    out2 = process_field(
        df, "f",
        [lambda d: map_text(d, 'root = this\n'
                                'root.content = this.content.length()')],
        result_type="int")
    assert {r.id: r.f for r in out2.collect()} == {1: 2, 2: 3}
    assert dict(out2.dtypes)["f"] == "bigint"


def test_xml_and_process_field_yaml(spark):
    from benthos_spark.stream import build_stream
    out = build_stream(spark, r"""
input:
  generate:
    count: 2
    mapping: |
      root.content = "<r><v>" + this.id.string() + "</v></r>"
      root.n = "5"
pipeline:
  processors:
    - xml:
        operator: to_json
    - process_field:
        path: n
        result_type: int
        processors:
          - bloblang: |
              root = this
              root.content = this.content.number() * 2
output:
  memory: {}
""")
    rows = out.collect()
    assert sorted(r.content for r in rows) == ['{"r":{"v":"0"}}',
                                               '{"r":{"v":"1"}}']
    assert all(r.n == 10 for r in rows)


def test_real_gif_frame_walk(spark):
    """GIF payloads block-walk to the TRUE frame list: count matches
    the generator's n_frames, per-frame geometry is the real image
    descriptor (w, h, x, y) — no fabricated values for GIF input."""
    from benthos_spark.llm.multimodal import (_gif_info, gif_bytes,
                                              real_media_table,
                                              sample_video_frames)
    # unit: writer → walker round trip
    w, h, frames = _gif_info(gif_bytes(11, 7, n_frames=4))
    assert (w, h) == (11, 7)
    assert frames == [(0, 0, 11, 7)] * 4
    assert _gif_info(b"not a gif") is None
    # truncation inside the color table → walk ends, no phantom frames
    assert _gif_info(gif_bytes(3, 3, 2)[:20])[2] == []
    # truncation inside an image descriptor → detected, None
    assert _gif_info(gif_bytes(3, 3, 2)[:30]) is None
    # pipeline: every sampled frame carries real geometry
    media = real_media_table(spark, n=12).filter("kind = 'video'")
    rows = sample_video_frames(media, every_n=1).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_features)
    for i, feats in by_id.items():
        assert len(feats) == 2 + (i % 5)            # true frame count
        assert all(f == [6.0 + i, 3.0 + i, 0.0, 0.0] for f in feats)
    # every_n sampling takes every n-th descriptor
    sampled = sample_video_frames(media, every_n=2).collect()
    n2 = {}
    for r in sampled:
        n2[r.media_id] = n2.get(r.media_id, 0) + 1
    assert n2 == {i: (2 + (i % 5) + 1) // 2 for i in by_id}
