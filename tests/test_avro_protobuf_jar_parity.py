"""Jar-gated JVM scale-path parity for avro/protobuf (VERDICT r4 ask #7).

The pure-Python codecs (operators/avro_py.py, operators/protobuf_py.py)
are the in-container correctness path; the documented 100 TB path is
the spark-avro / spark-protobuf packages (reference parity:
lib/processor/avro.go:22, lib/processor/protobuf.go:27).  Neither jar
ships in this container, so these tests gate on:

  SPARK_GRAFT_AVRO_JARS   comma-separated jar paths providing
                          `from_avro`/`to_avro` (the public
                          org.apache.spark:spark-avro artifact)
  SPARK_GRAFT_PROTOBUF_JARS  jars providing `from_protobuf`
                          (org.apache.spark:spark-protobuf + a
                          descriptor-set file, see below)

When present, they pin: bytes encoded by the pure-Python codec decode
to the SAME values through the JVM path (and vice versa for avro), so
a cluster deployment can swap paths without a semantic diff.

  SPARK_GRAFT_AVRO_JARS=$(ls ~/avro-jars/*.jar | paste -sd,) \
  python -m pytest tests/test_avro_protobuf_jar_parity.py -v
"""

import json
import os

import pytest

AVRO_JARS = os.environ.get("SPARK_GRAFT_AVRO_JARS", "")
PB_JARS = os.environ.get("SPARK_GRAFT_PROTOBUF_JARS", "")

AVRO_SCHEMA = json.dumps({
    "type": "record", "name": "Evt", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "note", "type": ["null", "string"], "default": None},
    ]})

ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"],
     "note": {"string": "n1"}},
    {"id": 2, "name": "ü", "score": -0.25, "tags": [], "note": None},
    {"id": 3, "name": "", "score": 0.0, "tags": ["z"],
     "note": {"string": ""}},
]


@pytest.mark.skipif(not AVRO_JARS, reason="spark-avro jar not present "
                    "(set SPARK_GRAFT_AVRO_JARS; public Maven artifact)")
def test_avro_python_codec_matches_from_avro(tmp_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    s = (SparkSession.builder.master("local[2]")
         .appName("avro-parity").config("spark.jars", AVRO_JARS)
         .getOrCreate())
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        from benthos_spark.operators.avro_py import (avro_decode_json,
                                                     avro_encode_json)

        df = s.createDataFrame([(json.dumps(r, sort_keys=True),)
                                for r in ROWS], "j string")
        enc = df.select(avro_encode_json(F.col("j"), AVRO_SCHEMA)
                        .alias("b"), "j")

        # python-encoded bytes must decode identically through the JVM
        jvm = enc.select(from_avro(F.col("b"), AVRO_SCHEMA).alias("r"),
                         "j").collect()
        for row in jvm:
            want = json.loads(row["j"])
            got = row["r"].asDict(recursive=True)
            assert got["id"] == want["id"]
            assert got["name"] == want["name"]
            assert got["score"] == want["score"]
            assert list(got["tags"]) == want["tags"]
            note = want["note"]
            assert got["note"] == (note["string"] if note else None)

        # and JVM-encoded bytes decode identically through the codec
        back = (enc.select(from_avro(F.col("b"), AVRO_SCHEMA).alias("r"))
                .select(to_avro(F.col("r"), AVRO_SCHEMA).alias("b2")))
        dec = back.select(avro_decode_json(F.col("b2"), AVRO_SCHEMA)
                          .alias("j2")).collect()
        got_set = {r["j2"] for r in dec}
        def norm(r):
            n = dict(r)
            n["note"] = n["note"]["string"] if n["note"] else None
            return json.dumps(n, sort_keys=True)
        assert got_set == {norm(r) for r in ROWS}
    finally:
        s.stop()


@pytest.mark.skipif(not PB_JARS, reason="spark-protobuf jar not present "
                    "(set SPARK_GRAFT_PROTOBUF_JARS; public artifact)")
def test_protobuf_python_codec_matches_from_protobuf(tmp_path):
    """Python wire-format bytes must decode identically via
    from_protobuf.  Builds a descriptor set with protoc when available,
    else skips (descriptor generation needs the protobuf toolchain)."""
    import shutil
    import subprocess

    if shutil.which("protoc") is None:
        pytest.skip("protoc not on PATH (needed to build the "
                    "descriptor set for from_protobuf)")

    proto = tmp_path / "evt.proto"
    proto.write_text('syntax = "proto3";\nmessage Evt {\n'
                     '  int64 id = 1;\n  string name = 2;\n'
                     '  double score = 3;\n  repeated string tags = 4;\n'
                     '}\n')
    desc = tmp_path / "evt.desc"
    subprocess.run(["protoc", f"--descriptor_set_out={desc}",
                    f"--proto_path={tmp_path}", str(proto)], check=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    s = (SparkSession.builder.master("local[2]")
         .appName("pb-parity").config("spark.jars", PB_JARS)
         .getOrCreate())
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        from benthos_spark.operators.protobuf_py import (ProtoRegistry,
                                                         json_to_message)

        reg = ProtoRegistry()
        reg.add_source(proto.read_text())
        msgs = [{"id": 7, "name": "a", "score": 2.5, "tags": ["t1"]},
                {"id": 8, "name": "", "score": 0.0, "tags": []}]
        data = [(json_to_message(json.dumps(m), "Evt", reg),)
                for m in msgs]
        df = s.createDataFrame(data, "b binary")
        got = df.select(from_protobuf(F.col("b"), "Evt",
                                      descFilePath=str(desc))
                        .alias("r")).collect()
        out = sorted((r["r"].asDict(recursive=True) for r in got),
                     key=lambda d: d["id"])
        assert out[0]["id"] == 7 and out[0]["name"] == "a"
        assert out[0]["score"] == 2.5 and list(out[0]["tags"]) == ["t1"]
        assert out[1]["id"] == 8 and list(out[1]["tags"]) == []
    finally:
        s.stop()
