"""Sink routing (broker/switch/DLQ), control-flow processors, and
source wrappers."""

from __future__ import annotations

import shutil
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.control import (apply_resource, for_each,
                                             log_stage, metric_observe, noop,
                                             register_resource,
                                             subprocess_map, while_loop)
from benthos_spark.sinks import (fan_out, partition_routes, switch_output,
                                 with_dead_letter, write_file)
from benthos_spark.sources.files import read_until, sequence


def test_fan_out_delivers_to_all(spark):
    df = spark.range(5)
    got = []
    fan_out(df, [lambda d: got.append(d.count()),
                 lambda d: got.append(d.agg(F.sum("id")).collect()[0][0])])
    assert got == [5, 10]


def test_switch_output_first_match_and_default(spark):
    df = spark.range(10)
    buckets = {}
    switch_output(df, [
        (F.col("id") < 3, lambda d: buckets.setdefault(
            "small", sorted(r.id for r in d.collect()))),
        (F.col("id") < 6, lambda d: buckets.setdefault(
            "mid", sorted(r.id for r in d.collect()))),
        (None, lambda d: buckets.setdefault(
            "rest", sorted(r.id for r in d.collect()))),
    ])
    assert buckets == {"small": [0, 1, 2], "mid": [3, 4, 5],
                       "rest": [6, 7, 8, 9]}


def test_partition_routes_disjoint_and_complete(spark):
    df = spark.range(100)
    routes = partition_routes(df, 3, F.col("id"))
    ids = [sorted(r.id for r in route.collect()) for route in routes]
    allids = sorted(i for part in ids for i in part)
    assert allids == list(range(100))
    assert all(len(part) > 10 for part in ids)  # roughly balanced


def test_with_dead_letter_splits_on_error(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "boom"), (3, None)], "id INT, _error STRING")
    dlq = []
    clean = with_dead_letter(df, lambda d: dlq.extend(
        r.id for r in d.collect()))
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    assert dlq == [2]


def test_while_loop_bounded(spark):
    df = spark.range(1, 5).select(F.col("id").cast("double").alias("v"))
    out = while_loop(
        df,
        check=lambda d: d.agg(F.max("v")).collect()[0][0] > 1.0,
        body=lambda d: d.select((F.col("v") / 2).alias("v")),
    )
    assert out.agg(F.max("v")).collect()[0][0] <= 1.0
    with pytest.raises(RuntimeError, match="max_loops"):
        while_loop(df, check=lambda d: True,
                   body=lambda d: d, max_loops=3)


def test_resource_registry(spark):
    register_resource("double_v", lambda d: d.select((F.col("id") * 2).alias("id")))
    out = apply_resource(spark.range(3), "double_v")
    assert sorted(r.id for r in out.collect()) == [0, 2, 4]
    with pytest.raises(KeyError):
        apply_resource(spark.range(1), "nope")


def test_noop_and_for_each(spark):
    df = spark.range(3)
    assert noop(df) is df
    out = for_each(df, lambda d: d.withColumn("a", F.lit(1)),
                   lambda d: d.withColumn("b", F.col("a") + 1))
    assert out.columns == ["id", "a", "b"]


def test_subprocess_map_cat(spark):
    df = spark.createDataFrame([("hello",), ("world",)], "content STRING")
    out = subprocess_map(df, [sys.executable, "-u", "-c",
                              "import sys\nfor line in sys.stdin: "
                              "print(line.strip().upper(), flush=True)"])
    got = sorted(r.content for r in out.collect())
    assert got == ["HELLO", "WORLD"]


def test_log_and_metric_stages(spark):
    df = spark.range(4)
    assert log_stage(df, "checkpoint", count=True) is df
    observed = metric_observe(df, "total_ids", F.col("id"))
    assert observed.count() == 4  # action flushes the observation


def test_sequence_tags_sources(spark):
    a = spark.range(2)
    b = spark.range(2).select((F.col("id") + 10).alias("id"))
    out = sequence(spark, [a, b])
    got = sorted((r["__seq_source"], r["id"]) for r in out.collect())
    assert got == [(0, 0), (0, 1), (1, 10), (1, 11)]


def test_read_until_stops_at_condition(spark):
    df = spark.range(10).coalesce(1)
    out = read_until(df, F.col("id") == 4)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4]
    out2 = read_until(df, F.col("id") == 4, include_last=False)
    assert sorted(r.id for r in out2.collect()) == [0, 1, 2, 3]


def test_write_file_partitioned(spark):
    tmp = tempfile.mkdtemp(prefix="bs_sink")
    try:
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "id INT, tag STRING")
        write_file(df, f"{tmp}/out", partition_by=["tag"])
        back = spark.read.parquet(f"{tmp}/out")
        assert back.count() == 3
        import os
        assert sorted(d for d in os.listdir(f"{tmp}/out")
                      if d.startswith("tag=")) == ["tag=a", "tag=b"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sql_processor_select_and_error(spark, tmp_path):
    import sqlite3
    db = str(tmp_path / "dim.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE users (id INTEGER, name TEXT)")
    con.executemany("INSERT INTO users VALUES (?, ?)",
                    [(1, "ann"), (2, "bob")])
    con.commit(); con.close()

    from benthos_spark.operators.sql_exec import sql_query
    df = spark.createDataFrame([(1,), (2,), (9,)], "uid LONG")
    out = sql_query(df, db, "SELECT name FROM users WHERE id = ?",
                    args_cols=[F.col("uid")], result_codec="json_array",
                    alias="result").collect()
    got = {r.uid: r.result for r in out}
    assert got[1] == '[{"name": "ann"}]'
    assert got[9] == '[]'
    assert all(r._error is None for r in out)

    # bad SQL → per-row _error, rows survive
    bad = sql_query(df, db, "SELECT FROM nope WHERE id = ?",
                    args_cols=[F.col("uid")]).collect()
    assert all(r._error and "sql:" in r._error for r in bad)


def test_sql_processor_insert_via_config(spark, tmp_path):
    import sqlite3
    db = str(tmp_path / "out.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE sink (id INTEGER, sq INTEGER)")
    con.commit(); con.close()

    from benthos_spark.stream import run_stream
    run_stream(spark, f"""
input:
  generate:
    count: 5
    mapping: |
      root.id = this.id
      root.sq = this.id * this.id
pipeline:
  processors:
    - sql:
        driver: sqlite
        data_source_name: "{db}"
        query: "INSERT INTO sink VALUES (?, ?)"
        args:
          - this.id
          - this.sq
        result_codec: none
output:
  memory: {{}}
""").collect()
    con = sqlite3.connect(db)
    rows = sorted(con.execute("SELECT id, sq FROM sink").fetchall())
    con.close()
    assert rows == [(i, i * i) for i in range(5)]


def test_write_training_shards_deterministic(spark, tmp_path):
    import hashlib
    from benthos_spark.sinks.writers import write_training_shards
    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)],
                               "doc_id LONG, text STRING")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, n_shards=4)
    write_training_shards(df.repartition(13), p2, n_shards=4)

    def read(p):
        out = spark.read.parquet(p)
        return [(r.shard, r.doc_id) for r in
                out.sortWithinPartitions("shard").collect()]
    a = spark.read.parquet(p1)
    assert sorted(r.shard for r in a.select("shard").distinct()
                  .collect()) == [0, 1, 2, 3]
    # membership + within-shard order must match the hash model and be
    # independent of input partitioning
    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
    for p in (p1, p2):
        got = spark.read.parquet(p)
        for shard in range(4):
            # one sorted file per shard → read order IS written order
            ids = [r.doc_id for r in
                   got.filter(F.col("shard") == shard).collect()]
            assert ids == sorted(ids, key=lambda i: (h48(str(i)), i))
            assert all(h48(str(i)) % 4 == shard for i in ids)
    assert {r.doc_id for r in spark.read.parquet(p1).collect()} == set(range(200))


def test_write_webdataset_shards(spark, tmp_path):
    """Tar shards: deterministic membership/order, one member per
    configured extension, binary passthrough, reproducible archives."""
    import os
    import tarfile

    from benthos_spark.sinks.writers import write_webdataset_shards

    rows = [(i, f"text {i}", bytes([i % 256, 1, 2]), {"src": f"s{i % 3}"})
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, payload BINARY, "
              "meta MAP<STRING, STRING>")
    out = str(tmp_path / "wds")
    write_webdataset_shards(df, out, n_shards=4,
                            ext_cols={"txt": "text", "bin": "payload",
                                      "json": "meta"})
    shards = sorted(os.listdir(out))
    assert shards == [f"shard-{i:06d}.tar" for i in range(4)]
    seen = {}
    for s in shards:
        with tarfile.open(os.path.join(out, s)) as tar:
            names = tar.getnames()
            keys = {n.split(".")[0] for n in names}
            for k in keys:
                assert {f"{k}.txt", f"{k}.bin", f"{k}.json"} <= set(names)
            txt = tar.extractfile(f"{sorted(keys)[0]}.txt").read().decode()
            assert txt.startswith("text ")
            for k in keys:
                assert k not in seen
                seen[k] = s
    assert len(seen) == 40  # every doc in exactly one shard

    # determinism: rewriting produces byte-identical tars
    import hashlib
    before = {s: hashlib.md5(open(os.path.join(out, s), "rb").read())
              .hexdigest() for s in shards}
    write_webdataset_shards(df, out, n_shards=4,
                            ext_cols={"txt": "text", "bin": "payload",
                                      "json": "meta"})
    after = {s: hashlib.md5(open(os.path.join(out, s), "rb").read())
             .hexdigest() for s in shards}
    assert before == after


def test_webdataset_roundtrip_reader(spark, tmp_path):
    """write_webdataset_shards → read_webdataset_shards: every sample
    member comes back byte-identical, with its shard and extension."""
    from benthos_spark.sinks.writers import write_webdataset_shards
    from benthos_spark.sources.files import read_webdataset_shards
    df = spark.createDataFrame(
        [(i, f"text body {i}", bytes([i, i + 1, i + 2])) for i in range(20)],
        "doc_id long, text string, blob binary")
    out_dir = str(tmp_path / "wds")
    write_webdataset_shards(df, out_dir, n_shards=3,
                            ext_cols={"txt": "text", "bin": "blob"})
    back = read_webdataset_shards(spark, out_dir)
    rows = back.collect()
    assert len(rows) == 40  # 20 samples × 2 members
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, {})[r.ext] = (r.shard, bytes(r.content))
    for i in range(20):
        mem = by_key[str(i)]
        assert mem["txt"][1] == f"text body {i}".encode()
        assert mem["bin"][1] == bytes([i, i + 1, i + 2])
        assert mem["txt"][0] == mem["bin"][0]  # same shard per sample
        assert mem["txt"][0].startswith("shard-")


def test_bus_publish_and_poll_roundtrip(spark, tmp_path):
    """Bus bridge (sinks/bus.py): YAML output.<family> publishes every
    row through the injectable client; input.<family> polls the same
    store back — one contract for all ~14 broker families."""
    import json
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import file_bus_client_factory

    store = str(tmp_path / "bus")
    register_resource("file_bus", file_bus_client_factory(store))
    run_stream(spark, """
input:
  generate:
    count: 3
    mapping: |
      root.content = "msg-" + this.id.string()
pipeline:
  processors: []
output:
  nats:
    subject: updates
    client_resource: file_bus
""")
    out = run_stream(spark, """
input:
  nats:
    subject: updates
    client_resource: file_bus
output:
  memory: {}
""").collect()
    assert sorted(r.content for r in out) == ["msg-0", "msg-1", "msg-2"]
    assert all(r.meta["bus_kind"] == "nats" for r in out)
    _ = json


def test_bus_unknown_family_and_gate(spark):
    import pytest
    from benthos_spark.sinks.bus import poll_input, publish_output
    with pytest.raises(ValueError, match="unknown"):
        poll_input(spark, "carrier-pigeon", "t")
    df = spark.range(1)
    with pytest.raises(ValueError, match="unknown"):
        publish_output(df, "smoke-signal", "t")
    with pytest.raises(RuntimeError, match="boto3"):
        poll_input(spark, "aws_sqs", "q")


def test_doc_store_output_and_sql_output(spark, tmp_path):
    """Keyed doc-store outputs (write(target,key,doc) contract) and
    output.sql / output.mongodb execute the frame as the sink action."""
    import glob
    import sqlite3
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import (fake_mongo_client_factory,
                                       file_bus_client_factory)

    store = str(tmp_path / "docs")
    register_resource("file_store", file_bus_client_factory(store))
    run_stream(spark, """
input:
  generate:
    count: 2
    mapping: |
      root.content = "doc-" + this.id.string()
      root.doc_key = "k" + this.id.string()
output:
  elasticsearch:
    index: corpus
    id: "${! doc_key }"
    client_resource: file_store
""")
    lines = []
    for fn in glob.glob(f"{store}/part-*"):
        lines += open(fn).read().splitlines()
    assert sorted(lines) == ["corpus\tk0\tdoc-0", "corpus\tk1\tdoc-1"]

    # sql output: INSERT per message into sqlite
    db = str(tmp_path / "out.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE msgs (body TEXT)")
    con.commit()
    con.close()
    run_stream(spark, f"""
input:
  generate: {{count: 3, mapping: 'root.content = "m" + this.id.string()'}}
output:
  sql:
    driver: sqlite
    data_source_name: "{db}"
    query: "INSERT INTO msgs (body) VALUES (?)"
    args: ["content"]
""")
    con = sqlite3.connect(db)
    rows = sorted(r[0] for r in con.execute("SELECT body FROM msgs"))
    con.close()
    assert rows == ["m0", "m1", "m2"]

    # mongodb output: insert-one per message through the fake client
    register_resource("fake_mongo_out", fake_mongo_client_factory)
    out = run_stream(spark, """
input:
  generate: {count: 2, mapping: 'root.name = "n" + this.id.string()'}
output:
  mongodb:
    operation: insert-one
    collection: people
    client_resource: fake_mongo_out
    document_map: |
      root.name = this.name
""")
    assert out.count() == 2  # pass-through frame survives the sink

    import pytest
    with pytest.raises(RuntimeError, match="cassandra-driver"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: 'root.content = "x"'}}
output:
  cassandra: {table: t, id: "a"}
""")


def test_object_store_output_actionable_error(spark):
    import pytest
    from benthos_spark.stream import ConfigError, run_stream
    with pytest.raises(ConfigError, match="hadoop-aws"):
        run_stream(spark, """
input: {generate: {count: 1, mapping: 'root.content = "x"'}}
output:
  aws_s3: {bucket: my-bucket, path: out/, format: parquet}
""")


def test_sftp_input_output_roundtrip(spark, tmp_path):
    """input.sftp / output.sftp (lib/input/sftp.go:45,
    lib/output/sftp.go:26): injectable-client bridge over the codec
    stack — glob paths, lines codec, delete_on_finish; output with
    interpolated per-message paths and append codec."""
    import gzip
    import os
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import fake_sftp_client_factory

    root = str(tmp_path / "remote")
    os.makedirs(f"{root}/in", exist_ok=True)
    with open(f"{root}/in/a.txt", "w") as fh:
        fh.write("l1\nl2\n")
    with open(f"{root}/in/b.txt", "w") as fh:
        fh.write("l3\n")
    with open(f"{root}/in/skip.dat", "w") as fh:
        fh.write("nope\n")
    with gzip.open(f"{root}/in/c.gz", "wt") as fh:
        fh.write("l4\n")
    register_resource("fake_sftp", fake_sftp_client_factory(root))

    out = run_stream(spark, """
input:
  sftp:
    paths: ["/in/*.txt", "/in/c.gz"]
    codec: lines
    client_resource: fake_sftp
output:
  memory: {}
""").collect()
    assert sorted(r.content for r in out) == ["l1", "l2", "l3", "l4"]
    assert all(r.meta["sftp_path"].startswith("/in/") for r in out)

    # output: one remote file per message via interpolated path
    run_stream(spark, """
input:
  generate:
    count: 2
    mapping: |
      root.content = "body-" + this.id.string()
      root.name = "f" + this.id.string()
output:
  sftp:
    path: "/out/${! name }.txt"
    codec: all-bytes
    client_resource: fake_sftp
""")
    assert open(f"{root}/out/f0.txt").read() == "body-0"
    assert open(f"{root}/out/f1.txt").read() == "body-1"

    # append codec: all messages into one remote file
    run_stream(spark, """
input:
  generate: {count: 3, mapping: 'root.content = "m" + this.id.string()'}
output:
  sftp: {path: "/out/all.log", codec: append, client_resource: fake_sftp}
""")
    assert sorted(open(f"{root}/out/all.log").read().splitlines()) == \
        ["m0", "m1", "m2"]

    # delete_on_finish removes consumed remote files
    run_stream(spark, """
input:
  sftp:
    paths: ["/in/b.txt"]
    codec: all-bytes
    delete_on_finish: true
    client_resource: fake_sftp
output: {memory: {}}
""")
    assert not os.path.exists(f"{root}/in/b.txt")


def test_sftp_gated_without_client(spark):
    import pytest
    from benthos_spark.stream import run_stream
    with pytest.raises(RuntimeError, match="paramiko"):
        run_stream(spark, """
input: {sftp: {paths: ["/x.txt"]}}
output: {memory: {}}
""")


def test_jetstream_durable_resume(spark):
    """JetStream durable-subscription semantics (internal/impl/nats/
    jetstream_input.go): a durable consumer's drain resumes after its
    ack floor; an ephemeral consumer redelivers from the start;
    metadata carries stream/subject/sequence/durable."""
    from benthos_spark.operators.control import register_resource
    from benthos_spark.sinks.bus import jetstream_reset_cursor
    from benthos_spark.stream import run_stream

    log = [(i, f"msg-{i}") for i in range(1, 6)]  # server-side stream

    def factory():
        class FakeJetStream:
            def fetch(self, stream, subject, start_seq, max_n):
                return [(s, p) for s, p in log if s > start_seq][:max_n]
        return FakeJetStream()

    register_resource("fake_js", factory)
    jetstream_reset_cursor("work")
    cfg = """
input:
  nats_jetstream:
    stream: ORDERS
    subject: orders.*
    durable: work
    client_resource: fake_js
output: {memory: {}}
"""
    out = run_stream(spark, cfg).collect()
    assert sorted(r.content for r in out) == [f"msg-{i}"
                                              for i in range(1, 6)]
    m = out[0].meta
    assert m["nats_stream"] == "ORDERS" and m["nats_durable"] == "work"
    assert {r.meta["nats_sequence"] for r in out} == \
        {str(i) for i in range(1, 6)}

    # second drain: nothing below the ack floor
    assert run_stream(spark, cfg).count() == 0
    # new messages appear → only they are delivered
    log.extend([(6, "msg-6"), (7, "msg-7")])
    out2 = run_stream(spark, cfg).collect()
    assert sorted(r.content for r in out2) == ["msg-6", "msg-7"]

    # ephemeral consumer (no durable): always delivers from the start
    eph = cfg.replace("    durable: work\n", "")
    assert run_stream(spark, eph).count() == 7
    assert run_stream(spark, eph).count() == 7


def test_stream_bus_continuous_multibatch(spark):
    """Continuous bus bridge: rate-source foreachBatch drains the
    client incrementally — one long-lived client, multiple
    micro-batches, monotonic bus_offset in meta, idle auto-stop."""
    from benthos_spark.sinks.bus import stream_bus_input

    feed = [[f"a{i}" for i in range(3)],
            [],  # an empty poll between bursts must not stop the query
            [f"b{i}" for i in range(2)]]
    state = {"polls": 0, "clients": 0}
    got = []

    def factory():
        state["clients"] += 1

        class BurstClient:
            def poll(self, target, max_n):
                i = state["polls"]
                state["polls"] += 1
                return feed[i] if i < len(feed) else []
        return BurstClient()

    drained = stream_bus_input(
        spark, "nats", "subj",
        sink=lambda df, batch_id: got.extend(
            (r.content, r.meta["bus_offset"], r.meta["bus_batch"])
            for r in df.collect()),
        client_factory=factory, idle_stop_after=2, timeout=120)
    assert drained == 5
    assert state["clients"] == 1          # ONE client for the query
    assert sorted(x[0] for x in got) == ["a0", "a1", "a2", "b0", "b1"]
    offsets = sorted(int(x[1]) for x in got)
    assert offsets == [0, 1, 2, 3, 4]     # monotonic, no gaps
    assert len({x[2] for x in got}) >= 2  # genuinely multi-batch


def test_nanomsg_family_roundtrip(spark, tmp_path):
    """nanomsg (lib/input/nanomsg.go:14, lib/output/nanomsg.go) rides
    the shared bus bridge like the other 14 families."""
    from benthos_spark.operators.control import register_resource
    from benthos_spark.stream import run_stream
    from benthos_spark.testkit import file_bus_client_factory

    store = str(tmp_path / "nano")
    register_resource("nano_bus", file_bus_client_factory(store))
    run_stream(spark, """
input:
  generate:
    count: 2
    mapping: 'root.content = "n-" + this.id.string()'
output:
  nanomsg:
    urls: ["tcp://127.0.0.1:5555"]
    socket_type: PUSH
    subject: pipe
    client_resource: nano_bus
""")
    out = run_stream(spark, """
input:
  nanomsg:
    subject: pipe
    client_resource: nano_bus
output:
  memory: {}
""").collect()
    assert sorted(r.content for r in out) == ["n-0", "n-1"]
    assert all(r.meta["bus_kind"] == "nanomsg" for r in out)


def test_output_try_retry_drop_on(spark, tmp_path):
    """try (lib/output/try.go): first child that delivers wins; retry
    (retry.go): bounded re-attempts; drop_on error: true swallows a
    failing inner delivery."""
    from benthos_spark.stream import ConfigError, run_stream
    import pytest

    ok = str(tmp_path / "try_ok")
    run_stream(spark, f"""
input:
  generate: {{count: 2, mapping: 'root.content = "t" + this.id.string()'}}
output:
  try:
    - file: {{}}
    - file: {{path: "{ok}", format: json, mode: overwrite}}
""")
    import glob
    assert glob.glob(f"{ok}/*.json")

    with pytest.raises(ConfigError, match="every child failed"):
        run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "x"'}
output:
  try:
    - file: {}
    - kafka: {}
""")

    # retry: fails max_retries+1 times then surfaces the last error
    with pytest.raises(ConfigError, match="needs `path`"):
        run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "x"'}
output:
  retry: {max_retries: 1, output: {file: {}}}
""")

    # drop_on error: the failing inner output is swallowed
    run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "x"'}
output:
  drop_on: {error: true, output: {file: {}}}
""")


def test_output_files_per_message(spark, tmp_path):
    """files output (lib/output/files.go): one file per message at the
    interpolated path, written executor-side."""
    from benthos_spark.stream import run_stream

    run_stream(spark, f"""
input:
  generate:
    count: 3
    mapping: |
      root.content = "body-" + this.id.string()
      root.name = "m" + this.id.string()
output:
  files: {{path: "{tmp_path}/out/${{! name }}.txt"}}
""")
    got = {p.name: p.read_text()
           for p in (tmp_path / "out").glob("*.txt")}
    assert got == {"m0.txt": "body-0", "m1.txt": "body-1",
                   "m2.txt": "body-2"}


def test_output_cache_and_resource(spark, tmp_path):
    """cache output (lib/output/cache.go) writes each message under the
    interpolated key; resource output resolves resources.outputs."""
    from benthos_spark.stream import run_stream

    cache_dir = str(tmp_path / "cachestore")
    run_stream(spark, f"""
resources:
  caches:
    store: {{type: file, path: "{cache_dir}"}}
  outputs:
    sink_a: {{cache: {{target: store, key: "${{! name }}"}}}}
input:
  generate:
    count: 2
    mapping: |
      root.content = "v" + this.id.string()
      root.name = "k" + this.id.string()
output:
  resource: sink_a
""")
    out = run_stream(spark, f"""
resources:
  caches:
    store: {{type: file, path: "{cache_dir}"}}
input:
  generate:
    count: 2
    mapping: |
      root.content = "q"
      root.key = "k" + this.id.string()
pipeline:
  processors:
    - cache: {{resource: store, operator: get, key: this.key}}
output:
  memory: {{}}
""").collect()
    assert sorted(r.value for r in out) == ["v0", "v1"]


def test_output_inproc_and_dynamic(spark):
    """inproc output registers a named pipe in ctx; dynamic output
    routes to the selected child."""
    from benthos_spark.stream import _run_output, run_stream

    out = run_stream(spark, """
input:
  generate: {count: 1, mapping: 'root.content = "dyn"'}
output:
  dynamic:
    prefix: a
    outputs:
      a: {memory: {}}
      b: {drop: {}}
""")
    assert [r.content for r in out.collect()] == ["dyn"]

    ctx = {}
    df = spark.createDataFrame([("p",)], "content string")
    _run_output(df, {"inproc": "pipe1"}, ctx)
    assert [r.content for r in ctx["inproc"]["pipe1"].collect()] == ["p"]


def test_output_subprocess_and_socket(spark, tmp_path):
    """subprocess output pipes message lines to a command's stdin;
    socket output sends newline-delimited messages to a live TCP
    listener."""
    import socket
    import socketserver
    import threading
    from benthos_spark.stream import run_stream

    sink = tmp_path / "sub_out.txt"
    run_stream(spark, f"""
input:
  generate: {{count: 2, mapping: 'root.content = "s" + this.id.string()'}}
output:
  subprocess: {{name: tee, args: ["{sink}"]}}
""")
    assert sorted((sink).read_text().splitlines()) == ["s0", "s1"]

    got = []
    done = threading.Event()

    class H(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                got.append(line.decode().strip())
            done.set()

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        run_stream(spark, f"""
input:
  generate: {{count: 2, mapping: 'root.content = "t" + this.id.string()'}}
output:
  tcp: {{address: "127.0.0.1:{port}"}}
""")
        done.wait(5)
    finally:
        srv.shutdown()
        srv.server_close()
    assert sorted(got) == ["t0", "t1"]


def test_output_http_server_drain(spark):
    """http_server output: each GET pops one message; the action
    returns once every message is fetched."""
    import threading
    import urllib.request
    from benthos_spark.stream import run_stream

    port = 18731
    fetched = []

    def client():
        import time
        deadline = time.monotonic() + 10
        while len(fetched) < 2 and time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/get", timeout=1) as r:
                    if r.status == 200:
                        fetched.append(r.read().decode())
            except Exception:
                time.sleep(0.05)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    run_stream(spark, f"""
input:
  generate: {{count: 2, mapping: 'root.content = "h" + this.id.string()'}}
output:
  http_server: {{address: "127.0.0.1:{port}", path: /get, timeout: 15}}
""")
    t.join(10)
    assert sorted(fetched) == ["h0", "h1"]
