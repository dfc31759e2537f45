"""YAML golden-case test runner — the `benthos test` analogue.

Reference schema (lib/service/test/case.go:51-61): a test file holds
cases `{name, target_processors | target_mapping, input_batch,
output_batches}`; input parts are `{content | json_content, metadata}`
(case.go:16-19); output assertions per part: content_equals,
json_equals, json_contains, metadata_equals, bloblang
(condition.go:43-73).

This runner replays the same file shape against the Spark engine: the
input batch becomes a message DataFrame (datamodel.rows_to_messages),
`target_mapping` compiles through the Bloblang compiler in document
mode, `target_processors` runs the stream.py processor chain, and
assertions check collected output parts in order.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import yaml
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class CaseResult:
    name: str
    ok: bool
    message: str = ""


def _input_df(spark: SparkSession, parts: list[dict]):
    from benthos_spark.datamodel import rows_to_messages
    rows = []
    for part in parts:
        content = part.get("content")
        if content is None and "json_content" in part:
            content = json.dumps(part["json_content"], sort_keys=True)
        rows.append({"content": content,
                     "meta": part.get("metadata") or {}})
    return rows_to_messages(spark, rows)


def _resolve_pointer(doc: dict, pointer: str):
    """RFC-6901-ish pointer ('/pipeline/processors') into a config doc
    (the reference's target_processors path form, case.go:51)."""
    cur = doc
    for seg in pointer.strip("/").split("/"):
        if isinstance(cur, list):
            cur = cur[int(seg)]
        else:
            cur = cur[seg]
    return cur


def _doc_mode_frame(spark, df, contents: list[str | None]):
    """Document mode for reference tests: infer the batch's JSON schema
    and expose `this` as the parsed document.  Returns (df, this_col)
    — this_col None when the contents aren't JSON documents."""
    docs = [c for c in contents
            if c and c.lstrip()[:1] in ("{", "[")]
    if not docs or len(docs) != len([c for c in contents if c]):
        return df, None
    if docs[0].lstrip().startswith("["):
        # array document: schema_of_json on the sample (read.json would
        # explode the elements into rows)
        row = spark.range(1).select(
            F.schema_of_json(F.lit(docs[0]))).head()
        return df, F.from_json(F.col("content"), row[0])
    inferred = spark.read.json(
        spark.sparkContext.parallelize(docs)).schema
    if not inferred.fields or any(
            f.name.startswith("_corrupt") for f in inferred.fields):
        return df, None
    return df, F.from_json(F.col("content"), inferred)


def _go_floats(c):
    """Go's json.Marshal prints float64 6.0 as `6`; Spark's to_json
    prints `6.0`.  Canonicalize trailing-.0 floats in serialized JSON
    so content_equals compares Go-style text."""
    return F.regexp_replace(c, r"(\d)\.0(?=[,\]\}])", r"$1")


def _reserialize_content(out, keep_meta: bool):
    """Mapped columns → a JSON `content` string (Go json.Marshal sorts
    object keys, so both engines agree on field order when the struct
    fields are alphabetical — schema inference already sorts them).
    A single `root` column (whole-document scalar/array root) IS the
    body: strings pass through raw, everything else serializes."""
    from pyspark.sql import types as T
    aux = [c for c in ("batch_id", "part_index", "meta", "_error")
           if c in out.columns]
    payload = [c for c in out.columns
               if c not in aux and c != "content"]
    if not payload:
        # meta-only mapping (or already-serialized frame): the content
        # passes through unchanged
        return out
    cols = [F.col(c) for c in aux]
    if payload == ["__root__"]:
        # whole-document scalar/array root IS the body: strings raw,
        # containers via to_json, plain scalars via their text form
        dt = out.schema["__root__"].dataType
        if isinstance(dt, (T.StringType, T.BinaryType)):
            body = F.col("__root__")
        elif isinstance(dt, (T.StructType, T.ArrayType, T.MapType,
                             T.VariantType)):
            body = _go_floats(F.to_json(F.col("__root__")))
        else:
            body = _go_floats(F.col("__root__").cast("string"))
        cols.append(body.alias("content"))
    else:
        cols.append(_go_floats(
            F.to_json(F.struct(*sorted(payload)))).alias("content"))
    return out.select(*cols)


def _apply_target(spark, df, case: dict, base_dir: str = ".",
                  base_doc: dict | None = None):
    import os

    env = case.get("environment")
    saved = {}
    if env:
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = str(v)
    try:
        contents = [p.get("content") if p.get("content") is not None
                    else json.dumps(p.get("json_content"))
                    for p in case.get("input_batch", [])]
        if "target_mapping" in case:
            from benthos_spark.bloblang import compile_mapping
            src = case["target_mapping"]
            if isinstance(src, str) and (src.startswith("./")
                                         or src.endswith(".blobl")):
                with open(os.path.join(base_dir, src)) as fh:
                    src = fh.read()
            schema = case.get("content_schema")
            if schema:
                this = F.from_json(F.col("content"), schema)
            else:
                df, this = _doc_mode_frame(spark, df, contents)
            out = compile_mapping(src, base_dir=base_dir).apply(
                df, this=this,
                keep=("batch_id", "part_index", "meta", "content"))
            # reserialize even without a document view: a mapping over
            # raw content still produces a JSON document from its
            # assigned fields (content passes through only when the
            # mapping assigns no root fields)
            return _reserialize_content(out, True)
        if "target_processors" in case:
            from benthos_spark.stream import _apply_processor
            procs = case["target_processors"]
            doc_mode = False
            if isinstance(procs, str):
                # JSON-pointer into the companion config — either
                # '/pipeline/processors' (same/companion doc) or
                # './file.yaml#/pipeline/processors' (explicit file,
                # case.go target resolution); pointer form implies the
                # content-document doctrine
                doc = base_doc or {}
                if "#" in procs:
                    fpath, _, procs = procs.partition("#")
                    with open(os.path.join(base_dir, fpath)) as fh:
                        doc = yaml.safe_load(fh)
                procs = _resolve_pointer(doc, procs)
                doc_mode = True
            this = None
            if doc_mode:
                df, this = _doc_mode_frame(spark, df, contents)
            for proc in procs:
                if doc_mode and isinstance(proc, dict) \
                        and next(iter(proc)) == "bloblang":
                    from benthos_spark.bloblang import compile_mapping
                    from benthos_spark.bloblang.compiler import (
                        map_dynamic, mapping_needs_dynamic)
                    from benthos_spark.bloblang.parser import (
                        parse_mapping)
                    src = str(proc["bloblang"])
                    if mapping_needs_dynamic(
                            parse_mapping(src, base_dir=base_dir)):
                        df = map_dynamic(df, src, base_dir=base_dir)
                    else:
                        out = compile_mapping(
                            src, base_dir=base_dir).apply(
                            df, this=this,
                            keep=("batch_id", "part_index", "meta", "content"))
                        df = _reserialize_content(out, True)
                    # re-derive the document view for the next stage
                    rows = [r.content for r in
                            df.select("content").collect()]
                    df, this = _doc_mode_frame(spark, df, rows)
                else:
                    df = _apply_processor(df, proc)
            return df
        raise ValueError(f"case {case.get('name')!r}: needs "
                         "target_mapping or target_processors")
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _check_part(row, assertions: dict, part_no: int) -> str | None:
    d = row.asDict(recursive=True)
    if "content_equals" in assertions:
        got = d.get("content")
        if got != assertions["content_equals"]:
            return (f"part {part_no}: content_equals failed: "
                    f"{got!r} != {assertions['content_equals']!r}")
    if "json_equals" in assertions:
        got = {k: v for k, v in d.items()
               if k not in ("batch_id", "part_index", "meta", "_error")}
        want = assertions["json_equals"]
        if "content" in d and isinstance(d["content"], str):
            try:
                got = json.loads(d["content"])
            except ValueError:
                pass
        if got != want:
            return f"part {part_no}: json_equals failed: {got!r} != {want!r}"
    if "json_contains" in assertions:
        got = d
        if "content" in d and isinstance(d["content"], str):
            try:
                got = json.loads(d["content"])
            except ValueError:
                got = d
        for k, v in assertions["json_contains"].items():
            if got.get(k) != v:
                return (f"part {part_no}: json_contains[{k}] failed: "
                        f"{got.get(k)!r} != {v!r}")
    if "metadata_equals" in assertions:
        got = d.get("meta") or {}
        for k, v in assertions["metadata_equals"].items():
            if got.get(k) != str(v):
                return (f"part {part_no}: metadata_equals[{k}] failed: "
                        f"{got.get(k)!r} != {v!r}")
    return None


def run_case(spark: SparkSession, case: dict, base_dir: str = ".",
             base_doc: dict | None = None) -> CaseResult:
    name = case.get("name", "<unnamed>")
    try:
        df = _input_df(spark, case["input_batch"])
        out = _apply_target(spark, df, case, base_dir=base_dir,
                            base_doc=base_doc)
        order = [c for c in ("batch_id", "part_index") if c in out.columns]
        rows = (out.orderBy(*order) if order else out).collect()
        expected_batches = case.get("output_batches", [])
        expected_parts = [p for batch in expected_batches for p in batch]
        if len(rows) != len(expected_parts):
            return CaseResult(name, False,
                              f"expected {len(expected_parts)} output "
                              f"parts, got {len(rows)}")
        for i, (row, assertions) in enumerate(zip(rows, expected_parts)):
            err = _check_part(row, assertions, i)
            if err:
                return CaseResult(name, False, err)
        return CaseResult(name, True)
    except Exception as e:
        return CaseResult(name, False, f"error: {e}")


def run_test_file(spark: SparkSession, path: str,
                  verbose: bool = False) -> list[CaseResult]:
    """Run all cases in a YAML test file; returns failures.

    Reference layouts both work: tests inline with the config in one
    file, or a `X_benthos_test.yaml` beside its `X.yaml` config
    (lib/service/test/ discovery)."""
    import os

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    base_doc = doc
    if "tests" in doc and "pipeline" not in doc:
        companion = path.replace("_benthos_test", "")
        if companion != path and os.path.exists(companion):
            with open(companion) as fh:
                base_doc = yaml.safe_load(fh)
    cases = doc.get("tests", doc if isinstance(doc, list) else [])
    failures: list[CaseResult] = []
    for case in cases:
        res = run_case(spark, case, base_dir=os.path.dirname(path) or ".",
                       base_doc=base_doc)
        if verbose:
            print(("PASS " if res.ok else "FAIL ") + res.name
                  + (f": {res.message}" if res.message else ""))
        if not res.ok:
            failures.append(res)
    return failures


def fake_lambda_client_factory():
    """boto3 lambda `invoke` contract double for tests: doubles `n`
    from the JSON payload, simulates a function error when the payload
    sets `boom`.  Lives in the library (not the test module) so
    executors can unpickle it by reference."""
    class FakeLambdaClient:
        def invoke(self, FunctionName, Payload):
            import io
            import json
            doc = json.loads(Payload.decode() or "{}")
            if doc.get("boom"):
                return {"StatusCode": 500,
                        "Payload": io.BytesIO(b"kaput"),
                        "FunctionError": "Unhandled"}
            body = json.dumps({"fn": FunctionName,
                               "n2": doc.get("n", 0) * 2})
            return {"StatusCode": 200,
                    "Payload": io.BytesIO(body.encode())}

    return FakeLambdaClient()


def fake_redis_client_factory():
    """redis-py contract double (scard/sadd/incrby) over seeded state.
    Each executor partition builds its own instance from the same seed,
    so tests assert per-row results, not shared client state."""
    class FakeRedis:
        def __init__(self):
            self.sets = {"colours": {"red", "green", "blue"},
                         "empty": set()}
            self.counters = {"hits": 10}

        def scard(self, key):
            return len(self.sets.get(key, ()))

        def sadd(self, key, member):
            s = self.sets.setdefault(key, set())
            if member in s:
                return 0
            s.add(member)
            return 1

        def incrby(self, key, amount):
            v = self.counters.get(key, 0) + int(amount)
            self.counters[key] = v
            return v

    return FakeRedis()


def fake_mongo_client_factory():
    """pymongo contract double: client[db][coll] collections seeded
    with two documents; write results expose matched/modified/deleted
    counts like pymongo's result objects."""
    class _InsertResult:
        inserted_id = "oid-1"

    class _WriteResult:
        def __init__(self, matched, modified, deleted=0):
            self.matched_count = matched
            self.modified_count = modified
            self.deleted_count = deleted

    class FakeCollection:
        def __init__(self):
            self.docs = [{"_id": 1, "name": "ada", "score": 9},
                         {"_id": 2, "name": "grace", "score": 7}]

        def _match(self, flt):
            return [d for d in self.docs
                    if all(d.get(k) == v for k, v in (flt or {}).items())]

        def insert_one(self, doc):
            self.docs.append(dict(doc))
            return _InsertResult()

        def delete_one(self, flt):
            hits = self._match(flt)
            if hits:
                self.docs.remove(hits[0])
            return _WriteResult(0, 0, deleted=1 if hits else 0)

        def delete_many(self, flt):
            hits = self._match(flt)
            for h in hits:
                self.docs.remove(h)
            return _WriteResult(0, 0, deleted=len(hits))

        def replace_one(self, flt, doc, upsert=False):
            hits = self._match(flt)
            if hits:
                i = self.docs.index(hits[0])
                self.docs[i] = {"_id": hits[0]["_id"], **doc}
                return _WriteResult(1, 1)
            if upsert:
                self.docs.append(dict(doc))
            return _WriteResult(0, 0)

        def update_one(self, flt, update, upsert=False):
            hits = self._match(flt)
            if hits:
                hits[0].update(update.get("$set", {}))
                return _WriteResult(1, 1)
            return _WriteResult(0, 0)

        def find_one(self, flt):
            hits = self._match(flt)
            return hits[0] if hits else None

    class _DB:
        def __init__(self):
            self._colls = {}

        def __getitem__(self, coll):
            return self._colls.setdefault(coll, FakeCollection())

    class FakeMongo:
        def __init__(self):
            self._dbs = {}

        def __getitem__(self, db):
            return self._dbs.setdefault(db, _DB())

    return FakeMongo()


def file_bus_client_factory(dir_path: str):
    """Bus-bridge contract double: publish() appends '<target>\\t<payload>'
    lines to a per-partition file under dir_path (executors share the
    local FS in local mode); poll() replays any lines published there.
    Returns a zero-arg factory suitable for resources registration."""
    def factory():
        class FileBusClient:
            def publish(self, target, payload):
                import os
                import uuid
                os.makedirs(dir_path, exist_ok=True)
                fn = f"{dir_path}/part-{os.getpid()}-{uuid.uuid4().hex[:6]}"
                with open(fn, "a") as fh:
                    fh.write(f"{target}\t{payload.decode()}\n")

            def write(self, target, key, document):
                self.publish(f"{target}\t{key}", document.encode())

            def poll(self, target, max_n):
                import glob
                out = []
                for fn in sorted(glob.glob(f"{dir_path}/part-*")):
                    with open(fn) as fh:
                        for line in fh:
                            tgt, _, payload = line.rstrip("\n").partition("\t")
                            if not target or tgt == target:
                                out.append((payload, {"bus_target": tgt}))
                return out[:max_n]

        return FileBusClient()
    return factory


def fake_sftp_client_factory(root_dir: str):
    """sftp contract double: the paramiko SFTPClient surface
    (listdir/open/remove/mkdir/close) mapped onto a local directory —
    remote path "/a/b.txt" lives at <root_dir>/a/b.txt.  Executors
    share the local FS in local mode, so output tests observe writes."""
    def factory():
        import os

        def local(path):
            return os.path.join(root_dir, path.lstrip("/"))

        class FakeSftpClient:
            def listdir(self, path="."):
                return sorted(os.listdir(local(path)))

            def open(self, path, mode="rb"):
                if "w" in mode or "a" in mode:
                    os.makedirs(os.path.dirname(local(path)),
                                exist_ok=True)
                return open(local(path), mode)

            def remove(self, path):
                os.remove(local(path))

            def mkdir(self, path):
                os.makedirs(local(path), exist_ok=True)

            def close(self):
                pass

        return FakeSftpClient()
    return factory


def fake_dynamodb_client_factory():
    """boto3 dynamodb execute_statement contract double: SELECTs
    return one item echoing the parameters; INSERTs return no items."""
    class FakeDynamo:
        def execute_statement(self, Statement, Parameters=None):
            if Statement.strip().upper().startswith("SELECT"):
                return {"Items": [{"q": {"S": Statement},
                                   "params": {"S": str(Parameters or [])}}]}
            return {"Items": []}

    return FakeDynamo()


def fake_kv_cache_client_factory(dir_path: str):
    """Flat-KV cache contract double (kv_get/kv_set/kv_add/kv_delete)
    backed by one file per key under `dir_path`, so executor-side
    writes are observable from the test process."""
    def factory():
        import hashlib
        import os

        class _KV:
            def _p(self, k):
                return os.path.join(
                    dir_path, hashlib.md5(str(k).encode()).hexdigest())

            def kv_get(self, k):
                try:
                    with open(self._p(k)) as fh:
                        return fh.read()
                except FileNotFoundError:
                    return None

            def kv_set(self, k, v):
                with open(self._p(k), "w") as fh:
                    fh.write("" if v is None else str(v))

            def kv_add(self, k, v):
                if not os.path.exists(self._p(k)):
                    self.kv_set(k, v)

            def kv_delete(self, k):
                try:
                    os.remove(self._p(k))
                except FileNotFoundError:
                    pass

        return _KV()
    return factory
