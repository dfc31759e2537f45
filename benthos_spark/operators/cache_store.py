"""`cache` processor: keyed store with get / set / add / delete.

Reference: lib/processor/cache.go:22,276-282 + the cache resources
(lib/cache/{memory,file,redis,s3,...}.go).  The reference does one
cache round-trip per message; the engine batches every operation into
set algebra over a keyed table:

    get    → broadcast lookup join (zero round trips)
    set    → upsert: new rows win over existing (last-write-wins)
    add    → insert-if-absent: existing rows win (cache.go `add` op)
    delete → anti-join

Backing store here is a parquet directory (read-modify-write, atomic
via overwrite); at 100 TB the same four verbs map verb-for-verb onto
Delta/Iceberg MERGE INTO — the class isolates that swap behind
`_read`/`_write`.  TTL semantics (memory cache `ttl`) map to a
`__cached_at` column + an age filter on read, mirroring the expiring
cache the reference uses for dedupe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CacheStore:
    def __init__(self, spark: SparkSession, path: str, key: str = "key",
                 ttl_seconds: int | None = None):
        self.spark = spark
        self.path = path
        self.key = key
        self.ttl_seconds = ttl_seconds

    # ---- storage (swap for Delta MERGE at scale) ----
    # Writes go to fresh version directories (v000001, v000002, ...) and
    # reads pick the highest — read-modify-write against one directory
    # would delete the very files the lazy plan still reads.  This is
    # the transaction-log idea Delta/Iceberg implement properly; the
    # verb layer above is storage-agnostic.

    def _versions(self) -> list[str]:
        import glob
        import os
        return sorted(glob.glob(os.path.join(self.path, "v*")))

    def _read(self) -> DataFrame | None:
        versions = self._versions()
        if not versions:
            return None
        df = self.spark.read.parquet(versions[-1])
        if self.ttl_seconds is not None:
            cutoff = F.unix_timestamp(F.current_timestamp()) - self.ttl_seconds
            df = df.filter(F.col("__cached_at") >= cutoff)
        return df

    def _write(self, df: DataFrame) -> None:
        import os
        versions = self._versions()
        n = int(os.path.basename(versions[-1])[1:]) + 1 if versions else 1
        df.write.mode("errorifexists").parquet(
            os.path.join(self.path, f"v{n:06d}"))
        # retire superseded versions (best effort; readers of the old
        # version in this session have already materialized)
        import shutil
        for old in versions[:-1]:
            shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _stamp(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__cached_at", F.unix_timestamp(F.current_timestamp()))

    # ---- verbs ----

    def set(self, updates: DataFrame) -> None:
        """Upsert: updates win over existing rows (cache.go set op)."""
        current = self._read()
        updates = self._stamp(updates)
        if current is None:
            self._write(updates)
            return
        kept = current.join(updates.select(self.key), on=self.key,
                            how="left_anti")
        self._write(kept.unionByName(updates))

    def add(self, inserts: DataFrame) -> None:
        """Insert-if-absent: existing rows win (cache.go add op —
        first-wins is what makes the reference's dedupe work)."""
        current = self._read()
        inserts = self._stamp(inserts)
        if current is None:
            self._write(inserts)
            return
        fresh = inserts.join(current.select(self.key), on=self.key,
                             how="left_anti")
        self._write(current.unionByName(fresh))

    def get(self, stream: DataFrame, on: str | None = None,
            how: str = "left") -> DataFrame:
        """Enrich a frame from the cache (broadcast lookup join)."""
        current = self._read()
        on = on or self.key
        if current is None:
            return stream  # empty cache: nothing to add
        dim = current.drop("__cached_at")
        if on != self.key:
            dim = dim.withColumnRenamed(self.key, on)
        return stream.join(F.broadcast(dim), on=on, how=how)

    def delete(self, keys: DataFrame) -> None:
        """Remove keys (anti-join)."""
        current = self._read()
        if current is None:
            return
        self._write(current.join(keys.select(self.key), on=self.key,
                                 how="left_anti"))


class KVClientCache:
    """Client-bridged cache resource (lib/cache/{redis,memcached,
    mongodb,aws_dynamodb}.go): the four cache verbs map onto per-row
    calls through ONE client per partition — the same injectable-
    factory doctrine as the kv_store processors and the bus bridge.

    The factory returns an adapter with the flat KV contract
    `kv_get(key) -> str | None`, `kv_set(key, value)`,
    `kv_add(key, value)`, `kv_delete(key)`; the default family
    factories below wrap the real drivers (gated on the package with
    an actionable error), tests inject doubles via
    `resources.caches.<name>.client_resource`.

    Scale shape: `get` is a mapInPandas enrichment (clients pipeline
    per partition — no driver round-trips); writes go through
    foreachPartition.  A remote KV store IS a per-key round-trip
    surface; the batched set-algebra path for 100 TB joins is the
    parquet/Delta CacheStore above.
    """

    def __init__(self, factory, key: str = "key"):
        self.factory = factory
        self.key = key

    def get(self, stream: DataFrame, on: str | None = None,
            how: str = "left") -> DataFrame:
        on = on or self.key
        factory = self.factory
        from pyspark.sql.types import StringType, StructField, StructType
        # nb: StructType.add mutates the frame's cached schema object —
        # build a fresh one
        schema = StructType(list(stream.schema.fields)
                            + [StructField("value", StringType())])

        def enrich(batches):
            client = factory()
            for pdf in batches:
                pdf = pdf.copy()
                pdf["value"] = [client.kv_get(str(k)) for k in pdf[on]]
                yield pdf

        return stream.mapInPandas(enrich, schema=schema)

    def _send(self, df: DataFrame, verb: str) -> None:
        factory, key = self.factory, self.key

        def run(rows):
            client = factory()
            for r in rows:
                if verb == "set":
                    client.kv_set(str(r[key]), r["value"])
                elif verb == "add":
                    client.kv_add(str(r[key]), r["value"])
                else:
                    client.kv_delete(str(r[key]))

        df.foreachPartition(run)

    def set(self, updates: DataFrame) -> None:
        self._send(updates, "set")

    def add(self, inserts: DataFrame) -> None:
        self._send(inserts, "add")

    def delete(self, keys: DataFrame) -> None:
        self._send(keys, "delete")


class MultilevelCache:
    """`multilevel` cache (lib/cache/multilevel.go): an ordered chain
    of named caches.  Get = first level that holds the key wins, and
    the hit is written back to every earlier level (setUpToLevel-
    Passive, multilevel.go:139); set/delete fan out to every level;
    add is blocked by a key present in ANY level and otherwise lands
    bottom-up with the LAST level authoritative (multilevel.go:
    209-246 — the reference's per-row already-exists error is this
    engine's batch first-wins no-op, same doctrine as CacheStore.add).

    Levels must follow the (key, value) column contract the `cache`
    processor writes."""

    def __init__(self, levels: list):
        if not levels:
            raise ValueError("multilevel cache needs at least one level")
        self.levels = levels
        self.key = levels[0].key

    def _level_values(self, keys: DataFrame, on: str) -> list:
        """Per-level lookup of `keys`, each as (on, __v<i>)."""
        cols = []
        for i, lvl in enumerate(self.levels):
            got = lvl.get(keys, on=on)
            vc = f"__v{i}"
            if "value" in got.columns:
                cols.append(got.select(F.col(on),
                                       F.col("value").alias(vc)))
            else:  # empty CacheStore: get() passes through unchanged
                cols.append(keys.select(
                    F.col(on),
                    F.lit(None).cast("string").alias(vc)))
        return cols

    def get(self, stream: DataFrame, on: str | None = None,
            how: str = "left") -> DataFrame:
        on = on or self.key
        keys = stream.select(F.col(on)).distinct()
        enriched = keys
        for level in self._level_values(keys, on):
            enriched = enriched.join(level, on=on, how="left")
        vcols = [f"__v{i}" for i in range(len(self.levels))]
        enriched = enriched.persist()
        try:
            # passive write-back: a hit at level i fills every miss
            # at levels j < i
            for j in range(len(self.levels) - 1):
                later = F.coalesce(*[F.col(c) for c in vcols[j + 1:]])
                wb = (enriched
                      .filter(F.col(vcols[j]).isNull()
                              & later.isNotNull())
                      .select(F.col(on).alias(self.levels[j].key),
                              later.alias("value")))
                if not wb.isEmpty():
                    self.levels[j].set(wb)
            dim = (enriched
                   .select(F.col(on),
                           F.coalesce(*[F.col(c) for c in vcols])
                            .alias("value"))
                   .filter(F.col("value").isNotNull()))
            return stream.join(F.broadcast(dim), on=on, how=how)
        finally:
            enriched.unpersist()

    def set(self, updates: DataFrame) -> None:
        for lvl in self.levels:
            lvl.set(updates)

    def add(self, inserts: DataFrame) -> None:
        fresh = inserts
        keys = inserts.select(self.key).distinct()
        for level in self._level_values(keys, self.key):
            existing = (level.filter(level.columns[1] + " IS NOT NULL")
                        .select(self.key))
            fresh = fresh.join(existing, on=self.key, how="left_anti")
        for lvl in reversed(self.levels):  # last level first, then up
            lvl.add(fresh)

    def delete(self, keys: DataFrame) -> None:
        for lvl in self.levels:
            lvl.delete(keys)


def _gated_import(module: str, family: str, hint: str):
    import importlib
    try:
        return importlib.import_module(module)
    except ImportError as exc:
        raise RuntimeError(
            f"{family} cache: {module} is not installed in this "
            f"environment; set client_resource to a registered factory "
            f"(contract: kv_get/kv_set/kv_add/kv_delete) or install "
            f"{hint}") from exc


def redis_cache_factory(url: str, prefix: str = ""):
    """Default `redis` cache client (lib/cache/redis.go): GET/SET,
    SETNX for add, DEL for delete."""
    def factory():
        redis = _gated_import("redis", "redis", "redis-py")
        r = redis.Redis.from_url(url)

        class _KV:
            def kv_get(self, k):
                v = r.get(prefix + k)
                return v.decode() if isinstance(v, bytes) else v

            def kv_set(self, k, v):
                r.set(prefix + k, v)

            def kv_add(self, k, v):
                r.setnx(prefix + k, v)

            def kv_delete(self, k):
                r.delete(prefix + k)

        return _KV()
    return factory


def memcached_cache_factory(addresses: list[str], prefix: str = ""):
    """Default `memcached` cache client (lib/cache/memcached.go)."""
    def factory():
        pymemcache = _gated_import("pymemcache.client.base", "memcached",
                                   "pymemcache")
        host, _, port = str(addresses[0]).partition(":")
        c = pymemcache.Client((host, int(port or 11211)))

        class _KV:
            def kv_get(self, k):
                v = c.get(prefix + k)
                return v.decode() if isinstance(v, bytes) else v

            def kv_set(self, k, v):
                c.set(prefix + k, v)

            def kv_add(self, k, v):
                c.add(prefix + k, v)

            def kv_delete(self, k):
                c.delete(prefix + k)

        return _KV()
    return factory


def mongodb_cache_factory(url: str, database: str, collection: str):
    """Default `mongodb` cache client (lib/cache/mongodb.go): one
    document per key, `_id` = key."""
    def factory():
        pymongo = _gated_import("pymongo", "mongodb", "pymongo")
        coll = pymongo.MongoClient(url)[database][collection]

        class _KV:
            def kv_get(self, k):
                doc = coll.find_one({"_id": k})
                return None if doc is None else doc.get("value")

            def kv_set(self, k, v):
                coll.replace_one({"_id": k}, {"_id": k, "value": v},
                                 upsert=True)

            def kv_add(self, k, v):
                from pymongo.errors import DuplicateKeyError
                try:
                    coll.insert_one({"_id": k, "value": v})
                except DuplicateKeyError:
                    pass

            def kv_delete(self, k):
                coll.delete_one({"_id": k})

        return _KV()
    return factory


def dynamodb_cache_factory(table: str, region: str | None = None):
    """Default `aws_dynamodb` cache client (lib/cache/aws_dynamodb.go):
    get_item/put_item with attribute_not_exists for add."""
    def factory():
        boto3 = _gated_import("boto3", "aws_dynamodb", "boto3")
        t = boto3.resource("dynamodb", region_name=region).Table(table)

        class _KV:
            def kv_get(self, k):
                item = t.get_item(Key={"key": k}).get("Item")
                return None if item is None else item.get("value")

            def kv_set(self, k, v):
                t.put_item(Item={"key": k, "value": v})

            def kv_add(self, k, v):
                try:
                    t.put_item(Item={"key": k, "value": v},
                               ConditionExpression=
                               "attribute_not_exists(#k)",
                               ExpressionAttributeNames={"#k": "key"})
                except Exception:
                    pass  # conditional check failed: key exists

            def kv_delete(self, k):
                t.delete_item(Key={"key": k})

        return _KV()
    return factory
