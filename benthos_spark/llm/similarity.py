"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
LSH bucketing (random hyperplanes) so each query only scans its bucket.
Everything is built-in higher-order functions — the dot products run in
whole-stage codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i via zip_with + aggregate (left-to-right double fold —
    deterministic, reproducible across engines)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs cast to double before multiplying so
    float32 embeddings accumulate identically everywhere."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec: str = "embedding", id_col: str = "vec_id",
                     qvec: str = "embedding",
                     qid: str = "query_id",
                     exclude_self: bool = False) -> DataFrame:
    """Exact top-k neighbors for each query: broadcast the queries,
    cross-join against the corpus (one scan, no corpus shuffle), rank
    per query.  Ties broken by corpus id for determinism.

    Scale: cost is |corpus| × |queries| dot products distributed over
    corpus partitions — the right baseline whenever queries are few;
    for many queries use lsh_bucketed_topk."""
    q = F.broadcast(queries.select(F.col(qid), F.col(qvec).alias("__qv")))
    scored = (corpus.select(F.col(id_col), F.col(vec))
              .crossJoin(q)
              .withColumn("cos", F.round(cosine(F.col(vec), F.col("__qv")), 6)))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(qid))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(qid, id_col, "cos", "rank"))


def hyperplane_sketch(vec: Column, planes: list[list[float]]) -> Column:
    """Sign sketch: bit i = 1 if vec · plane_i > 0 (random-hyperplane
    LSH; cosine-preserving).  Planes are plan-time literals —
    broadcast-free, codegen'd."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        out = out + F.when(dot(F.transform(vec, lambda x: x.cast("double")),
                               p) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return out


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame,
                      planes: list[list[float]], k: int = 10,
                      vec: str = "embedding", id_col: str = "vec_id",
                      qvec: str = "embedding",
                      qid: str = "query_id") -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane
    buckets.  With b planes the corpus splits into 2^b buckets, so each
    query scans ~|corpus|/2^b vectors; recall is tuned by b and by
    multi-probing (querying neighboring buckets).  The join is a plain
    equi-join on the bucket id — shuffle on a small int key, AQE
    coalesces the tiny partitions."""
    c = corpus.withColumn("__bucket", hyperplane_sketch(F.col(vec), planes))
    q = queries.withColumn("__bucket", hyperplane_sketch(F.col(qvec), planes)) \
               .select(qid, F.col(qvec).alias("__qv"), "__bucket")
    scored = (c.join(q, "__bucket")
               .withColumn("cos", F.round(cosine(F.col(vec), F.col("__qv")), 6)))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(qid, id_col, "cos", "rank"))


# ---------------------------------------------------------------- IVF

def kmeans_unit_sphere(X, n_centroids: int, iters: int) -> list[list[float]]:
    """Spherical k-means (Lloyd) core: pure numpy, deterministic given
    the row order of X (first-k init, fixed iteration count, argmax
    first-max tie-break).  Shared by the Spark trainer and by external
    reproductions (e.g. a DuckDB oracle re-deriving the same centroid
    literals from the same parquet sample)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64).copy()
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(iters):
        sims = X @ C.T                       # cosine == dot on unit sphere
        assign = sims.argmax(axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C.tolist()


def semdedup_params(n_rows: int, target_cluster_size: int = 256,
                    min_k: int = 4, max_k: int = 1 << 16) -> tuple[int, int]:
    """(n_centroids, fit_sample) for SemDeDup at a given corpus size.

    k = ceil(n / target_cluster_size): expected cluster size is the
    CONSTANT target, so the per-cluster pairwise pass stays
    O(target²·k) = O(target·n) — linear in the corpus — instead of
    O(n²/k) with a fixed k (the quadratic blowup SemDeDup's clustering
    exists to avoid).  The fit sample grows 16 points per centroid
    (floor 512) so first-k init always has members to assign.

    Shared by the Spark query AND external oracle reproductions — both
    sides must derive (k, sample) from the same row count to stay
    bit-identical."""
    import math
    k = int(min(max_k, max(min_k,
                           math.ceil(n_rows / target_cluster_size))))
    return k, max(512, 16 * k)


def train_ivf_centroids(corpus: DataFrame, vec: str = "embedding",
                        id_col: str = "vec_id", n_centroids: int = 16,
                        sample: int = 2048, iters: int = 8) -> list[list[float]]:
    """Coarse quantizer for IVF: spherical k-means (Lloyd) on a
    DETERMINISTIC sample (first `sample` ids), trained driver-side in
    numpy.  Standard IVF practice at 100 TB: the quantizer trains on a
    tiny sample once; only the centroid literals ship with the plan, so
    assignment is pure codegen — no model object, no shuffle.

    Deterministic by construction: id-filtered sample (a pushed-down
    parquet filter) SORTED by id (the sort touches only `sample` rows,
    so row order no longer depends on partition layout), first-k init,
    fixed iteration count."""
    rows = (corpus.select(id_col, vec)
            .filter(F.col(id_col) < sample).orderBy(id_col).collect())
    return kmeans_unit_sphere([list(r[1]) for r in rows],
                              n_centroids, iters)


def _probe_udf(centroids: list[list[float]], n_probe: int):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    record batch ((batch × dim) @ (dim × k)) — ~100× the interpreted
    per-row higher-order-function fold Spark would otherwise run (HOF
    lambdas are NOT codegen'd; measured on this workload)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64).T  # dim × k

    # annotation-free signature: module has `from __future__ import
    # annotations`, which breaks pandas_udf type-hint resolution
    @pandas_udf("array<int>")
    def probes(vecs):
        import pandas as pd
        X = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype=object)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C
        # stable argsort: deterministic tie-break by centroid index
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(int).tolist() for row in idx])

    return probes


def _sim_structs_sql(centroids: list[list[float]]) -> str:
    """SQL text for array<struct<sim,idx>> of UNNORMALIZED dot products
    against every centroid literal, expanded as flat arithmetic over a
    pre-cast `__v` array<double> column (no higher-order functions →
    whole-stage codegen; argmax/top-n over dots is invariant to the
    vector's norm, so normalization is skipped).

    One F.expr string on purpose: building k·dim terms through Column
    operators costs a Py4J round-trip per node (~4000 JVM calls ≈
    seconds of driver time); one SQL parse is milliseconds."""
    parts = []
    for i, c in enumerate(centroids):
        terms = " + ".join(f"__v[{j}] * {float(x)!r}D"
                           for j, x in enumerate(c) if x != 0.0) or "0.0D"
        parts.append(f"struct(({terms}) AS sim, {i} AS idx)")
    return "array(" + ", ".join(parts) + ")"


# Above this many k·dim literal terms the flat SQL expression stops
# being a win: janino has to compile ONE method with k·d multiply-adds
# and blows the compiler itself past ~10k terms (measured: k=235, d=64
# → driver OOM/stack overflow inside UnitCompiler).  The Arrow kernel
# below is bit-exact with the SQL fold, so the switch is invisible.
_FLAT_ASSIGN_MAX_TERMS = 4096


def _assign_corpus_flat(corpus: DataFrame, centroids: list[list[float]],
                        vec: str) -> DataFrame:
    """Corpus rows → nearest-centroid `__list`.

    Small k: flat codegen'd arithmetic (see ivf_topk for why each
    piece looks the way it does).  Large k (auto-k SemDeDup at scale):
    an Arrow kernel whose per-(row, centroid) dot accumulates
    DIMENSION-BY-DIMENSION LEFT-TO-RIGHT in float64 — the identical
    IEEE sequence to the SQL `v[0]*c0 + v[1]*c1 + …` sum — and whose
    `>=` best-update gives the max-sim/larger-idx-on-ties winner,
    exactly the SQL array_max(struct(sim, idx)) contract.  Both paths
    are bit-identical to the DuckDB CASE oracle on well-formed input;
    deviations only on unreachable shapes: vectors SHORTER than the
    centroid dim map to -1 here (ANSI flat SQL errors on the
    out-of-bounds index), NaN elements map to -1 (Spark orders NaN
    greatest)."""
    k = len(centroids)
    d = max((len(c) for c in centroids), default=0)
    if k * d <= _FLAT_ASSIGN_MAX_TERMS:
        sims = _sim_structs_sql(centroids)
        vcast = F.expr(f"transform(`{vec}`, x -> cast(x as double))")
        # the isNull guard is load-bearing: on a NULL vector every sim
        # is NULL and array_max's struct compare falls through to the
        # idx field — silently assigning NULL rows to cluster k-1
        return (corpus
                .withColumn("__v", vcast)
                .withColumn("__list", F.when(
                    F.col(vec).isNull(), F.lit(-1)).otherwise(
                    F.coalesce(F.expr(f"array_max({sims}).idx"),
                               F.lit(-1))))
                .drop("__v"))

    from collections.abc import Iterator

    cols = corpus.columns
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in corpus.schema.fields) + ", __list int"
    C = [[float(x) for x in c] for c in centroids]

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        Cl = np.asarray(C, dtype=np.float64)
        kk, dd = Cl.shape
        for pdf in batches:
            n = len(pdf)
            X = np.zeros((n, dd))
            ok = np.zeros(n, dtype=bool)
            for r, v in enumerate(pdf[vec]):
                if v is not None and len(v) >= dd:
                    X[r] = np.asarray(v[:dd], dtype=np.float64)
                    ok[r] = True
            best = np.full(n, -np.inf)
            besti = np.full(n, -1, dtype=np.int32)
            for i in range(kk):
                acc = np.zeros(n)
                for j in range(dd):  # left-to-right fold == SQL sum
                    acc = acc + X[:, j] * Cl[i, j]
                take = ok & (acc >= best)  # >= : larger idx wins ties
                besti[take] = i
                best[take] = acc[take]
            out = pdf.copy()
            out["__list"] = besti
            yield out

    return corpus.mapInPandas(run, schema=schema).select(
        *cols, "__list")


def _query_probes_flat(queries: DataFrame, centroids: list[list[float]],
                       n_probe: int, qvec: str, qid: str,
                       checkpoint: bool = True) -> DataFrame:
    """Queries → (qid, __qv, __list) with one row per probed list."""
    sims = _sim_structs_sql(centroids)
    qcast = F.expr(f"transform(`{qvec}`, x -> cast(x as double))")
    q = (queries
         .withColumn("__v", qcast)
         .withColumn("__p", F.explode(F.expr(
             f"slice(reverse(array_sort({sims})), 1, {n_probe})")))
         .select(qid, F.col(qvec).alias("__qv"),
                 F.col("__p.idx").alias("__list")))
    if checkpoint:
        q = q.localCheckpoint(eager=False)
    return q


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             centroids: list[list[float]], k: int = 10, n_probe: int = 2,
             vec: str = "embedding", id_col: str = "vec_id",
             qvec: str = "embedding", qid: str = "query_id",
             checkpoint_queries: bool = True) -> DataFrame:
    """IVF-partitioned ANN: corpus rows land in their nearest-centroid
    inverted list; each query probes its `n_probe` closest lists.  The
    join is an equi-join on a small int key — at scale the corpus can be
    written bucketed/partitioned by `__list` so probes prune partitions
    and never touch the rest of the 100 TB.  Recall tunes with
    n_centroids × n_probe (recall gate in tests/test_llm.py).

    Assignment strategy: for modest quantizers (k·dim ≤ 4096) the dot
    products expand to flat codegen'd arithmetic — zero Python, zero
    lambdas; beyond that the expression tree stops paying and the
    Arrow-batched numpy matmul path (`_probe_udf`) takes over."""
    # Flat-path plan-size discipline (in _assign_corpus_flat /
    # _query_probes_flat): the lambda-HOF cast is deliberate —
    # CollapseProject will inline a plain `cast(col as array<double>)`
    # into every one of the k·dim downstream terms (k·dim copies of
    # the cast → MiB-scale task binaries), and a lambdafunction is not
    # considered collapse-cheap, so `__v` stays one projection.  The
    # coalesce(-1) never fires (the struct array is a non-empty
    # literal) but makes `__list` non-nullable, so the join stops
    # inferring an isnotnull(__list) filter that predicate pushdown
    # would fill with a SECOND copy of the whole expression.  The
    # localCheckpoint severs the probe expression from the join stage:
    # queries are few by contract, so materializing them is O(queries)
    # while halving what the join stage must analyze, codegen, and
    # ship.
    flat = len(centroids) * len(centroids[0]) <= 4096
    if flat:
        c = _assign_corpus_flat(corpus, centroids, vec)
        q = _query_probes_flat(queries, centroids, n_probe, qvec, qid,
                               checkpoint=checkpoint_queries)
    else:
        assign1 = _probe_udf(centroids, 1)
        c = corpus.withColumn("__list", assign1(F.col(vec))[0])
        assign_n = _probe_udf(centroids, n_probe)
        q = (queries
             .select(qid, F.col(qvec).alias("__qv"),
                     F.explode(assign_n(F.col(qvec))).alias("__list")))
    scored = (c.join(q, "__list")
               .withColumn("cos",
                           F.round(cosine(F.col(vec), F.col("__qv")), 6)))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(qid, id_col, "cos", "rank"))


# ------------------------------------------------------- IVF on-disk index

def write_ivf_index(corpus: DataFrame, path: str,
                    centroids: list[list[float]],
                    vec: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Materialize the IVF inverted lists as a parquet table
    PARTITIONED by `__list` — the 100 TB serving layout: a probe
    touches only its lists' directories, the other ~(1 - n_probe/k)
    of the corpus is never read (partition pruning at the scan, not a
    filter after it).  Pay the assignment scan once at build time;
    every subsequent query set reads only what it probes."""
    c = _assign_corpus_flat(corpus, centroids, vec)
    c.write.mode("overwrite").partitionBy("__list").parquet(path)


def ivf_topk_indexed(spark, path: str, queries: DataFrame,
                     centroids: list[list[float]], k: int = 10,
                     n_probe: int = 2, vec: str = "embedding",
                     id_col: str = "vec_id", qvec: str = "embedding",
                     qid: str = "query_id") -> DataFrame:
    """ANN top-k against a write_ivf_index layout.  The probed list
    ids collect to the driver (|queries| × n_probe ints — bounded by
    contract, same discipline as the IVF trainer sample) and become a
    STATIC `IN` filter on the partition column, so the parquet scan
    lists only the probed directories; `.explain` shows the pruned
    PartitionFilters.  Everything downstream is the ivf_topk join."""
    corpus = spark.read.parquet(path)
    q = _query_probes_flat(queries, centroids, n_probe, qvec, qid)
    lists = sorted({r["__list"] for r in q.select("__list")
                    .distinct().collect()})
    pruned = corpus.filter(F.col("__list").isin(lists))
    scored = (pruned.join(q, "__list")
              .withColumn("cos",
                          F.round(cosine(F.col(vec), F.col("__qv")), 6)))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(qid, id_col, "cos", "rank"))
