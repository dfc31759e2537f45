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

def train_ivf_centroids(corpus: DataFrame, vec: str = "embedding",
                        id_col: str = "vec_id", n_centroids: int = 16,
                        sample: int = 2048, iters: int = 8) -> list[list[float]]:
    """Coarse quantizer for IVF: spherical k-means (Lloyd) on a
    DETERMINISTIC sample (first `sample` ids), trained driver-side in
    numpy.  Standard IVF practice at 100 TB: the quantizer trains on a
    tiny sample once; only the centroid literals ship with the plan, so
    assignment is pure codegen — no model object, no shuffle.

    Deterministic by construction: ordered sample, first-k init, fixed
    iteration count."""
    import numpy as np

    rows = (corpus.select(id_col, vec).orderBy(id_col)
            .limit(sample).collect())
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
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


def _unit(vec: Column) -> Column:
    vd = F.transform(vec, lambda x: x.cast("double"))
    n = norm(vd)
    return F.transform(vd, lambda x: x / n)


def _centroid_sims(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<sim,idx>> of similarities to every centroid literal."""
    u = _unit(vec)
    return F.array(*[
        F.struct(dot(u, F.array(*[F.lit(float(x)) for x in c])).alias("sim"),
                 F.lit(i).alias("idx"))
        for i, c in enumerate(centroids)])


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             centroids: list[list[float]], k: int = 10, n_probe: int = 2,
             vec: str = "embedding", id_col: str = "vec_id",
             qvec: str = "embedding", qid: str = "query_id") -> DataFrame:
    """IVF-partitioned ANN: corpus rows land in their nearest-centroid
    inverted list; each query probes its `n_probe` closest lists.  The
    join is an equi-join on a small int key — at scale the corpus can be
    written bucketed/partitioned by `__list` so probes prune partitions
    and never touch the rest of the 100 TB.  Recall tunes with
    n_centroids × n_probe (recall gate in tests/test_llm.py)."""
    c = corpus.withColumn(
        "__list", F.array_max(_centroid_sims(F.col(vec), centroids))["idx"])
    probes = F.slice(F.reverse(F.array_sort(
        _centroid_sims(F.col(qvec), centroids))), 1, n_probe)
    q = (queries
         .select(qid, F.col(qvec).alias("__qv"),
                 F.explode(F.transform(probes, lambda s: s["idx"]))
                 .alias("__list")))
    scored = (c.join(q, "__list")
               .withColumn("cos",
                           F.round(cosine(F.col(vec), F.col("__qv")), 6)))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(qid, id_col, "cos", "rank"))
