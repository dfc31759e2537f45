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
