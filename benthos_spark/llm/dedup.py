"""Deduplication operators for document corpora.

Five strategies, cheapest→strongest:

1. exact            — content-hash groupBy (one shuffle on the hash).
2. ngram_jaccard    — shingle inverted index + pair verification.
3. minhash_lsh      — MinHash signatures + banded LSH bucketing; the
                      100 TB path (candidate pairs only, never all-pairs).
4. simhash          — 32-bit sign-aggregated fingerprint; hamming-0
                      buckets (extendable to 1-2 bit probes).
5. embedding_cosine — near-dup via embedding similarity threshold.

Hashing uses the portable polynomial hash (llm.text.char_hash) so the
DuckDB oracle can reproduce results bit-for-bit; swap in F.xxhash64 for
maximum throughput when cross-engine reproducibility isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from benthos_spark.llm.text import HASH_PRIME

# fixed affine-permutation parameters (public MinHash construction:
# h_i(x) = (a_i * x + b_i) mod p), seeded deterministically
MINHASH_PERMS = [(2 * i + 1, 7919 * (i + 1) % HASH_PRIME)
                 for i in range(16)]


def hash48(col: Column) -> Column:
    """Portable 48-bit string hash: first 12 hex chars of md5.

    All JVM intrinsics (md5/substring/conv) → whole-stage codegen,
    unlike a char-level polynomial fold which Spark evaluates
    interpreted inside higher-order functions (~100× slower in the
    shingle loop).  DuckDB reproduces it exactly (see oracle SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 the content, keep the smallest id per hash.
    One hash-aggregate shuffle; at 100 TB prefer grouping on the digest
    (fixed 16 bytes) over the raw text — done here."""
    return (df.withColumn("__h", F.md5(F.col(text)))
              .groupBy("__h")
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("n_copies"))
              .drop("__h"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as arrays of strings."""
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    return F.when(k >= n, F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )).otherwise(F.array(F.array_join(toks, " ")))


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct portable hashes of the document's n-word shingles."""
    return F.array_distinct(
        F.transform(word_shingles(text, n), hash48))


def signature_from_hashes(sh: Column,
                          perms: list[tuple[int, int]] = MINHASH_PERMS) -> Column:
    """MinHash signature over a (materialized) shingle-hash array: per
    permutation i, min over hashes of (a_i*h + b_i) mod p."""

    def perm_min(a: int, b: int) -> Column:
        return F.array_min(F.transform(
            sh, lambda h: (h * a + b) % HASH_PRIME))

    return F.array(*[perm_min(a, b) for a, b in perms])


def minhash_signature(text: Column, n: int = 3,
                      perms: list[tuple[int, int]] = MINHASH_PERMS) -> Column:
    """MinHash signature straight from text (convenience form; for bulk
    use materialize shingle_hashes first — see minhash_lsh_pairs)."""
    return signature_from_hashes(shingle_hashes(text, n), perms)


def minhash_lsh_pairs(df: DataFrame, text: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    rows_per_band = len(perms)/bands; two docs collide if any band of
    their signatures is identical.  The band-explode + self-join touches
    only (doc, band) keys — at 100 TB this is the standard linear-ish
    alternative to the quadratic all-pairs compare.  AQE handles hot
    buckets (boilerplate documents) via skew-join splitting.

    The repartition between shingle-hashing and signature/band
    projection is a deliberate materialization barrier: Catalyst's
    CollapseProject would otherwise inline the shingle-hash array into
    all 16 permutation expressions and every band key, recomputing it
    ~64× per row (higher-order funcs run interpreted, so CSE doesn't
    save us).  The shuffled payload is just (id, 16 longs) — tiny.
    """
    r = len(MINHASH_PERMS) // bands
    hashed = df.select(F.col(id_col),
                       shingle_hashes(F.col(text), n).alias("__sh")) \
               .repartition(id_col)
    sig_df = hashed.select(
        F.col(id_col), signature_from_hashes(F.col("__sh")).alias("__sig")) \
        .repartition(id_col)
    sig = F.col("__sig")
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.array_join(F.transform(F.slice(sig, i * r + 1, r),
                                     lambda x: x.cast("string")), "-")
            for i in range(bands)
        ])).alias("band", "band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.band_key") == F.col("r.band_key"))
                      & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, text: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    explode distinct shingle hashes, self-join on shingle (only docs
    sharing ≥1 shingle pair up), count intersections, filter by
    |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.

    Scale: the join key is a shingle hash — high cardinality, well
    spread; stop-shingle removal (df filter on document frequency)
    is the standard guard for pathological corpora.

    The repartition is a materialization barrier (as in
    minhash_lsh_pairs): without it Catalyst inlines the shingle-hash
    subtree into explode(), size(), and BOTH sides of the self-join —
    4× recompute of an interpreted higher-order fold (measured 9×
    slower at sf0.01).  With it, the self-join reuses one exchange."""
    hashed = df.select(F.col(id_col),
                       shingle_hashes(F.col(text), n).alias("__sh")) \
               .repartition(id_col)
    sh = hashed.select(F.col(id_col),
                       F.explode("__sh").alias("sh"),
                       F.size("__sh").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"),
                      F.col("a.n_sh").alias("na"),
                      F.col("b.n_sh").alias("nb"))
             .agg(F.count("*").alias("common")))
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")).cast("double")
    return (inter.withColumn("jaccard", F.round(jac, 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash fingerprint over a (materialized) token-hash array: for
    each bit j, sum ±1 over the hashes' j-th bit; fingerprint bit j = 1
    if the sum is positive.  32 bits keeps every intermediate in int64
    for oracle portability."""

    def bit_vote(j: int) -> Column:
        return F.aggregate(
            hashes, F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j) % 2 == 1, F.lit(1))
               .otherwise(F.lit(-1)))

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(bit_vote(j) > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return out


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash straight from text (convenience form)."""
    return simhash_from_hashes(
        F.transform(F.split(F.trim(text), r"\s+"), hash48), bits)


def simhash_dup_groups(df: DataFrame, text: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Documents sharing an identical SimHash (hamming distance 0).
    For distance-k matching, index each of the C(bits,k) masked variants
    (standard multi-probe construction) — same groupBy shape.

    Token hashes are materialized behind a repartition barrier so the
    32 bit-vote folds share one hash array instead of recomputing the
    md5s 32× (CollapseProject would inline them otherwise)."""
    hashed = df.select(
        F.col(id_col),
        F.transform(F.split(F.trim(F.col(text)), r"\s+"), hash48)
         .alias("__th")).repartition(id_col)
    return (hashed.withColumn("simhash", simhash_from_hashes(F.col("__th")))
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_docs") > 1))


def embedding_near_dup_pairs(df: DataFrame, vec: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.95) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    All-pairs here (correct baseline; fine to ~10^4 vectors/partition);
    the 100 TB path routes through similarity.lsh_bucketed_topk which
    only compares within random-hyperplane buckets."""
    from benthos_spark.llm.similarity import cosine
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
                 .filter(F.col("cos") >= threshold)
                 .select("id_a", "id_b", "cos"))
