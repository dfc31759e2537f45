"""Full-text relevance search over a document corpus: inverted-index
statistics + BM25 scoring, expressed as DataFrame algebra.

The classic retrieval pipeline (build postings → df/idf → score → top-k)
maps onto Spark without any custom index structure:

- the "inverted index" is the exploded (doc, term, tf) frame — Catalyst
  prunes it to the query vocabulary BEFORE the aggregation, so the only
  shuffled rows are postings of terms someone actually asked for;
- corpus statistics (N, avgdl) are two scalar aggregates;
- scoring is a broadcast join of the (tiny) query-term frame against the
  pruned postings, then an integer-exact per-(query, doc) sum.

Scale shape at 100 TB: TWO map-only scans of the corpus — one builds
the pruned postings, one computes the (N, avgdl) corpus statistics as a
map-side-combined count/sum.  Two cheap scans are deliberate: folding
the stats into the postings pass would require materializing an
O(corpus) per-doc frame (or sentinel rows in the checkpoint), whereas
scans parallelize for free and the only materialized state stays
bounded by the query vocabulary.  Then one small shuffle of the pruned
postings and a per-query top-k window over candidates — no global
sort, no all-pairs.
Per-term contributions are integerized to micro-units before the final
sum, so scores are order-free int64 sums, bit-exact across engines and
partitionings (the frequency_mass trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def query_terms_frame(spark, queries: list[tuple[str, str]]) -> DataFrame:
    """(query_id, term) frame from literal (id, text) query strings —
    whitespace-tokenized, distinct terms per query.

    Built as a JVM VALUES LocalRelation, NOT createDataFrame: a
    pickled-RDD scan pays a Python worker round-trip on every
    execution — measured ~5 s per broadcast build, the dominant cost
    of the whole BM25 query (operators/literals.py)."""
    from benthos_spark.operators.literals import literal_frame
    rows = []
    for qid, qtext in queries:
        for t in sorted(set(qtext.split())):
            rows.append((qid, t))
    return literal_frame(spark, rows, "query_id string, term string")


def bm25_topk(corpus: DataFrame, queries: list[tuple[str, str]],
              text: str = "text", id_col: str = "doc_id",
              topk: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Spärck Jones, the public Okapi
    formula): score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Returns (query_id, doc_id, rank, score_micro) — score in integer
    micro-units (round(score·1e6)), ranked score DESC then doc_id.
    """
    from benthos_spark.llm.text import tokens

    spark = corpus.sparkSession
    qt = query_terms_frame(spark, queries)
    vocab = sorted({t for _, qtext in queries for t in qtext.split()})

    # postings pruned to the query vocabulary (an isin literal filter —
    # pushed below the explode); the stats branch below re-scans for
    # its count/sum — see the module docstring for why two map-only
    # scans beat materializing an O(corpus) per-doc frame
    toks = corpus.select(F.col(id_col),
                         tokens(F.col(text)).alias("__toks"))
    lengths = toks.select(id_col, F.size("__toks").alias("dl"))
    # localCheckpoint: postings feed BOTH the score join and the df
    # aggregation, and their different column prunings defeat
    # ReuseExchange — without it the corpus would be scanned once per
    # branch.  The checkpointed frame is the PRUNED postings (only
    # query-vocabulary terms survive), so its size is bounded by the
    # query set, not the corpus.
    postings = (toks.select(F.col(id_col), F.size("__toks").alias("dl"),
                            F.explode("__toks").alias("term"))
                .filter(F.col("term").isin(vocab))
                .groupBy(id_col, "term")
                .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
                .localCheckpoint(eager=True))

    stats = lengths.agg(F.count("*").alias("n_docs"),
                        F.sum("dl").alias("dl_sum"))
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))

    # per-(query, doc, term) contribution, integerized to micro-units;
    # expression order mirrors the oracle SQL exactly (each IEEE op is
    # correctly rounded, so identical trees give identical doubles)
    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (F.col("n_docs").cast("double")
                              - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(k1) * (F.lit(1.0 - b)
                               + F.lit(b) * (F.col("dl").cast("double")
                                             / avgdl))
    contrib = F.round(idf * ((tfd * F.lit(k1 + 1.0)) / denom) * 1e6) \
        .cast("long")

    scored = (postings
              .join(F.broadcast(qt), "term")
              .join(F.broadcast(dfreq), "term")
              .join(F.broadcast(stats))
              .select("query_id", id_col, contrib.alias("__c"))
              .groupBy("query_id", id_col)
              .agg(F.sum("__c").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("query_id", id_col, "rank", "score_micro"))


def tfidf_topk_terms(corpus: DataFrame, text: str = "text",
                     id_col: str = "doc_id", k: int = 5,
                     min_df: int = 1) -> DataFrame:
    """Per-document keyword extraction: top-k terms by tf·idf with
    idf = ln(N/df) (raw Salton form; terms in every doc score 0 and
    drop out naturally).  Scores integerize to micro-units before
    ranking so the (score, term) order is identical in any engine.

    Returns (id_col, term, rank, score_micro), rank 1..k per doc by
    score DESC then term ASC.  Scale shape: one scan → (doc, term, tf)
    hash-agg, a broadcast of the (term, df) vocabulary table, and one
    per-doc window — no global sort, no all-pairs."""
    from benthos_spark.llm.text import tokens

    toks = corpus.select(F.col(id_col),
                         F.explode(tokens(F.col(text))).alias("term")) \
        .filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=True)  # feeds df-agg AND the score join
    dfreq = (tf.groupBy("term").agg(F.count("*").alias("df"))
             .filter(F.col("df") >= min_df))
    n_docs = corpus.select(F.col(id_col)).distinct().count()

    idf = F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    score = F.round(F.col("tf").cast("double") * idf * 1e6).cast("long")
    scored = (tf.join(F.broadcast(dfreq), "term")
              .select(F.col(id_col), "term", score.alias("score_micro")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter((F.col("rank") <= k) & (F.col("score_micro") > 0))
            .select(id_col, "term", "rank", "score_micro"))
