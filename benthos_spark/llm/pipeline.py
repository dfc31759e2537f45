"""End-to-end corpus curation: the full training-data pipeline as one
composed DataFrame plan — quality gate → near-dup canonical selection →
eval-set decontamination.

This is the integration layer over llm/{text,dedup}.py: a user of the
individual operators runs exactly this composition before pretraining
(the RefinedWeb/FineWeb recipe shape).  Everything stays one lazy plan:
Catalyst pushes the scan-side quality predicates into parquet, the
near-dup machinery only ever sees quality survivors, and the corpus
side of every junction is a broadcast semi-/anti-join — no stage
shuffles the full corpus except the dedup candidate generation itself.

Scale notes per stage (at 100 TB):
- quality gate: pure Column expressions, evaluated at the scan;
- canonical selection: LSH-banded candidates only (llm/dedup.py), CC on
  the candidate subgraph, verdicts broadcast back;
- decontamination: 48-bit gram hashes of the eval set broadcast at
  ~8 B/gram; the corpus is anti-joined map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def curate_corpus(corpus: DataFrame, eval_df: DataFrame,
                  text: str = "text", id_col: str = "doc_id",
                  quality_col: str = "n_chars",
                  min_words: int = 10, decontam_n: int = 5,
                  require_stops: bool = True,
                  extra_keep: Column | None = None) -> DataFrame:
    """Run the curation pipeline; returns the KEPT documents as
    (id_col, component, n_tokens).

    Stages: (1) Gopher-lite quality gate (word-count bounds, ≥80%
    alpha words, ≥2 stop words unless `require_stops=False` — turn it
    off for non-English/technical corpora where the English stop list
    is meaningless — plus optional `extra_keep`); (2) MinHash-LSH →
    connected components → keep the highest-`quality_col` doc per
    near-dup cluster; (3) drop survivors sharing any word
    `decontam_n`-gram with `eval_df`."""
    from benthos_spark.llm.dedup import (canonical_selection,
                                         minhash_lsh_star_edges,
                                         ngram_contamination)
    from benthos_spark.llm.text import gopher_signals, token_count

    sig = gopher_signals(F.col(text), min_words=min_words)
    keep = sig["word_count_ok"] & sig["alpha_ok"]
    if require_stops:
        keep = keep & sig["stops_ok"]
    if extra_keep is not None:
        keep = keep & extra_keep
    quality = corpus.filter(keep)

    # star edges: identical clusters/canonicals as the all-pairs LSH
    # surface, linear (not quadratic) in boilerplate-bucket size (r6)
    canon = canonical_selection(quality, minhash_lsh_star_edges(quality),
                                id_col=id_col, quality_col=quality_col)
    # The canonical-verdict frame is referenced by BOTH downstream
    # junctions (the decontamination gram scan and the final
    # anti-join each re-derive `kept`), and without a barrier each
    # broadcast build re-executes the whole verdict subplan —
    # minhash + window + CC-label join — once per use (measured 1.5 s
    # of the bench exec).  A lazy localCheckpoint materializes it
    # once.  Scale-safe BY CONSTRUCTION: this frame must fit a
    # broadcast anyway (one (id, component) row per quality doc, the
    # "broadcast verdicts" contract), so storing it per-executor
    # costs no more than the broadcast it feeds.  `quality` (the
    # corpus) is deliberately NOT checkpointed: at 100 TB that would
    # spill a corpus-sized intermediate to executor storage, where
    # re-scanning the columnar source is the cheaper side of the
    # trade (guide §5).
    canonf = (canon.filter(F.col("is_canonical") == 1)
              .select(id_col, "component")
              .localCheckpoint(eager=False))
    kept = quality.join(F.broadcast(canonf), id_col)

    dirty = ngram_contamination(kept, eval_df, text=text,
                                id_col=id_col, n=decontam_n)
    return (kept.join(F.broadcast(dirty.select(id_col)),
                      id_col, "left_anti")
            .select(F.col(id_col), F.col("component"),
                    token_count(F.col(text)).alias("n_tokens")))
