"""Streaming near-duplicate dedup: incremental MinHash-LSH.

Reference parity: lib/processor/dedupe.go:26 deduplicates a stream on
an exact key against a cache; this module is the NEAR-dup analogue the
batch LLM surface (llm/dedup.py) provides offline — the same banded
MinHash signatures, evaluated incrementally against keyed state, so a
100 TB firehose can be deduped as it arrives instead of in nightly
batch sweeps.

Design (r6 verdict ask #5):
- signatures come from the SAME Arrow kernel as the batch path
  (llm.dedup._banded_signatures_arrow inside the streaming query —
  mapInPandas is fully streaming-capable), so stream and batch can
  never disagree on what a signature is;
- per (band, band_key) keyed state holds ONE long — the minimum doc
  id seen so far (the bucket ROOT, exactly the star-edge root) — via
  applyInPandasWithState, optionally TTL'd;
- a document is emitted as a DUPLICATE the moment it loses to the
  root: new doc with a larger id → emitted immediately; a new doc
  DETHRONES the root (smaller id) → the old root is emitted then.
  Every bucket member except the final root is emitted exactly once
  per band, so the distinct emitted set over a fully drained stream
  equals the batch star-edge `id_b` set REGARDLESS of arrival order —
  that is the stream==batch equivalence contract, gated the same way
  streaming_replay gates windows (tests/test_streaming_dedupe.py
  drains id-ordered AND shuffled file sequences against the batch
  surface).

State size: one long per live (band, band_key) — bands × |distinct
buckets|, independent of stream length; `ttl_ms` bounds it further for
unbounded streams (an expired bucket forgets its root, so a dup
arriving later than the TTL after its root is missed — the standard
recall/state tradeoff of streaming dedupe, and the reason the batch
sweep still exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_minhash_dup_marks(stream: DataFrame, text: str = "text",
                                id_col: str = "doc_id", n: int = 3,
                                bands: int = 4,
                                ttl_ms: int | None = None) -> DataFrame:
    """Streaming DataFrame of duplicate marks: one row (doc_id, band)
    whenever a document loses its (band, band_key) bucket to a
    smaller-id root.  `distinct(doc_id)` over the drained sink is the
    duplicate set; survivors = docs minus marks.

    `ttl_ms` expires idle bucket state via a processing-time
    timeout (PySpark's GroupState takes integer milliseconds)."""
    import pandas as pd

    from benthos_spark.llm.dedup import (MINHASH_PERMS,
                                         _banded_signatures_arrow,
                                         shingle_hash_frame)

    r = len(MINHASH_PERMS) // bands
    hashed = shingle_hash_frame(stream, text, id_col, n)
    banded = _banded_signatures_arrow(hashed, id_col, bands, r)

    out_schema = f"`{id_col}` long, band int"

    def update(key, batches, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        root = state.get[0] if state.exists else None
        band = key[0]
        dup_ids: list[int] = []
        for pdf in batches:
            ids = pdf[id_col]
            if len(ids) == 0:
                continue
            mn = int(ids.min())
            if root is None:
                root = mn
            elif mn < root:
                dup_ids.append(root)  # dethroned root is now a dup
                root = mn
            dup_ids.extend(int(i) for i in ids if int(i) != root)
        state.update((root,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if dup_ids:  # most buckets are singletons — skip the pandas
            yield pd.DataFrame({id_col: dup_ids,
                                "band": [band] * len(dup_ids)})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (banded.groupBy("band", "band_key")
            .applyInPandasWithState(update, outputStructType=out_schema,
                                    stateStructType="root long",
                                    outputMode="append",
                                    timeoutConf=timeout))


def replay_minhash_dedupe(spark, path: str, text: str = "text",
                          id_col: str = "doc_id", n: int = 3,
                          bands: int = 4) -> DataFrame:
    """Drain `path` (parquet) through the streaming dedupe and return
    the distinct duplicate ids — the stream==batch gate surface (equal
    to the batch star-edge `id_b` set for a fully drained stream).
    Uses the streaming_replay machinery (AvailableNow, memory sink,
    pinned state partitioning)."""
    from benthos_spark.streaming.replay import replay_parquet

    # 16 state partitions, not the replay default 4: the stateful
    # operator fans out over ~bands×docs bucket KEYS, and per-group
    # Python overhead dominates — 4 workers chew tens of thousands of
    # groups serially (measured 10.1 s at sf0.1; 16 partitions
    # parallelize the group loop across cores)
    marks = replay_parquet(
        spark, path,
        lambda s: streaming_minhash_dup_marks(s, text=text,
                                              id_col=id_col, n=n,
                                              bands=bands),
        output_mode="append", shuffle_partitions=16)
    return (marks.select(F.col(id_col).alias("dup_doc_id"))
            .distinct())
