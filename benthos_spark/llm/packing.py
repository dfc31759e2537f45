"""Sequence packing — assigning documents to fixed-length training
contexts (the concat-and-split packing every pretraining data loader
performs: concatenate documents in a fixed order, cut every ctx_len
tokens).

The order must be a DETERMINISTIC shuffle: id-hash order mixes
neighboring ids apart, is reproducible across engines/reruns, and
needs no global sort.  Sharding first (id-hash mod n_shards) bounds
every window to one shard, so at 100 TB the cumulative sums run
n_shards-way parallel with one shuffle on the shard key — there is no
global ordering bottleneck, and growing the cluster just means raising
n_shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from benthos_spark.llm.dedup import hash48
from benthos_spark.llm.text import token_count

_PACKS_PER_SHARD = 2 ** 40  # pack_id = shard * 2^40 + local pack


def pack_sequences(df: DataFrame, text: str = "text",
                   id_col: str = "doc_id", ctx_len: int = 2048,
                   n_shards: int = 8, salt: str = "") -> DataFrame:
    """(doc_id, shard, pack_id, pack_offset): which training context
    each document starts in, and at which token offset.

    Documents longer than ctx_len spill into subsequent packs exactly
    as the concatenated token stream dictates; the row records the
    pack/offset of the document's first token (the loader slices the
    rest).  Changing `salt` re-deals the entire packing — a fresh
    epoch order is a salt bump, not a reshuffle job.
    """
    h = hash48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    t = (df.select(F.col(id_col),
                   token_count(F.col(text)).alias("__ntok"))
         .withColumn("__h", h)
         .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards))))
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__h"), F.col(id_col)))  # id tiebreak: total order
    cum_excl = F.sum("__ntok").over(w) - F.col("__ntok")
    # pack index as PURE integer arithmetic (no double floor): cum_excl
    # is non-negative, so (ce - ce%ctx) / ctx == ce // ctx exactly
    pack_local = ((cum_excl - F.pmod(cum_excl, F.lit(ctx_len)))
                  / F.lit(ctx_len)).cast("long")
    return t.select(
        F.col(id_col),
        F.col("shard"),
        (F.col("shard") * F.lit(_PACKS_PER_SHARD)
         + pack_local).alias("pack_id"),
        F.pmod(cum_excl, F.lit(ctx_len)).cast("long").alias("pack_offset"))
