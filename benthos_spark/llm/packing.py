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


def pack_sequences_ffd(df: DataFrame, text: str = "text",
                       id_col: str = "doc_id", ctx_len: int = 2048,
                       n_shards: int = 8, salt: str = "") -> DataFrame:
    """(doc_id, shard, bin_id, bin_fill, truncated): best-fit-decreasing
    BIN PACKING — no document is split across contexts (the finetuning
    packer, vs pack_sequences' concat-and-split pretraining packer);
    padding waste is whatever BFD leaves, ~<10% at realistic length
    mixes.

    Scale shape: one shuffle onto id-hash shards, then each shard packs
    independently inside one applyInPandas task (bins never span
    shards, so growing the cluster = raising n_shards).  Within a
    shard the order is (token count desc, id) — fully deterministic,
    so bin membership is reproducible across runs and engines.  Docs
    longer than ctx_len get their own bin with truncated=true (the
    loader clips them).  Best-fit runs on a sorted remaining-capacity
    list (bisect): O(n log n) per shard, no Python in the token count
    (computed JVM-side before the shuffle).
    """
    import pandas as pd

    h = hash48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    t = (df.select(F.col(id_col),
                   token_count(F.col(text)).alias("__ntok"))
         .withColumn("shard", F.pmod(h, F.lit(n_shards))))

    def pack_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import bisect
        if len(pdf) == 0:
            return pd.DataFrame({id_col: [], "shard": [], "bin_id": [],
                                 "bin_fill": [], "truncated": []})
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["__ntok", id_col],
                              ascending=[False, True])
        # parallel sorted lists: remaining capacity (asc) + bin index
        caps: list[int] = []
        cap_bins: list[int] = []
        fills: list[int] = []
        assign: dict[int, list] = {id_col: [], "bin": []}
        for doc, ntok in zip(pdf[id_col], pdf["__ntok"]):
            ntok = int(ntok)
            if ntok >= ctx_len:
                b = len(fills)
                fills.append(min(ntok, ctx_len))
                assign[id_col].append(doc)
                assign["bin"].append(b)
                continue
            i = bisect.bisect_left(caps, ntok)
            if i == len(caps):  # nothing fits: open a bin
                b = len(fills)
                fills.append(ntok)
                rem = ctx_len - ntok
            else:  # tightest bin that fits (best fit)
                b = cap_bins.pop(i)
                caps.pop(i)
                fills[b] += ntok
                rem = ctx_len - fills[b]
            j = bisect.bisect_left(caps, rem)
            caps.insert(j, rem)
            cap_bins.insert(j, b)
            assign[id_col].append(doc)
            assign["bin"].append(b)
        out = pd.DataFrame(assign)
        ntoks = dict(zip(pdf[id_col], pdf["__ntok"]))
        out["shard"] = shard
        out["bin_id"] = shard * _PACKS_PER_SHARD + out["bin"]
        out["bin_fill"] = out["bin"].map(lambda b: fills[b])
        out["truncated"] = out[id_col].map(
            lambda d: bool(ntoks[d] > ctx_len))
        return out[[id_col, "shard", "bin_id", "bin_fill", "truncated"]]

    # carry the id column's actual type through (string doc ids etc.)
    id_type = df.schema[id_col].dataType.simpleString()
    return (t.repartition(n_shards, F.col("shard"))
            .groupBy("shard")
            .applyInPandas(pack_shard,
                           f"`{id_col}` {id_type}, shard long, "
                           "bin_id long, bin_fill long, "
                           "truncated boolean"))
