"""Custom keyed state: applyInPandasWithState operators.

Reference state surfaces: `count("name")` named counters
(internal/bloblang/query/functions.go:200), cache-backed dedupe with
TTL (lib/processor/dedupe.go:26 + lib/cache/memory.go).  Built-in
aggregations cover most of this (streaming/windows.py); these
operators exist for state machines the built-ins can't express —
running counters emitted PER ROW, custom eviction, session payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counter(df: DataFrame, key: str,
                    out_schema: str | None = None) -> DataFrame:
    """Streaming `count("name")` parity: per-key cumulative counts,
    one output row per input row with the count AT that row.

    State per key is a single long — bounded by key cardinality, not
    stream length.  Emission order within a micro-batch follows input
    order (the reference's arrival order, which micro-batching makes
    deterministic per batch)."""
    import pandas as pd

    schema = out_schema or f"{key} string, n long"

    def update(key_tuple, batches, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in batches:
            count_col = []
            for _ in range(len(pdf)):
                n += 1
                count_col.append(n)
            yield pd.DataFrame({key: [key_tuple[0]] * len(pdf),
                                "n": count_col})
        state.update((n,))

    return (df.groupBy(key)
            .applyInPandasWithState(update, outputStructType=schema,
                                    stateStructType="n long",
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def first_wins_dedupe_state(df: DataFrame, key: str,
                            payload_cols: list[str]) -> DataFrame:
    """Streaming first-wins dedupe WITHOUT a watermark bound — the
    literal semantics of the reference's cache dedupe when the cache
    never expires.  State per key is one boolean; unbounded key sets
    should prefer dedupe_within_watermark (bounded state) — this
    operator is for finite key domains (ids, hashes of a day's data).
    """
    import pandas as pd

    schema = ", ".join([f"{key} string"] +
                       [f"{c} string" for c in payload_cols])

    def update(key_tuple, batches, state: GroupState):
        seen = state.exists
        out = []
        for pdf in batches:
            if not seen and len(pdf) > 0:
                first = pdf.iloc[[0]]
                out.append(pd.DataFrame({
                    key: [str(key_tuple[0])],
                    **{c: [str(first[c].iloc[0])] for c in payload_cols}}))
                seen = True
        state.update((True,))
        for o in out:
            yield o

    return (df.groupBy(key)
            .applyInPandasWithState(update, outputStructType=schema,
                                    stateStructType="seen boolean",
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
