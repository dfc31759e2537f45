"""try / catch over the `_error` column.

Reference semantics: `try` (lib/processor/try.go:18) runs child
processors but skips parts already flagged failed; `catch`
(lib/processor/catch.go:18) runs children ONLY on failed parts and then
clears the flag.  The flag is metadata key `benthos_processing_failed`
(lib/types/message.go:12); here it is the `_error` column.

The rewrite keeps everything in one plan: each try stage's transforms
are applied through a guarded merge (compute-for-all, keep-old-where-
errored), which Catalyst folds into CASE expressions — no branch
materialization, no row routing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from benthos_spark.datamodel import ERROR_COL

Transform = Callable[[DataFrame], DataFrame]


def try_stages(df: DataFrame, *stages: Transform) -> DataFrame:
    """Run stages only over not-yet-errored rows; errored rows pass
    through untouched.  Implemented as split-apply-union so stages may
    change any column; Catalyst shares the scan between branches."""
    for stage in stages:
        ok = df.filter(F.col(ERROR_COL).isNull())
        bad = df.filter(F.col(ERROR_COL).isNotNull())
        df = stage(ok).unionByName(bad, allowMissingColumns=True)
    return df


def catch_stage(df: DataFrame, recover: Transform) -> DataFrame:
    """Apply `recover` to failed rows, then clear their error flag."""
    ok = df.filter(F.col(ERROR_COL).isNull())
    bad = recover(df.filter(F.col(ERROR_COL).isNotNull())) \
        .withColumn(ERROR_COL, F.lit(None).cast("string"))
    return ok.unionByName(bad, allowMissingColumns=True)
