"""Pipeline: an ordered chain of DataFrame transforms.

The reference executes processors message-at-a-time through channel-fed
worker pools (lib/pipeline/processor.go:58-105, pool.go:34-54).  Here a
pipeline is just function composition over DataFrames — the chain builds
ONE logical plan and Catalyst fuses it (whole-stage codegen), so there
is no per-stage materialization or thread pool to manage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


class Pipeline:
    """Composable processor chain; `threads` from the reference config is
    intentionally absent — partition parallelism replaces it."""

    def __init__(self, *stages: Transform):
        self.stages: list[Transform] = list(stages)

    def then(self, stage: Transform) -> "Pipeline":
        return Pipeline(*self.stages, stage)

    def __call__(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage(df)
        return df
