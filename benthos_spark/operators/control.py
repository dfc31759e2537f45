"""Control-flow / misc processors: while, for_each, parallel, noop,
resource registry, subprocess, log, metric.

Reference: lib/processor/{while.go:27, for_each.go:19, parallel.go:21,
noop.go:15, resource.go:16, subprocess.go:28, log.go:22, metric.go:22}.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def noop(df: DataFrame) -> DataFrame:
    """`noop` (lib/processor/noop.go:15)."""
    return df


def for_each(df: DataFrame, *stages: Transform) -> DataFrame:
    """`for_each` (lib/processor/for_each.go:19): run children per
    single-part message.  Spark is already per-row, so this is stage
    composition (the reference's semantics collapse to identity
    wiring)."""
    for stage in stages:
        df = stage(df)
    return df


def parallel(df: DataFrame, *stages: Transform) -> DataFrame:
    """`parallel` (lib/processor/parallel.go:21): cap-bounded parallel
    processing of parts.  Partition parallelism subsumes it — stages
    compose; the executor pool is the `cap`."""
    return for_each(df, *stages)


def while_loop(df: DataFrame, check: Callable[[DataFrame], bool],
               body: Transform, max_loops: int = 100) -> DataFrame:
    """`while` (lib/processor/while.go:27): re-run the child pipeline
    while the check holds.  The check is evaluated on the driver
    (batch-level, like the reference's at_least_once=false mode); each
    iteration extends ONE logical plan, so Catalyst still fuses the
    final DAG.  Bounded by max_loops like the reference's max_loops
    field."""
    loops = 0
    while check(df):
        if loops >= max_loops:
            raise RuntimeError(f"while_loop exceeded max_loops={max_loops}")
        df = body(df)
        loops += 1
    return df


# ---------------------------------------------------------------- resource

_RESOURCES: dict[str, Transform] = {}


def register_resource(name: str, transform: Transform) -> None:
    """Named processor resources (lib/config/config.go:22-31 resources;
    lib/processor/resource.go:16)."""
    _RESOURCES[name] = transform


def resource(name: str) -> Transform:
    if name not in _RESOURCES:
        raise KeyError(f"unknown processor resource {name!r}")
    return _RESOURCES[name]


def apply_resource(df: DataFrame, name: str) -> DataFrame:
    return resource(name)(df)


# ---------------------------------------------------------------- subprocess

def subprocess_map(df: DataFrame, argv: list[str], input_col: str = "content",
                   output_col: str = "content") -> DataFrame:
    """`subprocess` (lib/processor/subprocess.go:28): pipe each part
    through an external binary (line-delimited stdin/stdout, like the
    reference's codec=lines).

    One long-lived process per partition via mapInPandas — the batch
    equivalent of the reference's single child process; rows stream
    through without driver involvement."""
    import pandas as pd

    fields = [f"{name} string" if name == output_col else None
              for name in df.columns]
    _ = fields
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" if f.name != output_col
        else f"`{output_col}` string"
        for f in df.schema.fields)
    if output_col not in df.columns:
        schema += f", `{output_col}` string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import subprocess as sp
        proc = sp.Popen(argv, stdin=sp.PIPE, stdout=sp.PIPE, text=True)
        try:
            for pdf in batches:
                outs = []
                for val in pdf[input_col]:
                    proc.stdin.write((val or "") + "\n")
                    proc.stdin.flush()
                    outs.append(proc.stdout.readline().rstrip("\n"))
                pdf = pdf.copy()
                pdf[output_col] = outs
                yield pdf
        finally:
            proc.stdin.close()
            proc.terminate()

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------- log/metric

def log_stage(df: DataFrame, message: str, level: str = "INFO",
              count: bool = False) -> DataFrame:
    """`log` (lib/processor/log.go:22): driver-side pipeline logging.
    With count=True the row count is logged (an action); otherwise the
    stage is free."""
    import logging
    logger = logging.getLogger("benthos_spark")
    if count:
        logger.log(getattr(logging, level.upper(), 20),
                   "%s (rows=%d)", message, df.count())
    else:
        logger.log(getattr(logging, level.upper(), 20), message)
    return df


def metric_observe(df: DataFrame, name: str, value: Column) -> DataFrame:
    """`metric` (lib/processor/metric.go:22): emit pipeline metrics.
    Uses DataFrame.observe — metrics arrive via QueryExecutionListener /
    StreamingQueryListener without a separate action (zero extra scan,
    unlike a .count())."""
    return df.observe(name, F.sum(value).alias(name))


def process_field(df: DataFrame, field: str, stages: list,
                  result_type: str = "string") -> DataFrame:
    """`process_field` (lib/processor/process_field.go:25): run child
    processors against ONE field's value, write the result back to that
    field.  Children see the field as the `content` column and must be
    row-preserving projections (a child filter would drop whole rows —
    the reference applies results positionally and errors on count
    mismatch too, process_field.go:176).

    result_type mirrors the reference's string/int/float/bool/object
    coercions (object = leave as-is)."""
    tmp = "__pf_saved_content"
    has_content = "content" in df.columns
    out = df
    if has_content:
        out = out.withColumnRenamed("content", tmp)
    out = out.withColumn("content", F.col(field).cast("string"))
    for stage in stages:
        out = stage(out)
    casts = {"string": "string", "int": "bigint", "float": "double",
             "bool": "boolean"}
    value = F.col("content")
    if result_type in casts:
        value = value.cast(casts[result_type])
    elif result_type != "object":
        raise ValueError(f"process_field result_type {result_type!r}: "
                         "use string|int|float|bool|object")
    out = out.withColumn(field, value).drop("content")
    if has_content:
        out = out.withColumnRenamed(tmp, "content")
    return out


_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
              "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_go_duration(s: str) -> float:
    """Go time.ParseDuration grammar → seconds (driver-side twin of
    the Bloblang parse_duration method)."""
    import re
    s = str(s).strip()
    neg = s.startswith("-")
    body = s.lstrip("+-")
    parts = re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)", body)
    if not parts or "".join(v + u for v, u in parts) != body:
        raise ValueError(f"invalid duration {s!r}")
    total = sum(float(v) * _DUR_UNITS[u] for v, u in parts)
    return -total if neg else total


def rate_limit_stage(df: "DataFrame", count: int,
                     interval: str) -> "DataFrame":
    """`rate_limit` processor + `local` resource (lib/processor/
    rate_limit.go:18, lib/ratelimit/local.go): block so at most
    `count` messages pass per `interval`.  Columnar analogue: each
    partition paces itself at count/interval — a per-EXECUTOR-slot
    cap, so cluster-wide throughput is parallelism × count/interval
    (documented; the reference's limiter is process-local too, and a
    multi-node benthos deployment multiplies the same way).  For
    ingest-side control prefer the source options
    (max_files_per_trigger / maxOffsetsPerTrigger)."""
    per_row = parse_go_duration(interval) / max(int(count), 1)

    def op(batches):
        import time
        for pdf in batches:
            if per_row > 0 and len(pdf):
                time.sleep(per_row * len(pdf))
            yield pdf

    return df.mapInPandas(op, schema=df.schema)


def sleep_stage(df: "DataFrame", duration: str) -> "DataFrame":
    """`sleep` processor (lib/processor/sleep.go:21): the reference
    sleeps `duration` per message to inject latency in tests and to
    crudely throttle.  Columnar analogue with the same throughput
    semantics: each Arrow batch sleeps duration × len(batch) before
    passing through — executor-side, partition-parallel, rows and
    schema untouched.  Test/backpressure tool only; for real rate
    control use the source-side rate_limit options."""
    secs = parse_go_duration(duration)

    def op(batches):
        import time
        for pdf in batches:
            if secs > 0 and len(pdf):
                time.sleep(secs * len(pdf))
            yield pdf

    return df.mapInPandas(op, schema=df.schema)
