"""Bloblang general functions + numeric methods.

Reference: internal/bloblang/query/functions.go (24 active),
methods.go, methods_numbers.go.
"""

from __future__ import annotations

import os
import socket
import uuid as _uuid

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "batch_index", "batch_size", "content", "coalesce_or", "catch",
    "env", "hostname", "range_fn", "random_int", "uuid_v4",
    "now", "timestamp_unix", "timestamp_unix_nano",
    "num_abs", "num_ceil", "num_floor", "num_round", "num_log",
    "num_log10", "arr_max", "arr_min", "to_number", "to_bool",
    "to_string", "to_bytes",
]


def batch_index(batch_col: str = "batch_id",
                order_col: str = "part_index") -> Column:
    """`batch_index()` (functions.go:153): 0-based index within batch."""
    w = Window.partitionBy(batch_col).orderBy(order_col)
    return F.row_number().over(w) - 1


def batch_size(batch_col: str = "batch_id") -> Column:
    """`batch_size()` (functions.go:168)."""
    return F.count("*").over(Window.partitionBy(batch_col))


def content(col: str = "content") -> Column:
    """`content()` (functions.go:183)."""
    return F.col(col)


def coalesce_or(col: Column, fallback: Column) -> Column:
    """`.or(fb)` method + `|` coalesce pipe (methods.go:459)."""
    return F.coalesce(col, fallback)


def catch(col: Column, fallback: Column) -> Column:
    """`.catch(fb)` (methods.go:120).  Bloblang catches evaluation
    errors; compiled Columns surface errors as NULL through `try_*`
    variants, so catch = coalesce over the try-result."""
    return F.coalesce(col, fallback)


def env(name: str) -> Column:
    """`env("VAR")` (functions.go:265) — resolved at plan time on the
    driver, like the reference resolves at parse time."""
    return F.lit(os.environ.get(name))


def hostname() -> Column:
    """`hostname()` (functions.go:377)."""
    return F.lit(socket.gethostname())


def range_fn(start: Column | int, stop: Column | int,
             step: Column | int = 1) -> Column:
    """`range(start, stop, step)` (functions.go:339) — half-open in the
    reference, while F.sequence is inclusive: trim the endpoint."""
    start_c = F.lit(start) if isinstance(start, int) else start
    stop_c = F.lit(stop) if isinstance(stop, int) else stop
    step_c = F.lit(step) if isinstance(step, int) else step
    return F.filter(
        F.sequence(start_c, stop_c, step_c),
        lambda x: (x < stop_c) if not isinstance(step, int) or step > 0
        else (x > stop_c))


def random_int(seed: int, max_value: int = 2 ** 31 - 1) -> Column:
    """`random_int(seed)` (functions.go:581).  Documented deviation: the
    reference draws from one seeded PRNG stream in arrival order; a
    distributed engine has no arrival order, so this is a per-row
    deterministic draw derived from F.rand(seed)."""
    return (F.rand(seed) * max_value).cast("long")


def uuid_v4() -> Column:
    """`uuid_v4()` (functions.go:729)."""
    return F.expr("uuid()")


def now() -> Column:
    """`now()` (functions.go:611)."""
    return F.current_timestamp()


def timestamp_unix() -> Column:
    """`timestamp_unix()` (functions.go:672)."""
    return F.unix_timestamp(F.current_timestamp())


def timestamp_unix_nano() -> Column:
    """`timestamp_unix_nano()` (functions.go:685)."""
    return (F.unix_micros(F.current_timestamp()) * 1000)


# ---- numeric methods (methods_numbers.go) ----

def num_abs(c: Column) -> Column:
    """`.abs()` (methods_numbers.go:12)."""
    return F.abs(c)


def num_ceil(c: Column) -> Column:
    """`.ceil()` (methods_numbers.go:40)."""
    return F.ceil(c)


def num_floor(c: Column) -> Column:
    """`.floor()` (methods_numbers.go:67)."""
    return F.floor(c)


def num_round(c: Column, scale: int = 0) -> Column:
    """`.round()` (methods_numbers.go:240)."""
    return F.round(c, scale)


def num_log(c: Column) -> Column:
    """`.log()` (methods_numbers.go:93)."""
    return F.log(c)


def num_log10(c: Column) -> Column:
    """`.log10()` (methods_numbers.go:121)."""
    return F.log10(c)


def arr_max(c: Column) -> Column:
    """`.max()` on arrays (methods_numbers.go:150)."""
    return F.array_max(c)


def arr_min(c: Column) -> Column:
    """`.min()` on arrays (methods_numbers.go:195)."""
    return F.array_min(c)


# ---- type coercion methods (methods.go:417, 79; methods_strings.go) ----

def to_number(c: Column) -> Column:
    """`.number()` — error-tolerant via try_cast, matching the catchable
    error the reference raises on bad input."""
    return c.try_cast("double")


def to_bool(c: Column) -> Column:
    """`.bool()`."""
    return c.try_cast("boolean")


def to_string(c: Column) -> Column:
    """`.string()`."""
    return c.cast("string")


def to_bytes(c: Column) -> Column:
    """`.bytes()`."""
    return c.cast("binary")
