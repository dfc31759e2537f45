"""Bloblang structured (array/object) methods.

Reference: internal/bloblang/query/methods_structured.go (27 methods,
1544 LoC).  All map to Spark's higher-order array/map functions —
JVM-side, no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "arr_all", "arr_any", "append", "contains", "enumerated", "explode_fn",
    "filter_arr", "flatten", "fold", "index", "keys", "values",
    "key_values", "size", "map_each", "map_each_key", "merge_maps",
    "sort_arr", "slice_arr", "sum_arr", "unique", "without",
]


def arr_all(arr: Column, pred: Callable[[Column], Column]) -> Column:
    """`.all(f)` (methods_structured.go:19)."""
    return F.forall(arr, pred)


def arr_any(arr: Column, pred: Callable[[Column], Column]) -> Column:
    """`.any(f)` (methods_structured.go:68)."""
    return F.exists(arr, pred)


def append(arr: Column, *values: Column) -> Column:
    """`.append(v…)` (methods_structured.go:122)."""
    return F.concat(arr, F.array(*values))


def contains(arr: Column, value: Column) -> Column:
    """`.contains(v)` on arrays (methods_structured.go:190)."""
    return F.array_contains(arr, value)


def enumerated(arr: Column) -> Column:
    """`.enumerated()` (methods_structured.go:248) →
    array<struct<index,value>>."""
    return F.transform(arr, lambda x, i: F.struct(i.alias("index"),
                                                 x.alias("value")))


def explode_fn(df, arr: Column, alias: str):
    """`.explode("path")` / json `explode` op (methods_structured.go:310,
    lib/processor/json.go): array → rows."""
    return df.select("*", F.explode(arr).alias(alias))


def filter_arr(arr: Column, pred: Callable[[Column], Column]) -> Column:
    """`.filter(f)` (methods_structured.go:366)."""
    return F.filter(arr, pred)


def flatten(arr: Column) -> Column:
    """`.flatten()` (methods_structured.go:434)."""
    return F.flatten(arr)


def fold(arr: Column, init: Column,
         fn: Callable[[Column, Column], Column]) -> Column:
    """`.fold(init, f)` (methods_structured.go:470)."""
    return F.aggregate(arr, init, fn)


def index(arr: Column, i: int) -> Column:
    """`.index(i)` (methods_structured.go:536) — negative wraps from the
    end in both engines (element_at supports negative)."""
    return F.element_at(arr, i + 1 if i >= 0 else i)


def keys(m: Column) -> Column:
    """`.keys()` (methods_structured.go:647)."""
    return F.map_keys(m)


def values(m: Column) -> Column:
    """`.values()` (methods_structured.go:1454)."""
    return F.map_values(m)


def key_values(m: Column) -> Column:
    """`.key_values()` (methods_structured.go:678)."""
    return F.map_entries(m)


def size(c: Column) -> Column:
    """`.length()` on arrays/objects (methods_structured.go:712)."""
    return F.size(c)


def map_each(arr: Column, fn: Callable[[Column], Column]) -> Column:
    """`.map_each(f)` (methods_structured.go:756)."""
    return F.transform(arr, fn)


def map_each_key(m: Column, fn: Callable[[Column], Column]) -> Column:
    """`.map_each_key(f)` (methods_structured.go:841)."""
    return F.transform_keys(m, lambda k, _: fn(k))


def merge_maps(a: Column, b: Column) -> Column:
    """`.merge(obj)` (methods_structured.go:897) — right side wins on
    collision, like gabs merge."""
    return F.map_concat(
        F.map_filter(a, lambda k, _: ~F.array_contains(F.map_keys(b), k)), b)


def sort_arr(arr: Column, asc: bool = True) -> Column:
    """`.sort()` (methods_structured.go:1009)."""
    return F.sort_array(arr, asc=asc)


def slice_arr(arr: Column, lo: int, hi: int) -> Column:
    """`.slice(lo,hi)` (methods_structured.go:1197)."""
    return F.slice(arr, lo + 1, hi - lo)


def sum_arr(arr: Column) -> Column:
    """`.sum()` (methods_structured.go:1303)."""
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast("double"))


def unique(arr: Column) -> Column:
    """`.unique()` (methods_structured.go:1349)."""
    return F.array_distinct(arr)


def without(struct_col: Column, *fields: str) -> Column:
    """`.without(paths…)` (methods_structured.go:1484)."""
    return struct_col.dropFields(*fields)
