"""branch / workflow: DAG of named enrichment branches.

Reference: lib/processor/branch.go:59 (request_map → child processors →
result_map merge-back) and lib/processor/workflow.go:20 with automatic
dependency inference + topological order
(workflow_branch_map.go:272-301) and cycle detection.

Here a branch is `(deps, transform)` where transform maps the running
DataFrame to itself with new columns merged in; the workflow runs a
driver-side topo sort (cheap — it orders plan construction, not
execution) and then hands Catalyst ONE fused DAG.
"""

from __future__ import annotations

from collections.abc import Callable
from graphlib import CycleError, TopologicalSorter

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


def topo_sort(deps: dict[str, list[str]]) -> list[str]:
    """Topological order of a name → upstream-names graph; raises
    ValueError on circular dependencies with the same wording intent as
    the reference (workflow_branch_map.go:296 'circular dependency')."""
    try:
        return list(TopologicalSorter(
            {name: set(d) for name, d in deps.items()}).static_order())
    except CycleError as e:
        raise ValueError(f"workflow: circular dependency (cycle): {e}") from e


def workflow(df: DataFrame,
             branches: dict[str, tuple[list[str], Transform]]) -> DataFrame:
    """Run named branches in dependency order.

    ``branches``: name → (list of upstream branch names, transform).
    Raises on cycles like the reference (workflow_branch_map.go:296).
    """
    for name in topo_sort({name: deps
                           for name, (deps, _) in branches.items()}):
        if name not in branches:
            raise KeyError(f"workflow branch '{name}' referenced but not defined")
        _, transform = branches[name]
        df = transform(df)
    return df


def branch_stage(df: DataFrame, request_map: str | None,
                 stages: list[Transform],
                 result_map: str | None) -> DataFrame:
    """`branch` (lib/processor/branch.go:59) in columnar form: the
    request_map derives the child columns, child processors transform
    them, the result_map assigns columns to merge back onto the
    ORIGINAL row.  The original columns ride along under reserved
    `__branch_` names, so the merge is a projection — no join, no row
    ids, one fused Catalyst plan.

    Child stages must be row-preserving (a child filter would drop the
    original rows too — same contract as process_field; the reference
    errors on count mismatch, branch.go:253).  Without a result_map
    the branch's outputs are discarded and the original rows pass
    through (side-effect branch)."""
    from pyspark.sql import functions as F

    from benthos_spark.bloblang import compile_mapping

    orig_cols = list(df.columns)
    saved = {c: f"__branch_{c}" for c in orig_cols}
    work = df.select(*[F.col(c).alias(s) for c, s in saved.items()],
                     *orig_cols)
    keep = tuple(saved.values())
    if request_map:
        work = compile_mapping(request_map).apply(work, keep=keep)
    for stage in stages:
        work = stage(work)
    if result_map:
        work = compile_mapping(result_map).apply(work, keep=keep)
        merged = [c for c in work.columns if not c.startswith("__branch_")]
    else:
        merged = []
    out = []
    for c in orig_cols:
        out.append(F.col(c) if c in merged else F.col(saved[c]).alias(c))
    out += [F.col(c) for c in merged if c not in orig_cols]
    return work.select(*out)
