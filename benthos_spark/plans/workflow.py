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
