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
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


def workflow(df: DataFrame,
             branches: dict[str, tuple[list[str], Transform]]) -> DataFrame:
    """Run named branches in dependency order.

    ``branches``: name → (list of upstream branch names, transform).
    Raises on cycles like the reference (workflow_branch_map.go:296).
    """
    ts = TopologicalSorter({name: set(deps)
                            for name, (deps, _) in branches.items()})
    for name in ts.static_order():  # raises CycleError on circularity
        if name not in branches:
            raise KeyError(f"workflow branch '{name}' referenced but not defined")
        _, transform = branches[name]
        df = transform(df)
    return df
