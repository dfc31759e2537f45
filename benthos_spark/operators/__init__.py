"""Processor equivalents (reference: lib/processor/, 63 registered).

Every operator is a pure ``DataFrame -> DataFrame`` transform (or a
factory returning one), so they compose into a single logical plan that
Catalyst optimizes end-to-end — there is no per-operator materialization
the way the reference executes processors one-by-one per message
(lib/pipeline/processor.go:58-105).
"""

from benthos_spark.operators.filters import (  # noqa: F401
    bounds_check, dedupe, filter_op, hash_sample, sample,
)
from benthos_spark.operators.routing import (  # noqa: F401
    group_by_value, insert_part, select_parts, split_batches, switch_case,
)
from benthos_spark.operators.batch import (  # noqa: F401
    archive_join, merge_json, unarchive_explode,
)
from benthos_spark.operators.joins import (  # noqa: F401
    cache_lookup_join, sharded_join,
)
