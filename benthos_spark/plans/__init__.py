"""Pipeline assembly and the error-column protocol.

Reference: lib/stream/type.go:141-182 (input→buffer→pipeline→output
assembly), lib/processor/{try,catch,branch,workflow}.go.
"""

from benthos_spark.plans.pipeline import Pipeline  # noqa: F401
from benthos_spark.plans.errors import catch_stage, try_stages  # noqa: F401
from benthos_spark.plans.workflow import branch_stage, workflow  # noqa: F401
