"""Structured Streaming layer (reference: SURVEY §2.5).

Benthos v3's only windowing story is processing-time batch policies
(lib/message/batch/policy.go:53-60;
website/docs/configuration/windowed_processing.md).  This engine keeps
that surface (batch policy → tumbling windows) and adds the documented
superset: event-time windows + watermarks + session windows.
"""

from benthos_spark.streaming.replay import (replay_parquet,  # noqa: F401
                                            replay_parquet_many)
from benthos_spark.streaming.windows import (  # noqa: F401
    batch_policy_window, dedupe_within_watermark, session_agg,
    sliding_window_agg, stateful_counter, tumbling_window_agg,
)
