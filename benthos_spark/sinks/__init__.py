"""Output layer (reference: lib/output/, 60 registered; SURVEY §2.4)."""

from benthos_spark.sinks.writers import (  # noqa: F401
    write_console, write_file, write_kafka, write_stream_file,
    write_stream_kafka,
)
from benthos_spark.sinks.broker import (  # noqa: F401
    fan_out, partition_routes, switch_output, with_dead_letter,
)
