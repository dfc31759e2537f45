"""Input equivalents (reference: lib/input/, 48 registered).

Connector-backed inputs (kafka, kinesis, s3, ...) are thin wrappers over
Spark's own sources; inputs whose client libraries are absent in this
environment are gated behind import-try and documented.
"""

from benthos_spark.sources.files import read_csv, read_file_lines, read_table  # noqa: F401
from benthos_spark.sources.generate import generate  # noqa: F401
