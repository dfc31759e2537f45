"""benthos_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Benthos (v3) stream processor.

This is NOT a port of the reference's goroutine/channel execution engine
(reference: github.com/Jeffail/benthos lib/stream/type.go:141-182).  The
engine compiles Benthos's declarative surface — Bloblang mappings,
processors, inputs, outputs, batch/window policies — into Spark DataFrame
plans so Catalyst/Tungsten pick the physical execution strategy.

Layout
------
``session``     SparkSession builder tuned for the engine.
``datamodel``   The message-shaped DataFrame convention
                (content / meta / _error columns).
``functions``   Bloblang function & method library as Column builders
                (reference: internal/bloblang/query/functions.go,
                methods*.go).
``operators``   Processor equivalents as DataFrame→DataFrame transforms
                (reference: lib/processor/).
``sources``     Input equivalents (reference: lib/input/).
``sinks``       Output equivalents (reference: lib/output/).
``plans``       Pipeline assembly, branch/workflow DAG inference, the
                error-column protocol (reference: lib/stream/type.go,
                lib/processor/workflow.go).
``streaming``   Structured Streaming layer: batch policy → windows,
                watermark dedupe, stateful counters (reference:
                lib/message/batch/policy.go,
                website/docs/configuration/windowed_processing.md).
``llm``         Beyond-reference large-scale training-data ops:
                dedup (exact/minhash/simhash/jaccard/cosine), ANN
                similarity search, text analysis, multimodal columns.
"""

from benthos_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
