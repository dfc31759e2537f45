"""Bloblang: the reference's per-record mapping language, compiled to
Spark Column expressions.

Reference: internal/bloblang/ — parser (parser/mapping_parser.go,
query_parser.go), IR (query/function_ctor.go closures), executor
(mapping/executor.go).  The reference interprets a closure tree per
message; here the whole mapping compiles ONCE to a single DataFrame
projection, so Catalyst optimizes it and Tungsten code-generates it —
per-row cost is JVM expression evaluation, not interpretation.

Public API:
    parse_mapping(text)          -> Mapping AST
    compile_mapping(text)        -> MappingExec (callable on DataFrames)
    map_text(df, text, ...)      -> DataFrame   (one-shot convenience)
"""

from benthos_spark.bloblang.compiler import MappingExec, compile_mapping, map_text  # noqa: F401
from benthos_spark.bloblang.parser import parse_mapping, BloblangParseError  # noqa: F401
