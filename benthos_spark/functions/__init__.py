"""Bloblang function & method library as Spark Column builders.

Reference: internal/bloblang/query/{functions.go,methods.go,
methods_strings.go,methods_numbers.go,methods_structured.go}.  Each
Bloblang function/method becomes a function returning a Column, so a
whole mapping compiles to ONE projection that Catalyst optimizes and
Tungsten code-generates — the opposite of the reference's interpreted
closure tree (query/function_ctor.go).
"""

from benthos_spark.functions.scalars import *  # noqa: F401,F403
from benthos_spark.functions.strings import *  # noqa: F401,F403
from benthos_spark.functions.structured import *  # noqa: F401,F403
from benthos_spark.functions.timestamps import *  # noqa: F401,F403
