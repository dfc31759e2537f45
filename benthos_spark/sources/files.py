"""File-family inputs.

Reference: lib/input/{file,csv,files}.go with the codec stack
(internal/codec/reader.go:206-246: all-bytes, lines, csv, csv-gzip, tar,
gzip, multipart, auto).  Spark's format+compression options subsume the
codec list; object stores (aws_s3, gcp_cloud_storage, azure_blob,
hdfs — lib/input/aws_s3.go:31 et al.) are the same call with a
different URI scheme once the FS connector jars are present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               **options) -> DataFrame:
    """Typed columnar read — predicate pushdown + column pruning apply."""
    return spark.read.format(fmt).options(**options).load(path)


def read_file_lines(spark: SparkSession, path: str) -> DataFrame:
    """`file` input with `lines` codec (lib/input/file.go:25): one part
    per line, with source-path metadata like the reference's `path`
    metadata field."""
    df = spark.read.text(path).withColumn("__path", F.input_file_name())
    return df.select(
        F.lit(0).cast("long").alias("batch_id"),
        F.lit(0).cast("int").alias("part_index"),
        F.col("value").alias("content"),
        F.create_map(F.lit("path"), F.col("__path")).alias("meta"),
        F.lit(None).cast("string").alias("_error"),
    )


def read_csv(spark: SparkSession, path: str, header: bool = True,
             delimiter: str = ",", schema=None) -> DataFrame:
    """`csv` input (lib/input/csv.go:25, fields csv.go:77-80):
    parse_header_row → header option, custom delimiter supported.
    Schema should be declared in production (inference = extra pass)."""
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)
