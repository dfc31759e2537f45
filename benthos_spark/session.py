"""SparkSession factory tuned for the engine.

Local test mode runs ``local[N]`` (one JVM); production is any cluster
master — the configs below are chosen to survive both.  The reference
engine scales by "run more Benthos instances against a partitioned
source" (SURVEY §3.1); here Spark's scheduler + shuffle replace that.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # ~cores for local; on a real cluster this is overridden by AQE's
    # coalescing anyway (initialPartitionNum can be raised per-job).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MiB input splits: good balance of task count vs overhead at
    # 100 TB (≈800k tasks) and still parallel enough at sf0.1.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    # testdata events.parquet stores TIMESTAMP(NANOS); Spark reads those
    # as long when this is on (converted back in sources/datamodel)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "benthos_spark", master: str | None = None,
              **extra_conf: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    is configured; on a cluster, leave it unset and spark-submit decides.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
        if master.startswith("local"):
            builder = builder.config("spark.driver.memory",
                                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    for k, v in {**_DEFAULTS, **extra_conf}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
