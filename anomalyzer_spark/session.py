"""SparkSession factory with engine defaults.

Local testing runs ``local[N]``; the same settings are what we'd ship on a
real cluster (AQE on for runtime re-planning + skew-join handling, Arrow on
for the pandas kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "anomalyzer-spark", shuffle_partitions: int | None = None):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
