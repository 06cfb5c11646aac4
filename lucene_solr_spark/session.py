"""SparkSession construction with engine-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cpus: int | None = None, app: str = "lucene_solr_spark", shuffle_partitions: int | None = None):
    """local[cpus] session tuned for the engine.

    On a real cluster the same configs apply (minus master): AQE for runtime
    re-planning and skew joins, Arrow for the vectorized UDF path.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or cpus
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Arrow streams make humongous G1 allocations; larger regions cut the
        # GCLocker stalls observed under 16+ concurrent Python workers
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
