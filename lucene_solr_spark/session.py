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
        # 4096, NOT the 10k default / 65536 we first shipped: the analysis
        # UDF's per-batch working set scales with rows × tokens, and once the
        # per-batch allocations cross the glibc mmap threshold every batch
        # becomes mmap/munmap + page-fault churn.  With 32 concurrent workers
        # the munmap TLB shootdowns serialize the whole host in sys time —
        # measured 8.4k turns/s at 65536 vs 208k turns/s at 4096 on the same
        # 4M-turn build (local[32]).  Batches of 4096 rows × ~60 tokens still
        # vectorize fully; the cliff, not vectorization width, dominates.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # real tracebacks when a Python worker dies (segfault/OOM) instead of
        # an opaque "worker exited unexpectedly"
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Arrow streams make humongous G1 allocations; larger regions cut the
        # GCLocker stalls observed under 16+ concurrent Python workers
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        # off by default (driver/test runs); SPARK_GRAFT_UI=1 enables the
        # status REST API for the stage-metrics bench scripts
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "0") == "1" and "true" or "false")
        .getOrCreate()
    )


def spread_partitions(df, min_factor: int = 1):
    """Widen a DataFrame to at least the session's default parallelism before
    a CPU-heavy Arrow UDF.

    Small benchmark corpora arrive as one parquet file = one scan partition,
    which serializes a mapInPandas across a 32-core host; at production scale
    the input already has >= cores partitions and this is a no-op (it never
    shrinks, so no coalesce-style parallelism loss and no extra shuffle on a
    well-partitioned 100 TB table)."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
