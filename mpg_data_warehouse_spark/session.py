"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` in one JVM; the same config block is
what we'd ship to a 1000-executor cluster (AQE, Arrow, adaptive skew
handling are cluster-relevant — shuffle-partition count is the only
knob that differs, and AQE coalescing makes even that forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mpg_data_warehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults honor the driver environment: ``SPARK_GRAFT_CPUS`` sets
    local parallelism, falling back to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Heap for the single local JVM (driver + all executor threads
        # in local mode). The 1g Spark default OOMs past sf~0.5 with 32
        # concurrent tasks; on a cluster this maps to executor memory
        # and is set by the deploy, not here. Only effective for the
        # session that launches the JVM — later getOrCreate calls
        # ignore it, which is the desired no-op.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # and dynamic broadcast conversion — essential at 100 TB where
        # static partition counts are always wrong for some stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-UDF path and createDataFrame/ toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamps across the DuckDB oracle boundary.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
