"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every setting is chosen to survive a
multi-executor 100 TB deployment: AQE handles skew and post-shuffle
coalescing at any scale, Arrow keeps the Python boundary vectorized, and the
UTC session timezone makes event-time arithmetic deterministic across
clusters (the reference stores event time as epoch seconds —
data_pipeline/envelope.py envelope `timestamp`; we normalize to UTC
TimestampType at the boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are scale-oriented, not toy-oriented:

    - AQE on (+ skew join handling): at 100 TB the runtime re-plan is what
      keeps one hot key or a mis-estimated shuffle from sinking the job.
    - ``autoBroadcastJoinThreshold`` raised to 64 MiB: the registry/dimension
      tables (topics, schemas, nation, region, ...) should always broadcast.
    - Arrow execution for the few pandas-UDF boundaries (Avro codec,
      multimodal decode).
    - UTC session tz so epoch<->timestamp round-trips match the reference's
      epoch-seconds event time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet stores TIMESTAMP(NANOS); Spark's reader rejects it.
        # Read as long and convert (io.load_table) via exact integer division.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/dps_warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
