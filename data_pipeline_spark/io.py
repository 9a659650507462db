"""Table loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).

These are plain parquet scans — Catalyst gets predicate pushdown and column
pruning for free, which is the point: every operator downstream declares its
projection/filters and the scan narrows itself (`PushedFilters`/`ReadSchema`
in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough that joins against them should always broadcast.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); Spark only reads it with
        # the legacy nanos-as-long flag. The flag is runtime-settable, and
        # callers (the driver harness included) arrive with vanilla sessions,
        # so set it here rather than relying on our own session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), read as long (nanosAsLong). Convert
        # to microsecond TimestampType with exact integer division (a double
        # division would lose precision above 2^53 ns). Truncation matches
        # DuckDB's ns->us Python conversion.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
