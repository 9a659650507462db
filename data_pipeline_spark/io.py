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
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events, normalising `ts` to session-tz TimestampType.

    The physical encoding of `ts` has varied across testdata generations:
    parquet TIMESTAMP(NANOS) (readable only as long via the legacy
    nanosAsLong flag) and plain timestamp[us] (read as TIMESTAMP_NTZ).
    A loader hard-coded to one encoding breaks the moment the data is
    regenerated, so branch on the dtype Spark actually loaded.
    """
    from pyspark.sql import functions as F

    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) files fail schema conversion without the legacy
        # flag. The flag is runtime-settable, additive (it only changes
        # behavior for NANOS fields, which otherwise error), and must stay
        # set for the lifetime of the lazy scan — so it is intentionally
        # not restored after the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)

    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type in ("bigint", "long"):
        # nanos-as-long: exact integer division to micros (double division
        # would lose precision above 2^53 ns); truncation matches DuckDB.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type.startswith("timestamp_ntz"):
        # timestamp[us] reads as TIMESTAMP_NTZ; downstream code (and the
        # reference semantics) want epoch-convertible TimestampType, with
        # the stored wall time read as a UTC instant. Shift the NTZ wall
        # time from UTC into the caller's session tz before the cast (which
        # interprets NTZ in session tz), so the instant is identical for
        # ANY session timezone — no session-conf mutation as a load side
        # effect.
        df = df.withColumn(
            "ts",
            F.expr(
                "cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"
            ),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
