"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

At 100 TB the expensive part of a fact-fact join is shuffling both sides on
the key.  Writing both tables bucketed by the join key (`bucketBy` +
`saveAsTable`) stores them pre-hash-partitioned; a later join on that key
reads bucket i of each side into the same task — NO Exchange in the plan.
This is the reference's "one topic partition per key" co-location guarantee
(_kafka_producer.py:46-54 key-partitioning) generalized to any keyed table.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist bucketed (and optionally sorted) by the join key."""
    spark = df.sparkSession
    # an orphaned location (catalog was in-memory, dir survived a previous
    # session) blocks managed-table creation — drop both
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
