"""Sorts / limits / top-k / ordered batching (SURVEY.md §2.6).

Reference behaviors: ordered pk-range batches for the refresh scan
(copy_table_to_blackhole_table.py:237-257), the priority refresh queue
(helpers/priority_refresh_queue.py:29-116), newest-topic top-1
(tools/tailer.py:347-351), message-limit early stop (tailer.py:454-458).

Scale note: `orderBy(...).limit(n)` compiles to TakeOrderedAndProject —
each partition keeps its local top-n and only n rows per partition reach the
driver-side merge, so global top-k never materializes a full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global deterministic top-k (TakeOrderedAndProject, no full sort)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int,
    rank_alias: str | None = None,
) -> DataFrame:
    """Top-k rows per key — the priority-queue peek generalized
    (priority_refresh_queue.py:88-116: top job per source by
    (priority desc, created_at asc))."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_alias:
        return out.withColumnRenamed("__rn", rank_alias)
    return out.drop("__rn")


def ordered_range_batches(
    df: DataFrame, pk: str, batch_size: int, batch_alias: str = "batch_id"
) -> DataFrame:
    """Assign contiguous pk-ordered batch ids — the refresh runner's
    ``WHERE pk > min AND pk <= max ORDER BY pk`` batching
    (copy_table_to_blackhole_table.py:237-257,462-481) expressed as a
    value-based partitioning (deterministic, no global row_number): for dense
    integer pks, batch = floor(pk / batch_size).  Value-based ranges (not
    ntile) are what a 1000-executor JDBC read can push down as predicates."""
    return df.withColumn(
        batch_alias, F.floor(F.col(pk) / F.lit(batch_size)).cast("bigint")
    )
