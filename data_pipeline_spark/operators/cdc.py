"""CDC apply: materialize a stream of create/update/delete messages into a
table snapshot.

The reference ships CDC messages (message.py subclasses) but leaves applying
them to consumers; the Spark-first engine completes the story: given a
message stream with keys, op types and an ordering column, produce the
current snapshot — the `MERGE INTO` / log-compaction materialization
(SURVEY §1.4: "CDC apply = MERGE INTO (Delta) or foreachBatch upsert").

One shuffle on the key (latest-per-key window), then a filter on deletes.
Deterministic under any parallelism given a total per-key order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.operators.joins import latest_per_key

DELETE_TYPES = ("delete",)


def apply_cdc(
    messages: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    op_col: str = "message_type",
    delete_types: Sequence[str] = DELETE_TYPES,
) -> DataFrame:
    """Latest message per key decides existence and value: delete => absent,
    anything else => that row (minus the op metadata)."""
    latest = latest_per_key(messages, keys, order_by)
    return latest.filter(~F.col(op_col).isin(*delete_types)).drop(op_col)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    op_col: str = "message_type",
    delete_types: Sequence[str] = DELETE_TYPES,
) -> DataFrame:
    """MERGE a change batch into an existing snapshot (foreachBatch upsert):
    rows of ``base`` not touched by ``changes`` survive; touched keys take
    the latest change (or disappear on delete).  Batch-mode equivalent of a
    Delta MERGE — works on plain parquet snapshots."""
    key_cols = list(keys)
    changed_keys = changes.select(*key_cols).distinct()
    untouched = base.join(changed_keys, on=key_cols, how="left_anti")
    applied = apply_cdc(changes, keys, order_by, op_col, delete_types)
    return untouched.unionByName(applied.select(*base.columns))
