"""Per-record scalar transforms (SURVEY.md §2.2-2.3).

All JVM-side column expressions — no Python in the row path.  Reference
behaviors re-expressed: ISO-time display transform (tools/tailer.py:417-432),
PII redaction for display (message.py:557-585), CDC payload diff
(message.py:793-798), JSON row serialization (tailer.py:438-450), namespace
name codec (_namespace_util.py:22-173).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def iso_time(col: str | Column) -> Column:
    """Epoch/timestamp -> ISO-8601 display string (tailer.py:417-432 walks
    dicts converting ``time*`` int fields; columnar version is one
    date_format)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")


def redact(col: str | Column, type_name: str = "string") -> Column:
    """PII display redaction: replace the value with its type name in angle
    brackets (message.py:570-585 renders pii payloads as type placeholders)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), None).otherwise(F.lit(f"<{type_name}>"))


def row_json(cols: Sequence[str]) -> Column:
    """Canonical JSON of selected fields (tailer.py:438-450 uses simplejson
    with sort_keys; ``to_json(struct(...))`` with sorted column order)."""
    return F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))


def change_flags(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """CDC update-diff semantics over an ordered stream: for each key, attach
    the previous value of each tracked column and a has_changed flag —
    UpdateMessage.payload_diff / has_changed (message.py:789-798) expressed
    with window ``lag`` instead of a carried pre-image."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    out = df
    changed = F.lit(False)
    for c in value_cols:
        prev = F.lag(F.col(c)).over(w)
        out = out.withColumn(f"{c}_prev", prev)
        # null-safe inequality: a change to/from NULL counts (message.py:47-50)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    return out.withColumn("has_changed", changed)


def parse_namespace(col: str | Column) -> Column:
    """Split ``environment.cluster.database[.suffixes...]`` namespace names
    (_namespace_util.py:22-173) into a struct; pure column ops."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return F.struct(
        parts.getItem(0).alias("environment"),
        parts.getItem(1).alias("cluster"),
        parts.getItem(2).alias("database"),
        F.slice(parts, 4, 100).alias("suffixes"),
    )
