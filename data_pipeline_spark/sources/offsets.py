"""Timestamp -> offset mapping (P3) and rotating sink (S9).

- `first_offsets_at_or_after`: re-expresses
  tools/timestamp_to_offset_mapper.py:31-263 — the reference binary-searches
  Kafka per partition for the first offset whose message timestamp >= start;
  relationally that is one aggregation: min(offset) per partition over
  ts >= bound.  (With a real Kafka source this is the built-in
  `startingOffsetsByTimestamp`; this is the engine-side equivalent for any
  offset-carrying stream table.)

- `write_rotated`: re-expresses tools/compressed_stream_rotator.py:27-107 —
  gzip files rotated per time window with a COMPLETE marker per closed
  window; Spark-first that is a partitionBy(window) gzip JSON write (one
  dir per window instead of one file, which is what a distributed writer
  should produce anyway) + marker files for windows strictly before the max
  seen window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_offsets_at_or_after(
    messages: DataFrame,
    start_epoch: int,
    ts_col: str = "publish_ts",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Per partition: the first offset with timestamp >= start (P3).

    One filtered aggregation; the parquet/Kafka scan prunes on the ts
    predicate.  Partitions with no qualifying message are absent (caller
    falls back to the high watermark, as the reference does).
    """
    return (
        messages.filter(F.col(ts_col) >= F.lit(start_epoch))
        .groupBy(partition_col)
        .agg(F.min(offset_col).alias("start_offset"))
    )


def write_rotated(
    df: DataFrame,
    out_dir: str,
    ts_col: str,
    window_seconds: int = 900,  # 15-min rotation, compressed_stream_rotator.py
    mark_complete: bool = True,
) -> list[str]:
    """Windowed gzip-JSON write with COMPLETE markers for closed windows.

    Returns the list of completed window directories.  Windows are
    epoch-aligned like the rotator's 15-minute boundaries; the newest window
    is considered still open and gets no marker.
    """
    win = (F.floor(F.unix_timestamp(F.col(ts_col)) / window_seconds) * window_seconds)
    windowed = df.withColumn("window_start", win.cast("bigint"))
    (
        windowed.write.mode("append")
        .partitionBy("window_start")
        .option("compression", "gzip")
        .json(out_dir)
    )
    completed = []
    if mark_complete:
        windows = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(out_dir)
            if d.startswith("window_start=")
        )
        for w in windows[:-1]:  # newest window stays open
            marker_dir = os.path.join(out_dir, f"window_start={w}")
            marker = os.path.join(marker_dir, "COMPLETE")
            if not os.path.exists(marker):
                open(marker, "w").close()
            completed.append(marker_dir)
    return completed
