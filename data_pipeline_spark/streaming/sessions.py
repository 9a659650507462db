"""Gap-based session windows through the native ``session_window`` operator,
with one implementation shared by batch and streaming.

The engine already carries a cumulative-sum sessionization
(queries.py ``sessionize_events``, the lag/cumsum formulation every SQL
engine can run); this module is the SPARK-NATIVE formulation: Structured
Streaming's ``F.session_window`` grows a per-key session until the key is
idle for the gap, and the same expression aggregates a batch frame — so
batch/streaming parity is a property of the operator, not of two
hand-kept implementations.

Semantics note (pinned in tests/test_sessions.py): a session covers
``[first_ts, last_ts + gap)`` and Spark merges ADJACENT windows, so an
event landing exactly at ``last_ts + gap`` still joins the session —
splits happen strictly on ``diff > gap``, identical to the lag/cumsum
formulation in ``sessionize_events``.  The two paths therefore agree
session-for-session on any input, which the parity test asserts.

Scale shape: one shuffle on the session key; streaming state is one row
per OPEN session per key (closed sessions are emitted and dropped once
the watermark passes), so state size tracks concurrent activity, not
history.  In append mode a session is emitted exactly once, when
``last_ts + gap`` falls behind the watermark — late events inside the
watermark re-open and merge sessions before emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str | None = None,
) -> DataFrame:
    """(key, n_events, session_start, session_end) per gap-based session.

    Works on batch frames as-is; pass ``watermark`` (e.g. "10 minutes")
    for a streaming frame — session windows require one in append mode.
    ``session_start``/``session_end`` are the first/last observed event
    epochs (not the window's ``last + gap`` close time), matching the
    cumsum formulation's output so the two stay comparable.
    """
    base = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        base.groupBy(
            F.col(key),
            F.session_window(
                F.col(ts_col), f"{gap_seconds} seconds"
            ).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("session_start"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("session_end"),
        )
        .select(key, "n_events", "session_start", "session_end")
    )
