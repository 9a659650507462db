"""Stream-stream interval joins (T-family extension).

The reference never joins two live streams — its lookup joins hit the
static registry (SURVEY §2.5).  A training-data pipeline does need
stream⋈stream (impressions⋈clicks, doc⋈annotation): Structured Streaming
supports it when BOTH sides carry watermarks and the join condition bounds
event-time distance, which lets the state store evict rows once the other
side can no longer match them.

State-size shape at scale: each side buffers only rows younger than
(watermark + interval width) per key partition — bounded regardless of
stream length.  Without the time bound Spark would have to keep both
streams forever; this wrapper makes the bound mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys, right event within
    [left_ts, left_ts + max_delay].

    Both sides get ``watermark`` so the state store can evict; the
    interval condition is what makes the state bounded.  ``max_delay`` and
    ``watermark`` are SQL interval strings (e.g. "1 hour").
    """
    keys = [on] if isinstance(on, str) else list(on)
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated key columns from the right side
    return joined.drop(*[rw[k] for k in keys])
