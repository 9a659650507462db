"""Streaming deduplication with bounded state (D2/D4 streaming side).

The reference's consumers deduplicate replayed messages by (topic,
partition, offset) / message id on an unbounded ledger; the Spark-native
equivalent for unbounded streams is `dropDuplicatesWithinWatermark`:
duplicate keys arriving within the watermark horizon are dropped and —
critically for an always-on 100 TB/day stream — key state older than the
watermark is EVICTED.  Plain `dropDuplicates` on a stream keeps every key
forever (state grows with stream lifetime, the same class of bug as the
pre-r5 full-ledger collect in streaming/publish.py).

Exactly-once replay windows are bounded in practice (a Kafka replay
re-delivers recent offsets, not last month's), so a horizon sized to the
maximum replay/out-of-order window gives the same observable result with
O(horizon) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate ``keys`` arriving within ``watermark`` of each other.

    State per key is evicted once the event-time watermark passes it; a
    duplicate arriving later than the horizon is NOT deduplicated (choose
    the horizon >= the transport's maximum replay window).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
