"""Streaming LOCF gap-fill: the stateful-stream form of the hypertable
``gapfill_interpolate`` batch operator (operators/aggregates.py).

Batch/streaming parity contract
-------------------------------
The batch operator fills gaps two ways — last-observation-carried-forward
and linear interpolation.  Only LOCF streams: a gap bucket's LOCF value
depends solely on the PAST (the last present bucket), so it can be
emitted the moment a later event proves the bucket elapsed — the same
close-and-flush discipline as ``monitor.counts_with_gap_flush``.  Linear
interpolation is pinned BATCH-ONLY: a gap's interpolated value needs the
NEXT present bucket, i.e. unbounded lookahead — under append-mode
streaming semantics every gap row would have to be withheld until an
arbitrarily-later event arrives (an unbounded watermark), or re-emitted
as a correction, both of which break the append contract.  The parity
test (tests/test_streaming.py) pins the LOCF columns of the two
formulations equal over the closed bucket range.

Semantics (mirroring the batch operator bit-for-bit where both apply):
- values ride as ROUND(value * 100) scaled longs, summed in int64, and
  divide once by 100.0 on emit — present-bucket sums are exact and
  reproducible by any engine;
- a bucket exists in the output from each key's first event onward, so
  every emitted gap is BETWEEN present buckets (no leading/trailing
  extrapolation — matches the batch spine's [min, max] span);
- events that arrive after their bucket was closed fold into the
  currently-open bucket (the monitor family's documented late policy);
- the currently-open bucket emits on a processing-time idle timeout
  (idle streams flush their tail) or stays open awaiting more events.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_spark.operators.aggregates import scaled_long

# (current bucket start, events in it, scaled sum in it)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("sv", T.LongType()),
    ]
)


def locf_gapfill_stream(
    stream: DataFrame,
    ts_col: str,
    key: str,
    value_col: str,
    bucket_seconds: int = 900,
    idle_timeout_ms: int | None = 60_000,
) -> DataFrame:
    """(key, bucket_start, n_events, is_gap, sum_value_locf) — one row per
    elapsed bucket per key, gaps included with the last present bucket's
    sum carried forward.  See module docstring for the parity contract
    with the batch ``gapfill_interpolate``."""
    key_type = dict(
        zip(stream.schema.names, [f.dataType for f in stream.schema])
    )[key]
    out_schema = T.StructType(
        [
            T.StructField(key, key_type),
            T.StructField("bucket_start", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("is_gap", T.BooleanType()),
            T.StructField("sum_value_locf", T.DoubleType()),
        ]
    )

    def flush(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key_tuple

        def row(bucket, cnt, sv_for_locf, gap):
            return {
                key: key_val,
                "bucket_start": bucket,
                "n_events": 0 if gap else cnt,
                "is_gap": gap,
                "sum_value_locf": sv_for_locf / 100.0,
            }

        if state.hasTimedOut:
            cur, cnt, sv = state.get
            state.remove()
            yield pd.DataFrame([row(cur, cnt, sv, False)])
            return

        cur, cnt, sv = state.get if state.exists else (None, 0, 0)
        events = sorted(
            (int(ts), int(v))
            for pdf in pdfs
            for ts, v in zip(pdf["__epoch"], pdf["__sv"])
        )
        out: list[dict] = []
        for ts, v in events:
            win = ts // bucket_seconds * bucket_seconds
            if cur is None:
                cur = win
            if win > cur:
                out.append(row(cur, cnt, sv, False))  # close present bucket
                locf = sv
                for g in range(cur + bucket_seconds, win, bucket_seconds):
                    out.append(row(g, 0, locf, True))
                cur, cnt, sv = win, 0, 0
            # late events (win < cur) fold into the open bucket, like the
            # monitor family
            cnt += 1
            sv += v
        state.update((cur, cnt, sv))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(out)

    prepared = stream.select(
        F.col(key),
        F.unix_timestamp(F.col(ts_col)).alias("__epoch"),
        scaled_long(value_col).alias("__sv"),
    )
    return prepared.groupBy(key).applyInPandasWithState(
        flush,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
