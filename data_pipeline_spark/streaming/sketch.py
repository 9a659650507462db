"""Streaming sketch accumulation: Count-Min over an unbounded stream.

Count-Min is LINEAR (the sketch of a union is the elementwise sum of the
sketches), so the streaming form needs no stateful operator at all: each
micro-batch's partial sketch — at most depth * width rows, independent of
batch size — lands in its own ``batch_id=N`` partition directory with
mode("overwrite"), which makes trigger replay IDEMPOTENT (a re-run batch
rewrites the same partition with the same deterministic content; the
foreachBatch + idempotent-partition pattern, same family as
streaming/dynamic.ExactlyOnceBatchSink's ledger).  Reading the sketch is
one column-pruned scan + groupBy sum over slot space.

Parity is EXACT by linearity, not approximate: the accumulated streaming
sketch equals the batch sketch of all data byte-for-byte — pinned by the
batch/streaming parity test (tests/test_streaming.py), the strongest
parity contract in the monitor-family pattern.

Reference semantics: the reference pipeline's monitors keep running
counters per topic (data_pipeline/tools/introspector.py); the CM sketch is
the bounded-memory generalization for per-ITEM counts at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.llmops.sketches import count_min_sketch


class CountMinStreamSink:
    """foreachBatch sink accumulating a Count-Min sketch of a column.

    Usage::

        sink = CountMinStreamSink(dir, "item", width=2048, depth=5)
        stream.writeStream.foreachBatch(sink).start()
        ...
        sink.sketch(spark)   # (d, slot, cnt) — the accumulated sketch
    """

    def __init__(
        self, out_dir: str, item_col: str, width: int = 2048, depth: int = 5
    ) -> None:
        self.out_dir = out_dir
        self.item_col = item_col
        self.width = width
        self.depth = depth

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        partial = count_min_sketch(
            batch_df, self.item_col, self.width, self.depth
        )
        # one deterministic partition per trigger: replays overwrite the
        # same directory with identical content instead of double-counting
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option(
                "partitionOverwriteMode", "dynamic"
            )  # only THIS batch's partition is replaced
            .parquet(self.out_dir)
        )

    def sketch(self, spark: SparkSession) -> DataFrame:
        """The accumulated sketch: sum the per-batch partials over slot
        space (CM linearity makes this exactly the all-data sketch)."""
        if not os.path.isdir(self.out_dir):
            raise FileNotFoundError(self.out_dir)
        return (
            spark.read.parquet(self.out_dir)
            .groupBy("d", "slot")
            .agg(F.sum("cnt").alias("cnt"))
        )
