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


class HllStreamSink:
    """foreachBatch sink accumulating per-key HLL distinct-count sketches.

    The max-merge analogue of ``CountMinStreamSink``: HLL registers merge
    by elementwise MAX, so the union of per-trigger partial sketches IS
    the sketch of all data — streaming parity is exact by algebra, like
    CM's sum-linearity.  Union is additionally IDEMPOTENT (max(x, x) = x),
    so a replayed trigger could not corrupt the estimate even without the
    partition-overwrite pattern; it is kept anyway so the store stays
    byte-deterministic.

    Per trigger the partial is one DataSketches HLL binary per key
    (Spark's native ``hll_sketch_agg``), written to a ``batch_id=N``
    partition with dynamic overwrite; ``estimates`` folds the store with
    ``hll_union_agg`` — state per key is the 2^lg_k register array, never
    the item stream.
    """

    def __init__(
        self,
        out_dir: str,
        key_cols: list[str],
        item_col: str,
        lg_k: int = 14,
    ) -> None:
        self.out_dir = out_dir
        self.key_cols = list(key_cols)
        self.item_col = item_col
        self.lg_k = lg_k

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(*self.key_cols).agg(
            F.hll_sketch_agg(self.item_col, F.lit(self.lg_k)).alias("sk")
        )
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out_dir)
        )

    def sketches(self, spark: SparkSession) -> DataFrame:
        """(keys..., sk) — the per-key union of all trigger partials."""
        if not os.path.isdir(self.out_dir):
            raise FileNotFoundError(self.out_dir)
        return (
            spark.read.parquet(self.out_dir)
            .groupBy(*self.key_cols)
            .agg(F.hll_union_agg("sk", F.lit(False)).alias("sk"))
        )

    def estimates(self, spark: SparkSession) -> DataFrame:
        """(keys..., distinct_estimate) from the accumulated store."""
        return self.sketches(spark).select(
            *self.key_cols,
            F.round(F.hll_sketch_estimate("sk"))
            .cast("bigint")
            .alias("distinct_estimate"),
        )


class MisraGriesStreamSink:
    """foreachBatch sink accumulating a Misra-Gries heavy-hitter summary.

    Completes the streaming sketch family (CM: sum-linear, HLL:
    max-merge): MG is a MERGEABLE SUMMARY (Agarwal et al., PODS 2012) —
    per trigger the sink condenses the batch to a capacity-k summary
    (<= k rows regardless of batch size) into its own ``batch_id=N``
    partition with dynamic overwrite (trigger replay rewrites the same
    partition with identical deterministic content); ``summary`` folds
    the store with the same reduction the batch sketch uses for its
    per-partition partials, so the n/(k+1) guarantee holds over the
    FULL stream n under any trigger slicing.  Unlike CM/HLL the fold is
    not byte-identical to the one-shot batch sketch in general (the
    merge tree differs), but in the k >= |distinct| limit no counter is
    ever pruned anywhere in either tree and both equal the exact
    GROUP BY — the exact-parity configuration the test pins.
    """

    def __init__(self, out_dir: str, item_col: str, k: int = 50) -> None:
        self.out_dir = out_dir
        self.item_col = item_col
        self.k = k

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from data_pipeline_spark.llmops.sketches import (
            misra_gries_heavy_hitters,
        )

        partial = misra_gries_heavy_hitters(batch_df, self.item_col, self.k)
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out_dir)
        )

    def summary(self, spark: SparkSession) -> DataFrame:
        """(item, weight): the accumulated heavy-hitter summary — weights
        are lower bounds within n/(k+1) of true stream-wide counts."""
        from data_pipeline_spark.llmops.sketches import mg_merge

        if not os.path.isdir(self.out_dir):
            raise FileNotFoundError(self.out_dir)
        return mg_merge(spark.read.parquet(self.out_dir), self.k)
