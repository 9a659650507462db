"""Dedup-gated streaming ingest: every micro-batch of documents is admitted
against the PERSISTED corpus (exact md5 + shingle-Jaccard near-dup via
``llmops.dedup.incremental_dedup_gate``), and only the keepers append —
the streaming form of the crawl-ingest admission check, so the corpus
stays deduplicated AS it grows instead of requiring periodic full-corpus
re-pairing.

Exactly-once: an epoch ledger (the ExactlyOnceBatchSink pattern) skips
replayed micro-batches, and the corpus append itself is one atomic job
commit per admitted batch.  The ledger is scoped to ONE streaming
checkpoint — epoch ids restart at 0 in a new query, so each stream gets
its own ledger_path beside its checkpoint dir (the corpus_dir is the
shared, growing artifact).  Cross-batch duplicates are rejected because
each batch gates against everything previously admitted (including
earlier batches of the same stream); duplicates WITHIN a batch are
collapsed first by keeper-id exact dedup so a batch cannot admit two
copies of a new document.

Scale shape is inherited from the gate: the micro-batch's hash set and
shingle map broadcast; the corpus is scanned map-side once per trigger and
never shuffles.  At 100 TB the corpus scan per trigger is the cost to
bound — production would maintain a bloom/minhash INDEX sidecar the same
way the topic store maintains watermark sidecars; the gate's seam
(corpus DataFrame in, flags out) is where that index drops in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.llmops.dedup import exact_dup_groups, incremental_dedup_gate


class DedupGatedIngest:
    """foreachBatch sink: gate each batch against the persisted corpus and
    append only novel documents."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        ledger_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        threshold: float = 0.8,
    ):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.ledger_path = ledger_path
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self._last_epoch: int | None = None

    def _last_committed(self) -> int:
        if self._last_epoch is None:
            if os.path.exists(self.ledger_path):
                top = (
                    self.spark.read.parquet(self.ledger_path)
                    .agg(F.max("epoch_id"))
                    .first()[0]
                )
                self._last_epoch = -1 if top is None else top
            else:
                self._last_epoch = -1
        return self._last_epoch

    def _corpus(self) -> DataFrame | None:
        if not os.path.isdir(self.corpus_dir):
            return None
        return self.spark.read.parquet(self.corpus_dir)

    def admit_batch(self, batch: DataFrame, epoch_id: int) -> int:
        """Gate + append one micro-batch; returns admitted row count
        (0 for replays and fully-duplicate batches)."""
        if epoch_id <= self._last_committed():
            return 0
        # collapse WITHIN-batch exact copies first (keeper = min id), so a
        # batch can never admit two copies of the same new document
        keepers = exact_dup_groups(batch, self.id_col, self.text_col).select(
            F.col("keeper_id").alias(self.id_col)
        )
        batch = batch.join(keepers, self.id_col)
        corpus = self._corpus()
        if corpus is not None:
            flags = incremental_dedup_gate(
                corpus,
                batch,
                self.id_col,
                self.text_col,
                n=self.n,
                threshold=self.threshold,
            )
            admitted = batch.join(
                flags.filter(F.col("keep") == 1).select(self.id_col),
                self.id_col,
            )
        else:
            admitted = batch
        admitted = admitted.persist()
        try:
            n_admitted = admitted.count()
            if n_admitted:
                admitted.write.mode("append").parquet(self.corpus_dir)
            # ledger append AFTER the data: a crash between them replays
            # the epoch, and the gate itself makes the replay idempotent
            # (everything already admitted is now a corpus duplicate)
            self.spark.createDataFrame(
                [(epoch_id, n_admitted)], "epoch_id LONG, n_admitted LONG"
            ).write.mode("append").parquet(self.ledger_path)
            self._last_epoch = epoch_id
            return n_admitted
        finally:
            admitted.unpersist()

    def foreach_batch(self):
        def fn(batch: DataFrame, epoch_id: int) -> None:
            self.admit_batch(batch, epoch_id)

        return fn

    def start(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.foreach_batch())
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
