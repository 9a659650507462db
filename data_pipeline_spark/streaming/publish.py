"""Streaming publish (S1 streaming side): an unbounded DataFrame of typed
rows published to a topic per micro-batch.

`writeStream.foreachBatch` is the Spark-idiomatic producer buffer: each
trigger's batch is one flush (the reference flushes every 5000 msgs / 0.1 s,
config.py:350-367 — here the trigger interval IS the flush policy).  The
per-batch ledger gives exactly-once topic appends across restarts
(producer-side analogue of ExactlyOnceBatchSink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.producer import Producer


class StreamingPublisher:
    """foreachBatch adapter around Producer.publish with replay skipping."""

    def __init__(
        self,
        producer: Producer,
        schema_id: int,
        ledger_path: str,
        message_type: str = "create",
        num_partitions: int = 4,
        order_by: str | None = None,
        encrypt_key: tuple[int, bytes] | None = None,
    ):
        self.producer = producer
        self.schema_id = schema_id
        self.ledger_path = ledger_path
        self.message_type = message_type
        self.num_partitions = num_partitions
        self.order_by = order_by
        # (key_id, key): AES-CBC encrypt payloads on the wire (E4) —
        # passed straight through to Producer.publish per micro-batch
        self.encrypt_key = encrypt_key
        # max committed epoch, lazily seeded from the ledger.  Structured
        # Streaming epoch ids are strictly increasing per checkpoint and a
        # replay re-delivers the LAST epoch, so one high watermark is a
        # complete replay filter — collecting the full ledger every batch
        # (the pre-r5 shape) was O(stream lifetime) driver work per trigger.
        self._last_epoch: int | None = None

    def _last_committed(self, spark: SparkSession) -> int:
        if self._last_epoch is None:
            if os.path.exists(self.ledger_path):
                top = (
                    spark.read.parquet(self.ledger_path)
                    .agg(F.max("epoch_id"))
                    .first()[0]
                )
                self._last_epoch = -1 if top is None else top
            else:
                self._last_epoch = -1
        return self._last_epoch

    def publish_batch(self, batch: DataFrame, epoch_id: int) -> bool:
        spark = batch.sparkSession
        if epoch_id <= self._last_committed(spark):
            return False  # replayed micro-batch: already appended
        self.producer.publish(
            batch,
            self.schema_id,
            message_type=self.message_type,
            num_partitions=self.num_partitions,
            order_by=self.order_by,
            encrypt_key=self.encrypt_key,
        )
        spark.createDataFrame([(epoch_id,)], "epoch_id LONG").write.mode(
            "append"
        ).parquet(self.ledger_path)
        self._last_epoch = epoch_id
        return True

    def foreach_batch(self):
        def fn(batch: DataFrame, epoch_id: int) -> None:
            self.publish_batch(batch, epoch_id)

        return fn

    def start(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        """Attach to a streaming DataFrame; returns the StreamingQuery."""
        return (
            stream.writeStream.foreachBatch(self.foreach_batch())
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
