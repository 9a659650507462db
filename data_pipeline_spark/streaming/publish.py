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
    """foreachBatch adapter around Producer.publish with replay skipping.

    Exactly-once across EVERY crash window via a two-phase ledger — the
    reference's watermark-verified retry (_producer_retry.py:120-190)
    re-expressed:

    1. append an INTENT row (epoch, pre-publish high watermarks);
    2. publish the batch (one atomic Spark job commit);
    3. append a COMMIT row.

    A replay of an epoch with an intent but no commit consults the topic's
    CURRENT watermarks: advanced past the intent's snapshot means the
    publish landed before the crash — record the commit and skip;
    unchanged means it never landed — publish normally.  The old
    single-row ledger had a duplicate window (crash after publish, before
    the ledger append).  Rows without a ``phase`` column (pre-r6 ledgers)
    are treated as commits.
    """

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

    _LEDGER_SCHEMA = "epoch_id LONG, phase STRING, pre_highs STRING"

    def _append_ledger(
        self, spark: SparkSession, epoch_id: int, phase: str, pre_highs: str | None
    ) -> None:
        spark.createDataFrame(
            [(epoch_id, phase, pre_highs)], self._LEDGER_SCHEMA
        ).write.mode("append").parquet(self.ledger_path)

    def _seed(self, spark: SparkSession) -> None:
        """One ledger read per process start: last committed epoch + any
        dangling intent (at most one — epochs are sequential)."""
        if self._last_epoch is not None:
            return
        self._pending: tuple[int, dict[int, int]] | None = None
        if not os.path.exists(self.ledger_path):
            self._last_epoch = -1
            return
        import json as _json

        rows = spark.read.parquet(self.ledger_path).collect()
        # pre-r6 ledgers have no phase column: treat those rows as commits
        commits = [
            r.epoch_id
            for r in rows
            if getattr(r, "phase", None) in (None, "commit")
        ]
        self._last_epoch = max(commits, default=-1)
        intents = [
            r
            for r in rows
            if getattr(r, "phase", None) == "intent"
            and r.epoch_id > self._last_epoch
        ]
        if intents:
            top = max(intents, key=lambda r: r.epoch_id)
            self._pending = (
                top.epoch_id,
                {int(k): v for k, v in _json.loads(top.pre_highs).items()},
            )

    def _last_committed(self, spark: SparkSession) -> int:
        self._seed(spark)
        return self._last_epoch

    def publish_batch(self, batch: DataFrame, epoch_id: int) -> bool:
        import json as _json

        spark = batch.sparkSession
        if epoch_id <= self._last_committed(spark):
            return False  # replayed micro-batch: already appended
        store = self.producer.store
        topic = self.producer.registry.get_schema_by_id(self.schema_id).topic
        if self._pending is not None and self._pending[0] == epoch_id:
            # replay of a crashed epoch: watermark verification
            # (_producer_retry.py:120-190).  The data append is one atomic
            # job commit, so the watermarks either all advanced (published,
            # record the commit and skip) or none did (publish normally).
            pre = self._pending[1]
            cur = store.high_watermarks(topic, self.num_partitions)
            self._pending = None
            if any(cur.get(p, 0) > h for p, h in pre.items()) or any(
                p not in pre and h > 0 for p, h in cur.items()
            ):
                self._append_ledger(spark, epoch_id, "commit", None)
                self._last_epoch = epoch_id
                return False
        else:
            pre = store.high_watermarks(topic, self.num_partitions)
            self._append_ledger(spark, epoch_id, "intent", _json.dumps(pre))
        self.producer.publish(
            batch,
            self.schema_id,
            message_type=self.message_type,
            num_partitions=self.num_partitions,
            order_by=self.order_by,
            encrypt_key=self.encrypt_key,
        )
        self._append_ledger(spark, epoch_id, "commit", None)
        self._pending = None
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
