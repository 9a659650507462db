"""Kafka source/sink option wiring — the deploy-time swap for TopicStore.

This sandbox has no Kafka broker or spark-sql-kafka jar, so the engine's
transport is the file-backed ``TopicStore``.  The seam to a real cluster is
exactly these option dicts: ``spark.readStream.format("kafka")`` /
``df.write.format("kafka")`` with the options below reproduce the
reference's consumer/producer configuration surface:

- consumer: subscribe list + per-partition starting offsets (explicit map,
  committed ledger, or reset position), consumer.py:162-247 /
  base_consumer.py:499-657;
- producer: acks=-1, 0.1 s flush cadence, 5000-message buffers,
  idempotent exactly-once publish, _kafka_producer.py:100-260 +
  config.py:322-367.

The option-building logic (offset-map JSON in the Kafka source's format,
ledger resolution, reset semantics) is real and unit-tested; only the final
``.format("kafka").load()`` needs a broker, and ``read_stream``/``writer``
gate on that with a clear error.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

# Kafka source sentinel offsets (the Spark Kafka source's JSON contract)
OFFSET_EARLIEST = -2
OFFSET_LATEST = -1


def reader_options(
    topics: list[str],
    bootstrap_servers: str,
    starting_offsets: dict[str, dict[int, int]] | None = None,
    reset: str = "earliest",
    max_offsets_per_trigger: int | None = 5000,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")``.

    ``starting_offsets`` maps topic -> partition -> NEXT offset to read
    (the ledger convention: committed max + 1).  Partitions absent from the
    map get the ``reset`` position — the Kafka semantics the r5 consume-path
    fix pinned for TopicStore, reproduced here as the -2/-1 sentinels.
    ``max_offsets_per_trigger`` is the producer buffer size's consumer-side
    analogue (5000 messages per micro-batch, config.py:350-357).
    """
    if reset not in ("earliest", "latest"):
        raise ValueError(f"unknown reset position {reset!r}")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "failOnDataLoss": "true",
    }
    if starting_offsets is None:
        opts["startingOffsets"] = reset
    else:
        # Spark's JSON contract ({"topic": {"0": 23, "1": -2}}) requires
        # every partition of every subscribed topic; partitions the ledger
        # has no commit for get the -2/-1 reset sentinel.  At deploy time
        # the caller enumerates partitions via the admin client and passes
        # them in starting_offsets with None values; here the TopicStore
        # world always knows its partitions.
        sentinel = OFFSET_EARLIEST if reset == "earliest" else OFFSET_LATEST
        per_topic = {
            t: {
                str(p): (sentinel if o is None else o)
                for p, o in sorted(starting_offsets.get(t, {}).items())
            }
            for t in topics
        }
        opts["startingOffsets"] = json.dumps(per_topic, sort_keys=True)
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def reader_options_from_ledger(
    ledger,
    group: str,
    topics: list[str],
    bootstrap_servers: str,
    reset: str = "earliest",
) -> dict[str, str]:
    """Resolve committed positions from an OffsetLedger (S3) into Kafka
    source options — the `from_committed=True` consume path on a cluster."""
    committed = {t: ledger.committed(group, t) for t in topics}
    return reader_options(
        topics,
        bootstrap_servers,
        starting_offsets={t: off for t, off in committed.items() if off},
        reset=reset,
    )


def writer_options(
    topic: str,
    bootstrap_servers: str,
    exactly_once: bool = True,
    flush_ms: int = 100,
    buffer_messages: int = 5000,
) -> dict[str, str]:
    """Options for ``df.write.format("kafka")`` matching the reference
    producer: acks=-1 (config.py:322-329), 0.1 s flush / 5000-message
    buffers (config.py:350-367) as linger/batch bounds.

    ``exactly_once`` enables broker-level idempotence, which dedups
    BROKER-RETRY duplicates within one producer session only.  Spark's
    batch / foreachBatch Kafka sink remains at-least-once end to end —
    Spark task retries and micro-batch replays still duplicate records —
    so the full T5 exactly-once guarantee additionally requires the
    ledger-verified replay pattern of ``StreamingPublisher`` (or Kafka
    transactions, which the Spark sink does not expose)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.acks": "all",  # acks=-1
        "kafka.linger.ms": str(flush_ms),
        "kafka.batch.size": str(buffer_messages * 64),  # ~64B/record floor
    }
    if exactly_once:
        opts["kafka.enable.idempotence"] = "true"
    return opts


def _kafka_jar_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(
    spark: SparkSession, options: dict[str, str]
) -> DataFrame:
    """``readStream.format("kafka")`` with the given options.  Raises a
    named error when the Kafka connector jar is absent (this sandbox) so
    callers fall back to TopicStore explicitly rather than at task time."""
    if not _kafka_jar_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; deploy with "
            "--packages org.apache.spark:spark-sql-kafka-0-10 or use the "
            "file-backed TopicStore transport"
        )
    return spark.readStream.format("kafka").options(**options).load()


def smoke_topic(base: str, topic: str | None = None) -> str:
    """Broker topic for one smoke run: uuid-suffixed unless the caller
    names a topic it exclusively owns.  A fresh SchemaRegistry derives
    the same ``base`` every run, and a REUSED broker topic still holds
    the previous run's messages — whose envelope uuids/timestamps differ
    — so an earliest..latest parity read over it fails spuriously on a
    healthy deployment (ADVICE r11)."""
    import uuid as _uuid

    return topic or f"{base}-smoke-{_uuid.uuid4().hex[:12]}"


def smoke_roundtrip(
    spark: SparkSession,
    bootstrap_servers: str,
    n: int = 200,
    topic: str | None = None,
) -> dict:
    """First run on a REAL cluster, scripted (r10 verdict stretch #8):
    publish one envelope batch through the real Kafka connector and
    assert byte parity with the file-backed TopicStore transport.

    The wire frame is prepared ONCE (envelope uuids/timestamps are
    generated at prepare time, so preparing twice would differ), then
    shipped through BOTH transports; the smoke passes when the Kafka
    round trip returns exactly the TopicStore round trip's (key, value)
    byte multiset and the consumer decodes the batch back to the source
    rows.  Returns {"rows", "bytes_parity", "decode_parity"}.

    Re-runnable against a PERSISTENT broker (ADVICE r11): the broker
    topic defaults to a uuid-suffixed name, so the earliest..latest read
    can never pick up a previous smoke run's messages (whose envelope
    uuids/timestamps differ) and fail bytes_parity spuriously on a
    healthy deployment.  Pass ``topic`` explicitly only for a topic this
    run exclusively owns.

    Requires the spark-sql-kafka jar and a reachable broker — the two
    things this sandbox lacks; ``read_stream``'s jar gate raises the
    same named error here.
    """
    import tempfile

    from pyspark.sql import functions as F

    if not _kafka_jar_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; deploy with "
            "--packages org.apache.spark:spark-sql-kafka-0-10"
        )
    from data_pipeline_spark.consumer import Consumer
    from data_pipeline_spark.producer import Producer
    from data_pipeline_spark.registry import SchemaRegistry

    from .file_topic import TopicStore

    schema = json.dumps(
        {
            "type": "record",
            "name": "smoke_event",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "value", "type": "double"},
            ],
        }
    )
    registry = SchemaRegistry()
    rs = registry.register_schema(
        "smoke.db", "smoke_events", schema, primary_keys=("event_id",)
    )
    topic = smoke_topic(rs.topic, topic)
    rows = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 0.5).alias("value"),
    )
    store = TopicStore(spark, tempfile.mkdtemp(prefix="dps_kafka_smoke_"))
    Producer(store, registry).publish(
        rows, rs.schema_id, num_partitions=2, order_by="event_id"
    )
    wire = store.read(rs.topic).select("key", "value")
    file_bytes = sorted(
        (bytes(r.key or b""), bytes(r.value)) for r in wire.collect()
    )

    to_wire_frame(wire).write.format("kafka").options(
        **writer_options(topic, bootstrap_servers)
    ).save()
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .select("key", "value")
    )
    kafka_bytes = sorted(
        (bytes(r.key or b""), bytes(r.value)) for r in back.collect()
    )
    decoded = Consumer(store, registry).messages(rs.topic)
    got = sorted(
        (r["event_id"], r["value"])
        for r in decoded.select("payload.event_id", "payload.value").collect()
    )
    want = sorted((r.event_id, r.value) for r in rows.collect())
    return {
        "rows": n,
        "bytes_parity": kafka_bytes == file_bytes,
        "decode_parity": got == want,
    }


def to_wire_frame(df: DataFrame) -> DataFrame:
    """Project a produced frame to the Kafka sink contract (key, value
    binary columns) — the shape Producer.prepare already emits."""
    cols = set(df.columns)
    if not {"key", "value"} <= cols:
        raise ValueError(f"kafka sink needs key/value columns, got {sorted(cols)}")
    return df.select("key", "value")
