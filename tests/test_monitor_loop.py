"""End-to-end monitoring loop (closes the round-2 gap noted in
ROUND1_NOTES): data topic -> streaming consume -> gap-flush window counts ->
monitoring records -> published to a monitoring topic -> tailed back."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_spark import envelope as env
from data_pipeline_spark.consumer import Consumer
from data_pipeline_spark.producer import Producer
from data_pipeline_spark.registrar import MONITORING_SCHEMA, monitoring_frame
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.sources.file_topic import TopicStore
from data_pipeline_spark.streaming.monitor import counts_with_gap_flush

EVENT_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "epoch", "type": "long"},
        ],
    }
)


def test_monitoring_loop_end_to_end(spark, tmp_path):
    reg = SchemaRegistry()
    data_rs = reg.register_schema("prod.main.db", "events", EVENT_SCHEMA)
    mon_rs = reg.register_schema(
        "prod.main.db", "monitoring_log", json.dumps(MONITORING_SCHEMA)
    )
    store = TopicStore(spark, str(tmp_path / "topics"))
    producer = Producer(store, reg)

    # publish data: two 600s windows plus one event two windows later
    rows = spark.createDataFrame(
        [(i, 100 + (0 if i < 6 else 700) + (1500 if i == 9 else 0)) for i in range(10)],
        "event_id LONG, epoch LONG",
    )
    producer.publish(rows, data_rs.schema_id, order_by="event_id")

    # streaming consume -> event-time from decoded payload -> gap flush
    stream = store.read_stream(data_rs.topic)
    decoded = stream.select(
        env.decode_payload_udf(EVENT_SCHEMA)(
            env.unpack(F.col("value")).payload
        ).alias("p")
    ).select(
        F.lit(data_rs.topic).alias("topic"),
        F.timestamp_seconds(F.col("p.epoch")).alias("ts"),
    )
    flushed = counts_with_gap_flush(
        decoded, "ts", "topic", window_seconds=600, idle_timeout_ms=None
    )
    q = (
        flushed.writeStream.format("memory")
        .queryName("monloop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    counts = spark.sql("SELECT * FROM monloop")
    # adapt to monitoring records and publish to the monitoring topic
    mon = monitoring_frame(counts, client_name="consumer-1", client_type="consumer")
    producer.publish(mon, mon_rs.schema_id, order_by="start_timestamp")

    # tail the monitoring topic back and validate the window counts
    got = {
        (r.payload.start_timestamp, r.payload.message_count)
        for r in Consumer(store, reg).messages(mon_rs.topic).collect()
    }
    # closed windows: [0:6 events], [600:3], [1200:0 gap]; window 1800 open
    assert got == {(0, 6), (600, 3), (1200, 0)}
    for r in Consumer(store, reg).messages(mon_rs.topic).collect():
        assert r.payload.client_name == "consumer-1"
        assert r.payload.topic == data_rs.topic


def test_dynamic_subscription_gets_monitoring_automatically(spark, tmp_path):
    """T8 stretch: `monitoring_sink_builder` plugged into
    `StreamingSubscriptionRunner` — every topic the registry tick discovers
    (including one registered mid-run) automatically gets gap-flush window
    counts, and the closed windows match the batch tumbling-window monitor
    exactly (zeros included for gaps)."""
    from data_pipeline_spark.consumer_source import TopicsInNamespace
    from data_pipeline_spark.operators import aggregates as agg
    from data_pipeline_spark.streaming.dynamic import StreamingSubscriptionRunner
    from data_pipeline_spark.streaming.monitor import monitoring_sink_builder

    reg = SchemaRegistry()
    store = TopicStore(spark, str(tmp_path / "topics"))
    producer = Producer(store, reg)
    out_root = str(tmp_path / "monitor_out")

    def publish(source, epochs):
        rs = reg.register_schema("mon.main.db", source, EVENT_SCHEMA)
        rows = spark.createDataFrame(
            [(i, e) for i, e in enumerate(epochs)], "event_id LONG, epoch LONG"
        )
        # envelope event time = the payload's epoch column
        producer.publish(rows, rs.schema_id, order_by="event_id",
                         timestamp_col="epoch")
        return rs

    # alpha: 5 events in [0,600), 2 in [600,1200), gap, closer at 1900
    rs_a = publish("alpha", [10, 20, 30, 40, 50, 700, 800, 1900])

    runner = StreamingSubscriptionRunner(
        spark,
        store,
        TopicsInNamespace(reg, "mon.main.db"),
        str(tmp_path / "ckpt"),
        monitoring_sink_builder(out_root, window_seconds=600,
                                idle_timeout_ms=None),
    )
    assert runner.tick()["added"] == [rs_a.topic]
    runner.process_available()

    # beta registered mid-run: the next tick wires its monitor with no
    # other configuration
    rs_b = publish("beta", [5, 15, 25, 650, 1250])
    assert runner.tick()["added"] == [rs_b.topic]
    runner.process_available()
    runner.stop_all()

    for rs in (rs_a, rs_b):
        got = {
            (r.window_start, r.message_count)
            for r in spark.read.parquet(f"{out_root}/{rs.topic}").collect()
        }
        # batch monitor over the same wire envelopes (consumer-side view)
        wire = store.read(rs.topic).select(
            F.lit(rs.topic).alias("topic"),
            F.timestamp_seconds(
                env.unpack(F.col("value")).timestamp
            ).alias("ts"),
        )
        batch = {
            (r.window_start, r.message_count)
            for r in agg.tumbling_window_counts(wire, "ts", 600, ["topic"])
            .select("window_start", "message_count")
            .collect()
        }
        last_open = max(w for w, _ in batch)  # still open in the stream state
        closed_batch = {(w, c) for w, c in batch if w < last_open}
        assert {(w, c) for w, c in got if c > 0} == closed_batch
        # gap windows appear as explicit zero records (batch emits no row)
        zero_windows = {w for w, c in got if c == 0}
        expected_gaps = {
            w
            for w in range(0, last_open, 600)
            if w not in {bw for bw, _ in batch}
        }
        assert zero_windows == expected_gaps


def test_gap_flush_late_event_counts_into_open_window(spark, tmp_path):
    """Reference parity (client.py:303-324): a message older than the open
    window does NOT rewind — record_message increments the CURRENT window
    after flushing up to the newest timestamp.  Cross-micro-batch late
    events must do the same here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: window 0 (3 events) then window 600 opens (1 event)
    pq.write_table(
        pa.table({"topic": ["t"] * 4, "epoch": pa.array([10, 20, 30, 700], pa.int64())}),
        str(src / "a.parquet"),
    )
    # batch 2: one LATE event (epoch 50 < open window 600) + closer at 1300
    pq.write_table(
        pa.table({"topic": ["t"] * 2, "epoch": pa.array([50, 1300], pa.int64())}),
        str(src / "b.parquet"),
    )
    # the file source orders micro-batches by modification time: pin it so
    # the late-event file is deterministically the SECOND batch
    import os as _os
    _os.utime(src / "a.parquet", (1_000_000_000, 1_000_000_000))
    _os.utime(src / "b.parquet", (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("topic STRING, epoch LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    ).select("topic", F.timestamp_seconds(F.col("epoch")).alias("ts"))
    q = (
        counts_with_gap_flush(stream, "ts", "topic", window_seconds=600,
                              idle_timeout_ms=None)
        .writeStream.format("memory")
        .queryName("lateflush")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.message_count)
        for r in spark.sql("SELECT * FROM lateflush").collect()
    }
    # window 0 closed with 3 on-time events; the late epoch-50 event counts
    # into the open 600 window (reference semantics), flushed by the 1300
    # closer: 1 (epoch 700) + 1 (late) = 2
    assert got == {(0, 3), (600, 2)}
