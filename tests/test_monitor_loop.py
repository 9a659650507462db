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
