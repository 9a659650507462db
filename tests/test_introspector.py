"""Multi-topic consume + introspector catalog commands."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_spark.consumer import Consumer
from data_pipeline_spark.introspector import Introspector
from data_pipeline_spark.io import load_table
from data_pipeline_spark.producer import Producer
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.sources.file_topic import TopicStore
from tests.conftest import SF_SMOKE

SCHEMA_A = json.dumps(
    {"type": "record", "name": "a", "fields": [{"name": "event_id", "type": "long"}]}
)
SCHEMA_B = json.dumps(
    {
        "type": "record",
        "name": "b",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "value", "type": "double"},
        ],
    }
)


def test_multi_topic_consume_and_introspection(spark, tmp_path):
    reg = SchemaRegistry()
    a = reg.register_schema("ns.main.db", "alpha", SCHEMA_A, primary_keys=("event_id",))
    b = reg.register_schema("ns.main.db", "beta", SCHEMA_B)
    store = TopicStore(spark, str(tmp_path / "topics"))
    prod = Producer(store, reg)
    ev = load_table(spark, SF_SMOKE, "events")
    prod.publish(ev.select("event_id").limit(30), a.schema_id, order_by="event_id")
    prod.publish(
        ev.select("event_id", "value").limit(20), b.schema_id, order_by="event_id"
    )

    cons = Consumer(store, reg)
    union = cons.messages_union([a.topic, b.topic])
    counts = {r.topic: r.n for r in union.groupBy("topic").agg(F.count("*").alias("n")).collect()}
    assert counts == {a.topic: 30, b.topic: 20}
    # heterogeneous payloads ride as JSON with per-topic schemas
    sample = union.filter(F.col("topic") == b.topic).limit(1).collect()[0]
    assert "value" in sample.payload_json

    intro = Introspector(spark, reg, store)
    assert [r.namespace for r in intro.list_namespaces().collect()] == ["ns.main.db"]
    sources = {(r.source, r.n_schemas) for r in intro.list_sources().collect()}
    assert sources == {("alpha", 1), ("beta", 1)}
    topics = {r.topic for r in intro.list_topics("ns.main.db").collect()}
    assert topics == {a.topic, b.topic}
    info = intro.topic_info(a.topic)
    assert info["primary_keys"] == ["event_id"]
    assert info["message_count"] == 30
    assert sum(info["high_watermarks"].values()) == 30
