"""Consumer-source discovery (S4), dynamic subscription (S5), exactly-once
sink (T5), registrar/monitoring publishers (T8/A1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.consumer import Consumer
from data_pipeline_spark.consumer_source import (
    FixedSchemas,
    FixedTopics,
    NewTopicsOnly,
    TopicsInNamespace,
    TopicsInSource,
)
from data_pipeline_spark.io import load_table
from data_pipeline_spark.producer import Producer
from data_pipeline_spark.registrar import monitoring_frame, registration_frame
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.sources.file_topic import OffsetLedger, TopicStore
from data_pipeline_spark.streaming.dynamic import (
    DynamicSubscriptionRunner,
    ExactlyOnceBatchSink,
)
from tests.conftest import SF_SMOKE

SCHEMA_A = json.dumps(
    {"type": "record", "name": "a", "fields": [{"name": "event_id", "type": "long"}]}
)


def _registry_with(n_sources: int) -> tuple[SchemaRegistry, list]:
    reg = SchemaRegistry()
    return reg, [
        reg.register_schema("ns.main.db", f"src{i}", SCHEMA_A) for i in range(n_sources)
    ]


def test_consumer_source_variants():
    reg, schemas = _registry_with(3)
    reg.register_schema("other.ns.db", "x", SCHEMA_A)
    assert FixedTopics(reg, "t1", "t2").get_topics() == ["t1", "t2"]
    assert FixedSchemas(reg, schemas[0].schema_id).get_topics() == [schemas[0].topic]
    assert TopicsInNamespace(reg, "ns.main.db").get_topics() == sorted(
        s.topic for s in schemas
    )
    assert TopicsInSource(reg, "ns.main.db", "src1").get_topics() == [schemas[1].topic]

    new_only = NewTopicsOnly(TopicsInNamespace(reg, "ns.main.db"))
    assert new_only.get_topics() == sorted(s.topic for s in schemas)
    assert new_only.get_topics() == []  # nothing new since last query
    extra = reg.register_schema("ns.main.db", "src_late", SCHEMA_A)
    assert new_only.get_topics() == [extra.topic]


def test_dynamic_subscription_picks_up_new_topics(spark, tmp_path):
    reg, schemas = _registry_with(1)
    store = TopicStore(spark, str(tmp_path / "topics"))
    ledger = OffsetLedger(spark, str(tmp_path / "offsets"))
    producer = Producer(store, reg)
    consumer = Consumer(store, reg, group="dyn", ledger=ledger)
    events = load_table(spark, SF_SMOKE, "events").select("event_id").limit(40)

    producer.publish(events, schemas[0].schema_id, order_by="event_id")
    runner = DynamicSubscriptionRunner(
        consumer, TopicsInNamespace(reg, "ns.main.db"), refresh_period_s=0
    )
    seen: dict[str, int] = {}

    def process(topic, df):
        seen[topic] = seen.get(topic, 0) + df.count()

    assert runner.run_once(process) == [schemas[0].topic]
    assert seen[schemas[0].topic] == 40

    # new topic appears in the registry -> next tick restarts with it
    late = reg.register_schema("ns.main.db", "late_src", SCHEMA_A)
    producer.publish(events.limit(10), late.schema_id, order_by="event_id")
    processed = runner.run_once(process)
    assert late.topic in processed
    assert seen[late.topic] == 10
    # committed offsets: nothing re-consumed on a further tick
    runner.run_once(process)
    assert seen[schemas[0].topic] == 40 and seen[late.topic] == 10


def test_exactly_once_sink_skips_replayed_batches(spark, tmp_path):
    sink = ExactlyOnceBatchSink(
        spark,
        out_dir=str(tmp_path / "out"),
        ledger_path=str(tmp_path / "ledger"),
        sink_id="s1",
    )
    df = spark.range(100).select(F.col("id"))
    assert sink.write(df, epoch_id=1) is True
    assert sink.write(df, epoch_id=1) is False  # replay skipped
    assert sink.write(df, epoch_id=2) is True
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 200  # each batch exactly once
    # crash-between-write-and-record simulation: replay overwrites in place
    sink2 = ExactlyOnceBatchSink(
        spark, str(tmp_path / "out"), str(tmp_path / "ledger2"), "s1"
    )
    assert sink2.write(df, epoch_id=2) is True  # unrecorded in ledger2 -> rewrite
    assert spark.read.parquet(str(tmp_path / "out")).count() == 200  # idempotent


def test_registrar_and_monitoring_frames(spark):
    reg_df = registration_frame(
        spark, "team-x", "client-1", "producer", schema_ids=[1, 2]
    )
    rows = reg_df.collect()
    assert len(rows) == 2
    assert {r.schema_id for r in rows} == {1, 2}
    assert all(r.expected_frequency_seconds == 600 for r in rows)

    counts = spark.createDataFrame(
        [("t.v1", 1700000000, 42)], "topic STRING, window_start LONG, message_count LONG"
    )
    mon = monitoring_frame(counts, "client-1", "producer").collect()[0]
    assert (mon.topic, mon.message_count, mon.start_timestamp, mon.client_type) == (
        "t.v1", 42, 1700000000, "producer",
    )


def test_topics_custom_filter_func():
    """User-defined topic predicate (TopicFilter.filter_func,
    base_consumer.py:950-976): arbitrary logic over the registered schema."""
    reg, schemas = _registry_with(3)
    pii = reg.register_schema("ns.main.db", "secrets", SCHEMA_A, contains_pii=True)
    non_pii = reg.topics(
        namespace="ns.main.db", filter_func=lambda rs: not rs.contains_pii
    )
    assert pii.topic not in non_pii
    assert set(non_pii) == {s.topic for s in schemas}
    only_src1 = reg.topics(filter_func=lambda rs: rs.source.endswith("1"))
    assert only_src1 == [schemas[1].topic]


def test_topic_in_data_target_discovery(spark, tmp_path):
    """S4 TopicInDataTarget: data target -> consumer groups -> data sources
    -> topics; plus catalog persistence round-trip."""
    from data_pipeline_spark.consumer_source import TopicInDataTarget

    reg, schemas = _registry_with(3)
    other = reg.register_schema("ns.other.db", "ext", SCHEMA_A)

    dt = reg.create_data_target("warehouse", "redshift", "wh://cluster-1")
    assert reg.create_data_target("warehouse", "redshift", "wh://cluster-1") is dt
    cg = reg.create_consumer_group("wh-loaders", dt.data_target_id)
    # one SOURCE-scoped mapping + one NAMESPACE-wide mapping
    reg.create_consumer_group_data_source(
        cg.consumer_group_id, "SOURCE", "ns.main.db", "src0"
    )
    reg.create_consumer_group_data_source(
        cg.consumer_group_id, "NAMESPACE", "ns.other.db"
    )

    topics = TopicInDataTarget(reg, dt.data_target_id).get_topics()
    assert schemas[0].topic in topics
    assert other.topic in topics
    assert schemas[1].topic not in topics  # src1 not attached to the target

    # NewTopicsOnly wrapper composes with data-target discovery
    src = NewTopicsOnly(TopicInDataTarget(reg, dt.data_target_id))
    assert src.get_topics() == sorted({schemas[0].topic, other.topic})
    assert src.get_topics() == []  # nothing new since last query
    late = reg.register_schema("ns.other.db", "late", SCHEMA_A)
    assert src.get_topics() == [late.topic]

    # persistence: catalog entities survive save/load
    path = str(tmp_path / "reg")
    reg.save(spark, path)
    back = SchemaRegistry.load(spark, path)
    assert back.get_data_target_by_name("warehouse").destination == "wh://cluster-1"
    assert back.get_topics_by_data_target_id(dt.data_target_id) == sorted(
        {schemas[0].topic, other.topic, late.topic}
    )

    with pytest.raises(KeyError):
        reg.get_topics_by_data_target_id(99)
    with pytest.raises(ValueError):
        reg.create_consumer_group_data_source(cg.consumer_group_id, "SOURCE", "ns.x")


def test_warehouse_destination_end_to_end(spark, tmp_path):
    """The switch-over story for a warehouse user: register sources, attach
    them to a data target through a consumer group, publish, then tail
    EVERYTHING feeding the destination via TopicInDataTarget + the
    multi-topic consumer."""
    from data_pipeline_spark.consumer_source import TopicInDataTarget

    reg = SchemaRegistry()
    rs_a = reg.register_schema("wh.src.db", "users", SCHEMA_A)
    rs_b = reg.register_schema("wh.src.db", "orders", SCHEMA_A)
    reg.register_schema("wh.src.db", "ignored", SCHEMA_A)  # not attached

    dt = reg.create_data_target("wh", "redshift", "wh://c1")
    cg = reg.create_consumer_group("wh-load", dt.data_target_id)
    for src in ("users", "orders"):
        reg.create_consumer_group_data_source(
            cg.consumer_group_id, "SOURCE", "wh.src.db", src
        )

    store = TopicStore(spark, str(tmp_path / "topics"))
    prod = Producer(store, reg)
    ev = load_table(spark, SF_SMOKE, "events").select("event_id").limit(30)
    prod.publish(ev.limit(20), rs_a.schema_id, order_by="event_id")
    prod.publish(ev.limit(10), rs_b.schema_id, order_by="event_id")

    topics = TopicInDataTarget(reg, dt.data_target_id).get_topics()
    assert sorted(topics) == sorted([rs_a.topic, rs_b.topic])
    out = Consumer(store, reg).messages_union(topics)
    counts = {r.topic: r.n for r in out.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {rs_a.topic: 20, rs_b.topic: 10}


def test_fetch_offsets_for_topics_overrides_committed(spark, tmp_path):
    """§2.9 extension point (base_consumer.py:146-157): when the callback
    supplies a {partition: offset} map for a topic, consumption starts
    there instead of the committed-ledger position (positions stored in a
    transactional sink outside the ledger); None falls back to default."""
    reg, schemas = _registry_with(1)
    store = TopicStore(spark, str(tmp_path / "topics"))
    ledger = OffsetLedger(spark, str(tmp_path / "offsets"))
    producer = Producer(store, reg)
    consumer = Consumer(store, reg, group="ovr", ledger=ledger)
    events = load_table(spark, SF_SMOKE, "events").select("event_id").limit(40)
    producer.publish(
        events, schemas[0].schema_id, num_partitions=1, order_by="event_id"
    )
    topic = schemas[0].topic

    # commit everything: the default resume position is the tail
    consumer.commit(topic, consumer.messages(topic))

    seen: dict[str, int] = {}

    def process(t, df):
        seen[t] = df.count()

    # override rewinds partition 0 to offset 30 -> 10 messages re-read
    runner = DynamicSubscriptionRunner(
        consumer,
        TopicsInNamespace(reg, "ns.main.db"),
        refresh_period_s=0,
        fetch_offsets_for_topics=lambda topics: {t: {0: 30} for t in topics},
    )
    runner.run_once(process)
    assert seen[topic] == 10

    # None from the callback -> default committed behavior (tail: nothing)
    runner.fetch_offsets_for_topics = lambda topics: {t: None for t in topics}
    runner.run_once(process)
    assert seen[topic] == 0
