"""CDC apply/merge semantics + update messages with previous-payload diff
through the full wire path + streaming publish."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_spark import envelope as env
from data_pipeline_spark.consumer import Consumer
from data_pipeline_spark.io import load_table
from data_pipeline_spark.operators.cdc import apply_cdc, merge_upsert
from data_pipeline_spark.producer import Producer
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.sources.file_topic import TopicStore
from data_pipeline_spark.streaming.publish import StreamingPublisher
from tests.conftest import SF_SMOKE

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "kv",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
)


def test_apply_cdc_latest_wins_and_deletes(spark):
    msgs = spark.createDataFrame(
        [
            (1, "a", 10, "create"),
            (1, "b", 20, "update"),
            (2, "x", 11, "create"),
            (2, None, 25, "delete"),
            (3, "z", 30, "create"),
        ],
        "k LONG, v STRING, seq LONG, message_type STRING",
    )
    snap = apply_cdc(msgs, keys=["k"], order_by=[F.col("seq").desc()])
    got = {r.k: r.v for r in snap.collect()}
    assert got == {1: "b", 3: "z"}  # 2 deleted, 1 updated


def test_merge_upsert_into_snapshot(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k LONG, v STRING"
    )
    changes = spark.createDataFrame(
        [
            (2, "new2", 1, "update"),
            (3, None, 2, "delete"),
            (4, "new4", 3, "create"),
        ],
        "k LONG, v STRING, seq LONG, message_type STRING",
    )
    merged = merge_upsert(
        base, changes.select("k", "v", "seq", "message_type"),
        keys=["k"], order_by=[F.col("seq").desc()],
    )
    got = {r.k: r.v for r in merged.collect()}
    assert got == {1: "old1", 2: "new2", 4: "new4"}


def test_update_messages_carry_previous_payload(spark, tmp_path):
    """UpdateMessage semantics (message.py:673-809): pre-image rides in
    previous_payload; consumers recover the field diff."""
    reg = SchemaRegistry()
    rs = reg.register_schema("ns.db.x", "kv", SCHEMA, primary_keys=("k",))
    store = TopicStore(spark, str(tmp_path / "topics"))
    prod = Producer(store, reg)

    rows = spark.createDataFrame(
        [(1, "new-a", "old-a"), (2, "new-b", "old-b")], "k LONG, v STRING, v_old STRING"
    )
    prev_payload = env.encode_payload_udf(SCHEMA)(
        F.struct(F.col("k"), F.col("v_old").alias("v"))
    )
    wire = prod.prepare(
        rows, rs.schema_id, message_type="update", previous=prev_payload
    )
    store.publish(wire, rs.topic)

    raw = Consumer(store, reg).raw(rs.topic)
    dec = env.decode_payload_udf(SCHEMA)
    out = raw.select(
        F.col("envelope.message_type").alias("mt"),
        dec(F.col("envelope.payload")).alias("new"),
        dec(F.col("envelope.previous_payload")).alias("old"),
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.mt == "update"
        assert r.new.k == r.old.k  # key unchanged
        assert r.new.v.startswith("new-") and r.old.v.startswith("old-")


def test_streaming_publisher_exactly_once(spark, tmp_path):
    reg = SchemaRegistry()
    rs = reg.register_schema("ns.db.x", "events", json.dumps(
        {"type": "record", "name": "e",
         "fields": [{"name": "event_id", "type": "long"}]}
    ))
    store = TopicStore(spark, str(tmp_path / "topics"))
    src_dir = tmp_path / "src"
    events = load_table(spark, SF_SMOKE, "events").select("event_id").limit(50)
    events.write.parquet(str(src_dir))

    publisher = StreamingPublisher(
        Producer(store, reg), rs.schema_id,
        ledger_path=str(tmp_path / "pub_ledger"), order_by="event_id",
    )
    stream = spark.readStream.schema("event_id LONG").parquet(str(src_dir))
    q = publisher.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    consumed = Consumer(store, reg).messages(rs.topic)
    assert consumed.count() == 50
    # replaying the same epoch appends nothing
    assert publisher.publish_batch(events, epoch_id=0) is False
    assert Consumer(store, reg).messages(rs.topic).count() == 50


def test_streaming_publisher_watermark_verified_replay(spark, tmp_path):
    """The two crash windows of the two-phase publish ledger
    (_producer_retry.py:120-190 semantics):

    - intent written, publish LANDED, commit lost -> replay must verify
      watermarks, record the commit, and NOT re-append (no duplicates);
    - intent written, publish NEVER landed -> replay must publish (no loss).
    """
    import json

    from data_pipeline_spark.producer import Producer
    from data_pipeline_spark.registry import SchemaRegistry
    from data_pipeline_spark.sources.file_topic import TopicStore
    from data_pipeline_spark.streaming.publish import StreamingPublisher

    reg = SchemaRegistry()
    rs = reg.register_schema(
        "xo.main.db", "events",
        json.dumps({"type": "record", "name": "e",
                    "fields": [{"name": "event_id", "type": "long"}]}),
    )
    store = TopicStore(spark, str(tmp_path / "topics"))
    ledger = str(tmp_path / "ledger")
    producer = Producer(store, reg)

    def batch(lo, n):
        return spark.createDataFrame([(lo + i,) for i in range(n)], "event_id LONG")

    pub1 = StreamingPublisher(producer, rs.schema_id, ledger, order_by="event_id")
    assert pub1.publish_batch(batch(0, 10), 0) is True

    # window 1: epoch 1's intent + data landed, commit row lost (crash)
    pre = store.high_watermarks(rs.topic)
    spark.createDataFrame(
        [(1, "intent", json.dumps(pre))], StreamingPublisher._LEDGER_SCHEMA
    ).write.mode("append").parquet(ledger)
    producer.publish(batch(10, 10), rs.schema_id, order_by="event_id")
    pub2 = StreamingPublisher(producer, rs.schema_id, ledger, order_by="event_id")
    assert pub2.publish_batch(batch(10, 10), 1) is False  # verified: skip
    assert store.read(rs.topic).count() == 20  # no duplicate append
    assert pub2.publish_batch(batch(10, 10), 1) is False  # now committed

    # window 2: epoch 2's intent written, data never landed (crash earlier)
    pre2 = store.high_watermarks(rs.topic)
    spark.createDataFrame(
        [(2, "intent", json.dumps(pre2))], StreamingPublisher._LEDGER_SCHEMA
    ).write.mode("append").parquet(ledger)
    pub3 = StreamingPublisher(producer, rs.schema_id, ledger, order_by="event_id")
    assert pub3.publish_batch(batch(20, 5), 2) is True  # re-publish: no loss
    assert store.read(rs.topic).count() == 25
    ids = sorted(
        r.offset for r in store.read(rs.topic).select("offset").collect()
    )
    assert len(set((r.partition, r.offset) for r in
                   store.read(rs.topic).collect())) == 25
