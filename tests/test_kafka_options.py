"""Kafka option wiring (the deploy-time TopicStore swap, SURVEY §8 S1/S2).

No broker or connector jar exists in this sandbox, so these tests pin the
option-construction logic — subscribe lists, the startingOffsets JSON
contract with reset sentinels, ledger resolution, producer acks/flush
settings — and the named fallback error when the jar is absent.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.producer import Producer
from data_pipeline_spark.registry import SchemaRegistry
from data_pipeline_spark.sources import kafka
from data_pipeline_spark.sources.file_topic import OffsetLedger, TopicStore
from tests.test_pipeline import EVENT_SCHEMA, _events


def test_reader_options_offsets_json_and_reset_sentinels():
    opts = kafka.reader_options(
        ["ns.db.a.v1", "ns.db.b.v1"],
        "broker1:9092,broker2:9092",
        starting_offsets={
            "ns.db.a.v1": {0: 23, 1: None},  # 1: no commit -> reset sentinel
        },
        reset="earliest",
    )
    assert opts["subscribe"] == "ns.db.a.v1,ns.db.b.v1"
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert json.loads(opts["startingOffsets"]) == {
        "ns.db.a.v1": {"0": 23, "1": -2},
        "ns.db.b.v1": {},
    }
    assert opts["maxOffsetsPerTrigger"] == "5000"  # producer buffer analogue

    latest = kafka.reader_options(["t"], "b:9092", {"t": {0: None}}, reset="latest")
    assert json.loads(latest["startingOffsets"]) == {"t": {"0": -1}}

    plain = kafka.reader_options(["t"], "b:9092", reset="latest")
    assert plain["startingOffsets"] == "latest"
    with pytest.raises(ValueError):
        kafka.reader_options(["t"], "b:9092", reset="sideways")


def test_reader_options_resolve_committed_ledger(spark, tmp_path):
    """The from_committed consume path: ledger max+1 positions land in the
    startingOffsets JSON exactly as TopicStore would resume."""
    reg = SchemaRegistry()
    rs = reg.register_schema("k.main.db", "events", EVENT_SCHEMA)
    store = TopicStore(spark, str(tmp_path / "topics"))
    ledger = OffsetLedger(spark, str(tmp_path / "offsets"))
    Producer(store, reg).publish(
        _events(spark, 40), rs.schema_id, num_partitions=2, order_by="event_id"
    )
    consumed = store.read(rs.topic)
    ledger.commit_messages("g1", rs.topic, consumed)

    opts = kafka.reader_options_from_ledger(
        ledger, "g1", [rs.topic], "broker:9092"
    )
    got = json.loads(opts["startingOffsets"])[rs.topic]
    committed = ledger.committed("g1", rs.topic)
    assert got == {str(p): o for p, o in committed.items()}
    # the committed positions are exactly the resume points (max offset + 1)
    highs = {
        r.partition: r.n
        for r in consumed.groupBy("partition")
        .agg((F.max("offset") + 1).alias("n"))
        .collect()
    }
    assert committed == highs


def test_writer_options_match_reference_producer_config():
    opts = kafka.writer_options("ns.db.t.v1", "broker:9092")
    assert opts["kafka.acks"] == "all"  # acks=-1, config.py:322-329
    assert opts["kafka.linger.ms"] == "100"  # 0.1 s flush, config.py:360-367
    assert opts["kafka.enable.idempotence"] == "true"  # exactly-once (T5)
    assert opts["topic"] == "ns.db.t.v1"
    at_least_once = kafka.writer_options("t", "b", exactly_once=False)
    assert "kafka.enable.idempotence" not in at_least_once


def test_read_stream_raises_named_error_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka.read_stream(spark, kafka.reader_options(["t"], "b:9092"))


def test_to_wire_frame_projects_sink_contract(spark):
    df = spark.createDataFrame(
        [(b"k", b"v", 1)], "key BINARY, value BINARY, extra INT"
    )
    assert kafka.to_wire_frame(df).columns == ["key", "value"]
    with pytest.raises(ValueError, match="key/value"):
        kafka.to_wire_frame(df.select("extra"))


def test_kafka_smoke_roundtrip_gates_and_activates(spark):
    """The scripted first-run-on-a-real-cluster smoke: in this sandbox
    (no connector jar) it must raise the NAMED gate error; on a deploy
    image with the jar + a broker (SPARK_GRAFT_KAFKA_BOOTSTRAP) it runs
    the full byte-parity round trip."""
    import os

    import pytest

    from data_pipeline_spark.sources import kafka as k

    # re-runnable against a persistent broker: the default topic is
    # uuid-suffixed per run (ADVICE r11), an explicit one passes through
    a, b = k.smoke_topic("pipeline.smoke.db.ev"), k.smoke_topic("pipeline.smoke.db.ev")
    assert a != b and a.startswith("pipeline.smoke.db.ev-smoke-")
    assert k.smoke_topic("base", "owned.topic") == "owned.topic"

    if not k._kafka_jar_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            k.smoke_roundtrip(spark, "localhost:9092", n=10)
        return
    broker = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not broker:
        pytest.skip("connector jar present but no broker configured "
                    "(set SPARK_GRAFT_KAFKA_BOOTSTRAP)")
    rep = k.smoke_roundtrip(spark, broker, n=50)
    assert rep["bytes_parity"] and rep["decode_parity"]
