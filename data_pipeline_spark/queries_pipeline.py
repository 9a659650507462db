"""Pipeline-native catalog queries: the Avro wire path exercised through the
driver's correctness gate.

``envelope_roundtrip`` packs corpus rows into versioned envelopes (uuid +
message_type + schema_id + Avro payload + magic byte), unpacks and decodes
them back, and projects the payload fields.  The oracle is the identity
projection — if the wire format is lossless the two match exactly.  This
runs the pure-Python Avro codec distributedly inside Arrow-batched UDFs
(the only Python row path in the engine, at the wire boundary only).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark import envelope as env
from data_pipeline_spark.io import load_table
from data_pipeline_spark.queries import register

_EVENT_WIRE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "user_id", "type": "long"},
            {"name": "event_type", "type": "string"},
            {"name": "value", "type": "double"},
        ],
    }
)


@register(
    "envelope_roundtrip",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    """,
    doc="Wire-format losslessness: rows -> Avro payload -> envelope pack "
    "(magic byte + binary) -> unpack -> payload decode -> rows "
    "(envelope.py:73-121, _avro_payload.py:86-167 semantics).",
    tags=("E1", "E2", "wire"),
)
def envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    payload = env.encode_payload_udf(_EVENT_WIRE_SCHEMA)(
        F.struct("event_id", "user_id", "event_type", "value")
    )
    wire = events.select(
        env.pack(
            F.struct(
                env.generate_uuid().alias("uuid"),
                F.lit("create").alias("message_type"),
                F.lit(1).alias("schema_id"),
                payload.alias("payload"),
                F.lit(None).cast("binary").alias("previous_payload"),
                F.lit(None).cast("string").alias("encryption_type"),
                F.lit(1700000000).alias("timestamp"),
            )
        ).alias("value")
    )
    decoded = wire.select(
        env.decode_payload_udf(_EVENT_WIRE_SCHEMA)(
            env.unpack(F.col("value")).payload
        ).alias("p")
    )
    return decoded.select("p.event_id", "p.user_id", "p.event_type", "p.value")
