"""The versioned wire envelope as Spark transforms.

Re-expresses data_pipeline/schemas/envelope_v1.avsc:1-94 and
data_pipeline/envelope.py:73-121: every payload on the wire is an Avro
record {uuid fixed(16), message_type enum, schema_id int, payload bytes,
previous_payload union, meta union, encryption_type union, timestamp int},
prefixed with magic byte b'\\x00' (or 'a' + urlsafe-base64 for ASCII
transports, envelope.py:53,98-99,117-119).

Pack/unpack run as Arrow-batched pandas UDFs over the pure-Python codec
(avro_codec) — the only Python in the engine's row path, and only at the
wire boundary.  Everything before pack / after unpack is columnar.
"""

from __future__ import annotations

import base64
import uuid as uuidlib
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from data_pipeline_spark import avro_codec

# envelope_v1.avsc re-stated (public schema, reference schemas/ dir)
ENVELOPE_SCHEMA: dict[str, Any] = {
    "type": "record",
    "namespace": "data_pipeline_spark",
    "name": "Envelope",
    "fields": [
        {"name": "uuid", "type": {"type": "fixed", "name": "UUID", "size": 16}},
        {
            "name": "message_type",
            "type": {
                "type": "enum",
                "name": "MessageType",
                "symbols": [
                    "create",
                    "update",
                    "delete",
                    "refresh",
                    "heartbeat",
                    "monitor",
                    "registration",
                    "log",
                ],
            },
        },
        {"name": "schema_id", "type": "int"},
        {"name": "payload", "type": "bytes"},
        {"name": "previous_payload", "type": ["null", "bytes"], "default": None},
        {
            "name": "meta",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "MetaAttribute",
                        "fields": [
                            {"name": "schema_id", "type": "int"},
                            {"name": "payload", "type": "bytes"},
                        ],
                    },
                },
            ],
            "default": None,
        },
        {"name": "encryption_type", "type": ["null", "string"], "default": None},
        {"name": "timestamp", "type": "int"},
    ],
}

MAGIC_BINARY = b"\x00"
MAGIC_ASCII = b"a"

# Spark-side envelope struct (pre-pack / post-unpack representation)
ENVELOPE_STRUCT = T.StructType(
    [
        T.StructField("uuid", T.BinaryType()),
        T.StructField("message_type", T.StringType()),
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("previous_payload", T.BinaryType()),
        T.StructField("encryption_type", T.StringType()),
        T.StructField("timestamp", T.IntegerType()),
    ]
)


def _pack_one(row: dict[str, Any], ascii_mode: bool) -> bytes:
    body = avro_codec.encode(ENVELOPE_SCHEMA, row)
    if ascii_mode:
        return MAGIC_ASCII + base64.urlsafe_b64encode(body)
    return MAGIC_BINARY + body


def _unpack_one(blob: bytes) -> dict[str, Any]:
    magic, body = blob[:1], blob[1:]
    if magic == MAGIC_ASCII:
        body = base64.urlsafe_b64decode(body)
    elif magic != MAGIC_BINARY:
        raise ValueError(f"unknown envelope magic byte {magic!r}")
    return avro_codec.decode(ENVELOPE_SCHEMA, body)


@pandas_udf(T.BinaryType())
def _pack_udf(env: pd.DataFrame) -> pd.Series:
    return env.apply(
        lambda r: _pack_one(
            {
                "uuid": bytes(r["uuid"]),
                "message_type": r["message_type"],
                "schema_id": int(r["schema_id"]),
                "payload": bytes(r["payload"]),
                "previous_payload": None
                if r["previous_payload"] is None
                else bytes(r["previous_payload"]),
                "meta": None,
                "encryption_type": r["encryption_type"],
                "timestamp": int(r["timestamp"]),
            },
            ascii_mode=False,
        ),
        axis=1,
    )


@pandas_udf(ENVELOPE_STRUCT)
def _unpack_udf(blob: pd.Series) -> pd.DataFrame:
    rows = blob.map(_unpack_one)
    return pd.DataFrame(
        {
            "uuid": rows.map(lambda r: r["uuid"]),
            "message_type": rows.map(lambda r: r["message_type"]),
            "schema_id": rows.map(lambda r: r["schema_id"]),
            "payload": rows.map(lambda r: r["payload"]),
            "previous_payload": rows.map(lambda r: r["previous_payload"]),
            "encryption_type": rows.map(lambda r: r["encryption_type"]),
            "timestamp": rows.map(lambda r: r["timestamp"]),
        }
    )


def pack(envelope_struct: Column) -> Column:
    """Envelope struct column -> wire bytes (magic byte + Avro binary)."""
    return _pack_udf(envelope_struct)


def unpack(wire: Column) -> Column:
    """Wire bytes -> envelope struct column."""
    return _unpack_udf(wire)


def generate_uuid() -> Column:
    """16 random bytes per row — the engine analogue of FastUUID
    (_fast_uuid.py): Spark's codegen uuid() is already JVM-fast; we convert
    its hex to the envelope's fixed(16) bytes."""
    return F.unhex(F.regexp_replace(F.expr("uuid()"), "-", ""))


def encode_payload_udf(schema_json: str):
    """Returns a pandas UDF encoding a struct column to Avro bytes with the
    given schema (the _AvroPayload write path, _avro_payload.py:86-100)."""
    schema = avro_codec.parse_schema(schema_json)

    @pandas_udf(T.BinaryType())
    def enc(data: pd.DataFrame) -> pd.Series:
        return data.apply(
            lambda r: avro_codec.encode(schema, _clean_row(r.to_dict())), axis=1
        )

    return enc


def decode_payload_udf(writer_schema_json: str, reader_schema_json: str | None = None):
    """Returns a pandas UDF decoding Avro bytes to a struct column, with
    optional reader-schema resolution (reader_schema_id semantics,
    _avro_payload.py:59-63, consumer.py:226-233)."""
    writer = avro_codec.parse_schema(writer_schema_json)
    reader = (
        avro_codec.parse_schema(reader_schema_json)
        if reader_schema_json is not None
        else writer
    )
    spark_type = avro_codec.to_spark_type(reader)

    @pandas_udf(spark_type)
    def dec(blob: pd.Series) -> pd.DataFrame:
        rows = blob.map(lambda b: avro_codec.decode(writer, bytes(b), reader))
        return pd.DataFrame(list(rows))

    return dec


def _clean_row(d: dict[str, Any]) -> dict[str, Any]:
    """numpy scalar -> python scalar normalization for the codec."""
    out = {}
    for k, v in d.items():
        if hasattr(v, "item"):
            v = v.item()
        out[k] = v
    return out


def message_uuid_hex(uuid_col: Column) -> Column:
    return F.lower(F.hex(uuid_col))


def new_uuid_bytes() -> bytes:
    return uuidlib.uuid4().bytes
