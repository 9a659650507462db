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
import functools
import json
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

# MetaAttribute array as a Spark type (E4's IV, D5's meta ops ride here)
META_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("schema_id", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
)
META_TYPE_DDL = "array<struct<schema_id:int,payload:binary>>"

# Spark-side envelope struct (pre-pack / post-unpack representation)
ENVELOPE_STRUCT = T.StructType(
    [
        T.StructField("uuid", T.BinaryType()),
        T.StructField("message_type", T.StringType()),
        T.StructField("schema_id", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("previous_payload", T.BinaryType()),
        T.StructField("meta", META_TYPE),
        T.StructField("encryption_type", T.StringType()),
        T.StructField("timestamp", T.IntegerType()),
    ]
)


# compiled envelope codecs, built lazily once per Python worker (the
# reference memoizes Avro writers the same way, yelp_avro_store.py:26-84)
_ENV_ENCODER = None
_ENV_DECODER = None


def _env_encoder():
    global _ENV_ENCODER
    if _ENV_ENCODER is None:
        _ENV_ENCODER = avro_codec.compile_encoder(ENVELOPE_SCHEMA)
    return _ENV_ENCODER


def _env_decoder():
    global _ENV_DECODER
    if _ENV_DECODER is None:
        _ENV_DECODER = avro_codec.compile_decoder(ENVELOPE_SCHEMA)
    return _ENV_DECODER


# payload codecs for the FUSED wire UDFs, memoized per Python worker and
# keyed by schema JSON (r8: the fused UDFs recompiled them on every pandas
# batch — repeated compile cost on the exact hot path fusion exists for)
@functools.lru_cache(maxsize=256)
def _payload_encoder(schema_json: str):
    return avro_codec.compile_encoder(avro_codec.parse_schema(schema_json))


@functools.lru_cache(maxsize=256)
def _payload_decoder(writer_json: str, reader_json: str):
    return avro_codec.compile_decoder(
        avro_codec.parse_schema(writer_json),
        avro_codec.parse_schema(reader_json),
    )


def _pack_one(row: dict[str, Any], ascii_mode: bool = False) -> bytes:
    """Single-message pack (tests / driver-side use)."""
    out = bytearray()
    _env_encoder()(
        out,
        (
            row["uuid"],
            row["message_type"],
            row["schema_id"],
            row["payload"],
            row.get("previous_payload"),
            row.get("meta"),
            row.get("encryption_type"),
            row["timestamp"],
        ),
    )
    body = bytes(out)
    if ascii_mode:
        return MAGIC_ASCII + base64.urlsafe_b64encode(body)
    return MAGIC_BINARY + body


def _unpack_one(blob: bytes) -> dict[str, Any]:
    magic, body = blob[:1], blob[1:]
    if magic == MAGIC_ASCII:
        body = base64.urlsafe_b64decode(body)
    elif magic != MAGIC_BINARY:
        raise ValueError(f"unknown envelope magic byte {magic!r}")
    values, _ = _env_decoder()(memoryview(body), 0)
    names = [f["name"] for f in ENVELOPE_SCHEMA["fields"]]
    return dict(zip(names, values))


def _meta_to_tuples(meta) -> list | None:
    """Arrow struct rows (dicts) -> positional tuples for the compiled
    encoder; None passes through (encoded as the null union branch)."""
    if meta is None:
        return None
    out = []
    for m in meta:
        if isinstance(m, dict):
            out.append((int(m["schema_id"]), bytes(m["payload"])))
        else:  # already positional (Row/tuple)
            out.append((int(m[0]), bytes(m[1])))
    return out


@pandas_udf(T.BinaryType())
def _pack_udf(env: pd.DataFrame) -> pd.Series:
    enc = _env_encoder()
    out = []
    # meta is optional in caller-built structs (pre-r5 producers omit it)
    metas = (
        env["meta"].tolist() if "meta" in env.columns else [None] * len(env)
    )
    # .tolist() first: iterating python lists is ~2x faster than iterating
    # pandas Series element-wise in this hot loop
    for uuid_v, mtype, sid, payload, prev, meta, enc_type, ts in zip(
        env["uuid"].tolist(),
        env["message_type"].tolist(),
        env["schema_id"].tolist(),
        env["payload"].tolist(),
        env["previous_payload"].tolist(),
        metas,
        env["encryption_type"].tolist(),
        env["timestamp"].tolist(),
    ):
        buf = bytearray(MAGIC_BINARY)
        enc(
            buf,
            (
                bytes(uuid_v),
                mtype,
                int(sid),
                bytes(payload),
                None if prev is None else bytes(prev),
                _meta_to_tuples(meta),
                enc_type,
                int(ts),
            ),
        )
        out.append(bytes(buf))
    return pd.Series(out, dtype=object)


@pandas_udf(ENVELOPE_STRUCT)
def _unpack_udf(blob: pd.Series) -> pd.DataFrame:
    dec = _env_decoder()
    rows = []
    for b in blob:
        mv = memoryview(bytes(b))
        magic = bytes(mv[:1])
        body = mv[1:]
        if magic == MAGIC_ASCII:
            body = memoryview(base64.urlsafe_b64decode(bytes(body)))
        elif magic != MAGIC_BINARY:
            raise ValueError(f"unknown envelope magic byte {magic!r}")
        (uuid_v, mtype, sid, payload, prev, meta, enc_type, ts), _ = dec(body, 0)
        rows.append(
            (uuid_v, mtype, sid, payload, prev, _meta_to_dicts(meta), enc_type, ts)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "uuid",
            "message_type",
            "schema_id",
            "payload",
            "previous_payload",
            "meta",
            "encryption_type",
            "timestamp",
        ],
    )


def _meta_to_dicts(meta) -> list | None:
    """Decoded positional MetaAttribute tuples -> dicts for Arrow's
    struct conversion on the pandas-UDF return path."""
    if meta is None:
        return None
    return [{"schema_id": m[0], "payload": m[1]} for m in meta]


@pandas_udf(ENVELOPE_STRUCT)
def _unpack_permissive_udf(blob: pd.Series) -> pd.DataFrame:
    """PERMISSIVE mode: corrupt wire bytes become an all-null envelope row
    instead of failing the task (`from_avro` mode=PERMISSIVE semantics;
    callers filter `schema_id IS NULL` to quarantine corrupt records)."""
    dec = _env_decoder()
    null_row = (None,) * 8
    rows = []
    for b in blob:
        try:
            mv = memoryview(bytes(b))
            magic = bytes(mv[:1])
            body = mv[1:]
            if magic == MAGIC_ASCII:
                body = memoryview(base64.urlsafe_b64decode(bytes(body)))
            elif magic != MAGIC_BINARY:
                raise ValueError("bad magic")
            (u, mt, sid, pl, prev, m, et, ts), _ = dec(body, 0)
            rows.append((u, mt, sid, pl, prev, _meta_to_dicts(m), et, ts))
        except Exception:
            rows.append(null_row)
    return pd.DataFrame(
        rows,
        columns=[
            "uuid",
            "message_type",
            "schema_id",
            "payload",
            "previous_payload",
            "meta",
            "encryption_type",
            "timestamp",
        ],
    )


# ---------------------------------------------------------------------------
# Wire-codec backend dispatch: spark-avro's JVM from_avro/to_avro when the
# module is on the classpath (cluster deployments: --packages
# org.apache.spark:spark-avro), else the Arrow-batched pandas codec (this
# sandbox has no spark-avro jar).  Both speak the SAME wire format — the
# envelope schema's fixed/enum/union encodings are what spark-avro's
# serializer produces for binary/string columns under a user-provided
# jsonFormatSchema — so mixed fleets interoperate.
# ---------------------------------------------------------------------------

_WIRE_BACKEND: str | None = None
_SUBSTR_MAX = 2_147_483_647


def _jvm_wire_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def wire_codec_backend(spark) -> str:
    """'jvm' when spark-avro is loadable in this session's JVM, else
    'python'.  Probed once per process (the decision cannot change within
    a JVM's lifetime)."""
    global _WIRE_BACKEND
    if _WIRE_BACKEND is None:
        _WIRE_BACKEND = "jvm" if _jvm_wire_available(spark) else "python"
    return _WIRE_BACKEND


def _jvm_pack(envelope_struct: Column) -> Column:
    from pyspark.sql.avro.functions import to_avro

    return F.concat(
        F.lit(MAGIC_BINARY), to_avro(envelope_struct, json.dumps(ENVELOPE_SCHEMA))
    )


def _jvm_unpack(wire: Column, mode: str) -> Column:
    from pyspark.sql.avro.functions import from_avro

    magic = F.substring(wire, 1, 1)
    rest = F.substring(wire, 2, _SUBSTR_MAX)
    body = F.when(
        magic == F.lit(MAGIC_ASCII),
        # urlsafe-base64 -> standard alphabet for the builtin unbase64
        F.unbase64(F.translate(rest.cast("string"), "-_", "+/")),
    ).otherwise(rest)
    return from_avro(body, json.dumps(ENVELOPE_SCHEMA), {"mode": mode})


def pack(envelope_struct: Column, spark=None) -> Column:
    """Envelope struct column -> wire bytes (magic byte + Avro binary).

    Pass the session to enable the JVM fast path where spark-avro is
    present; without it (or without the jar) the pandas codec runs."""
    if spark is not None and wire_codec_backend(spark) == "jvm":
        return _jvm_pack(envelope_struct)
    return _pack_udf(envelope_struct)


def unpack(wire: Column, mode: str = "FAILFAST", spark=None) -> Column:
    """Wire bytes -> envelope struct column.  mode='PERMISSIVE' turns
    corrupt records into all-null rows instead of failing the task.
    Pass the session to enable the JVM fast path (see ``pack``)."""
    if spark is not None and wire_codec_backend(spark) == "jvm":
        return _jvm_unpack(wire, mode)
    if mode == "PERMISSIVE":
        return _unpack_permissive_udf(wire)
    return _unpack_udf(wire)


# ---------------------------------------------------------------------------
# Fused wire paths (python backend): encode+pack / unpack+decode in ONE
# pandas UDF each.  The layered shape (payload codec UDF, then envelope
# codec UDF) crosses the Arrow boundary twice per direction — the payload
# bytes ship JVM->Python->JVM for the payload codec and again inside the
# envelope struct for the envelope codec.  Fusing halves the crossings on
# the hot path.  Scope: the COMMON case only (no encryption, no meta
# attributes, no reader override) — encryption sits between encode and pack
# as a JVM aes_encrypt, so those topics keep the layered path; clusters
# with spark-avro keep the JVM envelope codec.  Wire bytes are identical
# (same compiled codecs), asserted by parity tests.
# ---------------------------------------------------------------------------


def encode_pack_udf(payload_schema_json: str, message_type: str, schema_id: int):
    """(typed struct, uuid bytes, previous bytes, ts) -> wire bytes in one
    Arrow crossing.  Bit-identical to encode_payload_udf + pack.

    Flat-primitive payload schemas take the VECTORIZED batch kernel
    (wire_np.encode_pack_batch — whole-batch numpy zigzag/varint/scatter
    instead of ~40 interpreted ops per row; byte parity pinned by
    tests/test_wire_np.py); anything outside its scope (non-null
    previous_payload, null fields, non-flat schemas) falls back to the
    compiled per-row codec below, which remains the semantics of record.
    """
    from data_pipeline_spark import wire_np

    schema = avro_codec.parse_schema(payload_schema_json)
    field_names = [f["name"] for f in schema["fields"]]
    fast_fields = wire_np.flat_field_types(schema)
    mt_symbols = ENVELOPE_SCHEMA["fields"][1]["type"]["symbols"]
    mt_bytes = wire_np._const_varint(mt_symbols.index(message_type))
    sid_bytes = wire_np._const_varint(int(schema_id))

    @pandas_udf(T.BinaryType())
    def fused(
        data: pd.DataFrame, uuid_s: pd.Series, prev: pd.Series, ts: pd.Series
    ) -> pd.Series:
        if fast_fields is not None:
            res = wire_np.encode_pack_batch(
                data, uuid_s, prev, ts, fast_fields,
                mt_bytes, sid_bytes, MAGIC_BINARY,
            )
            if res is not None:
                return res
        rec = _payload_encoder(payload_schema_json)  # worker-memoized
        env_enc = _env_encoder()
        out = []
        cols = [data[n].tolist() for n in field_names]
        for values, u, pv, t in zip(
            zip(*cols), uuid_s.tolist(), prev.tolist(), ts.tolist()
        ):
            pbuf = bytearray()
            rec(pbuf, [v.item() if hasattr(v, "item") else v for v in values])
            buf = bytearray(MAGIC_BINARY)
            env_enc(
                buf,
                (
                    bytes(u),
                    message_type,
                    schema_id,
                    bytes(pbuf),
                    None if pv is None else bytes(pv),
                    None,
                    None,
                    int(t),
                ),
            )
            out.append(bytes(buf))
        return pd.Series(out, dtype=object)

    return fused


def unpack_decode_udf(writers: dict[int, str], reader_schema_json: str, topic: str):
    """wire bytes -> (envelope scalars + decoded payload FIELDS, flat) in
    one Arrow crossing, with per-message writer-schema dispatch.

    Payload fields come back flattened as ``p_<name>`` columns — Arrow
    converts flat scalar columns ~15% faster than a per-row nested dict
    struct, and the caller rebuilds the payload struct JVM-side for free
    (Consumer._decode_fused).  Returns (udf, payload field names).
    """
    from data_pipeline_spark import wire_np

    reader_parsed = avro_codec.parse_schema(reader_schema_json)
    payload_type = avro_codec.to_spark_type(reader_parsed)
    reader_names = [f["name"] for f in reader_parsed["fields"]]
    out_type = T.StructType(
        [
            T.StructField("uuid", T.BinaryType()),
            T.StructField("message_type", T.StringType()),
            T.StructField("schema_id", T.IntegerType()),
            T.StructField("timestamp", T.IntegerType()),
            *[
                T.StructField(f"p_{f.name}", f.dataType)
                for f in payload_type.fields
            ],
        ]
    )
    # schema ids eligible for the vectorized batch decoder: the writer
    # must be IDENTICAL to the reader (no resolution/defaults) and flat
    # primitive; everything else stays on the compiled per-row path
    _reader_flat = wire_np.flat_field_types(reader_parsed)
    fast_sids = (
        {
            sid: _reader_flat
            for sid, wjson in writers.items()
            if avro_codec.parse_schema(wjson) == reader_parsed
        }
        if _reader_flat is not None
        else {}
    )
    mt_symbols = ENVELOPE_SCHEMA["fields"][1]["type"]["symbols"]

    @pandas_udf(out_type)
    def fused(blob: pd.Series) -> pd.DataFrame:
        if fast_sids:
            res = wire_np.unpack_decode_batch(
                blob, fast_sids, mt_symbols, reader_names, MAGIC_BINARY
            )
            if res is not None:
                return res
        env_dec = _env_decoder()
        decoders = {  # worker-memoized per (writer, reader) schema pair
            sid: _payload_decoder(wjson, reader_schema_json)
            for sid, wjson in writers.items()
        }
        names = ["uuid", "message_type", "schema_id", "timestamp"] + [
            f"p_{n}" for n in reader_names
        ]
        cols: dict[str, list] = {n: [] for n in names}
        for b in blob:
            mv = memoryview(bytes(b))
            magic = bytes(mv[:1])
            body = mv[1:]
            if magic == MAGIC_ASCII:
                body = memoryview(base64.urlsafe_b64decode(bytes(body)))
            elif magic != MAGIC_BINARY:
                raise ValueError(f"unknown envelope magic byte {magic!r}")
            (u, mt, sid, payload, _prev, _meta, et, ts), _ = env_dec(body, 0)
            if et is not None:
                raise ValueError(
                    f"topic {topic!r} carries encrypted payloads ({et}); "
                    "pass crypto_keys to Consumer.messages"
                )
            dec = decoders.get(int(sid))
            if dec is None:
                raise KeyError(
                    f"message carries schema_id {int(sid)} but topic "
                    f"{topic!r} has only {sorted(decoders)} registered — "
                    "registry out of sync with the stream"
                )
            values, _ = dec(memoryview(bytes(payload)), 0)
            cols["uuid"].append(u)
            cols["message_type"].append(mt)
            cols["schema_id"].append(sid)
            cols["timestamp"].append(ts)
            for n, v in zip(reader_names, values):
                cols[f"p_{n}"].append(v)
        return pd.DataFrame(cols, columns=names)

    return fused, reader_names


def generate_uuid() -> Column:
    """16 random bytes per row — the engine analogue of FastUUID
    (_fast_uuid.py): Spark's codegen uuid() is already JVM-fast; we convert
    its hex to the envelope's fixed(16) bytes."""
    return F.unhex(F.regexp_replace(F.expr("uuid()"), "-", ""))


def encode_payload_udf(schema_json: str):
    """Returns a pandas UDF encoding a struct column to Avro bytes with the
    given schema (the _AvroPayload write path, _avro_payload.py:86-100)."""
    schema = avro_codec.parse_schema(schema_json)
    field_names = [f["name"] for f in schema["fields"]]

    @pandas_udf(T.BinaryType())
    def enc(data: pd.DataFrame) -> pd.Series:
        # positional compiled encoder: the struct column MUST be built in
        # schema field order (producer.prepare does)
        rec = avro_codec.compile_encoder(schema)
        out = []
        for values in zip(*[data[n] for n in field_names]):
            buf = bytearray()
            rec(buf, [v.item() if hasattr(v, "item") else v for v in values])
            out.append(bytes(buf))
        return pd.Series(out, dtype=object)

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
    reader_names = [f["name"] for f in avro_codec.parse_schema(reader)["fields"]]

    @pandas_udf(spark_type)
    def dec(blob: pd.Series) -> pd.DataFrame:
        rec = avro_codec.compile_decoder(writer, reader)
        rows = [rec(memoryview(bytes(b)), 0)[0] for b in blob]
        return pd.DataFrame(rows, columns=reader_names)

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
