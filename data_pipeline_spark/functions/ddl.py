"""SQL DDL -> Avro schema compiler (E8).

Re-expresses tools/redshift_sql_to_avsc.py:31-368: parse CREATE TABLE
statements (Redshift/MySQL-ish dialect) into Avro record schemas carrying
the reference's metadata conventions — decimal ``fixed_pt``/``precision``/
``scale``, char width ``fixlen``/``maxlen``, ``date``/``timestamp`` flags,
``pkey`` ordinals (redshift_sql_to_avsc.py:47-73,153-199) — plus the Spark
StructType for direct DataFrame use.

Driver-side only (schema registration path, S11); no row data flows here.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import types as T

_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.\"]+)\s*\((?P<body>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PK_TABLE_RE = re.compile(
    r"PRIMARY\s+KEY\s*\(\s*(?P<cols>[^)]+)\)", re.IGNORECASE
)
_COL_RE = re.compile(
    r"^\s*\"?(?P<name>\w+)\"?\s+"
    r"(?P<type>[A-Za-z][A-Za-z0-9]*(?:\s+(?:PRECISION|VARYING))?)\s*"
    r"(?:\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+))?\s*\))?"
    r"(?P<rest>.*)$",
    re.DOTALL | re.IGNORECASE,
)
_DEFAULT_RE = re.compile(r"DEFAULT\s+(?P<val>'[^']*'|[\w.+-]+)", re.IGNORECASE)

# SQL type family -> (avro type, metadata builder)
_INT_TYPES = {"SMALLINT": "int", "INT2": "int", "INT": "int", "INTEGER": "int",
              "INT4": "int", "BIGINT": "long", "INT8": "long"}
_FLOAT_TYPES = {"REAL": "float", "FLOAT4": "float", "FLOAT": "double",
                "FLOAT8": "double", "DOUBLE": "double", "DOUBLE PRECISION": "double"}


def _split_columns(body: str) -> list[str]:
    """Split on top-level commas (respecting parens in DECIMAL(10,2))."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _parse_default(rest: str, avro_type: str) -> Any:
    m = _DEFAULT_RE.search(rest)
    if not m:
        return None
    raw = m.group("val")
    if raw.upper() == "NULL":
        return None
    if raw.startswith("'"):
        return raw.strip("'")
    if avro_type in ("int", "long"):
        return int(raw)
    if avro_type in ("float", "double"):
        return float(raw)
    if avro_type == "boolean":
        return raw.upper() in ("TRUE", "1")
    return raw


def compile_create_table(sql: str) -> dict[str, Any]:
    """CREATE TABLE ... -> Avro record schema dict (with pkey/width/decimal
    metadata) — the bootstrapper's registration input (S11)."""
    m = _CREATE_RE.search(sql.strip())
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    table = m.group("name").strip('"').split(".")[-1]
    body = m.group("body")

    table_pks: list[str] = []
    pk_m = _PK_TABLE_RE.search(body)
    if pk_m:
        table_pks = [c.strip().strip('"') for c in pk_m.group("cols").split(",")]

    fields = []
    pkeys: list[str] = list(table_pks)
    for coldef in _split_columns(body):
        if re.match(r"^\s*PRIMARY\s+KEY", coldef, re.IGNORECASE):
            continue
        cm = _COL_RE.match(coldef)
        if not cm:
            continue
        name = cm.group("name")
        sql_type = " ".join(cm.group("type").upper().split())
        p, s = cm.group("p"), cm.group("s")
        rest = cm.group("rest") or ""
        meta: dict[str, Any] = {}

        if sql_type in _INT_TYPES:
            avro: Any = _INT_TYPES[sql_type]
        elif sql_type in _FLOAT_TYPES:
            avro = _FLOAT_TYPES[sql_type]
        elif sql_type in ("DECIMAL", "NUMERIC"):
            avro = "double"
            meta = {"fixed_pt": True, "precision": int(p or 18), "scale": int(s or 0)}
        elif sql_type in ("CHAR", "CHARACTER", "NCHAR", "BPCHAR"):
            avro = "string"
            meta = {"fixlen": int(p or 1)}
        elif sql_type in ("VARCHAR", "CHARACTER VARYING", "NVARCHAR", "TEXT"):
            avro = "string"
            if p:
                meta = {"maxlen": int(p)}
        elif sql_type in ("BOOLEAN", "BOOL"):
            avro = "boolean"
        elif sql_type == "DATE":
            avro = "int"
            meta = {"date": True}
        elif sql_type.startswith("TIMESTAMP"):
            avro = "long"
            meta = {"timestamp": True}
        else:
            raise ValueError(f"unsupported SQL type {sql_type!r} for {name}")

        not_null = re.search(r"NOT\s+NULL", rest, re.IGNORECASE) is not None
        inline_pk = re.search(r"PRIMARY\s+KEY", rest, re.IGNORECASE) is not None
        if inline_pk and name not in pkeys:
            pkeys.append(name)
        default = _parse_default(rest, avro)

        field: dict[str, Any] = {"name": name}
        if not_null or inline_pk or name in table_pks:
            field["type"] = avro
            if default is not None:
                field["default"] = default
        else:
            # nullable column: union, null FIRST so default null is valid
            # (the union-ordering subtlety called out in
            # redshift_sql_to_avsc.py:117-125)
            field["type"] = ["null", avro]
            field["default"] = default  # None (JSON null) unless specified
            if default is not None:
                field["type"] = [avro, "null"]  # default's type must be first
        if name in pkeys:
            field["pkey"] = pkeys.index(name) + 1
        field.update(meta)
        fields.append(field)

    return {"type": "record", "name": table, "fields": fields}


def create_table_to_struct(sql: str) -> tuple[str, T.StructType, list[str]]:
    """CREATE TABLE -> (table, StructType, primary_keys) for DataFrame use."""
    from data_pipeline_spark import avro_codec

    schema = compile_create_table(sql)
    pkeys = sorted(
        (f for f in schema["fields"] if "pkey" in f), key=lambda f: f["pkey"]
    )
    return (
        schema["name"],
        avro_codec.to_spark_type(schema),
        [f["name"] for f in pkeys],
    )
