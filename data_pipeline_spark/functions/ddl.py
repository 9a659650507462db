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
# string literals may contain '' (SQL-escaped single quote)
_DEFAULT_RE = re.compile(r"DEFAULT\s+(?P<val>'(?:[^']|'')*'|[\w.+-]+)", re.IGNORECASE)

# SQL type family -> (avro type, metadata builder)
_INT_TYPES = {"SMALLINT": "int", "INT2": "int", "INT": "int", "INTEGER": "int",
              "INT4": "int", "BIGINT": "long", "INT8": "long"}
_FLOAT_TYPES = {"REAL": "float", "FLOAT4": "float", "FLOAT": "double",
                "FLOAT8": "double", "DOUBLE": "double", "DOUBLE PRECISION": "double"}


def _split_columns(body: str) -> list[str]:
    """Split on top-level commas (respecting parens in DECIMAL(10,2) and
    quoted string literals in DEFAULT 'a,b')."""
    parts, depth, cur = [], 0, []
    in_str = False
    for ch in body:
        if ch == "'":
            # a doubled '' inside a literal toggles twice — net no change
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
                continue
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
        return raw[1:-1].replace("''", "'")
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


# -- ALTER TABLE (S11 second half; schematizer.py:745-791 registers from
# old-create + alter stmt pairs) --------------------------------------------

_ALTER_RE = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.\"]+)\s+(?P<body>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_RE = re.compile(r"^ADD\s+(?:COLUMN\s+)?(?P<def>.+)$", re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(r"^DROP\s+(?:COLUMN\s+)?\"?(?P<name>\w+)\"?$", re.IGNORECASE)
_MODIFY_RE = re.compile(
    r"^(?:MODIFY|ALTER)\s+(?:COLUMN\s+)?(?P<def>.+)$", re.IGNORECASE | re.DOTALL
)
_CHANGE_RE = re.compile(
    r"^CHANGE\s+(?:COLUMN\s+)?\"?(?P<old>\w+)\"?\s+(?P<def>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_RE = re.compile(
    r"^RENAME\s+(?:COLUMN\s+)?\"?(?P<old>\w+)\"?\s+TO\s+\"?(?P<new>\w+)\"?$",
    re.IGNORECASE,
)


def _compile_column(coldef: str) -> dict[str, Any]:
    """One column definition -> Avro field dict (same rules as CREATE)."""
    schema = compile_create_table(f"CREATE TABLE _t ({coldef})")
    fields = schema["fields"]
    if len(fields) != 1:
        raise ValueError(f"expected one column definition, got: {coldef!r}")
    return fields[0]


def compile_alter_table(sql: str) -> tuple[str, list[tuple]]:
    """ALTER TABLE ... -> (table, ops).

    Ops: ('add', field), ('drop', name), ('modify', field),
    ('rename', old, new), ('change', old, field).  Comma-separated clauses
    in one statement apply in order (MySQL-ish dialect, matching the
    CREATE-TABLE subset of redshift_sql_to_avsc.py).
    """
    m = _ALTER_RE.search(sql.strip())
    if not m:
        raise ValueError("not an ALTER TABLE statement")
    table = m.group("name").strip('"').split(".")[-1]
    ops: list[tuple] = []
    for clause in _split_columns(m.group("body")):
        if (cm := _DROP_RE.match(clause)) is not None:
            ops.append(("drop", cm.group("name")))
        elif (cm := _RENAME_RE.match(clause)) is not None:
            ops.append(("rename", cm.group("old"), cm.group("new")))
        elif (cm := _ADD_RE.match(clause)) is not None:
            ops.append(("add", _compile_column(cm.group("def"))))
        elif (cm := _CHANGE_RE.match(clause)) is not None:
            ops.append(("change", cm.group("old"), _compile_column(cm.group("def"))))
        elif (cm := _MODIFY_RE.match(clause)) is not None:
            ops.append(("modify", _compile_column(cm.group("def"))))
        else:
            raise ValueError(f"unsupported ALTER clause: {clause!r}")
    return table, ops


def apply_alter_table(schema: dict[str, Any], alter_sql: str) -> dict[str, Any]:
    """Apply an ALTER TABLE statement to a compiled Avro record schema."""
    _, ops = compile_alter_table(alter_sql)
    fields = [dict(f) for f in schema["fields"]]
    index = {f["name"]: i for i, f in enumerate(fields)}

    def _require(name: str) -> int:
        if name not in index:
            raise ValueError(f"column {name!r} does not exist")
        return index[name]

    for op in ops:
        kind = op[0]
        if kind == "add":
            f = op[1]
            if f["name"] in index:
                raise ValueError(f"column {f['name']!r} already exists")
            index[f["name"]] = len(fields)
            fields.append(f)
        elif kind == "drop":
            i = _require(op[1])
            fields.pop(i)
            index = {f["name"]: j for j, f in enumerate(fields)}
        elif kind == "modify":
            f = op[1]
            fields[_require(f["name"])] = f
        elif kind == "rename":
            old, new = op[1], op[2]
            i = _require(old)
            if new in index:
                raise ValueError(f"column {new!r} already exists")
            fields[i] = {**fields[i], "name": new}
            index = {f["name"]: j for j, f in enumerate(fields)}
        elif kind == "change":
            old, f = op[1], op[2]
            i = _require(old)
            if f["name"] != old and f["name"] in index:
                raise ValueError(f"column {f['name']!r} already exists")
            fields[i] = f
            index = {g["name"]: j for j, g in enumerate(fields)}
    return {**schema, "fields": fields}


def register_schema_from_sql_stmts(
    registry,
    namespace: str,
    source: str,
    new_create_table_stmt: str,
    old_create_table_stmt: str | None = None,
    alter_table_stmt: str | None = None,
    contains_pii: bool = False,
):
    """Register a schema from SQL statements (schematizer.py:745-791).

    When (old create, alter) are given, the alter applied to the old schema
    must reproduce the new CREATE's schema — the same cross-validation the
    reference's schematizer performs before accepting the registration.
    Returns the RegisteredSchema from the engine registry.
    """
    import json as _json

    new_schema = compile_create_table(new_create_table_stmt)
    if alter_table_stmt is not None:
        if old_create_table_stmt is None:
            raise ValueError("alter_table_stmt requires old_create_table_stmt")
        derived = apply_alter_table(
            compile_create_table(old_create_table_stmt), alter_table_stmt
        )
        if derived != new_schema:
            raise ValueError(
                "old schema + ALTER does not produce the new CREATE's schema"
            )
    pks = [
        f["name"]
        for f in sorted(
            (f for f in new_schema["fields"] if "pkey" in f),
            key=lambda f: f["pkey"],
        )
    ]
    return registry.register_schema(
        namespace,
        source,
        _json.dumps(new_schema),
        primary_keys=tuple(pks),
        contains_pii=contains_pii,
    )


# -- schema migration plans (schematizer.py:1244-1272 get_schema_migration;
# the reference generates the "pushplan" server-side, so this is a fresh
# Avro->SQL reverse-compiler honoring the same field metadata conventions) --


def _avro_field_to_sql(field: dict[str, Any]) -> str:
    """One Avro field (with compile_create_table metadata) -> column DDL."""
    ftype = field["type"]
    nullable = isinstance(ftype, list)
    if nullable:
        branches = [b for b in ftype if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"cannot express union {ftype!r} in SQL")
        ftype = branches[0]

    if field.get("date"):
        sql = "DATE"
    elif field.get("timestamp"):
        sql = "TIMESTAMP"
    elif field.get("fixed_pt"):
        sql = f"DECIMAL({field.get('precision', 18)},{field.get('scale', 0)})"
    elif field.get("fixlen") is not None:
        sql = f"CHAR({field['fixlen']})"
    elif ftype == "string":
        sql = f"VARCHAR({field['maxlen']})" if field.get("maxlen") else "VARCHAR(65535)"
    elif ftype == "int":
        sql = "INTEGER"
    elif ftype == "long":
        sql = "BIGINT"
    elif ftype == "float":
        sql = "REAL"
    elif ftype == "double":
        sql = "DOUBLE PRECISION"
    elif ftype == "boolean":
        sql = "BOOLEAN"
    else:
        raise ValueError(f"cannot express avro type {ftype!r} in SQL")

    out = f"{field['name']} {sql}"
    if not nullable:
        out += " NOT NULL"
    default = field.get("default")
    if default is not None:
        if isinstance(default, str):
            # SQL string literal: double embedded quotes, else a default
            # containing ' yields invalid (or injectable) generated DDL
            out += " DEFAULT '{}'".format(default.replace("'", "''"))
        else:
            out += f" DEFAULT {default}"
    return out


def _create_stmt(schema: dict[str, Any]) -> str:
    cols = [_avro_field_to_sql(f) for f in schema["fields"]]
    pks = [
        f["name"]
        for f in sorted(
            (f for f in schema["fields"] if "pkey" in f), key=lambda f: f["pkey"]
        )
    ]
    if pks:
        cols.append(f"PRIMARY KEY ({', '.join(pks)})")
    return f"CREATE TABLE {schema['name']} ({', '.join(cols)});"


def get_schema_migration(
    new_schema: dict[str, Any],
    target_schema_type: str = "redshift",
    old_schema: dict[str, Any] | None = None,
) -> list[str]:
    """SQL statements migrating old_schema -> new_schema (the pushplan).

    No old schema: a single CREATE TABLE.  Additive/subtractive change:
    ALTER TABLE ADD/DROP COLUMN statements.  Any column whose type or
    constraints changed: a rebuild plan (CREATE staging table, INSERT the
    overlapping columns, swap) — warehouse engines generally cannot retype
    a column in place, and a copy-swap is also the shape that works as a
    Spark parquet rewrite.
    """
    if target_schema_type not in ("redshift", "mysql"):
        raise ValueError(f"unsupported target schema type {target_schema_type!r}")
    if old_schema is None:
        return [_create_stmt(new_schema)]

    table = new_schema["name"]
    old_f = {f["name"]: f for f in old_schema["fields"]}
    new_f = {f["name"]: f for f in new_schema["fields"]}
    added = [f for f in new_schema["fields"] if f["name"] not in old_f]
    dropped = [n for n in old_f if n not in new_f]
    changed = [
        n
        for n, f in new_f.items()
        if n in old_f
        and {k: v for k, v in f.items() if k != "pkey"}
        != {k: v for k, v in old_f[n].items() if k != "pkey"}
    ]

    if changed:
        keep = [f["name"] for f in new_schema["fields"] if f["name"] in old_f]
        staging = f"{table}__migration_new"
        return [
            _create_stmt({**new_schema, "name": staging}),
            f"INSERT INTO {staging} ({', '.join(keep)}) "
            f"SELECT {', '.join(keep)} FROM {table};",
            f"DROP TABLE {table};",
            f"ALTER TABLE {staging} RENAME TO {table};",
        ]

    plan = [
        f"ALTER TABLE {table} ADD COLUMN {_avro_field_to_sql(f)};" for f in added
    ]
    plan += [f"ALTER TABLE {table} DROP COLUMN {n};" for n in dropped]
    return plan


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
