"""Local mirror of the driver's DuckDB-oracle comparison.

Registers the corpus parquet as DuckDB views, runs the Spark query and the
oracle SQL, sorts columns by name and rows by value, and asserts exact
equality (floats compared bitwise — the engine's determinism rules make that
achievable; see data_pipeline_spark.queries docstring).
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timezone

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")


def _norm_cell(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, datetime):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, str(v))


def normalize(rows, colnames):
    """Sort columns by name, then rows by normalized value."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in colnames), out


def _oracle_dt_to_host_local(v):
    """DuckDB returns naive UTC wall times (the engine's timestamp
    contract), while Spark's collect() renders TimestampType INSTANTS as
    naive HOST-LOCAL datetimes — identical only on a UTC host.  Convert
    the oracle side of instant columns to host-local so the comparison is
    host-timezone-proof (verified under TZ=America/New_York and
    Asia/Tokyo).  TIMESTAMP_NTZ columns collect as their wall time on any
    host and must NOT be shifted."""
    if isinstance(v, datetime) and v.tzinfo is None:
        return v.replace(tzinfo=timezone.utc).astimezone().replace(tzinfo=None)
    return v


def compare_query(spark, con, spec, sf_dir: str):
    """Return (ok, detail) comparing spec.spark vs spec.oracle."""
    from pyspark.sql import types as T

    sdf = spec.spark(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    instant_cols = {
        f.name for f in sdf.schema.fields if isinstance(f.dataType, T.TimestampType)
    }
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = [
        tuple(
            _oracle_dt_to_host_local(v) if c in instant_cols else v
            for c, v in zip(ocols, r)
        )
        for r in res.fetchall()
    ]
    scols_n, srows_n = normalize(srows, scols)
    ocols_n, orows_n = normalize(orows, ocols)
    if scols_n != ocols_n:
        return False, f"columns differ: spark={scols_n} oracle={ocols_n}"
    if len(srows_n) != len(orows_n):
        return False, f"row counts differ: spark={len(srows_n)} oracle={len(orows_n)}"
    if srows_n != orows_n:
        for i, (a, b) in enumerate(zip(srows_n, orows_n)):
            if a != b:
                return False, f"first diff at sorted row {i}:\n  spark={a}\n  oracle={b}"
    return True, f"{len(srows_n)} rows match"
