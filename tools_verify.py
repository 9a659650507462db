"""Driver-replica correctness check: run every catalog query on a VANILLA
SparkSession (no builder session factory — exactly how the driver runs it)
and compare to the DuckDB oracle at sf0.01.

Stricter than tests/oracle_utils: results are compared as pandas frames, so
dtype-level divergence (DuckDB HUGEINT/float widening vs Spark BIGINT) is
caught — that is what the driver's value-hash sees.

Usage: python tools_verify.py [name ...]   (no args = full catalog)
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize timestamps to us precision strings for value comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind  # i u f O b M m
    return {"u": "i"}.get(k, k)


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if _dtype_kind(av) == "f" or _dtype_kind(bv) == "f":
            aa = av.astype("float64").to_numpy()
            bb = bv.astype("float64").to_numpy()
            if not np.array_equal(aa, bb, equal_nan=True):
                return False
        else:
            if not (av.astype(str).to_numpy() == bv.astype(str).to_numpy()).all():
                return False
    return True


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    import os

    # SPARK_GRAFT_MASTER reruns the whole driver-replica sweep on a real
    # multi-process standalone cluster (tools_cluster.py) — same vanilla
    # builder, different execution boundary
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    builder = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("tools_verify")
    )
    if master.startswith("spark://"):
        from data_pipeline_spark.session import package_zip

        builder = (
            builder.config("spark.driver.host", "127.0.0.1")
            .config(
                "spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "12g"),
            )
            # executor python workers need the package shipped — see
            # session.package_zip (18 ModuleNotFoundError failures on the
            # first r11 cluster sweep)
            .config("spark.submit.pyFiles", package_zip())
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    import __spark_entry__ as ent

    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = argv or list(qs)
    report = {}
    n_ok = n_weak = n_bad = 0
    for name in names:
        t0 = time.time()
        row: dict = {}
        try:
            sdf = qs[name](spark, SF_DIR)
            sp = _canon(sdf.toPandas())
            if name not in oracles:
                row = {"status": "rows_only", "spark_rows": len(sp)}
                n_weak += 1
            else:
                op = _canon(con.execute(oracles[name]).df())
                dtype_diff = [
                    (c, str(sp[c].dtype), str(op[c].dtype))
                    for c in sp.columns
                    if c in op.columns and _dtype_kind(sp[c]) != _dtype_kind(op[c])
                ]
                row = {
                    "rows_match": len(sp) == len(op),
                    "schema_match": list(sp.columns) == list(op.columns),
                    "values_match": (
                        list(sp.columns) == list(op.columns) and _values_equal(sp, op)
                    ),
                    "dtype_diff": dtype_diff,
                    "spark_rows": len(sp),
                    "oracle_rows": len(op),
                }
                ok = (
                    row["rows_match"]
                    and row["schema_match"]
                    and row["values_match"]
                    and not dtype_diff
                )
                row["status"] = "ok" if ok else "MISMATCH"
                if ok:
                    n_ok += 1
                else:
                    n_bad += 1
        except Exception:
            row = {"status": "ERROR", "err": traceback.format_exc(limit=3)}
            n_bad += 1
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        flag = {"ok": ".", "rows_only": "r", "MISMATCH": "X", "ERROR": "E"}[
            row["status"]
        ]
        print(f"{flag} {name:40s} {row['sec']:6.2f}s {row.get('err','')[:100]}")
        if row["status"] == "MISMATCH":
            print("   ", {k: v for k, v in row.items() if k not in ("sec", "status")})
    # partial runs (explicit query names) MERGE into the scoreboard so a
    # targeted re-check never clobbers the full-catalog evidence.
    # SPARK_GRAFT_VERIFY_OUT redirects the artifact (e.g. a cluster run
    # writes VERIFY_CLUSTER.json without clobbering the local sweep).
    out = Path(os.environ.get("SPARK_GRAFT_VERIFY_OUT", "VERIFY_LOCAL.json"))
    if argv and out.exists():
        merged = json.loads(out.read_text())
        merged.update(report)
        report = merged
    out.write_text(json.dumps(report, indent=1, default=str))
    print(f"\n{n_ok} ok / {n_weak} rows-only / {n_bad} bad of {len(names)}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
