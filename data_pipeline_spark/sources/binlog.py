"""Binlog text source (S10/E9/A8).

Re-expresses tools/binlog_analyzer.py:33-98: parse ``mysqlbinlog
--verbose`` text output into {timestamp, statement_type, table} rows and
roll them up per table/type.  Pure regexp projection — `readStream.text()`
plus `regexp_extract`, fully codegen, no Python.

Line shapes handled (binlog_analyzer.py:55-94):
    SET TIMESTAMP=1500000000/*!*/;
    ### INSERT INTO `db`.`tbl`
    ### UPDATE `db`.`tbl`
    ### DELETE FROM `db`.`tbl`
The SET TIMESTAMP value applies to the statements that follow it (a running
last-value fill per input order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_RE = r"^SET TIMESTAMP=(\d+)"
STMT_RE = r"^### (INSERT INTO|UPDATE|DELETE FROM) `([^`]+)`\.`([^`]+)`"

STATEMENT_TYPES = {"INSERT INTO": "insert", "UPDATE": "update", "DELETE FROM": "delete"}


def parse_binlog_lines(
    lines: DataFrame, line_col: str = "value", file_col: str | None = None
) -> DataFrame:
    """Text lines (with an ordering column ``line_no``) -> statement rows.

    Output: (ts LONG, statement_type STRING, db STRING, table STRING).
    The running SET TIMESTAMP fill is a last-non-null window over line
    order.  Pass ``file_col`` when the frame carries MULTIPLE binlog files
    (e.g. ``F.input_file_name()`` from a directory read): the fill then
    partitions per file — both for scale (parallel windows instead of one
    global order) and for correctness (a timestamp must never carry across
    file boundaries).
    """
    c = F.col(line_col)
    cols = [
        F.col("line_no"),
        F.regexp_extract(c, TS_RE, 1).alias("ts_raw"),
        F.regexp_extract(c, STMT_RE, 1).alias("stmt_raw"),
        F.regexp_extract(c, STMT_RE, 2).alias("db"),
        F.regexp_extract(c, STMT_RE, 3).alias("table"),
    ]
    if file_col is not None:
        cols.insert(0, F.col(file_col).alias("__file"))
    parsed = lines.select(*cols)
    base = Window.partitionBy("__file") if file_col is not None else Window
    w = base.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    filled = parsed.withColumn(
        "ts",
        F.last(
            F.when(F.col("ts_raw") != "", F.col("ts_raw").cast("long")), True
        ).over(w),
    )
    stmt_map = F.create_map(
        *[F.lit(x) for kv in STATEMENT_TYPES.items() for x in kv]
    )
    return (
        filled.filter(F.col("stmt_raw") != "")
        .select(
            "ts",
            F.element_at(stmt_map, F.col("stmt_raw")).alias("statement_type"),
            "db",
            "table",
        )
    )


def binlog_activity_rollup(statements: DataFrame, window_seconds: int = 600) -> DataFrame:
    """A8: per-(window, table, type) statement counts."""
    win = (F.floor(F.col("ts") / window_seconds) * window_seconds).cast("bigint")
    return statements.groupBy(
        win.alias("window_start"), "table", "statement_type"
    ).agg(F.count(F.lit(1)).alias("n_statements"))
