"""Table loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).

These are plain parquet scans — Catalyst gets predicate pushdown and column
pruning for free, which is the point: every operator downstream declares its
projection/filters and the scan narrows itself (`PushedFilters`/`ReadSchema`
in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

# Dimensions small enough that joins against them should always broadcast.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Analyzed source frames per (SparkContext, path, file fingerprint).  A bare
# ``spark.read.parquet`` re-lists the directory and re-reads a parquet FOOTER
# for schema inference on EVERY call — ~110 ms per table on this host (r12
# gap profile), paid again for every frame a query builds over the same
# immutable file set; across the 67-query bench that footer tax alone was
# ~10 s of the 61.6 s wall.  The cached value is the analyzed DataFrame (a
# logical plan — METADATA, never row data: every action over it still scans
# the parquet inputs), keyed on the file set's (name, size, mtime_ns)
# fingerprint so any rewrite of the table invalidates it, exactly like the
# split-count memo below and Spark's own session-scoped
# filesourcePartitionFileCacheSize listing cache for catalog tables
# (guide §6: avoid repeated listings of the same table).
_TABLE_FRAMES: dict = {}


def _path_sig(path: str):
    """(size, mtime) fingerprint of a parquet file, or the sorted
    (name, size, mtime) set of a parquet directory; None when unstatable
    (missing path falls through to spark.read for its usual error)."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_size, st.st_mtime_ns)
        with os.scandir(path) as it:
            return tuple(
                sorted(
                    (e.name, s.st_size, s.st_mtime_ns)
                    for e in it
                    for s in (e.stat(),)
                )
            )
    except OSError:
        return None


def read_parquet_cached(
    spark: SparkSession, path: str, loader=None
) -> DataFrame:
    """``spark.read.parquet(path)`` with the analyzed frame memoized per
    (SparkContext, path, file fingerprint) — the footer-tax fix above,
    usable for any immutable-until-rewritten parquet layout (base tables,
    persisted index/layout sidecars).  ``loader`` overrides the read for
    sources needing post-load normalization (the events ts branch)."""
    sig = _path_sig(path)
    key = None
    if sig is not None:
        # applicationId is unique per SparkContext launch, so a cached
        # frame can never outlive its JVM context (id() could be reused)
        key = (spark.sparkContext.applicationId, path)
        hit = _TABLE_FRAMES.get(key)
        if hit is not None and hit[0] == sig:
            return hit[1]
    df = loader(spark, path) if loader else spark.read.parquet(path)
    if key is not None:
        if len(_TABLE_FRAMES) > 512:  # bound growth across many sessions
            _TABLE_FRAMES.clear()
        _TABLE_FRAMES[key] = (sig, df)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    return read_parquet_cached(
        spark, path, loader=_load_events if name == "events" else None
    )


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events, normalising `ts` to session-tz TimestampType.

    The physical encoding of `ts` has varied across testdata generations:
    parquet TIMESTAMP(NANOS) (readable only as long via the legacy
    nanosAsLong flag) and plain timestamp[us] (read as TIMESTAMP_NTZ).
    A loader hard-coded to one encoding breaks the moment the data is
    regenerated, so branch on the dtype Spark actually loaded.
    """
    from pyspark.sql import functions as F

    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) files fail schema conversion without the legacy
        # flag. The flag is runtime-settable, additive (it only changes
        # behavior for NANOS fields, which otherwise error), and must stay
        # set for the lifetime of the lazy scan — so it is intentionally
        # not restored after the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)

    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type in ("bigint", "long"):
        # nanos-as-long: exact integer division to micros (double division
        # would lose precision above 2^53 ns); truncation matches DuckDB.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type.startswith("timestamp_ntz"):
        # timestamp[us] reads as TIMESTAMP_NTZ; downstream code (and the
        # reference semantics) want epoch-convertible TimestampType, with
        # the stored wall time read as a UTC instant. Shift the NTZ wall
        # time from UTC into the session tz before the cast (which
        # interprets NTZ in session tz), so the instant is identical for
        # ANY session timezone — no session-conf mutation as a load side
        # effect.  The tz is captured as a LITERAL at build time: the cast
        # stamps its zone at ANALYSIS while current_timezone() folds at
        # EXECUTION, so the current_timezone() form only cancels when the
        # frame is analyzed and executed under the same session tz — reuse
        # through read_parquet_cached across a tz change would shift every
        # instant (caught by test_events_loader_handles_both_ts_encodings).
        # With both sides pinned to the build tz the plan is tz-invariant.
        tz = spark.conf.get("spark.sql.session.timeZone")
        df = df.withColumn(
            "ts",
            F.expr(f"cast(convert_timezone('UTC', '{tz}', ts) as timestamp)"),
        )
    return df


# Scan split counts per (SparkContext, source key, parallelism): the
# conditional in spread_scan needs the planned split count, and deriving it
# via df.rdd costs ~130 ms of driver plan-conversion per call (r12
# measurement) — a real per-trigger tax when a query builds several frames.
# The count is pure PLANNING metadata (a function of file sizes and
# maxPartitionBytes, same inputs Spark's own InMemoryFileIndex caches per
# session), never query data, so a session-scoped memo is sound; the bench
# corpora are immutable per the driver contract, and a new session (or a
# different core count) re-derives it.
_SPREAD_COUNTS: dict = {}


def spread_scan(
    df: DataFrame, spark: SparkSession, cache_key: str | None = None
) -> DataFrame:
    """Spread a narrow scan across the cluster ONLY when it needs it.

    Compute-dense pipelines (tokenize/shingle HOFs, Arrow codec UDFs,
    vector math) downstream of a small-file scan otherwise run in as few
    tasks as the scan has splits — at the bench SFs every table is one
    parquet file, so the whole pipeline lands on ONE core of 32 (measured
    r12: envelope_roundtrip spent 2.1 s in a single task).

    The r9-r11 form repartitioned UNCONDITIONALLY, which is correct
    locally but pays a full round-robin shuffle of the scanned bytes at
    any scale — at 100 TB the scan already arrives in thousands of
    splits and the shuffle is pure waste (guide §2.4: remove shuffles
    outright).  This helper repartitions only when the scan's actual
    split count is below the cluster's core count, so the local plans
    keep their spread while the at-scale plan loses the exchange.  The
    split count comes from the planned RDD (metadata only, no job).
    """
    target = spark.sparkContext.defaultParallelism
    memo_key = None
    n = None
    if cache_key is not None:
        memo_key = (id(spark.sparkContext), cache_key, target)
        n = _SPREAD_COUNTS.get(memo_key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if memo_key is not None:
            _SPREAD_COUNTS[memo_key] = n
    if n >= target:
        return df
    return df.repartition(target)


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, shared: bool = False
) -> DataFrame:
    """``load_table`` + ``spread_scan`` with the split count memoized on
    the table's path — the standard loader for compute-dense pipelines.

    ``shared=True`` is for queries whose plan reads the spread frame
    through SEVERAL branches (Spark has no CSE, so each branch otherwise
    re-scans the file and re-pays the round-robin text exchange — the
    r13 gate profile showed THREE full-text exchanges of documents in
    one plan).  When the spread repartition actually fired, the frame is
    lazily localCheckpointed so all branches of every action over the
    SAME returned frame read one materialization (one scan + one
    exchange, then local block reads).  At production scale the
    repartition does not fire and ``shared`` is inert — no checkpoint
    ever interposes on a large scan, each branch keeps its own
    pushed-down parquet read.  The checkpoint is built per returned
    frame (per query construction), never memoized across calls: every
    bench rep still computes from the parquet inputs."""
    df = load_table(spark, sf_dir, name)
    out = spread_scan(
        df, spark, cache_key=os.path.join(sf_dir, f"{name}.parquet")
    )
    if shared and out is not df:
        out = out.localCheckpoint(eager=False)
    return out


# Footer row-count memo per (path, fingerprint) — see parquet_num_rows.
_NUM_ROWS: dict = {}


def parquet_num_rows(path: str) -> int | None:
    """EXACT row count of a parquet file/dir from its FOOTER metadata —
    driver-side metadata I/O, no Spark job.  ``count()`` on an unfiltered
    parquet scan computes the same number the slow way: a full scan stage
    plus a job's fixed overhead (~0.1-0.3 s at sf0.1), for a value every
    footer already stores.  This is the same metadata Spark's own
    statistics use; None when the path is missing or holds no parquet
    files (callers fall back to a real count).  Memoized on the file-set
    fingerprint so repeated probes (gate triggers, bench reps) pay one
    footer read per layout version."""
    import pyarrow.parquet as pq

    sig = _path_sig(path)
    if sig is None:
        return None
    hit = _NUM_ROWS.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".parquet") and not n.startswith((".", "_"))
            ]
            if not files:
                return None
            total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        else:
            total = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None
    if len(_NUM_ROWS) > 512:
        _NUM_ROWS.clear()
    _NUM_ROWS[path] = (sig, total)
    return total


def parquet_nonnull_rows(path: str, col: str) -> int | None:
    """EXACT count of non-NULL values of ``col`` from parquet FOOTER
    statistics (num_rows minus the column's null_count per row group) —
    driver-side metadata, no Spark job; None when the path is missing,
    holds no parquet files, lacks the column, or any row group lacks a
    null_count statistic (callers fall back to a real count)."""
    import pyarrow.parquet as pq

    sig = _path_sig(path)
    if sig is None:
        return None
    key = (path, col)
    hit = _NUM_ROWS.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".parquet") and not n.startswith((".", "_"))
            ]
        else:
            files = [path]
        if not files:
            return None
        total = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).path for i in range(md.num_columns)]
            if col not in names:
                return None
            ci = names.index(col)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                st = g.column(ci).statistics
                if st is None or not st.has_null_count:
                    return None
                total += g.num_rows - st.null_count
    except Exception:
        return None
    if len(_NUM_ROWS) > 512:
        _NUM_ROWS.clear()
    _NUM_ROWS[key] = (sig, total)
    return total


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of a base table — parquet footer metadata when possible
    (no job), ``count()`` otherwise."""
    n = parquet_num_rows(os.path.join(sf_dir, f"{name}.parquet"))
    if n is not None:
        return n
    return load_table(spark, sf_dir, name).count()


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
