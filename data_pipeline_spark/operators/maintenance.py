"""Table maintenance: small-file compaction for parquet directories.

The small-files problem is the quiet killer of 100 TB scans: a streaming
sink or over-parallel write that leaves millions of KB-scale files makes
every later query pay file-listing latency and one task per file, and
starves parquet of row-group-sized units its min/max stats can prune.
``compact_small_files`` rewrites a directory into size-targeted files —
optionally range-sorted so footer stats become disjoint and prunable —
the OPTIMIZE/compaction maintenance job every table format runs, built
from plain Spark primitives.

Commit protocol: the rewrite lands in a sibling temp directory and is
swapped in via rename (old -> .bak -> delete).  Rename of a directory is
atomic on a POSIX filesystem but the two-step swap leaves a short window
with no directory present; a production table format closes it with a
manifest/ledger commit — exactly what streaming/ingest.py's per-writer
ledger does for the dedup corpus (the in-repo precedent).  Readers that
hold an already-planned DataFrame are unaffected (they pinned the old
file list); new planners see either old or new, never a mix.
"""

from __future__ import annotations

import pathlib
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
    zorder_cols: list | None = None,
) -> dict:
    """Rewrite a parquet dir into ~total/target_bytes files; returns stats.

    With ``sort_col`` the rewrite is repartitionByRange + sortWithin, so
    each output file covers a disjoint key range (footer-prunable); with
    ``zorder_cols`` (mutually exclusive) it range-partitions and sorts on
    the Morton key over those dimensions, so footer stats prune on EVERY
    queried dimension — the OPTIMIZE ZORDER maintenance job, composing
    the streaming sink's time-ordered small files into an
    analytics-ready layout in one pass; without either, a plain
    repartition balances sizes.
    """
    if sort_col is not None and zorder_cols:
        raise ValueError("sort_col and zorder_cols are mutually exclusive")
    p = pathlib.Path(path)
    files = [f for f in p.glob("*.parquet")]
    bytes_before = sum(f.stat().st_size for f in files)
    n_out = max(1, -(-bytes_before // target_bytes))

    df = spark.read.parquet(str(p))
    rows_before = df.count()
    tmp = p.with_name(f"{p.name}__compact_{uuid.uuid4().hex[:8]}")
    bak = p.with_name(f"{p.name}__bak_{uuid.uuid4().hex[:8]}")
    try:
        if zorder_cols:
            from data_pipeline_spark.operators.zorder import zorder_key

            writer = (
                zorder_key(df, list(zorder_cols))
                .repartitionByRange(n_out, "zkey")
                .sortWithinPartitions("zkey")
                .drop("zkey")
            )
        elif sort_col is not None:
            writer = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(
                sort_col
            )
        else:
            writer = df.repartition(n_out)
        writer.write.mode("overwrite").parquet(str(tmp))

        # validate the rewrite BEFORE touching the original: the swap only
        # proceeds once the temp dir demonstrably holds all the rows
        rows_after = spark.read.parquet(str(tmp)).count()
        if rows_after != rows_before:
            raise RuntimeError(
                f"compaction rewrite row-count mismatch at {tmp}: "
                f"{rows_after} != {rows_before}; original left untouched"
            )
        p.rename(bak)
        try:
            tmp.rename(p)
        except BaseException:
            bak.rename(p)  # restore the original under its real name
            raise
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # don't leak the temp dir
        raise
    shutil.rmtree(bak)
    return {
        "files_before": len(files),
        "files_after": len(list(p.glob("*.parquet"))),
        "rows": rows_before,
        "bytes": bytes_before,
        "target_bytes": target_bytes,
    }
