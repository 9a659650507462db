"""Bloom filter membership sketch: distributed build, broadcast probe.

Public literature: Bloom (CACM 1970) for the filter itself; Kirsch &
Mitzenmacher ("Less Hashing, Same Performance", ESA 2006) for deriving the
k probe positions from two base hashes — g_i = h1 + i * h2 (mod m) keeps
the standard false-positive asymptotics with exactly two hash evaluations
per item.

Role in the engine: the decontamination / blocklist primitive at 100 TB.
``decontaminate`` (dedup.py) broadcasts the eval side's DISTINCT SHINGLE
STRINGS — fine for benchmark-sized eval sets, but a large blocklist (every
n-gram of a 10 GB eval corpus, a billion-entry URL denylist) does not fit
in an exact broadcast.  A Bloom filter compresses the member set to
~1.44 * log2(1/p) bits per element (~10 bits/element at p=1%%, a 10-50x
reduction over the strings), and its one-sided error makes the classic
two-phase plan EXACT: because a Bloom filter has NO FALSE NEGATIVES,

    bloom-prefilter (map-side, broadcast bitmap)
      -> exact verify of the tiny surviving minority (broadcast semi-join)

is result-identical to the exact join — the false positives are removed by
the verify phase and nothing else can differ.  That identity is what the
``bloom_prefilter_decontamination`` catalog query certifies against the
plain exact-SQL oracle (same pattern as the ANN/sketch exactness
certificates: a non-approximate CONFIGURATION of an approximate structure,
driver-hash-verified).

Scale shape:
- build: k bit positions per item are derived in codegen (two xxhash64
  calls, KM double hashing), exploded, and collapsed by one map-side-
  combined groupBy — the shuffle carries at most min(n*k, m) distinct
  positions per partition, never the item stream;
- pack: each (coalesced) partition packs its positions into an m/8-byte
  bitmap inside one mapInPandas pass and the driver ORs a handful of
  bitmaps (bounded by the coalesce width, not the data);
- probe: the bitmap broadcasts once; probe positions are derived in the
  same codegen expressions and tested against the bitmap by a vectorized
  pandas UDF — no Python hashing, no shuffle of the probed stream.

Reference parity note: the reference pipeline has no membership sketch;
this is part of the beyond-reference LLM-data-pipeline surface (same
family as dedup gates and decontamination, data_pipeline/ has the
wire-format analogues only).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# seed for the second base hash; any constant distinct from xxhash64's
# default seed (42) works — pinned so build and probe always agree
_H2_SEED = 0x9E3779B9


def _bit_positions(item: Column, m_bits: int, k: int) -> list[Column]:
    """The k probe positions of an item, as codegen-only long columns.

    KM double hashing: h2 is forced into [1, m-1] so the k probes never
    collapse onto a single position (h2 = 0 would make every g_i equal).
    All arithmetic stays below 2^63 for m_bits <= 2^31 and k in the tens,
    so the pmod chain is overflow-safe without ANSI concerns.
    """
    h1 = F.pmod(F.xxhash64(item), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(item, F.lit(_H2_SEED)), F.lit(m_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_bits(
    df: DataFrame, item_col: str, m_bits: int, k: int
) -> DataFrame:
    """(bit) — the DISTINCT set-bit positions of the filter over a member
    stream.  NULL members are excluded explicitly (same contract as the
    other sketches).  Because the output is a set, the build is trivially
    mergeable: bits(A union B) == bits(A) union bits(B), and any
    partitioning yields the same filter.
    """
    pos = F.array(*_bit_positions(F.col("item"), m_bits, k))
    return (
        df.select(F.col(item_col).alias("item"))
        .filter(F.col("item").isNotNull())
        .select(F.explode(pos).alias("bit"))
        .groupBy("bit")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("bit")
    )


def bloom_bitmap(bits: DataFrame, m_bits: int, pack_partitions: int = 8) -> bytes:
    """Pack a set-bit-position frame into the broadcastable m/8-byte bitmap.

    Each coalesced partition packs inside one mapInPandas pass and yields
    ONE bitmap row; the driver ORs at most ``pack_partitions`` bitmaps —
    driver memory is pack_partitions * m/8 bytes regardless of member
    count.  (np.bitwise_or.at handles duplicate positions inside a batch.)
    """
    nbytes = (m_bits + 7) // 8

    def pack(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if pdf.empty:
                continue
            pos = pdf["bit"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(
                bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
            )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    rows = bits.coalesce(pack_partitions).mapInPandas(
        pack, schema="bm binary"
    ).collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r.bm, dtype=np.uint8)
    return out.tobytes()


def bloom_build(
    df: DataFrame, item_col: str, m_bits: int, k: int
) -> bytes:
    """Convenience: distributed build straight to the packed bitmap."""
    return bloom_bitmap(bloom_bits(df, item_col, m_bits, k), m_bits)


def bloom_maybe_contains(
    df: DataFrame,
    item_col: str,
    bitmap: bytes,
    m_bits: int,
    k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """df + a boolean ``out_col``: True iff ALL k probe bits are set —
    i.e. "maybe a member" (false positives possible at the designed rate,
    false negatives impossible).

    The probe positions are computed by the SAME codegen expressions as
    the build (no Python hashing, so build/probe parity is structural);
    the pandas UDF only indexes the broadcast bitmap, vectorized over the
    whole Arrow batch.  NULL items probe to NULL.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.frombuffer(bitmap, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def probe(pos_col: pd.Series) -> pd.Series:
        bm = bc.value
        if len(pos_col) == 0:
            return pd.Series([], dtype="boolean")
        pos = np.vstack(pos_col.to_numpy())  # (rows, k), all arrays length k
        hit = ((bm[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
        return pd.Series(hit)

    pos = F.array(*_bit_positions(F.col(item_col), m_bits, k))
    return df.withColumn(
        out_col,
        F.when(F.col(item_col).isNotNull(), probe(pos)),
    )


def optimal_params(n_items: int, fp_rate: float) -> tuple[int, int]:
    """Textbook sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2."""
    m = max(64, int(math.ceil(-n_items * math.log(fp_rate) / math.log(2) ** 2)))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def expected_fp_rate(n_items: int, m_bits: int, k: int) -> float:
    """(1 - e^{-kn/m})^k — the standard Bloom false-positive estimate."""
    return (1.0 - math.exp(-k * n_items / m_bits)) ** k


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact decontamination through a Bloom prefilter — result-identical
    to ``dedup.decontaminate`` (one-sided error + exact verify), but the
    map-side gate is an m/8-byte bitmap instead of the eval side's full
    distinct-shingle string set.

    Two-phase plan: (1) the corpus shingle stream is filtered by the
    broadcast bitmap in a vectorized probe — no shuffle, and at the
    designed fp rate only true hits plus ~p of the stream survive; (2) the
    tiny survivor set is verified exactly against the broadcast eval
    shingle set (semi-join), which removes every false positive.  The
    groupBy(id) then counts DISTINCT shared shingles exactly as the plain
    exact path does.
    """
    from data_pipeline_spark.llmops.dedup import shingles

    # benchmark-sized by contract; materialize once — the frame feeds two
    # consumers (the bitmap-build action and the exact-verify broadcast),
    # which would otherwise each re-run the eval shingle pipeline
    e_sh = (
        shingles(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=False)
    )
    bitmap = bloom_build(e_sh, "shingle", m_bits, k)

    t_sh = shingles(train, id_col, text_col, n)
    survivors = bloom_maybe_contains(
        t_sh, "shingle", bitmap, m_bits, k
    ).filter(F.col("bloom_hit"))
    verified = survivors.join(F.broadcast(e_sh), "shingle", "left_semi")
    return verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shared_shingles")
    )
