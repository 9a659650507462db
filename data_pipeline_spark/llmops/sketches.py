"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The third sketch scale path (after HLL distinct counts and GK quantiles,
queries_llm.py): finding frequent tokens/n-grams/URLs over a 100 TB corpus
without shuffling the full (item, count) space.  Per-partition Misra-Gries
summaries of capacity k are built inside one mapInPandas pass (the
iterator spans the whole partition, so exactly one summary per partition
and the item stream never shuffles); the partials — at most k rows per
partition — are merged with the mergeable-summaries reduction (Agarwal,
Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012,
public literature): sum matching counters, subtract the (k+1)-th largest
merged weight, keep positive.

Guarantees (held under ANY merge tree, so partitioning cannot break them):
- every item with true frequency > n / (k+1) appears in the output;
- reported weights are lower bounds, within n / (k+1) of the true count.

In the k >= |distinct items| limit no counter is ever pruned and the
output equals the exact GROUP BY — the oracle-paired exact configuration,
same certification pattern as ivf_exact_topk / lsh_exact_neardup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("weight", LongType()),
    ]
)


def _prune(counters: dict, k: int) -> None:
    """One mergeable-summaries reduction step: subtract the (k+1)-th
    largest counter from everything and drop the non-positive — capacity
    returns to <= k, total undercount grows by <= d per surviving item."""
    if len(counters) <= k:
        return
    d = sorted(counters.values(), reverse=True)[k]
    for it in list(counters):
        w = counters[it] - d
        if w > 0:
            counters[it] = w
        else:
            del counters[it]


def misra_gries_heavy_hitters(
    df: DataFrame, item_col: str, k: int = 50
) -> DataFrame:
    """(item, weight) lower-bound frequencies of the <= k heaviest items.

    Batch updates are vectorized (pandas value_counts per Arrow batch,
    dict merge, prune) — the per-item Python touches at most
    |batch-distinct| + k entries, never the row count.  The only shuffle
    carries <= k rows per partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            _prune(counters, k)
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    # contract: NULL items are excluded up front (value_counts would drop
    # them silently inside the kernel; making it a Spark-side filter keeps
    # the k >= |distinct| exact-GROUP-BY equivalence well-defined — the
    # matching SQL oracle carries WHERE item IS NOT NULL)
    partials = df.select(
        F.col(item_col).cast("string").alias(item_col)
    ).filter(F.col(item_col).isNotNull()).mapInPandas(
        run, schema=_SUMMARY_SCHEMA
    )
    return mg_merge(partials, k)


def mg_merge(partials: DataFrame, k: int) -> DataFrame:
    """Merge Misra-Gries partial summaries — (item, weight) rows from any
    number of capacity-k sketches — with the mergeable-summaries
    reduction: sum matching counters, subtract the (k+1)-th largest
    merged weight, keep positive.  The n/(k+1) guarantee composes under
    ANY merge tree (partition fan-in, per-trigger accumulation), which is
    what makes the streaming sink's per-batch partials safe to fold."""
    merged = partials.groupBy("item").agg(F.sum("weight").alias("weight"))
    # final reduction: d = the (k+1)-th largest merged weight (0 when the
    # merge already fits) via a top-(k+1) limit — no global window
    d = (
        merged.orderBy(F.col("weight").desc(), F.col("item"))
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) > F.lit(k), F.min("weight"))
            .otherwise(F.lit(0))
            .alias("d")
        )
    )
    return (
        merged.crossJoin(F.broadcast(d))
        .select("item", (F.col("weight") - F.col("d")).alias("weight"))
        .filter(F.col("weight") > 0)
    )


def misra_gries_by_group(
    df: DataFrame, group_col: str, item_col: str, k: int = 20
) -> DataFrame:
    """(group, item, weight): per-GROUP heavy hitters — frequent URLs per
    language, top n-grams per source, etc.

    Same two-phase shape as the global sketch, keyed: the partition pass
    keeps one capacity-k Misra-Gries summary PER GROUP seen in that
    partition (state is O(groups-per-partition x k), independent of row
    count), the partials merge per (group, item), and the final reduction
    subtracts each group's (k+1)-th largest merged weight via one ranked
    window over the tiny partial set.  The n/(k+1) guarantee holds per
    group with n = that group's item count."""
    from pyspark.sql import Window

    schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("item", StringType()),
            StructField("weight", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        per_group: dict = {}
        for pdf in batches:
            counts = pdf.groupby("grp")["it"].value_counts()
            for (g, item), cnt in counts.items():
                counters = per_group.setdefault(g, {})
                counters[item] = counters.get(item, 0) + int(cnt)
            for counters in per_group.values():
                _prune(counters, k)
        yield pd.DataFrame(
            [
                {"grp": g, "item": it, "weight": w}
                for g, counters in per_group.items()
                for it, w in counters.items()
            ],
            columns=["grp", "item", "weight"],
        )

    # same NULL contract as the global sketch: null groups and null items
    # are excluded explicitly (pandas groupby/value_counts would drop them
    # silently; a SQL oracle keeps NULL groups, so pin the divergence here)
    prepared = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(item_col).cast("string").alias("it"),
    ).filter(F.col("grp").isNotNull() & F.col("it").isNotNull())
    partials = prepared.mapInPandas(run, schema=schema)
    merged = partials.groupBy("grp", "item").agg(F.sum("weight").alias("weight"))
    w_rank = Window.partitionBy("grp").orderBy(
        F.col("weight").desc(), F.col("item")
    )
    ranked = merged.withColumn("rn", F.row_number().over(w_rank))
    d = (
        ranked.filter(F.col("rn") == k + 1)
        .select("grp", F.col("weight").alias("d"))
    )
    return (
        ranked.join(d, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "item",
            (F.col("weight") - F.coalesce(F.col("d"), F.lit(0))).alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public literature): a
# depth x width counter matrix; item increments one slot per row via
# independent hashes, point estimate = MIN over rows.  CM is LINEAR, so
# the distributed build is trivially exact: per-partition matrices sum
# elementwise — any merge tree yields the same sketch as a single pass.
# Estimates only ever OVERCOUNT (each slot holds true count + collisions),
# and E[overcount per row] = (N - n_item) / width, so the min over depth
# rows concentrates sharply (Markov^depth).
# ---------------------------------------------------------------------------

_CMS_SCHEMA = StructType(
    [
        StructField("d", LongType()),
        StructField("slot", LongType()),
        StructField("cnt", LongType()),
    ]
)


def _cms_slot(item_col, d: int, width: int):
    """Row-d slot of an item: xxhash64 with the row index as seed, same
    expression on the build and query sides so estimates line up."""
    return F.pmod(F.xxhash64(item_col, F.lit(d)), F.lit(width)).cast("long")


def count_min_sketch(
    df: DataFrame, item_col: str, width: int = 2048, depth: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """(d, slot, cnt) sparse Count-Min sketch of an item stream.

    Build is pure DataFrame ops: derive the depth slot columns in codegen,
    explode to (d, slot), one partial-aggregated groupBy — the shuffle
    carries at most depth * width rows per partition regardless of stream
    size (map-side combine collapses to slot space).  NULL items are
    excluded explicitly (same contract as the other sketches).

    ``weight_col``: build from a PRE-AGGREGATED (item, count) frame —
    CMS counters are additive, so summing per-item counts into slots is
    exactly the sketch of the underlying stream (r12 opt: lets callers
    that also need exact per-item counts share ONE pass over the corpus
    instead of re-scanning it per consumer)."""
    slots = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("d"),
                _cms_slot(F.col(item_col), d, width).alias("slot"),
            )
            for d in range(depth)
        ]
    )
    cols = [F.col(item_col).alias("item")]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    agg = (
        F.sum("_w").alias("cnt")
        if weight_col is not None
        else F.count(F.lit(1)).alias("cnt")
    )
    slotted = (
        df.select(*cols)
        .filter(F.col("item").isNotNull())
        .select(F.explode(slots).alias("s"), *(
            [F.col("_w")] if weight_col is not None else []
        ))
    )
    return (
        slotted.groupBy(F.col("s.d").alias("d"), F.col("s.slot").alias("slot"))
        .agg(agg)
    )


def cms_estimates(
    sketch: DataFrame, items: DataFrame, item_col: str,
    width: int = 2048, depth: int = 5,
) -> DataFrame:
    """Point-estimate each item in ``items`` against a built sketch:
    derive the item's depth slots, broadcast-join the (small, <=
    depth * width rows) sketch, MIN over rows.  A slot never touched by
    any stream item is absent from the sparse sketch = count 0."""
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d"),
                        _cms_slot(F.col(item_col), d, width).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select("item", F.col("s.d").alias("d"), F.col("s.slot").alias("slot"))
    est = (
        probes.join(F.broadcast(sketch), ["d", "slot"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    return est
