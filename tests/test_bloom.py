"""Bloom filter: no false negatives, fp rate near theory, mergeability,
partitioning invariance, and the prefilter == exact identity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark.llmops import bloom
from tests.conftest import SF_SMOKE

M, K = 1 << 16, 5


def _members(spark, n=2000, prefix="member"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("item")
    )


def test_bloom_no_false_negatives(spark):
    members = _members(spark)
    bitmap = bloom.bloom_build(members, "item", M, K)
    probed = bloom.bloom_maybe_contains(members, "item", bitmap, M, K)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_fp_rate_near_theory(spark):
    n = 2000
    members = _members(spark, n)
    bitmap = bloom.bloom_build(members, "item", M, K)
    non_members = _members(spark, 20000, prefix="other")
    hits = (
        bloom.bloom_maybe_contains(non_members, "item", bitmap, M, K)
        .filter(F.col("bloom_hit"))
        .count()
    )
    p = bloom.expected_fp_rate(n, M, K)
    observed = hits / 20000
    # one-sided sanity: the deterministic hash family should not blow past
    # 3x the textbook estimate (p ~ 5e-4 here, so 3x is a wide margin)
    assert observed <= 3 * p + 1e-3


def test_bloom_union_is_or(spark):
    a = _members(spark, 500, "a")
    b = _members(spark, 500, "b")
    bits_union = bloom.bloom_bits(a.union(b), "item", M, K)
    bits_or = (
        bloom.bloom_bits(a, "item", M, K)
        .union(bloom.bloom_bits(b, "item", M, K))
        .distinct()
    )
    assert bits_union.exceptAll(bits_or).count() == 0
    assert bits_or.exceptAll(bits_union).count() == 0


def test_bloom_bitmap_partitioning_invariant(spark):
    members = _members(spark, 3000)
    bm1 = bloom.bloom_build(members.repartition(1), "item", M, K)
    bm2 = bloom.bloom_build(members.repartition(17), "item", M, K)
    assert bm1 == bm2


def test_bloom_null_contract(spark):
    members = _members(spark, 100)
    with_null = members.union(
        spark.range(1).select(F.lit(None).cast("string").alias("item"))
    )
    bitmap = bloom.bloom_build(with_null, "item", M, K)
    assert bitmap == bloom.bloom_build(members, "item", M, K)
    probed = bloom.bloom_maybe_contains(with_null, "item", bitmap, M, K)
    assert probed.filter(F.col("item").isNull()).select("bloom_hit").first()[
        0
    ] is None


def test_bloom_empty_member_set(spark):
    empty = _members(spark, 0)
    bitmap = bloom.bloom_build(empty, "item", M, K)
    assert bitmap == b"\x00" * (M // 8)
    probed = bloom.bloom_maybe_contains(
        _members(spark, 50), "item", bitmap, M, K
    )
    assert probed.filter(F.col("bloom_hit")).count() == 0


def test_bloom_prefilter_equals_exact_decontaminate(spark):
    from data_pipeline_spark.io import load_table
    from data_pipeline_spark.llmops import dedup as ld

    docs = load_table(spark, SF_SMOKE, "documents")
    eval_df = docs.filter(F.col("doc_id") % 89 == 0)
    train = docs.filter(F.col("doc_id") % 89 != 0)
    exact = ld.decontaminate(train, eval_df, "doc_id", "text", n=5)
    via_bloom = bloom.bloom_decontaminate(
        train, eval_df, "doc_id", "text", n=5, m_bits=1 << 18, k=5
    )
    assert via_bloom.exceptAll(exact).count() == 0
    assert exact.exceptAll(via_bloom).count() == 0
    assert exact.count() > 0  # fixture actually exercises the path


@pytest.mark.parametrize("n,p", [(10_000, 0.01), (1_000_000, 0.001)])
def test_optimal_params_sizing(n, p):
    m, k = bloom.optimal_params(n, p)
    assert bloom.expected_fp_rate(n, m, k) <= p * 1.1


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis) properties — colocated with the
# other sampling/sketch primitives added this round
# ---------------------------------------------------------------------------


def test_weighted_sample_favors_heavy_items(spark):
    """A-ES inclusion shares track weights: items with weight 9 should take
    roughly 9x the slots of weight-1 items in the top-k (bounded loosely —
    the draw is deterministic but the bound holds by construction)."""
    from pyspark.sql import functions as F

    df = spark.range(20000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 1, 9).otherwise(1).alias("w"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    top = df.orderBy((F.log(u) / F.col("w")).desc(), "id").limit(1000)
    odd_share = top.filter(F.col("id") % 2 == 1).count() / 1000
    assert 0.75 <= odd_share <= 0.95  # ~0.9 expected at w-ratio 9:1


def test_weighted_sample_plan_is_topk(spark):
    """The catalog query must run as TakeOrderedAndProject (per-partition
    top-k + k-row merge), not a global sort shuffle."""
    import contextlib
    import io

    import data_pipeline_spark.queries_llm  # noqa: F401  (registers)
    from data_pipeline_spark.queries import QUERIES

    df = QUERIES["weighted_sample_topk"].spark(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()
