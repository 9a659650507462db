"""Semantic tests for the r10 text-pipeline additions: Unicode
normalization, Gopher quality rules, per-domain quota sampling.

The catalog queries themselves are oracle-compared by test_correctness;
these tests pin the SEMANTICS against independent pure-Python
recomputation and the naive single-stage formulations.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

import data_pipeline_spark.queries_llm  # noqa: F401  (registers LLM ops)
from data_pipeline_spark.llmops import textstats
from data_pipeline_spark.queries import QUERIES

from tests.conftest import SF_SMOKE


def test_normalize_text_semantics(spark):
    """NFC compose + control strip + whitespace collapse + trim, with
    NULL passthrough — checked against unicodedata on crafted rows."""
    rows = [
        Row(id=1, t="café latte"),          # decomposed -> composed
        Row(id=2, t="café latte"),           # already composed
        Row(id=3, t=" a\x07b\x00c  d\te\nf  "),   # controls + runs + trim
        Row(id=4, t=None),
        Row(id=5, t=""),
        Row(id=6, t="\x07\x1f\x7f"),              # controls only -> empty
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.id: r.n
        for r in df.select("id", textstats.normalize_text("t").alias("n")).collect()
    }
    assert out[1] == out[2] == "café latte"
    assert len(out[1]) == 10  # composed: one code point for é
    # controls vanish entirely (\t and \n are C0 controls, stripped, so
    # 'd','e','f' fuse — the documented order-of-operations contract)
    assert out[3] == "abc def"
    assert out[4] is None
    assert out[5] == ""
    assert out[6] == ""
    # idempotence on already-clean text
    assert (
        df.filter("id = 1")
        .select(textstats.normalize_text(textstats.normalize_text("t")).alias("n"))
        .collect()[0]
        .n
        == "café latte"
    )


def test_nfc_matches_unicodedata(spark):
    """The UDF is exactly unicodedata NFC on a composition torture set."""
    cases = [
        "Å",            # A + ring -> Å
        "Å",             # Å composed
        "Å",             # ANGSTROM SIGN -> NFC canonicalizes to Å
        "q̣̇",      # combining reorder case
        "가",             # precomposed Hangul
        "가",       # Hangul jamo -> composes
        "ascii only",
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(cases)])
    got = {
        r.i: r.n for r in df.select("i", textstats.nfc("t").alias("n")).collect()
    }
    for i, t in enumerate(cases):
        assert got[i] == unicodedata.normalize("NFC", t), repr(t)


def _python_gopher(doc_id: int, text: str):
    words = text.split(" ")
    lines = [
        " ".join(words[i * 8 : i * 8 + 8])
        for i in range((len(words) - 1) // 8 + 1)
    ]
    if doc_id % 3 == 0:
        lines.append(lines[0])
    if doc_id % 4 == 0:
        lines.append("- " + words[0])
    if doc_id % 5 == 0:
        lines.append("and more...")
    n_words = len(words)
    mwl = (len(text) - (n_words - 1)) / n_words
    nl = len(lines)
    dup = (nl - len(set(lines))) / nl
    bul = sum(1 for x in lines if x.startswith("- ")) / nl
    ell = sum(1 for x in lines if x.endswith("...")) / nl
    keep = (
        50 <= n_words <= 100000
        and 3.0 <= mwl <= 10.0
        and dup <= 0.30
        and bul <= 0.90
        and ell <= 0.30
    )
    return n_words, mwl, nl, dup, bul, ell, keep


def test_gopher_flags_match_python_recompute(spark):
    """Every sf0.001 row's rule metrics + keep decision equal an
    independent pure-Python evaluation of the same rules."""
    out = QUERIES["gopher_quality_flags"].spark(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(out) == len(docs)
    fired = {"dup": 0, "bul": 0, "ell": 0, "wc": 0}
    for r in out:
        n_words, mwl, nl, dup, bul, ell, keep = _python_gopher(
            r.doc_id, docs[r.doc_id]
        )
        assert r.n_words == n_words
        assert abs(r.mean_word_len - mwl) < 1e-12
        assert r.n_lines == nl
        assert abs(r.dup_line_frac - dup) < 1e-12
        assert abs(r.bullet_line_frac - bul) < 1e-12
        assert abs(r.ellipsis_line_frac - ell) < 1e-12
        assert r.keep == keep
        fired["dup"] += not r.flag_dup_lines
        fired["bul"] += not r.flag_bullet_lines
        fired["ell"] += not r.flag_ellipsis_lines
        fired["wc"] += not r.flag_word_count
    # the planted triggers make at least the dup/ellipsis/word-count
    # rules fire differentially (not all-pass, not all-fail)
    assert 0 < fired["wc"] < len(out)
    assert fired["dup"] > 0 and fired["ell"] > 0
    keeps = sum(1 for r in out if r.keep)
    assert 0 < keeps < len(out)


def test_domain_quota_two_stage_equals_naive(spark):
    """The salted two-stage top-N is bit-identical to the naive global
    window, per-source counts are capped, and ranks are 1..cap."""
    out = QUERIES["domain_quota_sample"].spark(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        docs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 15)
        .select("source", "doc_id", "rk")
    )
    got = {(r.source, r.doc_id, r.rk) for r in out.collect()}
    want = {(r.source, r.doc_id, r.rk) for r in naive.collect()}
    assert got == want
    per = {}
    for s, _, rk in got:
        per.setdefault(s, []).append(rk)
    for s, rks in per.items():
        assert len(rks) <= 15
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_normalize_text_matches_python_reference_torture(spark):
    """One Spark job over ~300 deterministic torture strings (every C0
    control, DEL, NFC/NFD pairs, combining reordering, Hangul jamo,
    astral-plane chars, whitespace runs, seeded random unicode) — the
    Spark pipeline (pandas-UDF NFC + JVM regex strip/collapse/trim)
    must equal an independent pure-Python reference everywhere, be
    idempotent, and emit no control characters."""
    import random
    import re as _re

    def ref(t):
        if t is None:
            return None
        t = unicodedata.normalize("NFC", t)
        t = _re.sub("[\x00-\x1f\x7f]", "", t)
        t = _re.sub(" +", " ", t)
        return t.strip(" ")

    cases = []
    for c in range(0x20):  # every C0 control embedded mid-word
        cases.append(f"a{chr(c)}b  c")
    cases += [
        "\x7f", "a\x7fb", "  lead", "trail  ", "a  b   c    d",
        "café vs café", "q̣̇ reorder",
        "가 jamo", "가 syllable", "Å angstrom",
        "\U0001F600 astral \U00010400", "mixed \t\n\r\x0b ws",
        "", " ", "  ", "́lead-combining",
    ]
    rng = random.Random(42)
    pool = (
        [chr(i) for i in range(0x20, 0x7F)]
        + ["é", "é", "́", "Å", "가", "ᄀ",
           "ᅡ", "\U0001F600", "\x07", "\x1f", "\x7f", " ", "  "]
    )
    for _ in range(250):
        cases.append("".join(rng.choice(pool) for _ in range(rng.randint(0, 40))))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id LONG, t STRING"
    )
    out = {
        r.id: r.n
        for r in df.select(
            "id", textstats.normalize_text("t").alias("n")
        ).collect()
    }
    n2 = {
        r.id: r.n2
        for r in df.select(
            "id",
            textstats.normalize_text(textstats.normalize_text("t")).alias("n2"),
        ).collect()
    }
    for i, t in enumerate(cases):
        want = ref(t)
        assert out[i] == want, (i, repr(t), repr(out[i]), repr(want))
        assert n2[i] == out[i], (i, repr(t))  # idempotent
        assert not _re.search("[\x00-\x1f\x7f]", out[i]), (i, repr(out[i]))
        assert out[i] == unicodedata.normalize("NFC", out[i]), (i,)
