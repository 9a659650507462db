"""Text analysis over a document corpus: tokenization, counting, quality
scoring, language-ID, fingerprinting.

All pure column expressions (split/filter/transform lambdas run in the JVM),
so at 100 TB this is a single scan with full codegen — no shuffle at all for
per-document outputs.
"""

from __future__ import annotations

import pandas as pd  # used by the nfc() pandas UDF's lazy type hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word sets for the n-gram/stopword heuristic.
# Deliberately small and hash-free so the SQL oracle states the same sets.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "y"),
}

_WS = " "  # corpus is single-space tokenized; swap for r"\s+" regex corpora


def tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, _WS)


# SQL-text twins (r12 opt): the Column-DSL zip_with chain in word_ngrams
# costs ~20 ms of py4j roundtrips per lambda per construction; composing
# the SAME expression as SQL text parses in one F.expr call with an
# identical analyzed tree (schema- and value-identical, pinned by
# tests/test_llmops.py::test_word_ngrams_sql_twin_bit_identical).

def tokens_sql(col: str) -> str:
    return f"split({col}, '{_WS}')"


def word_ngrams_sql(toks: str, n: int) -> str:
    """SQL fragment form of ``word_ngrams`` over a token-array fragment."""
    cnt = f"(size({toks}) - {n - 1})"
    grams = f"slice({toks}, 1, {cnt})"
    for k in range(2, n + 1):
        grams = (
            f"zip_with({grams}, slice({toks}, {k}, {cnt}), "
            f"(_wa, _wb) -> concat_ws(' ', _wa, _wb))"
        )
    return (
        f"CASE WHEN size({toks}) >= {n} THEN {grams} "
        f"ELSE cast(array() as array<string>) END"
    )


def token_count(text: str | Column) -> Column:
    """``size(tokens(text))`` WITHOUT materializing the token array.

    Under the single-space tokenizer contract (``_WS == " "``, split
    keeps empties) the token count is spaces + 1 IDENTICALLY — NULL text
    is NULL through both forms — so one ``replace()`` + two ``length()``
    calls replace the regex split + per-token string allocation that
    otherwise dominates count-only corpus scans (r12 batch 10 measured
    the predicate form 22% faster on the duplicate-rate probe's map
    stage; pinned row-for-row by
    tests/test_llmops.py::test_token_count_equals_size_tokens).  A
    regex-``_WS`` corpus falls back to the literal form.
    """
    if _WS != " ":  # pragma: no cover - regex-tokenizer fallback
        return F.size(tokens(text))
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.replace(c, F.lit(_WS))) + F.lit(1)


def first_token(text: str | Column) -> Column:
    """``tokens(text)[0]`` WITHOUT materializing the token array.

    Under the single-space tokenizer contract the first token is the
    prefix before the first space — ``substring_index(text, ' ', 1)``
    reproduces ``element_at(split(text, ' '), 1)`` for EVERY string
    (no-space text returns the whole string, leading-space text returns
    '', NULL propagates; pinned row-for-row by
    tests/test_llmops.py::test_first_token_equals_tokens_head).  A
    regex-``_WS`` corpus falls back to the literal form.
    """
    if _WS != " ":  # pragma: no cover - regex-tokenizer fallback
        return F.element_at(tokens(text), 1)
    c = F.col(text) if isinstance(text, str) else text
    return F.substring_index(c, _WS, 1)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings, LINEAR in
    document length: zip_with over n shifted slices.  The obvious
    ``transform(sequence(...), i -> slice(toks, i, n))`` is O(len) per
    element — quadratic per document, which a 100k-token document turns
    into a stall (measured 2.3x slower even on ~150-token docs).  Each
    shifted slice has exactly ``size - n + 1`` elements under the length
    guard, so zip_with never null-pads."""
    cnt = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, cnt)
    for k in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(toks, k, cnt), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_hits(text: str | Column, lang: str = "en") -> Column:
    """Occurrences (not distinct) of the language's function words."""
    stops = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stops)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token count, distinct-token ratio,
    mean token length, stopword ratio — the standard cheap filters a
    pretraining pipeline applies before anything expensive."""
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    return df.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.size(F.array_distinct(toks)) / n).alias("distinct_ratio"),
        ((F.length(F.col(text_col)) - (F.size(toks) - 1)) / n).alias("avg_token_len"),
        (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))) / n).alias(
            "stopword_ratio"
        ),
    )


def quality_score() -> Column:
    """Scalar quality score over ``quality_features`` output: rewards
    vocabulary diversity and natural stopword density.  Fixed double
    arithmetic order => reproducible bit-for-bit in any engine."""
    return (
        F.col("distinct_ratio") * 0.5
        + F.col("stopword_ratio") * 0.3
        + (F.least(F.col("n_tokens").cast("double"), F.lit(100.0)) / 100.0) * 0.2
    )


def lang_scores(text: str | Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]


def lang_id(text: str | Column) -> Column:
    """Function-word-ratio language ID: the language whose stopword set hits
    most tokens wins; ties break lexicographically; zero hits => 'und'
    (ISO 639-3 undetermined)."""
    scores = lang_scores(text)
    best_score = F.greatest(*[s for _, s in scores])
    # lexicographic-first argmax: coalesce of when-chains in sorted order
    pred = F.lit("und")
    for lang, score in reversed(scores):
        pred = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(
            pred
        )
    return pred


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Two document fingerprints: raw md5 (exact-dup key) and a content
    fingerprint over the sorted distinct token set (order/robustness-
    normalized — catches shuffled copies)."""
    toks = tokens(text_col)
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("doc_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "content_fp"
        ),
    )


# GPT-2-style pre-tokenizer, restricted to constructs Java regex and RE2
# interpret identically (no \p classes, no lookarounds): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_ish_tokens(text: str | Column) -> Column:
    """Subword-style pre-tokenization via regexp_extract_all — the token
    count a BPE tokenizer would start from (each pre-token splits further
    into >=1 BPE pieces, so this lower-bounds and tracks token budget).
    Stays in codegen: no Python in the row path."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def nfc(col: str | Column) -> Column:
    """Unicode NFC normalization (canonical composition).  Spark has no
    built-in normalizer expression, so this is one of the repo's few
    sanctioned Python steps: an Arrow-batched pandas UDF over the string
    column (vectorized transfer, ~constant per-batch overhead) — never a
    row-at-a-time F.udf.  unicodedata.normalize is the same Unicode NFC
    the SQL oracle's nfc_normalize() implements, so outputs match
    bit-for-bit.  Reference behavior: the wire pipeline stores text
    fields un-normalized (data_pipeline/message.py keeps payloads as
    given); normalization here is the pretraining-corpus step."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


def normalize_text(col: str | Column) -> Column:
    """The standard pre-tokenization cleanup: NFC-compose, strip C0/DEL
    control characters, collapse runs of whitespace to one space, trim.
    Order matters and is part of the contract: NFC first (so combining
    marks join their base before anything is measured), control strip
    second (removes \\t \\n \\r \\x0b too — both engines' regex classes
    agree on the explicit [\\x00-\\x1f\\x7f] range, sidestepping the
    Java-vs-RE2 \\s divergence), whitespace collapse third (only plain
    spaces survive the strip), trim last.  Everything after the NFC UDF
    stays in JVM codegen."""
    out = nfc(col)
    out = F.regexp_replace(out, "[\\x00-\\x1f\\x7f]", "")
    out = F.regexp_replace(out, " +", " ")
    return F.trim(out)
