"""Linear text classification and document scrubbing for training-data
pipelines.

``hashed_linear_score`` is the fasttext/CCNet-style quality-classifier
inference step: hash every token into B weight buckets, dot the bag of
hashed features with a weight vector, average.  The weights here are
md5-DERIVED (a deterministic stand-in so a SQL oracle reproduces scores
bit-for-bit); a production model drops its trained vector into the same
shape either as a broadcast map or, exactly like ``unigram_logprob_score``,
a broadcast-joined weight dimension.

Scale shape: everything is in-row column math plus ONE map-side-combined
groupBy(doc) — no joins, no weight table shuffle, integer vote sums so the
aggregation is order-independent (float sums are not reproducible across
partitionings; the single final division is).

``pii_scrub`` is the document-side PII redaction (the P10 display redaction
generalized to content): regex replace of emails/phones with typed tags +
match counts, all JVM regexp ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_spark.llmops.textstats import tokens

# weights are integers in [-1000, 1000]: the vote sum is exact (bigint) and
# order-independent; only the FINAL per-doc division produces a float
WEIGHT_SCALE = 1000


def _bucket(col: Column, buckets: int) -> Column:
    """Token -> weight-bucket id via the md5 60-bit cut (same family as the
    minhash h1 — one md5 per token)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"),
        F.lit(buckets),
    )


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic weight for a bucket: md5('w#'||bucket) mapped to
    [-WEIGHT_SCALE, WEIGHT_SCALE].  Stand-in for trained weights with the
    same plan shape (pure expression, no lookup join)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w#"), bucket.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(2 * WEIGHT_SCALE + 1)) - WEIGHT_SCALE


def hashed_linear_score(
    df: DataFrame, id_col: str, text_col: str, buckets: int = 4096
) -> DataFrame:
    """Per-document linear classifier score over hashed token features:
    mean of the bucket weights of the doc's tokens (fasttext-style
    sentence-vector scoring).  Returns (id, n_tokens, vote_sum, score,
    keep): vote_sum is the exact integer dot product (order-independent
    across partitionings — float partial sums are not), score the single
    IEEE division vote_sum / (n * WEIGHT_SCALE) (bit-reproducible: one
    float op over two exact integers), keep = vote_sum >= 0."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    )
    votes = toks.select(
        id_col, _bucket_weight(_bucket(F.col("w"), buckets)).alias("v")
    )
    agg = votes.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("v").alias("vote_sum"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "vote_sum",
        (
            F.col("vote_sum")
            / (F.col("n_tokens") * F.lit(WEIGHT_SCALE)).cast("double")
        ).alias("score"),
        (F.col("vote_sum") >= 0).cast("int").alias("keep"),
    )


EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def pii_scrub(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Redact emails/phones from document text (message-content PII scrub,
    the corpus-side counterpart of the P10 field redaction): returns
    (id, n_emails, n_phones, scrubbed_md5) — the md5 of the redacted text
    rides instead of the text itself so downstream aggregation never
    shuffles document bodies."""
    txt = F.col(text_col)
    n_emails = F.regexp_count(txt, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(txt, F.lit(PHONE_RE))
    scrubbed = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )
