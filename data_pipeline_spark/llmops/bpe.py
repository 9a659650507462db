"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
build-the-tokenizer step of an LLM data pipeline, structured the way it
scales to 100 TB:

1. **Corpus -> word counts** is the ONLY corpus-sized stage: one
   groupBy shuffle whose output is bounded by the vocabulary (heavy-tail
   distinct words, not tokens).  This is also how reference trainers
   (HF tokenizers) factor the problem — merges depend on the corpus
   only through the word-frequency table.
2. **Merge training runs on the bounded top-``max_words`` table** on
   the driver (same documented bounded-collect contract as the PQ
   codebook sample in llmops/pq.py): classic pair-count/argmax/merge
   iterations with a deterministic tie-break (count desc, then pair
   lexicographic asc), so retraining is reproducible bit-for-bit.
3. **Encoding is map-side**: learned merges broadcast with the closure;
   applying them is a per-row rank-priority merge loop inside
   mapInPandas — no shuffle, no state.

The oracle strategy mirrors the repo's sketch/ANN pattern: the
pair-count machinery (what merge #1 maximises) is SQL-expressible and
oracle-paired (`bpe_pair_counts_exact`); the iterative trainer is
certified by unit parity against hand-computed merges and pinned
determinism, with a rows-only driver check for the full table.

Word-end marker: words are extended with a terminal ``</w>`` symbol so
merges distinguish suffixes from interiors (the original formulation).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) — the one corpus-sized shuffle.  Lowercased
    whitespace words; NULL/empty text contributes nothing."""
    w = F.explode(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    ).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent SYMBOL pair counts over the initial
    character segmentation (with the ``</w>`` terminal) — exactly the
    statistic BPE merge #1 maximises.  In-row pair generation (sequence
    + transform), one partial-aggregated groupBy; SQL-expressible, so
    oracle-paired."""
    chars = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i-1] AS lhs, syms[i] AS rhs))"
    )
    return (
        words.select(F.col("n"), chars.alias("syms"))
        .filter(F.size("syms") >= 2)
        .select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("n").alias("pair_count"))
    )


def _train_merges(word_freqs: list, n_merges: int) -> list:
    """Classic BPE over a [(word, count)] table: repeatedly merge the
    most frequent adjacent symbol pair.  Deterministic tie-break:
    highest count, then lexicographically smallest (left, right).
    Returns [(rank, left, right, count_at_merge)].

    Incremental formulation (what production trainers run): pair counts
    and a pair -> containing-words index are maintained across merges,
    so each iteration touches only the words that actually contain the
    merged pair instead of rescanning the whole table — O(affected)
    per merge.  Tests pin exact-output parity against the naive
    full-rescan reference."""
    seqs = [list(word) + [END] for word, n in word_freqs if word]
    freqs = [int(n) for word, n in word_freqs if word]
    counts: dict = {}
    where: dict = {}
    for wi, syms in enumerate(seqs):
        n = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + n
            where.setdefault(p, set()).add(wi)
    merges = []
    for rank in range(n_merges):
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break  # nothing left worth merging
        merged = left + right
        for wi in sorted(where.get((left, right), ())):
            syms = seqs[wi]
            n = freqs[wi]
            for i in range(len(syms) - 1):  # retract this word's pairs
                p = (syms[i], syms[i + 1])
                counts[p] -= n
                if counts[p] <= 0:
                    counts.pop(p)
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        where.pop(p)
            i = 0
            ns = []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            seqs[wi] = ns
            for i in range(len(ns) - 1):  # re-add the merged word's pairs
                p = (ns[i], ns[i + 1])
                counts[p] = counts.get(p, 0) + n
                where.setdefault(p, set()).add(wi)
        merges.append((rank, left, right, cnt))
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int = 50_000,
) -> list:
    """Train merges from a corpus: distributed word counts, then driver
    training over the top-``max_words`` table (bounded collect by
    contract — the frequency table, never the corpus, crosses to the
    driver).  Truncation is deterministic: count desc, word asc."""
    top = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return _train_merges([(r["word"], r["n"]) for r in top], n_merges)


def apply_merges(word: str, ranks: dict) -> list:
    """Segment one word with trained merges by rank priority (the same
    greedy-lowest-rank loop production BPE encoders run)."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_stats(
    docs: DataFrame, merges: list, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Tokenize each document with the trained merges map-side (merges
    broadcast in the closure; no shuffle) -> per-doc token statistics."""
    import pandas as pd

    ranks = {(m[1], m[2]): m[0] for m in merges}

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids, n_tok, n_words = [], [], []
            cache: dict = {}
            for did, t in zip(pdf[id_col], pdf[text_col]):
                # ASCII-only \s+ to match the Java-regex word split used
                # by word_counts during training (Python str.split would
                # also break on U+00A0 etc., segmenting differently than
                # the trained vocabulary)
                words = [
                    w
                    for w in re.split(r"\s+", (t or "").lower(), flags=re.ASCII)
                    if w
                ]
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(apply_merges(w, ranks))
                    total += cache[w]
                ids.append(int(did))
                n_tok.append(total)
                n_words.append(len(words))
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": n_tok, "n_words": n_words}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, n_tokens long, n_words long"
    )
