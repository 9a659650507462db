"""Distributed BPE trainer tests (data_pipeline_spark/llmops/bpe.py).

Correctness strategy: the incremental-pair-count trainer is pinned
exact-output-equal to a naive full-rescan reference over random corpora
(the two share only the tie-break definition), the classic textbook
corpus is hand-pinned, and the Spark stages (word counts, in-row pair
expansion, deterministic truncation, map-side encoding) are checked
against driver recomputation and under adversarial repartitioning.
"""

import numpy as np
import pytest

from data_pipeline_spark.llmops import bpe
from data_pipeline_spark.llmops.bpe import END


def _naive_train(word_freqs, n_merges):
    """Full-rescan reference trainer (textbook formulation)."""
    seqs = [(tuple(w) + (END,), int(n)) for w, n in word_freqs if w]
    merges = []
    for rank in range(n_merges):
        counts = {}
        for syms, n in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        m = l + r
        out = []
        for syms, n in seqs:
            i = 0
            ns = []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    ns.append(m)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out.append((tuple(ns), n))
        seqs = out
        merges.append((rank, l, r, c))
    return merges


def test_bpe_classic_corpus_hand_pinned():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = bpe._train_merges(wf, 5)
    assert [x[1:] for x in m] == [
        ("e", "s", 9), ("es", "t", 9), ("est", END, 9),
        ("l", "o", 7), ("lo", "w", 7),
    ]
    ranks = {(x[1], x[2]): x[0] for x in bpe._train_merges(wf, 10)}
    assert bpe.apply_merges("lowest", ranks) == ["low", "est</w>"]
    assert bpe.apply_merges("low", ranks) == ["low</w>"]
    assert bpe.apply_merges("zzz", ranks) == ["z", "z", "z", END]


def test_bpe_incremental_equals_naive_reference():
    rng = np.random.default_rng(0)
    for t in range(25):
        wf = []
        for _ in range(int(rng.integers(3, 60))):
            w = "".join(rng.choice(list("abcde"), int(rng.integers(1, 9))))
            wf.append((w, int(rng.integers(1, 20))))
        assert bpe._train_merges(wf, 30) == _naive_train(wf, 30), t


def test_bpe_spark_stages(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate"),
        (3, None),
        (4, "THE THE the"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wc = {r["word"]: r["n"] for r in bpe.word_counts(docs).collect()}
    assert wc["the"] == 6 and wc["cat"] == 2 and "" not in wc

    # pair counts == driver recount over the same words
    expect: dict = {}
    for w, n in wc.items():
        syms = list(w) + [END]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            expect[p] = expect.get(p, 0) + n
    got = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in bpe.pair_counts(bpe.word_counts(docs)).collect()
    }
    assert got == expect

    # training is repartition-invariant and equals the driver trainer
    merges = bpe.bpe_train(docs, n_merges=10)
    merges_rep = bpe.bpe_train(docs.repartition(7), n_merges=10)
    assert merges == merges_rep
    table = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    assert merges == bpe._train_merges(table, 10)

    # map-side encoding: token counts match per-word apply_merges
    ranks = {(m[1], m[2]): m[0] for m in merges}
    stats = {
        r["doc_id"]: (r["n_tokens"], r["n_words"])
        for r in bpe.bpe_encode_stats(docs, merges).collect()
    }
    for did, text in rows:
        words = [w for w in (text or "").lower().split() if w]
        n_tok = sum(len(bpe.apply_merges(w, ranks)) for w in words)
        assert stats[did] == (n_tok, len(words)), did

    # deterministic truncation contract: max_words cuts by (n desc, word)
    m_small = bpe.bpe_train(docs, n_merges=5, max_words=2)
    top2 = table[:2]
    assert m_small == bpe._train_merges(top2, 5)


def test_encode_stats_whitespace_matches_training_split(spark):
    """A document containing non-ASCII whitespace (U+00A0) must be
    segmented into the SAME words at encode time as word_counts uses
    during training (Java regex \\s+ is ASCII-only, so "a\\u00A0b" is
    ONE word there — bpe_encode_stats must agree, not split it)."""
    text = "foo\u00a0bar baz"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wc = {r["word"]: r["n"] for r in bpe.word_counts(docs).collect()}
    assert wc == {"foo\u00a0bar": 1, "baz": 1}

    merges = bpe.bpe_train(docs, n_merges=4)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    row = bpe.bpe_encode_stats(docs, merges).collect()[0]
    # same two words the training split produced
    assert row["n_words"] == 2
    expect_tok = sum(
        len(bpe.apply_merges(w, ranks)) for w in ("foo\u00a0bar", "baz")
    )
    assert row["n_tokens"] == expect_tok
