"""Unit coverage for the scale-rehearsal expansion fixtures
(tools_scale_rehearsal.py): determinism of the seeded corpus expansion
and the arithmetic ground truth it plants — so the rehearsal tool's
invariants rest on test-pinned fixture semantics."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

import tools_scale_rehearsal as tsr


def _base_docs(spark):
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(40)), "en", "s", 200)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )


def test_salted_text_kills_every_3shingle(spark):
    docs = _base_docs(spark)
    out = docs.select(
        "doc_id", tsr._salted_text(2).alias("t2a"), tsr._salted_text(3).alias("t3")
    )
    again = docs.select("doc_id", tsr._salted_text(2).alias("t2b"))
    j = out.join(again, "doc_id").collect()
    for r in j:
        # deterministic per (copy, doc)
        assert r.t2a == r.t2b
        # distinct across copies
        assert r.t2a != r.t3
    # every 3-token window contains a salted position -> zero shared
    # 3-shingles with the original
    orig = docs.collect()[0].text.split()
    salted = j[0].t2a.split()
    assert len(orig) == len(salted)
    sh_o = {tuple(orig[k : k + 3]) for k in range(len(orig) - 2)}
    sh_s = {tuple(salted[k : k + 3]) for k in range(len(salted) - 2)}
    assert not (sh_o & sh_s)


def test_planted_pairs_ground_truth(spark, monkeypatch, tmp_path):
    docs = _base_docs(spark)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(tsr, "BASE", str(tmp_path))
    got = {
        (r.id_a, r.id_b)
        for r in tsr.planted_doc_pairs(spark, 3).collect()
    }
    want = set()
    for i in (1, 2):
        for d in range(20):
            # v3 plant: copy i%4==1 is an EXACT copy of EVERY doc (the
            # realistic-crawl duplicate channel); otherwise the r10
            # append-token near-dup rule applies
            if i % 4 == 1 or d % 9 == i % 9:
                want.add((d, d + i * tsr.OFFSET))
    assert got == want
    # the shingle floor prunes: docs here have 38 distinct shingles
    strong = {
        (r.id_a, r.id_b)
        for r in tsr.planted_doc_pairs(spark, 3, min_shingles=30).collect()
    }
    assert strong == want
    none = tsr.planted_doc_pairs(spark, 3, min_shingles=50).count()
    assert none == 0


def test_embedding_expansion_plants_tight_clusters(spark, monkeypatch, tmp_path):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((6, 16))
    vecs /= np.linalg.norm(vecs, axis=1)[:, None]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(6)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    docs = _base_docs(spark)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    monkeypatch.setattr(tsr, "BASE", str(tmp_path))
    monkeypatch.setattr(tsr, "SCRATCH", tmp_path / "scratch")
    out = tsr.build_scaled(spark, 3)
    got = spark.read.parquet(f"{out}/embeddings.parquet").collect()
    assert len(got) == 18
    by_id = {r.vec_id: np.asarray(r.embedding, float) for r in got}
    for i in range(6):
        v = by_id[i]
        for c in (1, 2):
            w = by_id[i + c * tsr.OFFSET]
            assert abs(np.linalg.norm(w) - 1.0) < 1e-5  # renormalized
            cos = float(v @ w / np.linalg.norm(v))
            assert cos > 0.85, (i, c, cos)  # tight planted cluster
    # deterministic: rebuild into a fresh scratch yields identical bytes
    monkeypatch.setattr(tsr, "SCRATCH", tmp_path / "scratch2")
    out2 = tsr.build_scaled(spark, 3)
    again = {
        r.vec_id: tuple(r.embedding)
        for r in spark.read.parquet(f"{out2}/embeddings.parquet").collect()
    }
    assert {r.vec_id: tuple(r.embedding) for r in got} == again
