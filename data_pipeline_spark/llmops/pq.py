"""Product quantization (PQ) for embedding search at corpus scale.

The canonical billion-vector ANN compression (Jegou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — public
literature): split each d-dim vector into m subvectors, k-means each
subspace into its own codebook, store each vector as m one-byte codes.
A 64-dim float32 embedding (256 B) becomes m=8 bytes — a 100 TB embedding
column becomes ~3 TB of codes, and the asymmetric-distance (ADC) scan
reads ONLY the codes: per query, an (m x n_centroids) lookup table of
subspace inner products is built once, and each candidate's approximate
score is m table lookups.  The production pattern implemented here:

1. ``pq_train`` — codebooks from a DETERMINISTIC bounded sample
   (md5-ordered, like ivf_assign's centroid choice) with driver-side
   Lloyd iterations: training is O(sample), never O(corpus).
2. ``pq_encode`` — one mapInPandas scan, numpy argmin per subspace;
   the corpus never shuffles.
3. ``pq_topk`` — ADC shortlist over the codes (queries broadcast into
   the kernel) + EXACT quantized-cosine re-rank of the shortlist only,
   so the expensive exact math touches shortlist_size rows per query
   instead of the corpus.

Exactness limit (certified against the brute-force SQL oracle like
ivf_exact_topk): with per-subspace codebooks containing every distinct
training subvector and zero Lloyd iterations, encoding is lossless, the
ADC ranking equals the exact float ranking, and the re-ranked top-k is
the brute-force answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from data_pipeline_spark.llmops import similarity


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int | None = 32,
    sample: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Train per-subspace codebooks on a deterministic md5-ordered sample.

    Returns an (m, n_centroids, d/m) float64 array.  ``n_centroids=None``
    is the lossless limit: each subspace codebook holds every distinct
    subvector of the sample (and ``iters`` is ignored — the codebook IS
    the point set).  Driver memory is bounded by the sample, not the
    corpus (the ivf_assign / union-find guard pattern).
    """
    rows = (
        df.select(
            F.col(vec_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.asarray([r.v for r in rows], np.float64)
    return _train_books(x, m, n_centroids, iters)


def _train_books(
    x: np.ndarray, m: int, n_centroids: int | None, iters: int
) -> np.ndarray:
    """Per-subspace k-means over a driver-side training matrix (raw
    vectors for pq_train, IVF residuals for pq_train_residual)."""
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        if n_centroids is None:
            books.append(np.unique(xs, axis=0))
            continue
        k = min(n_centroids, len(np.unique(xs, axis=0)))
        # deterministic init: first k distinct subvectors in sample order
        seen: dict = {}
        for row in map(tuple, xs):
            if row not in seen:
                seen[row] = None
            if len(seen) == k:
                break
        cent = np.asarray(list(seen), np.float64)
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = xs[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books.append(cent)
    width = max(len(b) for b in books)
    out = np.zeros((m, width, sub), np.float64)
    for j, b in enumerate(books):
        out[j, : len(b)] = b
        if len(b) < width:  # pad with the last centroid (never nearer)
            out[j, len(b) :] = b[-1]
    return out


def pq_train_residual(
    listed: DataFrame,
    coarse: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int | None = 32,
    sample: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Codebooks over IVF RESIDUALS (vector − assigned coarse centroid) —
    the Jegou et al. §V / Faiss IndexIVFPQ layout.  After coarse routing
    the residual cloud is centered near the assigned centroid, so the
    same m×k code budget quantizes it more finely wherever the corpus
    has cluster structure (on the uniform-sphere synthetic corpus the
    residuals stay near unit length and the gain is small — the r10
    recall table in ROUND10_NOTES.md separates the routing, code and
    re-rank-depth contributions; on the near-dup-structured rehearsal
    corpus the residual codes are what make the per-cluster ADC ranking
    sharp).

    ``listed`` must carry ``list_id`` (the SPARK-side assignment — the
    sample's residuals are computed against the same list each vector is
    encoded under later, so the lossless ``n_centroids=None`` certificate
    covers every residual subvector actually produced by pq_encode).
    """
    rows = (
        listed.select(
            F.col(vec_col).alias("v"),
            F.col("list_id"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.asarray([r.v for r in rows], np.float64)
    lids = np.asarray([r.list_id for r in rows], np.int64)
    return _train_books(x - coarse[lids], m, n_centroids, iters)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse: np.ndarray | None = None,
) -> DataFrame:
    """One scan: (id, codes array<int>[, list_id]) — m bytes of
    information per vector; numpy argmin per subspace over whole Arrow
    batches.  With ``coarse`` (the IVF centroid matrix), ``df`` must
    carry ``list_id`` and each vector is encoded as its RESIDUAL
    against its assigned centroid (the IndexIVFPQ layout); list_id is
    kept in the output so the ADC scan can add back the per-list
    ⟨query, centroid⟩ term."""
    m, _k, sub = codebooks.shape
    residual = coarse is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # empty Arrow batch: asarray yields 1-D, skip
                continue
            x = np.asarray(list(pdf["v"]), np.float64)
            if residual:
                lids = pdf["list_id"].to_numpy()
                x = x - coarse[lids]
            codes = np.empty((len(x), m), np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            out = {"id": pdf["id"], "codes": [c.tolist() for c in codes]}
            if residual:
                out["list_id"] = pdf["list_id"]
            yield pd.DataFrame(out)

    fields = [
        StructField("id", LongType()),
        StructField("codes", ArrayType(IntegerType())),
    ]
    cols = [F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")]
    if residual:
        cols.append(F.col("list_id").cast("int"))
        fields.append(StructField("list_id", IntegerType()))
    return df.select(*cols).mapInPandas(run, schema=StructType(fields))


def pq_topk(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    n_centroids: int | None = 64,
    shortlist: int = 200,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """ADC shortlist over PQ codes + exact quantized-cosine re-rank.

    Defaults (n_centroids=64, shortlist=200 = 20*k re-rank depth) come
    from the r10 measured recall table (ROUND10_NOTES.md): recall@10
    0.88-0.99 on the uniform-sphere corpus.  ``shortlist`` is the
    re-rank depth — the only knob that trades exact-math volume for
    recall; 20*k is cheap (per query, 20*k exact cosines vs a corpus
    scan) and the first knob to raise if the ADC ranking is noisy.

    The queries (small by contract, like cosine_topk) are collected and
    their per-subspace inner-product tables ride into the code-scan kernel
    as a closure broadcast; the corpus-side scan reads codes only.  The
    shortlist join back to full vectors touches |queries| * shortlist
    rows.  Output: (query_id, neighbor_id, rank, cos_sim) with the exact
    cosine — identical schema to cosine_topk.
    """
    if codebooks is None:
        codebooks = pq_train(
            base, id_col, vec_col, m=m, n_centroids=n_centroids
        )
    m_, _width, sub = codebooks.shape

    qrows = queries.select(
        F.col(id_col).cast("long").alias("qid"), F.col(vec_col).alias("v")
    ).collect()
    qids = np.asarray([r.qid for r in qrows], np.int64)
    qx = np.asarray([r.v for r in qrows], np.float64)
    # tables[q][j][c] = <query subvector, centroid c of subspace j>
    tables = np.einsum(
        "qjs,jcs->qjc",
        qx.reshape(len(qx), m_, sub),
        codebooks,
    )

    codes = pq_encode(base, codebooks, id_col, vec_col)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # take=0 would break argpartition; skip
                continue
            c = np.asarray(list(pdf["codes"]), np.int32)  # (rows, m)
            ids = pdf["id"].to_numpy()
            # approx inner product: sum over subspaces of table lookups
            approx = np.zeros((len(tables), len(c)))
            for j in range(m_):
                approx += tables[:, j, :][:, c[:, j]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(tables)):
                take = min(shortlist, len(c))
                top = np.argpartition(-approx[qi], take - 1)[:take]
                out_q.extend([int(qids[qi])] * take)
                out_n.extend(ids[top].tolist())
                out_s.extend(approx[qi][top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_ip": out_s}
            )

    # per-partition shortlists -> global shortlist per query (tiny)
    partials = codes.mapInPandas(
        scan,
        schema="query_id long, neighbor_id long, approx_ip double",
    )
    from pyspark.sql import Window

    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_ip").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        partials.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    # exact quantized-cosine re-rank of the shortlist only
    qv = similarity.quantized(queries, id_col, vec_col, "query")
    nv = similarity.quantized(base, id_col, vec_col, "neighbor")
    scored = (
        cand.join(F.broadcast(qv), cand.query_id == qv.query_id)
        .drop(qv.query_id)
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            similarity._cos_from_parts(
                similarity._int_dot(F.col("query_q"), F.col("neighbor_q")),
                F.col("query_n"),
                F.col("neighbor_n"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivfpq_topk(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 24,
    m: int = 8,
    n_centroids: int | None = 64,
    shortlist: int = 200,
    sample: int = 4096,
    kmeans_iters: int = 10,
) -> DataFrame:
    """IVF coarse routing + RESIDUAL-PQ ADC inside the probed lists +
    exact re-rank — the complete billion-scale ANN layout (coarse index
    prunes the scan to ~n_probe/n_lists of the corpus; PQ codes shrink
    what IS scanned by ~4d/m bytes; exact math touches only the
    shortlist).

    PQ codebooks are trained on and encode IVF residuals (vector −
    assigned centroid), the Jegou TPAMI 2011 §V / Faiss IndexIVFPQ
    layout: ⟨q, x⟩ = ⟨q, c_list⟩ + ⟨q, residual⟩, so the ADC scan adds a
    per-(query, list) scalar (a tiny Q×L matrix built driver-side from
    the broadcast centroids) to the usual m subspace table lookups.
    ``shortlist`` is the re-rank depth: how many ADC candidates per
    query get exact quantized-cosine scores.

    Defaults (n_probe=24/64 spherical-k-means lists, n_centroids=64,
    shortlist=200 = 20*k) are from the r10 measured recall table
    (ROUND10_NOTES.md): recall@10 0.83-0.90 at a 0.38 scan fraction on
    the UNIFORM-sphere synthetic corpus — the adversarial geometry,
    where top-10 neighbors sit at cos 0.31-0.41 against a cos~0
    background and no coarse quantizer can concentrate them.  Clustered
    real-world corpora (and the near-dup-structured 10x rehearsal
    corpus) reach higher recall at far lower n_probe — tune n_probe
    first, then shortlist.

    In-sandbox the probe filter is a mask inside the code-scan kernel; at
    100 TB the codes table is written partitioned by list_id (like
    ivf_topk's assignments) so probing prunes file reads, not rows.
    Output schema matches cosine_topk/ivf_topk/pq_topk.
    """
    from pyspark.sql import Window

    assignments, centroids = similarity.ivf_assign(
        base, id_col, vec_col, n_lists, kmeans_iters=kmeans_iters,
        sample=sample,
    )
    cent_rows = centroids.orderBy("list_id").collect()  # n_lists: tiny
    coarse = np.asarray([r.c_vec for r in cent_rows], np.float64)
    listed = base.join(assignments, id_col)

    codebooks = pq_train_residual(
        listed, coarse, id_col, vec_col, m=m, n_centroids=n_centroids,
        sample=sample,
    )
    m_, _width, sub = codebooks.shape

    probes = similarity.ivf_probes(
        queries, centroids, id_col, vec_col, n_probe
    ).select("query_id", "list_id")
    probe_lists: dict = {}
    for r in probes.collect():  # |queries| x n_probe rows: tiny by contract
        probe_lists.setdefault(r.query_id, set()).add(r.list_id)

    qrows = queries.select(
        F.col(id_col).cast("long").alias("qid"), F.col(vec_col).alias("v")
    ).collect()
    qids = [int(r.qid) for r in qrows]
    qx = np.asarray([r.v for r in qrows], np.float64)
    tables = np.einsum("qjs,jcs->qjc", qx.reshape(len(qx), m_, sub), codebooks)
    qc = qx @ coarse.T  # (Q, L): the per-(query, list) ⟨q, centroid⟩ term

    codes = pq_encode(listed, codebooks, id_col, vec_col, coarse=coarse)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # empty Arrow batch: asarray yields 1-D, skip
                continue
            c = np.asarray(list(pdf["codes"]), np.int32)
            ids = pdf["id"].to_numpy()
            lists = pdf["list_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(qids):
                mask = np.isin(lists, list(probe_lists.get(qid, ())))
                if not mask.any():
                    continue
                sub_c, sub_ids = c[mask], ids[mask]
                approx = qc[qi][lists[mask]].copy()
                for j in range(m_):
                    approx += tables[qi, j, :][sub_c[:, j]]
                take = min(shortlist, len(sub_c))
                top = np.argpartition(-approx, take - 1)[:take]
                out_q.extend([qid] * take)
                out_n.extend(sub_ids[top].tolist())
                out_s.extend(approx[top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_ip": out_s}
            )

    partials = codes.mapInPandas(
        scan, schema="query_id long, neighbor_id long, approx_ip double"
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_ip").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        partials.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qv = similarity.quantized(queries, id_col, vec_col, "query")
    nv = similarity.quantized(base, id_col, vec_col, "neighbor")
    scored = (
        cand.join(F.broadcast(qv), cand.query_id == qv.query_id)
        .drop(qv.query_id)
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            similarity._cos_from_parts(
                similarity._int_dot(F.col("query_q"), F.col("neighbor_q")),
                F.col("query_n"),
                F.col("neighbor_n"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
