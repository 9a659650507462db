"""Dedup-gated streaming ingest with a persistent INDEX SIDECAR: every
micro-batch of documents is admitted against the already-ingested corpus
(exact md5 + shingle-Jaccard near-dup), and only the keepers append — the
streaming form of the crawl-ingest admission check, so the corpus stays
deduplicated AS it grows instead of requiring periodic full-corpus
re-pairing.

Index sidecar (the 100 TB design)
---------------------------------
The gate never reads corpus text.  Beside the corpus lives an append-only
``doc_shingle_index`` sidecar — one row per admitted document carrying its
md5, distinct-shingle count, and 64-bit shingle-hash set (~8 bytes per
shingle vs the text itself) — written in the same epoch commit as the
corpus append.  Each trigger gates the batch against the INDEX
(``llmops.dedup.indexed_dedup_gate``: batch hash set and shingle map
broadcast, index scanned map-side, exact-dup pass column-pruned to the
md5 column alone), so steady-state per-trigger IO is O(index), not
O(corpus text), and no tokenization of ingested data ever re-runs.  The
index IS sufficient for exact decisions (full shingle posting per doc),
so there is no corpus fallback to verify hits against.

Exactly-once commit protocol
----------------------------
Corpus and index cannot be made atomic as two directories, so both are
partitioned by (ingest_writer, ingest_epoch) and a per-writer LEDGER
partition inside the index dir is the single commit point, appended LAST:

    1. purge: delete this writer's corpus/index partitions with epoch >
       last committed (debris from a crashed attempt; fs listing only)
    2. gate the batch against the COMMITTED index (ledger semi-join — a
       foreign writer's crash debris is invisible too)
    3. append admitted rows   -> corpus_dir / writer=w/epoch=e
    4. append their index rows-> index_dir/docs / writer=w/epoch=e
    5. append (epoch, n)      -> index_dir/ledger / writer=w

A crash anywhere before 5 leaves only uncommitted partitions, which the
replay purges and rewrites (gate decisions are deterministic given the
committed index, so the rewrite is identical); after 5 the epoch is
skipped.  ``compact()`` folds the accumulated per-epoch partitions into
one consolidated partition with the same ledger-append-as-commit-point
protocol (superseded pairs are REVOKED by ``n_admitted = -1`` ledger
rows rather than deleted-in-place, so no crash window double-counts or
loses a document); ``vacuum()`` sweeps revoked/orphaned directories.  Epoch ids are scoped to ONE streaming checkpoint, so each
stream derives a stable ``writer_id`` from its ``ledger_path`` and owns
its partitions; concurrent foreign writers are never touched by a purge
and their uncommitted debris never gates.  Two writers admitting
CONCURRENTLY can each admit a doc that duplicates the other's in-flight
batch (admission is serializable per writer, not globally) — serialize
writers with ``coordination.LeaseLock`` on the index dir if the corpus
has multiple live ingest streams.

Within a batch, exact copies collapse to one keeper (min id) and — by
default — near-duplicate pairs collapse too (``ngram_jaccard_pairs`` over
the batch; every doc that is the larger side of a >=threshold pair drops),
so a single micro-batch cannot admit two near-copies of a new document.

This directory-layout protocol uses local-FS listing/removal; a cluster
deployment swaps those two calls for the Hadoop FileSystem API — the
partition layout and ledger semantics are unchanged.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.llmops.dedup import (
    doc_shingle_index,
    exact_dup_groups,
    indexed_dedup_gate,
    ngram_jaccard_pairs,
)

_WRITER_COL = "ingest_writer"
_EPOCH_COL = "ingest_epoch"


class ChaosCrash(RuntimeError):
    """Injected crash for exactly-once protocol tests."""


def _has_partitions(path: str) -> bool:
    return os.path.isdir(path) and any(
        e.startswith(f"{_WRITER_COL}=") for e in os.listdir(path)
    )


class DedupGatedIngest:
    """foreachBatch sink: gate each batch against the committed dedup
    index and append only novel documents (see module docstring for the
    sidecar layout and commit protocol)."""

    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        ledger_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        threshold: float = 0.8,
        index_dir: str | None = None,
        writer_id: str | None = None,
        within_batch_neardup: bool = True,
        serialize_writers: bool = False,
        broadcast_batch: bool = True,
        band_prune: bool = True,
    ):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.index_dir = index_dir or corpus_dir + "_index"
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self.within_batch_neardup = within_batch_neardup
        # stable per-stream identity: the ledger path is scoped to one
        # checkpoint (pre-sidecar API kept), so its hash names this
        # writer's partitions; "w" prefix keeps partition-value inference
        # string-typed even for an all-digit hash
        self.writer_id = writer_id or "w" + hashlib.md5(
            ledger_path.encode()
        ).hexdigest()[:12]
        self._last_epoch: int | None = None
        # serialize_writers wraps each epoch commit in a LeaseLock on the
        # index dir, closing the documented concurrent-admission window
        # (two writers each admitting a doc that duplicates the other's
        # in-flight batch); single-stream deployments skip the lock cost
        self.serialize_writers = serialize_writers
        self.broadcast_batch = broadcast_batch
        # band_prune: steady-state triggers scan only (cor_id, bands_v2)
        # of the index and explode shingles for band-colliding candidates
        # — O(candidates) per trigger instead of O(index).  A >= threshold
        # pair escapes the bands with p <= 1-(1-t^3)^10 (8e-4 at t=0.8);
        # admission decisions on the chaos/flood fixtures are identical.
        # Requires sidecars with the VERSIONED bands_v2 column (r10's
        # modular MinHash family — doc_shingle_index emits it; a pre-r10
        # 'bands' sidecar fails loud); set False to gate without bands.
        self.band_prune = band_prune
        self.crash_points: set[str] = set()  # test-injectable crash windows

    # -- layout ------------------------------------------------------------
    @property
    def _docs_dir(self) -> str:
        return os.path.join(self.index_dir, "docs")

    @property
    def _ledger_dir(self) -> str:
        return os.path.join(self.index_dir, "ledger")

    def _chaos(self, point: str) -> None:
        if point in self.crash_points:
            raise ChaosCrash(point)

    # -- commit state ------------------------------------------------------
    def _ledger(self) -> DataFrame | None:
        if not _has_partitions(self._ledger_dir):
            return None
        return self.spark.read.parquet(self._ledger_dir)

    def _committed_pairs(self) -> DataFrame | None:
        """(writer, epoch) pairs that are committed AND not revoked.
        ``compact`` revokes superseded pairs by appending an
        ``n_admitted = -1`` ledger row, so committed = pairs whose
        minimum n_admitted is still >= 0."""
        led = self._ledger()
        if led is None:
            return None
        return (
            led.groupBy(_WRITER_COL, F.col("epoch_id").alias(_EPOCH_COL))
            .agg(F.min("n_admitted").alias("_mn"))
            .filter(F.col("_mn") >= 0)
            .select(_WRITER_COL, _EPOCH_COL)
        )

    def _last_committed(self) -> int:
        if self._last_epoch is None:
            led = self._ledger()
            top = None
            if led is not None:
                # revocation rows (n_admitted < 0) don't count: an epoch
                # whose data was compacted away is still a committed epoch
                # for replay-skip purposes
                top = (
                    led.filter(
                        (F.col(_WRITER_COL) == self.writer_id)
                        & (F.col("n_admitted") >= 0)
                    )
                    .agg(F.max("epoch_id"))
                    .first()[0]
                )
            self._last_epoch = -1 if top is None else top
        return self._last_epoch

    def _purge_uncommitted(self) -> None:
        """Remove THIS writer's corpus/index partitions above its last
        committed epoch — debris of a crashed attempt.  Foreign writers'
        partitions are never touched."""
        last = self._last_committed()
        for base in (self.corpus_dir, self._docs_dir):
            wdir = os.path.join(base, f"{_WRITER_COL}={self.writer_id}")
            if not os.path.isdir(wdir):
                continue
            for entry in os.listdir(wdir):
                if not entry.startswith(f"{_EPOCH_COL}="):
                    continue
                try:
                    epoch = int(entry.split("=", 1)[1])
                except ValueError:
                    continue
                if epoch > last:
                    shutil.rmtree(os.path.join(wdir, entry))

    def _index_of(self, admitted: DataFrame) -> DataFrame:
        """Sidecar rows for an admitted batch — the hook a semantic
        (embedding) gate overrides with its ANN index rows."""
        return doc_shingle_index(admitted, self.id_col, self.text_col, self.n)

    def _index_cols(self) -> list[str]:
        """Columns a committed_index() read projects (the rest of the
        sidecar row never loads at gate time)."""
        return ["cor_id", "h", "n_sh", "shingles"] + (
            ["bands_v2"] if self.band_prune else []
        )

    def _read_docs(self) -> DataFrame:
        """Raw read of the index sidecar dir.  The one override point for
        schema back-compat: EVERY path that touches sidecar rows —
        gate-time ``committed_index`` and the ``compact()`` rewrite —
        must read through this hook, or a schema-evolved dir (e.g.
        pre-``model_v`` files beside post-retrain ones) can have its
        evolution laundered away by whichever file the schema sampler
        happens to pick."""
        return self.spark.read.parquet(self._docs_dir)

    def committed_index(self) -> DataFrame | None:
        """COMMITTED dedup-index rows: docs partitions semi-joined against
        the (small, broadcast) ledger, so neither this writer's nor any
        foreign writer's crash debris — nor a compacted-away or
        not-yet-committed compact partition — ever gates a batch."""
        committed = self._committed_pairs()
        if committed is None or not _has_partitions(self._docs_dir):
            return None
        return (
            self._read_docs()
            .join(F.broadcast(committed), [_WRITER_COL, _EPOCH_COL], "left_semi")
            .select(*self._index_cols())
        )

    # -- gate --------------------------------------------------------------
    def gate_batch(self, batch: DataFrame) -> DataFrame:
        """Pure admission decision (no writes): collapse within-batch
        exact copies (keeper = min id) and near-dup pairs (larger id of
        every >=threshold pair drops), then gate the survivors against
        the committed index.  Reads index partitions only — never corpus
        files (asserted by the chaos suite's plan check).

        NULL text normalizes to '' (and the normalized form is what an
        admitted row stores): without it,
        SQL NULL join semantics make NULL-text rows collapse WITHIN a
        batch (groupBy treats NULLs as equal) yet never match ACROSS
        batches (joins skip NULL keys) — every later NULL doc would be
        admitted forever."""
        batch = batch.withColumn(
            self.text_col, F.coalesce(F.col(self.text_col), F.lit(""))
        )
        keepers = exact_dup_groups(batch, self.id_col, self.text_col).select(
            F.col("keeper_id").alias(self.id_col)
        )
        batch = batch.join(keepers, self.id_col)
        if self.within_batch_neardup:
            losers = (
                ngram_jaccard_pairs(
                    batch,
                    self.id_col,
                    self.text_col,
                    self.n,
                    self.threshold,
                    cache=False,  # per-trigger caller: no CacheManager growth
                )
                .select(F.col("id_b").alias(self.id_col))
                .distinct()
            )
            batch = batch.join(losers, self.id_col, "left_anti")
        index = self.committed_index()
        if index is None:
            return batch
        flags = indexed_dedup_gate(
            index,
            batch,
            self.id_col,
            self.text_col,
            n=self.n,
            threshold=self.threshold,
            broadcast_batch=self.broadcast_batch,
            band_prune=self.band_prune,
            index_rows=self._live_rows,
        )
        return batch.join(
            flags.filter(F.col("keep") == 1).select(self.id_col), self.id_col
        )

    def gate_flags(self, batch: DataFrame) -> DataFrame:
        """Observability form of the gate: the full per-document flag
        frame (id, exact_dup, near_dup, best_jaccard, keep) against the
        committed index, WITHOUT the within-batch collapse — what a
        monitoring job samples to watch rejection rates.  No writes."""
        batch = batch.withColumn(
            self.text_col, F.coalesce(F.col(self.text_col), F.lit(""))
        )
        index = self.committed_index()
        if index is None:
            return batch.select(
                F.col(self.id_col),
                F.lit(0).alias("exact_dup"),
                F.lit(0).alias("near_dup"),
                F.lit(None).cast("double").alias("best_jaccard"),
                F.lit(1).alias("keep"),
            )
        return indexed_dedup_gate(
            index,
            batch,
            self.id_col,
            self.text_col,
            n=self.n,
            threshold=self.threshold,
            broadcast_batch=self.broadcast_batch,
            band_prune=self.band_prune,
            index_rows=self._live_rows,
        )

    def _live_rows(self) -> int | None:
        """Committed live index size off the LEDGER (O(ledger), no index
        scan) — the lazy supplier behind the gate's adaptive literal/join
        crossover (dedup.adaptive_literal_bound); only evaluated on fat
        triggers whose bucket set exceeds the literal floor."""
        stats = self.ingest_stats()
        if stats is None:
            return None
        return stats.agg(F.sum("n_admitted_live")).first()[0] or 0

    def ingest_stats(self) -> DataFrame | None:
        """Per-writer ingest history off the ledger: committed epochs,
        admitted totals, and the live (non-revoked) epoch count — the
        O(ledger) view an operator checks before anything corpus-sized."""
        led = self._ledger()
        if led is None:
            return None
        per_pair = led.groupBy(
            _WRITER_COL, F.col("epoch_id").alias(_EPOCH_COL)
        ).agg(
            F.max("n_admitted").alias("n_admitted"),
            (F.min("n_admitted") >= 0).cast("int").alias("live"),
        )
        return per_pair.groupBy(_WRITER_COL).agg(
            F.count(F.lit(1)).alias("n_epochs"),
            F.sum("live").alias("n_live_epochs"),
            F.sum(
                F.when(F.col("live") == 1, F.col("n_admitted")).otherwise(0)
            ).alias("n_admitted_live"),
            F.max(_EPOCH_COL).alias("max_epoch"),
        )

    # -- commit ------------------------------------------------------------
    def admit_batch(self, batch: DataFrame, epoch_id: int) -> int:
        """Gate + append one micro-batch; returns admitted row count
        (0 for replays and fully-duplicate batches).  With
        ``serialize_writers`` the whole gate->append->commit sequence runs
        under a lease on the index dir, so concurrent streams sharing one
        corpus admit strictly one-at-a-time (each sees every previously
        committed doc — no cross-stream duplicate window)."""
        if not self.serialize_writers:
            return self._admit(batch, epoch_id)
        from data_pipeline_spark.coordination import LeaseLock

        with LeaseLock(
            "ingest-commit",
            "corpus",
            root=os.path.join(self.index_dir, "locks"),
            lease_seconds=300,
        ):
            return self._admit(batch, epoch_id)

    def _admit(self, batch: DataFrame, epoch_id: int) -> int:
        if epoch_id <= self._last_committed():
            return 0
        self._purge_uncommitted()
        admitted = self.gate_batch(batch).persist()
        try:
            n_admitted = admitted.count()
            self._chaos("after_gate")
            if n_admitted:
                tagged = admitted.withColumn(
                    _WRITER_COL, F.lit(self.writer_id)
                ).withColumn(_EPOCH_COL, F.lit(epoch_id))
                tagged.write.mode("append").partitionBy(
                    _WRITER_COL, _EPOCH_COL
                ).parquet(self.corpus_dir)
                self._chaos("after_corpus")
                idx = (
                    self._index_of(admitted)
                    .withColumn(_WRITER_COL, F.lit(self.writer_id))
                    .withColumn(_EPOCH_COL, F.lit(epoch_id))
                )
                self._index_layout(idx, bulk=False).write.mode(
                    "append"
                ).partitionBy(_WRITER_COL, _EPOCH_COL).parquet(self._docs_dir)
                self._chaos("after_index")
            # ledger append LAST is the commit point: everything above is
            # purgeable debris until this row lands
            self.spark.createDataFrame(
                [(epoch_id, n_admitted, self.writer_id)],
                f"epoch_id LONG, n_admitted LONG, {_WRITER_COL} STRING",
            ).write.mode("append").partitionBy(_WRITER_COL).parquet(
                self._ledger_dir
            )
            self._last_epoch = epoch_id
            return n_admitted
        finally:
            admitted.unpersist()

    def _index_layout(self, idx: DataFrame, bulk: bool) -> DataFrame:
        """Physical-layout hook for index sidecar writes (identity here).
        ``bulk=True`` marks whole-index rewrites (compact/retrain) where
        a clustering shuffle amortizes over every later read; per-trigger
        appends (``bulk=False``) must stay shuffle-free."""
        return idx

    def corpus(self) -> DataFrame:
        """The ingested corpus without the commit-protocol partition
        columns (committed, non-revoked epochs only)."""
        committed = self._committed_pairs()
        df = self.spark.read.parquet(self.corpus_dir)
        if committed is not None:
            df = df.join(
                F.broadcast(committed), [_WRITER_COL, _EPOCH_COL], "left_semi"
            )
        return df.drop(_WRITER_COL, _EPOCH_COL)

    # -- compaction --------------------------------------------------------
    def vacuum(self) -> int:
        """Delete corpus/index partition directories whose (writer, epoch)
        pair is NOT committed-and-live: compact-crash orphans and
        partitions a completed ``compact`` revoked but did not get to
        delete.  Pure cleanup — the ledger semi-join already hides these
        from every reader — so a crash anywhere in here is harmless.
        Never touches a LIVE stream writer's uncommitted current epoch:
        only partitions of writers other than this one, or of this
        writer at-or-below its committed watermark, are candidates."""
        committed = self._committed_pairs()
        live: set[tuple[str, int]] = set()
        revoked: set[tuple[str, int]] = set()
        if committed is not None:
            live = {(r[0], r[1]) for r in committed.collect()}
            revoked = {
                (r[0], r[1])
                for r in self._ledger()
                .filter(F.col("n_admitted") < 0)
                .select(_WRITER_COL, "epoch_id")
                .collect()
            }
        removed = 0
        for base in (self.corpus_dir, self._docs_dir):
            if not os.path.isdir(base):
                continue
            for wentry in os.listdir(base):
                if not wentry.startswith(f"{_WRITER_COL}="):
                    continue
                writer = wentry.split("=", 1)[1]
                wdir = os.path.join(base, wentry)
                for eentry in os.listdir(wdir):
                    if not eentry.startswith(f"{_EPOCH_COL}="):
                        continue
                    try:
                        epoch = int(eentry.split("=", 1)[1])
                    except ValueError:
                        continue
                    if (writer, epoch) in live:
                        continue
                    if (
                        writer == self.writer_id
                        and epoch > self._last_committed()
                    ):
                        continue  # this stream's own in-flight epoch
                    # foreign UNCOMMITTED (never-revoked) debris belongs to
                    # its writer's replay, not to vacuum: skip pairs with
                    # no ledger trace at all unless they are compact
                    # leftovers (compact writers never replay)
                    if not writer.startswith("c") and (
                        (writer, epoch) not in revoked
                    ):
                        continue
                    shutil.rmtree(os.path.join(wdir, eentry))
                    removed += 1
        return removed

    def compact(self) -> int:
        """Rewrite every committed corpus/index partition into ONE
        consolidated partition and revoke the originals — the maintenance
        pass that stops a long-running stream from accumulating thousands
        of tiny per-epoch parquet partitions.

        Protocol (the single ledger append is the commit point):

          1. vacuum: remove orphans of previously crashed compactions
          2. snapshot the committed (writer, epoch) pairs
          3. copy their corpus and index rows to a fresh compact writer's
             epoch-0 partition (uncommitted: invisible to every reader)
          4. ONE ledger append: the compact pair's commit row PLUS an
             ``n_admitted = -1`` revocation row per superseded pair
          5. delete the superseded partitions (cleanup; a crash here
             leaves revoked-but-present dirs for the next vacuum)

        A crash before 4 leaves invisible orphans (vacuumed later); after
        4 the compacted data is live and the old partitions are already
        invisible — no window double-counts or loses a document.  Epochs
        committed by live streams AFTER the snapshot are untouched.
        Returns the number of documents in the compacted partition."""
        import uuid

        self.vacuum()
        snapshot = self._committed_pairs()
        if snapshot is None:
            return 0
        pairs = [(r[0], r[1]) for r in snapshot.collect()]
        if not pairs:
            return 0
        cw = "c" + uuid.uuid4().hex[:12]
        pair_df = F.broadcast(
            self.spark.createDataFrame(
                pairs, f"{_WRITER_COL} STRING, {_EPOCH_COL} LONG"
            )
        )
        n_docs = 0
        for base in (self.corpus_dir, self._docs_dir):
            if not _has_partitions(base):
                continue  # nothing ever admitted through this dataset
            rows = (
                # the docs dir MUST go through the back-compat read hook:
                # a plain read of a schema-evolved sidecar can sample a
                # pre-evolution footer and silently drop the new column
                # from the rewrite (destroying e.g. model_v evidence)
                (
                    self._read_docs()
                    if base == self._docs_dir
                    else self.spark.read.parquet(base)
                )
                .join(pair_df, [_WRITER_COL, _EPOCH_COL], "left_semi")
                .drop(_WRITER_COL, _EPOCH_COL)
                .withColumn(_WRITER_COL, F.lit(cw))
                .withColumn(_EPOCH_COL, F.lit(0))
            )
            if base == self.corpus_dir:
                rows = rows.persist()
                n_docs = rows.count()
            else:
                # the one whole-index rewrite: cluster the sidecar so
                # the gate's pushed list filters skip files/row groups
                rows = self._index_layout(rows, bulk=True)
            rows.write.mode("append").partitionBy(_WRITER_COL, _EPOCH_COL).parquet(
                base
            )
            if base == self.corpus_dir:
                rows.unpersist()
        self._chaos("compact_before_ledger")
        ledger_rows = [(0, n_docs, cw)] + [(e, -1, w) for w, e in pairs]
        self.spark.createDataFrame(
            ledger_rows, f"epoch_id LONG, n_admitted LONG, {_WRITER_COL} STRING"
        ).write.mode("append").partitionBy(_WRITER_COL).parquet(self._ledger_dir)
        self._chaos("compact_after_ledger")
        for base in (self.corpus_dir, self._docs_dir):
            for w, e in pairs:
                path = os.path.join(
                    base, f"{_WRITER_COL}={w}", f"{_EPOCH_COL}={e}"
                )
                if os.path.isdir(path):
                    shutil.rmtree(path)
        return n_docs

    def foreach_batch(self):
        def fn(batch: DataFrame, epoch_id: int) -> None:
            self.admit_batch(batch, epoch_id)

        return fn

    def start(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.foreach_batch())
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )


class SemanticGatedIngest(DedupGatedIngest):
    """EMBEDDING near-dup gated ingest — the semantic twin of the text
    gate, on the SAME sidecar/ledger/compaction protocol (everything in
    the module docstring about purge/commit/replay/compact/vacuum holds
    unchanged; only the index rows and the admission decision differ):

    - sidecar rows are an ANN index (``pq.semantic_index_rows``: PQ
      residual codes + coarse list id + vector norm + the vector itself
      for candidate verification), appended per admitted trigger,
    - the gate is ``pq.semantic_gate_flags``: coarse-probe the committed
      index, ADC-score only the probed lists' codes, exact-verify the
      bounded candidate set — a document is rejected when some committed
      document sits at cosine >= threshold,
    - the (coarse centroids, codebooks) model trains ONCE on the first
      gated batch and persists to ``index_dir/model.json`` BEFORE any
      ledger commit, so a crash-replayed trigger gates with identical
      decisions (if the crash preceded the model write, the replay
      retrains on the same batch deterministically — md5-ordered sample,
      no RNG).

    Model lifecycle (r11 — the retrain/reindex contract)
    ----------------------------------------------------
    Every index row carries the VERSION of the model that encoded it
    (``model_v``, the semantic twin of the text gate's ``bands_v2``
    column), and model files are immutable per version
    (``model.json`` = v1 for sidecar back-compat, ``model_v{N}.json``
    after).  At gate time the committed index's version resolves the
    quantizer: probing PQ codes with any other model would silently
    search the wrong lists, so a MIXED-version index or a missing model
    file FAILS LOUD rather than degrade recall.

    ``retrain()`` re-trains on the committed corpus and atomically
    re-encodes the WHOLE index under the new model via the compact()
    protocol — new model file written first (unreferenced until commit),
    corpus + re-encoded index rows land in a fresh compact-writer
    partition, and ONE ledger append commits the new pair while revoking
    every superseded one.  A crash anywhere before that append leaves
    the old single-version index fully live (the orphaned model file and
    partitions are vacuumed/reused); after it, the index is single-
    version at N+1.

    Because a retrain re-encodes the WHOLE index under one new model, it
    is also the one safe point to change coarse geometry:
    ``auto_scale_lists=True`` makes each retrain train its quantizer
    with ``n_lists ~ sqrt(committed docs)`` (clamped to [constructor
    n_lists, 4096]), so the gate's per-trigger scan — n_probe lists of
    ~n/n_lists rows each — stays ~sqrt(n)-bounded as the index grows
    instead of linear at fixed lists (the production knob the r12
    pruning A/B measures around).  n_probe stays fixed, so the probed
    FRACTION shrinks with corpus growth — the standard IVF recall
    trade, and for a dedup gate it fails in the safe direction: a
    coarse-quantizer miss ADMITS a near-duplicate, it never wrongly
    rejects new data (every candidate that IS probed gets
    exact-verified).  Nothing outside the model file changes — gate and
    encode geometry derive from the coarse array's own shape, versioned
    per ``model_v`` like any retrain.

    Staleness policy: ``retrain_after`` (admitted docs
    since the active model trained — derived from the ledger) and/or
    ``retrain_drift`` (mean committed ADC error vs the model's
    training-time bound, ``adc_drift()``) auto-trigger a retrain after a
    commit.  With multiple live writers, run retrains under
    ``serialize_writers`` (the lease covers retrain too) — an
    unserialized foreign admit concurrent with a retrain would commit
    old-version rows and trip the mixed-version guard on the next gate.

    Within a batch, near-copies collapse driver-side (the batch is
    trigger-bounded by the same contract that lets it broadcast): the
    larger id of every >= threshold pair drops, mirroring the text
    gate's within-batch rule.
    """

    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        ledger_path: str,
        id_col: str = "doc_id",
        vec_col: str = "embedding",
        threshold: float = 0.9,
        n_probe: int = 8,
        margin: float = 0.0,
        n_lists: int = 64,
        auto_scale_lists: bool = False,
        m: int = 8,
        n_centroids: int | None = 64,
        sample: int = 4096,
        index_dir: str | None = None,
        writer_id: str | None = None,
        within_batch_neardup: bool = True,
        serialize_writers: bool = False,
        retrain_after: int | None = None,
        retrain_drift: float | None = None,
        drift_check_every: int = 16,
    ):
        super().__init__(
            spark,
            corpus_dir,
            ledger_path,
            id_col=id_col,
            index_dir=index_dir,
            writer_id=writer_id,
            within_batch_neardup=within_batch_neardup,
            serialize_writers=serialize_writers,
        )
        self.vec_col = vec_col
        self.sem_threshold = threshold
        self.n_probe = n_probe
        self.margin = margin
        self.n_lists = n_lists
        self.auto_scale_lists = auto_scale_lists
        self.m = m
        self.n_centroids = n_centroids
        self.sample = sample
        self.retrain_after = retrain_after
        self.retrain_drift = retrain_drift
        # drift is the one O(index) policy probe — run it every Nth
        # non-empty commit, not per micro-batch (ADVICE r11): the module
        # contract is O(ledger) per trigger in steady state
        self.drift_check_every = max(1, drift_check_every)
        self._commits_since_drift_check = 0
        # per-version model cache: version -> (coarse, books, err_bound,
        # trained_on_n).  _model_version is the version THIS process
        # gates and encodes with; it changes via our own retrain() or
        # when _foreign_version_check reconciles a COMMITTED foreign
        # retrain (concurrent ones still require serialize_writers —
        # see class docstring)
        self._models: dict[int, tuple] = {}
        self._model_version: int | None = None
        # stat signature (version, mtime_ns, size) of the newest model
        # FILE this instance has already reconciled against the committed
        # index (foreign-retrain guard); and the cached sidecar schema +
        # the file version it was resolved under
        self._file_version_seen: tuple | None = None
        self._docs_schema = None
        self._docs_schema_fv: int | None = None

    # -- model -------------------------------------------------------------
    @property
    def _model_path(self) -> str:
        return os.path.join(self.index_dir, "model.json")

    def _model_file(self, version: int) -> str:
        """v1 stays ``model.json`` (pre-r11 sidecars resolve unchanged);
        later generations are ``model_v{N}.json`` — immutable per
        version, like the bands_v2 hash-family pin."""
        if version == 1:
            return self._model_path
        return os.path.join(self.index_dir, f"model_v{version}.json")

    def _load_model(self, version: int) -> None:
        import json

        import numpy as np

        if version in self._models:
            return
        path = self._model_file(version)
        if not os.path.exists(path):
            raise RuntimeError(
                f"semantic index is encoded under model v{version} but "
                f"{path} is missing — PQ codes are meaningless without "
                "their quantizer, so the gate fails loud instead of "
                "probing with a different model (silent recall loss)"
            )
        with open(path) as fh:
            d = json.load(fh)
        self._models[version] = (
            np.asarray(d["coarse"], np.float64),
            np.asarray(d["codebooks"], np.float64),
            float(d["err_bound"]),
            int(d.get("trained_on_n", 0)),
        )

    def _latest_model_file_version(self) -> int | None:
        if not os.path.isdir(self.index_dir):
            return None
        versions = [1] if os.path.exists(self._model_path) else []
        for entry in os.listdir(self.index_dir):
            if entry.startswith("model_v") and entry.endswith(".json"):
                try:
                    versions.append(int(entry[len("model_v"):-len(".json")]))
                except ValueError:
                    continue
        return max(versions) if versions else None

    def _active_version(self) -> int | None:
        """The single model version the COMMITTED index is encoded under
        (None when nothing is committed).  A mixed-version index means a
        retrain ran concurrently with an unserialized writer — fail loud;
        ``retrain()`` re-encodes everything back to one version."""
        idx = self.committed_index()
        if idx is None:
            return None
        row = idx.agg(
            F.min("model_v").alias("a"), F.max("model_v").alias("b")
        ).first()
        if row.a is None:
            return None
        if row.a != row.b:
            raise RuntimeError(
                f"semantic index carries MIXED model versions "
                f"v{row.a}..v{row.b} — a retrain committed concurrently "
                "with another writer's old-version epoch (serialize "
                "writers to prevent this); run retrain() to re-encode "
                "the index under one model"
            )
        return int(row.a)

    def _foreign_version_check(self) -> None:
        """O(listdir) steady-state twin of the mixed-version guard, for
        LONG-LIVED writer instances: a foreign retrain always publishes
        its ``model_v{N}.json`` BEFORE its ledger commit, so a model
        file newer than anything this instance has reconciled is the
        one cheap, reliable signal that the committed version may have
        moved under us.  Only then do we pay the authoritative O(index)
        ``_active_version()`` scan — which re-raises on MIXED — and
        swap in the new model; gating or encoding with a stale cache
        would otherwise silently probe new-version PQ codes with the
        old quantizer AND commit old-version rows into the new index
        (the corruption the fail-loud guard exists to catch, which a
        pure instance cache would never re-run).

        An orphaned model file from a retrain that crashed before its
        ledger append costs ONE re-scan and is remembered by the file's
        stat SIGNATURE, not its version number: a later retrain rewrites
        the same ``model_v{N}.json`` name (new mtime/size) before
        committing, so keying on the number alone would let that commit
        slip past the guard forever.  Under ``serialize_writers`` (the
        documented multi-writer contract) the check runs inside the
        commit lease retrains also hold, so no retrain can land between
        this check and our commit."""
        if self._model_version is None:
            return
        fv = self._latest_model_file_version() or self._model_version
        if fv <= self._model_version:
            return
        try:
            st = os.stat(self._model_file(fv))
            sig = (fv, st.st_mtime_ns, st.st_size)
        except OSError:
            sig = (fv, None, None)  # listed then vanished: still probe
        if sig == self._file_version_seen:
            return  # known orphan, unchanged since last reconcile
        self._file_version_seen = sig
        v = self._active_version()  # authoritative; raises on MIXED
        if v is not None and v != self._model_version:
            self._load_model(v)
            self._model_version = v

    def _cached_version(self) -> int | None:
        """Active model version WITHOUT an O(index) scan once known:
        ``_model_version`` only changes via this writer's own retrain
        or a reconciled foreign one (``_foreign_version_check`` — an
        O(listdir) probe that only pays an index scan when a NEW model
        file appears), so after the first resolution it tracks the
        committed version.  Falls back to one ``_active_version()``
        index scan — which also enforces the mixed-version guard — for
        instances attached to a pre-existing index (ADVICE r11: the
        per-commit policy hook must not aggregate the full index per
        micro-batch)."""
        if self._model_version is None:
            v = self._active_version()
            if v is None:
                return None
            self._load_model(v)
            self._model_version = v
        else:
            self._foreign_version_check()
        return self._model_version

    def _ensure_model(self, batch: DataFrame):
        import json

        import numpy as np

        from data_pipeline_spark.llmops import pq

        if self._model_version is not None:
            # gate/encode-time guard: pick up a committed foreign
            # retrain (cheap listdir; index scan only on a new file)
            self._foreign_version_check()
            m = self._models[self._model_version]
            return m[0], m[1], m[2]
        v = self._active_version()
        if v is None:
            v = self._latest_model_file_version()
        if v is not None:
            self._load_model(v)
            self._model_version = v
            m = self._models[v]
            return m[0], m[1], m[2]
        coarse, books, err_bound = pq.semantic_model_train(
            batch,
            self.id_col,
            self.vec_col,
            n_lists=self.n_lists,
            m=self.m,
            n_centroids=self.n_centroids,
            sample=self.sample,
        )
        os.makedirs(self.index_dir, exist_ok=True)
        # atomic CREATE (O_EXCL): if two unserialized writers race to
        # train, exactly one model file wins and BOTH converge on it —
        # the loser discards its own training so no sidecar rows are
        # ever encoded under a model that model.json does not hold.
        # (serialize_writers=True makes the race impossible; this keeps
        # the index coherent even without the lock.)
        payload = json.dumps(
            {
                "coarse": coarse.tolist(),
                "codebooks": books.tolist(),
                "err_bound": err_bound,
                "version": 1,
                "trained_on_n": 0,  # nothing committed before first train
            }
        )
        try:
            fd = os.open(
                self._model_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
            with os.fdopen(fd, "w") as fh:
                fh.write(payload)
        except FileExistsError:
            self._load_model(1)
            self._model_version = 1
            m = self._models[1]
            return m[0], m[1], m[2]
        self._models[1] = (coarse, books, err_bound, 0)
        self._model_version = 1
        return coarse, books, err_bound

    # -- protocol hooks ----------------------------------------------------
    def _index_of(self, admitted: DataFrame) -> DataFrame:
        from data_pipeline_spark.llmops import pq

        coarse, books, _err = self._ensure_model(admitted)
        return pq.semantic_index_rows(
            admitted, coarse, books, self.id_col, self.vec_col
        ).withColumn("model_v", F.lit(int(self._model_version or 1)))

    def _index_cols(self) -> list[str]:
        return [
            "cor_id", "embedding", "vnorm", "codes", "list_id", "adc_err",
            "model_v",
        ]

    def _index_layout(self, idx: DataFrame, bulk: bool) -> DataFrame:
        """Cluster the ANN sidecar by coarse list (r11 verdict item #4 —
        the served IVF layout's shape, inside the ledger protocol's
        (writer, epoch) partitions): compact/retrain rewrites range-
        partition on (list_id, cor_id) so each output file covers a
        narrow list range and the gate's pushed ``list_id IN`` filter
        skips non-probed files outright via row-group stats; per-trigger
        appends only sort locally (no shuffle per micro-batch — their
        total size is bounded by the triggers since the last compact)."""
        if bulk:
            idx = idx.repartitionByRange(
                self.spark.sparkContext.defaultParallelism,
                "list_id",
                "cor_id",
            )
        return idx.sortWithinPartitions("list_id")

    def _read_docs(self) -> DataFrame:
        """Sidecar read with model-version back-compat, applied PER ROW
        and at O(1) steady-state cost.

        Pre-r11 index rows have no ``model_v`` column and are by
        definition the one implicit model generation (v1).  Back-compat
        is per row, not per directory (ADVICE r11): null model_v
        coalesces to 1, so a dir that legitimately mixes pre-r11 files
        with post-retrain v2 files (the crash window between _retrain's
        ledger append and its superseded-partition cleanup) surfaces as
        a MIXED index to ``_active_version``'s guard — never as v1
        stamped over v2 rows, which would silently probe v2 PQ codes
        with the v1 quantizer.

        Cost discipline: ``mergeSchema`` launches an all-file
        footer-union job, which at thousands of per-epoch files would
        make EVERY gate trigger O(files) — against the module's
        O(ledger)-per-trigger contract.  So the merged schema is
        resolved ONCE and cached; later reads pass it explicitly (no
        inference job at all — parquet fills files that lack a schema
        column with nulls, which the coalesce then stamps v1).  The
        cache is keyed to the newest model FILE version (one listdir):
        new model generations are the only events that can evolve the
        sidecar schema, and every retrain publishes its model file
        before committing rows, so the key changes before any new-shape
        row can be read."""
        fv = self._latest_model_file_version()
        if self._docs_schema is not None and fv != self._docs_schema_fv:
            self._docs_schema = None
        if self._docs_schema is None:
            raw = self.spark.read.option("mergeSchema", "true").parquet(
                self._docs_dir
            )
            if "model_v" not in raw.columns:
                raw = raw.withColumn("model_v", F.lit(1))
            self._docs_schema = raw.schema
            self._docs_schema_fv = fv
        else:
            raw = self.spark.read.schema(self._docs_schema).parquet(
                self._docs_dir
            )
        return raw.withColumn(
            "model_v", F.coalesce(F.col("model_v"), F.lit(1))
        )

    # -- lifecycle ----------------------------------------------------------
    def adc_drift(self) -> float | None:
        """Mean per-row ADC error bound of the committed index relative
        to the active model's training-time bound — grows as the corpus
        distribution drifts away from the codebooks' training sample
        (residuals quantize worse), the signal that PQ candidate cuts
        are getting looser.  None when nothing is committed."""
        v = self._cached_version()
        if v is None:
            return None
        err_bound = self._models[v][2]
        if not err_bound:
            return None
        idx = self.committed_index()
        m = idx.agg(F.avg("adc_err")).first()[0]
        return None if m is None else float(m) / float(err_bound)

    def should_retrain(self) -> bool:
        """Staleness policy (both opt-in, OR-ed): the committed live
        corpus grew by >= ``retrain_after`` docs since the active model
        trained, or ``adc_drift()`` exceeds ``retrain_drift``.

        Cost discipline (ADVICE r11): this runs after every non-empty
        commit, so it must stay inside the module's O(ledger)-per-trigger
        steady state — the version comes from the instance cache (no
        index min/max scan), the growth check reads the LEDGER, and the
        one O(index) probe (adc_drift's avg over committed adc_err) runs
        only every ``drift_check_every``-th non-empty commit."""
        if self.retrain_after is None and self.retrain_drift is None:
            return False
        v = self._cached_version()
        if v is None:
            return False
        if self.retrain_after is not None:
            stats = self.ingest_stats()
            live = 0
            if stats is not None:
                live = stats.agg(F.sum("n_admitted_live")).first()[0] or 0
            if live - self._models[v][3] >= self.retrain_after:
                return True
        if self.retrain_drift is not None:
            self._commits_since_drift_check += 1
            if self._commits_since_drift_check >= self.drift_check_every:
                self._commits_since_drift_check = 0
                d = self.adc_drift()
                if d is not None and d > self.retrain_drift:
                    return True
        return False

    def retrain(self) -> int:
        """Retrain the PQ model on the COMMITTED corpus and atomically
        re-encode the whole index under it — the compact() protocol with
        re-derived index rows: the new model file publishes first (it is
        unreferenced debris until the commit), corpus + re-encoded index
        rows land in a fresh compact-writer partition, and ONE ledger
        append commits the new pair while revoking every superseded one.
        Crash before that append: the old single-version index stays
        fully live (orphan partitions vacuum away, the orphan model file
        is overwritten by the next retrain).  Crash after: the new index
        is live, superseded dirs are invisible until vacuumed.  Returns
        the re-encoded doc count (0 when nothing is committed)."""
        if not self.serialize_writers:
            return self._retrain()
        from data_pipeline_spark.coordination import LeaseLock

        with LeaseLock(
            "ingest-commit",
            "corpus",
            root=os.path.join(self.index_dir, "locks"),
            lease_seconds=300,
        ):
            return self._retrain()

    def _lists_for(self, n_docs: int) -> int:
        """Coarse list count for a retrain over ``n_docs`` committed
        documents: the constructor value when ``auto_scale_lists`` is
        off, else ``~sqrt(n_docs)`` clamped to [constructor n_lists,
        4096] — never shrinking below the configured floor, capped where
        the driver-side k-means sample (``max(sample, n_lists)`` rows)
        stays trivially collectable."""
        if not self.auto_scale_lists:
            return self.n_lists
        import math

        return max(
            self.n_lists,
            min(4096, int(round(math.sqrt(max(1, n_docs))))),
        )

    def _retrain(self) -> int:
        import json
        import uuid

        from data_pipeline_spark.llmops import pq

        self.vacuum()
        snapshot = self._committed_pairs()
        if snapshot is None:
            return 0
        pairs = [(r[0], r[1]) for r in snapshot.collect()]
        if not pairs:
            return 0
        new_v = (self._active_version() or 1) + 1
        corpus = self.corpus().persist()
        try:
            n_docs = corpus.count()
            n_lists_eff = self._lists_for(n_docs)
            coarse, books, err_bound = pq.semantic_model_train(
                corpus,
                self.id_col,
                self.vec_col,
                n_lists=n_lists_eff,
                m=self.m,
                n_centroids=self.n_centroids,
                # hold >=4 training points per coarse cluster as the
                # auto-scaled list count approaches the configured
                # sample, or the k-means degenerates to one-point lists
                # (cap keeps the driver-side collect <=16384 rows)
                sample=max(self.sample, 4 * n_lists_eff),
            )
            path = self._model_file(new_v)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                fh.write(
                    json.dumps(
                        {
                            "coarse": coarse.tolist(),
                            "codebooks": books.tolist(),
                            "err_bound": err_bound,
                            "version": new_v,
                            "trained_on_n": n_docs,
                        }
                    )
                )
            os.replace(tmp, path)
            self._chaos("retrain_after_model")
            cw = "c" + uuid.uuid4().hex[:12]
            corpus.withColumn(_WRITER_COL, F.lit(cw)).withColumn(
                _EPOCH_COL, F.lit(0)
            ).write.mode("append").partitionBy(_WRITER_COL, _EPOCH_COL).parquet(
                self.corpus_dir
            )
            self._chaos("retrain_after_corpus")
            idx = (
                pq.semantic_index_rows(
                    corpus, coarse, books, self.id_col, self.vec_col
                )
                .withColumn("model_v", F.lit(new_v))
                .withColumn(_WRITER_COL, F.lit(cw))
                .withColumn(_EPOCH_COL, F.lit(0))
            )
            self._index_layout(idx, bulk=True).write.mode(
                "append"
            ).partitionBy(_WRITER_COL, _EPOCH_COL).parquet(self._docs_dir)
            self._chaos("retrain_before_ledger")
            ledger_rows = [(0, n_docs, cw)] + [(e, -1, w) for w, e in pairs]
            self.spark.createDataFrame(
                ledger_rows,
                f"epoch_id LONG, n_admitted LONG, {_WRITER_COL} STRING",
            ).write.mode("append").partitionBy(_WRITER_COL).parquet(
                self._ledger_dir
            )
            self._chaos("retrain_after_ledger")
            for base in (self.corpus_dir, self._docs_dir):
                for w, e in pairs:
                    p = os.path.join(
                        base, f"{_WRITER_COL}={w}", f"{_EPOCH_COL}={e}"
                    )
                    if os.path.isdir(p):
                        shutil.rmtree(p)
        finally:
            corpus.unpersist()
        self._models[new_v] = (coarse, books, err_bound, n_docs)
        self._model_version = new_v
        return n_docs

    def admit_batch(self, batch: DataFrame, epoch_id: int) -> int:
        n = super().admit_batch(batch, epoch_id)
        if n and self.should_retrain():
            self.retrain()
        return n

    # -- gate --------------------------------------------------------------
    def _within_batch_losers(self, batch: DataFrame) -> list[int]:
        """Larger id of every within-batch >= threshold pair (driver
        pairwise over the trigger-bounded batch — the semantic twin of
        the text gate's ngram_jaccard_pairs collapse)."""
        import numpy as np

        rows = batch.select(
            F.col(self.id_col).cast("long").alias("i"),
            F.col(self.vec_col).alias("v"),
        ).filter(F.col("v").isNotNull()).collect()
        if len(rows) < 2:
            return []
        ids = np.asarray([r.i for r in rows], np.int64)
        x = np.asarray([r.v for r in rows], np.float64)
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        sims = (x / n[:, None]) @ (x / n[:, None]).T
        losers: set[int] = set()
        ii, jj = np.where(np.triu(sims >= self.sem_threshold, k=1))
        for a, b in zip(ii, jj):
            losers.add(int(max(ids[a], ids[b])))
        return sorted(losers)

    def gate_batch(self, batch: DataFrame) -> DataFrame:
        from data_pipeline_spark.llmops import pq

        if batch.isEmpty():  # an empty FIRST trigger must not train
            return batch
        coarse, books, _err = self._ensure_model(batch)
        if self.within_batch_neardup:
            losers = self._within_batch_losers(batch)
            if losers:
                batch = batch.filter(~F.col(self.id_col).isin(losers))
        index = self.committed_index()
        if index is None:
            return batch
        flags = pq.semantic_gate_flags(
            index,
            batch,
            coarse,
            books,
            self.id_col,
            self.vec_col,
            threshold=self.sem_threshold,
            n_probe=self.n_probe,
            margin=self.margin,
        )
        return batch.join(
            flags.filter(F.col("keep") == 1).select(self.id_col), self.id_col
        )

    def gate_flags(self, batch: DataFrame) -> DataFrame:
        from data_pipeline_spark.llmops import pq

        index = self.committed_index()
        if index is None or batch.isEmpty():
            return batch.select(
                F.col(self.id_col),
                F.lit(0).alias("near_dup"),
                F.lit(None).cast("double").alias("best_cos"),
                F.lit(1).alias("keep"),
            )
        coarse, books, _err = self._ensure_model(batch)
        return pq.semantic_gate_flags(
            index,
            batch,
            coarse,
            books,
            self.id_col,
            self.vec_col,
            threshold=self.sem_threshold,
            n_probe=self.n_probe,
            margin=self.margin,
        )
