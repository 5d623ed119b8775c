"""Streaming dedup-at-ingest: the training-corpus front door.

Tails a document stream, drops every micro-batch doc that near-duplicates
the already-accepted corpus (or a same-batch canonical), appends the
survivors to a corpus :class:`SnapshotTable`, and indexes them in the
persisted :class:`MinHashIndex` — exactly-once end to end. This is the
streaming composition of the pieces the engine already verifies one level
down: ``MinHashIndex.check/add`` (value-verified against the DuckDB
replica via the ``dedup_incremental`` contract query), connected-component
canonical election, and the seq-guarded MERGE.

Reference parity: the reference's ingest loop answers "have I seen this
event id" with a PK probe before insert
(/root/reference/src/nostr_pipeline/loaders/event_loader.py:31-40
save_event: ``session.get(NostrEvent, id)`` then skip on existence); this
job asks the generalized question a 100 TB training pipeline
needs — "have I already accepted something 90%-similar" — at the same
point in the topology.

Exactly-once across THREE tables without a cross-table transaction:
each table (corpus, index bands, index sigs) carries its own idempotent
``(stream_id, batch_id)`` commit marker, so any crash/replay interleaving
re-runs only the un-committed merges. The re-run's ``check`` may then see
an index that already contains this batch's survivors — that is safe by
construction:

- a survivor's only index collision is with its OWN band rows, which the
  ``doc_id != dup_of`` filter excludes, so survivors re-survive;
- a dropped doc re-drops: its cluster's canonical is in the index now, so
  it matches via ``dup_src='index'`` instead of ``'batch'`` — same
  decision, different audit label;
- the corpus merge is seq-guarded, so re-applying the same kept rows is a
  no-op even without its marker.

The KEPT-SET is therefore replay-stable, which is the invariant the
corpus's correctness needs; only the audit trail's ``dup_src`` labels can
differ across a mid-batch crash.

Scale shape: every per-batch job is micro-batch-sized or index-probe-sized
(see MinHashIndex.check — the index is bucket-pruned and never shuffled);
the corpus append is a file-pruned MERGE. Nothing here is proportional to
corpus size except the pruned probes.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

# default wire schema for a document stream: a stable id, the text, and a
# monotonically increasing revision (re-delivered / revised docs carry a
# higher seq; the corpus MERGE and the index are both seq-guarded on it)
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("seq", T.LongType()),
])


class StreamingDedupIngest:
    def __init__(
        self,
        index: MinHashIndex,
        corpus: SnapshotTable,
        doc_dir: str,
        checkpoint_dir: str,
        stream_id: str = "dedup-ingest",
        threshold: float = 0.5,
        max_files_per_trigger: int | None = None,
        audit_dir: str | None = None,
        source_factory=None,
        maintain_every: int | None = None,
        accept_filter: str | None = None,
        decontaminate_against: str | None = None,
        decontaminate_ngram: int = 5,
    ):
        """``corpus`` must be keyed by ``doc_id`` (created here if absent).
        ``audit_dir``: optional rejection audit — each micro-batch's
        ``(doc_id, dup_of, est_jaccard, dup_src)`` pairs land in a
        per-batch_id subdirectory written with overwrite semantics, so a
        replayed batch rewrites its own audit instead of duplicating it
        (the jobs.py router discipline).

        ``accept_filter``: optional SQL predicate applied to each batch
        BEFORE dedup (e.g. a quality/language gate —
        ``functions.content.quality_score`` composes here). Cheapest-first
        ordering: a filtered-out doc never pays shingling, hashing, or an
        index probe, the corpus_prepare discipline applied at the stream
        head. Filtered docs are neither indexed nor audited.

        ``decontaminate_against``: optional path to an eval/benchmark
        documents parquet (doc_id, text). Each micro-batch doc sharing any
        ``decontaminate_ngram``-gram with the eval set is dropped BEFORE
        dedup — contamination-at-ingest, the streaming form of
        ``corpus.decontaminate``. The eval gram set is derived once,
        deduped and persisted (eval sets are small by construction), and
        each batch anti-joins against its broadcast — O(batch) per batch.
        The gate is a pure function of the eval parquet, so the kept-set
        stays replay-stable PROVIDED the eval set is not edited mid-stream
        (swap files atomically between runs, not during one).

        ``maintain_every``: every k APPLIED batches (process-local count,
        advisory — unlike the replayer's fold cadence this maintenance is
        purely an optimization, so a missed window under availableNow
        restarts costs bytes, never correctness), run the index's
        maintenance pass: ``vacuum_stale_bands`` (tombstone band rows
        orphaned by document revisions) and compaction of all three
        tables' small files."""
        if tuple(corpus.key_cols) != ("doc_id",):
            raise ValueError(
                f"corpus table must be keyed by ('doc_id',), got "
                f"{tuple(corpus.key_cols)} — construct it as "
                f"SnapshotTable(path, key_cols=('doc_id',))"
            )
        self.index = index
        self.corpus = corpus
        self.doc_dir = doc_dir
        self.checkpoint_dir = checkpoint_dir
        self.stream_id = stream_id
        self.threshold = threshold
        self.max_files_per_trigger = max_files_per_trigger
        self.audit_dir = audit_dir
        self.source_factory = source_factory
        self.maintain_every = maintain_every
        self.accept_filter = accept_filter
        self.decontaminate_against = decontaminate_against
        self.decontaminate_ngram = decontaminate_ngram
        self._eval_grams: DataFrame | None = None
        self._applied = 0
        self.batch_metrics: list[dict[str, Any]] = []

    def _source(self, spark: SparkSession) -> DataFrame:
        if self.source_factory is not None:
            return self.source_factory(spark)
        reader = spark.readStream.schema(DOC_SCHEMA)
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.parquet(self.doc_dir)

    def _marker_id(self) -> str:
        """Marker key scoped to THIS checkpoint incarnation. Batch ids are
        only meaningful within one checkpoint: a fresh/replaced checkpoint
        restarts at batch 0 with a possibly different file-to-batch
        assignment, so comparing its ids against an old marker could skip
        never-ingested files (silent data loss). Scoping the marker makes a
        new checkpoint re-process from scratch instead — harmless, because
        every downstream merge is key-idempotent and seq-guarded and the
        kept-set is replay-stable (module docstring): re-ingestion converges
        to the identical state, it just does the work again."""
        import hashlib

        ck = hashlib.sha256(
            os.path.abspath(self.checkpoint_dir).encode()).hexdigest()[:8]
        return f"{self.stream_id}@{ck}"

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        marker = self._marker_id()
        # corpus marker = the batch's overall exactly-once gate (the index
        # tables keep their own; see module docstring for why any partial
        # interleaving converges)
        m = self.corpus.manifest() if self.corpus.exists() else None
        last = (m or {}).get("commits", {}).get(marker)
        if last is not None and batch_id <= last:
            self.batch_metrics.append(
                {"batch_id": batch_id, "skipped_replay": True})
            return
        # normalize seq ONCE for every consumer: the index's seq guard and
        # the corpus merge must see the SAME value, or a null-seq stream
        # lets the corpus row advance on the text tie-break while the index
        # signature can never be replaced — silent corpus/index divergence
        batch = batch.withColumn(
            "seq", F.coalesce(F.col("seq"), F.lit(0)).cast("long"))
        n_rejected = 0
        if self.accept_filter:
            # cheapest gate first: a rejected doc never pays shingling,
            # hashing, or an index probe
            before = batch.count()
            batch = batch.filter(F.expr(self.accept_filter))
            n_rejected = before - batch.count()
        n_contaminated = 0
        if self.decontaminate_against:
            from nostr_data_pipeline_spark.operators.corpus import ngram_set

            spark = batch.sparkSession
            if self._eval_grams is None:
                # static, tiny by construction — derive once, keep cached
                # (MEMORY_ONLY: LRU-evictable, the library-operator rule)
                from pyspark import StorageLevel

                ev = spark.read.parquet(self.decontaminate_against)
                self._eval_grams = (
                    ngram_set(ev, self.decontaminate_ngram)
                    .select("gram").distinct()
                    .persist(StorageLevel.MEMORY_ONLY)
                )
            hits = (
                ngram_set(batch, self.decontaminate_ngram)
                .join(F.broadcast(self._eval_grams), "gram")
                .select("doc_id").distinct()
            )
            n_contaminated = hits.count()
            if n_contaminated:
                batch = batch.join(hits, "doc_id", "left_anti")
        res = self.index.ingest(
            batch.sparkSession, batch,
            id_col="doc_id", text_col="text", seq_col="seq",
            threshold=self.threshold,
            stream_id=marker, batch_id=batch_id,
        )
        if self.audit_dir:
            # overwrite-per-batch_id: a replayed batch rewrites its audit
            res["pairs"].write.mode("overwrite").parquet(
                os.path.join(self.audit_dir, f"batch_id={batch_id}"))
        # collapse to ONE row per kept doc — an at-least-once source can
        # deliver a doc twice in one batch (redelivery or revisions), and
        # the MERGE requires a unique key per source row. Winner rule
        # (seq, text) matches the index's own per-doc resolution
        # (MinHashIndex._sig_frame), so corpus text == indexed text.
        kept = (
            res["kept"].select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text"), F.col("seq"))
            .groupBy("doc_id")
            .agg(F.max_by(F.col("text"),
                          F.struct(F.col("seq"), F.col("text"))).alias("text"),
                 F.max("seq").alias("seq"))
        )
        cm = self.corpus.merge(
            batch.sparkSession, kept,
            seq_col="seq", tie_col="text",
            stream_id=marker, batch_id=batch_id,
            extra_metrics={
                "docs_in": res["metrics"]["docs_in"],
                "docs_dropped": res["metrics"]["docs_dropped"],
            },
        )
        self.batch_metrics.append(
            {"batch_id": batch_id, **res["metrics"],
             "docs_filtered": n_rejected,
             "docs_contaminated": n_contaminated,
             # batch CONTRIBUTION, not rewritten-file row counts (a CoW
             # merge's rows_written includes unchanged carried rows)
             "corpus_rows_written": sum(
                 cm.get(k, 0) or 0
                 for k in ("rows_inserted", "rows_updated", "rows_deleted"))})
        self._applied += 1
        if self.maintain_every and self._applied % self.maintain_every == 0:
            spark = batch.sparkSession
            self.index.vacuum_stale_bands(spark)
            self.index.bands_table.compact(spark)
            self.index.sigs_table.compact(spark)
            self.corpus.compact(spark)

    def start(self, spark: SparkSession, available_now: bool = True,
              processing_time: str | None = None):
        if not self.corpus.exists():
            schema = T.StructType(list(DOC_SCHEMA.fields))
            self.corpus.create(schema)
        writer = (
            self._source(spark)
            .writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if processing_time:
            writer = writer.trigger(processingTime=processing_time)
        elif available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, spark: SparkSession) -> list[dict[str, Any]]:
        q = self.start(spark, available_now=True)
        q.awaitTermination()
        return self.batch_metrics
