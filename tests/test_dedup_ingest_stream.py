"""Streaming dedup-at-ingest (streaming/dedup_ingest.py): the corpus front
door — near-dup drop against the persisted index, canonical election within
the batch, survivor append + index, exactly-once across three tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex
from nostr_data_pipeline_spark.streaming.dedup_ingest import (
    DOC_SCHEMA,
    StreamingDedupIngest,
)
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable


BASE = "the quick brown fox jumps over the lazy dog again and again %s"


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


def _mk(spark, tmp_path, threshold=0.5):
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"), num_buckets=4)
    corpus = SnapshotTable(str(tmp_path / "corpus"), key_cols=("doc_id",),
                           num_buckets=4)
    job = StreamingDedupIngest(
        idx, corpus, str(tmp_path / "docs"), str(tmp_path / "ckpt"),
        threshold=threshold, max_files_per_trigger=1,
        audit_dir=str(tmp_path / "audit"),
    )
    return idx, corpus, job


def test_stream_drops_near_dups_and_keeps_canonicals(spark, tmp_path):
    docs = str(tmp_path / "docs")
    # file 1 (batch 1): 1-2 near-dups of each other (within-batch cluster,
    # min id 1 is canonical); 3 unique
    _write_docs(spark, docs, [
        (1, BASE % "one", 10),
        (2, BASE % "one extra", 10),
        (3, "completely different words describing other things entirely", 10),
    ])
    # file 2 (batch 2): 4 near-dups the INDEXED doc 1 (cross-batch ->
    # dup_src='index'); 5 unique
    _write_docs(spark, docs, [
        (4, BASE % "one", 11),
        (5, "yet another wholly unrelated document body right here", 11),
    ])
    idx, corpus, job = _mk(spark, tmp_path)
    metrics = job.run_to_completion(spark)

    kept = sorted(r["doc_id"] for r in corpus.read(spark).collect())
    assert kept == [1, 3, 5]
    assert sum(m.get("docs_dropped", 0) for m in metrics) == 2
    # the cross-batch rejection is attributed to the INDEX
    audit = spark.read.parquet(str(tmp_path / "audit"))
    by_doc = {r["doc_id"]: r["dup_src"] for r in audit.collect()}
    assert by_doc[4] == "index"
    assert by_doc[2] == "batch"
    # survivors are indexed: a later batch near-duplicating doc 5 drops too
    _write_docs(spark, docs, [(6, "yet another wholly unrelated document "
                                  "body right here now", 12)])
    job2 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        threshold=0.5, max_files_per_trigger=1,
        audit_dir=str(tmp_path / "audit"))
    job2.run_to_completion(spark)
    assert sorted(r["doc_id"] for r in corpus.read(spark).collect()) \
        == [1, 3, 5]


def test_stream_restart_is_exactly_once(spark, tmp_path):
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs, [
        (1, BASE % "alpha", 1), (2, BASE % "alpha two", 1),
    ])
    idx, corpus, job = _mk(spark, tmp_path)
    job.run_to_completion(spark)
    v1 = corpus.current_version()
    # restart over the same checkpoint: nothing new -> no new commits
    job2 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        threshold=0.5, max_files_per_trigger=1)
    job2.run_to_completion(spark)
    assert corpus.current_version() == v1
    # a FRESH checkpoint gets its own marker namespace (batch ids are only
    # meaningful within one checkpoint — reusing an old marker could skip
    # never-ingested files), so it re-processes; the seq-guarded merges
    # and the replay-stable kept-set make that converge to the IDENTICAL
    # corpus state, just with re-done work
    job3 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt2"),
        threshold=0.5, max_files_per_trigger=1)
    m3 = job3.run_to_completion(spark)
    assert not any(m.get("skipped_replay") for m in m3)
    rows = corpus.read(spark).select("doc_id", "text", "seq").collect()
    assert sorted((r["doc_id"], r["text"], r["seq"]) for r in rows) == [
        (1, BASE % "alpha", 1)]
    # and new files arriving for the fresh checkpoint ARE ingested (the
    # data-loss shape the old cross-checkpoint marker comparison had)
    _write_docs(spark, docs, [(9, "brand new content arriving after the "
                                  "checkpoint was replaced entirely", 2)])
    job4 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt2"),
        threshold=0.5, max_files_per_trigger=1)
    job4.run_to_completion(spark)
    assert sorted(r["doc_id"] for r in corpus.read(spark).collect()) == [1, 9]


def test_corpus_key_guard(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "i2"), num_buckets=4)
    wrong = SnapshotTable(str(tmp_path / "c2"))  # default (repo, path) keys
    with pytest.raises(ValueError, match="keyed by \\('doc_id',\\)"):
        StreamingDedupIngest(idx, wrong, "x", "y")


def test_revision_updates_survive_seq_guard(spark, tmp_path):
    """A revised doc (higher seq) replaces its corpus row; a stale replay
    (lower seq) is a no-op — the MERGE seq guard applies to the corpus."""
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs, [(7, "original document text body " * 3, 5)])
    idx, corpus, job = _mk(spark, tmp_path)
    job.run_to_completion(spark)
    _write_docs(spark, docs, [(7, "revised document text body entirely "
                                  "different now " * 3, 6)])
    job2 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        threshold=0.5, max_files_per_trigger=1)
    job2.run_to_completion(spark)
    row = corpus.read(spark).filter(F.col("doc_id") == 7).first()
    assert row["seq"] == 6 and row["text"].startswith("revised")


def test_maintain_every_runs_index_maintenance(spark, tmp_path):
    """maintain_every=1: after each applied batch the index's stale band
    rows are vacuumed and all three tables compact — state stays correct
    (same corpus as without maintenance) and a revised doc's stale band
    rows are gone."""
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs, [(1, "original body of document one " * 4, 1)])
    _write_docs(spark, docs, [(1, "totally rewritten body now quite "
                                  "different " * 4, 2)])
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"), num_buckets=4)
    corpus = SnapshotTable(str(tmp_path / "corpus"), key_cols=("doc_id",),
                           num_buckets=4)
    job = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        threshold=0.5, max_files_per_trigger=1, maintain_every=1)
    job.run_to_completion(spark)
    row = corpus.read(spark).filter(F.col("doc_id") == 1).first()
    assert row["seq"] == 2 and row["text"].startswith("totally")
    # stale band rows (seq < current sig seq) were vacuumed by the cadence
    bands = idx.bands_table.read(spark, seq_col="seq")
    assert bands.filter(F.col("seq") < 2).count() == 0
    assert bands.filter(F.col("seq") == 2).count() > 0


def test_two_revisions_of_one_doc_in_one_batch(spark, tmp_path):
    """An at-least-once source delivering two revisions of one doc in a
    single micro-batch must yield ONE corpus row — the (seq, text) winner,
    matching the signature the index stored (MinHashIndex._sig_frame uses
    the same rule)."""
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs, [
        (5, "first revision of the document body " * 3, 1),
        (5, "second revision entirely different content " * 3, 2),
        (5, "second revision entirely different content " * 3, 2),  # redelivery
    ])
    idx, corpus, job = _mk(spark, tmp_path)
    job.run_to_completion(spark)
    rows = corpus.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["seq"] == 2 and rows[0]["text"].startswith("second")


def test_accept_filter_gates_before_dedup(spark, tmp_path):
    """Docs failing accept_filter are rejected before any hashing: not in
    the corpus, not in the index, counted in docs_filtered."""
    docs = str(tmp_path / "docs")
    _write_docs(spark, docs, [
        (1, "long enough document body to pass the quality gate " * 2, 1),
        (2, "short", 1),  # fails the filter
    ])
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"), num_buckets=4)
    corpus = SnapshotTable(str(tmp_path / "corpus"), key_cols=("doc_id",),
                           num_buckets=4)
    job = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        threshold=0.5, max_files_per_trigger=1,
        accept_filter="length(text) > 32")
    metrics = job.run_to_completion(spark)
    assert metrics[0]["docs_filtered"] == 1
    assert sorted(r["doc_id"] for r in corpus.read(spark).collect()) == [1]
    assert idx.sigs_table.read(spark, seq_col="seq").filter(
        F.col("doc_id") == 2).count() == 0


def test_decontaminate_at_ingest_drops_eval_overlap(spark, tmp_path):
    """decontaminate_against: a batch doc sharing a 5-gram with the eval
    parquet is dropped BEFORE dedup — never indexed, never in the corpus —
    and the gate is replay-stable across a fresh run of the same stream."""
    docs = str(tmp_path / "docs")
    ev = str(tmp_path / "eval")
    spark.createDataFrame(
        [(900, "guard this exact benchmark phrase forever please")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(ev)
    _write_docs(spark, docs, [
        (1, "contains guard this exact benchmark phrase forever among words", 1),
        (2, BASE % "clean", 1),
    ])
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"), num_buckets=4)
    corpus = SnapshotTable(str(tmp_path / "corpus"), key_cols=("doc_id",),
                           num_buckets=4)
    job = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt"),
        decontaminate_against=ev,
    )
    [m] = job.run_to_completion(spark)
    assert m["docs_contaminated"] == 1
    assert m["docs_in"] == 1          # the gate runs before dedup accounting
    kept_ids = [r["doc_id"] for r in corpus.read(spark, seq_col="seq").collect()]
    assert kept_ids == [2]
    # replay with a FRESH checkpoint converges to the identical corpus
    job2 = StreamingDedupIngest(
        idx, corpus, docs, str(tmp_path / "ckpt2"),
        decontaminate_against=ev,
    )
    [m2] = job2.run_to_completion(spark)
    assert m2["docs_contaminated"] == 1
    assert sorted(
        r["doc_id"] for r in corpus.read(spark, seq_col="seq").collect()
    ) == [2]
