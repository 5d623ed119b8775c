"""Training-corpus preparation tour: the LLM-data operators composed the way
a 100 TB pipeline would run them.

  1. quality score + language allowlist (pure column exprs — pushed to scan),
  2. near-duplicate pairs (n-gram Jaccard here; swap in MinHash-LSH /
     SimHash / embedding-cosine for corpus scale — same pair shape),
  3. connected components -> canonical election (keep one doc per cluster),
  4. token accounting over the kept corpus (whitespace + BPE-style),
  5. STREAMING dedup-at-ingest: the same dedup running at the corpus front
     door — new micro-batches checked against the persisted MinHashIndex,
     survivors appended + indexed, exactly-once.

Run:  python examples/prepare_training_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.analytics import corpus_prepare, load
from nostr_data_pipeline_spark.operators.dedup import (
    canonical_docs,
    minhash_near_duplicates,
    release_dedup_caches,
)
from nostr_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("prepare-corpus", cores="8")

    docs = load(spark, sf_dir, "documents")
    print(f"input docs: {docs.count()}")

    # one composed, oracle-checked plan: filter -> dedup -> account
    kept = corpus_prepare(spark, sf_dir)
    kept.show(5)
    stats = kept.agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).first()
    print(f"kept: {stats['docs_kept']} docs / {stats['tokens_kept']} tokens "
          f"(avg quality {stats['avg_quality']})")

    # --- corpus hygiene: decontaminate -> filter -> scrub -> mix -> pack ----
    from nostr_data_pipeline_spark.operators.corpus import (
        decontaminate,
        pack_sequences,
        repetition_metrics,
        scrub_pii,
        select_token_budget,
    )

    eval_set = docs.filter(F.col("doc_id") % 13 == 0)   # stand-in benchmark
    train = docs.filter(F.col("doc_id") % 13 != 0)
    dirty = decontaminate(train, eval_set, n=5)
    print(f"decontamination: {dirty.count()} train docs share a 5-gram "
          f"with the eval set")

    clean = train.join(dirty.select("doc_id"), "doc_id", "left_anti")
    rep = repetition_metrics(clean)
    kept_rep = rep.filter("passes").select("doc_id", "n_tokens")
    print(f"repetition filter: {kept_rep.count()} of {rep.count()} pass")

    scrubbed = scrub_pii(clean.join(kept_rep.select("doc_id"), "doc_id"))
    redacted = scrubbed.agg(
        F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_digit_run"))
    ).first()[0]
    print(f"pii scrub: {redacted} spans redacted")

    mixed = select_token_budget(
        clean.join(kept_rep, "doc_id")
        .select("doc_id", "lang", F.lit(1.0).alias("quality"), "n_tokens"),
        budget=2000,
    )
    packed = pack_sequences(mixed.select("doc_id", "n_tokens"), budget=256)
    n_seqs = packed.select("grp", "seq").distinct().count()
    print(f"mix+pack: {mixed.count()} docs packed into {n_seqs} sequences")

    # the corpus-scale pair generator: MinHash-LSH instead of exact Jaccard
    pairs = minhash_near_duplicates(docs, threshold=0.5)
    clusters = canonical_docs(docs, pairs)
    n_dupes = clusters.filter(~F.col("is_canonical")).count()
    print(f"minhash-lsh route: {n_dupes} non-canonical near-dupes removed")

    release_dedup_caches()

    # --- 5. the same dedup as a STREAMING front door -----------------------
    import tempfile

    from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex
    from nostr_data_pipeline_spark.streaming.dedup_ingest import (
        DOC_SCHEMA,
        StreamingDedupIngest,
    )
    from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="ingest-demo-")
    stream_docs = os.path.join(tmp, "docs")
    # two "arriving" micro-batch files; the second near-duplicates the first
    docs.select("doc_id", "text", F.lit(1).cast("long").alias("seq")) \
        .limit(200).coalesce(1).write.parquet(stream_docs)
    docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
                F.lit(2).cast("long").alias("seq")) \
        .limit(50).coalesce(1).write.mode("append").parquet(stream_docs)
    job = StreamingDedupIngest(
        MinHashIndex.create(spark, os.path.join(tmp, "idx"), num_buckets=4),
        SnapshotTable(os.path.join(tmp, "corpus"), key_cols=("doc_id",),
                      num_buckets=4),
        stream_docs, os.path.join(tmp, "ckpt"),
        threshold=0.5, max_files_per_trigger=1,
    )
    for m in job.run_to_completion(spark):
        print(f"ingest batch {m['batch_id']}: in={m.get('docs_in')} "
              f"dropped={m.get('docs_dropped')} kept={m.get('docs_kept')}")

    spark.stop()


if __name__ == "__main__":
    main()
