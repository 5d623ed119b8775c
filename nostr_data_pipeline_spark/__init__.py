"""nostr_data_pipeline_spark — a brand-new PySpark-native CDC / incremental-ingest
analytics engine.

Re-imagines the capabilities of the reference pipeline
(`uncoated-engineering/nostr-data-pipeline`, an asyncio relay-tail ETL — see
/root/reference) as an idiomatic Spark engine:

- ``cdc``        change-log replayer: dedup -> last-writer-wins -> MERGE upsert
                 with exactly-once commit markers, schema evolution, lineage.
- ``tables``     a from-scratch snapshot table format (Iceberg-style manifest +
                 atomic version pointer over parquet) since no Iceberg runtime
                 jar ships in this environment.
- ``functions``  vectorized content functions (sha256 fingerprint via pandas
                 UDF, hashtag/url/media/lang extraction as JVM-side columns).
- ``operators``  the analytics query surface (filters, aggregations, windows,
                 joins, top-k) plus training-data ops (dedup, similarity
                 search, text quality, multimodal plumbing).
- ``streaming``  Structured Streaming replayer with watermarked dedup and
                 checkpointed resume.

Everything is DataFrame-first: Catalyst plans, whole-stage codegen, AQE. The
only Python-side row work is Arrow-batched pandas UDFs (never per-row Python).
"""

__version__ = "0.1.0"
