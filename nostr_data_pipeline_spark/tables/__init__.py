"""Snapshot table format: versioned, bucketed parquet with atomic commits."""

from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable  # noqa: F401
