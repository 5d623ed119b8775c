"""Streaming change-log replayer.

Spark-first re-expression of the reference's ingest loop
(/root/reference/src/nostr_pipeline/pipeline.py:157-258):

  reference                                   this engine
  ---------------------------------------     ----------------------------------
  asyncio queue + 100-event/5s flush (T1)     file-stream source + trigger
  in-batch seen_ids set (T2)                  dropDuplicates in foreachBatch
  PK probe before insert (T3)                 withWatermark +
                                              dropDuplicatesWithinWatermark
                                              (bounded state) + seq-guarded MERGE
  no durable resume (T8: restarts lose        checkpointLocation -> exact resume;
  position, `since=now`)                      replayed batches skipped by
                                              commit markers (exactly-once, T9)
  per-batch counters dict (T6)                merge metrics + per-bucket lineage
                                              persisted in table manifests

The watermark bounds dedup state: an event later than ``lateness`` behind the
max event-time may slip past the streaming dedup, but the seq-guarded MERGE is
idempotent per (seq, event_id), so a duplicate that escapes the state store is
still applied exactly once (defense in depth; SURVEY §2.10 T7).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from nostr_data_pipeline_spark.cdc.replayer import (
    LOG_SCHEMA,
    TARGET_BASE_SCHEMA,
    replay_batch,
)
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable


class StreamingReplayer:
    def __init__(
        self,
        table: SnapshotTable,
        log_dir: str,
        checkpoint_dir: str,
        stream_id: str = "stream-replay",
        lateness: str = "10 minutes",
        max_files_per_trigger: int | None = None,
        lww_mode: str = "maxseq",
        salt: int = 16,
        collect_lineage: bool = True,
    ):
        self.table = table
        self.log_dir = log_dir
        self.checkpoint_dir = checkpoint_dir
        self.stream_id = stream_id
        self.lateness = lateness
        self.max_files_per_trigger = max_files_per_trigger
        self.lww_mode = lww_mode
        self.salt = salt
        self.collect_lineage = collect_lineage

    def _source(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(LOG_SCHEMA)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(self.log_dir)
        # cross-batch dedup with bounded state (SURVEY T3); ts is event time
        return df.withWatermark("ts", self.lateness).dropDuplicatesWithinWatermark(
            ["event_id"]
        )

    def _apply(self, batch: DataFrame, batch_id: int) -> None:
        replay_batch(
            batch.sparkSession,
            self.table,
            batch,
            stream_id=self.stream_id,
            batch_id=batch_id,
            lww_mode=self.lww_mode,
            salt=self.salt,
            collect_lineage=self.collect_lineage,
            # materialize the micro-batch once: its lineage contains the
            # stateful dedup operator, which must not be re-executed per
            # consumer (see replay_batch docstring)
            cache_batch=True,
        )

    def start(
        self,
        spark: SparkSession,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        if not self.table.exists():
            self.table.create(TARGET_BASE_SCHEMA)
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

    def run_to_completion(self, spark: SparkSession) -> dict[str, Any]:
        """Process everything currently in the log dir, then stop."""
        q = self.start(spark, available_now=True)
        q.awaitTermination()
        return self.table.manifest().get("metrics", {})
