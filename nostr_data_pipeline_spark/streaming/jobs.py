"""Streaming auxiliary jobs: router, periodic re-aggregation, stats reporter.

Spark-first re-expressions of the reference's remaining streaming behaviors:

- ``route_batch`` (T4): the kind-based dispatch
  (/root/reference/src/nostr_pipeline/pipeline.py:224-247 routes kind 0 ->
  profiles, 9735 -> zaps, else raw) generalized to predicate routes applied
  in ONE pass over the micro-batch — each route filters the shared batch and
  appends to its own sink; no per-row Python dispatch.
- ``WindowedAggregator`` (T5): the 60s re-aggregation loop
  (pipeline.py:260-276 + analytics/aggregator.py:33-62) as a SECOND streaming
  query over the same log: watermarked sliding event-time windows per repo,
  appended to a parquet metrics sink once the watermark closes each window.
- ``ProgressReporter`` (T6): the stats heartbeat (pipeline.py:278-305) as a
  StreamingQueryListener appending each micro-batch's progress (rows, duration,
  rates) to a JSONL file.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def route_batch(batch: DataFrame, routes: dict[str, tuple],
                batch_id: int | None = None) -> dict[str, int]:
    """Apply predicate routes to one micro-batch: one shared scan, each route
    writes its filtered projection to its sink dir. routes[name] =
    (predicate_column, out_dir, optional projection list).

    ``batch_id`` (set by RouterSink): each batch lands in its own
    ``batch_id=<n>`` partition dir with OVERWRITE semantics — foreachBatch
    is at-least-once, and a retried batch (a later route's write failed
    mid-loop before the checkpoint committed) overwrites its own dir instead
    of appending duplicates. Readers of the route dir see a ``batch_id``
    partition column (free lineage). ``None`` keeps plain append (ad hoc
    batch use outside a stream).

    The two modes are EXCLUSIVE per sink dir: flat appended files mixed with
    ``batch_id=`` partition dirs produce a layout partition discovery cannot
    read — the first write into a dir laid out the other way raises.

    Counters ride the write itself via ``observe()`` (one pass per route, no
    post-write re-scan). A single count accumulator per route is cheap even
    interpreted; wide per-row aggregations are where observe() hurts (see
    replay_batch's rows_seen note)."""
    import uuid

    from pyspark.sql import Observation

    batch = batch.persist()
    counts: dict[str, int] = {}
    try:
        for name, spec in routes.items():
            pred, out_dir = spec[0], spec[1]
            proj = spec[2] if len(spec) > 2 else None
            _check_sink_layout(out_dir, partitioned=batch_id is not None)
            routed = batch.filter(pred)
            if proj:
                routed = routed.select(*proj)
            obs = Observation(f"route-{name}-{uuid.uuid4().hex[:8]}")
            routed = routed.observe(obs, F.count(F.lit(1)).alias("n"))
            if batch_id is None:
                routed.write.mode("append").parquet(out_dir)
            else:
                routed.write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"batch_id={batch_id}")
                )
            counts[name] = obs.get["n"]
    finally:
        batch.unpersist()
    return counts


def _check_sink_layout(out_dir: str, partitioned: bool) -> None:
    """Reject mixing RouterSink's ``batch_id=`` partition layout with ad hoc
    flat appends in one sink dir (ADVICE: the mixed layout is unreadable)."""
    if not os.path.isdir(out_dir):
        return
    entries = [e for e in os.listdir(out_dir) if not e.startswith(("_", "."))]
    has_parts = any(e.startswith("batch_id=") for e in entries)
    has_flat = any(e.endswith(".parquet") for e in entries)
    if partitioned and has_flat:
        raise ValueError(
            f"sink dir {out_dir} already holds flat parquet files (ad hoc "
            "route_batch mode); streaming batch_id-partitioned writes into "
            "it would produce a mixed, unreadable layout — use a fresh dir"
        )
    if not partitioned and has_parts:
        raise ValueError(
            f"sink dir {out_dir} already holds batch_id= partition dirs "
            "(RouterSink mode); flat ad hoc appends into it would produce a "
            "mixed, unreadable layout — use a fresh dir"
        )


class RouterSink:
    """foreachBatch sink that routes each micro-batch (T4) exactly-once-
    effectively: per-batch partition dirs + overwrite make retries no-ops."""

    def __init__(self, routes: dict[str, tuple]):
        self.routes = routes

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        route_batch(batch, self.routes, batch_id=batch_id)


class WindowedAggregator:
    """T5: streaming event-time aggregation — events per (repo, window) with
    late-data handling via watermark; append mode emits each window once it
    finalizes (the Spark-native replacement for periodic full recompute)."""

    def __init__(self, log_dir: str, out_dir: str, checkpoint_dir: str,
                 window: str = "10 minutes", slide: str | None = None,
                 lateness: str = "10 minutes"):
        self.log_dir = log_dir
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.window = window
        self.slide = slide
        self.lateness = lateness

    def start(self, spark: SparkSession, available_now: bool = True):
        from nostr_data_pipeline_spark.cdc.replayer import LOG_SCHEMA

        src = (
            spark.readStream.schema(LOG_SCHEMA).parquet(self.log_dir)
            .withWatermark("ts", self.lateness)
        )
        win = F.window("ts", self.window, self.slide) if self.slide else F.window(
            "ts", self.window
        )
        agg = (
            src.filter(F.col("op") != "schema_change")
            .groupBy(win.alias("w"), F.col("repo"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
                # exact DISTINCT is unsupported in streaming aggs; HLL sketch
                # is the correct unbounded-stream answer anyway
                F.approx_count_distinct("path").alias("n_paths_approx"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "repo", "n_events", "n_deletes", "n_paths_approx",
            )
        )
        writer = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.out_dir)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class SessionWindowAggregator:
    """Beyond the reference (SURVEY §2.10 notes session windows are absent):
    per-repo activity SESSIONS — windows that extend while events keep
    arriving within ``gap`` of each other and close after a quiet gap.
    Pure Structured Streaming state (``F.session_window``), no custom
    stateful operator needed; watermark bounds the session state.

    Lateness caveat (applies to this class and ``WindowedAggregator`` — it is
    inherent to every append-mode stateful aggregation in Spark): rows later
    than ``lateness`` behind the max seen event-time are DROPPED before the
    aggregation, so counts undercount if the source can reorder beyond that
    bound (e.g., multi-file discovery order). The CDC replay path itself
    never depends on these aggregates — exact state comes from the
    seq-guarded MERGE (see streaming/replayer.py dedup_mode discussion);
    these jobs are the metrics/rollup plane, where watermark-late drops are
    the standard accepted trade for bounded state."""

    def __init__(self, log_dir: str, out_dir: str, checkpoint_dir: str,
                 gap: str = "5 minutes", lateness: str = "10 minutes"):
        self.log_dir = log_dir
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.gap = gap
        self.lateness = lateness

    def start(self, spark: SparkSession, available_now: bool = True):
        from nostr_data_pipeline_spark.cdc.replayer import LOG_SCHEMA

        src = (
            spark.readStream.schema(LOG_SCHEMA).parquet(self.log_dir)
            .withWatermark("ts", self.lateness)
        )
        agg = (
            src.filter(F.col("op") != "schema_change")
            .groupBy(F.session_window("ts", self.gap).alias("s"), F.col("repo"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("seq").alias("first_seq"),
                F.max("seq").alias("last_seq"),
            )
            .select(
                F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "repo", "n_events", "first_seq", "last_seq",
            )
        )
        writer = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.out_dir)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class ProgressReporter(StreamingQueryListener):
    """T6: append per-batch progress to JSONL (rows, duration, input rate)."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "timestamp": p.timestamp,
            }
        )

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    def _write(self, obj: dict) -> None:
        with open(self.out_path, "a") as f:
            f.write(json.dumps(obj, default=str) + "\n")
