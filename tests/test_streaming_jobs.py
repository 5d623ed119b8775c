"""Streaming auxiliary jobs: router (T4), windowed aggregation (T5),
progress reporter (T6)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.cdc.generator import LogSpec, write_log
from nostr_data_pipeline_spark.cdc.replayer import LOG_SCHEMA
from nostr_data_pipeline_spark.streaming.jobs import (
    ProgressReporter,
    RouterSink,
    WindowedAggregator,
)

SPEC = LogSpec(n_events=2000, n_repos=8, paths_per_repo=10, seed=21, n_files=4)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("routelog"))
    write_log(d, SPEC)
    return d


def test_router_sink(spark, tmp_path, log_dir):
    routes = {
        "deletes_audit": (F.col("op") == "delete", str(tmp_path / "deletes"),
                          ["event_id", "seq", "repo", "path", "ts"]),
        "py_files": ((F.col("op") != "delete") & (F.col("lang") == "py"),
                     str(tmp_path / "py")),
        "schema_log": (F.col("op") == "schema_change", str(tmp_path / "schema")),
    }
    q = (
        spark.readStream.schema(LOG_SCHEMA).parquet(log_dir)
        .writeStream.foreachBatch(RouterSink(routes))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log = spark.read.schema(LOG_SCHEMA).parquet(log_dir)
    n_deletes = log.filter("op = 'delete'").count()
    deletes = spark.read.parquet(str(tmp_path / "deletes"))
    assert deletes.count() == n_deletes
    # batch_id partition column = free lineage + the retry-idempotence key
    assert deletes.columns == ["event_id", "seq", "repo", "path", "ts", "batch_id"]
    bid = int(deletes.select("batch_id").first()[0])
    # retry idempotence: re-running a committed batch overwrites its own
    # partition dir instead of appending duplicates (re-read after the
    # overwrite — the old frame's file index is stale by design)
    from nostr_data_pipeline_spark.streaming.jobs import route_batch
    replay = log.filter("op = 'delete'").select("event_id", "seq", "repo", "path", "ts")
    route_batch(replay, {"deletes_audit": (F.lit(True), str(tmp_path / "deletes"))},
                batch_id=bid)
    assert spark.read.parquet(str(tmp_path / "deletes")).count() == n_deletes
    py = spark.read.parquet(str(tmp_path / "py"))
    assert py.count() == log.filter("op != 'delete' AND lang = 'py'").count()
    sc = spark.read.parquet(str(tmp_path / "schema"))
    assert sc.count() == log.filter("op = 'schema_change'").count()


def test_windowed_aggregator(spark, tmp_path, log_dir):
    agg = WindowedAggregator(
        log_dir, str(tmp_path / "agg"), str(tmp_path / "ckpt"),
        window="5 minutes", lateness="2 minutes",
    )
    q = agg.start(spark)
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "agg"))
    # append mode with watermark: final windows may be held back, but earlier
    # ones must have been emitted with correct per-window counts
    assert out.count() > 0
    log = spark.read.schema(LOG_SCHEMA).parquet(log_dir).filter("op != 'schema_change'")
    one = out.orderBy("window_start", "repo").first()
    expected = log.filter(
        (F.col("repo") == one["repo"])
        & (F.col("ts") >= one["window_start"])
        & (F.col("ts") < one["window_end"])
    ).count()
    assert one["n_events"] == expected


def test_progress_reporter(spark, tmp_path, log_dir):
    out = str(tmp_path / "progress.jsonl")
    rep = ProgressReporter(out)
    spark.streams.addListener(rep)
    try:
        q = (
            spark.readStream.schema(LOG_SCHEMA).parquet(log_dir)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener callbacks are async; give them a beat
        import time

        deadline = time.time() + 30
        lines = []
        while time.time() < deadline:
            if os.path.exists(out):
                lines = [json.loads(x) for x in open(out)]
                if any(e["event"] == "progress" and e["numInputRows"] > 0 for e in lines):
                    break
            time.sleep(0.5)
        prog = [e for e in lines if e["event"] == "progress"]
        assert sum(e["numInputRows"] for e in prog) >= SPEC.n_events
    finally:
        spark.streams.removeListener(rep)


def test_session_window_aggregator(spark, tmp_path):
    """Two bursts per repo separated by more than the gap -> two sessions,
    correct event counts and seq ranges per session."""
    import pandas as pd

    from nostr_data_pipeline_spark.streaming.jobs import SessionWindowAggregator

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    seq = 0
    for repo in ["repo-a", "repo-b"]:
        for burst_start_min in (0, 60):  # two bursts, 1h apart >> 5m gap
            for i in range(20):
                rows.append({
                    "event_id": f"e{seq:06d}", "seq": seq, "op": "upsert",
                    "repo": repo, "path": f"p{i % 5}",
                    "ts": base + pd.Timedelta(minutes=burst_start_min, seconds=10 * i),
                    "commit": "c" * 40, "lang": "py", "content": "x",
                    "extra_json": None, "sc_col_name": None, "sc_col_type": None,
                })
                seq += 1
    # append mode only emits a session once the watermark passes its close;
    # a far-future sentinel per repo flushes the second burst's session
    # (the sentinel's own 1-event session stays open and is not emitted)
    for repo in ["repo-a", "repo-b"]:
        rows.append({
            "event_id": f"e{seq:06d}", "seq": seq, "op": "upsert",
            "repo": repo, "path": "sentinel",
            "ts": base + pd.Timedelta(hours=10),
            "commit": "c" * 40, "lang": "py", "content": "x",
            "extra_json": None, "sc_col_name": None, "sc_col_type": None,
        })
        seq += 1

    log = str(tmp_path / "sesslog")
    os.makedirs(log)
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # parquet TIMESTAMP, not INT64
    pdf.to_parquet(os.path.join(log, "part-0.parquet"))

    agg = SessionWindowAggregator(
        log, str(tmp_path / "out"), str(tmp_path / "ckpt"), gap="5 minutes"
    )
    agg.start(spark, available_now=True).awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    got = {(r["repo"], r["n_events"]) for r in out.collect()}
    # 2 repos x 2 sessions of 20 events each
    assert out.count() == 4
    assert got == {("repo-a", 20), ("repo-b", 20)}
    # session extent = first event .. last event + gap
    one = out.filter("repo = 'repo-a'").orderBy("session_start").first()
    assert one["last_seq"] - one["first_seq"] == 19


def test_running_repo_stats_stateful(spark, tmp_path):
    """applyInPandasWithState: per-repo cumulative stats must accumulate
    ACROSS micro-batches through the state store and match a batch
    groupBy of the full log."""
    import pyspark.sql.functions as F

    from nostr_data_pipeline_spark.cdc.generator import LogSpec, write_log
    from nostr_data_pipeline_spark.cdc.replayer import LOG_SCHEMA
    from nostr_data_pipeline_spark.streaming.stateful import running_repo_stats

    d = str(tmp_path / "log")
    write_log(d, LogSpec(n_events=2000, n_repos=6, paths_per_repo=8, seed=3, n_files=4))

    stream = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)   # force multiple micro-batches
        .parquet(d)
    )
    out: dict[str, tuple] = {}

    def sink(batch, batch_id):
        for r in batch.collect():   # update-mode: latest row per repo wins
            out[r["repo"]] = (r["n_events"], r["n_deletes"], r["max_seq"])

    q = (
        running_repo_stats(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    expected = {
        r["repo"]: (r["n"], r["d"], r["m"])
        for r in spark.read.schema(LOG_SCHEMA).parquet(d)
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("d"),
             F.max("seq").alias("m"))
        .collect()
    }
    assert out == expected
