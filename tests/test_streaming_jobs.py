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
    deletes = spark.read.parquet(str(tmp_path / "deletes"))
    assert deletes.count() == log.filter("op = 'delete'").count()
    assert deletes.columns == ["event_id", "seq", "repo", "path", "ts"]
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
