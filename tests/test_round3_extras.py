"""Round-3 verdict items #4/#5/#6 and ADVICE fixes:

- quantitative error bounds for the sketch query (a2_approx_variants) against
  the exact aggregates — the last rows-only entry gets a correctness
  statement;
- the ngram-jaccard fallback now WARNS when it silently swaps exact blocking
  for approximate MinHash-LSH;
- dedup intermediate caches are registered and releasable;
- route_batch counters ride the write via observe() (one pass) and the two
  sink layouts (flat append vs batch_id= partition dirs) are exclusive;
- the wire-format seam (source_factory + parse_wire_events) driven
  end-to-end through a REAL stream (Spark socket source), not just
  plan-constructed.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def test_sketch_queries_within_error_bounds(spark):
    """HLL count-distinct within 5% relative error of exact;
    percentile_approx within rank tolerance of the exact quantile values
    (approx_count_distinct's rsd default is 0.05; percentile_approx with
    accuracy=10000 bounds rank error at n/10000)."""
    from nostr_data_pipeline_spark.operators.analytics import a2_approx_variants, load

    approx = {r["event_type"]: r for r in a2_approx_variants(spark, SF_DIR).collect()}
    e = load(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) >= 2
    for et, ex in exact.items():
        ap = approx[et]
        assert ap["approx_users"] == pytest.approx(ex["users"], rel=0.05), et
        # percentile_approx's guarantee is on RANK, not value (value-space
        # slack is meaningless in a sparse tail): the returned element's
        # rank interval [count(<v), count(<=v)] must overlap the target
        # rank +- n/accuracy (+1 for boundary rounding)
        n = ex["n"]
        for q, col in ((0.5, "approx_p50"), (0.95, "approx_p95")):
            v = float(ap[col])
            lt, le = (
                e.filter(F.col("event_type") == et)
                .agg(
                    F.sum((F.col("value") < v).cast("int")).alias("lt"),
                    F.sum((F.col("value") <= v).cast("int")).alias("le"),
                )
                .first()
            )
            tol = n / 10000 + 1
            target = q * n
            assert lt - tol <= target <= le + tol, (et, col, v, lt, le, target)


def test_ngram_fallback_warns_and_matches_minhash(spark):
    from nostr_data_pipeline_spark.operators.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(200)
    with pytest.warns(RuntimeWarning, match="falling back to approximate"):
        fb = ngram_jaccard_pairs(docs, threshold=0.3, max_rows=10)
    expect = minhash_near_duplicates(docs, threshold=0.3)
    assert fb.collect() == expect.collect()
    # explicit opt-out stays exact and silent
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        ngram_jaccard_pairs(docs, threshold=0.3, max_rows=None)


def test_release_dedup_caches(spark):
    from nostr_data_pipeline_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(100)
    dedup.release_dedup_caches()  # start clean
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.3)
    pairs.count()  # materialize (also materializes the registered caches)
    assert len(dedup._LIVE_CACHES) >= 1
    released = dedup.release_dedup_caches()
    assert released >= 1 and not dedup._LIVE_CACHES


def test_router_layout_exclusive_and_counts_observed(spark, tmp_path):
    from nostr_data_pipeline_spark.streaming.jobs import route_batch

    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("even")
    )
    sink = str(tmp_path / "routed")
    counts = route_batch(df, {"evens": (F.col("even"), sink)})
    assert counts == {"evens": 5}
    assert spark.read.parquet(sink).count() == 5
    # streaming-layout write into the flat-append dir must fail fast
    with pytest.raises(ValueError, match="mixed, unreadable layout"):
        route_batch(df, {"evens": (F.col("even"), sink)}, batch_id=1)
    # and the reverse: flat append into a batch_id-partitioned dir
    sink2 = str(tmp_path / "routed2")
    counts2 = route_batch(df, {"evens": (F.col("even"), sink2)}, batch_id=0)
    assert counts2 == {"evens": 5}
    with pytest.raises(ValueError, match="mixed, unreadable layout"):
        route_batch(df, {"evens": (F.col("even"), sink2)})


def test_socket_wire_source_end_to_end(spark, tmp_path):
    """Verdict #5: the Kafka-shaped seam exercised as a REAL stream — JSON
    events served over a TCP socket, decoded by parse_wire_events inside a
    source_factory, replayed through the full foreachBatch -> LWW -> MERGE
    path into the table."""
    from nostr_data_pipeline_spark.streaming.replayer import (
        StreamingReplayer,
        parse_wire_events,
    )
    from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

    events = [
        {"event_id": f"e{i}", "seq": i, "op": "upsert", "repo": "r",
         "path": f"p{i % 5}", "ts": "2026-01-01T00:00:00Z", "commit": f"c{i}",
         "lang": "py", "content": f"body {i}", "extra_json": None,
         "sc_col_name": None, "sc_col_type": None}
        for i in range(1, 21)
    ]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        try:
            conn.sendall(("\n".join(json.dumps(e) for e in events) + "\n").encode())
            stop.wait(timeout=60)  # keep the connection open while the query runs
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    table = SnapshotTable(str(tmp_path / "tbl"), num_buckets=4)
    rep = StreamingReplayer(
        table, log_dir="", checkpoint_dir=str(tmp_path / "ckpt"),
        source_factory=lambda s: parse_wire_events(
            s.readStream.format("socket")
            .option("host", "127.0.0.1").option("port", port).load()
        ).filter(F.col("event_id").isNotNull()),
    )
    q = rep.start(spark, available_now=False)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if table.exists() and table.read(spark).count() == 5:
                break
            time.sleep(0.5)
    finally:
        stop.set()
        q.stop()
        server.close()
    got = {r["path"]: r for r in table.read(spark).collect()}
    # LWW: 20 events over 5 keys -> seqs 16..20 survive
    assert set(got) == {f"p{i}" for i in range(5)}
    assert got["p0"]["last_seq"] == 20 and got["p0"]["content"] == "body 20"
    assert got["p4"]["last_seq"] == 19
