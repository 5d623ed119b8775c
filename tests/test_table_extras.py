"""SnapshotTable extras: coalesce merge mode (S6), retention delete (S11),
tombstone vacuum, version vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("about", T.StringType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("last_event_id", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_coalesce_merge_keeps_target_fields(spark, tmp_path):
    """S6: non-null-wins — a newer event with a null field must not erase the
    older value (reference profile upsert, event_loader.py:60-87)."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, [("r", "p", "alice", "bio v1", 1, "e1")]),
            update_mode="coalesce")
    t.merge(spark, _df(spark, [("r", "p", "alice2", None, 2, "e2")]),
            update_mode="coalesce")
    row = t.read(spark).first()
    assert row["name"] == "alice2"
    assert row["about"] == "bio v1"      # kept: source was null
    assert row["last_seq"] == 2          # bookkeeping always from winner
    # replace mode erases
    t2 = SnapshotTable(str(tmp_path / "t2"), num_buckets=4)
    t2.create(SCHEMA)
    t2.merge(spark, _df(spark, [("r", "p", "alice", "bio v1", 1, "e1")]))
    t2.merge(spark, _df(spark, [("r", "p", "alice2", None, 2, "e2")]))
    assert t2.read(spark).first()["about"] is None


def test_retention_delete_and_vacuum(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    rows = [(f"r{i % 3}", f"p{i}", f"n{i}", None, i, f"e{i}") for i in range(20)]
    t.merge(spark, _df(spark, rows))
    assert t.read(spark).count() == 20
    res = t.delete_where(spark, "last_seq < 10")
    assert res["rows_deleted"] == 10
    assert t.read(spark).count() == 10
    assert t.read(spark).agg(F.min("last_seq")).first()[0] == 10
    # no-match delete is a no-op commit
    v = t.current_version()
    assert t.delete_where(spark, "last_seq < 0")["rows_deleted"] == 0
    assert t.current_version() == v
    # version vacuum removes unreferenced data dirs
    removed = t.vacuum(keep_versions=1)
    assert removed >= 1
    assert t.read(spark).count() == 10  # current version untouched


def test_tombstone_vacuum(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, [("r", "p1", "a", None, 1, "e1"),
                               ("r", "p2", "b", None, 2, "e2")]))
    src = _df(spark, [("r", "p1", None, None, 3, "e3")]).withColumn(
        "_deleted", F.lit(True)
    )
    t.merge(spark, src)
    assert t.read(spark).count() == 1
    assert t.read(spark, include_tombstones=True).count() == 2
    t.vacuum_tombstones(spark)
    assert t.read(spark, include_tombstones=True).count() == 1


def test_time_travel_and_change_feed(spark, tmp_path):
    """Replay in two batches; read(version=) returns the first snapshot and
    changes(v1, v2) classifies exactly the rows batch 2 net-changed, with
    per-row agreement against the pandas oracle applied to each seq half."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nostr_data_pipeline_spark.cdc.generator import LogSpec, make_log_frame, write_log
    from nostr_data_pipeline_spark.cdc.oracle import reduce_log
    from nostr_data_pipeline_spark.cdc.replayer import replay_log
    from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

    spec = LogSpec(n_events=3000, n_repos=10, paths_per_repo=12, seed=5, n_files=2)
    log_dir = str(tmp_path / "log")
    write_log(log_dir, spec)
    table = SnapshotTable(str(tmp_path / "tbl"), num_buckets=8)
    replay_log(spark, table, log_dir, n_batches=2)

    frame = make_log_frame(spec)
    mid = frame["seq"].max() // 2 + 1  # replay_log splits the seq range evenly
    oracle_v1 = reduce_log(frame[frame["seq"] < mid])
    oracle_v2 = reduce_log(frame)

    # versions: 1=create, 2=batch0 merge, 3=batch1 merge (evolve commits may
    # interleave) — find the two data commits by their merge metrics
    data_versions = [
        v for v in range(1, table.current_version() + 1)
        if "rows_inserted" in table.manifest(v).get("metrics", {})
    ]
    assert len(data_versions) == 2
    v1, v2 = data_versions

    old_live = table.read(spark, version=v1).toPandas()
    assert sorted(old_live["content_sha256"]) == sorted(oracle_v1["content_sha256"])

    feed = table.changes(spark, v1, v2).toPandas()
    o1 = oracle_v1.set_index(["repo", "path"])
    o2 = oracle_v2.set_index(["repo", "path"])
    expected = {}
    for key in o2.index.union(o1.index):
        in1, in2 = key in o1.index, key in o2.index
        if in1 and not in2:
            expected[key] = "delete"
        elif in2 and not in1:
            expected[key] = "insert"
        elif in1 and in2 and tuple(o1.loc[key][["last_seq", "last_event_id"]]) != tuple(
            o2.loc[key][["last_seq", "last_event_id"]]
        ):
            expected[key] = "update"
    got = {(r["repo"], r["path"]): r["_change_type"] for r in feed.to_dict("records")}
    assert got == expected
    # new-image sha for inserts/updates matches the final oracle state
    for key, ct in got.items():
        row = feed[(feed["repo"] == key[0]) & (feed["path"] == key[1])].iloc[0]
        if ct in ("insert", "update"):
            assert row["content_sha256"] == o2.loc[key, "content_sha256"]


def test_delete_where_single_parallel_rewrite(spark, tmp_path):
    """Round-1 verdict #3: delete_where must not loop buckets in Python.
    Behavior contract: exact counts, only affected buckets rewritten,
    NULL-condition rows kept, parallel (non-coalesce(1)) writes."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    t.create(SCHEMA)
    rows = [(f"r{i}", f"p{i}", f"n{i}", None if i % 2 else "x", i, f"e{i}")
            for i in range(40)]
    t.merge(spark, _df(spark, rows))
    before = t.manifest()["buckets"]
    # condition references `about`: NULL for odd i -> those rows must be KEPT
    res = t.delete_where(spark, "about = 'x' AND last_seq < 20")
    assert res["rows_deleted"] == 10  # even i in [0, 20)
    assert t.read(spark).count() == 30
    after = t.manifest()["buckets"]
    untouched = [b for b in before if before[b] == after[b]]
    rewritten = [b for b in before if before[b] != after[b]]
    assert len(rewritten) == res["buckets_rewritten"]
    # buckets holding only non-matching rows must carry forward by reference
    assert untouched, "at least one bucket should be untouched at 8 buckets/10 hits"


def test_read_keys_scans_single_bucket(spark, tmp_path):
    """Round-1 verdict #4: point lookups open only the computed bucket's
    files (1/num_buckets of the table), not every bucket."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    t.create(SCHEMA)
    rows = [(f"r{i}", f"p{i}", f"n{i}", None, i, f"e{i}") for i in range(64)]
    t.merge(spark, _df(spark, rows))
    buckets = t.buckets_for_keys(spark, [("r7", "p7")])
    assert len(buckets) == 1
    out = t.read_keys(spark, [("r7", "p7")])
    got = out.collect()
    assert len(got) == 1 and got[0]["name"] == "n7"
    # the scan's file list is exactly the one bucket's files
    files = out.inputFiles()
    assert files and all(f"_bucket={buckets[0]}/" in f for f in files)
    # multi-key lookup across two buckets
    out2 = t.read_keys(spark, [("r7", "p7"), ("r13", "p13")])
    assert {r["name"] for r in out2.collect()} == {"n7", "n13"}
    # miss -> empty, still pruned
    assert t.read_keys(spark, [("nope", "nope")]).count() == 0


def test_changes_prunes_unchanged_buckets(spark, tmp_path):
    """Round-1 verdict #8: the change feed joins only buckets whose manifest
    file lists differ between the two versions."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    t.create(SCHEMA)
    rows = [(f"r{i}", f"p{i}", f"n{i}", None, i, f"e{i}") for i in range(32)]
    t.merge(spark, _df(spark, rows))
    v1 = t.current_version()
    # touch exactly one key -> merge rewrites only its bucket
    t.merge(spark, _df(spark, [("r3", "p3", "updated", None, 100, "e100")]))
    v2 = t.current_version()
    diff = t.changed_buckets(v1, v2)
    one = t.buckets_for_keys(spark, [("r3", "p3")])
    assert diff == one, "only the touched key's bucket may differ"
    feed = t.changes(spark, v1, v2).collect()
    assert len(feed) == 1
    assert feed[0]["_change_type"] == "update" and feed[0]["name"] == "updated"
    # metadata-only commit (schema evolution) changes no bucket
    t.add_column("extra_col", "string")
    assert t.changed_buckets(v2, t.current_version()) == []


def test_read_keys_empty_list(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, [("r", "p", "n", None, 1, "e1")]))
    out = t.read_keys(spark, [])
    assert out.count() == 0
    assert "name" in out.columns


def test_merge_pins_nondeterministic_source(spark, tmp_path):
    """Review fix: merge must pin an uncached source so the affected-bucket
    probe and the write see the SAME rows — every written row is registered
    in the manifest even when the source is non-deterministic."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    t.create(SCHEMA)
    src = spark.range(200).select(
        F.concat(F.lit("r"), (F.rand(seed=None) * 1000).cast("int").cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
        F.lit("n").alias("name"), F.lit(None).cast("string").alias("about"),
        F.col("id").alias("last_seq"),
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("last_event_id"),
    )
    metrics = t.merge(spark, src)
    # every row the write emitted must be readable back (no orphan buckets)
    assert t.read(spark, include_tombstones=True).count() == metrics["rows_written"]
    reg = {f for fs in t.manifest()["buckets"].values() for f in fs}
    import os as _os
    on_disk = set()
    for root, _d, files in _os.walk(t.path):
        for fn in files:
            if fn.endswith(".parquet"):
                on_disk.add(_os.path.relpath(_os.path.join(root, fn), t.path))
    assert on_disk == reg, "written parquet files must all be manifest-registered"


def test_merge_tombstone_accounting(spark, tmp_path):
    """A winning delete for an absent key writes a dead bookkeeping row —
    counted as rows_tombstoned, not silently 'unchanged'."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    dead = _df(spark, [("r", "ghost", None, None, 5, "e5")]).withColumn(
        "_deleted", F.lit(True))
    m1 = t.merge(spark, dead)
    assert m1["rows_tombstoned"] == 1 and m1["rows_deleted"] == 0
    assert t.read(spark).count() == 0
    assert t.read(spark, include_tombstones=True).count() == 1
    # re-delete with higher seq: still a tombstone write, not an 'update'
    dead2 = _df(spark, [("r", "ghost", None, None, 6, "e6")]).withColumn(
        "_deleted", F.lit(True))
    m2 = t.merge(spark, dead2)
    assert m2["rows_tombstoned"] == 1 and m2["rows_updated"] == 0
    # late older upsert still cannot resurrect
    t.merge(spark, _df(spark, [("r", "ghost", "zombie", None, 4, "e4")]))
    assert t.read(spark).count() == 0


def test_read_schema_stable_before_evolution(spark, tmp_path):
    """with_payload=False is honored even before any schema_change: the
    read()/changes() schema must not flip when the first evolution commits."""
    from nostr_data_pipeline_spark.cdc.replayer import TARGET_BASE_SCHEMA
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(TARGET_BASE_SCHEMA)
    pre = t.read(spark).columns
    assert "extra_json" not in pre
    t.evolve_column("stars", "long", 1)
    post = t.read(spark).columns
    assert "extra_json" not in post
    assert set(post) == set(pre) | {"stars"}
    assert "extra_json" in t.read(spark, with_payload=True).columns


def test_changes_null_tie_not_spurious_update(spark, tmp_path):
    """Null-safe change detection: a bucket rewrite (retention) that leaves
    rows byte-identical — including rows with a NULL tie column — must not
    emit spurious updates."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4)
    t.create(SCHEMA)
    rows = [("r", f"p{i}", f"n{i}", None, i, None if i % 2 else f"e{i}")
            for i in range(10)]
    t.merge(spark, _df(spark, rows))
    v1 = t.current_version()
    t.delete_where(spark, "last_seq >= 8")  # rewrites buckets; 8 rows survive
    feed = t.changes(spark, v1).collect()
    assert {r["_change_type"] for r in feed} == {"delete"}
    assert len(feed) == 2


def test_layout_guard_and_open(spark, tmp_path):
    """A handle whose num_buckets disagrees with the on-disk table must fail
    fast (it would probe wrong buckets / merge past rows); open() adopts the
    persisted layout."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=16)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, [("r", "p", "n", None, 1, "e1")]))
    wrong = SnapshotTable(str(tmp_path / "t"), num_buckets=32)
    with pytest.raises(ValueError, match="num_buckets=16"):
        wrong.read(spark)
    opened = SnapshotTable.open(str(tmp_path / "t"))
    assert opened.num_buckets == 16 and opened.key_cols == ("repo", "path")
    assert opened.read(spark).count() == 1


def test_driver_bucket_routing_matches_jvm(spark):
    """functions/xxh64.bucket_of must agree with the JVM bucket expression
    for every supported type (a divergence silently routes point reads to
    the wrong bucket — this test IS the contract). Randomized values incl.
    nulls, plus the multi-column chaining and pmod of negative hashes."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from nostr_data_pipeline_spark.functions.xxh64 import bucket_of

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        rows.append((
            rng.choice([None, "".join(chr(rng.randint(32, 0x2FA0))
                                      for _ in range(rng.randint(0, 40)))]),
            rng.choice([None, rng.randint(-(1 << 63), (1 << 63) - 1)]),
            rng.choice([None, rng.randint(-(1 << 31), (1 << 31) - 1)]),
            rng.choice([None, True, False]),
        ))
    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("l", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("b", T.BooleanType()),
    ])
    df = spark.createDataFrame(rows, schema)
    for n in (16, 32, 997):
        got = [r["_b"] for r in df.select(
            F.pmod(F.xxhash64("s", "l", "i", "b"), F.lit(n)).cast("int")
            .alias("_b")).collect()]
        exp = [bucket_of(v, ["string", "long", "integer", "boolean"], n)
               for v in rows]
        assert got == exp


def test_legacy_manifest_without_bucket_cols_rejects_prefix_handle(spark, tmp_path):
    """Manifests written before the bucket_cols field existed carry no key
    at all — those tables were bucketed by the FULL key. A handle built
    with any prefix bucketing must be loudly rejected against such a table
    (it would hash point-read probes and merge routing to wrong buckets);
    a full-key handle must still open fine (that IS the legacy layout)."""
    import json

    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, [("r", "p", "n", None, 1, "e1")]))
    # simulate the legacy manifest: strip the bucket_cols key entirely
    v = t.current_version()
    mp = t._manifest_path(v)
    with open(mp) as f:
        m = json.load(f)
    assert "bucket_cols" in m
    del m["bucket_cols"]
    with open(mp, "w") as f:
        json.dump(m, f)

    legacy_ok = SnapshotTable(str(tmp_path / "t"), num_buckets=8)
    assert legacy_ok.read(spark).count() == 1  # full-key handle: fine

    prefix = SnapshotTable(str(tmp_path / "t"), num_buckets=8,
                           bucket_cols=("repo",))
    with pytest.raises(ValueError, match="bucket_cols"):
        prefix.read(spark)
