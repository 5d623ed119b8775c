"""Sharded manifest metadata (Iceberg manifest-list analogue): a commit
touches O(affected buckets) metadata and a point merge/read loads only the
probed buckets' shards — the property that keeps the driver's metadata work
flat in total file count on a 10^5-10^6-file table (round-4 verdict task 3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from nostr_data_pipeline_spark.tables import snapshot_table as st_mod
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


def _rows(n, repo="r"):
    return [(repo, f"p{i:05d}", f"n{i}", None, i, f"e{i}") for i in range(n)]


def _instrument_loads(t):
    """Count distinct shard relpaths loaded through this handle."""
    loaded: set[str] = set()
    orig = t._load_shard

    def counting(rel, _orig=orig):
        loaded.add(rel)
        return _orig(rel)

    t._load_shard = counting  # instance attr shadows the bound method
    return loaded


def _inject_fake_files(t, per_bucket: int, skip_bucket: str) -> int:
    """Grow the CURRENT manifest to a large file count without writing data:
    append fake file entries (with plausible stats) to every bucket except
    ``skip_bucket``. The fakes are never read as long as only ``skip_bucket``
    is touched — which is exactly what the tests assert."""
    v = t.current_version()
    mp = t._manifest_path(v)
    with open(mp) as f:
        m = json.load(f)
    shard_map = m["bucket_shards"]
    added = 0
    for b in list(shard_map):
        if b == skip_bucket:
            continue
        sh = dict(t._load_shard(shard_map[b]["path"]))
        files = list(sh["files"])
        stats = dict(sh["stats"])
        for i in range(per_bucket):
            fake = f"data-v99999999/_bucket={b}/part-fake-{i:05d}.parquet"
            files.append(fake)
            stats[fake] = {"min": [f"zz{i}", "x"], "max": [f"zz{i}", "y"],
                           "rows": 1}
            added += 1
        rel = f"shards/shard-b{b}-test{b}.json"
        with open(os.path.join(t.path, rel), "w") as f:
            json.dump({"files": files, "stats": stats}, f)
        shard_map[b] = {"path": rel, "n": len(files)}
    with open(mp, "w") as f:
        json.dump(m, f)
    st_mod._SHARD_CACHE.clear()
    return added


def test_point_merge_on_10k_file_table_reads_one_shard(spark, tmp_path):
    """On a manifest referencing >10k files, a 1-key merge (with the exact
    source-bucket hint the replayer supplies) must load exactly ONE bucket
    shard, write exactly ONE new shard file, and keep the top manifest
    O(num_buckets) bytes — commit metadata cost flat in total file count."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=16,
                      target_file_rows=50)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(400)))

    key = ("r", "p00007")
    [b] = t.buckets_for_keys(spark, [key])
    bs = str(b)
    n_fake = _inject_fake_files(t, per_bucket=700, skip_bucket=bs)
    assert n_fake >= 10_000

    m = t.manifest()
    assert m["buckets"].n_files > 10_000
    # top manifest stays small while the sharded metadata is much larger
    top_bytes = os.path.getsize(t._manifest_path(t.current_version()))
    shard_bytes = sum(
        os.path.getsize(os.path.join(t.path, "shards", fn))
        for fn in os.listdir(os.path.join(t.path, "shards"))
    )
    assert top_bytes < 20_000 and shard_bytes > 10 * top_bytes

    shards_before = set(os.listdir(os.path.join(t.path, "shards")))
    st_mod._SHARD_CACHE.clear()
    loaded = _instrument_loads(t)
    t.merge(spark, _df(spark, [("r", "p00007", "updated", None, 999, "eu")]),
            source_buckets=[b])
    assert len(loaded) == 1, f"point merge loaded shards: {sorted(loaded)}"
    assert next(iter(loaded)).startswith(f"shards/shard-b{bs}-")
    new_shards = set(os.listdir(os.path.join(t.path, "shards"))) - shards_before
    assert len(new_shards) == 1, f"commit wrote shards: {sorted(new_shards)}"

    # the merged row is visible via a point read that also stays shard-local
    st_mod._SHARD_CACHE.clear()
    loaded.clear()
    got = t.read_keys(spark, [key]).collect()
    assert len(got) == 1 and got[0]["name"] == "updated"
    assert len(loaded) == 1


def test_unhinted_point_merge_prescans_source_buckets(spark, tmp_path):
    """Without a source_buckets hint, a merge into a big sharded table must
    derive the hint from the batch itself (one narrow distinct pre-job) and
    still load only the touched bucket's shard — the unhinted path may not
    regress to O(all files) metadata I/O."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=16,
                      target_file_rows=50)
    t.probe_prescan_min_files = 5_000  # test-sized threshold
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(400)))

    key = ("r", "p00007")
    [b] = t.buckets_for_keys(spark, [key])
    bs = str(b)
    assert _inject_fake_files(t, per_bucket=700, skip_bucket=bs) >= 10_000

    st_mod._SHARD_CACHE.clear()
    loaded = _instrument_loads(t)
    t.merge(spark, _df(spark, [("r", "p00007", "unhinted", None, 500, "eu")]))
    assert len(loaded) == 1, f"unhinted merge loaded shards: {sorted(loaded)}"
    assert next(iter(loaded)).startswith(f"shards/shard-b{bs}-")
    got = t.read_keys(spark, [key]).collect()
    assert len(got) == 1 and got[0]["name"] == "unhinted"


def test_untouched_buckets_carry_shards_by_reference(spark, tmp_path):
    """Two merges into disjoint key sets: buckets untouched by the second
    merge keep their exact shard paths from the first commit (carried by
    reference, not re-serialized)."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8,
                      target_file_rows=50)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(200)))
    m1 = json.load(open(t._manifest_path(t.current_version())))
    key = ("r", "p00003")
    [b] = t.buckets_for_keys(spark, [key])
    t.merge(spark, _df(spark, [("r", "p00003", "v2", None, 999, "e2")]),
            source_buckets=[b])
    m2 = json.load(open(t._manifest_path(t.current_version())))
    changed = {x for x in m2["bucket_shards"]
               if m2["bucket_shards"][x] != m1["bucket_shards"].get(x)}
    assert changed == {str(b)}
    # and the assembled views still agree with a full read
    assert t.read(spark).count() == 200
    assert t.read(spark).filter("path = 'p00003'").first()["name"] == "v2"


def test_stats_less_mor_trickle_reuses_identical_shards(spark, tmp_path):
    """A trickle MoR commit (below the delta stats threshold) rebuilds
    byte-identical shard content for each written bucket — it must REUSE the
    parent shard by path instead of fsyncing a garbage twin per bucket per
    commit on the hot ingest path."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=8,
                      target_file_rows=50)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(200)))
    m1 = json.load(open(t._manifest_path(t.current_version())))
    shards_before = set(os.listdir(os.path.join(t.path, "shards")))
    t.merge(spark, _df(spark, [("r", "p00003", "v2", None, 999, "e2")]),
            merge_mode="mor")
    m2 = json.load(open(t._manifest_path(t.current_version())))
    assert m2["bucket_shards"] == m1["bucket_shards"]  # all carried by path
    assert set(os.listdir(os.path.join(t.path, "shards"))) == shards_before
    # and the resolved read still sees the delta
    assert t.read(spark).filter("path = 'p00003'").first()["name"] == "v2"


def test_vacuum_survives_raised_keep_window(spark, tmp_path):
    """vacuum(keep_versions=K) after an earlier vacuum already reclaimed the
    shards of versions inside the new, larger window must skip those
    unreadable versions instead of crashing on the lazy shard load."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4,
                      target_file_rows=50)
    t.create(SCHEMA)
    for i in range(5):
        t.merge(spark, _df(spark, [("r", f"p{i:05d}", f"n{i}", None,
                                    i + 1, f"e{i}")]))
    t.vacuum(keep_versions=1)
    # widen the window past versions whose shards are gone
    removed = t.vacuum(keep_versions=4)
    assert removed >= 0  # no crash
    assert t.read(spark).count() == 5  # current version intact


def test_legacy_manifest_upgrades_through_data_merge(spark, tmp_path):
    """A DATA commit (CoW merge with a touched-bucket set) against a legacy
    inline manifest must also upgrade it: the touched-carry logic cannot
    carry by shard reference (there are no parent shards), so every bucket
    rebuilds from the inline maps and the inline stats keep driving pruning
    afterwards."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4,
                      target_file_rows=25)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(100)))
    v = t.current_version()
    mp = t._manifest_path(v)
    m = json.load(open(mp))
    assembled = t.manifest()
    m["buckets"] = {b: list(fs) for b, fs in assembled["buckets"].items()}
    m["file_stats"] = dict(assembled["file_stats"].items())
    del m["bucket_shards"]
    with open(mp, "w") as f:
        json.dump(m, f)
    st_mod._SHARD_CACHE.clear()

    t2 = SnapshotTable.open(str(tmp_path / "t"))
    res = t2.merge(spark, _df(spark, [("r", "p00003", "v2", None, 999, "e2")]))
    assert res["files_rewritten"] == 1  # inline stats still pruned the merge
    m2 = json.load(open(t2._manifest_path(t2.current_version())))
    assert m2.get("bucket_shards") and "buckets" not in m2
    got = {r["path"]: r["name"] for r in t2.read(spark).collect()}
    assert len(got) == 100 and got["p00003"] == "v2"
    # carried files' stats survived into the shards (prunable next merge)
    stats = t2.manifest()["file_stats"]
    n_base = sum(len(fs) for fs in t2.manifest()["buckets"].values())
    assert len(dict(stats.items())) == n_base


def test_legacy_inline_manifest_upgrades_on_next_commit(spark, tmp_path):
    """A pre-shard manifest (inline buckets/file_stats, no bucket_shards)
    must read correctly and auto-upgrade on its next commit WITHOUT losing
    the inline file stats (they keep driving merge/read pruning)."""
    t = SnapshotTable(str(tmp_path / "t"), num_buckets=4,
                      target_file_rows=25)
    t.create(SCHEMA)
    t.merge(spark, _df(spark, _rows(100)))
    # rewrite the current manifest in the legacy inline format
    v = t.current_version()
    mp = t._manifest_path(v)
    m = json.load(open(mp))
    assembled = t.manifest()
    m["buckets"] = {b: list(fs) for b, fs in assembled["buckets"].items()}
    m["file_stats"] = dict(assembled["file_stats"].items())
    del m["bucket_shards"]
    with open(mp, "w") as f:
        json.dump(m, f)
    st_mod._SHARD_CACHE.clear()

    t2 = SnapshotTable.open(str(tmp_path / "t"))
    assert t2.read(spark).count() == 100
    stats_before = dict(t2.manifest()["file_stats"].items())
    assert stats_before  # inline stats visible pre-upgrade
    # metadata-only commit triggers the upgrade
    assert t2.add_column("extra", "string")
    m2 = json.load(open(t2._manifest_path(t2.current_version())))
    assert m2.get("bucket_shards")
    assert "file_stats" not in m2 and "buckets" not in m2
    stats_after = dict(t2.manifest()["file_stats"].items())
    assert stats_after == stats_before  # inline stats survived the upgrade
    assert t2.read(spark).count() == 100
