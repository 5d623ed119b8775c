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
