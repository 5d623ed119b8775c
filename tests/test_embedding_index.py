"""EmbeddingIndex (operators/embedding_index.py): persisted incremental
embedding near-dup detection — the vector-space sibling of MinHashIndex."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.embedding_index import EmbeddingIndex

DIM = 8


def _unit(rng):
    v = rng.standard_normal(DIM)
    return v / np.linalg.norm(v)


def _near(v, rng, eps=0.05):
    w = v + eps * rng.standard_normal(DIM)
    return w / np.linalg.norm(w)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v], int(s)) for i, v, s in rows],
        "vec_id long, embedding array<double>, seq long",
    )


@pytest.fixture()
def idx(spark, tmp_path):
    return EmbeddingIndex.create(spark, str(tmp_path / "eidx"),
                                 dim=DIM, n_planes=4, num_buckets=4)


def test_check_finds_index_and_batch_dups_exactly(spark, idx):
    rng = np.random.default_rng(7)
    a, c = _unit(rng), _unit(rng)
    base = [(2, a, 1), (4, _unit(rng), 1)]
    batch = [(1, _near(a, rng), 1), (3, c, 1), (5, _near(c, rng), 1)]
    idx.add(spark, _df(spark, base), seq_col="seq")
    got = {(r["vec_id"], r["dup_of"]): (r["cos_sim"], r["dup_src"])
           for r in idx.check(spark, _df(spark, batch), seq_col="seq",
                              threshold=0.9).collect()}
    # expected = EXACT cosine >= 0.9 pairs (the verify is exact; with
    # eps=0.05 noise the LSH probe at probe_flips=1 reaches them)
    assert set(got) == {(1, 2), (5, 3)}
    assert got[(1, 2)][1] == "index" and got[(5, 3)][1] == "batch"
    cos_12 = round(float(np.dot(batch[0][1], a)), 4)
    assert got[(1, 2)][0] == pytest.approx(cos_12, abs=2e-4)


def test_add_is_idempotent_and_seq_guarded(spark, idx):
    rng = np.random.default_rng(11)
    v1, v2 = _unit(rng), _unit(rng)
    idx.add(spark, _df(spark, [(9, v1, 1)]), seq_col="seq",
            stream_id="s", batch_id=0)
    ver = idx.vectors_table.current_version()
    # replayed batch: no-op on both tables
    idx.add(spark, _df(spark, [(9, v1, 1)]), seq_col="seq",
            stream_id="s", batch_id=0)
    assert idx.vectors_table.current_version() == ver
    # revision with higher seq replaces the vector; check uses the NEW one
    idx.add(spark, _df(spark, [(9, v2, 2)]), seq_col="seq",
            stream_id="s", batch_id=1)
    probe = _df(spark, [(100, _near(v2, rng), 3)])
    got = idx.check(spark, probe, seq_col="seq", threshold=0.9).collect()
    assert [(r["vec_id"], r["dup_of"]) for r in got] == [(100, 9)]
    # the OLD vector no longer matches anything near v2... and a probe
    # near v1 must NOT match id 9 anymore (exact verify on the new vector)
    probe_old = _df(spark, [(101, _near(v1, rng), 3)])
    assert idx.check(spark, probe_old, seq_col="seq",
                     threshold=0.9).collect() == []


def test_dim_mismatch_raises_not_degenerates(spark, idx):
    bad = spark.createDataFrame([(1, [1.0, 2.0], 1)],
                                "vec_id long, embedding array<double>, seq long")
    with pytest.raises(Exception, match="embedding length"):
        idx.add(spark, bad)


def test_open_roundtrip_and_param_guard(spark, tmp_path):
    p = str(tmp_path / "e2")
    EmbeddingIndex.create(spark, p, dim=DIM, n_planes=4, num_buckets=4)
    got = EmbeddingIndex.open(p)
    assert (got.dim, got.n_planes, got.num_buckets) == (DIM, 4, 4)
    assert EmbeddingIndex.exists(p)
    with pytest.raises(ValueError, match="out of range"):
        EmbeddingIndex(str(tmp_path / "bad"), n_planes=30)


def test_check_probe_reads_subset_of_bucket_files(spark, idx):
    """The probe plan's file selection covers a strict subset of the bucket
    table's files when the batch touches few LSH cells (the bucket-pruned
    shape the module docstring promises)."""
    rng = np.random.default_rng(23)
    idx.add(spark, _df(spark, [(i, _unit(rng), 1) for i in range(64)]),
            seq_col="seq")
    n_files_total = sum(
        len(fs) for fs in idx.buckets_table.manifest()["buckets"].values())
    one = _df(spark, [(999, _unit(rng), 2)])
    probes = idx._vec_frame(one, "vec_id", "embedding", "seq")
    vals = [(r["bucket"],) for r in probes.select(
        F.explode(idx._probe_buckets_col(F.col("bucket"), 1))
        .alias("bucket")).collect()]
    hit = idx.buckets_table.buckets_for_values(spark, vals)
    assert len(hit) < idx.num_buckets or n_files_total == len(hit)


def test_vacuum_stale_buckets(spark, idx):
    """A revision leaves its old bucket row behind (candidates-only, the
    MinHashIndex stale-band argument); vacuum_stale_buckets reclaims it."""
    rng = np.random.default_rng(31)
    v1, v2 = _unit(rng), _unit(rng)
    idx.add(spark, _df(spark, [(9, v1, 1)]), seq_col="seq")
    idx.add(spark, _df(spark, [(9, v2, 2)]), seq_col="seq")
    rows = idx.buckets_table.read(spark, seq_col="seq").collect()
    if len(rows) > 1:  # revision changed the LSH cell -> stale row exists
        idx.vacuum_stale_buckets(spark)
        rows = idx.buckets_table.read(spark, seq_col="seq").collect()
    assert [(r["vec_id"], r["seq"]) for r in rows] == [(9, 2)]
