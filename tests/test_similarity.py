"""Similarity search: ANN variants must agree with brute-force ground truth."""

from __future__ import annotations

import pytest

from nostr_data_pipeline_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.filter("vec_id = 0").first()["embedding"]


def test_bruteforce_topk_sane(spark, emb, query_vec):
    top = cosine_topk(emb, query_vec, k=5).collect()
    assert len(top) == 5
    assert top[0]["id"] == 0 and top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-5)
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_vs_bruteforce(spark, emb, query_vec):
    exact = [r["id"] for r in cosine_topk(emb, query_vec, k=10).collect()]
    approx = [r["id"] for r in ann_lsh_topk(emb, query_vec, k=10, probe_flips=2).collect()]
    # LSH with 2-bit probing should recover most of the true top-10
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"LSH recall {recall}"
    assert approx[0] == 0  # the query vector itself always lands in its bucket


def test_ivf_recall_vs_bruteforce(spark, emb, query_vec):
    exact = [r["id"] for r in cosine_topk(emb, query_vec, k=10).collect()]
    approx = [r["id"] for r in ann_ivf_topk(emb, query_vec, k=10, n_cells=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall {recall}"
    assert approx[0] == 0


def test_ivf_deterministic(spark, emb, query_vec):
    a = [tuple(r) for r in ann_ivf_topk(emb, query_vec, k=5).collect()]
    b = [tuple(r) for r in ann_ivf_topk(emb, query_vec, k=5).collect()]
    assert a == b
