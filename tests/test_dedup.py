"""Dedup/similarity operators: planted duplicates must be found; LSH
candidates must agree with brute-force above threshold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nostr_data_pipeline_spark.operators.dedup import (
    embedding_near_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    # plant near-duplicates: copy of doc text with one appended token
    dup = d.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang", "source", "n_chars",
    )
    exact = d.limit(3).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return d.unionByName(dup).unionByName(exact)


def test_minhash_finds_planted_dups(spark, docs_with_dups):
    pairs = minhash_near_duplicates(docs_with_dups, threshold=0.5).collect()
    found = {(r["id1"], r["id2"]) for r in pairs}
    for i in range(3):
        assert (i, i + 200000) in found, f"exact dup {i} missed"
    planted_near = sum(1 for (a, b) in found if b == a + 100000)
    assert planted_near >= 4  # near-dups (1 token diff) should mostly be caught
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_simhash_finds_exact_dups(spark, docs_with_dups):
    pairs = simhash_near_duplicates(docs_with_dups, max_hamming=3).collect()
    found = {(r["id1"], r["id2"]): r["hamming"] for r in pairs}
    for i in range(3):
        assert found.get((i, i + 200000)) == 0, f"exact dup {i} missed by simhash"


def test_ngram_jaccard_pairs_exactness(spark, docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, threshold=0.9).collect()
    found = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs}
    for i in range(3):
        assert found.get((i, i + 200000)) == 1.0


def test_embedding_near_duplicates_self_consistency(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant an exact duplicate vector
    dup = emb.filter(F.col("vec_id") == 1).select(
        F.lit(900001).alias("vec_id"), "embedding", "label"
    )
    pairs = embedding_near_duplicates(emb.unionByName(dup), threshold=0.999).collect()
    assert any(r["id1"] == 1 and r["id2"] == 900001 and r["cos_sim"] >= 0.999 for r in pairs)


def test_shingles_expression_form_matches_two_step(spark):
    """shingles() (array-wrap lambda binding, for inline expression use) must
    produce exactly what the two-step tokenize + shingles_of_tokens path
    produces — it has no other production caller, so pin it here."""
    from pyspark.sql import functions as F

    from nostr_data_pipeline_spark.operators.dedup import (
        shingles,
        shingles_of_tokens,
        tokenize,
    )

    df = spark.createDataFrame(
        [("a b c d e",), ("one two",), ("  padded   tokens  here ",), ("solo",)],
        "text string",
    )
    both = df.select(
        F.sort_array(shingles(F.col("text"), 3)).alias("expr_form"),
        F.sort_array(
            shingles_of_tokens(tokenize(F.col("text")), 3)
        ).alias("two_step"),
    ).collect()
    for r in both:
        assert r["expr_form"] == r["two_step"]


def test_ngram_guard_falls_back_to_minhash(spark, docs_with_dups):
    """Prefix blocking skews at corpus scale (many docs share their first
    tokens); above max_rows the call must auto-fall back to MinHash-LSH
    (same id1/id2/jaccard shape, same exact-shingle verification)."""
    small = ngram_jaccard_pairs(docs_with_dups, threshold=0.5, max_rows=None)
    fallen = ngram_jaccard_pairs(docs_with_dups, threshold=0.5, max_rows=1)
    via_minhash = minhash_near_duplicates(docs_with_dups, threshold=0.5)
    assert fallen.columns == small.columns == ["id1", "id2", "jaccard"]
    assert sorted(map(tuple, fallen.collect())) == sorted(map(tuple, via_minhash.collect()))
    # both paths verify exactly, so any pair BOTH report carries the same jaccard
    s = {(r["id1"], r["id2"]): r["jaccard"] for r in small.collect()}
    f = {(r["id1"], r["id2"]): r["jaccard"] for r in fallen.collect()}
    for k in set(s) & set(f):
        assert s[k] == f[k]


def test_minhash_rejects_bad_band_split(spark, docs_with_dups):
    with pytest.raises(ValueError, match="divide"):
        minhash_near_duplicates(docs_with_dups, num_hashes=32, bands=64)
    with pytest.raises(ValueError, match="divide"):
        minhash_near_duplicates(docs_with_dups, num_hashes=30, bands=8)


def test_embedding_dim_mismatch_fails_fast(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")  # 64-dim vectors
    with pytest.raises(Exception, match="embedding length"):
        embedding_near_duplicates(emb, dim=128).collect()


def test_connected_components_chain_and_clique(spark):
    """A 4-node chain (diameter 3 — forces multi-round propagation), a
    3-clique, and an isolated edge must each collapse to their min id."""
    from nostr_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # clique
         (20, 21)],                     # pair
        "id1 long, id2 long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_canonical_docs_matches_union_find(spark):
    """End-to-end dedup_canonical on real documents vs an independent
    union-find over the SAME pair set."""
    from nostr_data_pipeline_spark.operators.dedup import (
        canonical_docs, ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in canonical_docs(docs, pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(r["id1"]), find(r["id2"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in docs.select("doc_id").collect():
        d = r["doc_id"]
        comp = find(d) if d in parent else d
        assert got[d] == (comp, comp == d), f"doc {d}: {got[d]} != {comp}"
    assert any(not c for _, (_, c) in got.items())  # some non-canonical exists


def test_cc_star_mode_agrees_and_beats_minlabel_on_chains(spark):
    """mode='star' (large-star/small-star) must (1) agree with min-label on
    the fixture graphs, (2) agree on a random graph, and (3) converge on a
    64-node chain within O(log^2 n) rounds where min-label needs diameter
    rounds (63) — the adversarial shape the mode exists for."""
    import random
    import warnings as W

    from nostr_data_pipeline_spark.operators.dedup import connected_components

    fixture = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id1 long, id2 long",
    )
    rng = random.Random(3)
    rand_edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(80)]
    rand = spark.createDataFrame(rand_edges, "id1 long, id2 long")
    for pairs in (fixture, rand):
        a = {r["node"]: r["component"]
             for r in connected_components(pairs, mode="minlabel").collect()}
        b = {r["node"]: r["component"]
             for r in connected_components(pairs, mode="star").collect()}
        assert a == b

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id1 long, id2 long",
    )
    with W.catch_warnings():
        W.simplefilter("error")  # any non-convergence warning -> failure
        got = {r["node"]: r["component"]
               for r in connected_components(chain, mode="star",
                                             max_iter=12).collect()}
    assert got == {i: 0 for i in range(64)}
    # same budget starves min-label (diameter 63 > 12 rounds): it must SAY so
    with pytest.warns(RuntimeWarning, match="not converged"):
        connected_components(chain, mode="minlabel", max_iter=12).collect()


def test_cc_star_exhaustion_labels_are_deterministic(spark):
    """On max_iter exhaustion the star labeling must still emit exactly ONE
    deterministic row per node (min label across the node's star roles) —
    an arbitrary pick would fracture downstream canonical election
    differently run to run."""
    from nostr_data_pipeline_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 long, id2 long",
    )
    outs = []
    for _ in range(2):
        with pytest.warns(RuntimeWarning, match="not converged"):
            df = connected_components(chain, mode="star", max_iter=1)
            rows = df.collect()
        assert len(rows) == 41 == len({r["node"] for r in rows})
        # every label is a valid coarsening: label <= node
        assert all(r["component"] <= r["node"] for r in rows)
        outs.append({r["node"]: r["component"] for r in rows})
    assert outs[0] == outs[1]
