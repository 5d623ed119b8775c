"""Value-level verification for the hash-based rows-only operators
(round-1 verdict item #6): independent pandas/numpy replicas — built on the
pure-Python xxHash64 in xxh64_replica.py — compute the exact expected output
of dedup_minhash_lsh, dedup_simhash and ann_ivf_topk, and the Spark
operators must match it row for row. (These operators have no DuckDB oracle
because DuckDB lacks Spark's xxhash64; the replica closes that gap the same
way cdc/oracle.py does for replay.)
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xxh64_replica import hash_bytes, hash_int, xxhash64

SF = "/root/testdata/sf0.001"
N_DOCS = 120  # replica is pure Python; a 120-doc slice keeps it seconds


def round_half_up(x: float, nd: int) -> float:
    # Spark's round() is HALF_UP; Python's round() is banker's
    p = 10 ** nd
    return math.floor(x * p + 0.5) / p


def java_tokens(text: str) -> list[str]:
    # F.split(F.trim(c), r"\s+"): trim strips spaces; Java \s is ASCII-only
    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


def shingle_set(toks: list[str], n: int = 3) -> list[str]:
    count = max(len(toks) - (n - 1), 1)
    out, seen = [], set()
    for i in range(count):
        s = " ".join(toks[i:i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < N_DOCS
    )
    dup = d.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang", "source", "n_chars",
    )
    exact = d.limit(3).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    full = d.unionByName(dup).unionByName(exact)
    return full, full.select("doc_id", "text").toPandas()


def test_xxh64_replica_matches_spark(spark):
    samples = ["", "a", "héllo 漢字", "x" * 31, "y" * 32, "word " * 40]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    assert [r[0] for r in df.select(F.xxhash64("s")).collect()] == [
        xxhash64(s) for s in samples
    ]
    assert [r[0] for r in df.select(F.xxhash64(F.lit(9), "s")).collect()] == [
        xxhash64(9, s) for s in samples
    ]


def minhash_expected(pdf: pd.DataFrame, num_hashes=32, bands=8,
                     threshold=0.5, shingle_n=3) -> list[tuple]:
    rows = num_hashes // bands
    seeds = [hash_int(h, 42) for h in range(num_hashes)]
    sh = {}
    sig = {}
    for r in pdf.itertuples():
        ss = shingle_set(java_tokens(r.text), shingle_n)
        sh[r.doc_id] = set(ss)
        hs = [[_signed(hash_bytes(s.encode(), seed)) for s in ss] for seed in seeds]
        sig[r.doc_id] = [min(h) for h in hs]
    banded = {}
    for _id, s in sig.items():
        for b in range(bands):
            bh = xxhash64(b, *[("long", s[b * rows + i]) for i in range(rows)])
            banded.setdefault((b, bh), []).append(_id)
    cand = set()
    for ids in banded.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    out = []
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        jac = round_half_up(inter / union, 4)
        if jac >= threshold:
            out.append((a, b, jac))
    return sorted(out, key=lambda t: (-t[2], t[0], t[1]))


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def test_minhash_lsh_matches_replica(spark, docs):
    from nostr_data_pipeline_spark.operators.dedup import minhash_near_duplicates

    sdf, pdf = docs
    got = [tuple(r) for r in minhash_near_duplicates(sdf, threshold=0.5).collect()]
    exp = minhash_expected(pdf, threshold=0.5)
    assert got == exp
    assert len(exp) >= 8, "planted dups must appear (5 near + 3 exact)"


def simhash_expected(pdf: pd.DataFrame, max_hamming=3) -> list[tuple]:
    tok_hash: dict[str, int] = {}
    chunks = {}
    for r in pdf.itertuples():
        toks = list(dict.fromkeys(java_tokens(r.text)))
        votes = [0] * 64
        for t in toks:
            h = tok_hash.get(t)
            if h is None:
                h = tok_hash[t] = _signed(hash_bytes(t.encode(), 42))
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        cs = []
        for c in range(4):
            v = 0
            for b in range(16):
                if votes[c * 16 + b] > 0:
                    v += 1 << b
            cs.append(v)
        chunks[r.doc_id] = cs
    buckets = {}
    for _id, cs in chunks.items():
        for band, v in enumerate(cs):
            buckets.setdefault((band, v), []).append(_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in pairs:
        ham = sum(bin(x ^ y).count("1") for x, y in zip(chunks[a], chunks[b]))
        if ham <= max_hamming:
            out.append((a, b, ham))
    return sorted(out, key=lambda t: (t[2], t[0], t[1]))


def test_simhash_matches_replica(spark, docs):
    from nostr_data_pipeline_spark.operators.dedup import simhash_near_duplicates

    sdf, pdf = docs
    got = [tuple(r) for r in simhash_near_duplicates(sdf, max_hamming=3).collect()]
    exp = simhash_expected(pdf, max_hamming=3)
    assert got == exp
    assert len(exp) >= 3, "exact dups must collide at hamming 0"


def ivf_expected(emb: pd.DataFrame, query, k=10, n_cells=8, n_probe=4,
                 seed=42, sample=2048, iters=10) -> list[tuple]:
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.asarray(emb["embedding"].iloc[:sample].tolist(), dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # spread init — rank (i*n)//k of the sorted sample (similarity.py default)
    kk = min(n_cells, len(Xn))
    C = Xn[[(i * len(Xn)) // kk for i in range(kk)]].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(len(C)):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    allv = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    alln = allv / np.maximum(np.linalg.norm(allv, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(alln @ C.T, axis=1)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(C @ qn), kind="stable")[:n_probe].tolist())
    rows = []
    qlist = [float(x) for x in query]
    for i, vid in enumerate(emb["vec_id"]):
        if int(cells[i]) not in probe:
            continue
        v = [float(x) for x in emb["embedding"].iloc[i]]
        # replicate Spark's LEFT-FOLD sums exactly (aggregate(zip_with(...)))
        dot = 0.0
        nv = 0.0
        nq = 0.0
        for a, b in zip(v, qlist):
            dot += a * b
            nv += a * a
            nq += b * b
        cos = round_half_up(dot / (math.sqrt(nv) * math.sqrt(nq)), 6)
        rows.append((int(vid), cos))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def test_ann_ivf_matches_replica(spark):
    from nostr_data_pipeline_spark.operators.similarity import ann_ivf_topk

    sdf = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = sdf.select("vec_id", "embedding").toPandas()
    query = pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0]
    got = [tuple(r) for r in
           ann_ivf_topk(sdf, list(query), k=10, n_cells=8, n_probe=4).collect()]
    exp = ivf_expected(pdf, list(query), k=10, n_cells=8, n_probe=4)
    assert got == exp


def test_ivf_centroids_stable_across_layout(spark):
    """Round-1 verdict #5 done-criterion: the codebook must be identical on
    a repartitioned copy of the same data (the old bare-limit sample was
    partition-layout-dependent)."""
    from nostr_data_pipeline_spark.operators.similarity import train_ivf_centroids

    sdf = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = train_ivf_centroids(sdf, n_cells=8)
    c2 = train_ivf_centroids(sdf.repartition(13, "vec_id"), n_cells=8)
    assert np.array_equal(c1, c2)


def test_xxh64_replica_randomized_corpus(spark):
    """Randomized (seeded) parity sweep: 200 strings spanning lengths 0-200
    and unicode planes, hashed bare, int-seed-chained, and LONG-seed-chained
    (the hash_long path the minhash band replica relies on) — one Spark job
    total."""
    import random

    rng = random.Random(1234)
    alphabet = "abc ABC 0123 \t\n_-#漢字ñé😀"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
        for _ in range(200)
    ]
    big = 1234567890123  # > int32 -> LongType literal -> hash_long chaining
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [
        tuple(r)
        for r in df.select(
            F.xxhash64("s"), F.xxhash64(F.lit(17), "s"),
            F.xxhash64(F.lit(big), "s"),
        ).collect()
    ]
    exp = [
        (xxhash64(s), xxhash64(17, s), xxhash64(("long", big), s))
        for s in samples
    ]
    assert got == exp


def test_hash64_md5_matches_hashlib(spark):
    """hash64(hash_fn='md5') — the oracle-portable 60-bit md5 slice — must
    equal int(md5(x).hexdigest()[1:16], 16) (and DuckDB's
    cast(concat('0x', substr(md5(x),2,15)) as ubigint), proven equal to the
    same hashlib expression in the oracle-SQL prototypes). Seeded form
    prepends '{seed}:'. One Spark job."""
    import hashlib

    from nostr_data_pipeline_spark.operators.dedup import hash64

    def ref(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[1:16], 16)

    samples = ["", "a", "hello world foo", "漢字 tøkens 😀", "B3:12,34,56"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [
        tuple(r)
        for r in df.select(
            hash64(F.col("s"), hash_fn="md5"),
            hash64(F.col("s"), seed=7, hash_fn="md5"),
        ).collect()
    ]
    assert got == [(ref(s), ref(f"7:{s}")) for s in samples]
    with pytest.raises(ValueError, match="unknown hash_fn"):
        hash64(F.col("s"), hash_fn="sha1")


def test_simhash_pigeonhole_param_guard():
    """n_chunks <= max_hamming would let a within-bound pair differ in every
    chunk and be MISSED by the blocking — must fail fast."""
    from nostr_data_pipeline_spark.operators.dedup import simhash_near_duplicates

    with pytest.raises(ValueError, match="must exceed max_hamming"):
        simhash_near_duplicates(None, max_hamming=4, n_chunks=4)


def test_md5_mode_pairs_are_verified_true_pairs(spark, docs_fixture=None):
    """md5-mode MinHash returns only TRUE >=threshold Jaccard pairs (the
    hash choice moves candidate recall, never verified precision): every
    emitted pair's jaccard recomputed from raw shingles matches."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "totally different words entirely here now"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from nostr_data_pipeline_spark.operators.dedup import (
        minhash_near_duplicates,
        release_dedup_caches,
    )

    got = {(r["id1"], r["id2"]): r["jaccard"]
           for r in minhash_near_duplicates(df, threshold=0.5,
                                            hash_fn="md5").collect()}
    release_dedup_caches()

    def sh(t):
        tk = t.split()
        return {" ".join(tk[i:i + 3]) for i in range(max(len(tk) - 2, 1))}

    assert got[(1, 4)] == 1.0  # exact dup always collides in every band
    for (a, b), j in got.items():
        sa, sb = sh(rows[a - 1][1]), sh(rows[b - 1][1])
        assert j == round(len(sa & sb) / len(sa | sb), 4) and j >= 0.5


def test_ann_ivf_oracle_degenerate_small_table(spark, tmp_path):
    """Fewer rows than n_cells: the Python spread init trains k=min(n_cells,
    n) centroids; the SQL oracle must follow (review finding r4 — the old
    SQL always seeded n_cells rows with duplicate centroids)."""
    import duckdb

    from nostr_data_pipeline_spark.operators.analytics import _ann_ivf_sql

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(5)]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sdf.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    from nostr_data_pipeline_spark.operators.dedup import q_ann_ivf_topk

    got = [(r["id"], r["cos_sim"]) for r in q_ann_ivf_topk(spark, str(tmp_path)).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    exp = [(int(a), float(b)) for a, b in con.execute(_ann_ivf_sql()).fetchall()]
    # 5 docs -> 5 one-doc cells; probing 4 of 5 returns exactly 4 rows
    assert got == exp and len(got) == 4
