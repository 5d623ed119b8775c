"""MinHashIndex: incremental dedup-at-ingest.

Value-level verification follows the test_dedup_fixtures pattern: a pure
pandas/numpy replica built on the xxHash64 replica computes the exact
expected (doc_id, dup_of, est_jaccard) rows, and the Spark index must match
row for row. Plus the ingest invariants a training pipeline relies on:
kept corpus pairwise dup-free, rejection chains terminate at a kept doc,
replayed batches are no-ops, higher-seq revisions update the index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_dedup_fixtures import java_tokens, round_half_up, shingle_set
from xxh64_replica import hash_bytes, hash_int, xxhash64

from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex

SF = "/root/testdata/sf0.001"
N_DOCS = 120


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def replica_sigs(pdf, num_hashes=32, shingle_n=3):
    seeds = [hash_int(h, 42) for h in range(num_hashes)]
    sig = {}
    for r in pdf.itertuples():
        ss = shingle_set(java_tokens(r.text), shingle_n)
        hs = [[_signed(hash_bytes(s.encode(), seed)) for s in ss] for seed in seeds]
        sig[r.doc_id] = [min(h) for h in hs]
    return sig


def replica_bands(sig, num_hashes=32, bands=8):
    rows = num_hashes // bands
    out = {}
    for _id, s in sig.items():
        out[_id] = [
            xxhash64(b, *[("long", s[b * rows + i]) for i in range(rows)])
            for b in range(bands)
        ]
    return out


def index_expected(pdf_base, pdf_new, threshold=0.35, num_hashes=32, bands=8):
    """Expected check() output: cross pairs (new vs base) + within pairs
    (new vs smaller-id new), est_jaccard = agreeing-slot fraction."""
    sb, sn = replica_sigs(pdf_base, num_hashes), replica_sigs(pdf_new, num_hashes)
    bb, bn = replica_bands(sb, num_hashes, bands), replica_bands(sn, num_hashes, bands)
    out = []
    for nid, nbs in bn.items():
        for bid, bbs in bb.items():
            if bid != nid and any(a == c for a, c in zip(nbs, bbs)):
                est = round_half_up(
                    sum(a == c for a, c in zip(sn[nid], sb[bid])) / num_hashes, 4
                )
                if est >= threshold:
                    out.append((nid, bid, est, "index"))
    for nid, nbs in bn.items():
        for oid, obs in bn.items():
            if oid < nid and any(a == c for a, c in zip(nbs, obs)):
                est = round_half_up(
                    sum(a == c for a, c in zip(sn[nid], sn[oid])) / num_hashes, 4
                )
                if est >= threshold:
                    out.append((nid, oid, est, "batch"))
    return sorted(out)


@pytest.fixture(scope="module")
def corpus(spark):
    """120 real docs + planted near-dups: 4 crossing the base/new split,
    3 within the new slice."""
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < N_DOCS
    ).select("doc_id", "text")
    cross_dup = d.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    within_dup = d.filter((F.col("doc_id") >= 61) & (F.col("doc_id") % 2 == 1)
                          & (F.col("doc_id") < 68)).select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" coda")).alias("text"),
    )
    base = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1) \
        .unionByName(cross_dup).unionByName(within_dup)
    return base, new


def test_check_matches_replica(spark, corpus, tmp_path):
    base, new = corpus
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"))
    idx.add(spark, base)
    got = sorted(
        tuple(r) for r in idx.check(spark, new, threshold=0.35).collect()
    )
    exp = index_expected(base.toPandas(), new.toPandas(), threshold=0.35)
    assert got == exp
    assert any(s == "index" for *_, s in exp), "planted cross dups must appear"
    assert any(s == "batch" for *_, s in exp), "planted within dups must appear"


def test_check_point_lookup_and_scan_paths_agree(spark, corpus, tmp_path):
    base, new = corpus
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"))
    idx.add(spark, base)
    point = sorted(tuple(r) for r in
                   idx.check(spark, new, threshold=0.35).collect())
    scan = sorted(tuple(r) for r in
                  idx.check(spark, new, threshold=0.35,
                            max_point_lookup=0).collect())
    assert point == scan and point


def test_ingest_invariants(spark, corpus, tmp_path):
    base, new = corpus
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"))
    all_docs = base.unionByName(new).persist()
    batches = [
        all_docs.filter(F.col("doc_id") % 3 == i).persist() for i in range(3)
    ]
    kept_ids, dropped = set(), {}
    n_total = 0
    for i, b in enumerate(batches):
        r = idx.ingest(spark, b, threshold=0.35, stream_id="t", batch_id=i)
        m = r["metrics"]
        assert m["docs_in"] == m["docs_kept"] + m["docs_dropped"]
        n_total += m["docs_in"]
        kept_ids |= {row["doc_id"] for row in r["kept"].select("doc_id").collect()}
        for row in r["pairs"].collect():
            dropped.setdefault(row["doc_id"], row["dup_of"])
    assert n_total == all_docs.count()
    # index now holds exactly the kept docs
    assert {r["doc_id"] for r in idx.sigs_table.read(spark, seq_col="seq")
            .select("doc_id").collect()} == kept_ids
    # every rejection chain terminates at a kept doc
    for d, dup_of in dropped.items():
        assert d not in kept_ids
        seen = set()
        while dup_of not in kept_ids:
            assert dup_of in dropped and dup_of not in seen, (d, dup_of)
            seen.add(dup_of)
            dup_of = dropped[dup_of]
    # the kept corpus is pairwise est-dup-free at the ingest threshold
    fresh = MinHashIndex.create(spark, str(tmp_path / "fresh"))
    kept_docs = all_docs.join(
        spark.createDataFrame([(i,) for i in kept_ids], "doc_id long"),
        "doc_id",
    )
    residual = fresh.check(spark, kept_docs, threshold=0.35).collect()
    assert residual == []
    for b in batches:
        b.unpersist()
    all_docs.unpersist()


def test_ingest_replay_is_noop(spark, corpus, tmp_path):
    base, _ = corpus
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"))
    r1 = idx.ingest(spark, base, threshold=0.35, stream_id="s", batch_id=0)
    v_bands = idx.bands_table.current_version()
    v_sigs = idx.sigs_table.current_version()
    r2 = idx.ingest(spark, base, threshold=0.35, stream_id="s", batch_id=0)
    assert r2["metrics"]["bands"].get("skipped_replay")
    assert r2["metrics"]["sigs"].get("skipped_replay")
    assert idx.bands_table.current_version() == v_bands
    assert idx.sigs_table.current_version() == v_sigs
    assert r1["metrics"]["docs_kept"] > 0


def test_revision_seq_guard(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"))
    v1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", 5)],
        "doc_id long, text string, seq long",
    )
    idx.add(spark, v1, seq_col="seq")
    sig1 = idx.sigs_table.read(spark, seq_col="seq").collect()[0]["sig"]
    revised = spark.createDataFrame(
        [(1, "totally different words entirely here now", 6)],
        "doc_id long, text string, seq long",
    )
    idx.add(spark, revised, seq_col="seq")
    sig2 = idx.sigs_table.read(spark, seq_col="seq").collect()[0]["sig"]
    assert sig1 != sig2
    stale = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", 4)],
        "doc_id long, text string, seq long",
    )
    idx.add(spark, stale, seq_col="seq")
    sig3 = idx.sigs_table.read(spark, seq_col="seq").collect()[0]["sig"]
    assert sig3 == sig2, "lower-seq revision must not regress the index"
    # bandhash layout: the revision INSERTED its new band keys; the v1 rows
    # linger as harmless stale candidates (verified against the current,
    # seq-guarded signature), and the stale seq=4 re-add was a guard no-op
    bands_now = idx.bands_table.read(spark, seq_col="seq")
    assert bands_now.count() == 2 * idx.bands
    assert bands_now.agg(F.min("seq")).first()[0] == 5  # seq-4 re-add rejected
    # maintenance tombstones exactly the stale (seq < current sig seq) rows
    res = idx.vacuum_stale_bands(spark)
    assert res["stale_tombstoned"] == idx.bands
    after = idx.bands_table.read(spark, seq_col="seq")
    assert after.count() == idx.bands
    assert after.agg(F.min("seq")).first()[0] == 6


def test_check_prunes_band_buckets(spark, corpus, tmp_path):
    """Prefix bucketing (bucket_cols=(band, bandhash)) must turn a small
    batch's check into a probe of a STRICT SUBSET of the band files, with
    results identical to the full-scan fallback."""
    base, new = corpus
    idx = MinHashIndex.create(spark, str(tmp_path / "idx"), num_buckets=16)
    idx.add(spark, base)
    # one doc whose planted near-dup source (doc 0) is in the indexed base
    small = new.filter(F.col("doc_id") == 1000)

    pruned = sorted(
        (r["doc_id"], r["dup_of"], r["est_jaccard"], r["dup_src"])
        for r in idx.check(spark, small, threshold=0.35).collect()
    )
    try:
        idx.max_bucket_probe = 0  # force the full-scan fallback
        full = sorted(
            (r["doc_id"], r["dup_of"], r["est_jaccard"], r["dup_src"])
            for r in idx.check(spark, small, threshold=0.35).collect()
        )
    finally:
        del idx.max_bucket_probe  # restore the class default
    assert pruned == full and len(pruned) >= 1

    # file-count evidence: the batch's band pairs hit < all buckets, and
    # every bucket holds >= 1 file, so the probed file set is a strict subset
    sig = idx._sig_frame(small, "doc_id", "text", None)
    pairs = [(r["band"], r["bandhash"])
             for r in idx._band_rows(sig).select("band", "bandhash").collect()]
    hit = idx.bands_table.buckets_for_values(spark, pairs)
    m = idx.bands_table.manifest()
    files_hit = sum(len(m["buckets"].get(str(b), [])) for b in hit)
    files_all = sum(len(fs) for fs in m["buckets"].values())
    assert 0 < files_hit < files_all
    # and the pruned read's plan actually scans only those files
    scanned = {
        p.split("/bands/", 1)[1]
        for p in idx.bands_table.read(spark, seq_col="seq", buckets=hit)
        .inputFiles()
    }
    assert scanned == {
        f for b in hit for f in m["buckets"].get(str(b), [])
    }


def test_open_restores_params(spark, tmp_path):
    MinHashIndex.create(spark, str(tmp_path / "idx"), num_hashes=16, bands=4,
                        shingle_n=2, num_buckets=4)
    idx = MinHashIndex.open(str(tmp_path / "idx"))
    assert (idx.num_hashes, idx.bands, idx.shingle_n, idx.num_buckets) == (
        16, 4, 2, 4
    )
    with pytest.raises(ValueError, match="already exists"):
        MinHashIndex.create(spark, str(tmp_path / "idx"))


def test_multi_revision_batch_signs_winning_revision_only(spark, tmp_path):
    """A micro-batch carrying several revisions of one doc must index the
    signature of the WINNING revision's text alone — never a min-hash over
    the union of revisions' shingles (which matches no revision)."""
    from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex

    both = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", 1),
         (1, "entirely different replacement text body for revision two", 2)],
        "doc_id long, text string, seq long",
    )
    winner_only = both.filter("seq = 2")
    a = MinHashIndex.create(spark, str(tmp_path / "a"), num_buckets=2)
    a.add(spark, both, seq_col="seq")
    b = MinHashIndex.create(spark, str(tmp_path / "b"), num_buckets=2)
    b.add(spark, winner_only, seq_col="seq")
    sig_a = a.sigs_table.read(spark, seq_col="seq").collect()
    sig_b = b.sigs_table.read(spark, seq_col="seq").collect()
    assert len(sig_a) == len(sig_b) == 1
    assert sig_a[0]["sig"] == sig_b[0]["sig"]
    assert sig_a[0]["seq"] == 2


def test_hash_fn_frozen_in_config_and_open_roundtrip(spark, tmp_path):
    """hash_fn is an LSH parameter: frozen at create, restored by open();
    configs written before the field existed default to xxhash64."""
    import json
    import os

    from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex

    p = str(tmp_path / "md5idx")
    MinHashIndex.create(spark, p, num_buckets=4, hash_fn="md5")
    assert MinHashIndex.open(p).hash_fn == "md5"

    with pytest.raises(ValueError, match="unknown hash_fn"):
        MinHashIndex(str(tmp_path / "x"), hash_fn="sha1")

    # pre-round-4 config without the key -> xxhash64
    legacy = str(tmp_path / "legacy")
    MinHashIndex.create(spark, legacy, num_buckets=4)
    cfgp = os.path.join(legacy, "index_config.json")
    cfg = json.load(open(cfgp))
    cfg.pop("hash_fn")
    json.dump(cfg, open(cfgp, "w"))
    assert MinHashIndex.open(legacy).hash_fn == "xxhash64"
