"""Persisted MinHash-LSH index for INCREMENTAL near-duplicate detection.

The batch operators in dedup.py answer "which pairs in THIS frame are
near-duplicates" — a training-data ingest pipeline needs the other shape:
"is this new micro-batch a near-duplicate of anything ALREADY ACCEPTED into
the corpus", asked millions of times against a corpus that no longer fits a
self-join and whose text should never be re-read. ``MinHashIndex`` persists
the per-document MinHash machinery in two :class:`SnapshotTable`s so each
check touches only hashes, never corpus text:

- ``bands/``  — key ``(band, bandhash, doc_id)``, BUCKETED BY THE
  ``(band, bandhash)`` PREFIX (SnapshotTable ``bucket_cols``); one narrow
  row per document per LSH band. This is the collision side of every check,
  and the prefix bucketing is what makes a check a PROBE instead of a scan:
  the batch's own (band, bandhash) pairs name the only buckets where a
  collision can live, so ``check`` reads a strict subset of the band files.
- ``sigs/``   — key ``(doc_id,)``; the full MinHash signature
  (``array<long>``), read only for the (small) candidate set to estimate
  Jaccard as the fraction of agreeing signature positions (the standard
  MinHash estimator — E[frac] = J; no shingle sets are stored or re-read).

Revision semantics under the bandhash layout: re-indexing a revised doc
INSERTS its new band keys; the old revision's band rows linger (their key
embeds the old hash, so no upsert can replace them in place). That is safe
by construction — a stale band row can only ever ADD a candidate pair, and
every candidate is verified against the doc's CURRENT signature from the
seq-guarded ``sigs`` table, so stale candidates either re-confirm a real
near-duplicate or fail the Jaccard check. Stale rows cost bytes, not
correctness; ``vacuum_stale_bands`` tombstones them (bands.seq < sigs.seq)
at maintenance time.

Both tables go through the engine's MERGE, so index maintenance inherits
the CDC guarantees: idempotent per ``(stream_id, batch_id)`` (a replayed
ingest batch is a no-op), seq-guarded (a REVISED document re-indexed with a
higher ``seq`` atomically replaces its band rows and signature), and
time-travel/vacuum/compact all apply.

Scale shape (100 TB corpus, ~10^10 docs):

- ``check`` never shuffles the index: new-batch band rows (micro-batch
  sized) are broadcast against a scan of the narrow band table — one
  map-side join — and candidate signatures are fetched with
  ``SnapshotTable.read_keys`` (bucket-pruned point reads) while the
  candidate set stays under ``max_point_lookup``, falling back to a
  broadcast-candidates scan join beyond it. Corpus text: untouched.
- ``add`` merges band/sig rows for only the accepted docs; file-level
  pruning in the MERGE keeps the rewrite proportional to touched files.
- hot band hashes (boilerplate near-identical docs) fan out candidate
  pairs; ``max_candidates_per_bucket`` caps the per-bucket join fan-out the
  same way dedup.py's ngram operator guards its prefix blocks.

Reference parity: the reference deduplicates events by primary-key lookup
at ingest (`/root/reference/src/nostr_pipeline/loaders/event_loader.py:31-40`
save_event: primary-key existence check via ``session.get`` then skip);
this operator is the same ingest-time membership
question generalized from exact id equality to near-duplicate text
similarity, which the reference does not attempt.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nostr_data_pipeline_spark.operators.dedup import (
    _band_hash,
    canonical_docs,
    hash64,
    shingles_of_tokens,
    tokenize,
)
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

_CONFIG = "index_config.json"


def _bands_schema() -> T.StructType:
    return T.StructType([
        T.StructField("band", T.IntegerType()),
        T.StructField("bandhash", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])


def _sigs_schema() -> T.StructType:
    return T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("sighash", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])


class MinHashIndex:
    """See module docstring. Construct with :meth:`create` / :meth:`open` —
    the LSH parameters are frozen at create time (band hashes computed with
    different ``num_hashes``/``bands``/``shingle_n`` never collide
    meaningfully, so a parameter change means a rebuild, exactly like
    re-bucketing a table)."""

    # cap on distinct (band, bandhash) pairs collected per check for bucket
    # pruning; above it the check degrades to the full band-table scan
    max_bucket_probe: int = 8192

    def __init__(self, path: str, num_hashes: int = 32, bands: int = 8,
                 shingle_n: int = 3, num_buckets: int = 16,
                 hash_fn: str = "xxhash64"):
        if bands <= 0 or num_hashes % bands != 0:
            raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")
        from nostr_data_pipeline_spark.operators.dedup import (
            _check_md5_seed_bound,
        )
        _check_md5_seed_bound(hash_fn, num_hashes)
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.num_buckets = num_buckets
        # 'md5' = dedup.hash64's oracle-portable mode (frozen at create time
        # like every other LSH parameter: signatures from different hash
        # chains never collide meaningfully)
        self.hash_fn = hash_fn
        self.bands_table = SnapshotTable(
            os.path.join(path, "bands"),
            key_cols=("band", "bandhash", "doc_id"),
            bucket_cols=("band", "bandhash"),
            num_buckets=num_buckets,
        )
        self.sigs_table = SnapshotTable(
            os.path.join(path, "sigs"), key_cols=("doc_id",),
            num_buckets=num_buckets,
        )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, path: str, num_hashes: int = 32,
               bands: int = 8, shingle_n: int = 3,
               num_buckets: int = 16,
               hash_fn: str = "xxhash64") -> "MinHashIndex":
        idx = cls(path, num_hashes, bands, shingle_n, num_buckets, hash_fn)
        os.makedirs(path, exist_ok=True)
        cfg = os.path.join(path, _CONFIG)
        if os.path.exists(cfg):
            raise ValueError(f"index already exists at {path}")
        idx.bands_table.create(_bands_schema())
        idx.sigs_table.create(_sigs_schema())
        with open(cfg, "w") as f:
            json.dump({"num_hashes": num_hashes, "bands": bands,
                       "shingle_n": shingle_n, "num_buckets": num_buckets,
                       "hash_fn": hash_fn}, f)
        return idx

    @classmethod
    def exists(cls, path: str) -> bool:
        """True iff a MinHashIndex was created at ``path`` (the config file
        is written last in create(), so its presence implies both tables)."""
        return os.path.exists(os.path.join(path, _CONFIG))

    @classmethod
    def open(cls, path: str) -> "MinHashIndex":
        with open(os.path.join(path, _CONFIG)) as f:
            cfg = json.load(f)
        return cls(path, **cfg)

    # ---------------------------------------------------------- signatures
    def _sig_frame(self, docs: DataFrame, id_col: str, text_col: str,
                   seq_col: str | None) -> DataFrame:
        """One row per doc: (doc_id, sig array<long>, sighash, seq, plus a
        bandhash array) — same hash chain as dedup.minhash_near_duplicates
        in the index's ``hash_fn`` mode (xxhash64(h, shingle) per slot, or
        the oracle-portable md5 double-hash chain; matching band hashes), so
        an index built here finds exactly the candidates the batch operator
        would. Explode + k primitive min-aggs keeps the aggregation
        inside whole-stage codegen (see dedup.py for the measured 10x vs the
        array-expression form)."""
        k, rows = self.num_hashes, self.num_hashes // self.bands
        seq = F.col(seq_col).cast("long") if seq_col else F.lit(0).cast("long")
        src = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_text"),
            seq.alias("seq"),
        )
        # a CDC micro-batch can carry several revisions of one doc (the
        # exact shape resolve_lww exists for): the signature must hash the
        # WINNING revision's text alone — min-aggregating shingles across
        # revisions would persist a signature matching NO revision, stamped
        # with the winner's seq (silent index corruption). (seq, text)
        # ordering keeps the pick deterministic under seq ties.
        src = src.groupBy("doc_id").agg(
            F.max_by(F.col("_text"), F.struct(F.col("seq"), F.col("_text")))
            .alias("_text"),
            F.max("seq").alias("seq"),
        )
        base = src.select(
            "doc_id",
            tokenize(F.col("_text")).alias("_toks"),
            "seq",
        ).select(
            "doc_id", "seq",
            shingles_of_tokens(F.col("_toks"), self.shingle_n).alias("_sh"),
        )
        exploded = base.select("doc_id", "seq", F.explode("_sh").alias("_s"))
        if self.hash_fn == "md5":
            # oracle-portable chain — identical derivation to
            # minhash_near_duplicates(hash_fn='md5'): one digest per
            # shingle, k seeds by double hashing (see dedup.hash64)
            digest = F.md5(F.col("_s"))
            b1 = F.conv(F.substring(digest, 2, 15), 16, 10).cast("long")
            b2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long")
            hashed = exploded.select(
                "doc_id", "seq",
                *[(b1 + F.lit(h) * b2).alias(f"_h{h}") for h in range(k)],
            )
        else:
            hashed = exploded.select(
                "doc_id", "seq",
                *[F.xxhash64(F.lit(h), F.col("_s")).alias(f"_h{h}")
                  for h in range(k)],
            )
        sig = hashed.groupBy("doc_id").agg(
            F.max("seq").alias("seq"),
            *[F.min(f"_h{h}").alias(f"_h{h}") for h in range(k)],
        )
        slots = [F.col(f"_h{h}") for h in range(k)]
        bandhashes = [
            _band_hash(b, slots[b * rows:(b + 1) * rows], self.hash_fn)
            for b in range(self.bands)
        ]
        if self.hash_fn == "md5":
            sighash = hash64(
                F.concat(F.lit("S:"), F.concat_ws(
                    ",", *[s.cast("string") for s in slots])),
                hash_fn="md5",
            )
        else:
            sighash = F.xxhash64(*slots)
        return sig.select(
            "doc_id", "seq",
            F.array(*slots).alias("sig"),
            sighash.alias("sighash"),
            F.array(*bandhashes).alias("_bandhashes"),
        )

    def _band_rows(self, sig_frame: DataFrame) -> DataFrame:
        return sig_frame.select(
            "doc_id", "seq",
            F.posexplode("_bandhashes").alias("band", "bandhash"),
        ).select("doc_id", "band", "bandhash", "seq")

    @staticmethod
    def _est_jaccard(a, b) -> F.Column:
        """Fraction of agreeing MinHash slots — unbiased Jaccard estimator."""
        agree = F.aggregate(
            F.zip_with(a, b, lambda x, y: (x == y).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        return F.round(agree.cast("double") / F.size(a), 4)

    # --------------------------------------------------------------- check
    def check(self, spark: SparkSession, docs: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              seq_col: str | None = None, threshold: float = 0.5,
              within_batch: bool = True,
              max_point_lookup: int = 1024,
              sig_frame: DataFrame | None = None) -> DataFrame:
        """Near-duplicate pairs for a new batch: ``(doc_id, dup_of,
        est_jaccard, dup_src)`` where ``dup_src`` is ``'index'`` (``dup_of``
        is an already-indexed doc) or ``'batch'`` (``dup_of`` is a
        smaller-id doc of the same batch; only emitted when
        ``within_batch``). Estimated Jaccard >= ``threshold``.

        The candidate-signature fetch collects the candidate id set to the
        driver ONLY while it is small (< ``max_point_lookup``, kept modest
        because ``read_keys`` compiles the probe into an OR-of-equalities
        scan predicate) — that is what makes the bucket-and-file-pruned
        point read possible; past the cap it switches to a full-scan join
        with the (still batch-sized) candidate set broadcast."""
        # ``sig_frame``: a precomputed _sig_frame for these docs (ingest
        # computes it once for check + add); lifecycle stays with the caller
        own_sig = sig_frame is None
        new_sig = self._sig_frame(docs, id_col, text_col, seq_col) \
            if own_sig else sig_frame
        # the signature frame feeds band rows + up to 3 joins below; without
        # pinning, each consumer re-tokenizes the batch
        if own_sig:
            new_sig = new_sig.persist()
        try:
            new_bands = self._band_rows(new_sig)
            # bucket-pruned index probe: the batch's own (band, bandhash)
            # pairs name the ONLY buckets a collision can live in (prefix
            # bucketing, see module docstring) — collect them (micro-batch
            # sized: <= docs x bands pairs, capped) and read just those
            # buckets of the band table. Past the cap, fall back to the
            # full narrow scan (still never shuffled).
            probe = [
                (r["band"], r["bandhash"])
                for r in new_bands.select("band", "bandhash").distinct()
                .limit(self.max_bucket_probe + 1).collect()
            ]
            if len(probe) <= self.max_bucket_probe:
                hit = self.bands_table.buckets_for_values(spark, probe)
                # two pruning levels: bucket (the probe pairs hash to the
                # only buckets a collision can live in) then file — within a
                # hit bucket, a file whose recorded (band, bandhash, doc_id)
                # key range excludes every probe (band, bandhash) PREFIX is
                # skipped before the scan is planned
                idx_scan = self.bands_table.read(spark, seq_col="seq",
                                                 buckets=hit,
                                                 key_prefixes=probe)
            else:
                idx_scan = self.bands_table.read(spark, seq_col="seq")
            idx_bands = idx_scan.select(
                F.col("doc_id").alias("dup_of"), "band", "bandhash",
            )
            # broadcast the micro-batch side: candidate generation is a
            # map-side join over a scan of the narrow index band table — the
            # index is never shuffled per check
            cross = (
                idx_bands.join(
                    F.broadcast(new_bands), ["band", "bandhash"], "inner",
                )
                .filter(F.col("doc_id") != F.col("dup_of"))
                .select("doc_id", "dup_of")
                .dropDuplicates(["doc_id", "dup_of"])
                # 2-3 consumers (candidate collect, the jaccard join, the
                # over-cap fallback semi-join) — without pinning, each one
                # re-scans the full index band table; the scan is the
                # dominant I/O of a check at corpus scale
                .persist()
            )
            cand_ids = [
                (r["dup_of"],)
                for r in cross.select("dup_of").distinct()
                .limit(max_point_lookup + 1).collect()
            ]
            if len(cand_ids) <= max_point_lookup:
                idx_sigs = self.sigs_table.read_keys(
                    spark, cand_ids, seq_col="seq",
                )
            else:
                idx_sigs = self.sigs_table.read(spark, seq_col="seq").join(
                    F.broadcast(cross.select("dup_of").distinct()),
                    F.col("doc_id") == F.col("dup_of"), "left_semi",
                )
            idx_sigs = idx_sigs.select(
                F.col("doc_id").alias("dup_of"), F.col("sig").alias("_isig"),
            )
            cross_pairs = (
                cross.join(F.broadcast(new_sig.select("doc_id", "sig")), "doc_id")
                .join(idx_sigs, "dup_of")
                .select(
                    "doc_id", "dup_of",
                    self._est_jaccard(F.col("sig"), F.col("_isig"))
                    .alias("est_jaccard"),
                    F.lit("index").alias("dup_src"),
                )
                .filter(F.col("est_jaccard") >= threshold)
            )
            if not within_batch:
                # materialize before the finally-unpersist below severs the
                # cached signature frame out from under the returned plan
                return cross_pairs.localCheckpoint(eager=True)
            l, r = new_bands.alias("l"), new_bands.alias("r")
            within = (
                l.join(
                    r,
                    (F.col("l.band") == F.col("r.band"))
                    & (F.col("l.bandhash") == F.col("r.bandhash"))
                    & (F.col("l.doc_id") > F.col("r.doc_id")),
                )
                .select(
                    F.col("l.doc_id").alias("doc_id"),
                    F.col("r.doc_id").alias("dup_of"),
                )
                .dropDuplicates(["doc_id", "dup_of"])
                .join(F.broadcast(new_sig.select("doc_id", "sig")), "doc_id")
                .join(
                    F.broadcast(
                        new_sig.select(
                            F.col("doc_id").alias("dup_of"),
                            F.col("sig").alias("_isig"),
                        )
                    ),
                    "dup_of",
                )
                .select(
                    "doc_id", "dup_of",
                    self._est_jaccard(F.col("sig"), F.col("_isig"))
                    .alias("est_jaccard"),
                    F.lit("batch").alias("dup_src"),
                )
                .filter(F.col("est_jaccard") >= threshold)
            )
            out = cross_pairs.unionByName(within)
            # localCheckpoint before unpersisting the signature cache the
            # plan depends on: materializes now, severs the lineage
            return out.localCheckpoint(eager=True)
        finally:
            # both return paths localCheckpoint eagerly, so nothing in the
            # returned plan still reads these caches
            if own_sig:
                new_sig.unpersist()
            try:
                cross.unpersist()
            except NameError:  # _band_rows raised before cross was built
                pass

    # ----------------------------------------------------------------- add
    def add(self, spark: SparkSession, docs: DataFrame,
            id_col: str = "doc_id", text_col: str = "text",
            seq_col: str | None = None, stream_id: str | None = None,
            batch_id: int | None = None,
            sig_frame: DataFrame | None = None) -> dict[str, Any]:
        """Merge the batch's band rows and signatures into the index.
        Idempotent per (stream_id, batch_id); a doc re-added with a higher
        ``seq`` (revised text) atomically replaces its rows. ``sig_frame``:
        a precomputed _sig_frame for exactly these docs — ingest passes the
        one it already built so the costliest stage (tokenize + shingle
        explode + k min-aggs over the batch text) runs once, not twice."""
        sig = (self._sig_frame(docs, id_col, text_col, seq_col)
               if sig_frame is None else sig_frame).persist()
        try:
            bm = self.bands_table.merge(
                spark, self._band_rows(sig), seq_col="seq", tie_col="bandhash",
                stream_id=stream_id, batch_id=batch_id,
            )
            sm = self.sigs_table.merge(
                spark, sig.select("doc_id", "sig", "sighash", "seq"),
                seq_col="seq", tie_col="sighash",
                stream_id=stream_id, batch_id=batch_id,
            )
        finally:
            sig.unpersist()
        return {"bands": bm, "sigs": sm}

    def vacuum_stale_bands(self, spark: SparkSession) -> dict[str, Any]:
        """Tombstone band rows left behind by document revisions (their seq
        is below the doc's CURRENT signature seq — see module docstring for
        why they are harmless until vacuumed), then purge the tombstones.
        One join of the two narrow tables + one merge; a maintenance op,
        off the ingest path."""
        bands = self.bands_table.read(spark, seq_col="seq")
        cur = self.sigs_table.read(spark, seq_col="seq").select(
            "doc_id", F.col("seq").alias("_cur_seq"),
        )
        stale = (
            bands.join(cur, "doc_id")
            .filter(F.col("seq") < F.col("_cur_seq"))
            .select(
                "band", "bandhash", "doc_id",
                # stamp with the current seq so the tombstone wins the guard
                F.col("_cur_seq").alias("seq"),
                F.lit(True).alias("_deleted"),
            )
        )
        m = self.bands_table.merge(spark, stale, seq_col="seq",
                                   tie_col="bandhash")
        self.bands_table.vacuum_tombstones(spark)
        return {"stale_tombstoned": m.get("rows_deleted", 0)
                + m.get("rows_tombstoned", 0)}

    # -------------------------------------------------------------- ingest
    def ingest(self, spark: SparkSession, docs: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               seq_col: str | None = None, threshold: float = 0.5,
               stream_id: str | None = None,
               batch_id: int | None = None) -> dict[str, Any]:
        """Dedup-at-ingest: drop every doc near-duplicating the indexed
        corpus, canonical-elect within the batch (connected components over
        the within-batch pairs — min-id per cluster survives, same election
        as dedup.canonical_docs), index the survivors, and report.

        Returns ``{"kept": DataFrame, "pairs": DataFrame, "metrics": ...}``;
        ``kept`` is the accepted batch slice (the caller appends it to their
        corpus sink), ``pairs`` the audit trail of every rejection.
        A rejected doc's ``dup_of`` chain always terminates at a kept or
        previously-indexed doc: within-batch rejections point at their
        cluster canonical, and a canonical rejected against the index points
        at the indexed doc.
        """
        # one signature pass serves BOTH the check and the add of survivors
        sig = self._sig_frame(docs, id_col, text_col, seq_col).persist()
        pairs = self.check(
            spark, docs, id_col, text_col, seq_col,
            threshold=threshold, within_batch=True, sig_frame=sig,
        ).persist()
        index_dups = pairs.filter(F.col("dup_src") == "index") \
            .select("doc_id").distinct()
        ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
        comp = canonical_docs(
            ids, pairs.filter(F.col("dup_src") == "batch"),
            id_col="doc_id", id1_col="dup_of", id2_col="doc_id",
        )
        drop = (
            comp.filter(~F.col("is_canonical")).select("doc_id")
            .unionByName(index_dups).distinct()
            .localCheckpoint(eager=True)
        )
        kept = docs.join(
            drop, docs[id_col].cast("long") == drop["doc_id"], "left_anti",
        )
        kept_sig = sig.join(drop, sig["doc_id"] == drop["doc_id"], "left_anti")
        metrics = self.add(
            spark, kept, id_col, text_col, seq_col,
            stream_id=stream_id, batch_id=batch_id, sig_frame=kept_sig,
        )
        n_in = docs.count()
        n_drop = drop.count()
        pairs.unpersist()
        sig.unpersist()
        return {
            "kept": kept, "pairs": pairs,
            "metrics": {"docs_in": n_in, "docs_dropped": n_drop,
                        "docs_kept": n_in - n_drop, **metrics},
        }
