"""Persisted hyperplane-LSH index for INCREMENTAL embedding near-duplicate
detection — the vector-space sibling of :class:`MinHashIndex` (text), asked
at the same point in the topology: "is this new batch of embeddings a
near-duplicate of anything ALREADY ACCEPTED", against a corpus that no
longer fits a self-join and whose vectors should be fetched, not rescanned.

Two :class:`SnapshotTable`s (both MERGE-maintained — idempotent per
``(stream_id, batch_id)``, seq-guarded revisions, time-travel / vacuum /
compact all apply):

- ``buckets/`` — key ``(bucket, vec_id)``, BUCKETED BY THE ``bucket``
  PREFIX: one narrow row per vector per probe bucket. A vector is indexed
  under its own sign-bit bucket; ``check`` probes the new vector's bucket
  plus every bucket within ``probe_flips`` Hamming bits (multiprobe — the
  ann_lsh_topk recipe), so near neighbors that fall just across ONE
  hyperplane are still found. The prefix bucketing makes a check a PROBE:
  the batch's own probe-bucket set names the only storage buckets a
  candidate can live in, so the scan covers a strict subset of the files.
- ``vectors/`` — key ``(vec_id,)``; the embedding payload, read only for
  the (small) candidate set to verify EXACT cosine (no approximation in
  the accept/reject decision — LSH shapes recall, never precision).

Scale shape (10^9+ vectors): ``check`` never shuffles the index — the
micro-batch's probe rows broadcast against the bucket-pruned narrow scan;
candidate vectors are fetched via bucket-and-file-pruned ``read_keys``
point reads while the candidate set is small (``max_point_lookup``),
falling back to a broadcast-candidates scan join past it. The one global
artifact is the hyperplane matrix — tiny, deterministic (seeded), frozen
in the index config exactly like MinHashIndex's LSH parameters (buckets
computed under different planes never collide meaningfully).

Reference parity: the reference dedupes events by primary-key lookup at
ingest (`/root/reference/src/nostr_pipeline/loaders/event_loader.py:31-40`
save_event: primary-key existence check via ``session.get`` then skip);
this answers the same ingest-time membership question
generalized to cosine similarity over an embedding column — the modality
the reference does not model at all.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nostr_data_pipeline_spark.operators.dedup import (
    _dot,
    _hyperplanes,
    embedding_lsh_bucket,
)
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

_CONFIG = "index_config.json"


def _buckets_schema() -> T.StructType:
    return T.StructType([
        T.StructField("bucket", T.IntegerType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])


def _vectors_schema() -> T.StructType:
    return T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
    ])


class EmbeddingIndex:
    """See module docstring. LSH parameters (dim, n_planes, seed) are frozen
    at create time."""

    # cap on distinct probe buckets collected per check; above it the check
    # degrades to the full narrow bucket-table scan (still never shuffled)
    max_bucket_probe: int = 8192

    def __init__(self, path: str, dim: int = 64, n_planes: int = 8,
                 seed: int = 42, num_buckets: int = 16):
        if n_planes < 1 or n_planes > 24:
            # 2^n_planes LSH cells; >24 overflows the int bucket id and
            # makes every cell a singleton (no blocking value anyway)
            raise ValueError(f"n_planes={n_planes} out of range [1, 24]")
        self.path = path
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.num_buckets = num_buckets
        self.buckets_table = SnapshotTable(
            os.path.join(path, "buckets"),
            key_cols=("bucket", "vec_id"),
            bucket_cols=("bucket",),
            num_buckets=num_buckets,
        )
        self.vectors_table = SnapshotTable(
            os.path.join(path, "vectors"), key_cols=("vec_id",),
            num_buckets=num_buckets,
        )

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, path: str, dim: int = 64,
               n_planes: int = 8, seed: int = 42,
               num_buckets: int = 16) -> "EmbeddingIndex":
        idx = cls(path, dim, n_planes, seed, num_buckets)
        os.makedirs(path, exist_ok=True)
        cfg = os.path.join(path, _CONFIG)
        if os.path.exists(cfg):
            raise ValueError(f"index already exists at {path}")
        idx.buckets_table.create(_buckets_schema())
        idx.vectors_table.create(_vectors_schema())
        with open(cfg, "w") as f:
            json.dump({"dim": dim, "n_planes": n_planes, "seed": seed,
                       "num_buckets": num_buckets}, f)
        return idx

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, _CONFIG))

    @classmethod
    def open(cls, path: str) -> "EmbeddingIndex":
        with open(os.path.join(path, _CONFIG)) as f:
            cfg = json.load(f)
        return cls(path, **cfg)

    # ------------------------------------------------------------- internal
    def _vec_frame(self, df: DataFrame, id_col: str, vec_col: str,
                   seq_col: str | None) -> DataFrame:
        """(vec_id, embedding double[], bucket, seq) — one row per vector,
        the winning (seq, bucket) revision if the batch carries several
        (same discipline as MinHashIndex._sig_frame: index the winner's
        vector, stamped with its seq). Dim mismatches raise per row — a
        silent mismatch would null the hyperplane dots and collapse
        blocking (see embedding_near_duplicates)."""
        seq = F.col(seq_col).cast("long") if seq_col else F.lit(0).cast("long")
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        src = df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            v.alias("embedding"),
            seq.alias("seq"),
        )
        src = src.groupBy("vec_id").agg(
            F.max_by(F.col("embedding"),
                     F.struct(F.col("seq"), F.col("embedding")))
            .alias("embedding"),
            F.max("seq").alias("seq"),
        )
        bkt = F.when(
            F.size(F.col("embedding")) == self.dim,
            embedding_lsh_bucket(F.col("embedding"), self.dim,
                                 self.n_planes, self.seed),
        ).otherwise(
            F.raise_error(F.concat(
                F.lit(f"embedding length != dim={self.dim}: got "),
                F.size(F.col("embedding")).cast("string"),
            ))
        )
        return src.select("vec_id", "embedding", bkt.alias("bucket"), "seq")

    def _probe_buckets_col(self, bucket_col, probe_flips: int) -> F.Column:
        """Array of buckets within ``probe_flips`` Hamming bits (incl. the
        bucket itself) — the multiprobe set, built with XOR bit flips like
        ann_lsh_topk."""
        probes = [bucket_col]
        if probe_flips >= 1:
            probes += [bucket_col.bitwiseXOR(F.lit(1 << i))
                       for i in range(self.n_planes)]
        if probe_flips >= 2:
            probes += [
                bucket_col.bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(self.n_planes) for j in range(i + 1, self.n_planes)
            ]
        return F.array(*probes)

    @staticmethod
    def _cos(a, b) -> F.Column:
        return F.round(
            _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 4)

    # --------------------------------------------------------------- check
    def check(self, spark: SparkSession, df: DataFrame,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seq_col: str | None = None, threshold: float = 0.9,
              probe_flips: int = 1, within_batch: bool = True,
              max_point_lookup: int = 1024,
              vec_frame: DataFrame | None = None) -> DataFrame:
        """Near-duplicate pairs for a new batch of vectors: ``(vec_id,
        dup_of, cos_sim, dup_src)`` with EXACT cosine >= threshold;
        ``dup_src`` = 'index' (an already-indexed vector) or 'batch' (a
        smaller-id vector of the same batch). ``probe_flips`` trades probe
        fan-out for recall across single/double hyperplane misses."""
        own = vec_frame is None
        new = self._vec_frame(df, id_col, vec_col, seq_col) if own \
            else vec_frame
        if own:
            new = new.persist()
        try:
            probes = new.select(
                "vec_id", "embedding",
                F.explode(self._probe_buckets_col(F.col("bucket"),
                                                  probe_flips))
                .alias("bucket"),
            )
            probe_vals = [
                (r["bucket"],)
                for r in probes.select("bucket").distinct()
                .limit(self.max_bucket_probe + 1).collect()
            ]
            if len(probe_vals) <= self.max_bucket_probe:
                hit = self.buckets_table.buckets_for_values(
                    spark, probe_vals)
                idx_scan = self.buckets_table.read(
                    spark, seq_col="seq", buckets=hit,
                    key_prefixes=probe_vals)
            else:
                idx_scan = self.buckets_table.read(spark, seq_col="seq")
            cand = (
                idx_scan.select(F.col("vec_id").alias("dup_of"), "bucket")
                .join(F.broadcast(probes.select("vec_id", "bucket")),
                      ["bucket"], "inner")
                .filter(F.col("vec_id") != F.col("dup_of"))
                .select("vec_id", "dup_of")
                .dropDuplicates(["vec_id", "dup_of"])
                .persist()
            )
            cand_ids = [
                (r["dup_of"],)
                for r in cand.select("dup_of").distinct()
                .limit(max_point_lookup + 1).collect()
            ]
            if len(cand_ids) <= max_point_lookup:
                idx_vecs = self.vectors_table.read_keys(
                    spark, cand_ids, seq_col="seq")
            else:
                idx_vecs = self.vectors_table.read(spark, seq_col="seq").join(
                    F.broadcast(cand.select("dup_of").distinct()),
                    F.col("vec_id") == F.col("dup_of"), "left_semi")
            idx_vecs = idx_vecs.select(
                F.col("vec_id").alias("dup_of"),
                F.col("embedding").alias("_iv"))
            cross_pairs = (
                cand.join(F.broadcast(new.select("vec_id", "embedding")),
                          "vec_id")
                .join(idx_vecs, "dup_of")
                .select("vec_id", "dup_of",
                        self._cos(F.col("embedding"), F.col("_iv"))
                        .alias("cos_sim"),
                        F.lit("index").alias("dup_src"))
                .filter(F.col("cos_sim") >= threshold)
            )
            if not within_batch:
                return cross_pairs.localCheckpoint(eager=True)
            l, r = probes.alias("l"), probes.alias("r")
            # within-batch: multiprobe join too, so near pairs straddling
            # one hyperplane are still candidates; the l-bucket must be a
            # REAL bucket (not a flipped probe) to avoid flip-vs-flip
            # double fan-out — join probe rows against real bucket rows
            real = new.select(
                F.col("vec_id").alias("r_id"),
                F.col("embedding").alias("r_v"), "bucket")
            within = (
                probes.join(real, ["bucket"], "inner")
                .filter(F.col("vec_id") > F.col("r_id"))
                .select(F.col("vec_id"), F.col("r_id").alias("dup_of"),
                        self._cos(F.col("embedding"), F.col("r_v"))
                        .alias("cos_sim"),
                        F.lit("batch").alias("dup_src"))
                .dropDuplicates(["vec_id", "dup_of"])
                .filter(F.col("cos_sim") >= threshold)
            )
            out = cross_pairs.unionByName(within)
            return out.localCheckpoint(eager=True)
        finally:
            if own:
                new.unpersist()
            try:
                cand.unpersist()
            except NameError:
                pass

    def vacuum_stale_buckets(self, spark: SparkSession) -> dict[str, Any]:
        """Tombstone bucket rows orphaned by vector revisions (their seq is
        below the vector's CURRENT seq). Stale rows are harmless until then
        — a stale candidate is verified against the CURRENT vector from the
        seq-guarded vectors table, so it can only re-confirm or fail the
        exact-cosine check (the MinHashIndex stale-band argument verbatim).
        One join of the two narrow tables + one merge; maintenance, off the
        ingest path."""
        buckets = self.buckets_table.read(spark, seq_col="seq")
        cur = self.vectors_table.read(spark, seq_col="seq").select(
            "vec_id", F.col("seq").alias("_cur_seq"))
        stale = (
            buckets.join(cur, "vec_id")
            .filter(F.col("seq") < F.col("_cur_seq"))
            .select("bucket", "vec_id",
                    F.col("_cur_seq").alias("seq"),
                    F.lit(True).alias("_deleted"))
        )
        m = self.buckets_table.merge(spark, stale, seq_col="seq",
                                     tie_col="vec_id")
        self.buckets_table.vacuum_tombstones(spark)
        return {"stale_tombstoned": m.get("rows_deleted", 0)
                + m.get("rows_tombstoned", 0)}

    # ----------------------------------------------------------------- add
    def add(self, spark: SparkSession, df: DataFrame,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seq_col: str | None = None, stream_id: str | None = None,
            batch_id: int | None = None,
            vec_frame: DataFrame | None = None) -> dict[str, Any]:
        """Merge the batch's bucket rows and vectors into the index —
        idempotent per (stream_id, batch_id), seq-guarded per vector."""
        vf = (self._vec_frame(df, id_col, vec_col, seq_col)
              if vec_frame is None else vec_frame).persist()
        try:
            bm = self.buckets_table.merge(
                spark, vf.select("bucket", "vec_id", "seq"),
                seq_col="seq", tie_col="vec_id",
                stream_id=stream_id, batch_id=batch_id,
            )
            vm = self.vectors_table.merge(
                spark, vf.select("vec_id", "embedding", "seq"),
                seq_col="seq", tie_col="vec_id",
                stream_id=stream_id, batch_id=batch_id,
            )
        finally:
            vf.unpersist()
        return {"buckets": bm, "vectors": vm}
