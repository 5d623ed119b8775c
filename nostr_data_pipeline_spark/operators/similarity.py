"""Similarity search over embedding columns (array<float>).

Three tiers, all deterministic:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. One
  scan, JVM-side dot products (zip_with/aggregate), TakeOrderedAndProject.
- ``ann_lsh_topk``: random-hyperplane LSH. At 100 TB the bucket column is
  precomputed & partitioned-by, so a query touches one bucket (plus optional
  1-bit-flip neighbor buckets for recall) instead of the full table.
- ``ann_ivf_topk``: IVF — k-means-style centroids trained driver-side on a
  deterministic sample (tiny), cell assignment via a vectorized pandas UDF
  (one matmul per Arrow batch), query probes the ``n_probe`` nearest cells.

The scale story: brute-force cost is O(N); LSH/IVF reduce the scanned
fraction to ~1/n_buckets or n_probe/n_cells while recall stays high for
clustered data. Exactness is verified in tests against brute-force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from nostr_data_pipeline_spark.operators.dedup import _dot, _hyperplanes


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _cos(v, q) -> F.Column:
    return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))


def _query_lit(query_vec: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k. (id, cos_sim) desc."""
    v = _as_double(F.col(vec_col))
    return (
        df.select(F.col(id_col).alias("id"),
                  F.round(_cos(v, _query_lit(query_vec)), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def ann_lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 8, probe_flips: int = 1, seed: int = 42) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket plus all buckets
    within ``probe_flips`` sign-bit flips (recall knob)."""
    from itertools import combinations

    dim = len(query_vec)
    planes = np.array(_hyperplanes(dim, n_planes, seed))
    qsig = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0))
    # probe = every bucket within probe_flips sign-bit flips (general — no
    # silent cap: flips=k really searches all C(n_planes, <=k) buckets)
    probe = {
        qsig ^ sum(1 << i for i in bits)
        for k in range(min(probe_flips, n_planes) + 1)
        for bits in combinations(range(n_planes), k)
    }

    from nostr_data_pipeline_spark.operators.dedup import embedding_lsh_bucket

    v = _as_double(F.col(vec_col))
    bucketed = df.select(
        F.col(id_col).alias("id"), v.alias("_v"),
        embedding_lsh_bucket(v, dim, n_planes, seed).alias("_bkt"),
    )
    return (
        bucketed.filter(F.col("_bkt").isin(*sorted(probe)))
        .select("id", F.round(_cos(F.col("_v"), _query_lit(query_vec)), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def train_ivf_centroids(df: DataFrame, vec_col: str = "embedding",
                        n_cells: int = 16, sample: int = 2048, seed: int = 42,
                        iters: int = 10, id_col: str = "vec_id",
                        init: str = "spread") -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the IVF codebook
    is tiny and global — training it centrally is the standard design).

    The sample is ``orderBy(id_col).limit(sample)``: a bare ``limit`` is
    partition-layout-dependent (repartitioning the same data would yield
    different centroids); ordering by the id makes the codebook a pure
    function of the data. At scale the sort is a top-k
    (TakeOrderedAndProject over a 2-column projection), not a full sort.

    ``init='spread'`` (default) seeds cell *i* with the sample row at rank
    ``(i*n)//n_cells`` — RNG-free, so the whole codebook (init + Lloyd
    iterations) is replicable in plain SQL; this is what lets the
    ``ann_ivf_topk`` contract query carry a full DuckDB oracle. Ids are
    uncorrelated with cluster structure, so rank-spread seeding behaves
    like a fixed random draw. ``init='random'`` keeps the seeded-RNG draw
    for users who want k-means-style random restarts (``seed`` is only
    used there)."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample)
        .toPandas()[vec_col].tolist()
    )
    X = np.asarray(rows, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_cells, len(X))
    if init == "spread":
        C = X[[(i * len(X)) // k for i in range(k)]].copy()
    elif init == "random":
        rng = np.random.default_rng(seed)
        C = X[rng.choice(len(X), size=k, replace=False)]
    else:
        raise ValueError(f"unknown init {init!r} (want 'spread' or 'random')")
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized rows
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ann_ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_cells: int = 16, n_probe: int = 4, seed: int = 42,
                 init: str = "spread") -> DataFrame:
    """IVF: assign each vector to its nearest centroid cell (vectorized pandas
    UDF — one matmul per Arrow batch), probe the n_probe cells nearest to the
    query, exact cosine within."""
    C = train_ivf_centroids(df, vec_col, n_cells=n_cells, seed=seed,
                            id_col=id_col, init=init)

    @pandas_udf(IntegerType())
    def assign_cell(vs: pd.Series) -> pd.Series:  # pragma: no cover (executors)
        M = np.asarray(vs.tolist(), dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype("int32"))

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    # stable sort: query-dot ties (possible when duplicate vectors seed two
    # identical centroids) break to the LOWEST cell, matching the DuckDB
    # oracle's ORDER BY dot DESC, cell — plain argsort (quicksort) would
    # order ties arbitrarily and could silently swap the probe cutoff
    probe = np.argsort(-(C @ qn), kind="stable")[:n_probe].tolist()

    v = _as_double(F.col(vec_col))
    assigned = df.select(
        F.col(id_col).alias("id"), v.alias("_v"), assign_cell(F.col(vec_col)).alias("_cell")
    )
    return (
        assigned.filter(F.col("_cell").isin(*[int(p) for p in probe]))
        .select("id", F.round(_cos(F.col("_v"), _query_lit(query_vec.tolist() if hasattr(query_vec, "tolist") else list(query_vec))), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )
