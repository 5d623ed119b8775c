"""Deduplication operators for training-data pipelines.

All hot-path computation is JVM-side (higher-order array functions +
xxhash64, whole-stage codegen); no Python UDFs. Designed for the 100 TB
regime:

- exact dedup: shuffle only a 32-byte digest, not the payload;
- MinHash+LSH: candidate generation is an equi-join on (band_idx, band_hash)
  — Catalyst plans a shuffle hash join on a compact key; verification runs
  only on candidate pairs (a tiny fraction of the cross product);
- SimHash: 64-bit fingerprint as 4x16-bit chunks; candidates must share one
  exact chunk (pigeonhole: hamming<=3 over 64 bits guarantees a matching
  16-bit chunk), verified by bit_count(xor);
- embedding near-dup: random-hyperplane LSH buckets, exact cosine verify
  within buckets only.

ANSI note (Spark 4 default): all hashing avoids arithmetic that could
overflow — seeds are mixed via multi-argument xxhash64, never a*x+b.
"""

from __future__ import annotations

import warnings

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Dedup intermediates (shingle/fingerprint/bucket tables) feed 2-3 consumers
# each and are cached MEMORY_ONLY: evictable under pressure (recomputed, not
# spilled — a disk-persisted block would outlive the query and leak for the
# session), and these lazy plan-builders cannot unpersist for the caller.
_CACHE_LEVEL = StorageLevel.MEMORY_ONLY

# every intermediate these builders persist is registered here so long-lived
# sessions can release them once the returned pairs have been consumed —
# narrower than spark.catalog.clearCache(), which would also evict the
# caller's own cached frames
_LIVE_CACHES: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist(_CACHE_LEVEL)
    _LIVE_CACHES.append(df)
    return df


def release_dedup_caches() -> int:
    """Unpersist every intermediate the dedup builders cached so far (call
    after materializing the returned pairs). Returns the count released.
    Safe to call at any time: a released cache only costs recomputation if
    its plan is re-executed, and an entry whose SparkSession has since been
    stopped is dropped silently (unpersist on a dead session raises from
    the JVM bridge; the block died with the session anyway). The registry
    is always fully drained here, so it cannot grow across sessions — but
    it does hold strong DataFrame references until called, so long-lived
    multi-query sessions should call this between dedup workloads."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # stopped session / already-freed JVM handle: nothing live
    return n


# ---------------------------------------------------------------------------
# shingling / MinHash
# ---------------------------------------------------------------------------

def tokenize(text_col) -> F.Column:
    return F.split(F.trim(text_col), r"\s+")


def shingles_of_tokens(toks, n: int = 3) -> F.Column:
    """Distinct n-gram shingles from a pre-tokenized array column. Callers
    should materialize the token array in a prior select: higher-order
    lambdas re-evaluate any embedded subtree per element, so putting
    ``split()`` inside would tokenize once per shingle instead of once per
    row (O(tokens^2) regex work)."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingles(text_col, n: int = 3) -> F.Column:
    """Distinct n-gram (word) shingles as an array<string> column. The
    token array is bound once as a lambda variable (array-wrap trick) so the
    split runs once per row even inside the per-shingle transform."""
    return F.transform(
        F.array(tokenize(text_col)), lambda toks: shingles_of_tokens(toks, n)
    )[0]


def hash64(col, seed: int | None = None, hash_fn: str = "xxhash64") -> F.Column:
    """64-bit hash column, in one of two modes:

    - ``'xxhash64'`` (default, the production path): Spark's JVM-intrinsic
      xxHash64 over raw bytes — fastest, but NOT reproducible in DuckDB, so
      pipelines built on it verify via independent Python replicas
      (tests/test_dedup_fixtures.py) instead of the SQL oracle gate.
    - ``'md5'`` (the ORACLE-PORTABLE mode): a 60-bit slice of the md5 hex
      digest, chars 2-16 parsed base-16. DuckDB computes the IDENTICAL
      value — ``cast(concat('0x', substr(md5(x), 2, 15)) as
      ubigint)::bigint`` — which is what lets the MinHash-LSH and SimHash
      contract queries run under the full DuckDB value-hash gate. Both
      sides stay in whole-stage codegen; md5's digest+hex+conv chain costs
      ~2-3x xxhash64 per call, a minority cost next to the pipelines'
      shuffles. 60 bits (not 64) keeps the value strictly inside int64 so
      neither engine's ANSI cast can overflow.

    Seeded md5 form prepends ``'{seed}:'`` to the input, mirroring
    xxhash64's leading seed argument.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col) if seed is None else F.xxhash64(F.lit(seed), col)
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 2, 15), 16, 10).cast("long")


# largest seed count the md5 double-hash derivation can serve without
# leaving int64: max value = (2^60 - 1) + (k-1)*(2^56 - 1) must stay
# <= 2^63 - 1, i.e. k - 1 <= (2^63 - 2^60) / (2^56 - 1) -> k <= 112.
# Above it, Spark 4's ANSI mode would raise ARITHMETIC_OVERFLOW
# data-dependently (only on shingles whose digest slices are large) and
# DuckDB's ubigint cast would diverge — fail fast at plan time instead.
_MD5_MAX_SEEDS = 112


def _check_md5_seed_bound(hash_fn: str, num_hashes: int) -> None:
    if hash_fn == "md5" and num_hashes > _MD5_MAX_SEEDS:
        raise ValueError(
            f"hash_fn='md5' supports at most {_MD5_MAX_SEEDS} hashes (the "
            f"b1 + i*b2 double-hash derivation leaves int64 beyond that, "
            f"an ANSI overflow); got num_hashes={num_hashes}. Use "
            f"hash_fn='xxhash64' for wider signatures."
        )


def _band_hash(band: int, cols: list, hash_fn: str) -> F.Column:
    """Hash of one LSH band's signature slice. md5 mode feeds the digest a
    canonical string — 'B{band}:' + comma-joined decimal values — which the
    oracle SQL reproduces verbatim."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(band), *cols)
    return hash64(
        F.concat(F.lit(f"B{band}:"),
                 F.concat_ws(",", *[c.cast("string") for c in cols])),
        hash_fn="md5",
    )


def minhash_signature(shingle_col, num_hashes: int = 32) -> F.Column:
    """array<long> of num_hashes min-hashes; seed mixed via xxhash64(seed, s).

    PERFORMANCE TRAP — kept only as the single-column expression form for
    small inline use: the k-way array_min(transform(...)) tree is too large
    for whole-stage codegen and falls back to interpreted eval, measured
    ~10x slower than the explode + k primitive min-aggregates pipeline
    minhash_near_duplicates actually uses. Prefer that path for any real
    corpus. (Seeds must be bound via a closure factory — a `h=h` default
    param would flip pyspark's lambda into the (element, index) form.)"""

    def _minhash(h: int) -> F.Column:
        return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(F.lit(h), s)))

    return F.array(*[_minhash(h) for h in range(num_hashes)])


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id1, id2, jaccard) pairs with estimated-then-verified Jaccard >=
    threshold. LSH: split the signature into `bands` bands of
    num_hashes/bands rows; a pair is a candidate iff some band hashes equal.

    ``hash_fn='md5'`` switches every hash to the oracle-portable 60-bit md5
    slice (see hash64) so the whole pipeline is reproducible in DuckDB SQL
    — the contract query runs in this mode under the full value-hash gate.
    Different hash -> different LSH candidate sets, but every emitted pair
    is verified against the EXACT shingle Jaccard either way, so both modes
    return true >=threshold pairs; only the approximate recall differs."""
    if bands <= 0 or num_hashes % bands != 0:
        # bands > num_hashes would make every band hash a CONSTANT (zero
        # rows per band) — every pair collides and the join degenerates to
        # the full cross product; a non-dividing bands silently discards
        # trailing hashes. Fail fast instead.
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} evenly"
        )
    _check_md5_seed_bound(hash_fn, num_hashes)
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("_toks")
    ).select("_id", shingles_of_tokens(F.col("_toks"), shingle_n).alias("_sh"))
    # The shingle table feeds THREE consumers (signature explode + both
    # verify-join sides); without materialization each re-tokenizes the
    # corpus — measured 3x the operator's wall at sf0.1. See _CACHE_LEVEL
    # note; at cluster scale persist to a temp table instead.
    base = _persist(base)
    # Signature via explode + k primitive min-aggregates: every buffer is a
    # long, so this stays a whole-stage-codegen HashAggregate with map-side
    # combine. (The one-liner array_min(transform(...)) x k alternative in
    # minhash_signature() builds an expression tree too large for codegen and
    # falls back to interpreted eval — measured ~10x slower.)
    exploded = base.select("_id", F.explode("_sh").alias("_s"))
    if hash_fn == "md5":
        # ONE md5 per shingle, k seeds by double hashing (Kirsch-
        # Mitzenmacher): g_i = b1 + i*b2 with b1 = 60-bit digest slice
        # (chars 2-16) and b2 = 56-bit slice (chars 17-30). Max value
        # (2^60-1) + 31*(2^56-1) < 2^62 — exact int64 arithmetic in BOTH
        # engines, no overflow under ANSI mode. 32 independent md5 calls
        # per shingle measured 2x the whole operator's wall at sf0.1; this
        # derivation is hash-cost-parity with the xxhash64 path.
        digest = F.md5(F.col("_s"))
        b1 = F.conv(F.substring(digest, 2, 15), 16, 10).cast("long")
        b2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long")
        hashed = exploded.select(
            "_id", *[(b1 + F.lit(h) * b2).alias(f"_h{h}")
                     for h in range(num_hashes)]
        )
    else:
        hashed = exploded.select(
            "_id", *[hash64(F.col("_s"), seed=h, hash_fn=hash_fn).alias(f"_h{h}")
                     for h in range(num_hashes)]
        )
    sig = hashed.groupBy("_id").agg(
        *[F.min(f"_h{h}").alias(f"_h{h}") for h in range(num_hashes)]
    )
    # Band rows stay NARROW (id, band, bandhash): the shingle arrays would
    # otherwise be replicated `bands` times through the explode and shipped
    # through the self-join shuffle. Shingles rejoin only for the (far
    # smaller) deduped candidate set.
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(*[
                _band_hash(b, [F.col(f"_h{b * rows + i}") for i in range(rows)],
                           hash_fn)
                for b in range(bands)
            ])
        ).alias("_band", "_bhash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bhash") == F.col("r._bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id1"), F.col("r._id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    verif = (
        cand.join(base.select(F.col("_id").alias("id1"), F.col("_sh").alias("sh1")), "id1")
        .join(base.select(F.col("_id").alias("id2"), F.col("_sh").alias("sh2")), "id2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size(F.array_union("sh1", "sh2")).cast("double")
    return (
        verif.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
        .orderBy(F.col("jaccard").desc(), "id1", "id2")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.3, band_tokens: int = 2,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard over blocked candidate pairs. Blocking key = the
    first `band_tokens` tokens (cheap prefix blocking); exact verify after.

    SCALE CAVEAT: the prefix-token blocking key is SKEWED on natural text —
    many documents share their first two tokens ("the", boilerplate headers,
    license preambles), so one block can approach O(n^2) pairs at corpus
    scale. This operator is the exact-verify demo for small/medium inputs;
    ``minhash_near_duplicates`` (banded LSH on uniform hashes, same output
    shape id1/id2/jaccard with the same exact-shingle verification) is the
    100 TB path. ``max_rows`` guards the cliff: above it the call
    auto-falls back to MinHash-LSH. The guard count runs on the PERSISTED
    blocking table, so it doubles as the cache materialization the real
    job reuses — on the small inputs that stay on this path it adds no
    extra pass over the (possibly expensive) upstream plan. It does make
    the call eager; pass ``None`` to stay lazy and force prefix blocking
    regardless of size."""
    base = df.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("_toks")
    ).select(
        "_id",
        shingles_of_tokens(F.col("_toks"), shingle_n).alias("_sh"),
        F.concat_ws(" ", F.slice(F.col("_toks"), 1, band_tokens)).alias("_blk"),
    )
    base = _persist(base)  # both self-join sides read it; see _CACHE_LEVEL note
    if max_rows is not None and base.count() > max_rows:
        base.unpersist()
        if _LIVE_CACHES and _LIVE_CACHES[-1] is base:
            _LIVE_CACHES.pop()  # released here, not the caller's to release
        warnings.warn(
            f"ngram_jaccard_pairs: input exceeds max_rows={max_rows}; "
            "falling back to approximate MinHash-LSH blocking (same output "
            "shape, approximate candidate recall). Pass max_rows=None to "
            "force exact prefix blocking regardless of size.",
            RuntimeWarning, stacklevel=2,
        )
        return minhash_near_duplicates(
            df, id_col=id_col, text_col=text_col,
            threshold=threshold, shingle_n=shingle_n,
        )
    l, r = base.alias("l"), base.alias("r")
    cand = l.join(
        r, (F.col("l._blk") == F.col("r._blk")) & (F.col("l._id") < F.col("r._id"))
    )
    inter = F.size(F.array_intersect("l._sh", "r._sh")).cast("double")
    union = F.size(F.array_union("l._sh", "r._sh")).cast("double")
    return (
        cand.select(
            F.col("l._id").alias("id1"), F.col("r._id").alias("id2"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.col("jaccard").desc(), "id1", "id2")
    )


# ---------------------------------------------------------------------------
# duplicate clusters: connected components + canonical-document selection
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, id1_col: str = "id1", id2_col: str = "id2",
    max_iter: int = 50, mode: str = "minlabel",
) -> DataFrame:
    """Connected components over a duplicate-pair edge list. Returns
    ``(node, component)`` where ``component`` is the minimum node id of the
    component — deterministic, identical for both modes.

    ``mode='minlabel'`` (default): iterative min-label propagation — every
    node starts labeled with its own id; each round, a node adopts the
    minimum label among itself and its neighbors; converged when no label
    changes.

    ``mode='star'``: the alternating large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public): each round rewires every node's LARGER neighbors to
    its neighborhood minimum (large-star) then its smaller-or-equal
    neighbors likewise (small-star); the edge set converges to disjoint
    stars centered on the component minima in O(log^2 n) rounds regardless
    of diameter. Pick it for adversarial high-diameter graphs (chains,
    lattices) where min-label needs diameter rounds; its per-round cost is
    higher (two groupBy+join passes vs one), which is why dedup-shaped
    graphs (stars/cliques from near-dup clusters, diameter 2-3) default to
    min-label.

    Scale notes (100 TB corpus), both modes:

    - the iteration state is narrow — (node, label) for min-label, the
      (shrinking) edge list for star — over only the nodes that appear in
      some pair, a small fraction of the corpus; each round shuffles
      16-byte rows only;
    - lineage is cut every round with ``localCheckpoint`` (iterative plans
      otherwise grow unboundedly and re-execute from the source); the
      convergence check rides on the checkpoint's materialization.

    The loop is driver-coordinated but never moves data to the driver —
    each round's convergence scalar is the only thing collected.
    """
    if mode == "star":
        return _cc_star(pairs, id1_col, id2_col, max_iter)
    if mode != "minlabel":
        raise ValueError(f"unknown mode {mode!r} (minlabel | star)")
    e = pairs.select(F.col(id1_col).alias("a"), F.col(id2_col).alias("b"))
    edges = _persist(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .dropDuplicates(["a", "b"])
    )
    # symmetrized, so every endpoint occurs on the "a" side
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges["a"] == labels["node"]).select(
            edges["b"].alias("node"), F.col("label")
        )
        # lazy checkpoint: the convergence count below is the ONE job per
        # round — it materializes the checkpoint it reads through
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        warnings.warn(
            f"connected_components: not converged after max_iter={max_iter} "
            "rounds; labels are an upper bound on the true components "
            "(some components may still be split). Raise max_iter for "
            "higher-diameter graphs.",
            RuntimeWarning, stacklevel=2,
        )
    return labels.select("node", F.col("label").alias("component"))


def _cc_star(pairs: DataFrame, id1_col: str, id2_col: str,
             max_iter: int) -> DataFrame:
    """Alternating large-star/small-star (see connected_components). Edges
    are kept directed high->low (``hi`` > ``lo``); at convergence they form
    disjoint stars whose centers are the component minima."""
    raw = pairs.select(F.col(id1_col).alias("a"), F.col(id2_col).alias("b"))
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionByName(raw.select(F.col("b").alias("node")))
        .distinct().localCheckpoint()
    )
    edges = (
        raw.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
        .dropDuplicates(["hi", "lo"])
        .localCheckpoint()
    )

    def _large_star(e: DataFrame) -> DataFrame:
        # symmetric adjacency; per node u: m = min(neighborhood ∪ {u});
        # every LARGER neighbor v rewires to (v, m). v > u >= m, so output
        # stays high->low with no self loops.
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")) \
            .unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .dropDuplicates(["hi", "lo"])
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # per node u over its SMALLER neighbors N≤: m = min(N≤ ∪ {u});
        # every w in N≤ ∪ {u} except m itself links to m.
        mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
        relink = (
            e.join(mins, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        )
        self_link = mins.select(F.col("hi"), F.col("m").alias("lo"))
        return relink.unionByName(self_link).dropDuplicates(["hi", "lo"])

    converged = False
    malformed_fixed_point = False
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # converged when the round was a fixed point of the edge set; the
        # two counts are the round's only driver scalars (and materialize
        # the checkpoint they read through)
        if (new_edges.count() == edges.count()
                and new_edges.exceptAll(edges).count() == 0):
            edges = new_edges
            # Kiveris et al.'s termination argument is per-operation (each
            # star op individually at a fixed point), not per composed
            # round — a hypothetical period-2 oscillation (large-star
            # perturbs, small-star undoes) would look like a fixed point
            # here. Guard: the converged set must be disjoint stars — no
            # node both a spoke (hi) and a center (lo) — else warn with the
            # dedicated malformed-fixed-point message instead of extracting
            # wrong labels silently. One narrow semi-join probe, limit-1.
            spoke_center_overlap = (
                edges.select(F.col("hi").alias("n"))
                .join(edges.select(F.col("lo").alias("n")).distinct(),
                      "n", "left_semi")
                .limit(1).count()
            )
            converged = spoke_center_overlap == 0
            malformed_fixed_point = not converged
            break
        edges = new_edges
    if malformed_fixed_point:
        # distinct failure, distinct advice: raising max_iter cannot fix a
        # fixed point of the composition that is not a disjoint star set
        warnings.warn(
            "connected_components(mode='star'): the edge set reached a "
            "fixed point that is NOT a disjoint star set (some node is "
            "both a spoke and a center) — a composition-level oscillation "
            "the per-operation termination argument does not cover. Labels "
            "are an upper bound on the true components; raising max_iter "
            "will NOT help. Re-run with mode='minlabel' for these inputs.",
            RuntimeWarning, stacklevel=3,
        )
    elif not converged:
        warnings.warn(
            f"connected_components(mode='star'): not converged after "
            f"max_iter={max_iter} rounds; labels are an upper bound on the "
            "true components. O(log^2 n) rounds suffice — raise max_iter.",
            RuntimeWarning, stacklevel=3,
        )
    labels = edges.select(F.col("hi").alias("node"), F.col("lo").alias("label"))
    roots = edges.select(F.col("lo").alias("node")).distinct() \
        .withColumn("label", F.col("node"))
    # defensive: any input node absent from the converged star edges (e.g.
    # self-loop-only input) labels itself
    seen = labels.select("node").unionByName(roots.select("node"))
    singles = nodes.join(seen, "node", "left_anti") \
        .withColumn("label", F.col("node"))
    return (
        labels.unionByName(roots).unionByName(singles)
        # at convergence every node has exactly one row (stars are disjoint:
        # a hi node cannot also be a center), so the min-agg is a no-op; on
        # max_iter exhaustion a node CAN appear both as a hi (with some
        # label m) and as a center (labeling itself) — take the smaller,
        # DETERMINISTIC label rather than an arbitrary row, so the
        # non-converged upper bound is at least stable run-to-run
        .groupBy("node").agg(F.min("label").alias("component"))
        .select("node", "component")
    )


def canonical_docs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    id1_col: str = "id1", id2_col: str = "id2", max_iter: int = 50,
    mode: str = "minlabel",
) -> DataFrame:
    """Assign every document a duplicate-cluster id and elect one canonical
    document per cluster (the minimum id — deterministic). Documents in no
    pair are their own singleton component. Returns
    ``(id_col, component, is_canonical)``; filtering ``is_canonical`` is the
    keep-one-per-cluster dedup a training pipeline applies after any pair
    generator above (MinHash-LSH, SimHash, n-gram Jaccard, embedding).

    The component relation covers only paired nodes, so the join back to the
    corpus is a shuffle on the narrow id key; the full-width document payload
    is never part of the iteration.
    """
    comp = connected_components(
        pairs, id1_col=id1_col, id2_col=id2_col, max_iter=max_iter, mode=mode
    )
    d = df.select(F.col(id_col))
    return (
        d.join(comp, d[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .withColumn("is_canonical", F.col("component") == F.col(id_col))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_chunks(text_col, chunk_bits: int = 16, n_chunks: int = 4) -> list[F.Column]:
    """SimHash fingerprint as n_chunks x chunk_bits ints (64 bits total).
    bit_i = sign of sum over tokens of (+1 if bit_i(hash(token)) else -1)."""
    toks = F.array_distinct(tokenize(text_col))

    def _vote(i: int):
        # vote for bit i across tokens; shiftright+bitand are ANSI-safe
        # (pyspark lambda arity is inspected — no default params allowed)
        def merge(acc, t):
            bit = F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, 1).otherwise(-1)

        return F.aggregate(toks, F.lit(0), merge)

    cols = []
    for c in range(n_chunks):
        bits = []
        for b in range(chunk_bits):
            i = c * chunk_bits + b
            vote = _vote(i)
            bits.append(F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0)))
        col = bits[0]
        for x in bits[1:]:
            col = col + x
        cols.append(col.cast("int").alias(f"chunk{c}"))
    return cols


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str,
    chunk_bits: int = 16, n_chunks: int = 4, hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, chunk0..chunk{n-1}) via explode + chunk_bits*n_chunks primitive
    sum-aggregates — a whole-stage-codegen HashAggregate (one pass over
    tokens), unlike simhash_chunks' 64 aggregate() traversals per row (kept
    as the single-column expression form for inline use on small data).

    ``hash_fn='md5'`` uses the oracle-portable 60-bit token hash (see
    hash64); pair it with ``chunk_bits=15`` so the fingerprint covers
    exactly the 60 informative bits (16-bit chunks would carry 4 always-zero
    top bits — harmless for correctness, wasted for discrimination)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("_t"),
    ).withColumn("_h", hash64(F.col("_t"), hash_fn=hash_fn))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(chunk_bits * n_chunks)
    ]
    agg = toks.groupBy("_id").agg(*votes)
    chunk_cols = []
    for c in range(n_chunks):
        col = F.lit(0)
        for b in range(chunk_bits):
            i = c * chunk_bits + b
            col = col + F.when(F.col(f"_v{i}") > 0, F.lit(2 ** b)).otherwise(0)
        chunk_cols.append(col.cast("int").alias(f"chunk{c}"))
    return agg.select("_id", *chunk_cols)


def simhash_near_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, chunk_bits: int = 16, n_chunks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id1, id2, hamming) for pairs within max_hamming bits of the
    chunk_bits*n_chunks-bit fingerprint. Candidate iff one chunk matches
    exactly — the pigeonhole guarantee needs n_chunks > max_hamming.
    The OUTPUT is chunking-independent (every true pair shares >=1 chunk,
    and hamming is computed over the full fingerprint); chunk layout only
    shapes the candidate-join cost. ``hash_fn='md5'`` + ``chunk_bits=15``
    is the oracle-portable mode the contract query runs (see hash64)."""
    if n_chunks <= max_hamming:
        # with <= max_hamming chunks a pair can differ in every chunk and
        # still be within the bound — the pigeonhole blocking would MISS it
        raise ValueError(
            f"n_chunks={n_chunks} must exceed max_hamming={max_hamming}"
        )
    chunk_names = [f"chunk{c}" for c in range(n_chunks)]
    # the fingerprint aggregation (token explode + primitive sums) would
    # run once per self-join side; materialize it once (see _CACHE_LEVEL note)
    base = _persist(simhash_fingerprint(
        df, id_col, text_col, chunk_bits=chunk_bits, n_chunks=n_chunks,
        hash_fn=hash_fn,
    ))
    banded = base.select(
        "_id", *chunk_names,
        F.posexplode(F.array(*chunk_names)).alias("_band", "_bh"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    ham = sum(
        F.bit_count(
            F.col(f"l.chunk{c}").cast("long").bitwiseXOR(F.col(f"r.chunk{c}").cast("long"))
        )
        for c in range(n_chunks)
    )
    # hamming is computed and filtered BEFORE the pair dedup: the raw
    # candidate stream (every band collision; ~15x the surviving pairs on
    # collision-heavy data) stays inside the join's codegen stage, and only
    # matching narrow (id1, id2, hamming) rows hit the dedup shuffle.
    return (
        l.join(
            r,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bh") == F.col("r._bh"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id1"), F.col("r._id").alias("id2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
        .orderBy("hamming", "id1", "id2")
    )


# ---------------------------------------------------------------------------
# embedding near-dup (random hyperplane LSH + exact cosine verify)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def embedding_lsh_bucket(vec_col, dim: int, n_planes: int = 12, seed: int = 42) -> F.Column:
    """Sign-bit bucket id from n_planes random hyperplanes (deterministic)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec_col, plane) > 0, F.lit(2 ** i)).otherwise(F.lit(0)))
    col = bits[0]
    for x in bits[1:]:
        col = col + x
    return col.cast("int")


def embedding_near_duplicates(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, threshold: float = 0.8, n_planes: int = 8,
) -> DataFrame:
    """(id1, id2, cos_sim) pairs with cosine >= threshold; candidates blocked
    by hyperplane LSH bucket, verified exactly within buckets."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # dim mismatch nulls every hyperplane dot product (zip_with pads with
    # nulls) and collapses all rows into one bucket — the "blocked" join
    # silently becomes the full cross product. Fail fast per row instead.
    bkt = F.when(
        F.size(F.col(vec_col)) == dim, embedding_lsh_bucket(v, dim, n_planes)
    ).otherwise(
        F.raise_error(F.concat(
            F.lit(f"embedding length != dim={dim}: got "),
            F.size(F.col(vec_col)).cast("string"),
        ))
    )
    base = df.select(
        F.col(id_col).alias("_id"), v.alias("_v"), bkt.alias("_bkt"),
    )
    base = _persist(base)  # n_planes dot products/row, both join sides read it
    l, r = base.alias("l"), base.alias("r")
    cand = l.join(
        r, (F.col("l._bkt") == F.col("r._bkt")) & (F.col("l._id") < F.col("r._id"))
    )
    cos = _dot(F.col("l._v"), F.col("r._v")) / (
        F.sqrt(_dot(F.col("l._v"), F.col("l._v"))) * F.sqrt(_dot(F.col("r._v"), F.col("r._v")))
    )
    return (
        cand.select(
            F.col("l._id").alias("id1"), F.col("r._id").alias("id2"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy(F.col("cos_sim").desc(), "id1", "id2")
    )


# ---------------------------------------------------------------------------
# rows-only queries() entries (no SQL-expressible oracle; driver records a
# rows-only check)
# ---------------------------------------------------------------------------

def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from nostr_data_pipeline_spark.operators.analytics import load

    return load(spark, sf_dir, name)


def q_dedup_minhash_lsh(spark, sf_dir, hash_fn: str = "md5"):
    """Contract query: ORACLE-PORTABLE md5 mode (hash64) by default, so the
    full MinHash->LSH->verify pipeline is value-checked against the DuckDB
    replica SQL (analytics._minhash_md5_sql()). Production callers default to
    hash_fn='xxhash64' (faster; replica-verified in
    tests/test_dedup_fixtures.py instead) — bench.py times BOTH modes so the
    round-over-round perf signal tracks the production path too."""
    return minhash_near_duplicates(
        _load(spark, sf_dir, "documents"), threshold=0.3, hash_fn=hash_fn
    )


def q_dedup_simhash(spark, sf_dir, hash_fn: str = "md5"):
    """Contract query: oracle-portable md5 mode with the 60-bit / 4x15-bit
    fingerprint (analytics._simhash_md5_sql() is the DuckDB replica) by
    default. Output is chunking-independent; see simhash_near_duplicates.
    hash_fn='xxhash64' runs the production 64-bit fingerprint (bench.py
    times both modes)."""
    kw = {"chunk_bits": 15} if hash_fn == "md5" else {}
    return simhash_near_duplicates(
        _load(spark, sf_dir, "documents"), max_hamming=3,
        hash_fn=hash_fn, **kw,
    )


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_load(spark, sf_dir, "documents"), threshold=0.2)


def q_dedup_canonical(spark, sf_dir, mode: str = "minlabel"):
    """Pair generation (exact n-gram Jaccard) -> connected components ->
    canonical election, end-to-end on the documents table. Fully
    SQL-oracle-able: the DuckDB replica reuses the n-gram pair CTEs and
    computes components with a recursive min-label CTE. ``mode='star'``
    runs the same election through the large-star/small-star algorithm —
    the SAME oracle gates both (identical components by definition)."""
    docs = _load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    return canonical_docs(docs, pairs, mode=mode).orderBy("doc_id")


def q_dedup_incremental(spark, sf_dir, hash_fn: str = "md5"):
    """Dedup-at-ingest contract query: index the even-id half of the
    documents table in a throwaway MinHashIndex, then check the odd-id half
    against it (plus within-batch pairs). Runs the index's oracle-portable
    md5 hash mode (round 4), so the WHOLE stateful path — signature
    persistence through two MERGE-maintained SnapshotTables, bucket-pruned
    band probe, estimated-Jaccard verify — is value-checked against a pure
    DuckDB replica (analytics._dedup_incremental_sql()) that recomputes the
    same signatures from the raw documents. The xxhash64 production default
    stays replica-verified in tests/test_dedup_index.py."""
    import shutil
    import tempfile

    from nostr_data_pipeline_spark.operators.dedup_index import MinHashIndex

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="mhidx_")
    try:
        # 4 buckets: the contract corpus is small; fewer, fuller files per
        # merge keep the throwaway-index fixed cost (2 creates + 2 MERGE
        # commits) off the gate's critical path (the production sizing rule
        # lives on SnapshotTable.rebucket)
        idx = MinHashIndex.create(spark, tmp, num_buckets=4, hash_fn=hash_fn)
        idx.add(spark, base)
        # check() localCheckpoints eagerly, so the plan no longer reads the
        # temp index after return and the cleanup below is safe
        return idx.check(spark, new, threshold=0.35).orderBy("doc_id", "dup_of")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_dedup_embedding(spark, sf_dir):
    return embedding_near_duplicates(_load(spark, sf_dir, "embeddings"), threshold=0.5)


def q_dedup_incremental_embedding(spark, sf_dir):
    """Vector-space dedup-at-ingest contract query: index the even-id half
    of the embeddings table in a throwaway EmbeddingIndex, check the odd-id
    half (plus within-batch pairs) with exact-cosine verification. Fully
    oracled: the hyperplanes are deterministic literals and the multiprobe
    candidate rule is bit_count(xor(buckets)) <= probe_flips — both
    reproducible in DuckDB (analytics._emb_index_sql())."""
    import shutil
    import tempfile

    from nostr_data_pipeline_spark.operators.embedding_index import (
        EmbeddingIndex,
    )

    emb = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="embidx_")
    try:
        idx = EmbeddingIndex.create(spark, tmp, dim=64, n_planes=8,
                                    num_buckets=4)
        idx.add(spark, base)
        return idx.check(spark, new, threshold=0.4, probe_flips=1) \
            .orderBy("vec_id", "dup_of")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_ann_lsh_topk(spark, sf_dir):
    from nostr_data_pipeline_spark.operators.similarity import ann_lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").first()["embedding"]
    return ann_lsh_topk(emb, q, k=10, probe_flips=2)


def q_ann_ivf_topk(spark, sf_dir):
    from nostr_data_pipeline_spark.operators.similarity import ann_ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").first()["embedding"]
    return ann_ivf_topk(emb, q, k=10, n_cells=8, n_probe=4)


def q_multimodal_features(spark, sf_dir):
    from nostr_data_pipeline_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    # 64 demo rows: right-size partitions so we don't spin up one Python
    # worker per core for a 2-row task (real inputs get their partitioning
    # from the source).
    feats = extract_features(synthetic_media(spark, n=64).coalesce(8), dim=32)
    # Contract projection: the driver canonicalizes results with a pandas
    # sort/factorize, which cannot hash an array<float> column — so the
    # raw vector is digested to a deterministic sha256 here (4dp rounding
    # absorbs float32 representation noise). API users get the real array
    # from extract_features(); this adapter only shapes the contract row.
    digest_src = F.concat_ws(
        ",", F.transform("feature", lambda x: F.round(x.cast("double"), 4).cast("string"))
    )
    return feats.select(
        "media_id", "kind", "n_bytes", F.sha2(digest_src, 256).alias("feature_sha256")
    ).orderBy("media_id")


# ngram_jaccard and embedding_cosine graduated to full SQL oracles (their
# results are hash-function-free) — registered in analytics.QUERIES instead.
# ann_lsh_topk also graduated to a full SQL oracle (deterministic
# hyperplanes inline as literals; probe set = bit_count of bucket XOR).
# dedup_minhash_lsh and dedup_simhash graduated in round 4: their contract
# entries run hash64's oracle-portable md5 mode, reproducible in DuckDB SQL
# (analytics._minhash_md5_sql() / _simhash_md5_sql()) — registered there.
# ann_ivf_topk also graduated in round 4: spread init (rank (i*n)//k, no RNG)
# makes the whole codebook — init + Lloyd iterations — replicable in a
# recursive CTE (analytics._ann_ivf_sql()). The remaining rows-only entry is
# genuinely non-SQL: multimodal_features is a binary-column mapInPandas
# pipeline whose feature vector is digested via sha256 of Spark's
# double→string rendering (engine-specific float formatting, not portable
# SQL); it carries an exact expected-vector replica fixture in
# tests/test_multimodal.py instead.
ROWS_ONLY_QUERIES = {
    "multimodal_features": q_multimodal_features,
}
