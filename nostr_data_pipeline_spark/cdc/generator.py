"""Deterministic synthetic change-event log generator.

Models the reference's ingest input — an at-least-once, multi-source event
stream with duplicate event ids and out-of-order delivery (reference:
/root/reference/src/nostr_pipeline/pipeline.py:202-211 dedupes in-batch
duplicates; relay fan-in at extractors/relay_client.py:232-323) — re-shaped as
a CDC log of insert/update/delete/schema_change records over source-code
repository files keyed by ``(repo, path)``.

Properties injected on purpose (all seed-driven, no external data):
- Zipf-hot repos (skew for the salted-LWW path),
- duplicate event_ids (multi-source redelivery),
- bounded out-of-order delivery (watermark tests),
- deletes (tombstone semantics),
- schema_change events (column-add and type-widen).

Log schema (parquet, one directory of ``n_files`` part files so a file-stream
source can tail it):

    event_id string, seq long, op string, repo string, path string,
    ts timestamp, commit string, lang string, content string,
    extra_json string, sc_col_name string, sc_col_type string

``extra_json`` carries values for schema-evolved columns (CDC payloads are
semi-structured); ``sc_*`` are only set on op='schema_change' rows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LANGS = ["py", "rs", "go", "md", "js"]
BASE_TS = pd.Timestamp("2024-01-01 00:00:00")


@dataclass(frozen=True)
class LogSpec:
    n_events: int = 10_000
    n_repos: int = 50
    paths_per_repo: int = 40
    zipf_a: float = 1.3          # hot-repo skew exponent
    dup_rate: float = 0.08       # fraction of events redelivered verbatim
    delete_rate: float = 0.10
    disorder: int = 200          # delivery-order jitter window (in seqs)
    n_files: int = 8
    seed: int = 42
    content_pad: int = 120       # max filler length appended to content
    # (position_fraction, col_name, col_type); 'int'->'long' on same name = widen
    schema_changes: tuple = (
        (0.40, "size_bytes", "int"),
        (0.55, "stars", "long"),
        (0.70, "size_bytes", "long"),
    )


def _hex40(rng: np.random.Generator, n: int) -> np.ndarray:
    """n random 40-hex strings, vectorized (np.char.mod formats in C)."""
    a = rng.integers(0, np.iinfo(np.int64).max, size=(n, 3), dtype=np.int64)
    h0 = np.char.zfill(np.char.mod("%x", a[:, 0]), 16)
    h1 = np.char.zfill(np.char.mod("%x", a[:, 1]), 16)
    h2 = np.char.zfill(np.char.mod("%x", a[:, 2] & 0xFFFFFFFF), 8)
    return np.char.add(np.char.add(h0, h1), h2).astype(object)


def make_log_frame(spec: LogSpec) -> pd.DataFrame:
    """Build the full log as one DataFrame in DELIVERY order (not seq order)."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- keys: Zipf repos, uniform path within repo -------------------------
    ranks = np.arange(1, spec.n_repos + 1, dtype=np.float64)
    p = ranks ** (-spec.zipf_a)
    p /= p.sum()
    repo_idx = rng.choice(spec.n_repos, size=n, p=p)
    path_idx = rng.integers(0, spec.paths_per_repo, size=n)
    lang_idx = path_idx % len(LANGS)

    seq = np.arange(n, dtype=np.int64)
    op = np.where(rng.random(n) < spec.delete_rate, "delete", "upsert").astype(object)
    # first-ever touch of a key is semantically an insert; we tag later via oracle —
    # insert vs update are the same MERGE semantics (reference merges by PK,
    # loaders/event_loader.py:89-112), so the log just distinguishes upsert/delete.
    commits = _hex40(rng, n)

    # vectorized string synthesis (np.char.* formats/concats in C — keeps
    # 20M+-event benchmark logs generable in seconds)
    repo_lut = np.array([f"repo-{i:04d}" for i in range(spec.n_repos)], dtype=object)
    path_lut = np.array(
        [f"src/dir{j // 10}/file{j:03d}.{LANGS[j % len(LANGS)]}"
         for j in range(spec.paths_per_repo)], dtype=object
    )
    lang_lut = np.array(LANGS, dtype=object)
    df = pd.DataFrame(
        {
            "seq": seq,
            "op": op,
            "repo": repo_lut[repo_idx],
            "path": path_lut[path_idx],
            "lang": lang_lut[lang_idx],
            "commit": commits,
        }
    )
    seq_hex = np.char.zfill(np.char.mod("%x", seq), 12).astype(object)
    commit8 = np.char.mod("%.8s", commits.astype(str)).astype(object)
    df["event_id"] = seq_hex + "-" + commit8
    df["ts"] = BASE_TS + pd.to_timedelta(seq, unit="s")

    pad = (seq % max(spec.content_pad, 1)).astype(np.int64)
    seq_str = np.char.mod("%d", seq).astype(object)
    commit12 = np.char.mod("%.12s", commits.astype(str)).astype(object)
    body = "def fn_" + seq_str + "():\n    return '" + commit12 + "'\n"
    # filler length k -> lookup table of '#'*k (tiny) indexed vectorized
    hash_lut = np.array(["#" * k for k in range(max(spec.content_pad, 1))], dtype=object)
    filler = hash_lut[pad]
    df["content"] = (
        "// " + df["repo"].to_numpy(object) + "/" + df["path"].to_numpy(object)
        + "\n" + body + filler
    )
    df.loc[df["op"] == "delete", "content"] = None

    # --- schema evolution: inject schema_change rows and extra_json ---------
    df["extra_json"] = None
    df["sc_col_name"] = None
    df["sc_col_type"] = None
    sc_rows = []
    add_positions: list[tuple[int, str, str]] = []
    for frac, col, typ in spec.schema_changes:
        at = int(frac * n)
        add_positions.append((at, col, typ))
        sc_rows.append(
            {
                "seq": int(at),  # shares a seq with a data event; event_id breaks ties
                "op": "schema_change",
                "repo": "_schema",
                "path": "",
                "lang": None,
                "commit": None,
                "event_id": f"sc-{at:012x}-{col}-{typ}",
                "ts": BASE_TS + pd.to_timedelta(int(at), unit="s"),
                "content": None,
                "extra_json": None,
                "sc_col_name": col,
                "sc_col_type": typ,
            }
        )
    # populate extra_json for data events after each column's first add
    first_add: dict[str, int] = {}
    for at, col, _typ in sorted(add_positions):
        first_add.setdefault(col, at)
    size_vals = rng.integers(1, 1_000_000, size=n)
    star_vals = rng.integers(0, 50_000, size=n)
    sb_at = first_add.get("size_bytes", n + 1)
    st_at = first_add.get("stars", n + 1)
    not_del = op != "delete"
    has_sb = (seq > sb_at) & not_del
    has_st = (seq > st_at) & not_del
    sb_part = np.where(has_sb, '"size_bytes": ' + np.char.mod("%d", size_vals).astype(object), "")
    st_part = np.where(has_st, '"stars": ' + np.char.mod("%d", star_vals).astype(object), "")
    joiner = np.where(has_sb & has_st, ", ", "")
    inner = sb_part.astype(object) + joiner.astype(object) + st_part.astype(object)
    extra = np.where(has_sb | has_st, "{" + inner + "}", None)
    df["extra_json"] = extra

    df = pd.concat([df, pd.DataFrame(sc_rows)], ignore_index=True)

    # --- duplicates: verbatim redelivery of a sample ------------------------
    n_dup = int(spec.dup_rate * n)
    if n_dup:
        dup = df.iloc[rng.integers(0, n, size=n_dup)].copy()
        df = pd.concat([df, dup], ignore_index=True)

    # --- bounded out-of-order delivery --------------------------------------
    jitter = rng.uniform(-spec.disorder, spec.disorder, size=len(df))
    order = np.argsort(df["seq"].to_numpy(np.float64) + jitter, kind="stable")
    df = df.iloc[order].reset_index(drop=True)

    cols = [
        "event_id", "seq", "op", "repo", "path", "ts", "commit", "lang",
        "content", "extra_json", "sc_col_name", "sc_col_type",
    ]
    return df[cols]


def write_log_spark(spark, out_dir: str, spec: LogSpec = LogSpec()) -> None:
    """Spark-native log generator for LARGE benchmark inputs (fully parallel;
    20M+ rows in seconds). Same schema and qualitative properties as the
    pandas generator (Zipf-ish hot repos via power-law inverse CDF, verbatim
    duplicates, bounded disorder, deletes, schema_change rows) but NOT
    row-identical to it — correctness tests use the pandas path + oracle;
    this one feeds throughput/scaling benches only."""
    from pyspark.sql import functions as F

    n = spec.n_events
    base_epoch = int(BASE_TS.timestamp())
    df = spark.range(0, n, 1, max(32, spec.n_files))
    u = F.rand(spec.seed)
    repo_idx = F.least(
        F.lit(spec.n_repos - 1),
        F.floor(F.lit(spec.n_repos) * F.pow(u, F.lit(2.5))).cast("int"),
    )
    path_idx = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(spec.paths_per_repo)).cast("int")
    langs = F.array(*[F.lit(x) for x in LANGS])
    h = lambda k: F.lower(F.lpad(F.hex(F.xxhash64("id", F.lit(k))), 16, "0"))  # noqa: E731
    commit = F.concat(h(2), h(3), F.substring(h(4), 1, 8))
    df = df.select(
        F.col("id").alias("seq"),
        F.when(F.rand(spec.seed + 1) < spec.delete_rate, "delete")
        .otherwise("upsert").alias("op"),
        F.format_string("repo-%04d", repo_idx).alias("repo"),
        F.format_string("src/dir%d/file%03d.", (path_idx / 10).cast("int"), path_idx)
        .alias("_p"),
        path_idx.alias("_pi"),
        commit.alias("commit"),
        F.timestamp_seconds(F.lit(base_epoch) + F.col("id")).alias("ts"),
    )
    lang = F.element_at(langs, F.pmod(F.col("_pi"), F.lit(len(LANGS))).cast("int") + 1)
    df = df.withColumn("lang", lang).withColumn(
        "path", F.concat(F.col("_p"), F.col("lang"))
    ).drop("_p", "_pi")
    pad = F.pmod(F.col("seq"), F.lit(max(spec.content_pad, 1))).cast("int")
    content = F.concat(
        F.lit("// "), F.col("repo"), F.lit("/"), F.col("path"), F.lit("\ndef fn_"),
        F.col("seq").cast("string"), F.lit("():\n    return '"),
        F.substring(F.col("commit"), 1, 12), F.lit("'\n"), F.repeat(F.lit("#"), pad),
    )
    df = df.withColumn("content", F.when(F.col("op") != "delete", content))
    # derive payload thresholds from the spec like the pandas path does
    # (first_add per column), and gate each field INDEPENDENTLY on its own
    # add position (the pandas path's sb_part/st_part logic) — a chained
    # when() keyed on one ordering would fabricate size_bytes payloads for
    # specs that never add that column, or wrongly order custom specs. The
    # Spark generator's payload builder knows the two default columns;
    # other names get schema_change rows but no payload values (same as
    # pandas).
    first_add: dict[str, int] = {}
    for frac, col, _typ in spec.schema_changes:
        first_add.setdefault(col, int(frac * n))
    sb_at = first_add.get("size_bytes", n + 1)
    st_at = first_add.get("stars", n + 1)
    not_del = F.col("op") != "delete"
    sb_frag = F.when(
        not_del & (F.col("seq") > F.lit(sb_at)),
        F.format_string('"size_bytes": %d',
                        F.pmod(F.xxhash64("seq", F.lit(5)), F.lit(1_000_000))),
    )
    st_frag = F.when(
        not_del & (F.col("seq") > F.lit(st_at)),
        F.format_string('"stars": %d',
                        F.pmod(F.xxhash64("seq", F.lit(6)), F.lit(50_000))),
    )
    parts = F.array_compact(F.array(sb_frag, st_frag))
    extra = F.when(
        F.size(parts) > 0,
        F.concat(F.lit("{"), F.concat_ws(", ", parts), F.lit("}")),
    )
    df = df.withColumn("extra_json", extra)
    df = df.withColumn("event_id",
                       F.concat(F.lpad(F.lower(F.hex("seq")), 12, "0"), F.lit("-"),
                                F.substring("commit", 1, 8)))
    df = df.withColumn("sc_col_name", F.lit(None).cast("string")).withColumn(
        "sc_col_type", F.lit(None).cast("string")
    )
    cols = ["event_id", "seq", "op", "repo", "path", "ts", "commit", "lang",
            "content", "extra_json", "sc_col_name", "sc_col_type"]
    df = df.select(*cols)

    dups = df.sample(fraction=spec.dup_rate, seed=spec.seed + 7)
    sc_rows = []
    for frac, col, typ in spec.schema_changes:
        at = int(frac * n)
        sc_rows.append((f"sc-{at:012x}-{col}-{typ}", at, "schema_change", "_schema",
                        "", (BASE_TS + pd.to_timedelta(at, unit="s")).to_pydatetime(),
                        None, None, None, None, col, typ))
    sc_schema = (
        "event_id string, seq long, op string, repo string, path string, "
        "ts timestamp, commit string, lang string, content string, "
        "extra_json string, sc_col_name string, sc_col_type string"
    )
    sc_df = spark.createDataFrame(sc_rows, sc_schema) if sc_rows else None
    full = df.unionByName(dups)
    if sc_df is not None:
        full = full.unionByName(sc_df)
    jitter = (F.rand(spec.seed + 9) - 0.5) * (2.0 * spec.disorder)
    full = full.withColumn("_order", F.col("seq") + jitter)
    (
        full.repartitionByRange(spec.n_files, "_order")
        .sortWithinPartitions("_order")
        .drop("_order")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def write_log(out_dir: str, spec: LogSpec = LogSpec()) -> list[str]:
    """Write the log as n_files parquet part files (delivery order preserved
    across files: file k holds delivery slice k). Returns file paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = make_log_frame(spec)
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("event_id", pa.string()),
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("ts", pa.timestamp("us")),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
            ("extra_json", pa.string()),
            ("sc_col_name", pa.string()),
            ("sc_col_type", pa.string()),
        ]
    )
    paths = []
    bounds = np.linspace(0, len(df), spec.n_files + 1, dtype=int)
    for k in range(spec.n_files):
        part = df.iloc[bounds[k]:bounds[k + 1]]
        path = os.path.join(out_dir, f"log-{k:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, schema=schema, preserve_index=False), path)
        paths.append(path)
    return paths
