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
    a = rng.integers(0, np.iinfo(np.int64).max, size=(n, 3), dtype=np.int64)
    return np.array(
        [f"{r[0]:016x}{r[1]:016x}{r[2] & 0xFFFFFFFF:08x}" for r in a], dtype=object
    )


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

    df = pd.DataFrame(
        {
            "seq": seq,
            "op": op,
            "repo": pd.Series(repo_idx).map(lambda i: f"repo-{i:04d}").to_numpy(object),
            "path": pd.Series(path_idx).map(
                lambda j: f"src/dir{j // 10}/file{j:03d}.{LANGS[j % len(LANGS)]}"
            ).to_numpy(object),
            "lang": pd.Series(lang_idx).map(lambda i: LANGS[i]).to_numpy(object),
            "commit": commits,
        }
    )
    df["event_id"] = [f"{s:012x}-{c[:8]}" for s, c in zip(seq, commits)]
    df["ts"] = BASE_TS + pd.to_timedelta(seq, unit="s")

    pad = (seq % max(spec.content_pad, 1)).astype(np.int64)
    body = pd.Series(
        [f"def fn_{s}():\n    return '{c[:12]}'\n" for s, c in zip(seq, commits)],
        dtype=object,
    )
    filler = pd.Series(["#" * int(k) for k in pad], dtype=object)
    df["content"] = ("// " + df["repo"] + "/" + df["path"] + "\n" + body + filler)
    df.loc[df["op"] == "delete", "content"] = None
    df.loc[df["op"] == "delete", "commit"] = df.loc[df["op"] == "delete", "commit"]

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
    extra = np.full(n, None, dtype=object)
    sb_at = first_add.get("size_bytes", n + 1)
    st_at = first_add.get("stars", n + 1)
    for i in range(n):
        if op[i] == "delete":
            continue
        parts = []
        if i > sb_at:
            parts.append(f'"size_bytes": {int(size_vals[i])}')
        if i > st_at:
            parts.append(f'"stars": {int(star_vals[i])}')
        if parts:
            extra[i] = "{" + ", ".join(parts) + "}"
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
