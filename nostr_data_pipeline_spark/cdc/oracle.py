"""Pure-pandas oracle reducer for the CDC log.

Replays the change-event log strictly in ``(seq, event_id)`` order — the
reference's arrival-order last-writer-wins semantics
(/root/reference/src/nostr_pipeline/loaders/event_loader.py:60-87) made
order-independent by the total order on (seq, event_id) — and produces the
expected final table state the Spark engine must reproduce exactly
(per-row content sha256 equality, the BASELINE.json invariant).

Semantics implemented (the engine's contract):
- duplicate event_ids are redeliveries: deduplicated, applied once;
- upsert: row keyed by (repo, path) takes the event's commit/lang/content
  plus any schema-evolved columns parsed from extra_json;
- delete: row absent from the final state;
- schema_change at seq a: column exists for events with seq > a; type-widen
  re-types the column; events never carry a column before its add;
- NULL seq (legal per LOG_SCHEMA for external/wire producers) means seq 0:
  the earliest possible writer, losing to any real seq, ties broken by
  event_id (cdc/replayer.py normalizes identically at replay_batch).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from nostr_data_pipeline_spark.functions.content import fingerprint_series

_PD_TYPES = {"int": "Int32", "long": "Int64", "double": "float64", "string": "object"}


def reduce_log(log: pd.DataFrame) -> pd.DataFrame:
    """Return the expected final state, sorted by (repo, path).

    Columns: repo, path, commit, lang, content, content_sha256,
    last_seq, last_event_id, updated_ts, plus evolved columns.
    """
    df = log.copy()
    # engine contract: NULL seq (legal per LOG_SCHEMA for external/wire
    # producers) means seq 0 — the earliest writer, losing to any real seq,
    # ties broken by event_id (cdc/replayer.py normalizes identically).
    # Without this, pandas sorts NaN LAST and a null-seq row would
    # accidentally WIN the last-writer race here while losing it in Spark.
    df["seq"] = df["seq"].fillna(0).astype("int64")
    df = df.sort_values(["seq", "event_id"], kind="mergesort")
    df = df.drop_duplicates(subset=["event_id"], keep="first")

    # Active schema: ordered column adds/widens. Types evolve MONOTONICALLY
    # (the engine contract, SnapshotTable.evolve_column): a later NARROWER
    # request against an already-wider column is a no-op, not an overwrite —
    # the oracle must encode the same rule or narrow-after-widen logs would
    # make oracle and engine diverge.
    _widen_ok = {("int", "long"), ("int", "double"), ("long", "double"),
                 ("float", "double")}
    sc = df[df["op"] == "schema_change"]
    evolved: dict[str, str] = {}
    add_seq: dict[str, int] = {}
    for _, r in sc.iterrows():
        name, new_t = r["sc_col_name"], r["sc_col_type"]
        cur = evolved.get(name)
        if cur is None or cur == new_t or (cur, new_t) in _widen_ok:
            evolved[name] = new_t
        add_seq.setdefault(name, int(r["seq"]))

    data = df[df["op"] != "schema_change"]
    # Last writer per key wins (max (seq, event_id)); drop_duplicates keep=last
    # on the (seq, event_id)-sorted frame is exactly that.
    last = data.drop_duplicates(subset=["repo", "path"], keep="last")
    live = last[last["op"] != "delete"].copy()

    extras = live["extra_json"].map(lambda x: json.loads(x) if x else {})
    for col, typ in evolved.items():
        vals = extras.map(lambda d, c=col: d.get(c))
        live[col] = pd.Series(vals, index=live.index, dtype=_PD_TYPES[typ])
        # column must not leak to events at/before its add seq
        live.loc[live["seq"] <= add_seq[col], col] = pd.NA if typ != "string" else None

    live["content_sha256"] = fingerprint_series(live["content"])
    out = live.rename(
        columns={"seq": "last_seq", "event_id": "last_event_id", "ts": "updated_ts"}
    )
    keep = ["repo", "path", "commit", "lang", "content", "content_sha256",
            "last_seq", "last_event_id", "updated_ts", *evolved.keys()]
    return out[keep].sort_values(["repo", "path"]).reset_index(drop=True)
