"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps per-relay/per-pipeline counters in an in-memory dict
that dies with the process (/root/reference/src/nostr_pipeline/pipeline.py:
38-44, relay_client.py:325-344). This is the Spark-native generalization:
per-REPO running statistics maintained in the checkpointed state store
across micro-batches — survives restart, scales per-key, and demonstrates
the `applyInPandasWithState` pattern for stateful logic that windowed
aggregation cannot express (cumulative state with no window close).

Each micro-batch emits one updated row per repo seen in that batch:
cumulative event count, delete count, and max seq. Arrow-batched like every
other Python touchpoint in this engine — the per-group function receives
pandas frames, never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)


def running_repo_stats(events: DataFrame) -> DataFrame:
    """events: a STREAMING DataFrame with LOG_SCHEMA columns. Returns the
    update-mode stream of per-repo cumulative stats.

    The per-group function is self-contained (imports inside) so cloudpickle
    ships it by value — executors never need this module importable."""

    def update(key, pdfs, state):  # pragma: no cover (runs on executors)
        import pandas as pd

        n_events = n_deletes = 0
        max_seq = -1
        if state.exists:
            n_events, n_deletes, max_seq = state.get
        for pdf in pdfs:
            n_events += len(pdf)
            n_deletes += int((pdf["op"] == "delete").sum())
            if len(pdf):
                max_seq = max(max_seq, int(pdf["seq"].max()))
        state.update((n_events, n_deletes, max_seq))
        yield pd.DataFrame(
            {"repo": [key[0]], "n_events": [n_events],
             "n_deletes": [n_deletes], "max_seq": [max_seq]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.groupBy("repo")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
