"""Property-based invariants (hypothesis): random small logs must always
match the pandas oracle, and LWW modes must agree with each other."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nostr_data_pipeline_spark.cdc.generator import LogSpec, make_log_frame, write_log
from nostr_data_pipeline_spark.cdc.lww import resolve_lww
from nostr_data_pipeline_spark.cdc.oracle import reduce_log
from nostr_data_pipeline_spark.cdc.replayer import replay_log
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

spec_strategy = st.builds(
    LogSpec,
    n_events=st.integers(min_value=50, max_value=400),
    n_repos=st.integers(min_value=1, max_value=8),
    paths_per_repo=st.integers(min_value=1, max_value=6),
    zipf_a=st.floats(min_value=1.05, max_value=3.0),
    dup_rate=st.floats(min_value=0.0, max_value=0.5),
    delete_rate=st.floats(min_value=0.0, max_value=0.5),
    disorder=st.integers(min_value=0, max_value=400),
    n_files=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=spec_strategy, n_batches=st.integers(min_value=1, max_value=4))
def test_random_log_replay_matches_oracle(spark, tmp_path_factory, spec, n_batches):
    tmp = tmp_path_factory.mktemp("prop")
    write_log(str(tmp / "log"), spec)
    expected = reduce_log(make_log_frame(spec))
    table = SnapshotTable(str(tmp / "tbl"), num_buckets=4)
    replay_log(spark, table, str(tmp / "log"), n_batches=n_batches)
    got = table.read(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(expected)
    assert list(got["content_sha256"]) == list(expected["content_sha256"])
    assert list(got["last_event_id"]) == list(expected["last_event_id"])


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=spec_strategy)
def test_lww_modes_agree(spark, spec):
    log = make_log_frame(spec)
    data = log[log["op"] != "schema_change"][
        ["repo", "path", "seq", "event_id", "commit", "content"]
    ]
    if data.empty:
        return
    df = spark.createDataFrame(data)
    outs = {}
    for mode in ("maxseq", "maxseq_shuffle", "agg", "salted_window"):
        outs[mode] = (
            resolve_lww(df, ("repo", "path"), "seq", "event_id", mode=mode)
            .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
        )
    base = outs["maxseq"]
    for mode in ("maxseq_shuffle", "agg", "salted_window"):
        pd.testing.assert_frame_equal(
            base[["repo", "path", "seq", "event_id"]],
            outs[mode][["repo", "path", "seq", "event_id"]],
            check_dtype=False, obj=mode,
        )
