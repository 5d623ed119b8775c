"""Physical-plan discipline: the plans we'd want at 100 TB, asserted.

- filters/projections reach the parquet scan (PushedFilters / ReadSchema),
- small dims broadcast (BroadcastHashJoin, never SortMergeJoin on dims),
- top-k plans TakeOrderedAndProject (no full sort),
- LWW agg is a partial+final hash aggregate (map-side combine),
- no Python row UDFs anywhere in the analytics surface (only ArrowEval).
"""

from __future__ import annotations

import pytest

from nostr_data_pipeline_spark.operators import analytics as A

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    df = A.f1_filter_topk(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "IsNotNull(o_orderstatus)" in plan
    # column pruning: scan must not read o_orderpriority etc.
    assert "o_orderpriority" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_topk_plans_take_ordered(spark):
    plan = plan_of(A.f1_filter_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort for a limit-k


def test_dim_join_broadcasts(spark):
    plan = plan_of(A.j2_broadcast_dim_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lww_agg_has_partial_aggregation(spark):
    plan = plan_of(A.w3_lww_state(spark, SF))
    # partial + final aggregate around one shuffle = map-side combine
    assert "partial_max_by" in plan
    assert "Window" not in plan  # agg formulation, not a sorted window


def test_no_row_python_udfs_in_analytics(spark):
    for name, (fn, _sql) in A.QUERIES.items():
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_cdc_prepare_uses_arrow_udf_only(spark, tmp_path):
    from nostr_data_pipeline_spark.cdc.generator import LogSpec, write_log
    from nostr_data_pipeline_spark.cdc.replayer import LOG_SCHEMA, TARGET_BASE_SCHEMA, prepare_batch
    from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable

    d = str(tmp_path / "log")
    write_log(d, LogSpec(n_events=500, n_repos=5, paths_per_repo=5, seed=1, n_files=1))
    t = SnapshotTable(str(tmp_path / "tbl"), num_buckets=4)
    t.create(TARGET_BASE_SCHEMA)
    log = spark.read.schema(LOG_SCHEMA).parquet(d)
    data = log.filter("op != 'schema_change'")

    # mode='agg': the wide payload crosses exactly one shuffle
    plan = plan_of(prepare_batch(data, t, lww_mode="agg"))
    assert "ArrowEvalPython" in plan      # vectorized pandas UDF
    assert "BatchEvalPython" not in plan  # never per-row Python
    assert plan.count("Exchange") == 1, "agg LWW should shuffle exactly once"

    # mode='maxseq' (default): the winner-seq pass must be a pruned-scan
    # HashAggregate — content never read on that side — and the winner set
    # joins back as a BROADCAST, so the wide payload is filtered map-side
    # and crosses NO wide shuffle (the only Exchange left is the tiny
    # residual tie-resolve over ~one row per key)
    plan = plan_of(prepare_batch(data, t, lww_mode="maxseq"))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan and "partial_max(seq" in plan
    assert "BroadcastHashJoin" in plan, "winner join-back must broadcast"
    pruned_scans = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert any("content" not in s for s in pruned_scans), (
        "max(seq) pass should scan without the content column"
    )
