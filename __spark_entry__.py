"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md §2) with its
DuckDB oracle. Implementations live in
``nostr_data_pipeline_spark/operators/``; this file only adapts them to the
driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped multi-aggregate pricing summary (SURVEY A3/A4/A5)."""
    from nostr_data_pipeline_spark.operators.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nostr_data_pipeline_spark.operators.analytics import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in QUERIES.items()
    }
    try:  # rows-only operators (no SQL-expressible oracle)
        from nostr_data_pipeline_spark.operators.dedup import ROWS_ONLY_QUERIES

        out.update(ROWS_ONLY_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from nostr_data_pipeline_spark.operators.analytics import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
