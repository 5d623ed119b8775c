"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator (SURVEY.md §2) with its
DuckDB oracle. Implementations live in
``nostr_data_pipeline_spark/operators/``; this file only adapts them to the
driver's calling convention.
"""

from __future__ import annotations

import functools
import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# The driver may import this file from any cwd; make the package importable
# on the driver unconditionally.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executors (addPyFile zip) exactly once per
    SparkContext. Closures that *are* self-contained don't need this, but a
    driver launched outside the repo (no --py-files) would otherwise lose any
    by-reference pickled symbol on the Python workers.

    Keyed by applicationId, which is unique per context — ``id(sc)`` can be
    REUSED by CPython after a stopped context is garbage-collected, which
    would silently skip addPyFile for the successor context."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.join(_REPO, "nostr_data_pipeline_spark")
    zpath = os.path.join(
        tempfile.gettempdir(), f"ndps_pkg_{os.getpid()}_{app_id}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, _REPO))
    sc.addPyFile(zpath)
    _SHIPPED.add(app_id)


def _pin_utc(spark: SparkSession) -> None:
    """Contract queries are timezone-deterministic only under a UTC session
    (the oracle sees naive UTC wall-clock). The driver may hand us any
    session, so the timezone is pinned HERE — the documented contract entry
    point — and stays pinned for the session (plans are lazy: a set/restore
    scope would not survive until execution)."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _shipping(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        _pin_utc(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped multi-aggregate pricing summary (SURVEY A3/A4/A5)."""
    from nostr_data_pipeline_spark.operators.analytics import q1_pricing_summary

    _ensure_shipped(spark)
    _pin_utc(spark)
    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nostr_data_pipeline_spark.operators.analytics import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _shipping(fn) for name, (fn, _sql) in QUERIES.items()
    }
    # rows-only operators (no SQL-expressible oracle). Import errors must
    # PROPAGATE: swallowing them would silently drop four contract queries
    # and mask the real traceback behind a later "unknown query".
    from nostr_data_pipeline_spark.operators.dedup import ROWS_ONLY_QUERIES

    out.update({name: _shipping(fn) for name, fn in ROWS_ONLY_QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    from nostr_data_pipeline_spark.operators.analytics import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
