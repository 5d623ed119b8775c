"""The driver may import __spark_entry__ from any cwd (file-path import,
no --py-files). Worker-shipped closures must therefore be either
self-contained or covered by the entry module's addPyFile shipping.
Regression for a ModuleNotFoundError seen when mapInPandas closures
referenced module-level helpers and the driver ran outside /root/repo."""

from __future__ import annotations

import subprocess
import sys

CODE = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
em = importlib.util.module_from_spec(spec)
spec.loader.exec_module(em)
from nostr_data_pipeline_spark.session import get_spark
spark = get_spark("portability", cores=2, shuffle_partitions=2)
assert em.entry(spark).count() > 0
# multimodal_features is the query whose closure ships to Python workers
df = em.queries()["multimodal_features"](spark, "/root/testdata/sf0.001")
assert df.count() > 0
print("PORTABLE-OK")
"""


def test_entry_runs_from_foreign_cwd(tmp_path):
    r = subprocess.run(
        [sys.executable, "-c", CODE],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "PORTABLE-OK" in r.stdout, r.stderr[-2000:]


def test_critical_queries_inside_driver_window():
    """The correctness driver evaluates only the FIRST 50 queries() entries
    (round-4 regression: mor_upsert_resolve and the corpus-hygiene oracles
    fell outside the window and lost their driver rows). Pin the critical
    set — the MoR sink contract plus every round-4 corpus oracle — inside
    positions 1-50, and every demoted-tail entry outside it."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:50])
    critical = {
        "mor_upsert_resolve",
        "corpus_decontaminate",
        "corpus_mix_budget",
        "gopher_repetition",
        "pack_sequences",
        "pii_scrub",
    }
    missing = critical - window
    assert not missing, f"critical queries outside the 50-entry window: {missing}"

    from nostr_data_pipeline_spark.operators.analytics import _TAIL_QUERIES

    in_window_tail = set(_TAIL_QUERIES) & window
    assert not in_window_tail, (
        f"demoted entries crowd the window: {in_window_tail}"
    )
    # every query still has a callable; oracled entries keep their SQL
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(names)
