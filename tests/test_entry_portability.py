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
