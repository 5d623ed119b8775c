"""End-to-end tour of the engine (the analogue of the reference's
examples/analytics_example.py, /root/reference/examples/analytics_example.py):

  1. generate a deterministic synthetic change log,
  2. batch-replay it into a snapshot table (LWW + sha256 + guarded MERGE),
  3. run the analytics surface over it,
  4. continue the same log as a STREAM with checkpointed exactly-once resume,
  5. read the net change feed between two table versions.

Run:  python examples/end_to_end.py   (or spark-submit --py-files engine.zip)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nostr_data_pipeline_spark.cdc.generator import LogSpec, write_log
from nostr_data_pipeline_spark.cdc.replayer import replay_log
from nostr_data_pipeline_spark.session import get_spark
from nostr_data_pipeline_spark.streaming.replayer import StreamingReplayer
from nostr_data_pipeline_spark.tables.snapshot_table import SnapshotTable


def main() -> None:
    spark = get_spark("example", cores=4, shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="ndps-example-")
    log_dir = os.path.join(base, "log")
    write_log(log_dir, LogSpec(n_events=5000, n_repos=12, paths_per_repo=10,
                               seed=11, n_files=4))

    # -- 2. batch replay ----------------------------------------------------
    table = SnapshotTable(os.path.join(base, "repo_files"), num_buckets=8)
    result = replay_log(spark, table, log_dir, n_batches=2)
    print(f"replayed: {result.rows_applied} rows applied "
          f"across {len(result.batches)} batches")

    # -- 3. analytics over the table ----------------------------------------
    state = table.read(spark)
    top = (
        state.groupBy("repo")
        .agg(F.count(F.lit(1)).alias("files"),
             F.sum(F.length("content")).alias("bytes"))
        .orderBy(F.col("bytes").desc())
        .limit(5)
    )
    print("top repos by bytes:")
    top.show(truncate=False)

    # -- 4. streaming resume: same log via readStream + checkpoint ----------
    stream_table = SnapshotTable(os.path.join(base, "stream_files"), num_buckets=8)
    rep = StreamingReplayer(stream_table, log_dir,
                            os.path.join(base, "ckpt"), max_files_per_trigger=2)
    rep.run_to_completion(spark)
    batch_sha = {tuple(r) for r in
                 table.read(spark).select("repo", "path", "content_sha256").collect()}
    stream_sha = {tuple(r) for r in
                  stream_table.read(spark).select("repo", "path", "content_sha256").collect()}
    print(f"stream state == batch state: {batch_sha == stream_sha}")

    # -- 5. change feed between the two batch commits -----------------------
    data_versions = [v for v in range(1, table.current_version() + 1)
                     if "rows_inserted" in table.manifest(v).get("metrics", {})]
    feed = table.changes(spark, data_versions[0], data_versions[-1])
    print("net changes in batch 2:")
    feed.groupBy("_change_type").count().show()


if __name__ == "__main__":
    main()
