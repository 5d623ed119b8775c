"""Last-writer-wins conflict resolution per key.

The reference applies profile updates in arrival order — last writer wins
(/root/reference/src/nostr_pipeline/loaders/event_loader.py:60-87). Replay
must be order-independent, so the winner is defined by the total order
``(seq, event_id)`` (tie-break documented in SURVEY §7).

Two implementations, both skew-safe at 10^10 events:

- ``mode='agg'`` (default): ``max_by(struct(*), struct(seq, event_id))``
  hash aggregation. Spark performs partial (map-side) aggregation before the
  shuffle, so a hot repo collapses to one partial row per map task — skew is
  defused without any explicit salting, and no sort is needed.
- ``mode='salted_window'``: the explicit two-phase scheme the north rule
  names — salted repartition + per-(key, salt) ``row_number`` pre-reduction,
  then a final per-key reduction over at most ``salt`` rows per key. Same
  result; kept because window-function skew is NOT covered by AQE skew
  handling and the explicit form is the portable pattern when the winner
  must carry window semantics.

Both are pure DataFrame plans (whole-stage codegen; no Python in the path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_lww(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    seq_col: str = "seq",
    tie_col: str = "event_id",
    mode: str = "agg",
    salt: int = 16,
) -> DataFrame:
    """Reduce to exactly one row per key: the (seq, tie)-max winner.
    Preserves all input columns."""
    payload = [c for c in df.columns if c not in key_cols]
    if mode == "agg":
        win = F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col(seq_col), F.col(tie_col)),
        ).alias("_w")
        out = df.groupBy(*key_cols).agg(win)
        return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])

    if mode == "salted_window":
        salted = df.withColumn("_salt", F.pmod(F.xxhash64(tie_col), F.lit(salt)))
        salted = salted.repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
        w1 = Window.partitionBy(*key_cols, "_salt").orderBy(
            F.col(seq_col).desc(), F.col(tie_col).desc()
        )
        phase1 = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
        w2 = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), F.col(tie_col).desc()
        )
        return (
            phase1.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    raise ValueError(f"unknown mode {mode}")
