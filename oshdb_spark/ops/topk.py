"""Skew-safe per-group top-k.

`df.withColumn(rn, row_number().over(Window.partitionBy(g).orderBy(o)))
.filter(rn <= k)` — the textbook form — shuffles EVERY row of a group
into one task, so a head-heavy group (the usual case: one dominant
language, one mega-city tile) serializes. The two-phase form here is
row-identical under any total order (the global top-k of a group is a
subset of every per-slice top-k of that group) and bounds per-task work
by partition size, not group frequency — the same shape
sampling.diversity_sample uses for its quota draw, exposed generically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_out: str | None = None,
) -> DataFrame:
    """Top `k` rows per group under `order_cols` (pass a TOTAL order —
    include tiebreak columns — for a deterministic result). Returns the
    surviving rows, plus their 1-based rank if `rank_out` is given.

    Phase 1: top-k per (input partition, group) — a group spread over P
    partitions does P parallel partial top-ks instead of one giant sort.
    Phase 2: top-k over the <= k*P survivors per group (tiny).
    """
    pid = "_gtk_pid"
    w_local = Window.partitionBy(pid, *group_cols).orderBy(*order_cols)
    w_global = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = (
        df.withColumn(pid, F.spark_partition_id())
        .withColumn("_gtk_rk", F.row_number().over(w_local))
        .filter(F.col("_gtk_rk") <= k)
        .withColumn("_gtk_rk", F.row_number().over(w_global))
        .filter(F.col("_gtk_rk") <= k)
    )
    if rank_out:
        return out.withColumnRenamed("_gtk_rk", rank_out).drop(pid)
    return out.drop("_gtk_rk", pid)
