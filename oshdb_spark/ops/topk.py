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


def skyline2d(
    df,
    max_col: str,
    min_col: str,
):
    """2-D skyline (Pareto frontier): the rows not dominated under
    (maximize ``max_col``, minimize ``min_col``) — the classic
    multi-criteria DB operator (best quality-per-cost documents,
    cheapest-fastest suppliers). x dominates y iff x.a ≥ y.a ∧
    x.b ≤ y.b with at least one strict; duplicate (a, b) points are
    mutually non-dominating and survive together (reported once with
    their multiplicity).

    Pure-window formulation, exact integer compares: collapse to
    distinct (a, b) with counts; within an a-group only the minimal b
    survives (larger b is dominated by it); across groups a point
    survives iff every strictly-larger a has a strictly larger b —
    i.e. b < min(b) over rows with a' > a, ONE range-frame window over
    the a order. Two shuffles total (the collapse + the window sort),
    no joins, no cartesian — against the O(n²) brute force the oracle
    runs. Returns (a, b, n_ties) renamed to the input columns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pts = df.groupBy(
        F.col(max_col).alias("_a"), F.col(min_col).alias("_b")
    ).agg(F.count(F.lit(1)).alias("n_ties"))
    per_a = (
        pts.withColumn(
            "_rb",
            F.min("_b").over(Window.partitionBy("_a")),
        )
        .filter(F.col("_b") == F.col("_rb"))
        .drop("_rb")
    )
    w = (
        Window.orderBy("_a")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    sky = per_a.withColumn("_mb", F.min("_b").over(w)).filter(
        F.col("_mb").isNull() | (F.col("_b") < F.col("_mb"))
    )
    return sky.select(
        F.col("_a").alias(max_col),
        F.col("_b").alias(min_col),
        "n_ties",
    )
