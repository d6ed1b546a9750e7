"""group_topk: two-phase per-group top-k vs the naive single window."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from oshdb_spark.ops.topk import group_topk


def _naive(df, groups, orders, k):
    w = Window.partitionBy(*groups).orderBy(*orders)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


@pytest.mark.parametrize("k", [1, 3, 10])
def test_group_topk_matches_naive_window(spark, k):
    import numpy as np

    rng = np.random.default_rng(5)
    # one group holds 85% of the rows; values collide so tiebreaks matter
    rows = [
        (
            i,
            "hot" if rng.random() < 0.85 else f"g{int(rng.integers(0, 20))}",
            int(rng.integers(0, 50)),
        )
        for i in range(5_000)
    ]
    df = spark.createDataFrame(rows, "rid long, g string, v long").repartition(8)
    orders = [F.col("v").desc(), F.col("rid")]
    got = {
        (r["g"], r["rid"])
        for r in group_topk(df, ["g"], orders, k).collect()
    }
    want = {(r["g"], r["rid"]) for r in _naive(df, ["g"], orders, k).collect()}
    assert got == want
    assert len(got) == len(want)


def test_group_topk_rank_column(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, v long"
    )
    out = group_topk(
        df, ["g"], [F.col("v").desc()], k=2, rank_out="rk"
    ).collect()
    got = {(r["g"], r["v"]): r["rk"] for r in out}
    assert got == {("a", 3): 1, ("a", 2): 2, ("b", 9): 1}


def test_skyline2d_matches_brute_force(spark):
    """skyline2d vs python O(n²) dominance incl. duplicate frontier
    points, a dominated duplicate cluster, and a strict staircase."""
    from oshdb_spark.ops.topk import skyline2d

    pts = [
        (10, 100), (10, 100),     # duplicate frontier point
        (10, 120),                # dominated within a-group
        (8, 80), (8, 80), (8, 80),
        (12, 150),
        (5, 80),                  # dominated by (8, 80)
        (5, 50),
        (3, 50),                  # dominated by (5, 50)
        (1, 10),
    ]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {
        (r.a, r.b): r.n_ties for r in skyline2d(df, "a", "b").collect()
    }
    import collections

    cnt = collections.Counter(pts)
    want = {}
    for (a, b), n in cnt.items():
        dominated = any(
            (ya >= a and yb <= b and (ya > a or yb < b))
            for (ya, yb) in cnt
        )
        if not dominated:
            want[(a, b)] = n
    assert got == want
    assert got[(10, 100)] == 2 and (10, 120) not in got
    assert (5, 80) not in got and (3, 50) not in got
