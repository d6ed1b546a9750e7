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
