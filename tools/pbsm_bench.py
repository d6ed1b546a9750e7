"""PBSM two-table spatial-join scale probe.

Three claims the join makes, measured:

1. region-count scaling: wall time vs a 10x larger region table stays
   near-flat (candidates are bounded by cell overlap, not |regions|) —
   the regime where the broadcast splitters stop being an option;
2. theta-join comparison at small scale: the same predicate as a plain
   non-equi join (Catalyst can only BroadcastNestedLoopJoin it), showing
   the asymptotic the equi-join avoids;
3. hot-cell salting: 90% of points in one cell, n_salts 1 vs 8.

Usage: python tools/pbsm_bench.py [n_points] [n_regions]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def regions_df(spark, n: int):
    from pyspark.sql import functions as F

    r = spark.range(n).select(F.col("id").alias("rid"))
    return (
        r.withColumn(
            "w7",
            F.pmod(F.col("rid") * 1103515245, F.lit(3_400_000_000))
            - 1_700_000_000,
        )
        .withColumn(
            "s7",
            F.pmod(F.col("rid") * 1234567891, F.lit(1_600_000_000))
            - 850_000_000,
        )
        .withColumn("e7", F.col("w7") + 10_000_000 + (F.col("rid") % 9) * 10_000_000)
        .withColumn("n7", F.col("s7") + 5_000_000 + (F.col("rid") % 7) * 5_000_000)
        .filter((F.col("e7") < 1_800_000_000) & (F.col("n7") < 900_000_000))
    )


def points_df(spark, n: int, hot: float = 0.0):
    """hot > 0 routes that fraction of points into one ~cell-sized box."""
    from pyspark.sql import functions as F

    p = spark.range(n).select(F.col("id").alias("pid"))
    lon = F.pmod(F.col("pid") * 1103515245, F.lit(3_600_000_000)) - 1_800_000_000
    lat = F.pmod(F.col("pid") * 1234567891, F.lit(1_700_000_000)) - 850_000_000
    if hot > 0:
        is_hot = F.pmod(F.col("pid"), F.lit(1000)) < int(hot * 1000)
        lon = F.when(is_hot, F.pmod(F.col("pid") * 7919, F.lit(50_000_000))).otherwise(lon)
        lat = F.when(is_hot, F.pmod(F.col("pid") * 104729, F.lit(50_000_000))).otherwise(lat)
    return p.withColumn("lon7", lon).withColumn("lat7", lat)


def timed(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return round(time.time() - t0, 2), n


def main():
    from pyspark.sql import functions as F

    from oshdb_spark.geo.spatial_join import pip_join_regions_table
    from oshdb_spark.session import build_session

    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_reg = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = build_session("pbsm-bench")
    out: dict = {"n_points": n_pts, "n_regions": n_reg}

    pts = points_df(spark, n_pts).cache()
    pts.count()

    for label, nr in (("small", n_reg // 10), ("large", n_reg)):
        regs = regions_df(spark, nr)
        secs, rows = timed(pip_join_regions_table(pts, regs, zoom=6))
        out[f"pbsm_{label}_regions"] = nr
        out[f"pbsm_{label}_sec"] = secs
        out[f"pbsm_{label}_pairs"] = rows

    # theta-join baseline at 1% of the points and small regions only —
    # BroadcastNestedLoopJoin is O(points x regions), keep it feasible
    sub = pts.sample(0.1, seed=1).cache()
    ns = sub.count()
    regs = regions_df(spark, n_reg // 10)
    secs, rows = timed(
        sub.join(
            regs,
            (F.col("lon7") >= F.col("w7")) & (F.col("lon7") <= F.col("e7"))
            & (F.col("lat7") >= F.col("s7")) & (F.col("lat7") <= F.col("n7")),
        )
    )
    out["theta_points"] = ns
    out["theta_sec"] = secs
    out["theta_pairs"] = rows
    secs, rows = timed(pip_join_regions_table(sub, regs, zoom=6))
    out["pbsm_same_input_sec"] = secs
    out["pbsm_same_input_pairs"] = rows
    sub.unpersist()

    hot = points_df(spark, n_pts, hot=0.9).cache()
    hot.count()
    regs = regions_df(spark, n_reg // 10)
    for salts in (1, 8):
        secs, rows = timed(
            pip_join_regions_table(hot, regs, zoom=6, n_salts=salts)
        )
        out[f"hot_salts{salts}_sec"] = secs
        out[f"hot_salts{salts}_pairs"] = rows
    hot.unpersist()
    pts.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
