"""Dissolve: per-group polygon-union area.

The reference reaches this through JTS (``Geo.areaOf(UnaryUnionOp
.union(...))`` — oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/
geometry/Geo.java area/length entry points operate on whatever geometry
the caller assembled, including unions); a Spark engine needs the union
itself to be a distributed aggregate. Two implementations with the same
contract (group key → exact planar covered area):

- ``rect_union_area``: axis-aligned rectangles, PURE CATALYST — a slab
  sweep: distinct x edges per group → vertical slabs (lead window), a
  slab×rect cover join, then classic gaps-and-islands interval merging
  per (group, slab) with running-max windows. Zero Python; every stage
  is whole-stage codegen; shuffles are keyed by group (slab build) and
  (group, slab) (interval merge) — no single-task hot spot beyond one
  slab column. Worst case O(n²) rows per group in the cover join (every
  rect spanning every slab) — inherent to slab sweeps; groups are
  region-scale keys, slabs shard the work across the cluster.
- ``rings_union_area``: arbitrary simple CCW rings via the engine's own
  ring-union machinery (``geo.clip.union_covered_area``:
  merge_overlapping_rings + exact pocket correction). One Arrow group
  per key (``applyInPandas``) — dissolve keys are admin-region-sized
  (10²–10⁴ pieces); the merge is quadratic in pieces-per-group, never
  distributed-collection-sized.

Running both over the same rectangles is a cross-ALGORITHM differential:
the sweep never touches the ring code, so agreement pins the union/
pocket machinery against an independent computation (tests +
the dissolve_rings driver oracle do exactly this). With integer-valued
coordinates both paths are float-exact (crossings of axis-aligned
integer rects are integral, shoelace products stay below 2^53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rect_union_area(
    df: DataFrame,
    by: str = "grp",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    out: str = "union_area",
) -> DataFrame:
    """Exact union area of axis-aligned rectangles per group, as one
    declarative Catalyst plan (see module docstring for the shape)."""
    r = df.select(
        F.col(by).alias("_g"),
        F.col(x1).alias("_x1"),
        F.col(y1).alias("_y1"),
        F.col(x2).alias("_x2"),
        F.col(y2).alias("_y2"),
    ).filter((F.col("_x1") < F.col("_x2")) & (F.col("_y1") < F.col("_y2")))
    xs = (
        r.select("_g", F.col("_x1").alias("_x"))
        .unionByName(r.select("_g", F.col("_x2").alias("_x")))
        .distinct()
    )
    slabs = (
        xs.select(
            "_g",
            F.col("_x").alias("_xa"),
            F.lead("_x").over(Window.partitionBy("_g").orderBy("_x")).alias("_xb"),
        )
        .filter(F.col("_xb").isNotNull())
        .alias("s")
    )
    cov = slabs.join(
        r.alias("r"),
        (F.col("s._g") == F.col("r._g"))
        & (F.col("r._x1") <= F.col("s._xa"))
        & (F.col("r._x2") >= F.col("s._xb")),
    ).select(F.col("s._g").alias("_g"), "_xa", "_xb", "_y1", "_y2")
    # gaps-and-islands per (group, slab): a row opens a new island when
    # its y1 clears the running max y2 of every earlier interval
    order = Window.partitionBy("_g", "_xa").orderBy("_y1", "_y2")
    prev_max = F.max("_y2").over(order.rowsBetween(Window.unboundedPreceding, -1))
    cov = cov.withColumn(
        "_new",
        F.when(prev_max.isNull() | (F.col("_y1") > prev_max), 1).otherwise(0),
    ).withColumn(
        "_iid", F.sum("_new").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    seg = cov.groupBy("_g", "_xa", "_xb", "_iid").agg(
        (F.max("_y2") - F.min("_y1")).alias("_len")
    )
    return (
        seg.groupBy("_g")
        .agg(F.round(F.sum(F.col("_len") * (F.col("_xb") - F.col("_xa"))), 6).alias(out))
        .withColumnRenamed("_g", by)
    )


def rings_union_area(
    df: DataFrame,
    by: str = "grp",
    ring_col: str = "ring",
    out: str = "union_area",
) -> DataFrame:
    """Exact union area of simple CCW rings per group via the engine's
    ring-union machinery. ``ring_col`` is a flat array<double>
    [x0,y0,x1,y1,...] (closed or open — closure is appended if absent).
    One Arrow group per key; see module docstring for the scale contract.
    """
    schema = T.StructType(
        [
            df.schema[by],
            T.StructField(out, T.DoubleType(), False),
        ]
    )

    def merge(key, pdf):
        from ..geo.clip import union_covered_area

        pieces = []
        for flat in pdf[ring_col]:
            a = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
            if len(a) < 3:
                continue
            if a[0, 0] != a[-1, 0] or a[0, 1] != a[-1, 1]:
                a = np.vstack([a, a[:1]])
            # enforce CCW (shoelace sign)
            s = float(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))
            if s < 0:
                a = a[::-1].copy()
            pieces.append(a)
        area = round(union_covered_area(pieces), 6)
        return pd.DataFrame({by: [key[0]], out: [area]})

    return df.select(by, ring_col).groupBy(by).applyInPandas(merge, schema)
