"""Trajectory mining over event streams: stay-point (dwell) detection.

Speed-based variant of the classic stay-point extractors (Li et al.
2008 "Mining user similarity based on location history" detect stays as
runs of slow movement): a point continues the current dwell segment iff
its equirectangular distance to the PREVIOUS point is within `dist_m`;
a longer hop (or the first point) starts a new segment (gaps-and-
islands over a lag + running sum — pure Catalyst, one shuffle on the
entity key, no python). A segment is a stay when it spans at least
`min_dwell_s` seconds and `min_pts` points.

The anchor-based original (distance to the segment's FIRST point)
needs sequential state and would force a per-entity kernel; the
previous-point formulation is the declarative equivalent used by
streaming systems (it differs only on slow drifts that creep beyond
the radius) and keeps the whole operator inside whole-stage codegen.

Positions come in as fixed-point 1e-7 integer degrees (`lon7`/`lat7`,
the engine's native encoding — geo/geodesy.py), so segment centroids
are exact integer averages; distances use the reference's
equirectangular formula (reference Geo.java:37-45) written with the
same operation order as the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def stay_points(
    df: DataFrame,
    id_col: str = "user_id",
    sec_col: str = "sec",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    order_cols: tuple[str, ...] = (),
    dist_m: float = 500.0,
    min_dwell_s: int = 1800,
    min_pts: int = 3,
) -> DataFrame:
    """One row per detected stay: (id, seg, n_pts, dwell_s, clon, clat).

    `seg` is the 1-based dwell-segment ordinal within the entity (stable
    across partition layouts: the window order is (sec, *order_cols) —
    pass a tiebreaker if seconds can collide). Centroids are exact
    integer averages of the fixed-point coordinates, emitted in degrees
    rounded to 4 decimals."""
    w = Window.partitionBy(id_col).orderBy(sec_col, *order_cols)
    lond = F.col(lon7_col) * 1e-7
    latd = F.col(lat7_col) * 1e-7
    d = (
        df.withColumn("_plon", F.lag(F.col(lon7_col) * 1e-7).over(w))
        .withColumn("_plat", F.lag(F.col(lat7_col) * 1e-7).over(w))
    )
    dlat = F.radians(latd - F.col("_plat"))
    dlng = F.radians(lond - F.col("_plon")) * F.cos(
        F.radians((latd + F.col("_plat")) / 2.0)
    )
    seg_m = F.lit(6371000.0) * F.sqrt(dlng * dlng + dlat * dlat)
    d = d.withColumn(
        "_new",
        (F.col("_plon").isNull() | (seg_m > F.lit(float(dist_m)))).cast(
            "long"
        ),
    ).withColumn(
        "_seg",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        d.groupBy(F.col(id_col), F.col("_seg").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            (F.max(sec_col) - F.min(sec_col)).alias("dwell_s"),
            F.round(F.avg(lon7_col) / 1e7, 4).alias("clon"),
            F.round(F.avg(lat7_col) / 1e7, 4).alias("clat"),
        )
        .filter(
            (F.col("dwell_s") >= F.lit(int(min_dwell_s)))
            & (F.col("n_pts") >= F.lit(int(min_pts)))
        )
    )


def geofence_transitions(
    df: DataFrame,
    fences: dict[str, tuple[int, int, int, int]],
    id_col: str = "user_id",
    sec_col: str = "sec",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Geofence enter/exit detection: one row per transition of an
    entity's trajectory across a named bbox fence — (id, fence, kind
    'enter'|'exit', sec). ``fences``: name -> (w7, s7, e7, n7) int64
    fixed-point bboxes (INCLUSIVE edges — integer compares, so the
    in/out decision is exact on every engine; no float boundary).

    Semantics: observations sort by (sec, *order_cols) per entity; the
    first observation inside a fence emits 'enter' at its sec; a later
    observation outside after being inside emits 'exit'. An entity never
    seen inside emits nothing for that fence. Transitions are
    level-triggered on OBSERVATIONS (sampling a fence crossing between
    two points is attributed to the later point — the standard telemetry
    contract).

    Plan: the fence list fans out map-side as a literal array (codegen
    explode, |fences| small), inside-ness is an integer range predicate,
    and ONE window per (entity, fence) computes the lag — a single
    shuffle on the composite key, no joins, no Python. The streaming
    sibling (streaming.incremental.geofence_tracker) carries (last_in)
    per key across micro-batches and emits the identical rows."""
    items = ", ".join(
        f"named_struct('fence', '{name}', 'w', {w}L, 's', {s}L, "
        f"'e', {e}L, 'n', {n}L)"
        for name, (w, s, e, n) in sorted(fences.items())
    )
    d = df.withColumn("_f", F.explode(F.expr(f"array({items})")))
    inside = (
        (F.col(lon7_col) >= F.col("_f.w"))
        & (F.col(lon7_col) <= F.col("_f.e"))
        & (F.col(lat7_col) >= F.col("_f.s"))
        & (F.col(lat7_col) <= F.col("_f.n"))
    )
    w = Window.partitionBy(id_col, "_f.fence").orderBy(sec_col, *order_cols)
    d = d.withColumn("_in", inside).withColumn(
        "_pin", F.lag("_in").over(w)
    )
    trans = d.filter(
        (F.col("_in") & (F.col("_pin").isNull() | ~F.col("_pin")))
        | (~F.col("_in") & F.col("_pin"))
    )
    return trans.select(
        F.col(id_col),
        F.col("_f.fence").alias("fence"),
        F.when(F.col("_in"), F.lit("enter")).otherwise(F.lit("exit"))
        .alias("kind"),
        F.col(sec_col).alias("sec"),
    )
