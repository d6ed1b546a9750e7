"""Per-group convex hulls over fixed-point coordinates.

The JTS ``ConvexHull``-class capability the reference's users reach for
constantly (coverage footprints, activity ranges, territory extents),
re-expressed for Spark: points shuffle ONCE on the group key (ids +
coordinates only), each group's hull is computed in a grouped Arrow
kernel with EXACT integer predicates (Python big-int cross products —
fixed-point deltas can overflow int64 in the cross difference), and the
measures come out in the engine's reference formulas (Chamberlain-
Duquette spherical area, Geo.java:147-179; equirectangular perimeter,
Geo.java:37-45).

Determinism contract (what the DuckDB oracle replays with a DIFFERENT
algorithm — gift-wrapping in a recursive CTE over exact HUGEINT
crosses):

- STRICT hull (collinear boundary points dropped) — the minimal vertex
  set, unique for a point set;
- traversal starts at the lexicographically least (lon7, lat7) vertex
  and proceeds counter-clockwise — term-for-term area parity needs the
  identical closed-ring sequence because the reference CD formula also
  sums the duplicated closing coordinate's wrap-around terms;
- area terms (radians) quantize to 1e-12 integer units and perimeter
  edges to integer millimeters BEFORE summation, so both totals are
  order-invariant exact integer sums.

Groups with fewer than 3 hull vertices (degenerate: < 3 distinct points
or all collinear) are omitted — mirroring callers who treat point/line
footprints separately.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .geodesy import EARTH_RADIUS

_HULL_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.LongType()),
        T.StructField("n_pts", T.LongType()),
        T.StructField("n_hull", T.LongType()),
        T.StructField("area_km2", T.DoubleType()),
        T.StructField("perim_km", T.DoubleType()),
    ]
)


def _chain(ps: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict monotone-chain hull, CCW from the lexicographic minimum.
    Exact: Python ints (a cross difference of ±1.8e9-range fixed-point
    deltas can reach ~1.3e19, past int64)."""
    ps = sorted(set(ps))
    if len(ps) < 3:
        return ps

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lo: list[tuple[int, int]] = []
    for p in ps:
        while len(lo) >= 2 and cross(lo[-2], lo[-1], p) <= 0:
            lo.pop()
        lo.append(p)
    up: list[tuple[int, int]] = []
    for p in reversed(ps):
        while len(up) >= 2 and cross(up[-2], up[-1], p) <= 0:
            up.pop()
        up.append(p)
    return lo[:-1] + up[:-1]


def _round_away(v: float) -> int:
    """SQL round(): half away from zero."""
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _hull_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    ent = int(pdf["entity"].iloc[0])
    pts = list(
        dict.fromkeys(zip(pdf["lon7"].astype(int), pdf["lat7"].astype(int)))
    )
    hull = _chain(pts)
    if len(hull) < 3:
        return pd.DataFrame(
            {
                "entity": pd.Series([], dtype="int64"),
                "n_pts": pd.Series([], dtype="int64"),
                "n_hull": pd.Series([], dtype="int64"),
                "area_km2": pd.Series([], dtype="float64"),
                "perim_km": pd.Series([], dtype="float64"),
            }
        )
    m = len(hull)
    lon = [x * 1e-7 for x, _ in hull]
    lat = [y * 1e-7 for _, y in hull]
    # closed ring c[0..m] with c[m] = c[0]; the reference CD loop walks
    # ALL m+1 coords with wrap-around triples (ring_area_signed parity)
    clon = [math.radians(v) for v in lon] + [math.radians(lon[0])]
    clat = [math.radians(v) for v in lat] + [math.radians(lat[0])]
    n = m + 1
    qsum = 0
    for i in range(n):
        t = (clon[(i + 2) % n] - clon[i]) * math.sin(clat[(i + 1) % n])
        qsum += _round_away(t * 1e12)
    # final rounds mirror SQL round() (half away from zero) — Python's
    # built-in round is half-even and can differ on exact boundaries
    area_km2 = (
        _round_away(
            abs(qsum) * EARTH_RADIUS * EARTH_RADIUS / 2.0 / 1e12 / 1e6 * 1e6
        )
        / 1e6
    )
    mm = 0
    for j in range(m):
        k = (j + 1) % m
        dlat = math.radians(lat[k] - lat[j])
        dlng = math.radians(lon[k] - lon[j]) * math.cos(
            math.radians((lat[j] + lat[k]) / 2.0)
        )
        mm += _round_away(
            EARTH_RADIUS * math.sqrt(dlat * dlat + dlng * dlng) * 1000.0
        )
    perim_km = _round_away(mm / 1e6 * 1e6) / 1e6
    return pd.DataFrame(
        {
            "entity": pd.Series([ent], dtype="int64"),
            "n_pts": pd.Series([len(pts)], dtype="int64"),
            "n_hull": pd.Series([m], dtype="int64"),
            "area_km2": pd.Series([area_km2], dtype="float64"),
            "perim_km": pd.Series([perim_km], dtype="float64"),
        }
    )


def convex_hull_stats(
    pts: DataFrame,
    entity_col: str = "entity",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Per-entity strict convex hull: (entity, n_pts, n_hull, area_km2,
    perim_km). One shuffle on the entity key shipping (entity, lon7,
    lat7) only; the hull itself is a grouped Arrow kernel (hull size is
    output-bounded — O(h) memory per group beyond the group's points,
    and a group is one entity's fixes, never the corpus)."""
    from pyspark.sql import functions as F

    base = pts.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.col(lon7_col).cast("long").alias("lon7"),
        F.col(lat7_col).cast("long").alias("lat7"),
    )
    return base.groupBy("entity").applyInPandas(_hull_rows, _HULL_SCHEMA)
