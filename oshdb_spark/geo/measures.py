"""Geometry measures over WKB columns (pandas UDFs, Arrow-batched).

The reference exposes lengths/areas through Geo.java's exact formulas;
these UDFs apply the same formulas (geo.geodesy) to WKB geometry columns
produced by the kernels."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geom as G
from .geodesy import length_of_line, polygon_area


@F.pandas_udf(T.DoubleType())
def wkb_length_m(wkb: pd.Series) -> pd.Series:
    """Equirectangular length in meters (Geo.java:37-59 semantics):
    LineString → segment sum; Multi/collection → component sum; other → 0."""
    out = np.zeros(len(wkb))
    for i, buf in enumerate(wkb):
        if buf is None:
            continue
        g = G.from_wkb(bytes(buf))
        if g is None:
            continue
        t = g[0]
        if t == "LineString":
            out[i] = length_of_line(g[1])
        elif t in ("MultiLineString",):
            out[i] = sum(length_of_line(c) for c in g[1])
        elif t == "GeometryCollection":
            out[i] = sum(
                length_of_line(c[1]) for c in g[1] if c[0] == "LineString"
            )
    return pd.Series(out)


@F.pandas_udf("lon double, lat double")
def wkb_point_coords(wkb: pd.Series) -> pd.DataFrame:
    """Decode WKB Points to (lon, lat); nulls/non-points → nulls.
    Vectorized: the fixed 21-byte point layout decodes via a bytes-matrix
    view, no per-row struct unpacking."""
    n = len(wkb)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    ok = np.zeros(n, dtype=bool)
    rows = np.zeros((n, 21), dtype=np.uint8)
    for i, buf in enumerate(wkb):
        if buf is not None and len(buf) == 21 and buf[0] == 1 and buf[1] == 1:
            rows[i] = np.frombuffer(bytes(buf), dtype=np.uint8)
            ok[i] = True
    if ok.any():
        lon[ok] = rows[ok, 5:13].copy().view("<f8").ravel()
        lat[ok] = rows[ok, 13:21].copy().view("<f8").ravel()
    return pd.DataFrame({"lon": lon, "lat": lat})


@F.pandas_udf(T.DoubleType())
def wkb_area_m2(wkb: pd.Series) -> pd.Series:
    """Chamberlain–Duquette spherical area (Geo.java:94-179 semantics)."""
    out = np.zeros(len(wkb))
    for i, buf in enumerate(wkb):
        if buf is None:
            continue
        g = G.from_wkb(bytes(buf))
        if g is None:
            continue
        t = g[0]
        if t == "Polygon":
            out[i] = polygon_area(g[1])
        elif t == "MultiPolygon":
            out[i] = sum(polygon_area(rings) for rings in g[1])
    return pd.Series(out)
