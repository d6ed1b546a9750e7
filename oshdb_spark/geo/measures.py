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
