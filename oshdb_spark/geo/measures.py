"""Geometry measures over WKB columns (pandas UDFs, Arrow-batched).

The reference exposes lengths/areas through Geo.java's exact formulas;
these UDFs apply the same formulas (geo.geodesy) to WKB geometry columns
produced by the kernels.

Vectorization strategy: the kernels emit fixed-layout ISO little-endian
WKB, so buffers of the same byte length and geometry type share one
layout. Each batch is grouped by byte length, stacked into a uint8
matrix, and decoded with numpy views — single LineStrings and single-ring
Polygons (the overwhelming majority of rows) never touch per-row Python;
multi-geometries and collections fall back to the per-row decoder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geom as G
from .geodesy import EARTH_RADIUS, length_of_line, polygon_area, ring_area_signed


def _row_groups(bufs: np.ndarray):
    """Yield (row_indices, uint8 matrix) per distinct buffer byte length."""
    blen = np.fromiter(
        (0 if b is None else len(b) for b in bufs), dtype=np.int64, count=len(bufs)
    )
    for length in np.unique(blen[blen >= 9]):
        idx = np.nonzero(blen == length)[0]
        mat = np.frombuffer(
            b"".join(bytes(bufs[i]) for i in idx), dtype=np.uint8
        ).reshape(len(idx), int(length))
        yield idx, mat


def _seg_lengths_m(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Row-wise equirectangular length over (k, n) coord matrices."""
    d_lat = np.radians(lat[:, 1:] - lat[:, :-1])
    d_lng = np.radians(lon[:, 1:] - lon[:, :-1]) * np.cos(
        np.radians((lat[:, 1:] + lat[:, :-1]) / 2.0)
    )
    return EARTH_RADIUS * np.sum(np.sqrt(d_lng * d_lng + d_lat * d_lat), axis=1)


def _length_slow(buf) -> float:
    g = G.from_wkb(bytes(buf))
    if g is None:
        return 0.0
    t = g[0]
    if t == "LineString":
        return length_of_line(g[1])
    if t == "MultiLineString":
        return float(sum(length_of_line(c) for c in g[1]))
    if t == "GeometryCollection":
        return float(sum(length_of_line(c[1]) for c in g[1] if c[0] == "LineString"))
    return 0.0


@F.pandas_udf(T.DoubleType())
def wkb_length_m(wkb: pd.Series) -> pd.Series:
    """Equirectangular length in meters (Geo.java:37-59 semantics):
    LineString → segment sum; Multi/collection → component sum; other → 0."""
    n = len(wkb)
    out = np.zeros(n)
    bufs = wkb.to_numpy(dtype=object)
    for idx, mat in _row_groups(bufs):
        length = mat.shape[1]
        is_ls = (
            (mat[:, 0] == 1)
            & (mat[:, 1] == 2)
            & (mat[:, 2] == 0)
            & (mat[:, 3] == 0)
            & (mat[:, 4] == 0)
        )
        npts = (length - 9) // 16
        fast = is_ls if 9 + 16 * npts == length and npts >= 2 else np.zeros(
            len(idx), dtype=bool
        )
        if fast.any():
            sub = np.nonzero(fast)[0]
            coords = (
                np.ascontiguousarray(mat[sub, 9:])
                .view("<f8")
                .reshape(len(sub), npts, 2)
            )
            out[idx[sub]] = _seg_lengths_m(coords[..., 0], coords[..., 1])
        for i in idx[~fast]:
            out[i] = _length_slow(bufs[i])
    return pd.Series(out)


# explicit StructType (not a DDL string): the module is imported inside
# executors, where DDL parsing has no active SparkContext
_POINT_COORDS = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


@F.pandas_udf(_POINT_COORDS)
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


def _ring_areas_signed(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Row-wise Chamberlain–Duquette signed area over (k, n) closed rings
    (Geo.java:147-179 — iterates ALL n coords with wrap-around triples,
    including the duplicate closing coordinate)."""
    lo = np.radians(lon)
    la = np.radians(lat)
    n = lo.shape[1]
    i = np.arange(n)
    mid, hi = (i + 1) % n, (i + 2) % n
    area = np.sum((lo[:, hi] - lo[:, i]) * np.sin(la[:, mid]), axis=1)
    return area * EARTH_RADIUS * EARTH_RADIUS / 2.0


def _area_slow(buf) -> float:
    g = G.from_wkb(bytes(buf))
    if g is None:
        return 0.0
    t = g[0]
    if t == "Polygon":
        return polygon_area(g[1])
    if t == "MultiPolygon":
        return float(sum(polygon_area(rings) for rings in g[1]))
    if t == "GeometryCollection":
        return float(
            sum(
                polygon_area(c[1]) if c[0] == "Polygon" else 0.0
                for c in g[1]
            )
        )
    return 0.0


@F.pandas_udf(T.DoubleType())
def wkb_area_m2(wkb: pd.Series) -> pd.Series:
    """Chamberlain–Duquette spherical area (Geo.java:94-179 semantics).
    Single-ring Polygons (the kernel's common emission) decode batched."""
    n = len(wkb)
    out = np.zeros(n)
    bufs = wkb.to_numpy(dtype=object)
    for idx, mat in _row_groups(bufs):
        length = mat.shape[1]
        is_pg1 = (
            (mat[:, 0] == 1)
            & (mat[:, 1] == 3)
            & (mat[:, 2] == 0)
            & (mat[:, 3] == 0)
            & (mat[:, 4] == 0)
            & (mat[:, 5] == 1)
            & (mat[:, 6] == 0)
            & (mat[:, 7] == 0)
            & (mat[:, 8] == 0)
        )
        npts = (length - 13) // 16
        fast = (
            is_pg1
            if length >= 13 and 13 + 16 * npts == length and npts > 2
            else np.zeros(len(idx), dtype=bool)
        )
        if fast.any():
            sub = np.nonzero(fast)[0]
            coords = (
                np.ascontiguousarray(mat[sub, 13:])
                .view("<f8")
                .reshape(len(sub), npts, 2)
            )
            out[idx[sub]] = np.abs(
                _ring_areas_signed(coords[..., 0], coords[..., 1])
            )
        for i in idx[~fast]:
            out[i] = _area_slow(bufs[i])
    return pd.Series(out)
