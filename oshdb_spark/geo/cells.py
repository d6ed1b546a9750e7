"""Hierarchical spatial cell index: reference-parity XY grid + Hilbert tokens.

Two layers:

1. ``XYGrid`` — the reference's equal-degree row-major grid, re-implemented
   from its observable semantics so tile assignments match the reference
   exactly (parity targets: oshdb/.../index/XYGrid.java:120-160 ``getId``,
   :294-373 ``bbox2CellIdRanges`` incl. date-line wrap and the
   enlarge-one-tile-SW rule, oshdb/.../index/XYGridTree.java:89-97
   ``getInsertId`` multi-zoom insert rule). Zoom z has 2^z columns
   (cellWidth = 360/2^z degrees) and 2^z/2 rows; id = y * 2^z + x.

2. Hilbert tokens — the scale/partitioning layer that REPLACES the
   reference ETL's z-order ``ZGrid`` (oshdb-tool/.../util/ZGrid.java). A
   cell at level L is the base-4 Hilbert digit string of length L over a
   2^L x 2^L index space covering lon [-180,180), lat [-90,90). Properties:
   - an ancestor's token is a string PREFIX of every descendant token →
     cover predicates become ``cell LIKE 'prefix%'`` / token-range scans,
     which Parquet/Iceberg prune on;
   - lexicographic token order IS Hilbert order → sorting by token gives
     spatially local file layout ("Hilbert-ordered cell prefixes" in the
     north rule).

All hot paths are numpy-vectorized (arrays in, arrays out) so they can run
inside pandas UDFs without per-row Python.
"""

from __future__ import annotations

import numpy as np

GEOM_PRECISION_TO_LONG = 10_000_000  # OSHDB.java:8-9 fixed-point scale
MAXZOOM = 15  # OSHDB.java:5

_LON_MAX = 180 * GEOM_PRECISION_TO_LONG
_LAT_MAX = 90 * GEOM_PRECISION_TO_LONG


# ---------------------------------------------------------------------------
# Layer 1: reference-parity XY grid
#
# The reference's cell width is a DOUBLE: 360e7 / 2^zoom
# (XYGrid.java:108 ``cellWidth = (360.0 / zoompow) * GEOM_PRECISION_TO_LONG``)
# — an integer only up to zoom 10 (360e7 = 3515625 * 2^10); at deeper zooms
# it is fractional (e.g. 1757812.5 at zoom 11), and every id / bbox below
# reproduces the reference's double arithmetic EXACTLY via integer rationals
# width = _N / 2^(zoom-10). (The double ops themselves are exact or provably
# round-safe: 3515625 fits the 53-bit mantissa, operands stay < 2^52, and a
# non-integer quotient v*2^k/_N is ≥ 1/_N ≈ 2.8e-7 away from an integer
# while the division's rounding error is < 2^-23 of it.)
# ---------------------------------------------------------------------------

_N = 3515625  # odd mantissa of the grid width: 360e7 == _N << 10


def _clamp_zoom(zoom: int) -> int:
    """XYGrid.java:96-105 — zoom is clamped into [0, 30]."""
    return 0 if zoom < 0 else (30 if zoom > 30 else zoom)


def xy_cell_width(zoom: int) -> float:
    """Cell width in fixed-point units (360e7 / 2^zoom) — the reference's
    exact double; fractional for zoom > 10."""
    return (360 * GEOM_PRECISION_TO_LONG) / (1 << _clamp_zoom(zoom))


def _floor_div_w(v, zoom: int):
    """Exact floor(v / cellWidth) for int64 scalar/array v (any sign)."""
    if zoom <= 10:
        return v // (_N << (10 - zoom))
    return (v * (1 << (zoom - 10))) // _N


def _ceil_div_w(v, zoom: int):
    """Exact ceil(v / cellWidth) for int64 scalar/array v (any sign)."""
    if zoom <= 10:
        return -((-v) // (_N << (10 - zoom)))
    return -((-v * (1 << (zoom - 10))) // _N)


def xy_id(lon7: np.ndarray, lat7: np.ndarray, zoom: int) -> np.ndarray:
    """Row-major cell id per point; -1 for out-of-range coordinates.

    Border semantics match the reference (XYGrid.java:124-160): points on
    lon=180 wrap to the westernmost column, points on lat=90 go to the
    northernmost row.
    """
    zoom = _clamp_zoom(zoom)
    lon7 = np.asarray(lon7, dtype=np.int64)
    lat7 = np.asarray(lat7, dtype=np.int64)
    bad = (lon7 > _LON_MAX) | (lon7 < -_LON_MAX) | (lat7 > _LAT_MAX) | (lat7 < -_LAT_MAX)
    lon = lon7 + _LON_MAX
    lat = lat7 + _LAT_MAX
    lon = np.where(lon == 2 * _LON_MAX, 0, lon)
    lat = np.where(lat == 2 * _LAT_MAX, lat - 1, lat)
    x = _floor_div_w(lon, zoom)
    y = _floor_div_w(lat, zoom)
    out = y * (1 << zoom) + x
    return np.where(bad, -1, out)


def xy_estimated_id_count(bbox7: tuple[int, int, int, int], zoom: int) -> int:
    """Max cells along either axis covering bbox (XYGrid.java:210-216):
    ``ceil(max/W) - floor(min/W)`` per axis, exact."""
    zoom = _clamp_zoom(zoom)
    minlon, minlat, maxlon, maxlat = bbox7
    return max(
        int(_ceil_div_w(maxlon, zoom)) - int(_floor_div_w(minlon, zoom)),
        int(_ceil_div_w(maxlat, zoom)) - int(_floor_div_w(minlat, zoom)),
    )


def xy_insert_id(bbox7: tuple[int, int, int, int], maxzoom: int = MAXZOOM):
    """(zoom, id) a bbox-ed feature is stored at (XYGridTree.java:89-97).

    Deepest zoom whose covering-cell estimate is <=2 per axis; id is the
    cell of the bbox SW corner.
    """
    for z in range(maxzoom, -1, -1):
        if xy_estimated_id_count(bbox7, z) > 2:
            continue
        cid = int(xy_id(np.array([bbox7[0]]), np.array([bbox7[1]]), z)[0])
        return z, cid
    return None


def xy_bbox2_cell_id_ranges(
    bbox7: tuple[int, int, int, int], zoom: int, enlarge: bool = False
) -> set[tuple[int, int]]:
    """All (start,end) row-major id ranges intersecting bbox at one zoom.

    Parity: XYGrid.java:294-373 — clamping of out-of-range boxes to an
    INVALID (-1,-1) marker, 180°/90° border nudges, date-line split, and
    the enlarge-one-SW-tile mode used so features stored in the adjacent
    cell (insert rule anchors at SW corner) are still found.
    """
    result: set[tuple[int, int]] = set()
    minlon, minlat, maxlon, maxlat = bbox7
    if minlat > maxlat:
        return result
    if minlon < -_LON_MAX or minlon > _LON_MAX:
        result.add((-1, -1))
        minlon = -_LON_MAX
    if minlat < -_LAT_MAX or minlat > _LAT_MAX:
        result.add((-1, -1))
        minlat = -_LAT_MAX
    if maxlon > _LON_MAX or maxlon < -_LON_MAX:
        result.add((-1, -1))
        maxlon = _LON_MAX
    if maxlat > _LAT_MAX or maxlat < -_LAT_MAX:
        result.add((-1, -1))
        maxlat = _LAT_MAX
    if minlon == _LON_MAX:
        minlon = _LON_MAX - 1
    if maxlon == _LON_MAX:
        maxlon = _LON_MAX - 1
    if minlat == _LAT_MAX:
        minlat = _LAT_MAX - 1
    if maxlat == _LAT_MAX:
        maxlat = _LAT_MAX - 1
    if minlon > maxlon:  # date-line wrap: split into two boxes
        result |= xy_bbox2_cell_id_ranges(
            (minlon, minlat, _LON_MAX - 1, maxlat), zoom, enlarge
        )
        minlon = -_LON_MAX
    zoom = _clamp_zoom(zoom)
    colmin = int(_floor_div_w(minlon + _LON_MAX, zoom))
    colmax = int(_floor_div_w(maxlon + _LON_MAX, zoom))
    rowmin = int(_floor_div_w(minlat + _LAT_MAX, zoom))
    rowmax = int(_floor_div_w(maxlat + _LAT_MAX, zoom))
    if enlarge:
        if colmin > 0:
            colmin -= 1
        if rowmin > 0:
            rowmin -= 1
    zp = 1 << zoom
    for row in range(rowmin, rowmax + 1):
        result.add((row * zp + colmin, row * zp + colmax))
    return result


def xy_cell_bbox7(zoom: int, cell_id: int) -> tuple[int, int, int, int]:
    """Fixed-point bbox of a cell (XYGrid.java:176-202 getCellDimensions).

    Exact double parity incl. the deep-zoom quirks: corner longs are the
    JAVA-CAST (truncate-toward-zero) of fractional ``x*W - 180e7``, and the
    reference's northernmost-row special case (``lat == 90e7 - W``) can
    only trigger where W is integral (zoom ≤ 10) — at zoom 0 the whole
    world is one ±90e7 row."""
    zoom = _clamp_zoom(zoom)
    zp = 1 << zoom
    x = cell_id % zp
    y = cell_id // zp
    if zoom <= 10:
        w = _N << (10 - zoom)
        minlon = x * w - _LON_MAX
        maxlon = minlon + w - 1
        lat = y * w - _LAT_MAX
        if zoom == 0:
            minlat, maxlat = -_LAT_MAX, _LAT_MAX
        elif lat == _LAT_MAX - w:
            minlat, maxlat = lat, _LAT_MAX
        else:
            minlat, maxlat = lat, lat + w - 1
        return (minlon, minlat, maxlon, maxlat)
    d = 1 << (zoom - 10)  # width = _N / d

    def _trunc(t: int) -> int:  # Java (long) cast of t/d: toward zero
        return t // d if t >= 0 else -((-t) // d)

    minlon = _trunc(x * _N - _LON_MAX * d)
    maxlon = _trunc(minlon * d + _N) - 1
    minlat = _trunc(y * _N - _LAT_MAX * d)
    maxlat = _trunc(minlat * d + _N) - 1
    return (minlon, minlat, maxlon, maxlat)


def xy_neighbours(zoom: int, cell_id: int) -> set[tuple[int, int]]:
    """Id ranges of the 3x3 neighbourhood (XYGrid.java:383-397)."""
    minlon, minlat, maxlon, maxlat = xy_cell_bbox7(zoom, cell_id)
    return xy_bbox2_cell_id_ranges(
        (minlon - 1, minlat - 1, maxlon + 1, maxlat + 1), zoom, False
    )


def xy_tree_ids(lon7: int, lat7: int, maxzoom: int = MAXZOOM) -> set[tuple[int, int]]:
    """(zoom, cell) of a point at EVERY zoom 0..maxzoom
    (XYGridTree.java:46-69 getIds)."""
    lon = np.array([lon7], dtype=np.int64)
    lat = np.array([lat7], dtype=np.int64)
    return {(z, int(xy_id(lon, lat, z)[0])) for z in range(maxzoom + 1)}


def xy_tree_bbox2_cell_ids(
    bbox7: tuple[int, int, int, int], maxzoom: int = MAXZOOM, enlarge: bool = False
) -> set[tuple[int, int]]:
    """(zoom, cell) of every cell intersecting bbox across all zooms
    0..maxzoom (XYGridTree.java:104-160 bbox2CellIds) — the read-side dual
    of the SW-anchored insert rule (``enlarge=True`` picks up features
    stored one tile to the south-west)."""
    out: set[tuple[int, int]] = set()
    for z in range(maxzoom + 1):
        for start, end in xy_bbox2_cell_id_ranges(bbox7, z, enlarge):
            out.update((z, c) for c in range(start, end + 1))
    return out


def xy_id_col(lon7_col, lat7_col, zoom: int):
    """Catalyst Column version of ``xy_id`` — identical semantics (border
    wrap on lon=180, clamp of lat=90 into the northernmost row, -1 for
    out-of-range), expressed with built-in functions only so cell
    assignment runs inside whole-stage codegen (the 100 TB scale path; the
    numpy version serves the pandas kernels)."""
    from pyspark.sql import functions as F

    lon7 = lon7_col if not isinstance(lon7_col, str) else F.col(lon7_col)
    lat7 = lat7_col if not isinstance(lat7_col, str) else F.col(lat7_col)
    bad = (
        (lon7 > _LON_MAX) | (lon7 < -_LON_MAX)
        | (lat7 > _LAT_MAX) | (lat7 < -_LAT_MAX)
    )
    lon = lon7 + F.lit(_LON_MAX)
    lat = lat7 + F.lit(_LAT_MAX)
    lon = F.when(lon == 2 * _LON_MAX, F.lit(0)).otherwise(lon)
    lat = F.when(lat == 2 * _LAT_MAX, lat - 1).otherwise(lat)
    zoom = _clamp_zoom(zoom)
    if zoom <= 10:  # integral width
        w = _N << (10 - zoom)
        cell = F.floor(lat / w) * (1 << zoom) + F.floor(lon / w)
    else:
        # fractional width _N/2^(zoom-10): scaled int64 floor-div stays in
        # codegen and matches the double path exactly (operands < 2^52)
        d = 1 << (zoom - 10)
        cell = F.floor(lat.cast("long") * d / _N) * (1 << zoom) + F.floor(
            lon.cast("long") * d / _N
        )
    return F.when(bad, F.lit(-1)).otherwise(cell).cast("long")


# ---------------------------------------------------------------------------
# Layer 2: Hilbert curve + prefix tokens (vectorized)
# ---------------------------------------------------------------------------

def hilbert_xy2d(level: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert distance of (x,y) on a 2^level x 2^level grid (vectorized).

    Standard iterative rotation algorithm. Hierarchical: the distance at
    level L-1 of a point's parent cell equals (d at level L) >> 2, which is
    what makes token prefixes meaningful.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (level - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_d2xy(level: int, d: int) -> tuple[int, int]:
    """Inverse of hilbert_xy2d for a single distance (scalar; test helper)."""
    t = int(d)
    x = y = 0
    s = 1
    while s < (1 << level):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


_BASE4 = np.array([ord("0"), ord("1"), ord("2"), ord("3")], dtype=np.uint8)


def _d_to_token(d: np.ndarray, level: int) -> np.ndarray:
    """Base-4 digit strings of length `level` (fully vectorized: digit
    matrix → fixed-width bytes view → unicode; no per-row Python)."""
    n = len(d)
    if level == 0:
        return np.full(n, "", dtype=object)
    digits = np.empty((n, level), dtype=np.uint8)
    v = np.asarray(d, dtype=np.int64)
    for i in range(level - 1, -1, -1):
        digits[:, i] = _BASE4[(v & 3).astype(np.int64)]
        v = v >> 2
    flat = np.ascontiguousarray(digits).view(f"S{level}").ravel()
    return flat.astype(f"U{level}").astype(object)


def token_of_points(lon7: np.ndarray, lat7: np.ndarray, level: int) -> np.ndarray:
    """Hilbert cell token per point at a fixed level (vectorized).

    Index space: x = (lon+180)/360 * 2^L, y = (lat+90)/180 * 2^L, with the
    same wrap/clamp border semantics as xy_id.
    """
    lon7 = np.asarray(lon7, dtype=np.int64)
    lat7 = np.asarray(lat7, dtype=np.int64)
    n = np.int64(1) << level
    lon = np.clip(lon7 + _LON_MAX, 0, 2 * _LON_MAX)
    lat = np.clip(lat7 + _LAT_MAX, 0, 2 * _LAT_MAX)
    x = np.minimum(lon * n // (2 * _LON_MAX), n - 1)
    y = np.minimum(lat * n // (2 * _LAT_MAX), n - 1)
    d = hilbert_xy2d(level, x, y)
    return _d_to_token(d, level)


def token_insert_level(
    bbox7_min_lon: np.ndarray,
    bbox7_min_lat: np.ndarray,
    bbox7_max_lon: np.ndarray,
    bbox7_max_lat: np.ndarray,
    maxlevel: int = MAXZOOM,
) -> np.ndarray:
    """Vectorized insert level: deepest level with <=2 covering cells per
    axis (semantics of XYGridTree.getInsertId re-expressed on this grid)."""
    mlon = np.asarray(bbox7_min_lon, dtype=np.int64)
    mlat = np.asarray(bbox7_min_lat, dtype=np.int64)
    xlon = np.asarray(bbox7_max_lon, dtype=np.int64)
    xlat = np.asarray(bbox7_max_lat, dtype=np.int64)
    out = np.zeros(len(mlon), dtype=np.int64)
    for lvl in range(maxlevel, 0, -1):
        n = np.int64(1) << lvl
        cx0 = (mlon + _LON_MAX) * n // (2 * _LON_MAX)
        cx1 = (xlon + _LON_MAX) * n // (2 * _LON_MAX)
        cy0 = (mlat + _LAT_MAX) * n // (2 * _LAT_MAX)
        cy1 = (xlat + _LAT_MAX) * n // (2 * _LAT_MAX)
        fits = (np.maximum(cx1 - cx0, cy1 - cy0) < 2) & (out == 0)
        out = np.where(fits, lvl, out)
        if bool(np.all(out > 0)):
            break
    return out


def token_of_bboxes(
    min_lon7, min_lat7, max_lon7, max_lat7, maxlevel: int = MAXZOOM
) -> np.ndarray:
    """Insert token per bbox: token of the SW corner at the insert level
    (anchoring at SW matches the reference insert rule; covers expand one
    cell SW symmetric to the reference's `enlarge`)."""
    levels = token_insert_level(min_lon7, min_lat7, max_lon7, max_lat7, maxlevel)
    out = np.empty(len(levels), dtype=object)
    for lvl in np.unique(levels):
        m = levels == lvl
        out[m] = token_of_points(
            np.asarray(min_lon7)[m], np.asarray(min_lat7)[m], int(lvl)
        )
    return out


def cover_tokens(
    bbox7: tuple[int, int, int, int],
    level: int,
    enlarge: bool = True,
    maxlevel: int = MAXZOOM,
) -> list[str]:
    """Cell tokens at `level` covering a bbox; with enlarge=True the cover
    is expanded one cell SW so features anchored in the SW-adjacent cell
    are found (reference O2, XYGrid.java:359-367).

    Used to build partition-pruning predicates: a feature stored at token T
    (any level) intersects the bbox only if T is a prefix of one of these
    tokens or one of these tokens is a prefix of T.
    """
    minlon, minlat, maxlon, maxlat = bbox7
    n = 1 << level
    x0 = max(0, min(int((minlon + _LON_MAX) * n // (2 * _LON_MAX)), n - 1))
    x1 = max(0, min(int((maxlon + _LON_MAX) * n // (2 * _LON_MAX)), n - 1))
    y0 = max(0, min(int((minlat + _LAT_MAX) * n // (2 * _LAT_MAX)), n - 1))
    y1 = max(0, min(int((maxlat + _LAT_MAX) * n // (2 * _LAT_MAX)), n - 1))
    if enlarge:
        x0 = max(0, x0 - 1)
        y0 = max(0, y0 - 1)
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    d = hilbert_xy2d(level, xs.ravel(), ys.ravel())
    return sorted(_d_to_token(d, level).tolist())


def _compress_tokens(toks: list[str]) -> list[str]:
    """Merge complete sibling runs into their (shorter) ancestor prefix so
    pruning predicates stay small for large covers."""
    toks = sorted(set(toks))
    changed = True
    while changed:
        changed = False
        out, i = [], 0
        while i < len(toks):
            t = toks[i]
            if len(t) > 0 and i + 3 < len(toks):
                parent = t[:-1]
                sibs = [parent + c for c in "0123"]
                if toks[i : i + 4] == sibs:
                    out.append(parent)
                    i += 4
                    changed = True
                    continue
            out.append(t)
            i += 1
        toks = out
    return toks


def cover_prefixes(bbox7, level: int = 6, enlarge: bool = True) -> list[str]:
    """Compressed cover: merges sibling runs into shorter (ancestor)
    prefixes so the pruning predicate stays small for large AOIs."""
    return _compress_tokens(cover_tokens(bbox7, level, enlarge))


def cover_tokens_polygon(
    pieces, level: int, enlarge: bool = True
) -> list[str]:
    """Cell tokens at `level` whose cells 3-STATE intersect the polygon
    AOI (list of pieces, each a list of degree rings, outer first) — the
    polygon refinement of ``cover_tokens``: for a diagonal or L-shaped
    AOI, the bbox cover scans every cell of the envelope while the
    polygon touches ~half of them; fewer tokens = fewer partitions read.
    Conservative (cells are kept on any contact; exactness is re-checked
    per doc in the kernels). With enlarge=True each kept cell also keeps
    its SW / S / W neighbours so SW-anchored features that reach into an
    intersecting cell are found (same rule as the bbox cover)."""
    from . import clip as C
    from ..kernels.aoi import bbox_vs_polygon

    allr = [r for piece in pieces for r in piece]
    minlon = min(float(np.min(r[:, 0])) for r in allr)
    minlat = min(float(np.min(r[:, 1])) for r in allr)
    maxlon = max(float(np.max(r[:, 0])) for r in allr)
    maxlat = max(float(np.max(r[:, 1])) for r in allr)
    n = 1 << level
    wx = 360.0 / n
    wy = 180.0 / n

    def cx(lon):
        return max(0, min(int((lon + 180.0) / wx), n - 1))

    def cy(lat):
        return max(0, min(int((lat + 90.0) / wy), n - 1))

    x0, x1 = cx(minlon), cx(maxlon)
    y0, y1 = cy(minlat), cy(maxlat)
    mask = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    multi = len(pieces) > 1
    poly = pieces if multi else pieces[0]
    for yi in range(y0, y1 + 1):
        s, no = -90.0 + yi * wy, -90.0 + (yi + 1) * wy
        for xi in range(x0, x1 + 1):
            w, e = -180.0 + xi * wx, -180.0 + (xi + 1) * wx
            if bbox_vs_polygon((w, s, e, no), poly) != 0:
                mask[yi - y0, xi - x0] = True
    if enlarge:
        grown = mask.copy()
        grown[:-1, :] |= mask[1:, :]   # S neighbour of a kept cell
        grown[:, :-1] |= mask[:, 1:]   # W neighbour
        grown[:-1, :-1] |= mask[1:, 1:]  # SW neighbour
        mask = grown
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return []
    d = hilbert_xy2d(level, xs + x0, ys + y0)
    return sorted(_d_to_token(d, level).tolist())


def cover_prefixes_polygon(pieces, level: int = 6, enlarge: bool = True) -> list[str]:
    """Compressed polygon cover (see ``cover_tokens_polygon``)."""
    return _compress_tokens(cover_tokens_polygon(pieces, level, enlarge))


def ring_tokens(token: str, k: int = 1) -> list[str]:
    """Tokens of the (2k+1)^2 neighbourhood of a cell at the same level —
    the kNN cell-ring expansion primitive (ring ≙ XYGrid.getNeighbours,
    XYGrid.java:383-397, generalized to radius k)."""
    level = len(token)
    d = int(token, 4) if token else 0
    x, y = hilbert_d2xy(level, d)
    n = 1 << level
    pts = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            nx, ny = x + dx, y + dy
            if 0 <= ny < n:
                pts.append(((nx % n), ny))  # lon wraps, lat clamps
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    ds = hilbert_xy2d(level, xs, ys)
    return sorted(set(_d_to_token(ds, level).tolist()))


def tile_pyramid(df, lon7_col: str, lat7_col: str, zooms=(6, 4, 2)):
    """Multi-zoom XYGrid tile counts from ONE scan of the input.

    The finest requested zoom is aggregated directly (`xy_id_col`,
    whole-stage codegen); every coarser level is derived by CASCADING the
    previous level's aggregate through the exact parent mapping
    (x >> dz, y >> dz — valid because XYGrid cell widths subdivide by
    powers of two and the lon-wrap/lat-clamp borders land in the same
    cells at every zoom). A z-level tile server answers all zooms while
    the raw table is scanned once; coarser levels aggregate at most
    |tiles(z_prev)| rows. Returns (zoom, cell, cnt); out-of-range points
    keep cell -1 at every zoom (XYGrid.java getId border semantics).
    """
    from pyspark.sql import functions as F

    zs = sorted({_clamp_zoom(z) for z in zooms}, reverse=True)
    z0 = zs[0]
    level = (
        df.withColumn("cell", xy_id_col(lon7_col, lat7_col, z0))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    outs = [level.withColumn("zoom", F.lit(z0))]
    prev_z = z0
    for z in zs[1:]:
        dz = prev_z - z
        x = F.pmod(F.col("cell"), F.lit(1 << prev_z))
        y = (F.col("cell") - x) / F.lit(1 << prev_z)
        parent = (
            F.floor(y / (1 << dz)) * (1 << z) + F.floor(x / (1 << dz))
        ).cast("long")
        level = (
            level.withColumn(
                "cell",
                F.when(F.col("cell") < 0, F.lit(-1)).otherwise(parent),
            )
            .groupBy("cell")
            .agg(F.sum("cnt").alias("cnt"))
        )
        outs.append(level.withColumn("zoom", F.lit(z)))
        prev_z = z
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(F.col("zoom").cast("int"), "cell", "cnt")


def focal_stats(
    df,
    zoom: int,
    cell_col: str = "cell",
    value_col: str = "cnt",
):
    """Sparse-raster 3×3 focal (moving-window) statistics over one XYGrid
    zoom level — the map-algebra neighborhood op (focal mean/sum), the
    raster-side complement of the zonal ops in geo/spatial_join.py.

    Input: one row per PRESENT cell (a sparse raster, e.g. a tile_pyramid
    level). Output: the same cells with `focal_sum` / `focal_n` /
    `focal_mean` over the 3×3 neighborhood, where only PRESENT cells
    contribute (sparse semantics: absent neighbors are no-data, not 0 —
    counts are in `focal_n` so callers wanting zero-fill divide by 9).

    Grid topology follows XYGrid exactly: longitude WRAPS across the
    antimeridian (column -1 ≡ column 2^zoom - 1); latitude rows beyond
    the poles do not exist (no reflection), so polar cells see 6
    neighbors. Cell id -1 (out-of-range marker) passes through with null
    focal columns.

    Plan shape (100 TB raster): each present cell emits 9 (target, value)
    contributions map-side (explode of a 9-element literal array — stays
    in whole-stage codegen), ONE shuffle aggregates them by target, and a
    final equi-join restricts to present cells. No window functions, no
    Python; neighborhood size is a constant, so the shuffle volume is 9×
    the raster — independent of the underlying point data volume.
    """
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    # northernmost existing row (lat=90 clamps into it): derive from the
    # same xy_id arithmetic the assignment used
    y_max = int(
        xy_id(np.array([0]), np.array([_LAT_MAX]), zoom)[0]
    ) // ncols

    src = df.select(F.col(cell_col).alias("_c"), F.col(value_col).alias("_v"))
    valid = src.filter(F.col("_c") >= 0)
    x = F.pmod(F.col("_c"), F.lit(ncols))
    y = F.floor(F.col("_c") / F.lit(ncols))
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    contrib = (
        valid.select("_c", "_v", x.alias("_x"), y.alias("_y"),
                     offs.alias("_o"))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") <= y_max))
        .select(
            (
                F.col("_ny") * ncols
                + F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(ncols))
            ).alias("_t"),
            "_v",
        )
    )
    agg = contrib.groupBy("_t").agg(
        F.sum("_v").alias("focal_sum"),
        F.count(F.lit(1)).alias("focal_n"),
    )
    out = src.join(agg, src["_c"] == agg["_t"], "left").select(
        F.col("_c").alias(cell_col),
        F.col("_v").alias(value_col),
        "focal_sum",
        "focal_n",
        F.round(
            F.col("focal_sum") / F.col("focal_n"), 6
        ).alias("focal_mean"),
    )
    return out


def hotspot_gi_star(
    df,
    zoom: int,
    cell_col: str = "cell",
    value_col: str = "cnt",
):
    """Getis-Ord Gi* hot/cold-spot z-scores over a sparse cell raster —
    the classic local spatial-autocorrelation statistic (queen 3x3
    neighborhood INCLUDING self, binary weights), computed on top of
    focal_stats' sparse semantics (absent cells are no-data; global
    moments run over PRESENT cells only).

    Formulated so every aggregate is an exact int64 (the N in
    numerator/denominator cancels):

        gi* = (N*focal_sum - S*n_i)
              / ( sqrt(N*S2 - S^2) * sqrt((N*n_i - n_i^2)/(N-1)) )

    with S = sum(v), S2 = sum(v^2), n_i = present 3x3 neighbor count.
    All float ops (two sqrt, one mult, one div) consume identical
    integers, so the statistic is bit-reproducible across engines
    before the final round(6).

    Plan shape: focal_stats' one 9x shuffle + ONE broadcast 1-row
    global-moment join + codegen arithmetic. Degenerate rasters
    (constant value -> sd 0, or n_i == N on a fully-connected toy grid)
    yield null/inf — callers filter. Returns (cell, value, gi_star)."""
    from pyspark.sql import functions as F

    foc = focal_stats(df, zoom, cell_col, value_col)
    src = df.select(
        F.col(cell_col).alias("_c"), F.col(value_col).alias("_v")
    ).filter(F.col("_c") >= 0)
    g = src.agg(
        F.count(F.lit(1)).alias("_gn"),
        F.sum("_v").alias("_gs"),
        F.sum(F.col("_v") * F.col("_v")).alias("_gs2"),
    )
    out = foc.crossJoin(F.broadcast(g))
    num = (
        F.col("_gn") * F.col("focal_sum") - F.col("_gs") * F.col("focal_n")
    ).cast("double")
    b = F.sqrt(
        (F.col("_gn") * F.col("_gs2") - F.col("_gs") * F.col("_gs"))
        .cast("double")
    )
    c = F.sqrt(
        (
            F.col("_gn") * F.col("focal_n")
            - F.col("focal_n") * F.col("focal_n")
        ).cast("double")
        / (F.col("_gn") - F.lit(1)).cast("double")
    )
    return out.select(
        cell_col,
        value_col,
        F.round(num / (b * c), 6).alias("gi_star"),
    )


def moran_i(
    df,
    zoom: int,
    cell_col: str = "cell",
    value_col: str = "cnt",
):
    """Global Moran's I spatial autocorrelation over a sparse cell
    raster (queen 3x3 neighborhood EXCLUDING self, binary weights,
    sparse/no-data semantics like focal_stats).

    Integer-exact formulation (multiply z-scores through by N so every
    aggregate is an int64; the N^2 cancels):

        Z_i = N*v_i - S
        Y_i = N*(focal_sum_i - v_i) - (focal_n_i - 1)*S
        I   = N * sum(Z*Y) / ( W * sum(Z*Z) ),   W = sum(focal_n - 1)

    The three sums are exact int64 on both engines (DuckDB HUGEINT sums
    cast back), so I is bit-reproducible before the final round(9).
    Returns ONE row: (n_cells, w_pairs, moran_i)."""
    from pyspark.sql import functions as F

    foc = focal_stats(df, zoom, cell_col, value_col)
    src = df.select(
        F.col(cell_col).alias("_c"), F.col(value_col).alias("_v")
    ).filter(F.col("_c") >= 0)
    g = src.agg(
        F.count(F.lit(1)).alias("_gn"), F.sum("_v").alias("_gs")
    )
    j = foc.crossJoin(F.broadcast(g))
    z = F.col("_gn") * F.col(value_col) - F.col("_gs")
    y = (
        F.col("_gn") * (F.col("focal_sum") - F.col(value_col))
        - (F.col("focal_n") - F.lit(1)) * F.col("_gs")
    )
    agg = j.select(
        (z * y).alias("_zy"),
        (z * z).alias("_zz"),
        (F.col("focal_n") - F.lit(1)).alias("_w"),
        "_gn",
    ).groupBy("_gn").agg(
        F.sum("_zy").alias("_szy"),
        F.sum("_zz").alias("_szz"),
        F.sum("_w").alias("_sw"),
    )
    return agg.select(
        F.col("_gn").alias("n_cells"),
        F.col("_sw").alias("w_pairs"),
        F.round(
            (F.col("_gn").cast("double") * F.col("_szy").cast("double"))
            / (F.col("_sw").cast("double") * F.col("_szz").cast("double")),
            9,
        ).alias("moran_i"),
    )


def slope_aspect(
    df,
    zoom: int,
    cell_col: str = "cell",
    value_col: str = "cnt",
):
    """Horn's-method slope/aspect over a sparse cell raster — the
    gradient map-algebra op (ArcGIS Slope/Aspect) on any value surface
    the engine produces (KDE density, IDW interpolation, count
    rasters). Absent neighbors contribute 0 (a count surface falls to
    zero off-support); grid topology is focal_stats': longitude wraps,
    latitude clamps at the poles (missing polar rows also 0).

    With the 3×3 window labeled a..i (a = NW, i = SE, +y = north):

        gx = (c + 2f + i) − (a + 2d + g)      (east gradient × 8)
        gy = (a + 2b + c) − (g + 2h + i)      (north gradient × 8)
        slope  = atan(sqrt(gx² + gy²) / 8)    (cell spacing = 1 unit)
        aspect = atan2(gy, gx)                (math convention, CCW
                                               from east; null on flat)

    gx/gy are exact int64 on both engines; only atan/atan2/sqrt are
    float, from identical inputs, round(6).

    Plan shape: ONE 9× codegen explode + ONE target aggregate with
    per-direction conditional sums (no 8-way self-join), inner join
    back to present cells — the focal_stats cost with a 9-branch CASE.
    Returns (cell, value, gx, gy, slope_deg, aspect_deg)."""
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    y_max = int(
        xy_id(np.array([0]), np.array([_LAT_MAX]), zoom)[0]
    ) // ncols

    src = df.select(
        F.col(cell_col).alias("_c"), F.col(value_col).alias("_v")
    ).filter(F.col("_c") >= 0)
    x = F.pmod(F.col("_c"), F.lit(ncols))
    y = F.floor(F.col("_c") / F.lit(ncols))
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    contrib = (
        src.select("_c", "_v", x.alias("_x"), y.alias("_y"),
                   offs.alias("_o"))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") <= y_max))
        .select(
            (
                F.col("_ny") * ncols
                + F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(ncols))
            ).alias("_t"),
            # direction of THIS contributor as seen FROM the target
            (-F.col("_o.dx")).alias("_rdx"),
            (-F.col("_o.dy")).alias("_rdy"),
            "_v",
        )
    )

    def _s(dx, dy):
        return F.coalesce(
            F.sum(
                F.when(
                    (F.col("_rdx") == dx) & (F.col("_rdy") == dy),
                    F.col("_v"),
                )
            ),
            F.lit(0),
        )

    # a..i with +y = north: a = (-1, +1) ... i = (+1, -1)
    agg = contrib.groupBy("_t").agg(
        (
            (_s(1, 1) + 2 * _s(1, 0) + _s(1, -1))
            - (_s(-1, 1) + 2 * _s(-1, 0) + _s(-1, -1))
        ).alias("gx"),
        (
            (_s(-1, 1) + 2 * _s(0, 1) + _s(1, 1))
            - (_s(-1, -1) + 2 * _s(0, -1) + _s(1, -1))
        ).alias("gy"),
    )
    out = src.join(agg, src["_c"] == agg["_t"])
    gxd, gyd = F.col("gx").cast("double"), F.col("gy").cast("double")
    return out.select(
        F.col("_c").alias(cell_col),
        F.col("_v").alias(value_col),
        "gx",
        "gy",
        F.round(
            F.degrees(
                F.atan(F.sqrt(gxd * gxd + gyd * gyd) / 8.0)
            ),
            6,
        ).alias("slope_deg"),
        F.when(
            (F.col("gx") != 0) | (F.col("gy") != 0),
            F.round(F.degrees(F.atan2(gyd, gxd)), 6),
        ).alias("aspect_deg"),
    )


def local_moran(
    df,
    zoom: int,
    cell_col: str = "cell",
    value_col: str = "cnt",
):
    """Local Moran's I (Anselin 1995 LISA) per cell over a sparse cell
    raster — the cluster/outlier classifier that complements the global
    `moran_i` score and the `hotspot_gi_star` z-scores: each cell gets
    its own autocorrelation term plus the HH/LL/HL/LH quadrant label
    (queen 3x3 neighborhood EXCLUDING self, binary weights, sparse
    no-data semantics like focal_stats).

    Integer-exact formulation (multiply z-scores through by N; the
    normalizations cancel into one N factor):

        Z_i = N*v_i - S                      (= N * (v_i - mean))
        Y_i = N*(focal_sum_i - v_i) - (focal_n_i - 1)*S
        I_i = Z_i * Y_i * N / SZZ,   SZZ = sum(Z^2)

    Z, Y, SZZ are exact int64 aggregates on both engines; the final
    double arithmetic is ((Z*Y)*N)/SZZ in that association order, so
    I_i is bit-reproducible before round(6). Quadrants use exact
    integer sign tests (Z>0 & Y>0 -> 'HH', ... ; any zero -> 'NA').
    Isolated cells (no present neighbors) have Y = 0 -> 'NA'.

    Plan shape: focal_stats' one 9x shuffle + a broadcast 1-row global
    moment join (N, S, SZZ) + codegen arithmetic — same cost as
    hotspot_gi_star. Constant rasters (SZZ = 0) yield null I — callers
    filter. Returns (cell, value, local_i, quadrant)."""
    from pyspark.sql import functions as F

    foc = focal_stats(df, zoom, cell_col, value_col)
    src = df.select(
        F.col(cell_col).alias("_c"), F.col(value_col).alias("_v")
    ).filter(F.col("_c") >= 0)
    g1 = src.agg(
        F.count(F.lit(1)).alias("_gn"), F.sum("_v").alias("_gs")
    )
    g = (
        src.crossJoin(F.broadcast(g1))
        .select(
            "_gn", "_gs",
            (F.col("_gn") * F.col("_v") - F.col("_gs")).alias("_z"),
        )
        .groupBy("_gn", "_gs")
        .agg(F.sum(F.col("_z") * F.col("_z")).alias("_szz"))
    )
    j = foc.crossJoin(F.broadcast(g))
    z = F.col("_gn") * F.col(value_col) - F.col("_gs")
    y = (
        F.col("_gn") * (F.col("focal_sum") - F.col(value_col))
        - (F.col("focal_n") - F.lit(1)) * F.col("_gs")
    )
    quad = (
        F.when((z > 0) & (y > 0), "HH")
        .when((z < 0) & (y < 0), "LL")
        .when((z > 0) & (y < 0), "HL")
        .when((z < 0) & (y > 0), "LH")
        .otherwise("NA")
    )
    return j.select(
        cell_col,
        value_col,
        F.round(
            z.cast("double") * y.cast("double")
            * F.col("_gn").cast("double") / F.col("_szz").cast("double"),
            6,
        ).alias("local_i"),
        quad.alias("quadrant"),
    )


def kde_heatmap(
    df,
    zoom: int,
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    weight_col: str | None = None,
    sigma_cells: float = 0.75,
    radius_cells: int = 2,
):
    """Gaussian kernel-density heatmap: vector points → smoothed sparse
    raster at one XYGrid zoom level — the density-surface op ("where is
    activity concentrated") that zonal/focal stats don't cover: zonal
    sums need zones, focal stats need an existing raster; this goes
    straight from a point table to a smoothed surface.

    Each point at continuous grid position (px, py) = ((lon7+180e7)/w,
    (lat7+90e7)/w) contributes weight * exp(-d² / (2σ²)) to every cell
    center within the (2R+1)² Chebyshev box around its own cell, with
    d the EUCLIDEAN distance in grid units to the cell center — a
    planar kernel on the grid, the usual heatmap-tile definition (the
    geodesic-exact density op is zonal_aggregate over buffered AOIs).
    Contributions falling outside the grid (beyond the poles / the
    antimeridian) are dropped, not wrapped.

    Determinism contract: each contribution is quantized to integer
    MICRO-units — cast(round(w * exp(...) * 1e6) as bigint) — BEFORE
    the sum, so the per-cell total is an exact integer sum, invariant
    to partitioning / summation order and engine (the only float terms
    are one exp and one round per contribution; DuckDB replays them
    bit-equal at 1e-6 quantization).

    Plan shape (100 TB): the fan-out is a constant (2R+1)² explode of a
    literal offset array inside whole-stage codegen (no join against a
    kernel table), followed by ONE partial+final hash aggregate on the
    target cell — shuffle volume is (2R+1)² × points pre-combine and
    ≤ grid-size post-combine; no window, no Python, no skew key (cell
    ids at heatmap zooms are low-cardinality and the partial agg
    absorbs hot tiles map-side).

    Output: cell_x, cell_y (long), density_micro (long — exact integer
    micro-units), contribs (long)."""
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    nrows = max(ncols // 2, 1)
    wd = 3_600_000_000.0 / ncols
    two_s2 = 2.0 * sigma_cells * sigma_cells
    R = int(radius_cells)

    px = (F.col(lon7_col).cast("double") + F.lit(float(_LON_MAX))) / F.lit(wd)
    py = (F.col(lat7_col).cast("double") + F.lit(float(_LAT_MAX))) / F.lit(wd)
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dy in range(-R, R + 1)
            for dx in range(-R, R + 1)
        )
        + "))"
    )
    base = df.select(
        px.alias("_px"), py.alias("_py"), w.alias("_w"),
        F.floor(px).cast("long").alias("_cx"),
        F.floor(py).cast("long").alias("_cy"),
    ).select("_px", "_py", "_w", "_cx", "_cy", offs.alias("_o"))
    nx = F.col("_cx") + F.col("_o.dx")
    ny = F.col("_cy") + F.col("_o.dy")
    dx = F.col("_px") - (nx.cast("double") + F.lit(0.5))
    dy = F.col("_py") - (ny.cast("double") + F.lit(0.5))
    micro = F.round(
        F.col("_w") * F.exp(-(dx * dx + dy * dy) / F.lit(two_s2)) * 1e6, 0
    ).cast("long")
    return (
        base.withColumn("_nx", nx)
        .withColumn("_ny", ny)
        .filter(
            (F.col("_nx") >= 0) & (F.col("_nx") < ncols)
            & (F.col("_ny") >= 0) & (F.col("_ny") < nrows)
        )
        .select("_nx", "_ny", micro.alias("_m"))
        .groupBy(F.col("_nx").alias("cell_x"), F.col("_ny").alias("cell_y"))
        .agg(
            F.sum("_m").alias("density_micro"),
            F.count(F.lit(1)).alias("contribs"),
        )
    )


def idw_surface(
    df,
    zoom: int,
    value_col: str,
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    radius_cells: int = 2,
    eps: float = 1e-6,
):
    """Inverse-distance-weighted interpolation: scattered sample points →
    a sparse estimated surface at one XYGrid zoom level — the
    interpolation member of the raster↔vector family (zonal = aggregate
    into zones, focal = smooth a raster, kde = density of points, idw =
    estimate a VALUE field from samples).

    Each sample at continuous grid position (px, py) contributes to
    every cell center within its (2R+1)² Chebyshev box with the
    smoothed-IDW weight w = 1 / (d² + eps) (d in grid units — eps
    regularizes the on-node singularity, making the weight a total
    function with no special case); the cell estimate is
    Σ v·w / Σ w over contributing samples. Cells no sample box covers
    are absent (sparse semantics — callers wanting a full surface can
    raise R or run at a coarser zoom).

    Determinism contract: both the weight and the value·weight terms
    are quantized to integer MICRO-units before the sums (w ≤ 1/eps so
    w·1e6 ≤ 1e12 fits int64 with room for ~10^6 samples per cell), so
    numerator and denominator are exact order-invariant BIGINTs; the
    single float division happens once per OUTPUT cell and is rounded
    to 6 decimals.

    Plan shape (100 TB): identical to kde_heatmap — constant-size
    literal-offset explode in whole-stage codegen, ONE partial+final
    hash aggregate on the target cell; no joins, no window, no Python.

    Output: cell_x, cell_y (long), n_samples (long), idw_value
    (double, round-6)."""
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    nrows = max(ncols // 2, 1)
    wd = 3_600_000_000.0 / ncols
    R = int(radius_cells)

    px = (F.col(lon7_col).cast("double") + F.lit(float(_LON_MAX))) / F.lit(wd)
    py = (F.col(lat7_col).cast("double") + F.lit(float(_LAT_MAX))) / F.lit(wd)
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dy in range(-R, R + 1)
            for dx in range(-R, R + 1)
        )
        + "))"
    )
    base = df.select(
        px.alias("_px"), py.alias("_py"),
        F.col(value_col).cast("double").alias("_v"),
        F.floor(px).cast("long").alias("_cx"),
        F.floor(py).cast("long").alias("_cy"),
    ).select("_px", "_py", "_v", "_cx", "_cy", offs.alias("_o"))
    nx = F.col("_cx") + F.col("_o.dx")
    ny = F.col("_cy") + F.col("_o.dy")
    dx = F.col("_px") - (nx.cast("double") + F.lit(0.5))
    dy = F.col("_py") - (ny.cast("double") + F.lit(0.5))
    w = F.lit(1.0) / (dx * dx + dy * dy + F.lit(float(eps)))
    w_q = F.round(w * 1e6, 0).cast("long")
    vw_q = F.round(F.col("_v") * w * 1e6, 0).cast("long")
    return (
        base.withColumn("_nx", nx)
        .withColumn("_ny", ny)
        .filter(
            (F.col("_nx") >= 0) & (F.col("_nx") < ncols)
            & (F.col("_ny") >= 0) & (F.col("_ny") < nrows)
        )
        .select("_nx", "_ny", w_q.alias("_wq"), vw_q.alias("_vwq"))
        .groupBy(F.col("_nx").alias("cell_x"), F.col("_ny").alias("cell_y"))
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("_vwq").alias("_num"),
            F.sum("_wq").alias("_den"),
        )
        .select(
            "cell_x", "cell_y", "n_samples",
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"),
                6,
            ).alias("idw_value"),
        )
    )


def spacetime_gi_star(
    df,
    zoom: int,
    cell_col: str = "cell",
    t_col: str = "t",
    value_col: str = "cnt",
):
    """Space-time Getis-Ord Gi* over a sparse (cell, time-bin) CUBE —
    the "emerging hot spot" analytic: the 2-D hotspot_gi_star
    neighborhood extended to 3×3×3 (queen spatial ring × {t-1, t, t+1},
    INCLUDING self, binary weights), sparse semantics throughout
    (absent bins are no-data, not zero; global moments run over PRESENT
    bins only). Longitude wraps, latitude rows clamp at the poles, time
    does not wrap.

    Same integer-exact formulation as hotspot_gi_star — every aggregate
    (focal sum/count per bin, global N/S/S2) is an exact int64, so the
    z-score is bit-reproducible across engines before the final
    round(6).

    Plan shape (100 TB): each present bin emits 27 contributions via a
    literal-offset codegen explode, ONE partial+final agg on the target
    bin, one inner join back to present bins (both sides already
    hash-partitioned on the bin key), ONE broadcast 1-row global-moment
    join. Shuffle volume is 27× the CUBE (bins, not raw points) —
    independent of the underlying event volume.

    Returns (cell, t, value, gi_star)."""
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    y_max = int(
        xy_id(np.array([0]), np.array([_LAT_MAX]), zoom)[0]
    ) // ncols

    src = df.select(
        F.col(cell_col).alias("_c"),
        F.col(t_col).alias("_t"),
        F.col(value_col).alias("_v"),
    ).filter(F.col("_c") >= 0)
    x = F.pmod(F.col("_c"), F.lit(ncols))
    y = F.floor(F.col("_c") / F.lit(ncols))
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy}, 'dt', {dt})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dt in (-1, 0, 1)
        )
        + "))"
    )
    contrib = (
        src.select("_c", "_t", "_v", x.alias("_x"), y.alias("_y"),
                   offs.alias("_o"))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") <= y_max))
        .select(
            (
                F.col("_ny") * ncols
                + F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(ncols))
            ).alias("_tc"),
            (F.col("_t") + F.col("_o.dt")).alias("_tt"),
            "_v",
        )
    )
    agg = contrib.groupBy("_tc", "_tt").agg(
        F.sum("_v").alias("_sf"),
        F.count(F.lit(1)).alias("_nf"),
    )
    g = src.agg(
        F.count(F.lit(1)).alias("_gn"),
        F.sum("_v").alias("_gs"),
        F.sum(F.col("_v") * F.col("_v")).alias("_gs2"),
    )
    out = (
        src.join(
            agg,
            (src["_c"] == agg["_tc"]) & (src["_t"] == agg["_tt"]),
        )
        .crossJoin(F.broadcast(g))
    )
    num = (F.col("_gn") * F.col("_sf") - F.col("_gs") * F.col("_nf")).cast(
        "double"
    )
    b = F.sqrt(
        (F.col("_gn") * F.col("_gs2") - F.col("_gs") * F.col("_gs"))
        .cast("double")
    )
    c = F.sqrt(
        (F.col("_gn") * F.col("_nf") - F.col("_nf") * F.col("_nf"))
        .cast("double")
        / (F.col("_gn") - F.lit(1)).cast("double")
    )
    return out.select(
        F.col("_c").alias(cell_col),
        F.col("_t").alias(t_col),
        F.col("_v").alias(value_col),
        F.round(num / (b * c), 6).alias("gi_star"),
    )


def mann_kendall_trend(
    df,
    cell_col: str = "cell",
    t_col: str = "t",
    value_col: str = "cnt",
    z_crit: float = 1.959964,
):
    """Mann–Kendall monotonic-trend test per cell over a sparse
    (cell, time-bin) cube — the trend half of the "emerging hot spot"
    analytic (spacetime_gi_star scores WHERE activity clusters; this
    scores WHETHER each cell's series is rising or falling):

        S     = sum over bin pairs i<j of sign(v_j - v_i)
        var18 = n(n-1)(2n+5) - sum over tie groups t(t-1)(2t+5)
        z     = (S -/+ 1) / sqrt(var18 / 18)   (0 when S = 0)

    S, n, and var18 are exact int64 on both engines (counts, signs and
    the tie polynomial are pure integers), so z is bit-reproducible
    before round(6). `trend` labels 'increasing' / 'decreasing' when
    |z| exceeds ``z_crit`` (default two-sided 95%), else 'none'; cells
    with a single bin get S = 0 -> z = 0 -> 'none'. S != 0 implies an
    untied pair, so var18 > 0 whenever the z branch divides.

    Plan shape (100 TB): the input is the PRE-AGGREGATED cube (bins,
    not raw events), so the pair self-join on the cell key is T^2/2
    rows per cell with T calendar-bounded (weeks in the corpus) and
    independent of event volume; one shuffle for the join, two tiny
    per-cell aggregates, all codegen. Returns
    (cell, n_bins, s_stat, var18, z, trend)."""
    from pyspark.sql import functions as F

    src = df.select(
        F.col(cell_col).alias("_c"),
        F.col(t_col).alias("_t"),
        F.col(value_col).alias("_v"),
    ).filter(F.col("_c") >= 0)
    a, b = src.alias("a"), src.alias("b")
    s = (
        a.join(
            b,
            (F.col("a._c") == F.col("b._c"))
            & (F.col("b._t") > F.col("a._t")),
        )
        .groupBy(F.col("a._c").alias("_c"))
        .agg(
            F.sum(
                F.signum(
                    (F.col("b._v") - F.col("a._v")).cast("double")
                ).cast("long")
            ).alias("_s")
        )
    )
    n = src.groupBy("_c").agg(F.count(F.lit(1)).alias("_n"))
    ties = (
        src.groupBy("_c", "_v")
        .agg(F.count(F.lit(1)).alias("_tg"))
        .groupBy("_c")
        .agg(
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1)
                * (2 * F.col("_tg") + 5)
            ).alias("_tt")
        )
    )
    j = (
        n.join(ties, "_c")
        .join(s, "_c", "left")
        .withColumn("_s", F.coalesce(F.col("_s"), F.lit(0)))
        .withColumn(
            "_var18",
            F.col("_n") * (F.col("_n") - 1) * (2 * F.col("_n") + 5)
            - F.col("_tt"),
        )
    )
    z = (
        F.when(F.col("_s") > 0,
               (F.col("_s") - 1).cast("double")
               / F.sqrt(F.col("_var18").cast("double") / 18.0))
        .when(F.col("_s") < 0,
              (F.col("_s") + 1).cast("double")
              / F.sqrt(F.col("_var18").cast("double") / 18.0))
        .otherwise(F.lit(0.0))
    )
    trend = (
        F.when((z > z_crit), "increasing")
        .when((z < -z_crit), "decreasing")
        .otherwise("none")
    )
    return j.select(
        F.col("_c").alias(cell_col),
        F.col("_n").alias("n_bins"),
        F.col("_s").alias("s_stat"),
        F.col("_var18").alias("var18"),
        F.round(z, 6).alias("z"),
        trend.alias("trend"),
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_terms(precision: int):
    """(lonbits, latbits, per-character bit picks) for a geohash of
    ``precision`` base-32 characters. The bit stream is MSB-first with
    longitude on even stream positions (the geohash standard); character
    i covers stream bits 5i..5i+4. Each pick is (is_lon, shift): the
    source-integer right-shift that isolates that stream bit."""
    n = 5 * int(precision)
    lonbits = (n + 1) // 2
    latbits = n // 2
    chars = []
    for i in range(precision):
        picks = []
        for k in range(5):
            b = 5 * i + k  # stream position, MSB-first
            if b % 2 == 0:
                picks.append((True, lonbits - 1 - b // 2))
            else:
                picks.append((False, latbits - 1 - (b - 1) // 2))
        chars.append(picks)
    return lonbits, latbits, chars


def geohash_col(lon7_col, lat7_col, precision: int = 6):
    """Standard base-32 geohash string of a fixed-point coordinate as a
    pure-Catalyst expression — the interchange encoding the rest of the
    geo ecosystem speaks (Elasticsearch, Redis, Uber's H3 migration
    guides all accept geohash cells). Everything is int64 arithmetic
    (scaled floor-div for the cell indices — inputs stay < 2^63, no
    double rounding anywhere), so the value is bit-reproducible across
    engines and partitionings; runs inside whole-stage codegen like
    xy_id_col.

    Convention parity with the reference geohash: bit stream MSB-first,
    longitude first (even positions), cell index = binary subdivision of
    [-180, 180] / [-90, 90]; the east/north edges (lon = 180, lat = 90)
    clamp into the last cell. Precision ≤ 12 (60 bits)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    lon_e = lon7_col if isinstance(lon7_col, str) else lon7_col._jc.toString()
    lat_e = lat7_col if isinstance(lat7_col, str) else lat7_col._jc.toString()
    lonbits, latbits, chars = _geohash_terms(precision)
    # scaled int64 floor-div cell indices; (3.6e9 << 30) < 2^63 so the
    # intermediate never overflows at precision 12
    ix = (
        f"(least((({lon_e}) + {_LON_MAX}) * {1 << lonbits} "
        f"div {2 * _LON_MAX}, {(1 << lonbits) - 1}))"
    )
    iy = (
        f"(least((({lat_e}) + {_LAT_MAX}) * {1 << latbits} "
        f"div {2 * _LAT_MAX}, {(1 << latbits) - 1}))"
    )
    parts = []
    for picks in chars:
        bits = []
        for k, (is_lon, shift) in enumerate(picks):
            src = ix if is_lon else iy
            bits.append(f"((shiftright({src}, {shift}) & 1) * {1 << (4 - k)})")
        parts.append(
            f"substr('{_GEOHASH32}', cast({' + '.join(bits)} as int) + 1, 1)"
        )
    from pyspark.sql import functions as F

    return F.expr(f"concat({', '.join(parts)})")


# ---------------------------------------------------------------------------
# raster → vector: marching-squares contour extraction
# ---------------------------------------------------------------------------

def _ms_edge_points(x: str, y: str, t: str):
    """SQL (dialect-common: Spark AND DuckDB) for the four edge crossing
    points of a marching-squares block anchored at integer lattice
    (x, y) with corner values v00 (at x,y), v10 (x+1,y), v11 (x+1,y+1),
    v01 (x,y+1). Linear interpolation; a crossing's denominator is
    nonzero whenever the crossing exists (the corners straddle t)."""
    fB = f"(({t} - v00) / (v10 - v00))"
    fR = f"(({t} - v10) / (v11 - v10))"
    fT = f"(({t} - v01) / (v11 - v01))"
    fL = f"(({t} - v00) / (v01 - v00))"
    return {
        "B": (f"({x} + {fB})", f"CAST({y} AS DOUBLE)"),
        "R": (f"({x} + 1.0)", f"({y} + {fR})"),
        "T": (f"({x} + {fT})", f"({y} + 1.0)"),
        "L": (f"CAST({x} AS DOUBLE)", f"({y} + {fL})"),
    }


# case index = (v00>t) + 2*(v10>t) + 4*(v11>t) + 8*(v01>t); slot → the
# edge pair whose crossing points the segment connects. Ambiguous saddles
# (5, 10) resolve by the center average (> t joins the diagonal corners)
# — one fixed convention shared by engine and oracle.
_MS_SLOT1 = {1: ("L", "B"), 2: ("B", "R"), 3: ("L", "R"), 4: ("T", "R"),
             6: ("B", "T"), 7: ("L", "T"), 8: ("L", "T"), 9: ("B", "T"),
             11: ("T", "R"), 12: ("L", "R"), 13: ("B", "R"), 14: ("L", "B")}
_MS_AMBIG = {  # case -> ((center>t slot1, slot2), (else slot1, slot2))
    5: ((("L", "T"), ("B", "R")), (("L", "B"), ("T", "R"))),
    10: ((("L", "B"), ("T", "R")), (("L", "T"), ("B", "R"))),
}


def marching_squares_slot_sql(slot: int, x: str = "x", y: str = "y",
                              t: str = "t"):
    """(x0, y0, x1, y1) SQL expressions for segment slot 1 or 2 of a
    marching-squares block — NULL when the case emits no segment in this
    slot. The text is dialect-common (CASE/arithmetic/CAST only), so the
    ENGINE runs it via F.expr and the DuckDB ORACLE embeds the identical
    string: both compute the same doubles by construction."""
    pts = _ms_edge_points(x, y, t)
    center = f"((v00 + v10 + v11 + v01) / 4.0 > {t})"
    out = []
    for coord in range(4):  # x0, y0, x1, y1
        branches = []
        for case in range(1, 15):
            if case in _MS_AMBIG:
                hi, lo = _MS_AMBIG[case]
                pair_hi = hi[slot - 1]
                pair_lo = lo[slot - 1]
                e_hi = pts[pair_hi[coord // 2]][coord % 2]
                e_lo = pts[pair_lo[coord // 2]][coord % 2]
                expr = f"CASE WHEN {center} THEN {e_hi} ELSE {e_lo} END"
            elif slot == 1 and case in _MS_SLOT1:
                pair = _MS_SLOT1[case]
                expr = pts[pair[coord // 2]][coord % 2]
            else:
                continue
            branches.append(f"WHEN ms_case = {case} THEN {expr}")
        out.append("CASE " + " ".join(branches) + " ELSE NULL END")
    return tuple(out)


def contour_segments(
    raster: "DataFrame",
    zoom: int,
    thresholds: list[int],
    cell_col: str = "cell",
    value_col: str = "v",
) -> "DataFrame":
    """Marching-squares contour extraction over an XYGrid cell raster —
    the raster→vector counterpart of the zonal/KDE raster ops: for each
    threshold level, the iso-line segments separating cells above the
    level from cells at-or-below it. Returns one row per (level, block,
    slot) segment with lattice endpoints, degree endpoints, and the
    mm-quantized equirectangular length.

    Shape: one 4-way corner explode + ONE partial+final aggregate builds
    every 2×2 sample block (absent cells are value 0, so contours close
    at the data boundary); levels fan out as a literal explode; the
    segment arithmetic is a dialect-common SQL fragment
    (marching_squares_slot_sql) the DuckDB oracle embeds verbatim. No
    joins anywhere — blocks assemble by aggregation, not self-joins."""
    from pyspark.sql import functions as F

    ncols = 1 << zoom
    w = 360.0 / ncols
    pts = raster.select(
        (F.col(cell_col) % ncols).alias("cx"),
        (F.col(cell_col) / ncols).cast("long").alias("cy"),
        F.col(value_col).cast("long").alias("v"),
    )
    corners = pts.select(
        F.explode(
            F.expr(
                "array(named_struct('gx', cx,     'gy', cy,     'c', 0),"
                "      named_struct('gx', cx - 1, 'gy', cy,     'c', 1),"
                "      named_struct('gx', cx,     'gy', cy - 1, 'c', 2),"
                "      named_struct('gx', cx - 1, 'gy', cy - 1, 'c', 3))"
            )
        ).alias("k"),
        "v",
    ).select("k.gx", "k.gy", "k.c", "v")
    blocks = corners.groupBy("gx", "gy").agg(
        F.coalesce(F.max(F.when(F.col("c") == 0, F.col("v"))), F.lit(0)).alias("v00"),
        F.coalesce(F.max(F.when(F.col("c") == 1, F.col("v"))), F.lit(0)).alias("v10"),
        F.coalesce(F.max(F.when(F.col("c") == 2, F.col("v"))), F.lit(0)).alias("v01"),
        F.coalesce(F.max(F.when(F.col("c") == 3, F.col("v"))), F.lit(0)).alias("v11"),
    )
    lv = blocks.select(
        "*", F.explode(F.array(*[F.lit(int(t)) for t in thresholds])).alias("t")
    ).withColumn(
        "ms_case",
        F.expr(
            "CAST(v00 > t AS INT) + 2 * CAST(v10 > t AS INT)"
            " + 4 * CAST(v11 > t AS INT) + 8 * CAST(v01 > t AS INT)"
        ),
    )
    slots = []
    for slot in (1, 2):
        sx0, sy0, sx1, sy1 = marching_squares_slot_sql(slot, x="gx", y="gy")
        slots.append(
            lv.select(
                F.col("t").alias("level"), "gx", "gy",
                F.lit(slot).alias("slot"),
                F.expr(sx0).alias("lx0"), F.expr(sy0).alias("ly0"),
                F.expr(sx1).alias("lx1"), F.expr(sy1).alias("ly1"),
            ).filter(F.col("lx0").isNotNull())
        )
    seg = slots[0].unionByName(slots[1])
    # lattice → degrees: sample points sit at cell CENTERS of the zoom
    # grid (x+0.5, y+0.5 cells from the (-180, -90) origin)
    for lat_c, lon_c, src_x, src_y in (
        ("y0d", "x0d", "lx0", "ly0"), ("y1d", "x1d", "lx1", "ly1"),
    ):
        seg = seg.withColumn(
            lon_c, F.lit(-180.0) + (F.col(src_x) + 0.5) * F.lit(w)
        ).withColumn(lat_c, F.lit(-90.0) + (F.col(src_y) + 0.5) * F.lit(w))
    dla = F.radians(F.col("y1d") - F.col("y0d"))
    dln = F.radians(F.col("x1d") - F.col("x0d")) * F.cos(
        F.radians((F.col("y0d") + F.col("y1d")) / 2.0)
    )
    return seg.withColumn(
        "len_mm",
        F.round(
            F.lit(6371000.0) * F.sqrt(dla * dla + dln * dln) * 1000.0, 0
        ).cast("long"),
    ).drop("lx0", "ly0", "lx1", "ly1")


# ---------------------------------------------------------------------------
# Hexagonal binning (H3-style aggregation cells) and Voronoi assignment
# ---------------------------------------------------------------------------


def hex_height7(width7: int) -> int:
    """Default hex-lattice vertical spacing: the even rounding of
    √3·w. Two interleaved rectangular lattices (i·w, j·h) and
    ((i+½)·w, (j+½)·h) have REGULAR pointy-top hexagonal Voronoi cells
    exactly when h = √3·w — combined rows land h/2 = (√3/2)·w apart
    with alternate rows offset w/2, so all 6 neighbors of a center,
    (±w, 0) and (±w/2, ±h/2), sit at distance w. (matplotlib's hexbin
    weights its y-term by 3 ≡ the same h = √3·w ratio.) Shared by
    hexbin_cols / hex_smooth and the driver oracle SQL so the engine
    and the oracle cannot disagree on the constant."""
    w = int(width7)
    return int(1.7320508 * w / 2.0 + 0.5) * 2


def hexbin_cols(lon7_col, lat7_col, width7: int = 20_000_000,
                height7: int | None = None):
    """Hexagonal-bin center of a fixed-point point, as two int64 columns
    (hx, hy in lon7/lat7 units) — the H3-flavoured aggregation cell
    (uniform-ish neighbourhoods, no rectangular-grid corner bias) as
    ONE pure-codegen integer expression, no UDF.

    A pointy-top hexagonal tessellation IS the Voronoi diagram of two
    interleaved rectangular lattices — centers (i·w, j·h) and
    ((i+½)·w, (j+½)·h) with h = √3·w (hex_height7; the even rounding
    keeps both constants even). We shift coordinates non-negative,
    round to the nearest center of each lattice with half-up integer
    division, and pick the closer center by exact int64 squared
    distance (ties → lattice A; both engines evaluate the identical
    integer predicate, so assignment is bit-reproducible). Integer
    lattice constants make the hexagons near-regular rather than
    perfectly regular; the tessellation is exact.
    """
    import pyspark.sql.functions as F

    w = int(width7)
    h = int(height7) if height7 is not None else hex_height7(w)
    if w % 2 or h % 2:
        raise ValueError("hexbin lattice constants must be even")
    # `div` is integer division; operands are shifted non-negative so
    # truncation == floor on both engines.
    x = f"(CAST({lon7_col} AS BIGINT) + 1800000000)"
    y = f"(CAST({lat7_col} AS BIGINT) + 900000000)"
    ax = f"((({x} + {w // 2}) div {w}) * {w})"
    ay = f"((({y} + {h // 2}) div {h}) * {h})"
    bx = f"(({x} div {w}) * {w} + {w // 2})"
    by = f"(({y} div {h}) * {h} + {h // 2})"
    da = f"(({x}-{ax})*({x}-{ax}) + ({y}-{ay})*({y}-{ay}))"
    db = f"(({x}-{bx})*({x}-{bx}) + ({y}-{by})*({y}-{by}))"
    hx = F.expr(
        f"(CASE WHEN {da} <= {db} THEN {ax} ELSE {bx} END)"
        " - 1800000000"
    )
    hy = F.expr(
        f"(CASE WHEN {da} <= {db} THEN {ay} ELSE {by} END)"
        " - 900000000"
    )
    return hx.alias("hx"), hy.alias("hy")


def voronoi_assign(df, seeds, lon7_col: str = "lon7",
                   lat7_col: str = "lat7"):
    """Nearest-seed (Voronoi-cell) assignment: label every point with
    the closest of a small set of seed sites — the facility-allocation
    / service-area primitive. ``seeds`` is a list of
    (seed_id, lon7, lat7) int tuples, metadata-sized (the Voronoi
    complement of kNN: few sites, all points).

    Exactness: planar fixed-point squared distance per seed computed in
    DECIMAL (coordinate deltas reach 3.6e9, whose squares overflow
    int64); the winner is `array_min` over (dist, seed_id) structs —
    exact integer lexicographic compare, distance ties break to the
    smaller seed id. The whole assignment is one codegen projection
    over a literal seed array: no join, no shuffle until the caller
    aggregates. Adds a `seed_id` column."""
    import pyspark.sql.functions as F

    dec = "decimal(19,0)"
    cands = []
    for sid, slon, slat in seeds:
        dx = (F.col(lon7_col) - F.lit(int(slon))).cast(dec)
        dy = (F.col(lat7_col) - F.lit(int(slat))).cast(dec)
        cands.append(
            F.struct(
                (dx * dx + dy * dy).alias("d"),
                F.lit(int(sid)).alias("s"),
            )
        )
    best = F.array_min(F.array(*cands))
    return df.withColumn("seed_id", best["s"])


def geary_c(df, zoom: int, cell_col: str = "cell",
            value_col: str = "cnt"):
    """Global Geary's C spatial autocorrelation — Moran's I's
    local-contrast companion (C < 1 clustered, > 1 dispersed; C reacts
    to neighbor DIFFERENCES where I reacts to covariance):

        C = (N−1) · Σ_ordered wᵢⱼ (vᵢ−vⱼ)² / (2W · Σ (vᵢ−v̄)²)

    Queen 3×3 neighborhood excluding self, binary weights, the same
    sparse/no-data semantics as focal_stats/moran_i. Integer-exact:
    the pair sum decomposes into focal aggregates
    Σⱼ(vᵢ−vⱼ)² = (n_i−1)vᵢ² − 2vᵢ(fs_i−vᵢ) + (fss_i−vᵢ²), and BOTH
    focal sums (values and squared values) ride ONE 9× contribution
    explode + ONE shuffle — the input raster is scanned once, not per
    moment. The denominator multiplies through by N² (ΣZᵢ², Z =
    N·v−S). Every sum is exact int64; ONE final double expression with
    fixed association and a zero-variance guard, round(9). Returns one
    row: (n_cells, w_pairs, geary_c)."""
    from pyspark.sql import functions as F

    zoom = _clamp_zoom(zoom)
    ncols = 1 << zoom
    y_max = int(
        xy_id(np.array([0]), np.array([_LAT_MAX]), zoom)[0]
    ) // ncols
    src = df.select(
        F.col(cell_col).alias("_c"), F.col(value_col).alias("_v")
    ).filter(F.col("_c") >= 0)
    x = F.pmod(F.col("_c"), F.lit(ncols))
    y = F.floor(F.col("_c") / F.lit(ncols))
    offs = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}, 'dy', {dy})"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    contrib = (
        src.select("_c", "_v", x.alias("_x"), y.alias("_y"),
                   offs.alias("_o"))
        .withColumn("_ny", F.col("_y") + F.col("_o.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") <= y_max))
        .select(
            (
                F.col("_ny") * ncols
                + F.pmod(F.col("_x") + F.col("_o.dx"), F.lit(ncols))
            ).alias("_t"),
            "_v",
        )
    )
    agg2 = contrib.groupBy("_t").agg(
        F.sum("_v").alias("_fs"),
        F.sum(F.col("_v") * F.col("_v")).alias("_fss"),
        F.count(F.lit(1)).alias("_fn"),
    )
    g = src.agg(
        F.count(F.lit(1)).alias("_gn"), F.sum("_v").alias("_gs")
    )
    j = src.join(agg2, src["_c"] == agg2["_t"]).crossJoin(
        F.broadcast(g)
    )
    v = F.col("_v")
    num_i = (
        (F.col("_fn") - 1) * v * v
        - F.lit(2) * v * (F.col("_fs") - v)
        + (F.col("_fss") - v * v)
    )
    z = F.col("_gn") * v - F.col("_gs")
    agg = j.select(
        num_i.alias("_num"),
        (z * z).alias("_zz"),
        (F.col("_fn") - F.lit(1)).alias("_w"),
        "_gn",
    ).groupBy("_gn").agg(
        F.sum("_num").alias("_snum"),
        F.sum("_zz").alias("_szz"),
        F.sum("_w").alias("_sw"),
    )
    n_d = F.col("_gn").cast("double")
    return agg.select(
        F.col("_gn").alias("n_cells"),
        F.col("_sw").alias("w_pairs"),
        F.when(
            (F.col("_sw") > 0) & (F.col("_szz") > 0),
            F.round(
                ((n_d - F.lit(1.0)) * n_d * n_d
                 * F.col("_snum").cast("double"))
                / (F.lit(2.0) * F.col("_sw").cast("double")
                   * F.col("_szz").cast("double")),
                9,
            ),
        ).alias("geary_c"),
    )


def theil_sen_trend(df, cell_col: str = "cell", t_col: str = "wk",
                    value_col: str = "cnt"):
    """Theil–Sen robust trend per cell over a pre-aggregated
    (cell, t, value) cube — the median of all pairwise slopes
    (vⱼ−vᵢ)/(tⱼ−tᵢ), i<j: the robust complement to Mann–Kendall's
    trend TEST (this one estimates the magnitude; up to ~29% outliers
    cannot move it).

    Like mann_kendall_trend, the pair self-join runs over the
    PRE-AGGREGATED cube (T² is calendar-bounded, independent of event
    volume). Each slope is ONE correctly-rounded double division of
    exact integers — identical on both engines — and the median pick
    is the lower-median row_number over the total order
    (slope, t_i, t_j), so ties are deterministic. Returns
    (cell, n_pairs, ts_slope) with slope rounded to 9."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = df.select(
        F.col(cell_col).alias("_c"), F.col(t_col).alias("_t1"),
        F.col(value_col).alias("_v1"),
    )
    b = df.select(
        F.col(cell_col).alias("_c"), F.col(t_col).alias("_t2"),
        F.col(value_col).alias("_v2"),
    )
    pairs = a.join(b, "_c").filter(F.col("_t1") < F.col("_t2")).select(
        "_c", "_t1", "_t2",
        (
            (F.col("_v2") - F.col("_v1")).cast("double")
            / (F.col("_t2") - F.col("_t1")).cast("double")
        ).alias("_s"),
    )
    w = Window.partitionBy("_c").orderBy("_s", "_t1", "_t2")
    cnt = Window.partitionBy("_c")
    r = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
    )
    return r.groupBy(F.col("_c").alias(cell_col)).agg(
        F.max("_n").alias("n_pairs"),
        F.round(F.min("_s"), 9).alias("ts_slope"),
    )


def quadkey_col(lon7_col, lat7_col, zoom: int = 8):
    """Quadkey tile id (the Bing-maps interchange encoding) over the
    engine's equirect XYGrid tiling, as ONE pure-codegen string
    expression: digit k (west→east msb-first) is 2·bit_k(y) + bit_k(x)
    of the zoom-level tile indices — integer arithmetic only (the grid
    is equirect, so no Mercator ln/tan enters; this keeps the digits
    bit-reproducible across engines). A parent tile's quadkey is a
    string PREFIX of every descendant's — the same pruning property
    the Hilbert tokens exploit, in the industry-standard digit order.

    x = zoom-level column (0..2^z−1 west→east), y = ROW FROM NORTH
    (Bing convention: 0 at the top), derived from the same fixed-point
    floor divisions as xy_id: zoom ≤ 10 divides by the exact integer
    width 360e7/2^z; deeper zooms (fractional width) use the same
    scaled-rational floor division as _floor_div_w, so tile boundaries
    never drift from xy_id's double-exact arithmetic. lon=+180 wraps
    to the westernmost column (XYGrid.java:124-160 parity — the same
    rule xy_id applies; an x of 2^z would otherwise alias digit-wise
    to column 0 only by accident); lat=+90 clamps into the top row."""
    import pyspark.sql.functions as F

    zoom = _clamp_zoom(zoom)
    lon_s = f"(CAST({lon7_col} AS BIGINT) + 1800000000)"
    lat_s = f"(CAST({lat7_col} AS BIGINT) + 900000000)"
    if zoom <= 10:
        w = _N << (10 - zoom)  # == 3_600_000_000 >> zoom, exact
        xr = f"({lon_s} div {w})"
        yy = f"({lat_s} div {w})"
    else:
        m = 1 << (zoom - 10)
        xr = f"(({lon_s} * {m}) div {_N})"
        yy = f"(({lat_s} * {m}) div {_N})"
    x_wrap = 1 << zoom
    x = f"(CASE WHEN {xr} >= {x_wrap} THEN 0 ELSE {xr} END)"
    # clamp lat=+90 into the top row, mirror to row-from-north
    y_max = (1 << zoom) // 2 - 1
    y = (
        f"({y_max} - (CASE WHEN {yy} > {y_max} THEN {y_max} "
        f"ELSE {yy} END))"
    )
    digits = []
    for k in range(zoom - 1, -1, -1):
        d = (
            f"(2 * (({y} div {1 << k}) % 2)"
            f" + (({x} div {1 << k}) % 2))"
        )
        digits.append(f"chr(CAST(48 + {d} AS INT))")
    return F.expr("concat(" + ", ".join(digits) + ")")


def hex_smooth(df, width7: int = 100_000_000,
               height7: int | None = None,
               hx_col: str = "hx", hy_col: str = "hy",
               value_col: str = "cnt"):
    """Hex-neighborhood (k-ring 1) focal smoothing over a sparse
    hexbin raster — focal_stats' hexagonal twin (6 equidistant
    neighbors, no corner bias). Input: one row per PRESENT hex center
    (hexbin_cols output). Each hex contributes its value to itself and
    its 6 neighbors — centers at (±w, 0) on the own lattice and
    (±w/2, ±h/2) on the other, all at distance w under the default
    h = √3·w (hex_height7) — via a 7-element literal explode
    (codegen), ONE shuffle aggregates by target, and a final join
    restricts to present hexes (sparse no-data semantics). All
    arithmetic exact integers; only focal_mean divides (round 6)."""
    import pyspark.sql.functions as F

    w = int(width7)
    h = int(height7) if height7 is not None else hex_height7(w)
    if w % 2 or h % 2:
        raise ValueError("hexbin lattice constants must be even")
    offs = [(0, 0), (w, 0), (-w, 0),
            (w // 2, h // 2), (w // 2, -h // 2),
            (-w // 2, h // 2), (-w // 2, -h // 2)]
    # the sparse hex raster feeds BOTH the contribution fan-out and
    # the final present-hex join — materialize it once (raster-sized)
    # so the caller's upstream aggregation doesn't execute twice
    src = df.select(
        F.col(hx_col).alias("_hx"), F.col(hy_col).alias("_hy"),
        F.col(value_col).alias("_v"),
    ).localCheckpoint()
    off = F.expr(
        "explode(array("
        + ", ".join(
            f"named_struct('dx', {dx}L, 'dy', {dy}L)" for dx, dy in offs
        )
        + "))"
    )
    contrib = src.select(
        "_v", off.alias("_o"),
        F.col("_hx").alias("_sx"), F.col("_hy").alias("_sy"),
    ).select(
        (F.col("_sx") + F.col("_o.dx")).alias("_tx"),
        (F.col("_sy") + F.col("_o.dy")).alias("_ty"),
        "_v",
    )
    agg = contrib.groupBy("_tx", "_ty").agg(
        F.sum("_v").alias("focal_sum"),
        F.count(F.lit(1)).alias("focal_n"),
    )
    return src.join(
        agg, (src["_hx"] == agg["_tx"]) & (src["_hy"] == agg["_ty"])
    ).select(
        F.col("_hx").alias(hx_col),
        F.col("_hy").alias(hy_col),
        F.col("_v").alias(value_col),
        "focal_sum",
        "focal_n",
        F.round(
            F.col("focal_sum") / F.col("focal_n"), 6
        ).alias("focal_mean"),
    )
