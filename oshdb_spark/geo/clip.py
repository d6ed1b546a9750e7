"""Spatial predicates and clipping (pure numpy).

Replaces the reference's JTS `intersection` clipping (Geo.java:185-191) and
its banded point-in-polygon accelerators (fip/FastInPolygon.java:21-151,
FastBboxInPolygon/FastBboxOutsidePolygon) with:

- vectorized crossing-number point-in-polygon over coordinate arrays,
- Liang-Barsky line-vs-bbox clipping (emits MultiLineString pieces),
- Sutherland-Hodgman polygon-vs-bbox clipping (bbox is convex),
- the reference's 3-state cull (skip / keep-unclipped / exact-clip,
  CellIterator.java:182-215,349-378) exposed as bbox_relation().

Bbox convention: (minlon, minlat, maxlon, maxlat) in degrees.
"""

from __future__ import annotations

import numpy as np

from . import geom as G


# ---------------------------------------------------------------------------
# point-in-polygon (crossing number; on-edge points count as inside)
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test of many points vs one closed ring."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    cross = ((y0 > py) != (y1 > py)) & (
        px < (x1 - x0) * (py - y0) / np.where(y1 == y0, np.inf, y1 - y0) + x0
    )
    return np.count_nonzero(cross, axis=1) % 2 == 1


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Inside outer ring and outside every hole."""
    if not rings:
        return np.zeros(len(np.atleast_1d(px)), dtype=bool)
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_multipolygon(px, py, polys: list[list[np.ndarray]]) -> np.ndarray:
    out = np.zeros(len(np.atleast_1d(px)), dtype=bool)
    for rings in polys:
        out |= points_in_polygon(px, py, rings)
    return out


# ---------------------------------------------------------------------------
# bbox predicates / 3-state cull
# ---------------------------------------------------------------------------

def bbox_intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def bbox_contains(outer, inner) -> bool:
    return (
        inner[0] >= outer[0]
        and inner[1] >= outer[1]
        and inner[2] <= outer[2]
        and inner[3] <= outer[3]
    )


def bbox_relation(feature_bbox, aoi_bbox) -> int:
    """3-state cull (CellIterator.java:199-215,349-378):
    0 = disjoint (skip), 1 = fully inside (keep unclipped), 2 = boundary
    (exact clip needed)."""
    if feature_bbox is None or not bbox_intersects(feature_bbox, aoi_bbox):
        return 0
    if bbox_contains(aoi_bbox, feature_bbox):
        return 1
    return 2


# ---------------------------------------------------------------------------
# clipping to bbox
# ---------------------------------------------------------------------------

def _clip_segments_bbox(coords: np.ndarray, bbox) -> list[np.ndarray]:
    """Liang-Barsky clip of a polyline; returns connected pieces."""
    xmin, ymin, xmax, ymax = bbox
    pieces: list[list] = []
    cur: list = []
    for i in range(len(coords) - 1):
        x0, y0 = coords[i]
        x1, y1 = coords[i + 1]
        t0, t1 = 0.0, 1.0
        dx, dy = x1 - x0, y1 - y0
        ok = True
        for p, q in (
            (-dx, x0 - xmin),
            (dx, xmax - x0),
            (-dy, y0 - ymin),
            (dy, ymax - y0),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                r = q / p
                if p < 0:
                    if r > t1:
                        ok = False
                        break
                    if r > t0:
                        t0 = r
                else:
                    if r < t0:
                        ok = False
                        break
                    if r < t1:
                        t1 = r
        if not ok:
            if len(cur) > 1:
                pieces.append(cur)
            cur = []
            continue
        a = (x0 + t0 * dx, y0 + t0 * dy)
        b = (x0 + t1 * dx, y0 + t1 * dy)
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) > 1:
                pieces.append(cur)
            cur = [a, b]
        if t1 < 1.0:  # exited the box — piece ends here
            if len(cur) > 1:
                pieces.append(cur)
            cur = []
    if len(cur) > 1:
        pieces.append(cur)
    return [np.asarray(p, dtype=np.float64) for p in pieces]


def _clip_ring_bbox(ring: np.ndarray, bbox) -> np.ndarray | None:
    """Sutherland-Hodgman clip of one closed ring against a bbox."""
    xmin, ymin, xmax, ymax = bbox
    pts = [tuple(c) for c in np.asarray(ring)[:-1]]

    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur, prv = poly[i], poly[i - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prv, cur))
        return out

    def ix_x(x):
        return lambda p, c: (
            x,
            p[1] + (c[1] - p[1]) * (x - p[0]) / (c[0] - p[0]),
        )

    def ix_y(y):
        return lambda p, c: (
            p[0] + (c[0] - p[0]) * (y - p[1]) / (c[1] - p[1]),
            y,
        )

    for inside, ix in (
        (lambda p: p[0] >= xmin, ix_x(xmin)),
        (lambda p: p[0] <= xmax, ix_x(xmax)),
        (lambda p: p[1] >= ymin, ix_y(ymin)),
        (lambda p: p[1] <= ymax, ix_y(ymax)),
    ):
        pts = clip_edge(pts, inside, ix)
        if len(pts) < 3:
            return None
    arr = np.asarray(pts + [pts[0]], dtype=np.float64)
    return arr


def clip_to_bbox(g, bbox):
    """Clip a geometry to a bbox (≙ Geo.clip(obj, bbox), Geo.java:185-187).

    Returns None (empty) when nothing remains; fully-inside geometries are
    returned as-is (identity, reference O8 fast path).
    """
    if g is None or G.is_empty(g):
        return None
    rel = bbox_relation(G.bbox_of(g), bbox)
    if rel == 0:
        return None
    if rel == 1:
        return g
    t, p = g
    if t == "Point":
        x, y = p
        if bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]:
            return g
        return None
    if t == "LineString":
        pieces = _clip_segments_bbox(p, bbox)
        if not pieces:
            return None
        if len(pieces) == 1:
            return ("LineString", pieces[0])
        return ("MultiLineString", pieces)
    if t == "Polygon":
        outer = _clip_ring_bbox(p[0], bbox)
        if outer is None:
            return None
        rings = [outer]
        for hole in p[1:]:
            h = _clip_ring_bbox(hole, bbox)
            if h is not None:
                rings.append(h)
        return ("Polygon", rings)
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        comps = [clip_to_bbox(c, bbox) for c in G._components(g)]
        comps = [c for c in comps if c is not None and not G.is_empty(c)]
        if not comps:
            return None
        if len(comps) == 1:
            return comps[0]
        if t == "MultiPoint" or all(c[0] == "Point" for c in comps):
            if t != "GeometryCollection" or all(c[0] == "Point" for c in comps):
                return ("MultiPoint", [c[1] for c in comps])
        if all(c[0] in ("LineString",) for c in comps):
            return ("MultiLineString", [c[1] for c in comps])
        if all(c[0] == "Polygon" for c in comps):
            return ("MultiPolygon", [c[1] for c in comps])
        return ("GeometryCollection", comps)
    return None


# ---------------------------------------------------------------------------
# polygon-AOI support (exact for points; segment-exact for lines)
# ---------------------------------------------------------------------------

def clip_line_to_polygon(coords: np.ndarray, rings: list[np.ndarray]):
    """Clip a polyline to a polygon by splitting segments at ring crossings
    and keeping the inside pieces (midpoint test). Exact for simple
    polygons; replaces JTS line∩polygon for the AOI-polygon case."""
    edges = []
    for ring in rings:
        r = np.asarray(ring)
        edges.append((r[:-1], r[1:]))
    pieces: list[list] = []
    cur: list = []
    for i in range(len(coords) - 1):
        p0 = coords[i]
        p1 = coords[i + 1]
        d = p1 - p0
        ts = [0.0, 1.0]
        for a, b in edges:
            e = b - a
            denom = d[0] * (-e[:, 1]) + d[1] * e[:, 0]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = ((a[:, 0] - p0[0]) * (-e[:, 1]) + (a[:, 1] - p0[1]) * e[:, 0]) / denom
                u = (d[0] * (a[:, 1] - p0[1]) - d[1] * (a[:, 0] - p0[0])) / denom
            ok = (denom != 0) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
            ts.extend(t[ok].tolist())
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            mid = p0 + d * ((t0 + t1) / 2.0)
            if points_in_polygon(np.array([mid[0]]), np.array([mid[1]]), rings)[0]:
                a = tuple(p0 + d * t0)
                b = tuple(p0 + d * t1)
                if cur and cur[-1] == a:
                    cur.append(b)
                else:
                    if len(cur) > 1:
                        pieces.append(cur)
                    cur = [a, b]
            else:
                if len(cur) > 1:
                    pieces.append(cur)
                cur = []
    if len(cur) > 1:
        pieces.append(cur)
    if not pieces:
        return None
    if len(pieces) == 1:
        return ("LineString", np.asarray(pieces[0]))
    return ("MultiLineString", [np.asarray(p) for p in pieces])
