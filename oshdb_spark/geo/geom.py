"""Lightweight pure-python/numpy geometry model + WKB codec.

No native geometry library is assumed in the runtime (no shapely/GEOS), so
the engine carries its own minimal geometry layer. A geometry is a tagged
pair ``(type, payload)``:

- ("Point", (x, y))                      — payload None for EMPTY
- ("LineString", ndarray (N,2))
- ("Polygon", [ring0, ring1, ...])       — each ring (N,2), closed
- ("MultiPoint", [points])
- ("MultiLineString", [ndarrays])
- ("MultiPolygon", [ring-lists])
- ("GeometryCollection", [geometries])

Coordinates are (lon, lat) degrees, float64. WKB follows ISO little-endian
encoding so results interop with DuckDB spatial / shapely / JTS readers.

Parity notes: the geometry-type ladder, emptiness and measurement dispatch
mirror the reference (OSHDBGeometryBuilder.java:65-138, Geo.java:62-131).
"""

from __future__ import annotations

import struct

import numpy as np

from .geodesy import length_of_line, polygon_area

_WKB_TYPE = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_WKB_NAME = {v: k for k, v in _WKB_TYPE.items()}


def point(x: float, y: float):
    return ("Point", (float(x), float(y)))


def linestring(coords):
    return ("LineString", np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def polygon(rings):
    return ("Polygon", [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings])


def is_empty(g) -> bool:
    if g is None:
        return True
    t, p = g
    if t == "Point":
        return p is None
    if t == "LineString":
        return len(p) == 0
    if t == "Polygon":
        return len(p) == 0 or len(p[0]) == 0
    return len(p) == 0 or all(is_empty(c) for c in _components(g))


def _components(g):
    t, p = g
    if t == "MultiPoint":
        return [("Point", c) for c in p]
    if t == "MultiLineString":
        return [("LineString", c) for c in p]
    if t == "MultiPolygon":
        return [("Polygon", c) for c in p]
    if t == "GeometryCollection":
        return p
    return [g]


def geom_type(g) -> str:
    return g[0]


def bbox_of(g) -> tuple[float, float, float, float] | None:
    """(minlon, minlat, maxlon, maxlat) envelope, None if empty."""
    if g is None or is_empty(g):
        return None
    t, p = g
    if t == "Point":
        return (p[0], p[1], p[0], p[1])
    if t == "LineString":
        return (
            float(np.min(p[:, 0])),
            float(np.min(p[:, 1])),
            float(np.max(p[:, 0])),
            float(np.max(p[:, 1])),
        )
    if t == "Polygon":
        r = p[0]
        return (
            float(np.min(r[:, 0])),
            float(np.min(r[:, 1])),
            float(np.max(r[:, 0])),
            float(np.max(r[:, 1])),
        )
    boxes = [b for b in (bbox_of(c) for c in _components(g)) if b is not None]
    if not boxes:
        return None
    arr = np.array(boxes)
    return (
        float(arr[:, 0].min()),
        float(arr[:, 1].min()),
        float(arr[:, 2].max()),
        float(arr[:, 3].max()),
    )


# ---------------------------------------------------------------------------
# measurement (reference dispatch: Geo.java lengthOf/areaOf overloads)
# ---------------------------------------------------------------------------

def length(g) -> float:
    """Geodesic length; 0 for non-lineal geometries (Geo.java:81-90)."""
    if g is None:
        return 0.0
    t, _ = g
    if t == "LineString":
        return length_of_line(g[1])
    if t in ("MultiLineString", "GeometryCollection"):
        return float(sum(length(c) for c in _components(g)))
    return 0.0


def area(g) -> float:
    """Geodesic area; 0 for non-polygonal geometries (Geo.java:120-131)."""
    if g is None:
        return 0.0
    t, _ = g
    if t == "Polygon":
        return polygon_area(g[1])
    if t in ("MultiPolygon", "GeometryCollection"):
        return float(sum(area(c) for c in _components(g)))
    return 0.0


# ---------------------------------------------------------------------------
# WKB codec (ISO, little-endian)
# ---------------------------------------------------------------------------

def _enc_coords(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(np.asarray(arr, dtype="<f8"))
    return struct.pack("<I", len(a)) + a.tobytes()


def to_wkb(g) -> bytes | None:
    if g is None:
        return None
    t, p = g
    code = _WKB_TYPE[t]
    head = b"\x01" + struct.pack("<I", code)
    if t == "Point":
        if p is None:
            return head + struct.pack("<dd", float("nan"), float("nan"))
        return head + struct.pack("<dd", p[0], p[1])
    if t == "LineString":
        return head + _enc_coords(p)
    if t == "Polygon":
        body = struct.pack("<I", len(p)) + b"".join(_enc_coords(r) for r in p)
        return head + body
    comps = _components(g)
    return head + struct.pack("<I", len(comps)) + b"".join(to_wkb(c) for c in comps)


def from_wkb(buf: bytes | None):
    if buf is None:
        return None
    g, _ = _dec(memoryview(buf), 0)
    return g


def _dec(mv: memoryview, off: int):
    little = mv[off] == 1
    fmt = "<" if little else ">"
    (code,) = struct.unpack_from(fmt + "I", mv, off + 1)
    off += 5
    t = _WKB_NAME[code & 0xFF]
    if t == "Point":
        x, y = struct.unpack_from(fmt + "dd", mv, off)
        off += 16
        if np.isnan(x) and np.isnan(y):
            return ("Point", None), off
        return ("Point", (x, y)), off
    if t == "LineString":
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(-1, 2)
        return ("LineString", arr.copy()), off + 16 * n
    if t == "Polygon":
        (nr,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(
                -1, 2
            )
            rings.append(arr.copy())
            off += 16 * n
        return ("Polygon", rings), off
    (n,) = struct.unpack_from(fmt + "I", mv, off)
    off += 4
    comps = []
    for _ in range(n):
        c, off = _dec(mv, off)
        comps.append(c)
    if t == "MultiPoint":
        return ("MultiPoint", [c[1] for c in comps]), off
    if t == "MultiLineString":
        return ("MultiLineString", [c[1] for c in comps]), off
    if t == "MultiPolygon":
        return ("MultiPolygon", [c[1] for c in comps]), off
    return ("GeometryCollection", comps), off


def to_wkt(g) -> str:
    """Debug/test helper."""
    if g is None:
        return "GEOMETRY EMPTY"
    t, p = g

    def cs(arr):
        return ", ".join(f"{x:g} {y:g}" for x, y in np.asarray(arr))

    if t == "Point":
        return "POINT EMPTY" if p is None else f"POINT ({p[0]:g} {p[1]:g})"
    if t == "LineString":
        return "LINESTRING EMPTY" if len(p) == 0 else f"LINESTRING ({cs(p)})"
    if t == "Polygon":
        if not p:
            return "POLYGON EMPTY"
        return "POLYGON (" + ", ".join(f"({cs(r)})" for r in p) + ")"
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(f"({cs(r)})" for r in rings) + ")" for rings in p)
            + ")"
        )
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(f"({cs(l)})" for l in p) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({c[0]:g} {c[1]:g})" for c in p) + ")"
    return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(c) for c in p) + ")"


def geoms_equal(a, b, tol: float = 0.0) -> bool:
    """Structural equality (same type, same coords within tol) — used by
    the contribution kernel's GEOMETRY_CHANGE detection
    (CellIterator.java:663-665 compares prev/current geometries)."""
    if a is None or b is None:
        return a is None and b is None
    if a[0] != b[0]:
        return False
    t = a[0]
    if t == "Point":
        if a[1] is None or b[1] is None:
            return a[1] is None and b[1] is None
        return abs(a[1][0] - b[1][0]) <= tol and abs(a[1][1] - b[1][1]) <= tol
    if t == "LineString":
        return a[1].shape == b[1].shape and bool(np.all(np.abs(a[1] - b[1]) <= tol))
    if t == "Polygon":
        return len(a[1]) == len(b[1]) and all(
            r1.shape == r2.shape and bool(np.all(np.abs(r1 - r2) <= tol))
            for r1, r2 in zip(a[1], b[1])
        )
    ca, cb = _components(a), _components(b)
    return len(ca) == len(cb) and all(geoms_equal(x, y, tol) for x, y in zip(ca, cb))
