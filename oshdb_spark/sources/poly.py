"""Osmosis ``.poly`` polygon-filter file reader.

The ``.poly`` format (Osmosis Polygon Filter File Format, documented on the
OSM wiki) is how region extracts describe their query area; the reference's
ETL accepts it for the ``extract.region`` metadata
(oshdb-tool/.../importer/util/PolyFileReader.java:40-112). Semantics
reproduced here:

- first line is a mandatory header naming the file (content ignored);
- each section is an id line, then ``lon lat`` coordinate pairs (any float
  syntax, whitespace separated), terminated by ``END``;
- a section whose id starts with ``!`` is a HOLE: it is attached to EVERY
  previously-read outer section whose polygon it intersects
  (PolyFileReader.java:79-86 — JTS ``intersects``; note the reference only
  checks outers read BEFORE the hole, which we match);
- open rings are closed by repeating the first coordinate
  (PolyFileReader.java:73-74);
- one outer section → Polygon, several → MultiPolygon
  (PolyFileReader.java:107).

Output uses the engine's ring convention: CLOSED (first == last) float64
``(n, 2)`` arrays, outer ring first within each piece, directly consumable
by ``kernels.aoi.AOI``.
"""

from __future__ import annotations

import numpy as np

from ..geo import clip as C


class PolyParseError(ValueError):
    """Malformed .poly content (missing header / bad coordinate line)."""


def _close(coords: list[tuple[float, float]]) -> np.ndarray:
    ring = np.asarray(coords, dtype=np.float64)
    if ring.shape[0] < 3:
        raise PolyParseError(f"ring with {ring.shape[0]} points")
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def _rings_intersect(hole: np.ndarray, outer: np.ndarray) -> bool:
    """JTS ``Polygon.intersects`` stand-in for ring pairs: bbox cull, then
    any shared area / containment either way (``ring_intersection`` covers
    crossing, touching, and nesting in one call)."""
    hb = (hole[:, 0].min(), hole[:, 1].min(), hole[:, 0].max(), hole[:, 1].max())
    ob = (outer[:, 0].min(), outer[:, 1].min(), outer[:, 0].max(), outer[:, 1].max())
    if not C.bbox_intersects(hb, ob):
        return False
    return len(C.ring_intersection(hole, outer)) > 0


def parse_poly(text: str):
    """Parse .poly file content → ``("Polygon", rings)`` or
    ``("MultiPolygon", [rings, ...])`` with closed float64 rings, outer
    first per piece."""
    lines = iter(text.splitlines())
    header = next(lines, None)
    if header is None or not header.strip():
        raise PolyParseError("missing header line")

    outers: list[list[np.ndarray]] = []  # [outer, hole, ...] per piece
    section: str | None = None
    coords: list[tuple[float, float]] = []
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if section is None:
            if line.upper() == "END":
                break  # file terminator
            section = line
            coords = []
            continue
        if line.upper() == "END":
            ring = _close(coords)
            if section.startswith("!"):
                for piece in outers:
                    if _rings_intersect(ring, piece[0]):
                        piece.append(ring)
            else:
                outers.append([ring])
            section = None
            continue
        parts = line.split()
        if len(parts) != 2:
            raise PolyParseError(f"expected 'lon lat', got: {line!r}")
        coords.append((float(parts[0]), float(parts[1])))

    if not outers:
        raise PolyParseError("no polygon sections")
    if len(outers) == 1:
        return ("Polygon", outers[0])
    return ("MultiPolygon", outers)


def read_poly(path: str):
    """Read and parse a .poly file from disk."""
    with open(path, "r", encoding="utf-8") as fh:
        return parse_poly(fh.read())


def aoi_from_poly(path: str):
    """Build a query :class:`~oshdb_spark.kernels.aoi.AOI` from a .poly
    file — the engine analog of pointing the reference ETL at a region
    extract's polygon filter."""
    from ..kernels.aoi import AOI

    kind, pieces = read_poly(path)
    return AOI(polygon=pieces if kind == "Polygon" else list(pieces))
