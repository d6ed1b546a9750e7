"""Area-of-interest handling: 3-state culling + clip dispatch.

Mirrors the reference's cell/entity-level culling (CellIterator.java:
182-215, 440-481) and the Fast{Bbox,Point}In/OutsidePolygon predicates
(fip/*.java) with exact vectorized tests instead of banded indexes.

An AOI is either a bbox (minlon,minlat,maxlon,maxlat, degrees) or a
polygon (list of rings, outer first). States: 0=disjoint, 1=fully inside,
2=boundary (exact clip required).
"""

from __future__ import annotations

import numpy as np

from ..geo import clip as C
from ..geo import geom as G


def _segments_intersect_bbox(rings, bbox) -> bool:
    xmin, ymin, xmax, ymax = bbox
    for ring in rings:
        r = np.asarray(ring)
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        # quick reject: segment bbox vs bbox
        cand = ~(
            (np.maximum(x0, x1) < xmin)
            | (np.minimum(x0, x1) > xmax)
            | (np.maximum(y0, y1) < ymin)
            | (np.minimum(y0, y1) > ymax)
        )
        if not np.any(cand):
            continue
        # any endpoint inside bbox?
        if np.any(
            cand
            & (
                ((x0 >= xmin) & (x0 <= xmax) & (y0 >= ymin) & (y0 <= ymax))
                | ((x1 >= xmin) & (x1 <= xmax) & (y1 >= ymin) & (y1 <= ymax))
            )
        ):
            return True
        # exact segment-vs-bbox-edge crossing via Liang-Barsky acceptance
        for i in np.nonzero(cand)[0]:
            if C._clip_segments_bbox(r[i : i + 2], bbox):
                return True
    return False


def bbox_vs_polygon(bbox, rings) -> int:
    """3-state: 0 bbox fully outside polygon, 1 fully inside, 2 boundary.

    Exact (FastBboxInPolygon/FastBboxOutsidePolygon semantics): if no
    polygon edge touches the bbox, containment of one corner decides all.
    Accepts the multi-piece AOI form (list of ring-lists): pieces are
    disjoint, so a bbox fully inside one piece cannot touch another.
    """
    if rings and not isinstance(rings[0], np.ndarray):
        rel = 0
        for piece in rings:
            r = bbox_vs_polygon(bbox, piece)
            if r == 2:
                return 2
            if r == 1:
                rel = 1
        return rel
    if _segments_intersect_bbox(rings, bbox):
        return 2
    corners_in = C.points_in_polygon(
        np.array([bbox[0], bbox[2], bbox[0], bbox[2]]),
        np.array([bbox[1], bbox[1], bbox[3], bbox[3]]),
        rings,
    )
    if bool(np.all(corners_in)):
        return 1
    return 0


class AOI:
    """Query area: bbox, polygon, or whole world (None)."""

    def __init__(self, bbox=None, polygon=None):
        # polygon: list of rings (outer first) OR list of such piece
        # lists (MultiPolygon from a composed areaOfInterest), degrees
        self.pieces = C.aoi_pieces(polygon) if polygon else None
        self.polygon = (
            None
            if self.pieces is None
            else (self.pieces[0] if len(self.pieces) == 1 else self.pieces)
        )
        if bbox is None and self.pieces is not None:
            allr = [r for piece in self.pieces for r in piece]
            bbox = (
                min(float(np.min(r[:, 0])) for r in allr),
                min(float(np.min(r[:, 1])) for r in allr),
                max(float(np.max(r[:, 0])) for r in allr),
                max(float(np.max(r[:, 1])) for r in allr),
            )
        self.bbox = tuple(bbox) if bbox is not None else None

    @property
    def is_world(self):
        return self.bbox is None

    def relation_of_bbox(self, fbbox) -> int:
        """3-state cull of a feature bbox vs this AOI."""
        if self.is_world:
            return 1
        rel = C.bbox_relation(fbbox, self.bbox)
        if rel == 0 or self.polygon is None:
            return rel
        prel = bbox_vs_polygon(fbbox, self.polygon)
        if prel == 0:
            return 0
        if prel == 1 and rel == 1:
            return 1
        return 2

    def clip(self, g):
        """Exact clip of a geometry to this AOI (≙ Geo.clip)."""
        if self.is_world or g is None:
            return g
        if self.polygon is not None and g[0] in (
            "Polygon", "MultiPolygon", "GeometryCollection"
        ):
            # polygonal vs polygon AOI clips DIRECTLY against the polygon:
            # a bbox pre-clip would snap edges onto the AOI envelope and
            # manufacture collinear-boundary degeneracies
            if C.bbox_relation(G.bbox_of(g), self.bbox) == 0:
                return None
            if g[0] == "Polygon":
                if len(self.pieces) == 1:
                    return C.clip_polygon_to_polygon(g[1], self.polygon)
                # multi-piece AOI: clip against each (disjoint) piece and
                # concatenate the resulting polygons
                polys = []
                for piece in self.pieces:
                    r = C.clip_polygon_to_polygon(g[1], piece)
                    if r is None:
                        continue
                    polys.extend([r[1]] if r[0] == "Polygon" else r[1])
                if not polys:
                    return None
                if len(polys) == 1:
                    return ("Polygon", polys[0])
                return ("MultiPolygon", polys)
            pieces = []
            for comp in G._components(g):
                r = self.clip(comp)
                if r is None or G.is_empty(r):
                    continue
                pieces.extend([r] if r[0] != "MultiPolygon" else
                              [("Polygon", rings) for rings in r[1]])
            if not pieces:
                return None
            if len(pieces) == 1:
                return pieces[0]
            if all(p[0] == "Polygon" for p in pieces):
                return ("MultiPolygon", [p[1] for p in pieces])
            return ("GeometryCollection", pieces)
        g = C.clip_to_bbox(g, self.bbox)
        if g is None or self.polygon is None:
            return g
        t = g[0]
        if t == "Point":
            if g[1] is None:
                return None
            ok = C.points_in_polygon(
                np.array([g[1][0]]), np.array([g[1][1]]), self.polygon
            )[0]
            return g if ok else None
        if t == "MultiPoint":
            pts = [
                p
                for p in g[1]
                if C.points_in_polygon(np.array([p[0]]), np.array([p[1]]), self.polygon)[0]
            ]
            if not pts:
                return None
            return ("Point", pts[0]) if len(pts) == 1 else ("MultiPoint", pts)
        if t == "LineString":
            return C.clip_line_to_polygon(g[1], self.polygon)
        if t == "MultiLineString":
            pieces = []
            for line in g[1]:
                r = C.clip_line_to_polygon(line, self.polygon)
                if r is None:
                    continue
                pieces.extend([r[1]] if r[0] == "LineString" else r[1])
            if not pieces:
                return None
            if len(pieces) == 1:
                return ("LineString", pieces[0])
            return ("MultiLineString", pieces)
        # polygonal forms were dispatched to the direct polygon∩polygon
        # branch above; anything else conservative-keeps (bbox clipped)
        rel = bbox_vs_polygon(G.bbox_of(g), self.polygon)
        return g if rel != 0 else None
