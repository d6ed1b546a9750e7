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

import math

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
    with np.errstate(over="ignore"):  # denormal edge spans overflow to
        # ±inf, which the comparison handles correctly
        cross = ((y0 > py) != (y1 > py)) & (
            px < (x1 - x0) * (py - y0) / np.where(y1 == y0, np.inf, y1 - y0) + x0
        )
    return np.count_nonzero(cross, axis=1) % 2 == 1


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Inside outer ring and outside every hole. Also accepts the
    multi-piece AOI form (list of ring-lists, see aoi_pieces) and ORs
    the pieces — composed areaOfInterest intersections may be
    MultiPolygons (MapReducer.java:242-270)."""
    if not rings:
        return np.zeros(len(np.atleast_1d(px)), dtype=bool)
    if not isinstance(rings[0], np.ndarray):
        return points_in_multipolygon(px, py, rings)
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_multipolygon(px, py, polys: list[list[np.ndarray]]) -> np.ndarray:
    out = np.zeros(len(np.atleast_1d(px)), dtype=bool)
    for rings in polys:
        out |= points_in_polygon(px, py, rings)
    return out


def aoi_pieces(poly) -> list[list[np.ndarray]] | None:
    """Normalize an AOI polygon argument to a list of PIECES, each a list
    of float64 rings (outer first). Accepts a single polygon (list of
    rings) or a multipolygon (list of such lists) — the latter arises from
    composed areaOfInterest intersections with disjoint overlap
    (MapReducer.java:242-270 via JTS Geometry.intersection)."""
    if poly is None:
        return None

    def depth(x):
        d = 0
        while not isinstance(x, np.ndarray):
            try:
                x = x[0]
            except (TypeError, IndexError, KeyError):
                return d
            d += 1
        return d + x.ndim

    d = depth(poly)
    if d == 3:
        pieces = [poly]
    elif d == 4:
        pieces = list(poly)
    else:
        raise ValueError(f"AOI polygon must nest rings 3 or 4 deep, got {d}")
    return [[np.asarray(r, dtype=np.float64) for r in rings] for rings in pieces]


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


def bbox_intersection(a, b):
    """Intersection bbox of two bboxes (OSHDBBoundingBox.java ``intersect``:
    max of mins, min of maxes). Callers guard disjointness with
    :func:`bbox_intersects` — like the reference, a disjoint pair yields an
    inverted (empty) box."""
    return (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))


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
# polygon ∩ polygon (exact for simple polygons; shared-vertex /
# vertex-on-edge / collinear-overlap degeneracies handled by closed-interval
# splitting with vertex snapping — the cases real OSM data produces
# constantly: adjacent buildings, admin boundaries following roads)
# ---------------------------------------------------------------------------

def _ring_ccw(ring: np.ndarray) -> np.ndarray:
    """Normalize a closed ring to counter-clockwise orientation."""
    r = np.asarray(ring, dtype=np.float64)
    area2 = np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
    return r if area2 >= 0 else r[::-1].copy()


def _stitch(
    fragments: list[list[tuple]],
    dropped: list | None = None,
    snap_eps: float = 0.0,
) -> list[np.ndarray]:
    """Join fragments end-to-start into closed rings (endpoints are
    bitwise-shared intersection points, so dict lookup is exact). When
    `dropped` is a list, a marker is appended for every open chain that
    had to be discarded — callers use it to detect that classification
    noise broke closure and retry with swapped ring roles.

    ``snap_eps > 0`` is the LAST-RESORT mode (engaged only after BOTH
    exact role orders left open chains): when no bitwise continuation
    exists, the chain joins the nearest unused fragment start — or
    closes onto its own start — within ``snap_eps``, inserting a
    micro-chord of at most that length. The round-5 64× soak found the
    case this exists for: two rings whose spike tips coincide within
    ~1e-7 produce tip bridge micro-fragments that parity-classify
    OUTSIDE on both sides (each tip genuinely pokes past the other), so
    both exact passes drop the whole region; the ~2.5e-8 tip chord is
    the degenerate limit's answer. Deterministic: nearest candidate,
    ties to fragment list order; chords are bounded by snap_eps, which
    callers set relative to the coordinate scale."""
    by_start: dict[tuple, list] = {}
    for f in fragments:
        by_start.setdefault(f[0], []).append(f)
    rings = []
    used: set[int] = set()
    for f in fragments:
        if id(f) in used:
            continue
        used.add(id(f))
        chain = list(f)
        while chain[-1] != chain[0]:
            cands = [c for c in by_start.get(chain[-1], []) if id(c) not in used]
            if not cands:
                if snap_eps > 0.0:
                    cx, cy = chain[-1]
                    best, bd = None, snap_eps
                    for c in fragments:
                        if id(c) in used:
                            continue
                        d = math.hypot(c[0][0] - cx, c[0][1] - cy)
                        if d < bd:
                            best, bd = c, d
                    d0 = math.hypot(chain[0][0] - cx, chain[0][1] - cy)
                    if d0 <= bd and d0 <= snap_eps:
                        chain.append(chain[0])  # micro-chord closure
                        continue
                    if best is not None:
                        used.add(id(best))
                        chain.extend(best)  # micro-chord + fragment
                        continue
                break  # open chain — degeneracy; drop
            else:
                nxt = cands[0]
                used.add(id(nxt))
                chain.extend(nxt[1:])
        if chain[-1] == chain[0] and len(chain) >= 4:
            rings.append(np.asarray(chain, dtype=np.float64))
        elif dropped is not None:
            dropped.append(chain)
    return rings


def _on_ring_edge(px: float, py: float, ring: np.ndarray, eps: float = 0.0):
    """Index + direction of the ring edge the point lies on (within
    perpendicular distance eps — 0 keeps the exact-collinearity test), or
    None. The tolerance makes NEAR-degenerate inputs (boundaries within
    float roundoff of each other) classify like their degenerate limit,
    the same snap-rounding posture as _pair_splits."""
    r = np.asarray(ring)
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    elen = np.hypot(x1 - x0, y1 - y0)
    inbb = (
        (px >= np.minimum(x0, x1) - eps) & (px <= np.maximum(x0, x1) + eps)
        & (py >= np.minimum(y0, y1) - eps) & (py <= np.maximum(y0, y1) + eps)
    )
    hit = np.nonzero((np.abs(cross) <= eps * elen) & inbb)[0]
    if len(hit) == 0:
        return None
    j = int(hit[0])
    return j, (x1[j] - x0[j], y1[j] - y0[j])


def _clean_ring(r: np.ndarray, eps: float) -> np.ndarray | None:
    """Collapse consecutive vertices closer than eps (degenerate micro-
    edges amplify crossing roundoff unboundedly — the JTS precision-model
    posture). Returns None when fewer than 3 distinct vertices remain."""
    pts = [tuple(r[0])]
    for p in r[1:-1]:
        if abs(p[0] - pts[-1][0]) > eps or abs(p[1] - pts[-1][1]) > eps:
            pts.append(tuple(p))
    while len(pts) > 1 and (
        abs(pts[-1][0] - pts[0][0]) <= eps
        and abs(pts[-1][1] - pts[0][1]) <= eps
    ):
        pts.pop()
    if len(pts) < 3:
        return None
    return np.asarray(pts + [pts[0]], dtype=np.float64)


def _prep_pair(a: np.ndarray, b: np.ndarray):
    """Shared preamble of ring_intersection / ring_union_pair: CCW
    orientation, micro-edge cleanup, symmetric merged-vertex snap, and a
    re-clean for edges the snap collapsed. Either element of the result
    may be None (ring degenerated below 3 distinct vertices)."""
    a = _ring_ccw(np.asarray(a, dtype=np.float64))
    b = _ring_ccw(np.asarray(b, dtype=np.float64))
    scale = max(
        1.0,
        float(np.abs(a).max(initial=0.0)),
        float(np.abs(b).max(initial=0.0)),
    )
    a = _clean_ring(a, 1e-12 * scale)
    b = _clean_ring(b, 1e-12 * scale)
    if a is None or b is None:
        return a, b
    # input-vertex snap radius: well above float noise (~1e4 ulps) yet
    # 10^3× below the 1e-7 fixed-point lattice — genuinely distinct OSM
    # vertices are NEVER merged, only roundoff-coincident ones are.
    # (The larger 1e-9·scale radius in _pair_splits applies to COMPUTED
    # crossing points, whose error is amplified by 1/denom; input
    # vertices carry no such amplification.)
    eps = 1e-12 * scale
    a, b = _snap_merge(a, b, eps)
    a = _clean_ring(a, 0.0)
    b = _clean_ring(b, 0.0)
    if a is None or b is None:
        return a, b
    # phase-2 snap rounding: each ring's vertices split the OTHER ring's
    # ε-near edges, so ε-coincident runs become EXACTLY coincident edges
    # the structural collinear-interval classification then handles —
    # without this, two near-parallel edges can both classify strictly
    # inside/outside each other and open the stitched chain
    a2 = _insert_onto_near_edges(a, b, eps)
    b2 = _insert_onto_near_edges(b, a, eps)
    return a2, b2


def _insert_onto_near_edges(r: np.ndarray, src: np.ndarray, eps: float):
    """Insert `src`'s vertices into `r`'s edges where they lie within
    perpendicular distance eps strictly between the edge endpoints
    (vertex-vertex coincidence was already canonicalized by _snap_merge).
    The inserted point is the source vertex itself (bitwise), so the two
    rings afterwards share the vertex exactly and the near-collinear run
    decomposes into exactly-equal sub-edges. Bends the edge by ≤ eps —
    the same precision-model posture as the vertex snap."""
    verts = [
        (float(x), float(y))
        for x, y in src[:-1]
    ]
    out: list[tuple] = []
    changed = False
    for k in range(len(r) - 1):
        p0x, p0y = float(r[k, 0]), float(r[k, 1])
        p1x, p1y = float(r[k + 1, 0]), float(r[k + 1, 1])
        out.append((p0x, p0y))
        dx, dy = p1x - p0x, p1y - p0y
        el2 = dx * dx + dy * dy
        if el2 == 0.0:
            continue
        el = np.sqrt(el2)
        ins: list[tuple] = []
        for q in verts:
            if q == (p0x, p0y) or q == (p1x, p1y):
                continue
            t = ((q[0] - p0x) * dx + (q[1] - p0y) * dy) / el2
            if t <= 0.0 or t >= 1.0:
                continue
            cross = dx * (q[1] - p0y) - dy * (q[0] - p0x)
            if abs(cross) <= eps * el:
                ins.append((t, q))
        for _, q in sorted(ins):
            out.append(q)
            changed = True
    if not changed:
        return r
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def _snap_merge(a: np.ndarray, b: np.ndarray, eps: float):
    """Snap near-coincident vertices of BOTH rings onto shared canonical
    representatives (the lexicographically-least point of each eps-
    cluster over the MERGED vertex set). Symmetric in (a, b) by
    construction — the round-4 commutativity fix: asymmetric snapping
    (ring b's vertices tried first) made split sets order-dependent.
    Vertices farther apart than eps are untouched; 1-ulp-offset
    near-duplicates canonicalize to bitwise-equal rings, which the exact
    split/classify machinery then handles structurally."""
    pts = np.vstack([a[:-1], b[:-1]])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    reps: dict[tuple, tuple] = {}
    anchors: list[tuple] = []
    for idx in order:
        p = (float(pts[idx, 0]), float(pts[idx, 1]))
        if p in reps:
            continue
        hit = None
        for q in reversed(anchors):
            if p[0] - q[0] > eps:
                break
            if abs(p[1] - q[1]) <= eps:
                hit = q
                break
        if hit is None:
            anchors.append(p)
            reps[p] = p
        else:
            reps[p] = hit

    def apply(r):
        out = [reps[(float(x), float(y))] for x, y in r[:-1]]
        out.append(out[0])
        return np.asarray(out, dtype=np.float64)

    return apply(a), apply(b)


def _pair_splits(a: np.ndarray, b: np.ndarray):
    """Split positions of BOTH rings at every boundary contact — proper
    crossings (closed [0,1]×[0,1] acceptance), vertex touches, and
    collinear-overlap interval endpoints. Each contact point is computed
    (or vertex-snapped) ONCE and recorded on both rings, so fragment
    endpoints stay bitwise-shared and the stitch matches exactly.
    Positions are chain params p = edge + t ∈ [0, n). Returns
    ((pos_a, pts_a, iv_a), (pos_b, pts_b, iv_b)) with positions
    deduplicated and sorted; iv_* are the positive-length SHARED
    (collinear-overlap) position intervals (lo, hi, codirectional) on
    each ring, unwrapped (hi may equal n). Shared-ness is decided HERE,
    structurally, from exact edge collinearity — a metric midpoint test
    downstream flips on ε-near-parallel interior fragments and breaks
    commutativity (round-4 hypothesis counterexample)."""
    na, nb = len(a) - 1, len(b) - 1
    rec_a: list[tuple[float, tuple]] = []
    rec_b: list[tuple[float, tuple]] = []
    iv_a: list[tuple[float, float, bool]] = []
    iv_b: list[tuple[float, float, bool]] = []

    a0, a1 = a[:-1], a[1:]
    b0, b1 = b[:-1], b[1:]
    d1 = a1 - a0
    d2 = b1 - b0
    denom = d1[:, None, 0] * (-d2[None, :, 1]) + d1[:, None, 1] * d2[None, :, 0]
    dx = b0[None, :, 0] - a0[:, None, 0]
    dy = b0[None, :, 1] - a0[:, None, 1]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = (dx * (-d2[None, :, 1]) + dy * d2[None, :, 0]) / denom
        u = (d1[:, None, 0] * dy - d1[:, None, 1] * dx) / denom
    # normalized parallelism: |denom| = |d1||d2| sin(angle). Edge pairs
    # lying on one carrier line to-the-ulp (shared boundary arcs that
    # went through independent clips) have denom ~1e-16·|d1||d2| instead
    # of exact 0 — their in-range (t, u) "solutions" are pure 1/denom
    # noise that records real contact points at WRONG chain positions.
    # Such pairs belong to the collinear branch (with matching relaxed
    # tolerance below); genuinely crossing near-parallel slivers have
    # sin(angle) orders of magnitude above 1e-12 and stay here.
    _an = np.hypot(d1[:, 0], d1[:, 1])
    _bn = np.hypot(d2[:, 0], d2[:, 1])
    par = np.abs(denom) <= 1e-12 * (_an[:, None] * _bn[None, :])
    ok = (~par) & (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    # bitwise-shared input vertices (canonicalized by _snap_merge) are
    # boundary contacts by definition: record them DIRECTLY, exactly,
    # on both chains — relying on the crossing solutions below to land
    # on them is wrong, because a near-parallel edge pair meeting at a
    # shared endpoint amplifies roundoff by 1/denom and the computed
    # point can drift far beyond any fixed snap radius (round-4
    # counterexample: two stars identical but for a 4e-9 outer-radius
    # difference — one drifted split at t=0.99999991 opened the chain)
    va_idx = {(float(x), float(y)): i for i, (x, y) in enumerate(a0)}
    for j, (x, y) in enumerate(b0):
        p = (float(x), float(y))
        i = va_idx.get(p)
        if i is not None:
            rec_a.append((float(i), p))
            rec_b.append((float(j), p))
    # vertex snap radius: crossing solutions of NEAR-parallel edge pairs
    # that truly meet at a shared endpoint amplify roundoff by 1/denom —
    # snap computed points within eps of an input vertex onto it (both
    # param and position), keeping endpoints bitwise-shared
    eps = 1e-9 * max(
        1.0,
        float(np.abs(a).max(initial=0.0)),
        float(np.abs(b).max(initial=0.0)),
    )
    for i, j in zip(*np.nonzero(ok)):
        # edges sharing a bitwise endpoint: the unique intersection of a
        # non-parallel pair IS that endpoint (already recorded above) —
        # the computed solution is pure 1/denom noise; drop it
        ea0 = (float(a0[i, 0]), float(a0[i, 1]))
        ea1 = (float(a1[i, 0]), float(a1[i, 1]))
        eb0 = (float(b0[j, 0]), float(b0[j, 1]))
        eb1 = (float(b1[j, 0]), float(b1[j, 1]))
        if ea0 == eb0 or ea0 == eb1 or ea1 == eb0 or ea1 == eb1:
            continue
        ti, uj = float(t[i, j]), float(u[i, j])
        px = float(a0[i, 0] + ti * d1[i, 0])
        py = float(a0[i, 1] + ti * d1[i, 1])
        for vx, vy, s_t, s_u in (
            (float(b0[j, 0]), float(b0[j, 1]), None, 0.0),
            (float(b1[j, 0]), float(b1[j, 1]), None, 1.0),
            (float(a0[i, 0]), float(a0[i, 1]), 0.0, None),
            (float(a1[i, 0]), float(a1[i, 1]), 1.0, None),
        ):
            if abs(px - vx) <= eps and abs(py - vy) <= eps:
                px, py = vx, vy
                if s_t is not None:
                    ti = s_t
                if s_u is not None:
                    uj = s_u
                # the snapped vertex may be shared by BOTH rings: clamp
                # the other param too when the point equals its vertex
                for w, val in ((0.0, (b0[j, 0], b0[j, 1])),
                               (1.0, (b1[j, 0], b1[j, 1]))):
                    if (px, py) == (float(val[0]), float(val[1])):
                        uj = w
                for w, val in ((0.0, (a0[i, 0], a0[i, 1])),
                               (1.0, (a1[i, 0], a1[i, 1]))):
                    if (px, py) == (float(val[0]), float(val[1])):
                        ti = w
                break
        rec_a.append(((i + ti) % na, (px, py)))
        rec_b.append(((j + uj) % nb, (px, py)))
    # collinear overlaps: parallel AND b0 on the a-edge's carrier line.
    # Both tests use the same normalized tolerance as `par` above so the
    # ulp-collinear shared-arc pairs excluded from the crossing branch
    # land here (their projections are then exact to the ulp); parallel
    # pairs on DISTINCT carriers match neither branch — their contact is
    # measure-zero at this precision model.
    _sep = np.hypot(dx, dy)
    coll = par & (
        np.abs(d1[:, None, 0] * dy - d1[:, None, 1] * dx)
        <= 1e-12 * _an[:, None] * np.maximum(_sep, _bn[None, :])
    )
    for i, j in zip(*np.nonzero(coll)):
        L2a = float(d1[i, 0] ** 2 + d1[i, 1] ** 2)
        L2b = float(d2[j, 0] ** 2 + d2[j, 1] ** 2)
        if L2a == 0.0 or L2b == 0.0:
            continue
        tb0 = float((dx[i, j] * d1[i, 0] + dy[i, j] * d1[i, 1]) / L2a)
        tb1 = float(
            ((b1[j, 0] - a0[i, 0]) * d1[i, 0] + (b1[j, 1] - a0[i, 1]) * d1[i, 1])
            / L2a
        )
        lo, hi = max(0.0, min(tb0, tb1)), min(1.0, max(tb0, tb1))
        if lo > hi:
            continue
        if hi > lo:
            codir = float(d1[i, 0] * d2[j, 0] + d1[i, 1] * d2[j, 1]) > 0.0
            iv_a.append((i + lo, i + hi, codir))
            # the same overlap as a b-chain interval: project both
            # endpoints onto edge j (clamped like the rec_b params below)
            u_ends = []
        else:
            u_ends = None
        for tt in (lo, hi):
            # overlap endpoints are always input vertices of one ring
            if tt == tb0:
                pt = (float(b0[j, 0]), float(b0[j, 1]))
            elif tt == tb1:
                pt = (float(b1[j, 0]), float(b1[j, 1]))
            elif tt == 0.0:
                pt = (float(a0[i, 0]), float(a0[i, 1]))
            else:  # tt == 1.0
                pt = (float(a1[i, 0]), float(a1[i, 1]))
            uu = float(
                ((pt[0] - b0[j, 0]) * d2[j, 0] + (pt[1] - b0[j, 1]) * d2[j, 1])
                / L2b
            )
            uu = min(max(uu, 0.0), 1.0)
            if u_ends is not None:
                u_ends.append(uu)
            rec_a.append(((i + tt) % na, pt))
            rec_b.append(((j + uu) % nb, pt))
        if u_ends is not None:
            iv_b.append((j + min(u_ends), j + max(u_ends), codir))

    def dedup(recs):
        if not recs:
            return np.empty(0), []
        recs = sorted(recs, key=lambda r: r[0])
        pos: list[float] = []
        pts: list[tuple] = []
        seen: set[tuple] = set()
        for p, pt in recs:
            if pt in seen:
                continue
            seen.add(pt)
            pos.append(p)
            pts.append(pt)
        return np.asarray(pos), pts

    (pos_a, pts_a), (pos_b, pts_b) = dedup(rec_a), dedup(rec_b)
    return (pos_a, pts_a, iv_a), (pos_b, pts_b, iv_b)


def _classified_fragments(
    ring: np.ndarray, positions: np.ndarray, points: list, other: np.ndarray,
    keep_shared: bool, shared_ivals: list[tuple[float, float, bool]],
    keep_inside: bool = True,
):
    """Fragments of `ring` between consecutive split positions, keeping
    those inside `other` — and, when keep_shared, fragments lying ON
    `other`'s boundary traversed CODIRECTIONALLY (same-direction shared
    edges bound the intersection region once; anti-directional contact is
    measure-zero). Fragment interiors touch the other boundary only at
    endpoints (every contact is a split), so the first-segment midpoint
    classifies the whole fragment.

    Shared-ness is STRUCTURAL: a fragment is on the other boundary iff
    its position interval lies inside one of the exact collinear-overlap
    intervals `_pair_splits` recorded (plus an eps=0 exact-collinearity
    midpoint fallback). An ε-metric midpoint-near-edge test here is
    wrong: for two near-parallel edges an interior fragment's midpoint
    can sit within ε of the other edge, and the keep_shared=False side
    then drops real boundary, leaving an open chain (the round-4
    non-commutativity counterexample — angles {0,1,2} vs {1,2,6e-8})."""
    n_edges = len(ring) - 1
    k = len(positions)
    frags = []
    for s in range(k):
        e = (s + 1) % k
        p_start, p_end = points[s], points[e]
        pos_s, pos_e = positions[s], positions[e]
        coords = [p_start]
        v = int(np.floor(pos_s)) + 1
        end_pos = pos_e if e > s else pos_e + n_edges
        while v <= int(np.ceil(end_pos)) - 1:
            c = (float(ring[v % n_edges, 0]), float(ring[v % n_edges, 1]))
            if c != coords[-1]:
                coords.append(c)
            v += 1
        if p_end != coords[-1]:
            coords.append(p_end)
        if len(coords) < 2:
            continue
        shared_dir = None
        for lo, hi, codir in shared_ivals:
            # positions and interval bounds derive from the same split
            # records; tolerance only absorbs %n vs unwrapped ulps
            if lo - 1e-9 <= pos_s and end_pos <= hi + 1e-9:
                shared_dir = codir
                break
        # classify by the midpoint of the LONGEST segment: any segment's
        # midpoint is semantically equivalent (fragment interiors touch
        # the other boundary only at endpoints), and the longest is
        # numerically farthest from the endpoint contact degeneracies —
        # a short first segment's midpoint can underflow onto the other
        # ring's boundary carrier (denormal halving) where the even-odd
        # parity test wobbles
        _best, _bl = 0, -1.0
        for _k in range(len(coords) - 1):
            _dx = coords[_k + 1][0] - coords[_k][0]
            _dy = coords[_k + 1][1] - coords[_k][1]
            _l = _dx * _dx + _dy * _dy
            if _l > _bl:
                _best, _bl = _k, _l
        mid = (
            (coords[_best][0] + coords[_best + 1][0]) / 2.0,
            (coords[_best][1] + coords[_best + 1][1]) / 2.0,
        )
        if shared_dir is None:
            # exact-collinearity fallback (eps=0): catches shared runs
            # whose midpoint lands bitwise on the other edge (axis-
            # parallel lattice edges) if interval recording missed them
            edge_hit = _on_ring_edge(mid[0], mid[1], other, 0.0)
            if edge_hit is not None:
                fdir = (
                    coords[_best + 1][0] - coords[_best][0],
                    coords[_best + 1][1] - coords[_best][1],
                )
                _, odir = edge_hit
                shared_dir = fdir[0] * odir[0] + fdir[1] * odir[1] > 0
        if shared_dir is not None:
            if keep_shared and shared_dir:
                frags.append(coords)
            continue
        inside = bool(
            points_in_polygon(
                np.array([mid[0]]), np.array([mid[1]]), [other]
            )[0]
        )
        if inside == keep_inside:
            frags.append(coords)
    return frags


def ring_intersection(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    """Intersection region boundary rings of two simple closed rings
    (the engine's JTS-intersection analog, Geo.java:185-191).

    Exact for simple rings including float-exact degeneracies (shared
    vertices, vertex-on-edge T-contacts, collinear overlapping edges):
    both rings split at EVERY boundary contact with vertex-snapped
    points; result fragments = a-fragments inside-or-codirectionally-on
    b ∪ b-fragments strictly inside a, stitched and pinch-split.
    Anti-directional edge contact (side-by-side neighbors) contributes
    nothing (the overlap is measure-zero — JTS would return the shared
    LineString, which polygon measures also count as zero).
    No contact at all → containment decides: a⊂b → [a], b⊂a → [b],
    else disjoint → []."""
    a, b = _prep_pair(a, b)
    if a is None or b is None:
        return []
    # canonical argument order (bytewise) makes the result caller-order
    # independent even where ε-classification is direction-sensitive
    if a.tobytes() > b.tobytes():
        a, b = b, a
    (pos_a, pts_a, iv_a), (pos_b, pts_b, iv_b) = _pair_splits(a, b)
    if len(pos_a) == 0 and len(pos_b) == 0:
        if points_in_ring(a[:1, 0], a[:1, 1], b)[0]:
            return [a]
        if points_in_ring(b[:1, 0], b[:1, 1], a)[0]:
            return [b]
        return []

    def attempt(x, px_, Px_, ivx, y, py_, Py_, ivy, snap_eps=0.0):
        frags_x = _classified_fragments(
            x, px_, Px_, y, keep_shared=True, shared_ivals=ivx
        )
        frags_y = _classified_fragments(
            y, py_, Py_, x, keep_shared=False, shared_ivals=ivy
        )
        drops: list = []
        return _stitch(frags_x + frags_y, dropped=drops,
                       snap_eps=snap_eps), drops

    rings, drops = attempt(a, pos_a, pts_a, iv_a, b, pos_b, pts_b, iv_b)
    if drops:
        # an open chain means an ε-asymmetric on-boundary classification
        # (micro-fragment exactly on one ring's edge by rounding but not
        # the reverse) broke closure — the swapped-role pass takes the
        # other rounding path, which closes in most observed cases; keep
        # whichever stitch is complete
        rings2, drops2 = attempt(b, pos_b, pts_b, iv_b, a, pos_a, pts_a, iv_a)
        if not drops2:
            rings = rings2
        else:
            # BOTH exact orders broke closure: near-coincident boundary
            # degeneracy (e.g. spike tips of both rings within ~1e-7 —
            # each tip's bridge micro-fragment genuinely pokes outside
            # the other ring, so parity drops it on both sides; round-5
            # 64× soak counterexample). Snap-stitch with a chord bound
            # relative to the coordinate scale — losing a ≤1e-8·scale
            # sliver beats dropping the whole region.
            snap = 1e-8 * max(
                1.0, float(np.abs(a).max()), float(np.abs(b).max())
            )
            rings3, drops3 = attempt(
                a, pos_a, pts_a, iv_a, b, pos_b, pts_b, iv_b, snap_eps=snap
            )
            if not drops3:
                rings = rings3
    from ..kernels.geometry_builder import split_self_touching_ring

    out = []
    for r in rings:
        out.extend(split_self_touching_ring(r))
    # pinch-splitting re-derives orientation; results must be CCW like
    # the pre-split stitch output
    return [_ring_ccw(r) for r in out]


def ring_union_pair(
    a: np.ndarray,
    b: np.ndarray,
    pockets: list[np.ndarray] | None = None,
) -> list[np.ndarray] | None:
    """Union boundary rings of two simple closed rings, or None when the
    rings are disjoint (callers keep them separate). Same split/classify/
    stitch machinery as ring_intersection with the inside test flipped:
    union boundary = a-fragments outside-or-codirectionally-on b ∪
    b-fragments strictly outside a. Anti-directional shared edges
    (side-by-side neighbors) belong to neither boundary — both sides drop
    them and the stitch walks straight through the joint.

    Used to merge overlapping hole fragments in clip_polygon_to_polygon
    so their overlap is subtracted once (JTS-intersection parity for
    polygons whose subject and clip holes overlap, Geo.java:185-191).

    A region fully ENCLOSED between two interlocking non-convex rings is
    a hole of the union: the stitch emits it clockwise. When `pockets`
    is a list, those rings are appended to it (CCW-normalized) so the
    caller can account for them — area(a∪b) = Σ returned − Σ pockets;
    without a collector they are dropped from the returned boundary
    (the returned CCW rings alone then over-cover by the pocket area)."""
    a, b = _prep_pair(a, b)
    if a is None and b is None:
        return None
    if a is None:
        return [b]
    if b is None:
        return [a]
    # canonical order + swapped-role retry, as in ring_intersection
    if a.tobytes() > b.tobytes():
        a, b = b, a
    (pos_a, pts_a, iv_a), (pos_b, pts_b, iv_b) = _pair_splits(a, b)
    if len(pos_a) == 0 and len(pos_b) == 0:
        if points_in_ring(a[:1, 0], a[:1, 1], b)[0]:
            return [b]
        if points_in_ring(b[:1, 0], b[:1, 1], a)[0]:
            return [a]
        return None

    def attempt(x, px_, Px_, ivx, y, py_, Py_, ivy, snap_eps=0.0):
        frags_x = _classified_fragments(
            x, px_, Px_, y, keep_shared=True, shared_ivals=ivx,
            keep_inside=False,
        )
        frags_y = _classified_fragments(
            y, py_, Py_, x, keep_shared=False, shared_ivals=ivy,
            keep_inside=False,
        )
        if not frags_x and not frags_y:
            return None, []
        drops: list = []
        return _stitch(frags_x + frags_y, dropped=drops,
                       snap_eps=snap_eps), drops

    rings, drops = attempt(a, pos_a, pts_a, iv_a, b, pos_b, pts_b, iv_b)
    if rings is None:
        # boundary-only contact with no exterior fragments (identical
        # rings): the union is either input
        return [a]
    if drops:
        rings2, drops2 = attempt(b, pos_b, pts_b, iv_b, a, pos_a, pts_a, iv_a)
        if rings2 is not None and not drops2:
            rings = rings2
        else:
            # both exact orders broke closure — same near-coincident
            # degeneracy + snap fallback as ring_intersection
            snap = 1e-8 * max(
                1.0, float(np.abs(a).max()), float(np.abs(b).max())
            )
            rings3, drops3 = attempt(
                a, pos_a, pts_a, iv_a, b, pos_b, pts_b, iv_b, snap_eps=snap
            )
            if rings3 is not None and not drops3:
                rings = rings3
    from ..kernels.geometry_builder import split_self_touching_ring

    out = []
    for r in rings:
        for piece in split_self_touching_ring(r):
            # CCW pieces bound the union; CW stitches are enclosed union
            # holes (pockets) — collected for the caller when asked
            p = np.asarray(piece, dtype=np.float64)
            area2 = np.sum(p[:-1, 0] * p[1:, 1] - p[1:, 0] * p[:-1, 1])
            if area2 > 0:
                out.append(p)
            elif area2 < 0 and pockets is not None:
                pockets.append(_ring_ccw(p))
    return out if out else None


def _ring_abs_area(r: np.ndarray) -> float:
    r = np.asarray(r, dtype=np.float64)
    return 0.5 * abs(
        float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
    )


def merge_overlapping_rings(
    pieces: list[np.ndarray],
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Union-merge a small set of rings pairwise until no two have a
    positive-area overlap. Returns (rings, pockets): the merged CCW
    boundary rings plus any union pockets — regions ENCLOSED between
    interlocking non-convex rings, which belong to neither of THAT
    merge's two operands. NOTE: a pocket minted early in the chain can
    be partially filled by a piece merged later, so the exact covered
    region is Σ rings − Σ (pocket − its overlaps with the ORIGINAL
    pieces); consumers must subtract those overlaps per pocket
    (clip_polygon_to_polygon does, via a depth-guarded self-clip) —
    Σ rings − Σ pockets alone under-covers by exactly the stale-filled
    parts. Touch-only contact
    (shared corner/edge) is NOT merged — the pieces subtract
    independently and correctly. Termination is by construction: a pair
    is only unioned when its intersection has positive area AND the
    union measurably reduces the covered total (else the pair is
    memoized as unmergeable); accepted merges strictly decrease the
    float total, so both branches are finite. Quadratic in the piece
    count — callers pass per-document hole fragments (a handful), never
    a distributed collection."""
    items: list[np.ndarray] = [np.asarray(p, dtype=np.float64) for p in pieces]
    pockets_out: list[np.ndarray] = []
    graveyard: list[np.ndarray] = []  # keeps replaced arrays alive so
    # id()-keyed no-merge memos can never alias a recycled address
    nomerge: set[frozenset] = set()
    while True:
        pair = None
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                key = frozenset((id(items[i]), id(items[j])))
                if key in nomerge:
                    continue
                inter = ring_intersection(items[i], items[j])
                if not inter or sum(_ring_abs_area(r) for r in inter) <= 0.0:
                    nomerge.add(key)
                    continue
                pair = (i, j, key)
                break
            if pair:
                break
        if pair is None:
            return items, pockets_out
        i, j, key = pair
        old = _ring_abs_area(items[i]) + _ring_abs_area(items[j])
        u_pockets: list[np.ndarray] = []
        u = ring_union_pair(items[i], items[j], pockets=u_pockets)
        eff = (
            sum(_ring_abs_area(r) for r in u)
            - sum(_ring_abs_area(p) for p in u_pockets)
            if u is not None
            else 0.0
        )
        if u is None or (
            len(u) >= 2 and eff >= old - 1e-12 * old
        ):
            nomerge.add(key)
            continue
        graveyard.append(items[i])
        graveyard.append(items[j])
        items = [it for k, it in enumerate(items) if k not in (i, j)]
        items.extend(np.asarray(r, dtype=np.float64) for r in u)
        pockets_out.extend(u_pockets)


def union_covered_area(pieces: list[np.ndarray]) -> float:
    """Exact planar area covered by the union of simple CCW rings (the
    dissolve primitive — JTS UnaryUnionOp + getArea in one step, without
    materializing the union geometry). Merge the rings pairwise
    (merge_overlapping_rings absorbs contained rings too, so the final
    ring set has disjoint interiors), then correct each union pocket:
    a pocket region is uncovered EXCEPT where an original piece reached
    into it, so subtract area(pocket − ⋃ pocket∩originals), computed
    with the same depth-guarded self-clip clip_polygon_to_polygon uses
    for its hole-merge pockets (subject = pocket with the overlaps as
    holes — the overlaps may themselves overlap, the hole-merge unions
    them exactly once)."""
    originals = [np.asarray(p, dtype=np.float64) for p in pieces]
    if not originals:
        return 0.0
    rings, pockets = merge_overlapping_rings(list(originals))
    total = sum(_ring_abs_area(r) for r in rings)
    for p in pockets:
        pa = _ring_abs_area(p)
        if pa <= 0.0:
            continue
        overlaps = [
            r
            for h in originals
            for r in ring_intersection(p, h)
            if _ring_abs_area(r) > 1e-12 * pa
        ]
        if not overlaps:
            total -= pa
            continue
        sub = clip_polygon_to_polygon([p, *overlaps], [p])
        unfilled = 0.0
        if sub is not None:
            polys = [sub[1]] if sub[0] == "Polygon" else sub[1]
            for poly in polys:
                unfilled += _ring_abs_area(poly[0]) - sum(
                    _ring_abs_area(h) for h in poly[1:]
                )
        total -= max(unfilled, 0.0)
    return total


def clip_polygon_to_polygon(
    subject_rings: list[np.ndarray],
    clip_rings: list[np.ndarray],
    _depth: int = 0,
):
    """Exact polygon∩polygon for simple polygons with holes (the engine's
    replacement for JTS Geometry.intersection in Geo.clip,
    Geo.java:185-191). Holes of either side are clipped against the other
    side's outer ring, union-merged where they overlap (so the overlap is
    subtracted exactly once), and assigned to the containing output
    ring. A region enclosed BETWEEN interlocking holes (a pocket of
    their union, inside neither hole) still belongs to the intersection:
    it is emitted as an island polygon of the MultiPolygon result —
    JTS-parity for the interlocking-hole case."""
    outers = ring_intersection(subject_rings[0], clip_rings[0])
    if not outers:
        return None
    hole_pieces: list[np.ndarray] = []
    for hole in list(subject_rings[1:]):
        hole_pieces.extend(ring_intersection(hole, clip_rings[0]))
    for hole in list(clip_rings[1:]):
        hole_pieces.extend(ring_intersection(hole, subject_rings[0]))
    island_polys: list[list[np.ndarray]] = []
    if len(hole_pieces) > 1:
        originals = list(hole_pieces)
        hole_pieces, pockets = merge_overlapping_rings(hole_pieces)
        # a pocket's interior is outside ITS OWN merge's two parents by
        # construction, but NOT necessarily (a) inside the clipped
        # region — parents carry outer-contact arcs, so a pocket can
        # straddle the output outers — or (b) outside EVERY hole: a
        # pocket minted between two pieces early in the merge chain can
        # be partially filled by a piece merged later. So each pocket is
        # clipped to the output outers, then any overlap with the
        # original hole pieces is SUBTRACTED via a depth-guarded
        # self-clip (subject = pocket with the overlaps as holes); what
        # remains joins the result as island polygons.
        for p in pockets:
            for outer in outers:
                for piece in ring_intersection(p, outer):
                    pa = _ring_abs_area(piece)
                    if pa <= 0.0:
                        continue
                    overlaps = [
                        r
                        for h in originals
                        for r in ring_intersection(piece, h)
                        if _ring_abs_area(r) > 1e-12 * pa
                    ]
                    if not overlaps:
                        island_polys.append([piece])
                    elif _depth < 2:
                        sub = clip_polygon_to_polygon(
                            [piece, *overlaps], [piece], _depth=_depth + 1
                        )
                        if sub is not None:
                            island_polys.extend(
                                [sub[1]] if sub[0] == "Polygon" else sub[1]
                            )
    # a hole ring is clipped against the OTHER side's outer only, so it
    # can straddle the output outer (the part of sh∩co that lies outside
    # the subject outer is not in the clipped region at all). Clip each
    # hole to each output outer and assign the pieces directly: every
    # emitted hole is then a subset of its outer (OGC-valid), membership
    # and outer−holes area are both exact, and no vertex-containment
    # owner heuristic is needed (a boundary-hugging sliver's vertices
    # can all sit ON the outer, where an exclusive inside test fails).
    polys = [[outer] for outer in outers]
    for h in hole_pieces:
        for oi, outer in enumerate(outers):
            for piece in ring_intersection(h, outer):
                if _ring_abs_area(piece) > 0.0:
                    polys[oi].append(piece)
    # island polygons were clipped to an output outer above and carry
    # their own holes where a later-merged piece reached into a pocket
    polys.extend(island_polys)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def intersect_aois(bbox1, poly1, bbox2, poly2):
    """Intersection of two AOIs (bbox and/or polygon/multipolygon,
    degrees) → (bbox, polygon) for the composed areaOfInterest semantics
    (MapReducer.java:242-270). A disjoint multi-piece overlap returns the
    multi-piece form (list of ring-lists; see aoi_pieces) — the JTS
    composition in the reference likewise yields a MultiPolygon. Empty
    intersections return a degenerate bbox (min > max) that matches no
    documents."""
    _EMPTY = ((1.0, 1.0, -1.0, -1.0), None)
    p1, p2 = aoi_pieces(poly1), aoi_pieces(poly2)

    if p1 is None and p2 is None:
        w = max(bbox1[0], bbox2[0])
        s = max(bbox1[1], bbox2[1])
        e = min(bbox1[2], bbox2[2])
        n = min(bbox1[3], bbox2[3])
        if w > e or s > n:
            return _EMPTY
        return (w, s, e, n), None
    if p1 is not None and p2 is None:
        p1, p2 = p2, p1
        bbox1, bbox2 = bbox2, bbox1
    if p1 is None:
        # bbox ∧ polygon piece(s): Sutherland–Hodgman each ring against
        # the (convex) bbox
        out: list[list[np.ndarray]] = []
        for rings in p2:
            outer = _clip_ring_bbox(rings[0], bbox1)
            if outer is None:
                continue
            rs = [outer]
            for h in rings[1:]:
                hc = _clip_ring_bbox(h, bbox1)
                if hc is not None:
                    rs.append(hc)
            out.append(rs)
    else:
        # polygon ∧ polygon, piecewise: input pieces are disjoint, so
        # pairwise intersections are disjoint too — concatenate
        out = []
        for ra in p1:
            for rb in p2:
                g = clip_polygon_to_polygon(ra, rb)
                if g is None:
                    continue
                out.extend([g[1]] if g[0] == "Polygon" else g[1])
    if not out:
        return _EMPTY
    return None, (out[0] if len(out) == 1 else out)


# ---------------------------------------------------------------------------
# polygon-AOI support (exact for points; segment-exact for lines)
# ---------------------------------------------------------------------------

def clip_line_to_polygon(coords: np.ndarray, rings: list[np.ndarray]):
    """Clip a polyline to a polygon by splitting segments at ring crossings
    and keeping the inside pieces (midpoint test). Exact for simple
    polygons; replaces JTS line∩polygon for the AOI-polygon case. Accepts
    the multi-piece AOI form (pieces are disjoint, so splitting at every
    ring of every piece plus the sniffed membership test stays exact)."""
    flat = (
        rings
        if not rings or isinstance(rings[0], np.ndarray)
        else [r for piece in rings for r in piece]
    )
    edges = []
    for ring in flat:
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
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
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
