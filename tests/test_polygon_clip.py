"""Exact polygon∩polygon clipping (geo.clip.ring_intersection /
clip_polygon_to_polygon) — the engine's replacement for JTS intersection
in Geo.clip (Geo.java:185-191)."""

from __future__ import annotations

import os

import numpy as np
import pytest

# soak multiplier: CLIP_PROP_SCALE=16 runs every hypothesis suite here at
# 16× its CI example budget (e.g. 60 → 960) for offline robustness soaks;
# default 1 keeps the committed gate fast
_PROP_SCALE = int(os.environ.get("CLIP_PROP_SCALE", "1"))

from oshdb_spark.geo.clip import (
    clip_polygon_to_polygon,
    intersect_aois,
    ring_intersection,
)
from oshdb_spark.kernels.aoi import AOI


def rect(w, s, e, n):
    return np.array([(w, s), (e, s), (e, n), (w, n), (w, s)], dtype=np.float64)


def shoelace(ring):
    r = np.asarray(ring)
    return 0.5 * abs(
        np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
    )


def rings_area(rings):
    return sum(shoelace(r) for r in rings)


class TestRingIntersection:
    def test_overlapping_rects(self):
        out = ring_intersection(rect(0, 0, 10, 10), rect(5, 5, 20, 20))
        assert len(out) == 1
        assert shoelace(out[0]) == pytest.approx(25.0)

    def test_contained(self):
        out = ring_intersection(rect(0, 0, 10, 10), rect(2, 2, 4, 4))
        assert len(out) == 1
        assert shoelace(out[0]) == pytest.approx(4.0)
        # symmetric
        out = ring_intersection(rect(2, 2, 4, 4), rect(0, 0, 10, 10))
        assert shoelace(out[0]) == pytest.approx(4.0)

    def test_disjoint(self):
        assert ring_intersection(rect(0, 0, 1, 1), rect(5, 5, 6, 6)) == []

    def test_triangle_square(self):
        tri = np.array([(0, 0), (10, 0), (0, 10), (0, 0)], dtype=np.float64)
        out = ring_intersection(tri, rect(-5, -5, 5, 5))
        # triangle ∩ square = the [0,5]x[0,5] corner minus the cut above
        # x+y=10 — entirely below the hypotenuse, so area = 25
        assert rings_area(out) == pytest.approx(25.0)

    def test_rotated_square_octagon(self):
        # diamond ∩ square → octagon
        d = np.array(
            [(5, -2), (12, 5), (5, 12), (-2, 5), (5, -2)], dtype=np.float64
        )
        out = ring_intersection(d, rect(0, 0, 10, 10))
        assert len(out) == 1
        assert len(out[0]) == 9  # 8 vertices + closing
        # square area 100 minus 4 cut corner triangles (3·3/2 each)
        assert shoelace(out[0]) == pytest.approx(100 - 4 * 4.5)

    def test_two_piece_intersection(self):
        # U-shaped subject crossing a bar → two disjoint pieces
        u = np.array(
            [(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10),
             (0, 10), (0, 0)],
            dtype=np.float64,
        )
        bar = rect(-1, 5, 11, 7)
        out = ring_intersection(u, bar)
        assert len(out) == 2
        assert rings_area(out) == pytest.approx(2 * 2 * 2.0)


class TestClipPolygonToPolygon:
    def test_hole_subtraction(self):
        subject = [rect(0, 0, 10, 10), rect(4, 4, 6, 6)]  # square with hole
        out = clip_polygon_to_polygon(subject, [rect(-5, -5, 20, 20)])
        assert out[0] == "Polygon"
        assert shoelace(out[1][0]) - shoelace(out[1][1]) == pytest.approx(96.0)

    def test_clip_hole_partial(self):
        subject = [rect(0, 0, 10, 10), rect(4, 4, 6, 6)]
        out = clip_polygon_to_polygon(subject, [rect(5, -5, 20, 20)])
        # right half: 5x10 minus right half of hole (1x2)
        assert out[0] == "Polygon"
        assert shoelace(out[1][0]) - sum(
            shoelace(r) for r in out[1][1:]
        ) == pytest.approx(50 - 2.0)

    def test_clip_polygon_with_holes(self):
        subject = [rect(0, 0, 10, 10)]
        clip = [rect(2, 2, 8, 8), rect(4, 4, 6, 6)]  # clip has a hole
        out = clip_polygon_to_polygon(subject, clip)
        assert out[0] == "Polygon"
        assert shoelace(out[1][0]) - sum(
            shoelace(r) for r in out[1][1:]
        ) == pytest.approx(36 - 4.0)

    def test_disjoint(self):
        assert clip_polygon_to_polygon([rect(0, 0, 1, 1)], [rect(5, 5, 6, 6)]) is None

    @staticmethod
    def _area(res):
        if res is None:
            return 0.0
        kind, data = res
        polys = [data] if kind == "Polygon" else data
        return sum(
            shoelace(p[0]) - sum(shoelace(h) for h in p[1:]) for p in polys
        )

    def test_overlapping_subject_clip_holes(self):
        # round-4 fix: subject hole [4,10]² and clip hole [8,14]² overlap
        # on [8,10]² (area 4) — subtracted ONCE: 400 - (36+36-4) = 332
        subj = [rect(0, 0, 20, 20), rect(4, 4, 10, 10)]
        clip = [rect(0, 0, 20, 20), rect(8, 8, 14, 14)]
        assert self._area(clip_polygon_to_polygon(subj, clip)) == pytest.approx(332.0)
        assert self._area(clip_polygon_to_polygon(clip, subj)) == pytest.approx(332.0)

    def test_nested_subject_clip_holes(self):
        # clip hole contained in subject hole: union is the subject hole
        subj = [rect(0, 0, 20, 20), rect(4, 4, 12, 12)]
        clip = [rect(0, 0, 20, 20), rect(6, 6, 10, 10)]
        assert self._area(clip_polygon_to_polygon(subj, clip)) == pytest.approx(400 - 64.0)
        assert self._area(clip_polygon_to_polygon(clip, subj)) == pytest.approx(400 - 64.0)

    def test_corner_touching_holes_terminate(self):
        # round-4 hang: corner-touching holes must NOT merge (their union
        # is two pieces) and the merge loop must terminate
        subj = [rect(0, 0, 20, 20), rect(2, 2, 4, 4)]
        clip = [rect(0, 0, 20, 20), rect(0, 0, 2, 2)]
        assert self._area(clip_polygon_to_polygon(subj, clip)) == pytest.approx(392.0)
        assert self._area(clip_polygon_to_polygon(clip, subj)) == pytest.approx(392.0)

    def test_denormal_offset_nested_holes(self):
        # round-4: h2 offset from h1's edge by a denormal — phase-2 snap
        # rounding makes the runs exactly coincident in both orders
        eps = 2.2250738585072004e-308
        h1 = rect(0, 0, 1, 2)
        h2 = rect(eps, 0, 1 + eps, 1)
        subj = [rect(0, 0, 20, 20), h1]
        clip = [rect(0, 0, 20, 20), h2]
        assert self._area(clip_polygon_to_polygon(subj, clip)) == pytest.approx(398.0)
        assert self._area(clip_polygon_to_polygon(clip, subj)) == pytest.approx(398.0)

    def test_three_chained_holes(self):
        # subject holes [2,6]² and clip holes [4,8]², [7,11]² chain-merge
        # into one region: |[2,6]²∪[4,8]²∪[7,11]²| = 16+16+16-4-1 = 43
        subj = [rect(0, 0, 20, 20), rect(2, 2, 6, 6)]
        clip = [rect(0, 0, 20, 20), rect(4, 4, 8, 8), rect(7, 7, 11, 11)]
        assert self._area(clip_polygon_to_polygon(subj, clip)) == pytest.approx(400 - 43.0)
        assert self._area(clip_polygon_to_polygon(clip, subj)) == pytest.approx(400 - 43.0)


class TestAoiPolygonClip:
    def test_polygon_clipped_exactly(self):
        aoi = AOI(polygon=[rect(0, 0, 10, 10).tolist()])
        g = ("Polygon", [rect(5, 5, 15, 15)])
        out = aoi.clip(g)
        assert out is not None and out[0] == "Polygon"
        assert shoelace(out[1][0]) == pytest.approx(25.0)

    def test_multipolygon_components(self):
        aoi = AOI(polygon=[rect(0, 0, 10, 10).tolist()])
        g = ("MultiPolygon", [[rect(5, 5, 15, 15)], [rect(20, 20, 30, 30)]])
        out = aoi.clip(g)
        assert out[0] == "Polygon"  # one surviving component
        assert shoelace(out[1][0]) == pytest.approx(25.0)


class TestIntersectAois:
    def test_bbox_bbox(self):
        b, p = intersect_aois((0, 0, 10, 10), None, (5, 5, 20, 20), None)
        assert b == (5, 5, 10, 10) and p is None

    def test_bbox_bbox_empty(self):
        b, p = intersect_aois((0, 0, 1, 1), None, (5, 5, 6, 6), None)
        assert b[0] > b[2]

    def test_bbox_polygon(self):
        tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
        b, p = intersect_aois((0, 0, 5, 5), None, None, [tri])
        assert b is None and p is not None
        assert shoelace(np.asarray(p[0])) == pytest.approx(25.0)

    def test_polygon_polygon(self):
        b, p = intersect_aois(
            None, [rect(0, 0, 10, 10).tolist()],
            None, [rect(5, 5, 20, 20).tolist()],
        )
        assert b is None
        assert shoelace(np.asarray(p[0])) == pytest.approx(25.0)


def u_shape():
    """Rectilinear U: arms x∈[0,10] and x∈[20,30] up to y=30, base y∈[0,10]."""
    return np.array(
        [(0, 0), (30, 0), (30, 30), (20, 30), (20, 10), (10, 10),
         (10, 30), (0, 30), (0, 0)],
        dtype=np.float64,
    )


class TestMultiPieceAoi:
    """Composed AOIs whose intersection is a disjoint MultiPolygon
    (reference: JTS Geometry.intersection in MapReducer.java:242-270)."""

    BAR = rect(-5, 15, 35, 25)  # crosses both U arms → 2 disjoint rects

    def _pieces(self):
        b, p = intersect_aois(None, [u_shape()], None, [self.BAR])
        assert b is None
        return p

    def test_intersection_is_multi(self):
        p = self._pieces()
        # multi form: list of ring-lists
        assert not isinstance(p[0], np.ndarray) and len(p) == 2
        assert sum(rings_area(piece) for piece in p) == pytest.approx(200.0)

    def test_point_and_bbox_predicates(self):
        from oshdb_spark.geo.clip import points_in_polygon
        from oshdb_spark.kernels.aoi import bbox_vs_polygon

        aoi = AOI(polygon=self._pieces())
        inb = points_in_polygon(
            np.array([5.0, 15.0, 25.0]), np.array([20.0, 20.0, 20.0]),
            aoi.polygon,
        )
        assert inb.tolist() == [True, False, True]
        assert bbox_vs_polygon((2, 17, 8, 23), aoi.polygon) == 1
        assert bbox_vs_polygon((12, 17, 18, 23), aoi.polygon) == 0
        assert bbox_vs_polygon((8, 17, 12, 23), aoi.polygon) == 2
        assert aoi.relation_of_bbox((2, 17, 8, 23)) == 1
        assert aoi.bbox == (0.0, 15.0, 30.0, 25.0)

    def test_clip_line_across_pieces(self):
        aoi = AOI(polygon=self._pieces())
        line = ("LineString",
                np.array([(-5.0, 20.0), (35.0, 20.0)], dtype=np.float64))
        out = aoi.clip(line)
        assert out[0] == "MultiLineString" and len(out[1]) == 2
        lengths = sorted(
            abs(np.asarray(seg)[-1, 0] - np.asarray(seg)[0, 0])
            for seg in out[1]
        )
        assert lengths == pytest.approx([10.0, 10.0])

    def test_clip_polygon_across_pieces(self):
        aoi = AOI(polygon=self._pieces())
        g = ("Polygon", [rect(-5, 10, 35, 40)])
        out = aoi.clip(g)
        assert out[0] == "MultiPolygon" and len(out[1]) == 2
        assert sum(rings_area(rs) for rs in out[1]) == pytest.approx(200.0)

    def test_view_composition_counts_add(self, spark):
        """Composed multi-piece AOI count == sum of per-piece counts
        (pieces are disjoint)."""
        from oshdb_spark.api.engine import OSHDB
        from oshdb_spark.model.history import SNAPSHOT_TS, docs_from_events

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        docs = docs_from_events(ev)

        # scale the U/bar to cover a large share of the ±180/±85 world so
        # the tiny sf0.001 snapshot population lands inside the pieces
        def sc(ring):
            r = np.asarray(ring, dtype=np.float64).copy()
            r[:, 0] = r[:, 0] * 11.0 - 170.0  # x∈[0,30] → [-170,160]
            r[:, 1] = r[:, 1] * 5.0 - 80.0    # y∈[0,30] → [-80,70]
            return r

        base = OSHDB(docs).snapshot_view().timestamps(SNAPSHOT_TS).osm_type("node")
        composed = (
            base.area_of_interest(polygon=[sc(u_shape())])
            .area_of_interest(polygon=[sc(self.BAR)])
        )
        assert composed._s.polygon is not None
        assert not isinstance(composed._s.polygon[0], np.ndarray)

        def counts(view):
            out = {}
            for r in view.aggregate_by_timestamp().count().collect():
                out[r[0]] = out.get(r[0], 0) + r[1]
            return out

        got = counts(composed)
        b, pieces = intersect_aois(
            None, [sc(u_shape())], None, [sc(self.BAR)]
        )
        per_piece = [counts(base.area_of_interest(polygon=piece))
                     for piece in pieces]
        want = {}
        for c in per_piece:
            for k, v in c.items():
                want[k] = want.get(k, 0) + v
        assert sum(got.values()) > 0
        assert got == want


def test_view_aoi_composition(spark):
    """area_of_interest composes by intersection (MapReducer.java:242-270)."""
    from oshdb_spark.api.engine import OSHDB
    from oshdb_spark.model.history import SNAPSHOT_TS, docs_from_events

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = docs_from_events(ev)

    def count(view):
        return {tuple(r) for r in view.aggregate_by_timestamp().count().collect()}

    base = OSHDB(docs).snapshot_view().timestamps(SNAPSHOT_TS).osm_type("node")
    composed = count(
        base.area_of_interest(bbox=(-90.0, -60.0, 90.0, 85.0))
        .area_of_interest(bbox=(-30.0, 0.0, 120.0, 90.0))
    )
    direct = count(base.area_of_interest(bbox=(-30.0, 0.0, 90.0, 85.0)))
    assert composed == direct


# ---------------------------------------------------------------------------
# property-based checks (hypothesis): random convex polygons are always in
# general position w.p. 1, so ring_intersection must satisfy the algebra
# ---------------------------------------------------------------------------

try:
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def convex_ring(cx, cy, r, angles):
    """Convex polygon from sorted angles on an ellipse around (cx, cy)."""
    pts = [
        (cx + r * np.cos(a), cy + 0.7 * r * np.sin(a))
        for a in sorted(angles)
    ]
    pts.append(pts[0])
    return np.asarray(pts, dtype=np.float64)


if HAVE_HYP:
    ring_strategy = st.tuples(
        st.floats(-50, 50), st.floats(-50, 50), st.floats(1, 30),
        st.lists(
            st.floats(0, 2 * np.pi), min_size=3, max_size=9, unique=True
        ),
    )

    @settings(max_examples=60 * _PROP_SCALE, deadline=None)
    @given(ring_strategy, ring_strategy)
    # round-4 falsifying example: near-shared-vertex rings (third vertex
    # offset by ~6e-8 rad) — ε-metric shared-edge classification dropped
    # a strictly-interior fragment in one argument order (area 1.083 vs 0)
    @example(
        a_spec=(0.0, 26.0, 2.0, [0.0, 1.0, 2.0]),
        b_spec=(0.0, 26.0, 2.0, [1.0, 2.0, 5.960464477539063e-08]),
    )
    def test_ring_intersection_properties(a_spec, b_spec):
        a = convex_ring(*a_spec)
        b = convex_ring(*b_spec)
        if shoelace(a) < 1e-9 or shoelace(b) < 1e-9:
            return  # below float noise entirely
        # no general-position precondition: shared-vertex / vertex-on-edge
        # inputs (hypothesis reuses values, so identical centers/angles DO
        # occur) are inside the supported class since the degeneracy
        # handling round; micro-slivers (areas down to 1e-9) are covered
        # since the canonical-order + swapped-role-retry round
        ab = ring_intersection(a, b)
        ba = ring_intersection(b, a)
        area_ab = rings_area(ab)
        area_ba = rings_area(ba)
        # commutative area
        assert area_ab == pytest.approx(area_ba, rel=1e-9, abs=1e-9)
        # bounded by both inputs
        assert area_ab <= min(shoelace(a), shoelace(b)) + 1e-9
        if shoelace(a) >= 1.0 and shoelace(b) >= 1.0:
            # convex ∩ convex is a single convex piece (or empty); for
            # micro-slivers the float boundary can pinch into several
            # noise-scale pieces, so the structural assert applies to
            # non-degenerate inputs only
            assert len(ab) <= 1

    def test_sliver_rings_commutative_after_role_retry():
        # round-4: two overlapping micro-sliver triangles (heights
        # ~1e-5). The eps=0 on-boundary fallback rounds asymmetrically
        # at the tip, so in ONE role order a micro-fragment classifies
        # "shared" on both sides and the stitch opens, losing the whole
        # 5.3e-8 region. The canonical order + swapped-role retry keeps
        # the closing direction.
        a = convex_ring(0.0, 0.0, 2.0, [0.0, 1.0, 1e-05])
        b = convex_ring(0.0, 1e-05, 2.0, [0.0, 1.0, 1.192092896e-07])
        sa = rings_area(ring_intersection(a, b))
        sb = rings_area(ring_intersection(b, a))
        assert sa == pytest.approx(sb, rel=1e-9, abs=1e-12)
        assert sa > 1e-8  # the overlap region survives

    rect_strategy = st.tuples(
        st.floats(0.0, 15.0), st.floats(0.0, 15.0),
        st.floats(1.0, 5.0), st.floats(1.0, 5.0),
    )

    @settings(max_examples=40 * _PROP_SCALE, deadline=None)
    @given(rect_strategy, rect_strategy)
    # round-4: bottom edges separated by a DENORMAL (5e-324) — the first
    # fragment segment's midpoint underflowed onto the other ring's
    # boundary carrier and mis-classified; longest-segment midpoints fix
    @example(h1=(0.0, 0.0, 1.25, 1.0), h2=(0.5, 5e-324, 1.0, 1.0))
    def test_clip_holes_area_commutative(h1, h2):
        # polygon-with-holes area commutativity incl. overlapping /
        # nested / touching subject-vs-clip holes (round-4 union merge)
        def hole(x, y, w, h):
            return rect(x, y, min(x + w, 19.0), min(y + h, 19.0))

        subj = [rect(0, 0, 20, 20), hole(*h1)]
        clip = [rect(0, 0, 20, 20), hole(*h2)]
        a1 = TestClipPolygonToPolygon._area(clip_polygon_to_polygon(subj, clip))
        a2 = TestClipPolygonToPolygon._area(clip_polygon_to_polygon(clip, subj))
        assert a1 == pytest.approx(a2, rel=1e-9, abs=1e-9)
        # analytic: 400 - |h1 ∪ h2|
        def ar(r):
            return (r[2][0] - r[0][0]) * (r[2][1] - r[0][1])

        def inter(r1, r2):
            w = min(r1[2][0], r2[2][0]) - max(r1[0][0], r2[0][0])
            h = min(r1[2][1], r2[2][1]) - max(r1[0][1], r2[0][1])
            return max(w, 0.0) * max(h, 0.0)

        r1, r2 = hole(*h1), hole(*h2)
        expect = 400.0 - (ar(r1) + ar(r2) - inter(r1, r2))
        assert a1 == pytest.approx(expect, rel=1e-9, abs=1e-9)

    star_strategy = st.tuples(
        st.floats(-20, 20), st.floats(-20, 20), st.floats(5, 15),
        st.floats(1, 4), st.integers(3, 7), st.floats(0, 6.28),
    )

    @settings(max_examples=60 * _PROP_SCALE, deadline=None)
    @given(star_strategy, star_strategy)
    # round-4 falsifying example: identical stars but for a 4e-9 outer-
    # radius delta — shared (bitwise) inner vertices with near-parallel
    # spike edges; a 1/denom-amplified crossing solution drifted 4e-7
    # from the shared vertex and opened the stitch chain in one
    # argument order (fixed by recording shared vertices structurally)
    @example(
        a_spec=(0.0, 0.0, 5.0, 1.0, 3, 0.0),
        b_spec=(0.0, 0.0, 5.000000004128768, 1.0, 3, 0.0),
    )
    # round-5 falsifying example (64× soak): near-identical 7-point
    # stars (~1e-7 center/rotation offsets) — the reconstructed a⊂b
    # intersection's area exceeded area(a) by 1.3e-9 ABSOLUTE (6e-11
    # relative) through micro-chord geometry at the shared tips; the
    # area-bound assertion below carries a matching relative term
    @example(
        a_spec=(1.192092896e-07, 0.0, 5.0, 1.75, 7, 1.192092896e-07),
        b_spec=(1.192092896e-07, 1.192092896e-07, 5.0, 2.0, 7,
                1.192092896e-07),
    )
    def test_ring_intersection_nonconvex_commutative(a_spec, b_spec):
        # alternating-radius stars: simple NON-convex rings — multi-piece
        # intersections, concave pockets, repeated hypothesis values give
        # shared-vertex/identical-ring degeneracies (400-example offline
        # stress clean at round 4)
        def star(cx, cy, r1, r2, n, rot):
            pts = []
            for i in range(2 * n):
                r = r1 if i % 2 == 0 else r2
                a = rot + np.pi * i / n
                pts.append((cx + r * np.cos(a), cy + 0.8 * r * np.sin(a)))
            pts.append(pts[0])
            return np.asarray(pts, dtype=np.float64)

        a = star(*a_spec)
        b = star(*b_spec)
        sa = rings_area(ring_intersection(a, b))
        sb = rings_area(ring_intersection(b, a))
        assert sa == pytest.approx(sb, rel=1e-9, abs=1e-9)
        # relative term: near-a⊂b inputs reconstruct a's whole boundary
        # through split points, whose accumulated rounding is relative
        # to the area (round-5 64× example: +6e-11 relative)
        bound = min(shoelace(a), shoelace(b))
        assert sa <= bound + 1e-9 + 1e-9 * bound

    def _star(cx, cy, r1, r2, n, rot):
        pts = []
        for i in range(2 * n):
            r = r1 if i % 2 == 0 else r2
            a = rot + np.pi * i / n
            pts.append((cx + r * np.cos(a), cy + 0.8 * r * np.sin(a)))
        pts.append(pts[0])
        return np.asarray(pts, dtype=np.float64)

    @settings(max_examples=60 * _PROP_SCALE, deadline=None)
    @given(star_strategy, star_strategy)
    # round-4 falsifying example: interlocking 4- and 3-point stars
    # enclose a pocket (a hole of the union) that belongs to NEITHER
    # ring — dropping it broke |a|+|b| = |a∪b| + |a∩b| by the pocket
    # area; ring_union_pair now hands pockets to the caller
    @example(
        a_spec=(0.0, 0.0, 5.0, 1.0, 4, 0.0),
        b_spec=(0.0, 3.0, 5.0, 1.0, 3, 0.0),
    )
    def test_union_intersection_inclusion_exclusion(a_spec, b_spec):
        from oshdb_spark.geo.clip import ring_union_pair

        a = _star(*a_spec)
        b = _star(*b_spec)
        inter = rings_area(ring_intersection(a, b))
        pockets = []
        u = ring_union_pair(a, b, pockets=pockets)
        if u is None:
            assert inter <= 1e-9
            return
        union = rings_area(u) - rings_area(pockets)
        lhs = shoelace(a) + shoelace(b)
        assert lhs == pytest.approx(union + inter, rel=1e-9, abs=1e-6)

    def test_interlocking_holes_emit_island():
        # subject and clip: same square outer, interlocking star holes
        # that enclose a pocket. The pocket is inside neither hole, so
        # the intersection keeps it — as an island polygon. Expected
        # area is exact: 1600 − |h1 ∪ h2| with the union measured by
        # the (independently stress-verified) inclusion-exclusion form.
        from oshdb_spark.geo.clip import clip_polygon_to_polygon, ring_union_pair

        h1 = _star(0.0, 0.0, 5.0, 1.0, 4, 0.0)
        h2 = _star(0.0, 3.0, 5.0, 1.0, 3, 0.0)
        sq = np.array(
            [(-20.0, -20.0), (20.0, -20.0), (20.0, 20.0), (-20.0, 20.0),
             (-20.0, -20.0)]
        )
        pockets = []
        union = rings_area(ring_union_pair(h1, h2, pockets=pockets))
        union -= rings_area(pockets)
        assert len(pockets) == 1  # the construction really interlocks

        def total(g):
            polys = [g[1]] if g[0] == "Polygon" else g[1]
            return sum(
                shoelace(np.asarray(p[0]))
                - sum(shoelace(np.asarray(h)) for h in p[1:])
                for p in polys
            ), polys

        a1, polys1 = total(clip_polygon_to_polygon([sq, h1], [sq, h2]))
        a2, polys2 = total(clip_polygon_to_polygon([sq, h2], [sq, h1]))
        assert a1 == pytest.approx(1600.0 - union, rel=1e-12, abs=1e-6)
        assert a1 == pytest.approx(a2, rel=1e-12, abs=1e-9)
        # island present: one polygon beyond the holed square
        assert len(polys1) == 2 and len(polys2) == 2

    _GX, _GY = np.meshgrid(np.linspace(-25, 25, 60), np.linspace(-25, 25, 60))
    _GX, _GY = _GX.ravel(), _GY.ravel()

    @settings(max_examples=40 * _PROP_SCALE, deadline=None)
    @given(star_strategy, star_strategy, star_strategy, star_strategy)
    # round-4 falsifying examples, in discovery order: (1) hole piece
    # dropped because its first vertex sits ON the output outer,
    # (2) pocket island straddling the output outer, (3) assignment of
    # a boundary-hugging sliver whose vertices are all on/outside the
    # outer, (4) ulp-collinear shared-arc edge pair emitting a 1/denom
    # noise crossing that displaced a real contact to a wrong chain
    # position
    @example(so=(0.0, 0.0, 5.0, 1.0, 3, 0.0), sh=(0.0, 0.0, 5.0, 1.0, 3, 0.0),
             co=(0.0, 0.0, 5.0, 1.0, 3, 0.0), ch=(0.0, 7.0, 5.0, 1.0, 3, 0.0))
    @example(so=(5.0, -6.625, 5.0, 1.0, 3, 2.5), sh=(0.0, 1.0, 5.0, 1.0, 5, 0.0),
             co=(0.0, 0.0, 5.0, 1.0, 3, 0.0), ch=(0.0, 0.0, 5.0, 1.0, 4, 2.0))
    @example(so=(0.0, 0.0, 5.0, 1.0, 6, 0.0), sh=(0.0, 7.0, 7.0, 1.0, 3, 0.0),
             co=(0.0, 0.0, 5.0, 1.0, 7, 0.0), ch=(0.0, 0.0, 5.0, 1.0, 3, 0.0))
    @example(so=(0.0, 0.0, 5.0, 1.0, 3, 0.0), sh=(0.0, 0.0, 5.0, 1.0, 3, 0.0),
             co=(0.0, 7.0, 11.0, 1.0, 7, 0.0), ch=(-1.0, 0.0, 7.0, 1.0, 6, 0.0))
    def test_polygon_clip_membership_differential(so, sh, co, ch):
        # end-to-end oracle: a grid point is in the clipped result IFF
        # it is in subject AND clip (boundary-near points excused); area
        # must be subject/clip commutative
        from oshdb_spark.geo.clip import clip_polygon_to_polygon, points_in_ring

        def member(rings, px, py):
            m = points_in_ring(px, py, rings[0])
            for h in rings[1:]:
                m &= ~points_in_ring(px, py, h)
            return m

        def member_geom(g, px, py):
            if g is None:
                return np.zeros(len(px), dtype=bool)
            polys = [g[1]] if g[0] == "Polygon" else g[1]
            m = np.zeros(len(px), dtype=bool)
            for p in polys:
                m |= member(p, px, py)
            return m

        def geom_area(g):
            if g is None:
                return 0.0
            polys = [g[1]] if g[0] == "Polygon" else g[1]
            return sum(
                shoelace(np.asarray(p[0]))
                - sum(shoelace(np.asarray(h)) for h in p[1:])
                for p in polys
            )

        subj = [_star(so[0], so[1], so[2] + 8, so[3] + 6, so[4], so[5]),
                _star(*sh)]
        clip = [_star(co[0], co[1], co[2] + 8, co[3] + 6, co[4], co[5]),
                _star(*ch)]
        g = clip_polygon_to_polygon(subj, clip)
        want = member(subj, _GX, _GY) & member(clip, _GX, _GY)
        got = member_geom(g, _GX, _GY)
        bad = want != got
        if bad.any():
            # excuse only points within float-noise of some input edge
            d = np.full(int(bad.sum()), np.inf)
            px, py = _GX[bad], _GY[bad]
            for r in subj + clip:
                e0, e1 = r[:-1], r[1:]
                for k in range(len(e0)):
                    dx, dy = e1[k, 0] - e0[k, 0], e1[k, 1] - e0[k, 1]
                    L2 = max(dx * dx + dy * dy, 1e-300)
                    t = np.clip(
                        ((px - e0[k, 0]) * dx + (py - e0[k, 1]) * dy) / L2,
                        0, 1,
                    )
                    d = np.minimum(
                        d,
                        np.hypot(px - (e0[k, 0] + t * dx),
                                 py - (e0[k, 1] + t * dy)),
                    )
            assert not (d > 1e-6).any()
        g2 = clip_polygon_to_polygon(clip, subj)
        assert geom_area(g) == pytest.approx(
            geom_area(g2), rel=1e-9, abs=1e-6
        )

    _hole_strategy = st.tuples(
        st.floats(-6, 6), st.floats(-6, 6), st.floats(2, 7),
        st.floats(0.5, 2), st.integers(3, 6), st.floats(0, 6.28))
    _outer_strategy = st.tuples(
        st.floats(-4, 4), st.floats(-4, 4), st.floats(12, 18),
        st.floats(6, 9), st.integers(3, 7), st.floats(0, 6.28))

    @settings(max_examples=25 * _PROP_SCALE, deadline=None)
    @given(_outer_strategy, _hole_strategy, _hole_strategy,
           _outer_strategy, _hole_strategy, _hole_strategy)
    # round-4 falsifying example: duplicate subject holes — a pocket
    # minted between two pieces early in the merge chain was partially
    # FILLED by a piece merged later; the old all-or-nothing covered
    # test dropped the whole pocket, losing the genuine island remnant.
    # Pockets now subtract their original-hole overlaps via a
    # depth-guarded self-clip.
    @example(so=(0.0, 0.0, 12.0, 6.0, 3, 0.0), s1=(0.0, 0.0, 2.0, 1.0, 3, 0.0),
             s2=(0.0, 0.0, 2.0, 1.0, 3, 0.0), co=(0.0, 0.0, 12.0, 6.0, 3, 0.0),
             c1=(0.0, 0.0, 4.0, 1.0, 5, 0.0), c2=(0.0, 3.0, 3.0, 1.0, 3, 0.0))
    # round-5 falsifying example (64× soak): subject and clip outers are
    # stars whose 3 spike tips coincide within ~1e-7 — each tip's bridge
    # micro-fragment pokes outside the OTHER ring, so parity dropped it
    # on both role orders, opening the stitch chain and collapsing the
    # whole intersection to None. Fixed by the last-resort snap-stitch
    # (micro-chord ≤ 1e-8·scale) engaged only when both exact orders
    # leave open chains.
    @example(so=(-1.192092896e-07, 5.960464477539063e-08, 18.0, 6.0, 3, 0.0),
             s1=(0.0, 0.0, 2.0, 1.0, 3, 0.0),
             s2=(0.0, 0.0, 2.0, 1.0, 3, 0.0),
             co=(0.0, 0.0, 18.0, 9.0, 3, 0.0),
             c1=(0.0, 0.0, 2.0, 1.0, 3, 0.0),
             c2=(0.0, 0.0, 2.0, 1.0, 3, 0.0))
    def test_polygon_clip_two_holes_membership(so, s1, s2, co, c1, c2):
        # same end-to-end oracle as above, with TWO holes per side so
        # the merge chain (and its pocket accounting) is exercised
        from oshdb_spark.geo.clip import clip_polygon_to_polygon, points_in_ring

        def member(rings, px, py):
            m = points_in_ring(px, py, rings[0])
            for h in rings[1:]:
                m &= ~points_in_ring(px, py, h)
            return m

        subj = [_star(*so), _star(*s1), _star(*s2)]
        clip = [_star(*co), _star(*c1), _star(*c2)]
        g = clip_polygon_to_polygon(subj, clip)
        want = member(subj, _GX, _GY) & member(clip, _GX, _GY)
        got = np.zeros(len(_GX), dtype=bool)
        if g is not None:
            for p in ([g[1]] if g[0] == "Polygon" else g[1]):
                got |= member(p, _GX, _GY)
        bad = want != got
        if bad.any():
            d = np.full(int(bad.sum()), np.inf)
            px, py = _GX[bad], _GY[bad]
            for r in subj + clip:
                e0, e1 = r[:-1], r[1:]
                for k in range(len(e0)):
                    ddx, ddy = e1[k, 0] - e0[k, 0], e1[k, 1] - e0[k, 1]
                    L2 = max(ddx * ddx + ddy * ddy, 1e-300)
                    t = np.clip(
                        ((px - e0[k, 0]) * ddx + (py - e0[k, 1]) * ddy) / L2,
                        0, 1,
                    )
                    d = np.minimum(
                        d,
                        np.hypot(px - (e0[k, 0] + t * ddx),
                                 py - (e0[k, 1] + t * ddy)),
                    )
            assert not (d > 1e-6).any()

    @settings(max_examples=30 * _PROP_SCALE, deadline=None)
    @given(ring_strategy, st.floats(0.1, 0.9))
    def test_ring_intersection_containment(spec, scale):
        cx, cy, r, angles = spec
        outer = convex_ring(cx, cy, r, angles)
        if shoelace(outer) < 1.0:
            return  # sliver: scaled copy's clearance is below float noise
        # scale about the CENTROID (always interior for a convex ring —
        # the ellipse center is not when the angles span < pi)
        gx, gy = outer[:-1, 0].mean(), outer[:-1, 1].mean()
        inner = outer.copy()
        inner[:, 0] = gx + (inner[:, 0] - gx) * scale
        inner[:, 1] = gy + (inner[:, 1] - gy) * scale
        out = ring_intersection(outer, inner)
        assert rings_area(out) == pytest.approx(shoelace(inner), rel=1e-9)


class TestDegeneratePositions:
    """Shared vertices, T-contacts, collinear overlaps — the cases real
    OSM data produces constantly (adjacent buildings, admin boundaries
    following roads). JTS handles these in the reference (Geo.java:
    185-191); ring_intersection must too."""

    def test_identical_rings(self):
        r = rect(0, 0, 10, 10)
        out = ring_intersection(r, r.copy())
        assert rings_area(out) == pytest.approx(100.0)

    def test_near_shared_vertex_commutative(self):
        # round-4 judge counterexample pinned deterministically: two
        # ellipse triangles sharing 2 vertices, third vertices ~1.7e-7
        # apart — both orders must return the ~full-triangle overlap
        def ring(angles):
            pts = [
                (2.0 * np.cos(a), 26.0 + 1.4 * np.sin(a))
                for a in sorted(angles)
            ]
            pts.append(pts[0])
            return np.asarray(pts, dtype=np.float64)

        a = ring([0.0, 1.0, 2.0])
        b = ring([1.0, 2.0, 5.960464477539063e-08])
        area_ab = rings_area(ring_intersection(a, b))
        area_ba = rings_area(ring_intersection(b, a))
        assert area_ab == pytest.approx(area_ba, rel=1e-9, abs=1e-9)
        assert area_ab == pytest.approx(shoelace(a), rel=1e-6)

    def test_shared_edge_overlap(self):
        # B shares A's right edge segment and overlaps into A
        out = ring_intersection(rect(0, 0, 10, 10), rect(5, 0, 10, 10))
        assert rings_area(out) == pytest.approx(50.0)

    def test_adjacent_side_by_side(self):
        # neighbors sharing only an edge: measure-zero intersection
        out = ring_intersection(rect(0, 0, 10, 10), rect(10, 0, 20, 10))
        assert rings_area(out) == pytest.approx(0.0)

    def test_shared_corner_vertex_only(self):
        # touching at exactly one shared vertex
        out = ring_intersection(rect(0, 0, 10, 10), rect(10, 10, 20, 20))
        assert rings_area(out) == pytest.approx(0.0)

    def test_vertex_on_edge_t_contact(self):
        # triangle apex lies ON the square's top edge from inside
        tri = np.array([(2, 0), (8, 0), (5, 10), (2, 0)], dtype=np.float64)
        out = ring_intersection(tri, rect(0, 0, 10, 10))
        assert rings_area(out) == pytest.approx(shoelace(tri))

    def test_vertex_on_edge_crossing(self):
        # diamond whose left vertex lies exactly on the square's right
        # edge, extending outside
        d = np.array([(10, 5), (15, 2), (20, 5), (15, 8), (10, 5)],
                     dtype=np.float64)
        out = ring_intersection(rect(0, 0, 10, 10), d)
        assert rings_area(out) == pytest.approx(0.0)

    def test_partial_collinear_overlap(self):
        # B's bottom edge collinear with A's bottom edge, offset; B pokes
        # above into A
        out = ring_intersection(rect(0, 0, 10, 10), rect(5, 0, 15, 5))
        assert rings_area(out) == pytest.approx(25.0)

    def test_contained_sharing_an_edge(self):
        # inner rect flush against outer's bottom edge (collinear overlap
        # with containment)
        out = ring_intersection(rect(0, 0, 10, 10), rect(2, 0, 8, 4))
        assert rings_area(out) == pytest.approx(24.0)

    def test_cross_shape_four_t_contacts(self):
        # plus-sign bar through the square: both crossings hit corners
        out = ring_intersection(rect(0, 0, 10, 10), rect(0, 4, 10, 6))
        assert rings_area(out) == pytest.approx(20.0)

    def test_stacked_share_edge_and_overlap_region(self):
        # B sits on top of A sharing edge y=10... and also dips into A
        b = np.array([(0, 10), (4, 6), (8, 10), (10, 10), (10, 20),
                      (0, 20), (0, 10)], dtype=np.float64)
        out = ring_intersection(rect(0, 0, 10, 10), b)
        # intersection = triangle (0,10),(4,6),(8,10): area 16
        assert rings_area(out) == pytest.approx(16.0)

    def test_general_position_unaffected(self):
        # sanity: the pre-existing proper-crossing case is byte-stable
        out = ring_intersection(rect(0, 0, 10, 10), rect(5, 5, 20, 20))
        assert len(out) == 1
        assert shoelace(out[0]) == pytest.approx(25.0)
        assert {tuple(c) for c in out[0][:-1]} == {
            (5.0, 5.0), (10.0, 5.0), (10.0, 10.0), (5.0, 10.0)
        }


class TestBug206Golden:
    """Port of FastPolygonOperationsTest.testBug206 (fip/
    FastPolygonOperationsTest.java:44-56; upstream GIScience/oshdb
    PR#204): a real-world building outline against a neighbour sharing
    long collinear boundary stretches. The reference asserts the blocked
    intersection is non-null; we additionally assert commutativity and
    cross-check the area against a point-in-polygon Monte-Carlo grid."""

    def _load(self):
        from tests._bug206_wkt import (
            BUG206_POLY,
            BUG206_TEST,
            parse_wkt_polygon,
        )

        return parse_wkt_polygon(BUG206_POLY), parse_wkt_polygon(BUG206_TEST)

    @staticmethod
    def _area(res):
        if res is None:
            return 0.0
        kind, data = res
        polys = [data] if kind == "Polygon" else data
        return sum(
            shoelace(p[0]) - sum(shoelace(h) for h in p[1:]) for p in polys
        )

    def test_bug206_intersection(self):
        # upstream bug206 was a CRASH in the blocked intersection; the two
        # buildings share only collinear boundary stretches (zero area).
        # JTS returns the shared LineString (the reference's
        # assertNotNull); the engine's polygon-area convention returns
        # None for measure-zero contact (ring_intersection docstring) —
        # assert no crash, commutativity, and a Monte-Carlo zero area.
        from oshdb_spark.geo.clip import points_in_polygon

        poly, test = self._load()
        ab = clip_polygon_to_polygon(test, poly)
        ba = clip_polygon_to_polygon(poly, test)
        assert self._area(ab) == pytest.approx(self._area(ba), abs=1e-18)
        assert self._area(ab) == pytest.approx(0.0, abs=1e-12)

        # Monte-Carlo confirms the zero-area ground truth on a 512² grid
        t = test[0]
        minx, maxx = t[:, 0].min(), t[:, 0].max()
        miny, maxy = t[:, 1].min(), t[:, 1].max()
        xs, ys = np.meshgrid(
            np.linspace(minx, maxx, 512), np.linspace(miny, maxy, 512)
        )
        px, py = xs.ravel(), ys.ravel()
        in_both = points_in_polygon(px, py, test) & points_in_polygon(
            px, py, poly
        )
        assert int(in_both.sum()) == 0

    def test_bug206_shifted_overlap(self):
        # shift the neighbour 60% of its height south so a REAL area
        # overlap exists across the formerly-shared degenerate boundary —
        # the stress the collinear machinery must survive
        from oshdb_spark.geo.clip import points_in_polygon

        poly, test = self._load()
        t = test[0].copy()
        t[:, 1] -= 0.6 * (t[:, 1].max() - t[:, 1].min())
        ab = clip_polygon_to_polygon([t], poly)
        ba = clip_polygon_to_polygon(poly, [t])
        a_ab, a_ba = self._area(ab), self._area(ba)
        assert a_ab > 0
        assert a_ab == pytest.approx(a_ba, rel=1e-9)

        minx, maxx = t[:, 0].min(), t[:, 0].max()
        miny, maxy = t[:, 1].min(), t[:, 1].max()
        xs, ys = np.meshgrid(
            np.linspace(minx, maxx, 512), np.linspace(miny, maxy, 512)
        )
        px, py = xs.ravel(), ys.ravel()
        in_both = points_in_polygon(px, py, [t]) & points_in_polygon(
            px, py, poly
        )
        cell = ((maxx - minx) / 511) * ((maxy - miny) / 511)
        assert a_ab == pytest.approx(float(in_both.sum()) * cell, rel=0.05)
