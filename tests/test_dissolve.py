"""Dissolve (per-group polygon-union area): the ring-union machinery vs
an independent slab-sweep algorithm, plus the distributed Catalyst sweep.

The sweep reference here shares no code with geo/clip.py — agreement on
arbitrary overlapping/containing/frame-forming rectangles pins
merge_overlapping_rings' union accounting (including pocket minting and
pocket-fill correction) against ground truth. CLIP_PROP_SCALE=N soaks
the hypothesis suites N× (same knob as test_polygon_clip)."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oshdb_spark.geo.clip import union_covered_area

_PROP_SCALE = int(os.environ.get("CLIP_PROP_SCALE", "1"))


def rect_ring(x1, y1, x2, y2):
    return np.array(
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]], dtype=np.float64
    )


def sweep_area(rects):
    """Independent slab-sweep union area (pure python, no clip.py code)."""
    rects = [r for r in rects if r[0] < r[2] and r[1] < r[3]]
    if not rects:
        return 0.0
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    total = 0.0
    for xa, xb in zip(xs, xs[1:]):
        ivs = sorted((r[1], r[3]) for r in rects if r[0] <= xa and r[2] >= xb)
        cov, hi = 0.0, None
        for y1, y2 in ivs:
            if hi is None or y1 > hi:
                cov += y2 - y1
                hi = y2
            elif y2 > hi:
                cov += y2 - hi
                hi = y2
        total += cov * (xb - xa)
    return total


def rings_area(rects):
    return union_covered_area([rect_ring(*r) for r in rects])


FRAME = [(0, 0, 2, 10), (0, 0, 10, 2), (8, 0, 10, 10), (0, 8, 10, 10)]


class TestUnionCoveredArea:
    def test_single(self):
        assert rings_area([(0, 0, 4, 3)]) == 12.0

    def test_overlap_containment_disjoint(self):
        assert rings_area([(0, 0, 4, 4), (2, 2, 6, 6)]) == 28.0
        assert rings_area([(0, 0, 10, 10), (2, 2, 4, 4)]) == 100.0
        assert rings_area([(0, 0, 2, 2), (5, 5, 7, 7)]) == 8.0

    def test_frame_mints_pocket(self):
        # 4 overlapping walls enclose (2,2)-(8,8): union = 100 - 36
        assert rings_area(FRAME) == 64.0

    def test_pocket_with_disjoint_filler(self):
        assert rings_area(FRAME + [(4, 4, 6, 6)]) == 68.0

    def test_pocket_with_wall_reaching_filler(self):
        # (1,4,6,6) merges into the frame; its in-pocket part is 8
        assert rings_area(FRAME + [(1, 4, 6, 6)]) == 72.0

    def test_pocket_with_mutually_overlapping_fillers(self):
        # fillers (3,3,5,5)+(4,4,6,6) union to 7 inside the pocket
        assert rings_area(FRAME + [(3, 3, 5, 5), (4, 4, 6, 6)]) == 71.0


_coord = st.integers(min_value=0, max_value=18)


@st.composite
def _rect(draw):
    x1 = draw(_coord)
    y1 = draw(_coord)
    return (x1, y1, x1 + draw(st.integers(1, 8)), y1 + draw(st.integers(1, 8)))


class TestSweepDifferential:
    @given(st.lists(_rect(), min_size=1, max_size=8))
    @settings(max_examples=120 * _PROP_SCALE, deadline=None)
    def test_random_rects(self, rects):
        assert rings_area(rects) == pytest.approx(sweep_area(rects), abs=1e-9)

    @given(st.lists(_rect(), min_size=0, max_size=4))
    @settings(max_examples=80 * _PROP_SCALE, deadline=None)
    def test_frame_plus_random_fillers(self, fillers):
        # frame guarantees a pocket; random fillers exercise every fill
        # configuration (disjoint-in-pocket, wall-reaching, mutual
        # overlap, fully covering)
        rects = FRAME + fillers
        assert rings_area(rects) == pytest.approx(sweep_area(rects), abs=1e-9)


class TestDistributedDissolve:
    def test_rect_vs_rings_on_driver_corpus(self, spark):
        import __spark_entry__ as E

        sf = "/root/testdata/sf0.001"
        a = {r["grp"]: r["union_area"]
             for r in E.q_dissolve_rect(spark, sf).collect()}
        b = {r["grp"]: r["union_area"]
             for r in E.q_dissolve_rings(spark, sf).collect()}
        assert a == b and 100 in a

    def test_rect_union_area_basic(self, spark):
        from oshdb_spark.geo.dissolve import rect_union_area

        df = spark.createDataFrame(
            [(1, 0.0, 0.0, 4.0, 4.0), (1, 2.0, 2.0, 6.0, 6.0),
             (2, 0.0, 0.0, 1.0, 1.0), (2, 0.0, 0.0, 1.0, 1.0)],
            schema="grp long, x1 double, y1 double, x2 double, y2 double",
        )
        out = {r["grp"]: r["union_area"] for r in rect_union_area(df).collect()}
        assert out == {1: 28.0, 2: 1.0}
