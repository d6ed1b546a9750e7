"""Ports of the reference's grid-index JUnit suites — XYGridTest,
XYGridTreeTest, CellIdTest, OSHDBBoundingBoxTest — assertion for
assertion over `oshdb_spark.geo.cells` (tile-assignment parity is a
north-rule requirement).

Sources:
- oshdb/src/test/.../index/XYGridTest.java (point ids incl. borders and
  out-of-range, zoom clamping, bbox id, cell dimensions, estimated id
  count, bbox→id ranges incl. date-line, neighbours, static bbox)
- oshdb/src/test/.../index/XYGridTreeTest.java (multi-zoom point ids,
  insert id, multi-zoom bbox cover with/without enlarge)
- oshdb/src/test/.../util/CellIdTest.java (cells are (zoom, id) pairs)
- oshdb/src/test/.../util/OSHDBBoundingBoxTest.java (intersect / overlap
  / fixed-point accessors; the toString/hashCode cases are JVM identity
  formatting, not ported)

Engine bboxes are fixed-point int7 tuples; the reference's double ctor is
``Math.round(deg * 1e7)`` (OSHDBBoundingBox.java:70-75), reproduced by
``_b7`` below.
"""

import numpy as np
import pytest

from oshdb_spark.geo import cells
from oshdb_spark.geo import clip as C

P = cells.GEOM_PRECISION_TO_LONG


def _b7(minlon, minlat, maxlon, maxlat):
    return tuple(int(round(v * P)) for v in (minlon, minlat, maxlon, maxlat))


def _id(lon_deg, lat_deg, zoom):
    # XYGrid.getId(double,double) casts each coordinate after scaling:
    # (long)(deg * 1e7) truncates toward zero (XYGrid.java:122-123)
    return int(
        cells.xy_id(
            np.array([int(lon_deg * P)]), np.array([int(lat_deg * P)]), zoom
        )[0]
    )


class TestXYGridGolden:
    """XYGridTest.java ports."""

    def test_get_id_double_double(self):
        assert _id(0.0, 0.0, 2) == 6

    def test_out_of_range_is_invalid(self):
        assert _id(-181.0, -91.0, 2) == -1

    def test_corners_zoom0(self):
        assert _id(-180.0, -90.0, 0) == 0
        assert _id(180.0, 90.0, 0) == 0
        assert _id(179.0, 90.0, 0) == 0

    def test_corners_zoom2(self):
        assert _id(-180.0, -90.0, 2) == 0
        assert _id(180.0, 90.0, 2) == 4  # east border wraps west, top row
        assert _id(180.0 - 1.0 / P, 90.0, 2) == 7

    def test_zoom_clamped(self):
        # zoom 31 clamps to 30, zoom -1 clamps to 0 (XYGrid.java:96-105)
        assert _id(-180.0, -90.0, 31) == 0
        assert _id(180.0, 90.0, -1) == 0

    def test_zoom30_corners(self):
        assert _id(-180.0, -90.0, 30) == 0
        assert _id(180.0, 90.0, 30) == 576460751229681664
        assert _id(180.0 - 1.0 / P, 90.0, 30) == 576460752303423487

    def test_get_id_bounding_box(self):
        # SW corner of the bbox decides (XYGrid.java:158-160)
        bbx = _b7(-10.0, -10.0, 10.0, 10.0)
        assert _id(bbx[0] / P, bbx[1] / P, 2) == 1
        bbx2 = _b7(10.0, -10.0, -9.0, 10.0)
        assert _id(bbx2[0] / P, bbx2[1] / P, 2) == 2

    def test_cell_width(self):
        assert cells.xy_cell_width(2) / P == 90.0

    def test_cell_dimensions(self):
        assert cells.xy_cell_bbox7(2, 0) == _b7(-180.0, -90.0, -90.0 - 1e-7, 0.0 - 1e-7)
        assert cells.xy_cell_bbox7(2, 6) == _b7(0.0, 0.0, 90.0 - 1e-7, 90.0)
        assert cells.xy_cell_bbox7(2, 7) == _b7(90.0, 0.0, 180.0 - 1e-7, 90.0)
        assert cells.xy_cell_bbox7(0, 0) == _b7(-180.0, -90.0, 180.0 - 1e-7, 90.0)
        assert cells.xy_cell_bbox7(1, 0) == _b7(-180.0, -90.0, 0.0 - 1e-7, 90.0)

    def test_estimated_id_count(self):
        assert cells.xy_estimated_id_count(_b7(0, 0, 89, 89), 2) == 1
        assert cells.xy_estimated_id_count(_b7(-89.0, -90.0, 89.0, 90.0), 2) == 2
        assert cells.xy_estimated_id_count(_b7(0.0, 0.0, 0.0000053, 0.0000053), 30) == 16
        # "just" touching three cells (GIScience/oshdb PR#183 regression)
        assert cells.xy_estimated_id_count(_b7(-0.1, 0, 90.1, 89), 2) == 3

    def test_bbox2_ids(self):
        world = _b7(-180, -90, 180, 90)
        assert cells.xy_bbox2_cell_id_ranges(world, 0) == {(0, 0)}

        r = cells.xy_bbox2_cell_id_ranges(world, 2)
        assert len(r) == 2
        assert min(r) == (0, 3)

        assert cells.xy_bbox2_cell_id_ranges(_b7(-10, -10, 10, 10), 0) == {(0, 0)}
        # min > max on lon: date-line wrap still covers the single cell
        assert cells.xy_bbox2_cell_id_ranges(_b7(179, 0, 89, 5), 0) == {(0, 0)}

        def flat(ranges):
            return {c for s, e in ranges for c in range(s, e + 1)}

        assert flat(cells.xy_bbox2_cell_id_ranges(_b7(-10, -10, 10, 10), 2)) == {
            1, 2, 5, 6,
        }
        assert flat(cells.xy_bbox2_cell_id_ranges(_b7(-180, 0, 89, 5), 2)) == {
            4, 5, 6,
        }
        # date-line spanning box covers the full southern row
        assert flat(cells.xy_bbox2_cell_id_ranges(_b7(90, -90, 89, -1), 2)) == {
            0, 1, 2, 3,
        }
        # a cell's own dimensions map back to exactly that cell
        assert cells.xy_bbox2_cell_id_ranges(cells.xy_cell_bbox7(2, 0), 2) == {(0, 0)}

    def test_bbox2_ids_maxzoom_world(self):
        # full world at MAXZOOM, enlarged: one range per row
        maxzoom = cells.MAXZOOM
        r = cells.xy_bbox2_cell_id_ranges(_b7(-180, -90, 180, 90), maxzoom, True)
        assert len(r) == 2 ** maxzoom // 2
        assert min(r) == (0, 2 ** maxzoom - 1)

    def test_get_neighbours(self):
        assert cells.xy_neighbours(2, 6) == {(1, 3), (5, 7), (-1, -1)}

    def test_get_bounding_box_static(self):
        assert cells.xy_cell_bbox7(2, 2) == _b7(0.0, -90.0, 90.0 - 1e-7, 0.0 - 1e-7)


class TestXYGridDeepZoomParity:
    """Regression for the fractional-cellWidth fix: at zoom ≥ 11 the
    reference's width is a non-integer double (1757812.5 at z=11); integer
    flooring of the width mis-assigns tiles. Expectations computed from
    the reference's double formulas directly."""

    @pytest.mark.parametrize("zoom", [11, 13, 15, 30])
    def test_id_matches_double_arithmetic(self, zoom):
        w = (360.0 / (1 << zoom)) * P  # exact double
        rng = np.random.RandomState(zoom)
        lon7 = rng.randint(-180 * P, 180 * P, 2000).astype(np.int64)
        lat7 = rng.randint(-90 * P, 90 * P, 2000).astype(np.int64)
        x = ((lon7 + 180 * P) / w).astype(np.int64)
        y = ((lat7 + 90 * P) / w).astype(np.int64)
        expect = y * (1 << zoom) + x
        got = cells.xy_id(lon7, lat7, zoom)
        np.testing.assert_array_equal(got, expect)

    def test_z11_boundary_point(self):
        # lon7 = 1757812 (after +180 shift): exact width 1757812.5 keeps it
        # in column 0; the floored-integer width would claim column 1
        assert _id((1757812 - 180 * P) / P, -90.0, 11) == 0

    def test_cell_bbox_roundtrip_deep(self):
        # at fractional widths the Java-cast SW corner long can truncate
        # into the neighbouring cell (reference behavior, reproduced by
        # test_fractional_corner_truncates below) — the first integer
        # coordinate INSIDE the cell is corner+1
        def id7(lon7, lat7, zoom):
            return int(cells.xy_id(np.array([lon7]), np.array([lat7]), zoom)[0])

        for zoom in (11, 12, 15):
            for cell in (0, 5, (1 << zoom) + 3, (1 << zoom) * ((1 << zoom) // 2) - 1):
                bb = cells.xy_cell_bbox7(zoom, cell)
                got = {
                    id7(bb[0], bb[1], zoom),
                    id7(bb[0] + 1, bb[1] + 1, zoom),
                }
                assert cell in got

    def test_fractional_corner_truncates(self):
        # z11 top-right cell: exact SW lon boundary is 1798242187.5; the
        # reference's (long) cast yields ...187, one unit into column 2046
        # — pin that we reproduce it rather than "fixing" it
        zoom, cell = 11, (1 << 11) * (1 << 10) - 1
        bb = cells.xy_cell_bbox7(zoom, cell)
        assert bb[0] == 1798242187

        def id7(lon7, lat7):
            return int(cells.xy_id(np.array([lon7]), np.array([lat7]), zoom)[0])

        assert id7(bb[0], bb[1]) == cell - (1 << zoom) - 1
        assert id7(bb[0] + 1, bb[1] + 1) == cell


class TestXYGridTreeGolden:
    """XYGridTreeTest.java ports."""

    def test_get_ids(self):
        # the reference's getIds(double,double) truncates the DEGREE value
        # to long BEFORE scaling (XYGridTree.java:78-80), so (0.1, 0.1)
        # resolves as point (0, 0)
        got = cells.xy_tree_ids(0, 0, maxzoom=4)
        assert got == {(0, 0), (1, 1), (2, 6), (3, 20), (4, 72)}

    def test_get_insert_id(self):
        assert cells.xy_insert_id(_b7(0.0, -90.0, 179.0, 90.0), 4) == (2, 2)
        assert cells.xy_insert_id(_b7(0.0, -90.0, 0.1, 90.0), 4) == (2, 2)
        assert cells.xy_insert_id(_b7(0.0, -90.0, 179.0, -89.9), 4) == (2, 2)

    def test_bbox2_cell_ids(self):
        got = cells.xy_tree_bbox2_cell_ids(_b7(0.0, 0.0, 44.9, 44.9), 3)
        assert got == {(3, 20), (2, 6), (1, 1), (0, 0)}

    def test_bbox2_cell_ids_enlarged(self):
        got = cells.xy_tree_bbox2_cell_ids(_b7(0.0, 0.0, 89, 89), 3, enlarge=True)
        assert got == {
            (3, 11), (3, 12), (3, 13), (3, 19), (3, 20), (3, 21),
            (3, 27), (3, 28), (3, 29),
            (2, 1), (2, 2), (2, 5), (2, 6),
            (1, 0), (1, 1),
            (0, 0),
        }


class TestCellIdGolden:
    """CellIdTest.java — cells are plain (zoom, id) pairs here."""

    def test_accessors(self):
        zoom, cid = (1, 1)
        assert cid == 1
        assert zoom == 1


class TestBoundingBoxGolden:
    """OSHDBBoundingBoxTest.java semantic ports (intersect / overlap /
    fixed-point accessors)."""

    def test_intersect(self):
        first = _b7(0.0, 89.0, 1.0, 90.0)
        second = _b7(0.0, 89.9, 2.0, 90.0)
        assert C.bbox_intersection(first, second) == _b7(0.0, 89.9, 1.0, 90.0)

    def test_overlap_a_complete_in_b(self):
        a = _b7(0.1, 89.1, 0.9, 89.9)
        b = _b7(0.0, 89.0, 1.0, 90.0)
        assert C.bbox_contains(b, a)  # OVERLAP.A_COMPLETE_IN_B
        assert C.bbox_relation(a, b) == 1

    def test_fixed_point_accessors(self):
        bb = _b7(0.0, 89.0, 1.0, 90.0)
        assert (bb[0], bb[2]) == (0, 10000000)
        assert (bb[1], bb[3]) == (890000000, 900000000)
