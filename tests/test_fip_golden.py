"""Spatial-predicate golden ports — the reference's
FastPointInPolygonTest / FastBboxInPolygonTest / FastBboxOutsidePolygonTest
(oshdb-util/src/test/.../geometry/fip/*.java), assertion for assertion.

The engine's exact vectorized tests (geo.clip.points_in_polygon,
kernels.aoi.bbox_vs_polygon) replace the reference's band-indexed
predicates; the observable contract is identical:
  FastPointInPolygon.test(p)    ≙ points_in_polygon(...)[0]
  FastBboxInPolygon.test(b)     ≙ bbox_vs_polygon(b, poly) == 1
  FastBboxOutsidePolygon.test(b)≙ bbox_vs_polygon(b, poly) == 0
Bbox argument order follows OSHDBBoundingBox(minLon, minLat, maxLon,
maxLat) (OSHDBBoundingBox.java:70-75). FastPolygonOperationsTest is
covered separately by the fragment-parity tests in test_spatial_join
(its buffer()-based fixtures need JTS)."""

from __future__ import annotations

import numpy as np
import pytest

from oshdb_spark.geo.clip import points_in_polygon
from oshdb_spark.kernels.aoi import bbox_vs_polygon


def sigma_polygon():
    """createPolygon (FastPointInPolygonTest.java:13-27): a reversed
    'Σ'-shaped concave polygon with a 94-vertex left edge."""
    coords = [(0.0, 0.0), (1.0, 1.0), (-1.0, 1.0)]
    for i in range(3, 97):
        coords.append((-1.0, 1.0 - 2.0 * (i - 2) / 95))
    coords += [(-1.0, -1.0), (1.0, -1.0), (0.0, 0.0)]
    return [np.array(coords)]


def polygon_with_hole():
    """createPolygonWithHole (:29-49): square with a central square hole."""
    outer = np.array([(4.0, -1), (4, 1), (2, 1), (2, -1), (4, -1)], dtype=float)
    hole = np.array(
        [(3.5, -0.5), (3.5, 0.5), (2.5, 0.5), (2.5, -0.5), (3.5, -0.5)]
    )
    return [outer, hole]


def multi_polygon():
    """createMultiPolygon (:51-59): Σ next to the holed square."""
    return [sigma_polygon(), polygon_with_hole()]


def square_square_multipolygon():
    """FastBboxInPolygonTest.createSquareSquareMultiPolygon (:14-23)."""
    def sq(x0, y0, x1, y1):
        return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                         dtype=float)]
    return [sq(-1.5, -1.5, -0.5, -0.5), sq(0.5, -1.5, 1.5, -0.5),
            sq(-1.5, 0.5, -0.5, 1.5), sq(0.5, 0.5, 1.5, 1.5)]


def pip(poly, x, y):
    return bool(points_in_polygon(np.array([x]), np.array([y]), poly)[0])


def bip(poly, b):
    return bbox_vs_polygon(b, poly) == 1


def bop(poly, b):
    return bbox_vs_polygon(b, poly) == 0


# --- FastPointInPolygonTest ----------------------------------------------

def test_point_in_polygon():
    p = sigma_polygon()
    assert pip(p, -0.5, 0) is True      # inside
    assert pip(p, 0.5, 0) is False      # in concave part
    assert pip(p, 1.5, 0) is False      # outside poly's bbox


def test_point_in_polygon_with_hole():
    p = polygon_with_hole()
    assert pip(p, 2.25, 0) is True      # inside
    assert pip(p, 3, 0) is False        # in hole
    assert pip(p, 4.5, 0) is False      # outside poly's bbox


def test_point_in_multipolygon():
    p = multi_polygon()
    assert pip(p, -0.5, 0) is True      # inside left polygon
    assert pip(p, 0.5, 0) is False      # in concave part of left polygon
    assert pip(p, 1.5, 0) is False      # outside left polygon
    assert pip(p, 2.25, 0) is True      # inside right polygon
    assert pip(p, 3, 0) is False        # in hole of right polygon
    assert pip(p, 4.5, 0) is False      # outside right polygon


# --- FastBboxInPolygonTest / FastBboxOutsidePolygonTest -------------------
# Each case is (bbox, expected FastBboxInPolygon, expected
# FastBboxOutsidePolygon) — the two reference suites share fixtures, so
# one table drives both predicates.

SIGMA_CASES = [
    ((-0.6, -0.1, -0.4, 0.1), True, False),    # inside
    ((-1.5, -0.1, -0.4, 0.1), False, False),   # partially inside
    ((-0.6, -0.1, 1.4, 0.1), False, False),
    ((-0.6, -1.1, -0.4, 0.1), False, False),
    ((-0.6, -0.1, -0.4, 1.1), False, False),
    ((0.4, -0.1, 0.6, 0.1), False, True),      # in concave part
    ((0.4, -0.9, 0.6, -0.8), True, False),
    ((0.4, 0.8, 0.6, 0.9), True, False),
    ((0.4, -0.9, 0.6, 0.9), False, False),     # concave, corners all inside
    ((1.4, -0.1, 1.6, 0.1), False, True),      # outside poly's bbox
    ((-11, -10, 10, 10), False, False),        # bbox covering
]

HOLE_CASES = [
    ((2.1, -0.1, 2.2, 0.1), True, False),      # inside
    ((3.1, -0.9, 3.2, -0.8), True, False),
    ((3.1, 0.8, 3.2, 0.9), True, False),
    ((3.8, -0.1, 3.9, 0.1), True, False),
    ((1.8, -0.1, 2.2, 0.1), False, False),     # partially inside
    ((3.1, -1.1, 3.2, -0.8), False, False),
    ((3.1, 0.8, 3.2, 1.1), False, False),
    ((3.8, -0.1, 4.1, 0.1), False, False),
    ((2.9, -0.1, 3.1, 0.1), False, True),      # in hole
    ((2.4, -0.1, 2.6, 0.1), False, False),     # partially in hole
    ((3.1, -0.6, 3.2, -0.4), False, False),
    ((3.1, 0.4, 3.2, 0.6), False, False),
    ((3.4, -0.1, 3.6, 0.1), False, False),
    ((2.1, -0.1, 3.9, 0.1), False, False),     # intersecting hole
    ((4.1, -0.1, 4.2, 0.1), False, True),      # outside poly's bbox
    ((1.8, -0.1, 1.9, 0.1), False, True),
    ((3.1, -1.2, 3.2, -1.1), False, True),
    ((3.1, 1.1, 3.2, 1.2), False, True),
    ((2.2, -0.8, 3.8, 0.8), False, False),     # covers hole, corners inside
]


@pytest.mark.parametrize("b,exp_in,exp_out", SIGMA_CASES)
def test_bbox_vs_sigma_polygon(b, exp_in, exp_out):
    p = sigma_polygon()
    assert bip(p, b) is exp_in
    assert bop(p, b) is exp_out


@pytest.mark.parametrize("b,exp_in,exp_out", HOLE_CASES)
def test_bbox_vs_polygon_with_hole(b, exp_in, exp_out):
    p = polygon_with_hole()
    assert bip(p, b) is exp_in
    assert bop(p, b) is exp_out


@pytest.mark.parametrize("b,exp_in,exp_out", SIGMA_CASES + HOLE_CASES)
def test_bbox_vs_multipolygon(b, exp_in, exp_out):
    """testBboxInMultiPolygon in both suites replays every left- and
    right-polygon case against the combined MultiPolygon — same expected
    values, including the (-11,-10,10,10) covering bbox."""
    p = multi_polygon()
    assert bip(p, b) is exp_in
    assert bop(p, b) is exp_out


def test_bbox_vs_square_square_multipolygon():
    p = square_square_multipolygon()
    b = (-1, -1, 1, 1)
    assert bip(p, b) is False
    assert bop(p, b) is False
