"""Property-based tests (hypothesis) for the cell grid and geometry layer."""

from __future__ import annotations

import os

# soak multiplier: GRID_PROP_SCALE=8 runs these suites at 8x their CI
# example budgets for offline robustness soaks
_PROP_SCALE = int(os.environ.get("GRID_PROP_SCALE", "1"))

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oshdb_spark.geo import cells
from oshdb_spark.geo import geom as G

LON = st.integers(min_value=-1_800_000_000, max_value=1_800_000_000)
LAT = st.integers(min_value=-900_000_000, max_value=900_000_000)
LEVEL = st.integers(min_value=1, max_value=15)


@settings(max_examples=200 * _PROP_SCALE, deadline=None, derandomize=True)
@given(LON, LAT, LEVEL)
def test_token_prefix_is_parent(lon7, lat7, level):
    """Hierarchy invariant: the level-(L-1) token is a string prefix of the
    level-L token — the property cell-prefix pruning relies on."""
    child = cells.token_of_points(np.array([lon7]), np.array([lat7]), level)[0]
    if level > 1:
        parent = cells.token_of_points(
            np.array([lon7]), np.array([lat7]), level - 1
        )[0]
        assert child.startswith(parent)
    assert len(child) == level
    assert set(child) <= set("0123")


@settings(max_examples=200 * _PROP_SCALE, deadline=None, derandomize=True)
@given(st.integers(min_value=1, max_value=12), st.data())
def test_hilbert_roundtrip(level, data):
    n = 1 << level
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    d = int(cells.hilbert_xy2d(level, np.array([x]), np.array([y]))[0])
    assert 0 <= d < n * n
    assert cells.hilbert_d2xy(level, d) == (x, y)


@settings(max_examples=100 * _PROP_SCALE, deadline=None, derandomize=True)
@given(
    st.integers(min_value=-1_800_000_000, max_value=1_799_999_999),
    st.integers(min_value=-900_000_000, max_value=899_999_999),
    st.integers(min_value=0, max_value=15),
)
def test_xy_id_within_bbox_cover(lon7, lat7, zoom):
    """A point's cell id is always inside some range of the cover of any
    bbox containing the point. Points exactly ON +180/+90 are excluded:
    the reference wraps them into the westernmost column / northernmost
    row (XYGrid.java:124-160) while bbox covers clamp eastward — the same
    anti-meridian asymmetry the reference has (we reproduce it)."""
    cid = int(cells.xy_id(np.array([lon7]), np.array([lat7]), zoom)[0])
    pad = 10_000_000
    bbox = (
        max(lon7 - pad, -1_800_000_000), max(lat7 - pad, -900_000_000),
        min(lon7 + pad, 1_800_000_000), min(lat7 + pad, 900_000_000),
    )
    ranges = cells.xy_bbox2_cell_id_ranges(bbox, zoom, enlarge=False)
    assert any(a <= cid <= b for a, b in ranges if a >= 0)


@settings(max_examples=100 * _PROP_SCALE, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.floats(-179, 179, allow_nan=False),
            st.floats(-89, 89, allow_nan=False),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_wkb_roundtrip_linestring(coords):
    g = G.linestring(coords)
    back = G.from_wkb(G.to_wkb(g))
    assert back[0] == "LineString"
    assert np.array_equal(back[1], g[1])


@settings(max_examples=150 * _PROP_SCALE, deadline=None, derandomize=True)
@given(LON, LAT)
def test_insert_token_covers_point_bbox(lon7, lat7):
    """A degenerate (point) bbox inserts at MAXZOOM and its token equals
    the point token there."""
    tok = cells.token_of_bboxes(
        np.array([lon7]), np.array([lat7]), np.array([lon7]), np.array([lat7])
    )[0]
    pt = cells.token_of_points(np.array([lon7]), np.array([lat7]), len(tok))[0]
    assert tok == pt
    assert len(tok) == cells.MAXZOOM
