"""Unit tests: geodesy formulas, cell grid parity, clipping, WKB."""

import math

import numpy as np
import pytest

from oshdb_spark.geo import cells, clip, geodesy
from oshdb_spark.geo import geom as G

P = cells.GEOM_PRECISION_TO_LONG


class TestGeodesy:
    def test_equirect_matches_reference_formula(self):
        # hand-computed per Geo.java:37-45
        lat1, lng1, lat2, lng2 = 49.0, 8.0, 49.001, 8.002
        d_lat = math.radians(lat2 - lat1)
        d_lng = math.radians(lng2 - lng1) * math.cos(math.radians((lat1 + lat2) / 2))
        want = 6371000.0 * math.sqrt(d_lng**2 + d_lat**2)
        got = float(geodesy.distance_equirect(lat1, lng1, lat2, lng2))
        assert got == pytest.approx(want, rel=1e-12)

    def test_equirect_differs_from_haversine(self):
        a = float(geodesy.distance_equirect(0.0, 0.0, 10.0, 10.0))
        b = float(geodesy.distance_haversine(0.0, 0.0, 10.0, 10.0))
        assert a != b  # engine must use equirect, not haversine

    def test_ring_area_one_degree_square_at_equator(self):
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
        got = abs(geodesy.ring_area_signed(ring))
        # CD formula for this square: R^2/2 * deg2rad(1) * (sin(1°) - sin(0°)) * 2
        r = 6371000.0
        want = abs(
            r * r / 2 * (
                (math.radians(1) - math.radians(0)) * math.sin(math.radians(0))
                + (math.radians(1) - math.radians(0)) * math.sin(math.radians(0))
                + (math.radians(1) - math.radians(1)) * math.sin(math.radians(0.0))
            )
        )
        # simpler: compare against direct re-evaluation of the published formula
        coords = np.radians(ring)
        acc = 0.0
        n = len(coords)
        for i in range(n):
            p1 = coords[i % n]
            p2 = coords[(i + 1) % n]
            p3 = coords[(i + 2) % n]
            acc += (p3[0] - p1[0]) * math.sin(p2[1])
        want = abs(acc * r * r / 2)
        assert got == pytest.approx(want, rel=1e-12)
        # sanity: ~12,308 km^2 for 1°x1° at equator
        assert 1.2e10 < got < 1.25e10

    def test_polygon_area_subtracts_holes(self):
        outer = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
        hole = np.array([[0.5, 0.5], [1, 0.5], [1, 1], [0.5, 1], [0.5, 0.5]], dtype=float)
        a_out = geodesy.polygon_area([outer])
        a_with = geodesy.polygon_area([outer, hole])
        assert a_with < a_out
        assert a_with == pytest.approx(
            a_out - abs(geodesy.ring_area_signed(hole)), rel=1e-12
        )


class TestXYGridParity:
    """Parity vs reference XYGrid semantics (index/XYGrid.java)."""

    def test_getid_borders(self):
        # lon=180 wraps to column 0; lat=90 clamps to top row (XYGrid.java:137-148)
        z = 2
        assert cells.xy_id([180 * P], [0], z)[0] == cells.xy_id([-180 * P], [0], z)[0]
        top = cells.xy_id([0], [90 * P], z)[0]
        just_below = cells.xy_id([0], [90 * P - 1], z)[0]
        assert top == just_below

    def test_getid_out_of_range(self):
        assert cells.xy_id([181 * P], [0], 5)[0] == -1
        assert cells.xy_id([0], [91 * P], 5)[0] == -1

    def test_row_major_layout(self):
        # zoom 1: 2 columns, cellWidth=180°; (lon,lat)=(-180,-90) → id 0,
        # (0,-90) → 1, (-180,0)... row = (lat+90)/180 = 0 for lat<90
        assert cells.xy_id([-180 * P], [-90 * P], 1)[0] == 0
        assert cells.xy_id([0], [-90 * P], 1)[0] == 1

    def test_insert_id_small_feature_deep_zoom(self):
        # tiny bbox fits at maxzoom
        bb = (int(8.0 * P), int(49.0 * P), int(8.0001 * P), int(49.0001 * P))
        z, cid = cells.xy_insert_id(bb)
        assert z == cells.MAXZOOM
        assert cid == cells.xy_id([bb[0]], [bb[1]], z)[0]

    def test_insert_id_world_feature_shallow_zoom(self):
        # covering estimate at zoom 1 is exactly 2 per axis → stored at zoom 1
        # (first level from maxzoom downward with count <= 2, XYGridTree.java:89-97)
        bb = (-170 * P, -80 * P, 170 * P, 80 * P)
        z, cid = cells.xy_insert_id(bb)
        assert z == 1 and cid == 0

    def test_bbox2ranges_enlarge(self):
        bb = (int(8.0 * P), int(49.0 * P), int(9.0 * P), int(50.0 * P))
        plain = cells.xy_bbox2_cell_id_ranges(bb, 12, False)
        enlarged = cells.xy_bbox2_cell_id_ranges(bb, 12, True)
        # enlarge extends one cell SW: every plain range is inside an enlarged one
        pmin = min(r[0] for r in plain)
        emin = min(r[0] for r in enlarged)
        assert emin < pmin
        assert len(enlarged) == len(plain) + 1  # one extra row

    def test_dateline_split(self):
        bb = (int(179.5 * P), 0, int(-179.5 * P + 360 * P) - 360 * P, int(1 * P))
        # construct min>max across dateline
        bb = (int(179.5 * P), 0, int(-179.5 * P), int(1 * P))
        ranges = cells.xy_bbox2_cell_id_ranges(bb, 8, False)
        assert len(ranges) >= 2  # both sides of the dateline

    def test_neighbours_3x3(self):
        z = 6
        cid = int(cells.xy_id([int(8.6 * P)], [int(49.4 * P)], z)[0])
        ranges = cells.xy_neighbours(z, cid)
        ids = set()
        for s, e in ranges:
            ids.update(range(s, e + 1))
        assert cid in ids and len(ids) == 9


class TestHilbert:
    def test_roundtrip(self):
        level = 8
        rng = np.random.default_rng(7)
        xs = rng.integers(0, 1 << level, 100)
        ys = rng.integers(0, 1 << level, 100)
        ds = cells.hilbert_xy2d(level, xs, ys)
        for x, y, d in zip(xs, ys, ds):
            assert cells.hilbert_d2xy(level, int(d)) == (int(x), int(y))

    def test_hierarchical_prefix(self):
        # parent Hilbert index == child index >> 2 → token prefixes nest
        level = 6
        rng = np.random.default_rng(11)
        xs = rng.integers(0, 1 << level, 200)
        ys = rng.integers(0, 1 << level, 200)
        d_child = cells.hilbert_xy2d(level, xs, ys)
        d_parent = cells.hilbert_xy2d(level - 1, xs >> 1, ys >> 1)
        assert np.all(d_parent == d_child >> 2)

    def test_token_prefix_nesting(self):
        lon = np.array([int(8.68 * P)])
        lat = np.array([int(49.41 * P)])
        t6 = cells.token_of_points(lon, lat, 6)[0]
        t10 = cells.token_of_points(lon, lat, 10)[0]
        assert t10.startswith(t6)
        assert len(t6) == 6 and len(t10) == 10

    def test_locality_adjacent_cells_near_tokens(self):
        # consecutive Hilbert distances are spatially adjacent cells
        level = 5
        for d in range(0, (1 << (2 * level)) - 1, 37):
            x0, y0 = cells.hilbert_d2xy(level, d)
            x1, y1 = cells.hilbert_d2xy(level, d + 1)
            assert abs(x0 - x1) + abs(y0 - y1) == 1

    def test_cover_contains_point_cell(self):
        bb = (int(8.0 * P), int(49.0 * P), int(9.0 * P), int(50.0 * P))
        toks = cells.cover_tokens(bb, 6)
        pt = cells.token_of_points([int(8.5 * P)], [int(49.5 * P)], 6)[0]
        assert pt in toks

    def test_cover_prefix_compression(self):
        world = (-180 * P, -90 * P, 180 * P, 90 * P)
        pref = cells.cover_prefixes(world, level=4, enlarge=False)
        assert pref == [""]  # whole world compresses to the root prefix

    def test_ring_tokens(self):
        t = cells.token_of_points([int(8.5 * P)], [int(49.5 * P)], 8)[0]
        ring = cells.ring_tokens(t, 1)
        assert t in ring and len(ring) == 9


class TestClip:
    def test_point_in_ring(self):
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
        got = clip.points_in_ring([2, 5, -1], [2, 2, 2], sq)
        assert got.tolist() == [True, False, False]

    def test_polygon_with_hole(self):
        outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
        hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
        got = clip.points_in_polygon([2, 0.5], [2, 0.5], [outer, hole])
        assert got.tolist() == [False, True]

    def test_line_clip_pieces(self):
        line = np.array([[-1, 1], [5, 1]], dtype=float)
        out = clip.clip_to_bbox(("LineString", line), (0, 0, 4, 4))
        assert out[0] == "LineString"
        np.testing.assert_allclose(out[1], [[0, 1], [4, 1]])

    def test_line_clip_two_pieces(self):
        line = np.array([[-1, 1], [2, 1], [2, 5], [3, 5], [3, 1], [6, 1]], dtype=float)
        out = clip.clip_to_bbox(("LineString", line), (0, 0, 4, 4))
        assert out[0] == "MultiLineString"
        # piece 1: enters at (0,1), runs to (2,1)-(2,4); piece 2: (3,4)-(3,1)-(4,1)
        assert len(out[1]) == 2

    def test_polygon_clip(self):
        rings = [np.array([[-1, -1], [5, -1], [5, 5], [-1, 5], [-1, -1]], dtype=float)]
        out = clip.clip_to_bbox(("Polygon", rings), (0, 0, 4, 4))
        assert out[0] == "Polygon"
        bb = G.bbox_of(out)
        assert bb == (0, 0, 4, 4)

    def test_fully_inside_identity(self):
        g = G.point(1, 1)
        assert clip.clip_to_bbox(g, (0, 0, 4, 4)) is g

    def test_disjoint_none(self):
        assert clip.clip_to_bbox(G.point(10, 10), (0, 0, 4, 4)) is None

    def test_3state(self):
        assert clip.bbox_relation((1, 1, 2, 2), (0, 0, 4, 4)) == 1
        assert clip.bbox_relation((5, 5, 6, 6), (0, 0, 4, 4)) == 0
        assert clip.bbox_relation((3, 3, 6, 6), (0, 0, 4, 4)) == 2

    def test_clip_line_to_polygon(self):
        tri = [np.array([[0, 0], [4, 0], [0, 4], [0, 0]], dtype=float)]
        out = clip.clip_line_to_polygon(
            np.array([[-1, 1], [5, 1]], dtype=float), tri
        )
        assert out[0] == "LineString"
        np.testing.assert_allclose(out[1], [[0, 1], [3, 1]])


class TestWkb:
    def test_roundtrip_all_types(self):
        geoms = [
            G.point(8.5, 49.5),
            ("Point", None),
            G.linestring([[0, 0], [1, 1], [2, 0]]),
            G.polygon([[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]),
            (
                "MultiPolygon",
                [
                    [np.array([[0, 0], [1, 0], [1, 1], [0, 0]], dtype=float)],
                    [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], dtype=float)],
                ],
            ),
            ("MultiLineString", [np.array([[0, 0], [1, 1]], dtype=float)]),
            ("GeometryCollection", [G.point(1, 2), G.linestring([[0, 0], [1, 1]])]),
        ]
        for g in geoms:
            rt = G.from_wkb(G.to_wkb(g))
            assert G.geoms_equal(g, rt), G.to_wkt(g)

    def test_measurements_dispatch(self):
        assert G.length(G.point(0, 0)) == 0.0
        assert G.area(G.linestring([[0, 0], [1, 1]])) == 0.0
        sq = G.polygon([[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]])
        assert G.area(sq) > 0
        assert G.length(G.linestring([[0, 0], [0, 1]])) == pytest.approx(
            6371000.0 * math.radians(1), rel=1e-9
        )


class TestGeoGoldenPort:
    """GeoTest.java ports (oshdb-util/src/test/.../geometry/GeoTest.java)
    run through the WKB measure kernels (geo.measures _area_slow /
    _length_slow, the per-buffer bodies of wkb_area_m2/wkb_length_m —
    the engine's Geo.areaOf/lengthOf): absolute anchors
    from the reference (geojson.io-derived, 5% band) plus the exact
    multi-geometry / collection composition ratios."""

    def _area(self, g):
        from oshdb_spark.geo import geom as G
        from oshdb_spark.geo.measures import _area_slow

        return float(_area_slow(G.to_wkb(g)))

    def _length(self, g):
        from oshdb_spark.geo import geom as G
        from oshdb_spark.geo.measures import _length_slow

        return float(_length_slow(G.to_wkb(g)))

    def _sq(self, x0):
        import numpy as np
        return np.array([(x0, 0.0), (x0, 1.0), (x0 + 1, 1.0),
                         (x0 + 1, 0.0), (x0, 0.0)])

    def test_area_polygon(self):
        """testAreaPolygon (:34-57): 1°×1° equator square ≈ 12391399902 m²
        within 5%; the 0.1° hole removes exactly ~1%."""
        import numpy as np

        outer = self._sq(0.0)
        inner = np.array([(0.5, 0.5), (0.5, 0.6), (0.6, 0.6),
                          (0.6, 0.5), (0.5, 0.5)])
        a = self._area(("Polygon", [outer]))
        assert abs(1.0 - 12391399902.0 / a) < 0.05
        ah = self._area(("Polygon", [outer, inner]))
        assert abs(ah / a - 0.99) < 0.0001

    def test_area_multipolygon_and_collection(self):
        """testAreaMultiPolygon (:59-78) + testAreaGeometryCollection
        (:80-106): multi/collection sum; non-polygonal members ignored."""
        p1 = ("Polygon", [self._sq(0.0)])
        p2 = ("Polygon", [self._sq(2.0)])
        a1 = self._area(p1)
        assert abs(self._area(("MultiPolygon", [p1[1], p2[1]])) / a1 - 2.0) < 1e-4
        assert abs(self._area(("GeometryCollection", [p1, p2])) / a1 - 2.0) < 1e-4
        mixed = ("GeometryCollection", [
            p1, ("Point", (0.0, 0.0)), ("LineString", self._sq(2.0))])
        assert abs(self._area(mixed) / a1 - 1.0) < 1e-4

    def test_area_other_zero(self):
        """testAreaOther (:108-130): points/lines have zero area."""
        import numpy as np

        tri = np.array([(0.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)])
        assert self._area(("Point", (0.0, 0.0))) == 0.0
        assert self._area(("MultiPoint", [(0.0, 0.0), (1.0, 1.0)])) == 0.0
        assert self._area(("LineString", tri)) == 0.0
        assert self._area(("MultiLineString", [tri, tri + 1])) == 0.0

    def test_length_linestring(self):
        """testLengthLineString (:132-141): (0,0)→(1,1) ≈ 157425.5 m
        within 5%."""
        import numpy as np

        line = ("LineString", np.array([(0.0, 0.0), (1.0, 1.0)]))
        assert abs(1.0 - 157425.5 / self._length(line)) < 0.05

    def test_length_multi_and_collection(self):
        """testLengthMultiLineString (:143-156) +
        testLengthGeometryCollection (:158-185)."""
        import numpy as np

        l1 = np.array([(0.0, 0.0), (1.0, 1.0)])
        l2 = np.array([(1.0, 1.0), (2.0, 0.0)])
        base = self._length(("LineString", l1))
        assert abs(self._length(("MultiLineString", [l1, l2])) / base - 2.0) < 1e-4
        gc = ("GeometryCollection", [("LineString", l1), ("LineString", l2)])
        assert abs(self._length(gc) / base - 2.0) < 1e-4
        mixed = ("GeometryCollection", [
            ("LineString", l1), ("Point", (0.0, 0.0)),
            ("Polygon", [self._sq(0.0)])])
        assert abs(self._length(mixed) / base - 1.0) < 1e-4

    def test_length_other_zero(self):
        """testLengthOther (:187-209): points/polygons have zero length."""
        assert self._length(("Point", (0.0, 0.0))) == 0.0
        assert self._length(("MultiPoint", [(0.0, 0.0), (1.0, 1.0)])) == 0.0
        assert self._length(("Polygon", [self._sq(0.0)])) == 0.0
        assert self._length(
            ("MultiPolygon", [[self._sq(0.0)], [self._sq(2.0)]])
        ) == 0.0


class TestArealInterpolation:
    """geo/align.py (GeoAlign uniform-density baseline): weight algebra
    against closed-form spherical geometry."""

    def test_weights_partition_of_unity(self):
        """Targets that tile the source extent: each source's weights
        sum to 1 (area is conserved through the clip kernels)."""
        from oshdb_spark.geo.align import interpolation_weights

        src = {f"b{z}": (-180.0, -85.0 + 10 * z, 180.0, -75.0 + 10 * z)
               for z in range(17)}
        dst = {"s": (-180.5, -85.0, 180.5, -41.0),
               "m": (-180.5, -41.0, 180.5, 32.0),
               "n": (-180.5, 32.0, 180.5, 85.0)}
        acc: dict = {}
        for a, _, w in interpolation_weights(src, dst):
            acc[a] = acc.get(a, 0.0) + w
        assert set(acc) == set(src)
        for a, tot in acc.items():
            assert abs(tot - 1.0) < 1e-9, (a, tot)

    def test_weight_matches_analytic_sine_ratio(self):
        import math

        from oshdb_spark.geo.align import interpolation_weights

        src = {"b": (-180.0, 10.0, 180.0, 20.0)}
        dst = {"d": (-180.5, 15.0, 180.5, 60.0)}
        (_, _, w), = interpolation_weights(src, dst)
        expect = (math.sin(math.radians(20)) - math.sin(math.radians(15))) / (
            math.sin(math.radians(20)) - math.sin(math.radians(10)))
        assert abs(w - expect) < 1e-12

    def test_contained_source_weight_one_and_disjoint_absent(self):
        from oshdb_spark.geo.align import interpolation_weights

        src = {"in": (0.0, 0.0, 10.0, 10.0), "out": (100.0, 50.0, 110.0, 60.0)}
        dst = {"d": (-1.0, -1.0, 11.0, 11.0)}
        got = {(a, b): w for a, b, w in interpolation_weights(src, dst)}
        assert abs(got[("in", "d")] - 1.0) < 1e-9
        assert ("out", "d") not in got

    def test_areal_interpolate_dataframe(self, spark):
        from oshdb_spark.geo.align import areal_interpolate

        src_agg = spark.createDataFrame(
            [("a", 100.0), ("b", 200.0)], "zone string, cnt double")
        src = {"a": (0.0, 0.0, 10.0, 10.0), "b": (0.0, 10.0, 10.0, 20.0)}
        dst = {"low": (-0.5, 0.0, 10.5, 15.0), "high": (-0.5, 15.0, 10.5, 20.0)}
        got = {r["region"]: r["value"]
               for r in areal_interpolate(src_agg, src, dst, "cnt").collect()}
        import math
        w_b_low = (math.sin(math.radians(15)) - math.sin(math.radians(10))) / (
            math.sin(math.radians(20)) - math.sin(math.radians(10)))
        assert abs(got["low"] - (100.0 + 200.0 * w_b_low)) < 1e-6
        assert abs(got["high"] - 200.0 * (1 - w_b_low)) < 1e-6


class TestPolygonCover:
    """cover_tokens_polygon: polygon-refined partition covers — strict
    subset of the bbox cover for diagonal AOIs, never missing a cell the
    polygon touches, SW-enlarge matching the bbox rule."""

    # a thin diagonal band across a large envelope
    DIAG = [[np.array(
        [(-60.0, -60.0), (-50.0, -60.0), (60.0, 60.0), (50.0, 60.0),
         (-60.0, -60.0)], dtype=np.float64)]]

    def test_subset_of_bbox_cover_and_exact(self):
        from oshdb_spark.kernels.aoi import bbox_vs_polygon

        level = 5
        bbox7 = (-60 * 10**7, -60 * 10**7, 60 * 10**7, 60 * 10**7)
        bb = set(cells.cover_tokens(bbox7, level, enlarge=False))
        pg = set(cells.cover_tokens_polygon(self.DIAG, level, enlarge=False))
        assert pg <= bb
        assert len(pg) < len(bb) / 2  # the diagonal band skips most cells

        # exhaustive: a token is in the cover IFF its cell touches the band
        n = 1 << level
        wx, wy = 360.0 / n, 180.0 / n
        for yi in range(n // 2):
            for xi in range(n):
                cell_bb = (
                    -180.0 + xi * wx, -90.0 + yi * wy,
                    -180.0 + (xi + 1) * wx, -90.0 + (yi + 1) * wy,
                )
                touches = bbox_vs_polygon(cell_bb, self.DIAG[0]) != 0
                d = cells.hilbert_xy2d(level, np.array([xi]), np.array([yi]))
                tok = cells._d_to_token(d, level)[0]
                assert (tok in pg) == touches, (xi, yi)

    def test_enlarge_adds_sw_neighbours(self):
        level = 4
        base = set(cells.cover_tokens_polygon(self.DIAG, level, enlarge=False))
        grown = set(cells.cover_tokens_polygon(self.DIAG, level, enlarge=True))
        assert base <= grown
        # every grown-only token is the S/W/SW neighbour of a base token
        n = 1 << level
        base_xy = set()
        for t in base:
            d = int(t, 4)
            x, y = cells.hilbert_d2xy(level, d)
            base_xy.add((x, y))
        for t in grown - base:
            x, y = cells.hilbert_d2xy(level, int(t, 4))
            assert (
                (x + 1, y) in base_xy
                or (x, y + 1) in base_xy
                or (x + 1, y + 1) in base_xy
            )

    def test_multi_piece(self):
        pieces = [
            [np.array([(-10, -10), (0, -10), (0, 0), (-10, 0), (-10, -10)],
                      dtype=np.float64)],
            [np.array([(100, 40), (110, 40), (110, 50), (100, 50), (100, 40)],
                      dtype=np.float64)],
        ]
        toks = cells.cover_tokens_polygon(pieces, 4, enlarge=False)
        assert len(toks) > 0
        prefixes = cells.cover_prefixes_polygon(pieces, 4, enlarge=False)
        assert len(prefixes) <= len(toks)


def test_tile_pyramid_cascade_matches_direct_assignment(spark):
    """Cascaded parent rollup == direct per-zoom assignment, including
    the XYGrid border cases (lon=180 wraps west, lat=90 clamps north)
    that real point distributions rarely produce."""
    import numpy as np

    from oshdb_spark.geo.cells import tile_pyramid, xy_id

    pts = [
        (1_800_000_000, 900_000_000),    # both borders
        (-1_800_000_000, -900_000_000),  # west/south corner
        (1_800_000_000, -123_456_789),
        (123_456_789, 900_000_000),
        (0, 0),
        (-567_890_123, 345_678_901),
        (2_000_000_000, 0),              # out of range → -1 at all zooms
    ]
    df = spark.createDataFrame(pts, "lon7 long, lat7 long")
    got = {
        (r.zoom, r.cell): r.cnt
        for r in tile_pyramid(df, "lon7", "lat7", (6, 4, 2)).collect()
    }
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    want = {}
    for z in (6, 4, 2):
        for c in xy_id(lon, lat, z):
            want[(z, int(c))] = want.get((z, int(c)), 0) + 1
    assert got == want


def test_focal_stats_wrap_clamp_and_values(spark):
    """3×3 focal stats on a hand-built sparse raster: antimeridian wrap
    (column 0 sees column 63), polar row clamp (row 31 has no row 32),
    sparse semantics (absent neighbors don't count), and a python
    brute-force differential over the full output."""
    from oshdb_spark.geo.cells import focal_stats

    # zoom 6: 64 cols, rows 0..31
    cells_vals = [
        (0, 5),            # (x=0,  y=0) — west edge, south edge
        (63, 7),           # (x=63, y=0) — east edge: wraps to x=0
        (64, 2),           # (x=0,  y=1)
        (31 * 64 + 10, 4), # (x=10, y=31) — polar row
        (30 * 64 + 11, 6), # (x=11, y=30)
        (1000, 9),         # isolated
        (-1, 3),           # out-of-range marker passes through
    ]
    df = spark.createDataFrame(cells_vals, "cell long, cnt long")
    out = {r["cell"]: r for r in focal_stats(df, 6).collect()}
    assert len(out) == len(cells_vals)

    def brute(cell):
        x, y = cell % 64, cell // 64
        vals = [
            v for c, v in cells_vals
            if c >= 0
            and 0 <= c // 64 <= 31
            and abs(c // 64 - y) <= 1
            and min((c % 64 - x) % 64, (x - c % 64) % 64) <= 1
        ]
        return sum(vals), len(vals)

    for c, v in cells_vals:
        if c < 0:
            assert out[c]["focal_sum"] is None
            continue
        s, n = brute(c)
        assert out[c]["focal_sum"] == s, f"cell {c}"
        assert out[c]["focal_n"] == n
        assert out[c]["focal_mean"] == round(s / n, 6)
    # wrap: cell 0 and 63 see each other
    assert out[0]["focal_sum"] == 5 + 7 + 2
    # polar cell: no phantom row 32; sees its present diagonal neighbor
    assert out[31 * 64 + 10]["focal_sum"] == 4 + 6
    # isolated: itself only
    assert out[1000]["focal_n"] == 1


def test_stay_points_detects_dwell_and_splits_on_hop(spark):
    """A user idles near the origin (4 close points over 2 h), hops
    2,000 km, idles again with only 2 points (below min_pts), and a
    second user never dwells long enough."""
    from oshdb_spark.geo.trajectory import stay_points

    rows = [
        # user 1: dwell A — ~100 m steps, 4 pts spanning 7200 s
        (1, 0, 0, 0, 0),
        (1, 1, 2400, 10000, 0),       # 1e-3 deg ≈ 111 m... within 500 m
        (1, 2, 4800, 20000, 10000),
        (1, 3, 7200, 10000, 20000),
        # hop: ~20 deg ≈ 2,200 km → new segment
        (1, 4, 9600, 200000000, 0),
        (1, 5, 12000, 200010000, 0),  # only 2 pts: below min_pts
        # user 2: 3 close points but only 60 s span: below min_dwell
        (2, 6, 0, 0, 0),
        (2, 7, 30, 10000, 0),
        (2, 8, 60, 0, 10000),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, lon7 long, lat7 long"
    )
    got = stay_points(
        df, order_cols=("event_id",), dist_m=500.0,
        min_dwell_s=3600, min_pts=3,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["user_id"], r["seg"], r["n_pts"], r["dwell_s"]) == (1, 1, 4, 7200)
    assert r["clon"] == round((0 + 10000 + 20000 + 10000) / 4 / 1e7, 4)
    assert r["clat"] == round((0 + 0 + 10000 + 20000) / 4 / 1e7, 4)


def _autocorr_reference(cells_vals, ncols=64, y_max=31):
    """Textbook Gi*/Moran reference over a sparse raster dict
    {cell: value}: queen 3x3, lon wrap, no polar reflection, sparse
    (present-cell) semantics — an INDEPENDENT float formulation (plain
    z-scores), not the engine's integer-exact rearrangement."""
    import numpy as np

    cs = sorted(cells_vals)
    vals = np.array([cells_vals[c] for c in cs], dtype=np.float64)
    n = len(cs)
    xbar = vals.mean()
    s = np.sqrt((vals**2).mean() - xbar**2)

    def neigh(c, include_self):
        x, y = c % ncols, c // ncols
        out = []
        for dy in (-1, 0, 1):
            ny = y + dy
            if ny < 0 or ny > y_max:
                continue
            for dx in (-1, 0, 1):
                t = ny * ncols + (x + dx) % ncols
                if t == c and not include_self:
                    continue
                if t in cells_vals:
                    out.append(t)
        return out

    gi = {}
    for c in cs:
        nb = neigh(c, True)
        wi = len(nb)
        fs = sum(cells_vals[t] for t in nb)
        den = s * np.sqrt((n * wi - wi * wi) / (n - 1.0))
        gi[c] = (fs - xbar * wi) / den
    z = {c: cells_vals[c] - xbar for c in cs}
    szz = sum(v * v for v in z.values())
    szy = 0.0
    w_pairs = 0
    for c in cs:
        nb = neigh(c, False)
        w_pairs += len(nb)
        szy += z[c] * sum(z[t] for t in nb)
    moran = (n / w_pairs) * szy / szz
    return gi, moran, w_pairs


def test_gi_star_and_moran_vs_reference(spark):
    """Integer-exact engine formulations vs the plain textbook float
    formulas, on a raster with a wrap pair (x=0 / x=63 same row), a
    polar-row cell, and an isolated cell."""
    raster = {
        (5 * 64 + 0): 9,
        (5 * 64 + 63): 7,      # wrap neighbor of the cell above
        (5 * 64 + 1): 3,
        (6 * 64 + 0): 4,
        (31 * 64 + 10): 2,     # northernmost row (clamped top)
        (31 * 64 + 11): 6,
        (20 * 64 + 40): 5,     # isolated: only self in the 3x3
        (12 * 64 + 20): 1,
        (12 * 64 + 21): 8,
        (13 * 64 + 20): 2,
    }
    df = spark.createDataFrame(
        [(c, v) for c, v in raster.items()], "cell long, cnt long"
    )
    gi_ref, moran_ref, w_ref = _autocorr_reference(raster)

    got_gi = {
        r.cell: r.gi_star
        for r in cells.hotspot_gi_star(df, 6).collect()
    }
    assert set(got_gi) == set(gi_ref)
    for c, v in gi_ref.items():
        assert got_gi[c] == pytest.approx(round(v, 6), abs=2e-6), c

    row = cells.moran_i(df, 6).collect()
    assert len(row) == 1
    assert row[0].n_cells == len(raster)
    assert row[0].w_pairs == w_ref
    assert row[0].moran_i == pytest.approx(moran_ref, abs=1e-8)


def test_gi_star_flags_planted_hotspot(spark):
    """A dense 3x3 block of high counts in a field of 1s must carry the
    max Gi* at its center; a matching cold block the min."""
    raster = {}
    for y in range(10, 20):
        for x in range(10, 20):
            raster[y * 64 + x] = 10
    for y in range(12, 15):
        for x in range(12, 15):
            raster[y * 64 + x] = 100   # hot block
    for y in range(16, 19):
        for x in range(16, 19):
            raster[y * 64 + x] = 1     # cold block
    df = spark.createDataFrame(
        [(c, v) for c, v in raster.items()], "cell long, cnt long"
    )
    got = {r.cell: r.gi_star for r in cells.hotspot_gi_star(df, 6).collect()}
    hot_center = 13 * 64 + 13
    cold_center = 17 * 64 + 17
    assert got[hot_center] == max(got.values())
    assert got[cold_center] == min(got.values())
    # and global Moran's I is strongly positive (clustered field)
    mi = cells.moran_i(df, 6).collect()[0].moran_i
    assert mi > 0.3


def test_kde_heatmap_matches_brute_force(spark):
    """Gaussian KDE raster vs a numpy replay of the quantized kernel:
    identical integer micro-sums per cell, boundary contributions
    dropped (not wrapped), weighted variant scales contributions."""
    import numpy as np

    from oshdb_spark.geo.cells import kde_heatmap

    rng = np.random.default_rng(59)
    n = 400
    lon7 = rng.integers(-1_799_999_999, 1_800_000_000, n)
    lat7 = rng.integers(-899_999_999, 900_000_000, n)
    w = np.round(rng.uniform(0.5, 2.0, n), 3)
    df = spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in zip(lon7, lat7, w)],
        "lon7 long, lat7 long, wt double",
    )
    zoom, sigma, R = 5, 0.75, 2
    ncols, nrows = 32, 16
    wd = 3_600_000_000.0 / ncols
    got = {
        (r["cell_x"], r["cell_y"]): (r["density_micro"], r["contribs"])
        for r in kde_heatmap(
            df, zoom, weight_col="wt", sigma_cells=sigma, radius_cells=R
        ).collect()
    }
    exp: dict = {}
    px = (lon7.astype(np.float64) + 1_800_000_000.0) / wd
    py = (lat7.astype(np.float64) + 900_000_000.0) / wd
    cx0 = np.floor(px).astype(np.int64)
    cy0 = np.floor(py).astype(np.int64)
    for i in range(n):
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                nx, ny = int(cx0[i] + dx), int(cy0[i] + dy)
                if not (0 <= nx < ncols and 0 <= ny < nrows):
                    continue
                ddx = px[i] - (nx + 0.5)
                ddy = py[i] - (ny + 0.5)
                m = int(np.round(
                    w[i] * np.exp(-(ddx * ddx + ddy * ddy)
                                  / (2 * sigma * sigma)) * 1e6
                ))
                s, c = exp.get((nx, ny), (0, 0))
                exp[(nx, ny)] = (s + m, c + 1)
    assert got == exp
    assert len(got) > 100  # non-vacuous coverage of the grid

    # unweighted: every contribution ≤ 1e6 micro-units, counts match
    got1 = {
        (r["cell_x"], r["cell_y"]): (r["density_micro"], r["contribs"])
        for r in kde_heatmap(df, zoom, sigma_cells=sigma,
                             radius_cells=R).collect()
    }
    for (x, y), (dm, c) in got1.items():
        assert 0 <= dm <= c * 1_000_000


def test_idw_surface_matches_brute_force(spark):
    """Smoothed-IDW surface vs a numpy replay: exact integer num/den
    micro-sums per cell, single round-6 division per output cell."""
    import numpy as np

    from oshdb_spark.geo.cells import idw_surface

    rng = np.random.default_rng(71)
    n = 300
    lon7 = rng.integers(-1_799_999_999, 1_800_000_000, n)
    lat7 = rng.integers(-899_999_999, 900_000_000, n)
    v = np.round(rng.uniform(-50.0, 100.0, n), 2)
    df = spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in zip(lon7, lat7, v)],
        "lon7 long, lat7 long, val double",
    )
    zoom, R = 5, 2
    ncols, nrows = 32, 16
    wd = 3_600_000_000.0 / ncols
    got = {
        (r["cell_x"], r["cell_y"]): (r["n_samples"], r["idw_value"])
        for r in idw_surface(df, zoom, "val", radius_cells=R).collect()
    }
    px = (lon7.astype(np.float64) + 1_800_000_000.0) / wd
    py = (lat7.astype(np.float64) + 900_000_000.0) / wd
    cx0 = np.floor(px).astype(np.int64)
    cy0 = np.floor(py).astype(np.int64)
    acc: dict = {}
    for i in range(n):
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                nx, ny = int(cx0[i] + dx), int(cy0[i] + dy)
                if not (0 <= nx < ncols and 0 <= ny < nrows):
                    continue
                ddx = px[i] - (nx + 0.5)
                ddy = py[i] - (ny + 0.5)
                w = 1.0 / (ddx * ddx + ddy * ddy + 1e-6)
                wq = int(np.rint(w * 1e6))
                vwq = int(np.rint(v[i] * w * 1e6))
                c, num, den = acc.get((nx, ny), (0, 0, 0))
                acc[(nx, ny)] = (c + 1, num + vwq, den + wq)
    exp = {
        k: (c, float(np.round(num / den, 6)))
        for k, (c, num, den) in acc.items()
    }
    assert got == exp
    assert len(got) > 100
    # a sample sitting ~at a cell center dominates that cell's estimate
    one = spark.createDataFrame(
        [(int(-1_800_000_000 + 0.5 * wd), int(-900_000_000 + 0.5 * wd),
          42.0)],
        "lon7 long, lat7 long, val double",
    )
    rows = {
        (r["cell_x"], r["cell_y"]): r["idw_value"]
        for r in idw_surface(one, zoom, "val", radius_cells=1).collect()
    }
    assert abs(rows[(0, 0)] - 42.0) < 1e-3


def test_spacetime_gi_star_matches_replay(spark):
    """3×3×3 space-time Gi* vs a python replay on a sparse cube:
    lon wrap, lat clamp, time NO wrap, sparse no-data semantics."""
    import math

    from oshdb_spark.geo.cells import spacetime_gi_star

    zoom, ncols, y_max = 6, 64, 31
    rng = np.random.default_rng(103)
    bins = {}
    # sparse cube incl. antimeridian columns, top/bottom rows, and
    # time edges
    cells = [0, 1, 63, 64, 1000, 1001, 1064, 31 * 64, 31 * 64 + 63]
    for c in cells:
        for t in (0, 1, 2, 5):
            if rng.random() < 0.75:
                bins[(c, t)] = int(rng.integers(1, 9))
    df = spark.createDataFrame(
        [(c, t, v) for (c, t), v in bins.items()],
        "cell long, t long, cnt long",
    )
    got = {
        (r["cell"], r["t"]): (r["cnt"], r["gi_star"])
        for r in spacetime_gi_star(df, zoom).collect()
    }
    N = len(bins)
    S = sum(bins.values())
    S2 = sum(v * v for v in bins.values())
    exp = {}
    for (c, t), v in bins.items():
        x, y = c % ncols, c // ncols
        sf = nf = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dt in (-1, 0, 1):
                    ny = y + dy
                    if not (0 <= ny <= y_max):
                        continue
                    nc = ny * ncols + (x + dx) % ncols
                    w = bins.get((nc, t + dt))
                    if w is not None:
                        sf += w
                        nf += 1
        num = float(N * sf - S * nf)
        den = math.sqrt(float(N * S2 - S * S)) * math.sqrt(
            float(N * nf - nf * nf) / float(N - 1)
        )
        gi = num / den
        exp[(c, t)] = (v, float(np.format_float_positional(
            np.round(gi, 6), trim='-')) if gi == gi else None)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-9), k


def test_simplify_radial_matches_fold(spark):
    """Radial simplification vs a pure-python sequential fold; the
    first fix always survives, consecutive kept fixes are >= d apart,
    and every dropped fix is < d from its governing kept fix."""
    import numpy as np

    from oshdb_spark.geo.trajectory import simplify_radial

    rng = np.random.default_rng(127)
    R = 6_371_000.0
    pts = []
    for e in range(8):
        lon = int(rng.integers(-1_000_000_000, 1_000_000_000))
        lat = int(rng.integers(-600_000_000, 600_000_000))
        for i in range(40):
            lon += int(rng.integers(-3_000_000, 3_000_001))
            lat += int(rng.integers(-3_000_000, 3_000_001))
            pts.append((e, i, lon, lat))
    df = spark.createDataFrame(
        pts, "entity long, ord_key long, lon7 long, lat7 long"
    )
    d = 80_000.0
    got = {}
    for r in simplify_radial(df, d).collect():
        got.setdefault(r["entity"], []).append(
            (r["kept_seq"], r["ord_key"], r["lon7"], r["lat7"])
        )

    totals = []

    def mm(a, b):
        la, lb = a[1] * 1e-7, b[1] * 1e-7
        lo, lp = a[0] * 1e-7, b[0] * 1e-7
        dlat = np.radians(lb - la)
        dlng = np.radians(lp - lo) * np.cos(np.radians((la + lb) / 2.0))
        return int(np.rint(R * np.sqrt(dlng * dlng + dlat * dlat)
                           * 1000.0))

    for e in range(8):
        seq = [(lon, lat, i) for (ee, i, lon, lat) in pts if ee == e]
        kept = [seq[0]]
        for p in seq[1:]:
            if mm((kept[-1][0], kept[-1][1]), (p[0], p[1])) >= d * 1000:
                kept.append(p)
        want = [(k, p[2], p[0], p[1]) for k, p in enumerate(kept)]
        assert sorted(got[e]) == want, f"entity {e}"
        totals.append(len(kept))
    # non-vacuous across the fixture: drops AND multi-keeps both occur
    assert all(t < 40 for t in totals)
    assert sum(totals) > 8


def test_heading_stats_matches_numpy_circular_mean(spark):
    """Circular mean/resultant against a direct numpy replay — including
    the north-wrap case a linear bearing average gets wrong."""
    import numpy as np

    from oshdb_spark.geo.trajectory import heading_stats

    rng = np.random.default_rng(53)
    rows = []
    tracks = {}
    for ent in range(8):
        n = int(rng.integers(5, 40))
        lon7 = rng.integers(-1_700_000_000, 1_700_000_000)
        lat7 = rng.integers(-800_000_000, 800_000_000)
        fixes = [(lon7, lat7)]
        for _ in range(n):
            lon7 = lon7 + int(rng.integers(-500_000, 500_000))
            lat7 = lat7 + int(rng.integers(-500_000, 500_000))
            fixes.append((lon7, lat7))
        # inject a repeated fix (zero hop must be excluded from n_hops)
        fixes.append(fixes[-1])
        tracks[ent] = fixes
        rows.extend(
            (ent, k, int(a), int(b)) for k, (a, b) in enumerate(fixes)
        )
    # entity 100: bearings straddling north (the 359°/1° wrap): NE then NW
    tracks[100] = [(0, 0), (100_000, 1_000_000), (0, 2_000_000)]
    rows.extend((100, k, a, b) for k, (a, b) in enumerate(tracks[100]))

    df = spark.createDataFrame(
        rows, "entity long, ord_key long, lon7 long, lat7 long"
    )
    got = {
        r["entity"]: (r["n_hops"], r["mean_bearing_deg"], r["resultant_len"])
        for r in heading_stats(df).collect()
    }
    for ent, fixes in tracks.items():
        ss = sc = 0
        n = 0
        for (ax, ay), (bx, by) in zip(fixes[:-1], fixes[1:]):
            plon, plat = ax * 1e-7, ay * 1e-7
            lon, lat = bx * 1e-7, by * 1e-7
            east = np.radians(lon - plon) * np.cos(
                np.radians((plat + lat) / 2.0)
            )
            north = np.radians(lat - plat)
            if east == 0.0 and north == 0.0:
                continue
            th = np.arctan2(east, north)
            ss += int(np.floor(abs(np.sin(th)) * 1e9 + 0.5)
                      * np.sign(np.sin(th)))
            sc += int(np.floor(abs(np.cos(th)) * 1e9 + 0.5)
                      * np.sign(np.cos(th)))
            n += 1
        exp_mean = round(float(np.degrees(np.arctan2(ss, sc))), 6)
        exp_r = round(float(np.hypot(ss, sc) / (n * 1e9)), 6)
        g = got[ent]
        assert g[0] == n, ent
        assert abs(g[1] - exp_mean) < 1e-9, ent
        assert abs(g[2] - exp_r) < 1e-9, ent
    # the wrap case: both hops point broadly north, so the circular mean
    # is near 0° — a linear average of the two bearings (~5.7° and
    # ~354.3°, i.e. 180°) would be wrong
    assert abs(got[100][1]) < 10.0
    assert got[100][2] > 0.99


def _ref_geohash(lon, lat, p):
    """Textbook bisection geohash (MSB-first, lon on even positions)."""
    B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo, hi = -180.0, 180.0
    la, ha = -90.0, 90.0
    bits = []
    even = True
    while len(bits) < 5 * p:
        if even:
            mid = (lo + hi) / 2
            if lon >= mid:
                bits.append(1)
                lo = mid
            else:
                bits.append(0)
                hi = mid
        else:
            mid = (la + ha) / 2
            if lat >= mid:
                bits.append(1)
                la = mid
            else:
                bits.append(0)
                ha = mid
        even = not even
    out = ""
    for i in range(p):
        v = 0
        for k in range(5):
            v = v * 2 + bits[5 * i + k]
        out += B32[v]
    return out


def test_geohash_col_matches_bisection_reference(spark):
    import random

    from oshdb_spark.geo.cells import geohash_col

    random.seed(11)
    # the classic test vector + edges (east/north clamp) + random sweep
    pts = [
        (-56_030_000, 426_050_000),  # lon -5.603 lat 42.605 -> ezs42...
        (0, 0),
        (1_800_000_000, 900_000_000),
        (-1_800_000_000, -900_000_000),
        (1_800_000_000, -900_000_000),
        (-1_800_000_000, 900_000_000),
        (1_799_999_999, 899_999_999),
        (-1, 1),
    ]
    pts += [
        (random.randint(-1_800_000_000, 1_800_000_000),
         random.randint(-900_000_000, 900_000_000))
        for _ in range(150)
    ]
    df = spark.createDataFrame(pts, "lon7 long, lat7 long")
    for p in (1, 2, 5, 6, 12):  # odd and even precisions
        got = [
            r[0] for r in df.select(geohash_col("lon7", "lat7", p)).collect()
        ]
        for (lon7, lat7), g in zip(pts, got):
            # the engine clamps the east/north edges into the last cell;
            # feed the reference a value just inside
            lon = min(lon7 * 1e-7, 179.99999999999)
            lat = min(lat7 * 1e-7, 89.999999999999)
            assert g == _ref_geohash(lon, lat, p), (lon7, lat7, p)
    assert got[0] == "ezs42s000esk"[:12]  # p=12 of the classic vector


def test_convex_hull_stats_vertices_and_invariants(spark):
    """Hull vertex sets verified by an INDEPENDENT exact criterion
    (Caratheodory: p is a strict hull vertex iff it lies in no
    triangle/segment of other points), plus ordering and measure
    invariants."""
    import random

    from oshdb_spark.geo.hull import convex_hull_stats

    random.seed(29)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def in_triangle_or_segment(p, a, b, c):
        d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        if (d1 >= 0 and d2 >= 0 and d3 >= 0) or (
            d1 <= 0 and d2 <= 0 and d3 <= 0
        ):
            return True
        return False

    def on_segment(p, a, b):
        if cross(a, b, p) != 0:
            return False
        return (
            min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
        )

    rows = []
    expected_pts = {}
    for ent in range(6):
        base = (
            random.randint(-1_200_000_000, 1_200_000_000),
            random.randint(-600_000_000, 600_000_000),
        )
        n = random.randint(8, 25)
        pts = list(
            dict.fromkeys(
                (
                    base[0] + random.randint(-40_000_000, 40_000_000),
                    base[1] + random.randint(-40_000_000, 40_000_000),
                )
                for _ in range(n)
            )
        )
        # force a collinear boundary point (must be excluded: strict hull)
        pts.append((base[0] + 50_000_000, base[1]))
        pts.append((base[0] - 50_000_000, base[1]))
        pts.append((base[0], base[1]))
        pts = list(dict.fromkeys(pts))
        expected_pts[ent] = pts
        rows.extend((ent, x, y) for x, y in pts)
    df = spark.createDataFrame(rows, "entity long, lon7 long, lat7 long")
    got = {r["entity"]: r for r in convex_hull_stats(df).collect()}
    # rebuild the hull vertex SET independently per entity
    from oshdb_spark.geo.hull import _chain

    for ent, pts in expected_pts.items():
        vertices = set()
        for p in pts:
            others = [q for q in pts if q != p]
            covered = any(
                on_segment(p, a, b)
                for i, a in enumerate(others)
                for b in others[i + 1:]
            ) or any(
                in_triangle_or_segment(p, a, b, c)
                for i, a in enumerate(others)
                for j, b in enumerate(others[i + 1:], i + 1)
                for c in others[j + 1:]
            )
            if not covered:
                vertices.add(p)
        hull_seq = _chain(pts)
        assert set(hull_seq) == vertices, ent
        r = got[ent]
        assert r["n_hull"] == len(vertices), ent
        assert r["n_pts"] == len(pts), ent
        assert r["n_hull"] <= r["n_pts"]
        assert r["area_km2"] > 0 and r["perim_km"] > 0
    # degenerate entities (point / collinear) are omitted
    deg = spark.createDataFrame(
        [(90, 0, 0), (90, 0, 0), (91, 0, 0), (91, 10_000_000, 10_000_000),
         (91, 20_000_000, 20_000_000)],
        "entity long, lon7 long, lat7 long",
    )
    assert convex_hull_stats(deg).count() == 0


def test_contour_segments_matches_reference_impl(spark):
    """Marching squares vs an independently written per-block reference
    (explicit inside-corner-set lookup), over a random raster and a
    plateau whose contour is a known closed ring; saddle blocks resolve
    by the center-average convention on both sides."""
    import math
    import random

    from oshdb_spark.geo.cells import contour_segments

    random.seed(67)
    zoom, ncols = 6, 64
    w = 360.0 / 64

    def ref_segments(values, t):
        """values: dict (x, y) -> v. Returns multiset of segments as
        frozenset of rounded lattice endpoints."""
        segs = []
        xs = [x for x, _ in values]
        ys = [y for _, y in values]
        for bx in range(min(xs) - 1, max(xs) + 1):
            for by2 in range(min(ys) - 1, max(ys) + 1):
                v00 = values.get((bx, by2), 0)
                v10 = values.get((bx + 1, by2), 0)
                v01 = values.get((bx, by2 + 1), 0)
                v11 = values.get((bx + 1, by2 + 1), 0)
                inside = frozenset(
                    n for n, v in
                    (("00", v00), ("10", v10), ("11", v11), ("01", v01))
                    if v > t
                )
                if not inside or len(inside) == 4:
                    continue

                def pt(edge):
                    if edge == "B":
                        return (bx + (t - v00) / (v10 - v00), float(by2))
                    if edge == "R":
                        return (bx + 1.0, by2 + (t - v10) / (v11 - v10))
                    if edge == "T":
                        return (bx + (t - v01) / (v11 - v01), by2 + 1.0)
                    return (float(bx), by2 + (t - v00) / (v01 - v00))

                table = {
                    frozenset({"00"}): [("L", "B")],
                    frozenset({"10"}): [("B", "R")],
                    frozenset({"11"}): [("T", "R")],
                    frozenset({"01"}): [("L", "T")],
                    frozenset({"00", "10"}): [("L", "R")],
                    frozenset({"10", "11"}): [("B", "T")],
                    frozenset({"01", "11"}): [("L", "R")],
                    frozenset({"00", "01"}): [("B", "T")],
                    frozenset({"00", "10", "11"}): [("L", "T")],
                    frozenset({"10", "11", "01"}): [("L", "B")],
                    frozenset({"00", "11", "01"}): [("B", "R")],
                    frozenset({"00", "10", "01"}): [("T", "R")],
                }
                if inside == frozenset({"00", "11"}):
                    pairs = ([("L", "T"), ("B", "R")]
                             if (v00 + v10 + v11 + v01) / 4.0 > t
                             else [("L", "B"), ("T", "R")])
                elif inside == frozenset({"10", "01"}):
                    pairs = ([("L", "B"), ("T", "R")]
                             if (v00 + v10 + v11 + v01) / 4.0 > t
                             else [("L", "T"), ("B", "R")])
                else:
                    pairs = table[inside]
                for a, b in pairs:
                    pa, pb = pt(a), pt(b)
                    segs.append(frozenset({
                        (round(pa[0], 9), round(pa[1], 9)),
                        (round(pb[0], 9), round(pb[1], 9)),
                    }))
        return sorted(segs, key=sorted)

    def run_engine(values, levels):
        rows = [(y * ncols + x, v) for (x, y), v in values.items()]
        df = spark.createDataFrame(rows, "cell long, v long")
        out = {}
        for r in contour_segments(df, zoom, levels).collect():
            la = r["x0d"] / w + 180.0 / w - 0.5, r["y0d"] / w + 90.0 / w - 0.5
            lb = r["x1d"] / w + 180.0 / w - 0.5, r["y1d"] / w + 90.0 / w - 0.5
            out.setdefault(r["level"], []).append(frozenset({
                (round(la[0], 6), round(la[1], 6)),
                (round(lb[0], 6), round(lb[1], 6)),
            }))
        return out

    # random raster including saddle-prone values
    values = {
        (random.randint(5, 20), random.randint(5, 15)):
            random.randint(1, 10)
        for _ in range(120)
    }
    got = run_engine(values, [2, 5])
    for t in (2, 5):
        exp = [frozenset({(round(a, 6), round(b, 6)) for a, b in s})
               for s in ref_segments(values, t)]
        assert sorted(got.get(t, []), key=sorted) == sorted(exp, key=sorted)
    # plateau: closed ring, analytic length (straight runs + 45° cuts)
    plateau = {(x, y): 10 for x in range(30, 34) for y in range(20, 23)}
    got = run_engine(plateau, [5])[5]
    exp = ref_segments(plateau, 5)
    assert len(got) == len(exp)
    # closed curve: every endpoint appears exactly twice
    from collections import Counter
    c = Counter(p for s in got for p in s)
    assert all(v == 2 for v in c.values())
    # analytic lattice length: (W-1 + H-1 straight units) * 2 + 4 * sqrt(.5)
    lat_len = sum(
        math.dist(*list(s)) for s in got
    )
    assert abs(lat_len - (2 * (3 + 2) + 4 * math.sqrt(0.5))) < 1e-6


def test_local_moran_vs_reference(spark):
    """LISA per-cell I and quadrant labels vs the textbook float
    formulation (z_i * spatial-lag / m2) on the same wrap/polar/isolated
    raster the global-stat test uses."""
    raster = {
        (5 * 64 + 0): 9,
        (5 * 64 + 63): 7,
        (5 * 64 + 1): 3,
        (6 * 64 + 0): 4,
        (31 * 64 + 10): 2,
        (31 * 64 + 11): 6,
        (20 * 64 + 40): 5,     # isolated: zero lag -> 'NA'
        (12 * 64 + 20): 1,
        (12 * 64 + 21): 8,
        (13 * 64 + 20): 2,
    }
    df = spark.createDataFrame(
        [(c, v) for c, v in raster.items()], "cell long, cnt long"
    )
    got = {
        r.cell: (r.local_i, r.quadrant)
        for r in cells.local_moran(df, 6).collect()
    }
    assert set(got) == set(raster)

    cs = sorted(raster)
    n = len(cs)
    mean = sum(raster.values()) / n
    m2 = sum((raster[c] - mean) ** 2 for c in cs) / n

    def neigh(c):
        x, y = c % 64, c // 64
        out = []
        for dy in (-1, 0, 1):
            ny = y + dy
            if ny < 0 or ny > 31:
                continue
            for dx in (-1, 0, 1):
                t = ny * 64 + (x + dx) % 64
                if t != c and t in raster:
                    out.append(t)
        return out

    for c in cs:
        z = raster[c] - mean
        lag = sum(raster[t] - mean for t in neigh(c))
        want_i = z * lag / m2
        assert got[c][0] == pytest.approx(round(want_i, 6), abs=2e-6), c
        want_q = (
            "HH" if z > 0 and lag > 0 else
            "LL" if z < 0 and lag < 0 else
            "HL" if z > 0 and lag < 0 else
            "LH" if z < 0 and lag > 0 else "NA"
        )
        assert got[c][1] == want_q, c
    assert got[20 * 64 + 40][1] == "NA"  # isolated cell


def test_mann_kendall_vs_pair_loop(spark):
    """MK S / tie-corrected variance / z / labels vs a direct pairwise
    loop, covering: a strictly increasing cell, a strictly decreasing
    cell, heavy ties, a constant series (var18 = 0, S = 0), and a
    single-bin cell."""
    import math

    series = {
        1: [(0, 1), (1, 3), (2, 4), (3, 7), (4, 9), (5, 12), (6, 15),
            (7, 18), (8, 20), (9, 25)],               # increasing
        2: [(0, 30), (1, 22), (2, 21), (3, 15), (4, 11), (5, 8),
            (6, 5), (7, 3), (8, 2), (9, 1)],          # decreasing
        3: [(0, 5), (1, 5), (2, 7), (3, 5), (4, 7), (5, 7), (6, 5)],
        4: [(0, 4), (1, 4), (2, 4), (3, 4)],          # constant
        5: [(0, 9)],                                  # single bin
    }
    rows = [
        (c, t, v) for c, evs in series.items() for t, v in evs
    ]
    df = spark.createDataFrame(rows, "cell long, t long, cnt long")
    got = {
        r.cell: r for r in cells.mann_kendall_trend(df).collect()
    }
    for c, evs in series.items():
        vals = [v for _, v in sorted(evs)]
        nn = len(vals)
        s = sum(
            (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
            for i in range(nn) for j in range(i + 1, nn)
        )
        ties = {}
        for v in vals:
            ties[v] = ties.get(v, 0) + 1
        var18 = nn * (nn - 1) * (2 * nn + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        if s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        else:
            z = 0.0
        r = got[c]
        assert (r.n_bins, r.s_stat, r.var18) == (nn, s, var18), c
        assert r.z == pytest.approx(round(z, 6), abs=1e-9), c
        want = ("increasing" if z > 1.959964 else
                "decreasing" if z < -1.959964 else "none")
        assert r.trend == want, c
    assert got[1].trend == "increasing"
    assert got[2].trend == "decreasing"
    assert got[4].z == 0.0 and got[5].z == 0.0


def test_std_ellipse_vs_numpy_eig(spark):
    """SDE mean/orientation/axes vs numpy's eigendecomposition of the
    population covariance: an anisotropic cloud (rotated line + noise),
    an isotropic cloud (axes equal-ish), a 2-point entity, and a
    single point (zero axes)."""
    import numpy as np

    from oshdb_spark.geo.trajectory import std_ellipse

    rng = np.random.default_rng(7)
    rows = []
    # entity 1: points along a 30-degree line, scattered
    th = np.radians(30.0)
    for i in range(200):
        t = rng.uniform(-1, 1) * 2_000_000
        w = rng.uniform(-1, 1) * 200_000
        x = int(t * np.cos(th) - w * np.sin(th)) + 100_000_000
        y = int(t * np.sin(th) + w * np.cos(th)) + 50_000_000
        rows.append((1, x, y))
    # entity 2: isotropic blob
    for i in range(300):
        rows.append((
            2,
            int(rng.uniform(-1, 1) * 500_000) - 700_000_000,
            int(rng.uniform(-1, 1) * 500_000) + 200_000_000,
        ))
    rows.append((3, 1_000_000, 2_000_000))
    rows.append((3, 3_000_000, 6_000_000))
    rows.append((4, 123_456_789, -987_654_321))   # single point
    df = spark.createDataFrame(rows, "entity long, lon7 long, lat7 long")
    got = {r.entity: r for r in std_ellipse(df).collect()}

    by_ent = {}
    for e, x, y in rows:
        by_ent.setdefault(e, []).append((x, y))
    for e, pts in by_ent.items():
        a = np.array(pts, dtype=np.float64)
        r = got[e]
        assert r.n_pts == len(pts)
        assert r.mean_lon == pytest.approx(a[:, 0].mean() * 1e-7, abs=1e-5)
        assert r.mean_lat == pytest.approx(a[:, 1].mean() * 1e-7, abs=1e-5)
        cov = np.cov(a.T, ddof=0) if len(pts) > 1 else np.zeros((2, 2))
        evals, evecs = np.linalg.eigh(cov)
        want_major = np.sqrt(2 * evals[1]) * 1e-7
        want_minor = np.sqrt(2 * evals[0]) * 1e-7
        assert r.major_deg == pytest.approx(want_major, rel=1e-6, abs=1e-6), e
        assert r.minor_deg == pytest.approx(want_minor, rel=1e-6, abs=1e-6), e
        if evals[1] - evals[0] > 1e-6:
            v = evecs[:, 1]
            ang = np.degrees(np.arctan2(v[1], v[0])) % 180.0
            assert got[e].orient_deg % 180.0 == pytest.approx(
                ang, abs=1e-4
            ) or abs((got[e].orient_deg % 180.0) - ang) == pytest.approx(
                180.0, abs=1e-4
            ), e
    # entity 1's major axis must sit near 30 degrees
    assert got[1].orient_deg % 180.0 == pytest.approx(30.0, abs=2.0)
    assert got[4].major_deg == 0.0 and got[4].minor_deg == 0.0


def test_slope_aspect_vs_dense_numpy(spark):
    """Horn gradients vs a dense numpy replay (absent cells = 0, lon
    wrap, polar clamp), plus analytic checks of the documented
    convention (aspect = direction of the VALUE gradient, CCW from
    east): an east-rising ramp has aspect 0, a north-rising ramp 90,
    and a constant plateau interior is flat (null aspect)."""
    import numpy as np

    raster = {}
    # east-rising ramp in a block (values x): rows 5..9, cols 10..16
    for y in range(5, 10):
        for x in range(10, 17):
            raster[y * 64 + x] = 10 * x
    # north-rising ramp elsewhere
    for y in range(20, 26):
        for x in range(30, 35):
            raster[y * 64 + x] = 7 * y
    # constant plateau
    for y in range(14, 18):
        for x in range(50, 54):
            raster[y * 64 + x] = 5
    # wrap pair + polar row
    raster[3 * 64 + 0] = 9
    raster[3 * 64 + 63] = 4
    raster[31 * 64 + 7] = 6

    df = spark.createDataFrame(
        [(c, v) for c, v in raster.items()], "cell long, cnt long"
    )
    got = {r.cell: r for r in cells.slope_aspect(df, 6).collect()}
    assert set(got) == set(raster)

    dense = np.zeros((32, 64), dtype=np.int64)
    for c, v in raster.items():
        dense[c // 64, c % 64] = v

    def at(y, x):
        if y < 0 or y > 31:
            return 0
        return int(dense[y, x % 64])

    for c in raster:
        y, x = c // 64, c % 64
        a, b_, cc = at(y + 1, x - 1), at(y + 1, x), at(y + 1, x + 1)
        d, f = at(y, x - 1), at(y, x + 1)
        g, h, i = at(y - 1, x - 1), at(y - 1, x), at(y - 1, x + 1)
        gx = (cc + 2 * f + i) - (a + 2 * d + g)
        gy = (a + 2 * b_ + cc) - (g + 2 * h + i)
        r = got[c]
        assert (r.gx, r.gy) == (gx, gy), c
        want_slope = np.degrees(np.arctan(np.hypot(gx, gy) / 8.0))
        assert r.slope_deg == pytest.approx(want_slope, abs=1e-6), c
        if gx == 0 and gy == 0:
            assert r.aspect_deg is None, c
        else:
            assert r.aspect_deg == pytest.approx(
                np.degrees(np.arctan2(gy, gx)), abs=1e-6
            ), c
    # analytic: ramp interiors
    assert got[7 * 64 + 13].aspect_deg == pytest.approx(0.0)    # east-rising
    assert got[22 * 64 + 32].aspect_deg == pytest.approx(90.0)  # north-rising
    assert got[15 * 64 + 51].aspect_deg is None                 # flat plateau
    assert got[15 * 64 + 51].slope_deg == 0.0


def test_hexbin_assignment_is_nearest_lattice_center(spark):
    """hexbin_cols: every point's bin is the true nearest center of the
    doubled lattice (brute-force over a neighborhood), ties to lattice
    A; centers lie on the two lattices; bins tile without gaps."""
    import random as _r

    import pyspark.sql.functions as F

    from oshdb_spark.geo.cells import hex_height7, hexbin_cols

    w = 100_000_000
    h = hex_height7(w)  # √3·w — regular pointy-top cells
    assert h == 173205080
    _r.seed(5)
    pts = [
        (
            i,
            _r.randint(-1_800_000_000, 1_799_999_999),
            _r.randint(-850_000_000, 850_000_000),
        )
        for i in range(500)
    ]
    # adversarial: exact centers, midpoints, lattice edges
    pts += [
        (1000, 0, 0),
        (1001, w // 2, h // 2),
        (1002, w // 4, h // 4),
        (1003, -w // 2, -h // 2),
        (1004, w // 2 + 1, h // 2 - 1),
    ]
    df = spark.createDataFrame(pts, "i long, lon7 long, lat7 long")
    hx, hy = hexbin_cols("lon7", "lat7", w, h)
    got = {r.i: (r.hx, r.hy) for r in df.select("i", hx, hy).collect()}
    for i, lon, lat in pts:
        X, Y = lon + 1_800_000_000, lat + 900_000_000
        cands = []
        for kx in range(X // w - 1, X // w + 3):
            for ky in range(Y // h - 1, Y // h + 3):
                for (cx, cy, pri) in (
                    (kx * w, ky * h, 0),
                    (kx * w + w // 2, ky * h + h // 2, 1),
                ):
                    d = (X - cx) ** 2 + (Y - cy) ** 2
                    cands.append((d, pri, cx, cy))
        d_min = min(c[0] for c in cands)
        gx, gy = got[i][0] + 1_800_000_000, got[i][1] + 900_000_000
        d_got = (X - gx) ** 2 + (Y - gy) ** 2
        # chosen center attains the true nearest distance over the
        # doubled lattice (positional half-ties within one lattice keep
        # the distance, so exact equality is required) ...
        assert d_got == d_min, (i, lon, lat, got[i], d_got, d_min)
        on_a = gx % w == 0 and gy % h == 0
        on_b = gx % w == w // 2 and gy % h == h // 2
        assert on_a or on_b, (i, got[i])
        # ... and cross-lattice distance ties resolve to lattice A
        if any(c[0] == d_min and c[1] == 0 for c in cands):
            assert on_a, (i, lon, lat, got[i])


def test_voronoi_assign_matches_brute_force(spark):
    """voronoi_assign vs per-point brute force incl. an exact-tie point
    equidistant to two seeds (smaller id wins)."""
    import random as _r

    from oshdb_spark.geo.cells import voronoi_assign

    seeds = [(1, 0, 0), (2, 1_000_000, 0), (3, -500_000, 800_000),
             (4, 1_800_000_000, 849_999_999)]
    _r.seed(9)
    pts = [
        (i, _r.randint(-1_800_000_000, 1_799_999_999),
         _r.randint(-850_000_000, 850_000_000))
        for i in range(300)
    ]
    pts.append((900, 500_000, 123))  # equidistant to seeds 1 and 2
    df = spark.createDataFrame(pts, "i long, lon7 long, lat7 long")
    got = {r.i: r.seed_id for r in voronoi_assign(df, seeds).collect()}
    for i, lon, lat in pts:
        want = min(
            ((lon - sx) ** 2 + (lat - sy) ** 2, sid)
            for sid, sx, sy in seeds
        )[1]
        assert got[i] == want, (i, lon, lat, got[i], want)
    assert got[900] == 1


def test_simplify_dp_matches_recursive_replay(spark):
    """simplify_dp vs a pure-python recursive DP replay (exact big-int
    arithmetic, earliest-index argmax ties) on random walks, a
    collinear run, an exact-tie vee, and a wide-span (big-int branch)
    track."""
    import random as _r

    from oshdb_spark.geo.trajectory import simplify_dp

    def replay(pts, tol):
        n = len(pts)
        keep = {0, n - 1}

        def rec(i0, i1):
            if i1 - i0 < 2:
                return
            dx = pts[i1][0] - pts[i0][0]
            dy = pts[i1][1] - pts[i0][1]
            best, bc = None, -1
            for i in range(i0 + 1, i1):
                c = abs(dx * (pts[i][1] - pts[i0][1])
                        - dy * (pts[i][0] - pts[i0][0]))
                if c > bc:
                    best, bc = i, c
            if bc * bc > tol * tol * (dx * dx + dy * dy):
                keep.add(best)
                rec(i0, best)
                rec(best, i1)

        rec(0, n - 1)
        return sorted(keep)

    _r.seed(3)
    tracks = {}
    for e in range(6):
        x, y = 0, 0
        pts = []
        for _ in range(_r.randint(2, 60)):
            x += _r.randint(-3_000_000, 3_000_000)
            y += _r.randint(-3_000_000, 3_000_000)
            pts.append((x, y))
        tracks[e] = pts
    tracks[10] = [(i * 1_000_000, 0) for i in range(10)]  # collinear
    tracks[11] = [(0, 0), (5_000_000, 7_777), (10_000_000, 0),
                  (15_000_000, -7_777), (20_000_000, 0)]  # tie |cross|
    tracks[12] = [(-1_790_000_000, -840_000_000),
                  (0, 840_000_000),
                  (1_790_000_000, -840_000_000)]  # wide-span big ints
    tracks[13] = [(0, 0), (9, 9)]  # two points
    rows = [
        (e, i, p[0], p[1])
        for e, pts in tracks.items()
        for i, p in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "entity long, ord_key long, lon7 long, lat7 long"
    )
    tol = 2_000_000
    got = {}
    for r in simplify_dp(df, tol).collect():
        got.setdefault(r.entity, []).append(
            (r.kept_seq, r.ord_key, r.lon7, r.lat7)
        )
    for e, pts in tracks.items():
        want_idx = replay(pts, tol)
        want = [
            (s, i, pts[i][0], pts[i][1])
            for s, i in enumerate(want_idx)
        ]
        assert sorted(got[e]) == want, (e, got[e], want)
    assert len(got[10]) == 2  # collinear collapses to endpoints


def test_geary_c_vs_textbook_reference(spark):
    """Integer-exact Geary's C vs the plain textbook float formula on
    the same wrap/polar/isolated raster as the Moran test."""
    raster = {
        (5 * 64 + 0): 9,
        (5 * 64 + 63): 7,
        (5 * 64 + 1): 3,
        (6 * 64 + 0): 4,
        (31 * 64 + 10): 2,
        (31 * 64 + 11): 6,
        (20 * 64 + 40): 5,
        (12 * 64 + 20): 1,
        (12 * 64 + 21): 8,
        (13 * 64 + 20): 2,
    }
    df = spark.createDataFrame(
        [(c, v) for c, v in raster.items()], "cell long, cnt long"
    )

    ncols, y_max = 64, 31
    cs = sorted(raster)
    n = len(cs)
    xbar = sum(raster.values()) / n

    def neigh(c):
        x, y = c % ncols, c // ncols
        out = []
        for dy in (-1, 0, 1):
            ny = y + dy
            if ny < 0 or ny > y_max:
                continue
            for dx in (-1, 0, 1):
                t = ny * ncols + (x + dx) % ncols
                if t != c and t in raster:
                    out.append(t)
        return out

    num = 0.0
    w_pairs = 0
    for c in cs:
        for t in neigh(c):
            num += (raster[c] - raster[t]) ** 2
            w_pairs += 1
    den = sum((v - xbar) ** 2 for v in raster.values())
    want = (n - 1) * num / (2 * w_pairs * den)

    row = cells.geary_c(df, 6).collect()
    assert len(row) == 1
    assert row[0].n_cells == n and row[0].w_pairs == w_pairs
    assert row[0].geary_c == pytest.approx(want, abs=1e-8)
    # constant surface has zero variance → guarded null, not 0/0
    flat = spark.createDataFrame(
        [(12 * 64 + 20 + i, 5) for i in range(4)], "cell long, cnt long"
    )
    assert cells.geary_c(flat, 6).collect()[0].geary_c is None


def test_theil_sen_matches_sorted_replay(spark):
    """theil_sen_trend vs a python pairwise-slope lower-median replay,
    incl. slope ties and an outlier the estimator must shrug off."""
    import pytest as _pt

    from oshdb_spark.geo.cells import theil_sen_trend

    series = {
        1: [(0, 10), (1, 12), (2, 14), (3, 16), (4, 180)],  # outlier
        2: [(0, 5), (1, 5), (2, 5)],                        # flat
        3: [(0, 1), (2, 5), (3, 7), (7, 15)],               # exact 2/wk
        4: [(0, 3), (1, 9)],                                # single pair
    }
    rows = [
        (c, t, v) for c, pts in series.items() for t, v in pts
    ]
    df = spark.createDataFrame(rows, "cell long, wk long, cnt long")
    got = {
        r.cell: (r.n_pairs, r.ts_slope)
        for r in theil_sen_trend(df).collect()
    }
    for c, pts in series.items():
        slopes = sorted(
            ((b[1] - a[1]) / (b[0] - a[0]), a[0], b[0])
            for i, a in enumerate(pts)
            for b in pts[i + 1:]
        )
        k = (len(slopes) + 1) // 2
        want = round(slopes[k - 1][0], 9)
        assert got[c][0] == len(slopes)
        assert got[c][1] == _pt.approx(want, abs=1e-12), (c,)
    assert got[1][1] == 2.0   # outlier shrugged off
    assert got[2][1] == 0.0
    assert got[3][1] == 2.0


def test_quadkey_matches_bit_interleave_reference(spark):
    """quadkey_col vs a python bit-interleave reference over the EXACT
    rational tile width (360e7/2^z — fractional past zoom 10), incl.
    the classic prefix-hierarchy property, lat-clamp at +90, the
    antimeridian wrap (lon=+180 → westernmost column, xy_id parity),
    and the SE-corner point whose x the old truncated width would have
    pushed out of range at zoom 15."""
    import random as _r

    from oshdb_spark.geo.cells import quadkey_col

    def ref(lon7, lat7, zoom):
        N = 3515625  # 360e7 == N << 10

        def fd(v):
            if zoom <= 10:
                return v // (N << (10 - zoom))
            return (v * (1 << (zoom - 10))) // N

        x = fd(lon7 + 1_800_000_000)
        if x >= 1 << zoom:
            x = 0  # antimeridian wrap (XYGrid parity)
        y_max = (1 << zoom) // 2 - 1
        yy = min(fd(lat7 + 900_000_000), y_max)
        y = y_max - yy
        return "".join(
            str(2 * ((y >> k) & 1) + ((x >> k) & 1))
            for k in range(zoom - 1, -1, -1)
        )

    _r.seed(2)
    pts = [
        (i, _r.randint(-1_800_000_000, 1_799_999_999),
         _r.randint(-900_000_000, 900_000_000))
        for i in range(300)
    ]
    pts += [(900, -1_800_000_000, 900_000_000),   # NW corner, clamped
            (901, 1_799_999_999, -900_000_000),   # SE corner
            (902, 0, 0),
            (903, 1_800_000_000, 0)]              # +180: wraps west
    df = spark.createDataFrame(pts, "i long, lon7 long, lat7 long")
    for zoom in (1, 6, 8, 11, 12, 15):
        got = {
            r.i: r.q
            for r in df.select(
                "i", quadkey_col("lon7", "lat7", zoom).alias("q")
            ).collect()
        }
        for i, lon, lat in pts:
            assert got[i] == ref(lon, lat, zoom), (zoom, i, lon, lat)
        # the wrap really lands in the westernmost column's key
        assert got[903] == ref(-1_800_000_000, 0, zoom)
        # SE corner stays in range (the zoom-15 regression the truncated
        # width had: x = 2^z aliasing to column 0)
        assert got[901][0] in "0123" and got[901] != got[900]
    # prefix hierarchy: zoom-6 key prefixes the zoom-8 and zoom-12 keys
    g6 = {r.i: r.q for r in df.select(
        "i", quadkey_col("lon7", "lat7", 6).alias("q")).collect()}
    g8 = {r.i: r.q for r in df.select(
        "i", quadkey_col("lon7", "lat7", 8).alias("q")).collect()}
    g12 = {r.i: r.q for r in df.select(
        "i", quadkey_col("lon7", "lat7", 12).alias("q")).collect()}
    assert all(g8[i].startswith(g6[i]) for i, _, _ in pts)
    assert all(g12[i].startswith(g8[i]) for i, _, _ in pts)


def test_hex_smooth_matches_neighbor_replay(spark):
    """hex_smooth vs a python 7-offset replay on a hand raster with
    missing neighbors (sparse semantics)."""
    from oshdb_spark.geo.cells import hex_height7, hex_smooth

    w = 200_000_000
    h = hex_height7(w)  # √3·w — the 6 offsets are true Voronoi neighbors
    assert h == 346410160
    raster = {
        (0, 0): 10,
        (w, 0): 2,                 # east neighbor
        (w // 2, h // 2): 4,       # NE (other lattice)
        (-w // 2, -h // 2): 1,     # SW
        (3 * w, 0): 7,             # isolated
    }
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in raster.items()],
        "hx long, hy long, cnt long",
    )
    got = {
        (r.hx, r.hy): (r.focal_sum, r.focal_n, r.focal_mean)
        for r in hex_smooth(df, w).collect()
    }
    offs = [(0, 0), (w, 0), (-w, 0), (w // 2, h // 2),
            (w // 2, -h // 2), (-w // 2, h // 2), (-w // 2, -h // 2)]
    for (x, y), _v in raster.items():
        nb = [raster[(x + dx, y + dy)] for dx, dy in offs
              if (x + dx, y + dy) in raster]
        want = (sum(nb), len(nb), round(sum(nb) / len(nb), 6))
        assert got[(x, y)] == want, ((x, y), got[(x, y)], want)
    assert got[(3 * w, 0)] == (7, 1, 7.0)


def test_hex_smooth_offsets_are_the_voronoi_neighbors():
    """Under the default h = √3·w the 7-offset stencil is exactly
    {self} ∪ the 6 EQUIDISTANT Voronoi neighbors of a hex center in
    the doubled lattice: (±w, 0) and (±w/2, ±h/2) all sit at distance
    ≈ w, every other lattice center is strictly farther (the (0, ±h)
    same-lattice cells the squashed h=(√3/2)w default wrongly made
    adjacent are at ≈ 1.73·w)."""
    from oshdb_spark.geo.cells import hex_height7

    for w in (20_000_000, 100_000_000, 200_000_000):
        h = hex_height7(w)
        neigh = [(w, 0), (-w, 0), (w // 2, h // 2), (w // 2, -h // 2),
                 (-w // 2, h // 2), (-w // 2, -h // 2)]
        dists = [((dx * dx + dy * dy) ** 0.5) / w for dx, dy in neigh]
        assert all(abs(d - 1.0) < 1e-3 for d in dists), (w, dists)
        # every other center of either lattice is strictly farther
        others = []
        for i in range(-2, 3):
            for j in range(-2, 3):
                for (cx, cy) in ((i * w, j * h),
                                 (i * w + w // 2, j * h + h // 2)):
                    if (cx, cy) != (0, 0) and (cx, cy) not in neigh:
                        others.append((cx * cx + cy * cy) ** 0.5 / w)
        assert min(others) > max(dists) * 1.5, (w, min(others))


def test_track_waypoints_brackets_and_interpolates(spark):
    """track_waypoints vs a python replay of the same mm-quantized
    fold: per entity exactly one row per fraction (moving tracks),
    targets are exact integers, coordinates within rounding of the
    replay; stationary tracks emit nothing."""
    import math

    from oshdb_spark.geo.trajectory import track_waypoints

    tracks = {
        1: [(0, 0), (10_000_000, 0), (20_000_000, 0), (40_000_000, 0)],
        2: [(0, 0), (0, 5_000_000), (3_000_000, 9_000_000),
            (-2_000_000, 15_000_000)],
        3: [(5, 5), (5, 5), (5, 5)],          # stationary
        4: [(0, 800_000_000), (10_000_000, 800_000_000)],  # high lat
    }
    rows = [
        (e, i, p[0], p[1])
        for e, pts in tracks.items()
        for i, p in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "entity long, ord_key long, lon7 long, lat7 long"
    )
    got = {}
    for r in track_waypoints(df).collect():
        got[(r.entity, r.k)] = (r.target_mm, r.lon7, r.lat7)

    def seg_mm(p, q):
        lad, plad = q[1] * 1e-7, p[1] * 1e-7
        lod, plod = q[0] * 1e-7, p[0] * 1e-7
        dla = math.radians(lad - plad)
        dln = math.radians(lod - plod) * math.cos(
            math.radians((plad + lad) / 2.0))
        return int(round(6371000.0
                         * math.sqrt(dla * dla + dln * dln) * 1000.0))

    for e, pts in tracks.items():
        segs = [seg_mm(pts[i - 1], pts[i]) for i in range(1, len(pts))]
        tot = sum(segs)
        if tot == 0:
            assert not any(k[0] == e for k in got)
            continue
        for k in (1, 2, 3):
            tk = tot * k // 4
            cum = 0
            for i, s in enumerate(segs):
                if cum < tk <= cum + s:
                    frac = (tk - cum) / s
                    p, q = tracks[e][i], tracks[e][i + 1]
                    wl = round(p[0] + frac * (q[0] - p[0]))
                    wb = round(p[1] + frac * (q[1] - p[1]))
                    gm, gl, gb = got[(e, k)]
                    assert gm == tk
                    assert abs(gl - wl) <= 2 and abs(gb - wb) <= 2, (
                        e, k, (gl, gb), (wl, wb))
                    break
                cum += s
            else:
                assert (e, k) not in got
    # the straight equator track: halfway point is at lon 0.1e7*2
    assert got[(1, 2)][1] == 20_000_000 and got[(1, 2)][2] == 0


def test_hex_pyramid_counts_roll_up_exactly(spark):
    """hex pyramid invariants: per-level totals equal the point count;
    every child center re-bins into exactly one parent; parent counts
    equal the sum of their children."""
    import pyspark.sql.functions as F

    import __spark_entry__ as E

    out = E.queries()["hex_pyramid"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    import collections

    by_level = collections.defaultdict(dict)
    for r in out:
        by_level[r.level][(r.hx, r.hy)] = r.n_pts
    totals = {lv: sum(m.values()) for lv, m in by_level.items()}
    assert totals[0] == totals[1] == totals[2] == 1000
    # parents strictly coarser
    assert len(by_level[0]) > len(by_level[1]) > len(by_level[2])
    # each level-0 center maps to a level-1 parent whose count covers it
    from oshdb_spark.geo.cells import hexbin_cols

    l0 = spark.createDataFrame(
        [(hx, hy, n) for (hx, hy), n in by_level[0].items()],
        "hx long, hy long, n long",
    )
    hx1, hy1 = hexbin_cols("hx", "hy", 200_000_000)
    re1 = {
        (r.hx, r.hy): r.s
        for r in l0.select(hx1, hy1, "n")
        .groupBy("hx", "hy").agg(F.sum("n").alias("s")).collect()
    }
    assert re1 == by_level[1]


def test_dtw_join_matches_python_dp(spark):
    """dtw_join vs a pure-python DTW replay; a reversed copy of a
    track is near under Hausdorff but FAR under DTW (order
    sensitivity), while a jittered same-direction copy is near."""
    import math

    from oshdb_spark.geo.trajectory import dtw_join

    base = [(i * 2_000_000, (i % 3) * 1_000_000) for i in range(12)]
    jit = [(x + 300_000, y - 200_000) for x, y in base]
    rev = list(reversed(base))
    far = [(x + 500_000_000, y) for x, y in base]
    tracks = {1: base, 2: jit, 3: rev, 4: far}
    rows = [
        (e, i, p[0], p[1])
        for e, pts in tracks.items()
        for i, p in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "entity long, ord_key long, lon7 long, lat7 long"
    )
    T = 1_000_000.0  # 1,000 km budget
    got = {
        (r.ea, r.eb): r.dtw_m for r in dtw_join(df, T).collect()
    }

    R = 6371000.0

    def mm(p, q):
        la, lb = p[1] * 1e-7, q[1] * 1e-7
        dla = math.radians(lb - la)
        dln = math.radians((q[0] - p[0]) * 1e-7) * math.cos(
            math.radians((la + lb) / 2.0))
        import numpy as np

        return int(np.rint(
            R * math.sqrt(dln * dln + dla * dla) * 1000.0))

    def dtw(A, B):
        n, m = len(A), len(B)
        D = [[0] * m for _ in range(n)]
        for i in range(n):
            for j in range(m):
                d = mm(A[i], B[j])
                if i == 0 and j == 0:
                    D[i][j] = d
                elif i == 0:
                    D[i][j] = d + D[0][j - 1]
                elif j == 0:
                    D[i][j] = d + D[i - 1][0]
                else:
                    D[i][j] = d + min(D[i - 1][j], D[i][j - 1],
                                      D[i - 1][j - 1])
        return D[n - 1][m - 1]

    import itertools

    for ea, eb in itertools.combinations(sorted(tracks), 2):
        want = dtw(tracks[ea], tracks[eb])
        if want <= T * 1000:
            assert math.isclose(
                got[(ea, eb)], want / 1000.0, abs_tol=1e-9), (ea, eb)
        else:
            assert (ea, eb) not in got, (ea, eb, want)
    assert (1, 2) in got          # jittered copy aligns
    assert (1, 3) not in got      # reversed: order-sensitive rejection
    assert (1, 4) not in got      # genuinely far


def test_dtw_lower_bounds_are_loss_free_random_differential(spark):
    """Randomized admissibility differential for the blocked join's
    codegen prefilters (endpoint + Keogh-style bbox-envelope lower
    bound): dtw_join over random clustered walks must emit EXACTLY the
    pairs the full unblocked python DP emits, at budgets chosen so
    qualifying pairs exist both inside and across clusters. A
    non-admissible bound shows up here as a missing pair."""
    import itertools
    import math

    import numpy as np

    from oshdb_spark.geo.trajectory import dtw_join

    rng = np.random.default_rng(47)
    tracks = {}
    ent = 0
    # 6 cluster sites; 4 walks per site with ±4° jitter; varying lengths
    for c in range(6):
        cx = int(rng.integers(-1_500_000_000, 1_500_000_000))
        cy = int(rng.integers(-500_000_000, 500_000_000))
        for _ in range(4):
            n = int(rng.integers(5, 12))
            x = cx + int(rng.integers(-40_000_000, 40_000_000))
            y = cy + int(rng.integers(-40_000_000, 40_000_000))
            pts = []
            for _i in range(n):
                x += int(rng.integers(-8_000_000, 8_000_000))
                y += int(rng.integers(-8_000_000, 8_000_000))
                pts.append((x, y))
            tracks[ent] = pts
            ent += 1
    rows = [
        (e, i, p[0], p[1])
        for e, pts in tracks.items()
        for i, p in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "entity long, ord_key long, lon7 long, lat7 long"
    )

    R = 6371000.0

    def mm(p, q):
        la, lb = p[1] * 1e-7, q[1] * 1e-7
        dla = math.radians(lb - la)
        dln = math.radians((q[0] - p[0]) * 1e-7) * math.cos(
            math.radians((la + lb) / 2.0))
        return int(np.rint(R * math.sqrt(dln * dln + dla * dla) * 1000.0))

    def dtw(A, B):
        n, m = len(A), len(B)
        D = [[0] * m for _ in range(n)]
        for i in range(n):
            for j in range(m):
                d = mm(A[i], B[j])
                if i == 0 and j == 0:
                    D[i][j] = d
                elif i == 0:
                    D[i][j] = d + D[0][j - 1]
                elif j == 0:
                    D[i][j] = d + D[i - 1][0]
                else:
                    D[i][j] = d + min(D[i - 1][j], D[i][j - 1],
                                      D[i - 1][j - 1])
        return D[n - 1][m - 1]

    # budgets spanning tight (in-cluster only) to generous; each must
    # reproduce the full-enumeration pair set exactly
    for T in (2_000_000.0, 20_000_000.0):
        got = {
            (r.ea, r.eb): r.dtw_m for r in dtw_join(df, T).collect()
        }
        want = {}
        for ea, eb in itertools.combinations(sorted(tracks), 2):
            c = dtw(tracks[ea], tracks[eb])
            if c <= T * 1000:
                want[(ea, eb)] = c / 1000.0
        assert set(got) == set(want), (
            T, sorted(set(want) - set(got)), sorted(set(got) - set(want)))
        for k, v in want.items():
            assert math.isclose(got[k], v, abs_tol=1e-9), (T, k)
        assert len(want) >= 3  # non-vacuous at every budget
