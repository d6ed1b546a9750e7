"""Osmosis .poly reader — port of the reference ETL's TestPolyFileReader
(oshdb-tool/etl/src/test/.../TestPolyFileReader.java) over the reference's
own fixture files, plus engine-side AOI integration and format edge cases.

The reference returns GeoJSON ring arrays; the engine returns its closed
float64 ring convention — point counts and structure assertions carry over
one to one (reference rings are closed too: JTS LinearRing)."""

import os

import numpy as np
import pytest

from oshdb_spark.sources import poly as P

REF_POLY = "/root/reference/oshdb-tool/etl/src/test/resources/poly"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_POLY), reason="reference fixtures not available"
)


class TestPolyFileReaderGolden:
    def test_australia(self):
        kind, rings = P.read_poly(f"{REF_POLY}/australia.poly")
        assert kind == "Polygon"
        assert len(rings) == 1
        assert rings[0].shape[0] == 23
        # check if it actually is Australia:
        assert rings[0][0, 0] > 100  # quite a bit to the East
        assert rings[0][0, 1] < 0  # southern hemisphere

    def test_australia_open_ring_closed(self):
        kind, rings = P.read_poly(f"{REF_POLY}/australia-open.poly")
        assert kind == "Polygon"
        assert len(rings) == 1
        assert rings[0].shape[0] == 23
        assert np.array_equal(rings[0][0], rings[0][-1])

    def test_south_africa_hole(self):
        kind, rings = P.read_poly(f"{REF_POLY}/south-africa.poly")
        assert kind == "Polygon"
        assert len(rings) == 2  # outer + Lesotho hole
        assert rings[0].shape[0] + rings[1].shape[0] == 639

    def test_russia_multipolygon(self):
        kind, pieces = P.read_poly(f"{REF_POLY}/russia.poly")
        assert kind == "MultiPolygon"
        assert len(pieces) == 3
        assert all(len(rings) == 1 for rings in pieces)
        assert sum(rings[0].shape[0] for rings in pieces) == 1111


class TestPolyFormat:
    def test_missing_header(self):
        with pytest.raises(P.PolyParseError):
            P.parse_poly("")

    def test_bad_coordinate_line(self):
        with pytest.raises(P.PolyParseError):
            P.parse_poly("name\n1\n 1.0 2.0 3.0\nEND\nEND\n")

    def test_hole_attaches_to_intersecting_outer_only(self):
        # two disjoint outers; the hole overlaps only the first
        txt = (
            "name\n"
            "1\n 0 0\n 10 0\n 10 10\n 0 10\nEND\n"
            "2\n 100 0\n 110 0\n 110 10\n 100 10\nEND\n"
            "!h\n 2 2\n 4 2\n 4 4\n 2 4\nEND\n"
            "END\n"
        )
        kind, pieces = P.parse_poly(txt)
        assert kind == "MultiPolygon"
        assert len(pieces[0]) == 2  # outer + hole
        assert len(pieces[1]) == 1

    def test_hole_only_attaches_to_earlier_outers(self):
        # PolyFileReader.java:79-86 — a hole read before its outer is lost
        txt = (
            "name\n"
            "!h\n 2 2\n 4 2\n 4 4\n 2 4\nEND\n"
            "1\n 0 0\n 10 0\n 10 10\n 0 10\nEND\n"
            "END\n"
        )
        kind, rings = P.parse_poly(txt)
        assert kind == "Polygon"
        assert len(rings) == 1


class TestPolyAoi:
    def test_aoi_from_poly_clips(self):
        aoi = P.aoi_from_poly(f"{REF_POLY}/australia.poly")
        assert aoi.bbox is not None
        # Alice Springs is inside, Wellington NZ is not
        from oshdb_spark.geo import clip as C

        inside = C.points_in_polygon(
            np.array([133.87, 174.78]), np.array([-23.70, -41.29]), aoi.polygon
        )
        assert bool(inside[0]) and not bool(inside[1])

    def test_multipolygon_aoi_pieces(self):
        aoi = P.aoi_from_poly(f"{REF_POLY}/russia.poly")
        assert len(aoi.pieces) == 3
