"""IterateByContributionTypeNotMultipolygonTest port (oshdb-util/src/
test/.../celliterator/IterateByContributionTypeNotMultipolygonTest.java)
over the reference's own different-timestamps/type-not-multipolygon.osm
fixture — the geometry-COLLECTION-path twin of the polygon.osm relation
suite (every relation is type=notmultipolygon, so no area assembly runs),
INCLUDING the AOI cases the polygon.osm port skips: partial/complete/
disjoint polygon intersections, out-of-interval windows, node changes
outside the bbox, self-intersecting member ways, and deletions clipped
into the interval (reference line numbers cited per case)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from oshdb_spark.geo import geom as G
from oshdb_spark.kernels.aoi import AOI
from oshdb_spark.kernels.contribution import _emit_doc_contributions
from oshdb_spark.kernels.geometry_builder import DefaultTagInterpreter
from oshdb_spark.model.synth import parse_osm_xml, typed_row, unix

REF = "/root/reference/oshdb-util/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

DECIDER = DefaultTagInterpreter()
WORLD = AOI(bbox=(-180.0, -90.0, 180.0, 90.0))


@pytest.fixture(scope="module")
def tnm_docs():
    return {d["doc_id"]: typed_row(d) for d in parse_osm_xml(
        f"{REF}/different-timestamps/type-not-multipolygon.osm"
    )}


def contrib(doc, aoi=WORLD, t0="2000-01-01T00:00:00Z",
            t1="2020-01-01T00:00:00Z"):
    out = []
    _emit_doc_contributions(doc, unix(t0), unix(t1), aoi, None, DECIDER,
                            True, out)
    out.sort(key=lambda r: r[0])
    return out


C, D_, T, GC = "CREATION", "DELETION", "TAG_CHANGE", "GEOMETRY_CHANGE"

# world-bbox cases (:38-596): relation id → (rows, first changeset,
# leading contribution-type sequence), exactly the suite's assertEquals
CONTRIB_EXPECT = {
    500: (3, 300, [[C], [GC], [GC]]),       # testGeometryChange
    501: (3, 303, [[C], [D_], [C]]),        # testVisibleChange
    503: (3, 307, [[C], [T], [T]]),         # testTagChange
    504: (8, 310, [[C], [GC]]),             # testGeometryChangeOfNodeRefsInWays
    505: (3, 312, [[C], [GC]]),             # ...OfNodeCoordinatesInWay
    506: (3, 313, [[C], [GC]]),             # ...InRelationAndWay
    507: (3, 314, [[C]]),                   # testGeometryCollection
    509: (5, 316, [[C], [GC], [GC], [GC], [GC]]),  # testVisibleChangeOfNodeInWay
    510: (4, 317, [[C]]),                   # testTagChangeOfNodeInWay
    511: (3, 318, [[C]]),                   # testVisibleChangeOfWay
    512: (2, 319, [[C], [GC]]),             # testVisibleChangeOfOneWayOfOuterRing
    513: (3, 320, [[C]]),                   # testTagChangeOfWay
    514: (2, 321, [[C], [GC]]),             # testOneOfTwoPolygonDisappears
    515: (3, 323, [[C], [GC], [GC]]),       # testWaySplitUpInTwo
}


@pytest.mark.parametrize("rid", sorted(CONTRIB_EXPECT))
def test_contribution_tnm(tnm_docs, rid):
    rows, cs0, types = CONTRIB_EXPECT[rid]
    got = contrib(tnm_docs[f"relation/{rid}"])
    assert len(got) == rows
    assert got[0][4] == cs0
    for i, expected in enumerate(types):
        assert got[i][3] == sorted(expected), f"row {i}"


@pytest.mark.parametrize("rid", [502, 508])
def test_contribution_missing_members_tolerated(tnm_docs, rid):
    """testWaysNotExistent (:113) / testNodesOfWaysNotExistent (:323)."""
    contrib(tnm_docs[f"relation/{rid}"])


RECT_SMALL = AOI(polygon=[np.array(
    [(10.8, 10.3), (10.8, 22.7), (22.7, 22.7), (22.7, 10.3), (10.8, 10.3)]
)])
RECT_BIG = AOI(polygon=[np.array(
    [(10.8, 10.3), (10.8, 52.7), (52.7, 52.7), (52.7, 10.3), (10.8, 10.3)]
)])


def test_polygon_intersecting_data_partly(tnm_docs):
    """testPolygonIntersectingDataPartly (:599-624): 3 contributions."""
    assert len(contrib(tnm_docs["relation/516"], RECT_SMALL,
                       t1="2018-01-01T00:00:00Z")) == 3


def test_polygon_intersecting_data_completely(tnm_docs):
    """testPolygonIntersectingDataCompletely (:627-652)."""
    assert len(contrib(tnm_docs["relation/516"], RECT_BIG,
                       t1="2018-01-01T00:00:00Z")) == 3


def test_polygon_not_intersecting_data(tnm_docs):
    """testPolygonNotIntersectingData (:655-680)."""
    aoi = AOI(polygon=[np.array(
        [(48.0, 49.0), (48.0, 50.0), (49.0, 50.0), (49.0, 49.0), (48.0, 49.0)]
    )])
    assert contrib(tnm_docs["relation/516"], aoi,
                   t1="2018-01-01T00:00:00Z") == []


def test_node_change_outside_bbox(tnm_docs):
    """testNodeChangeOutsideBbox (:683-711): the 2009 node move outside
    the bbox yields a contribution row with an EMPTY type set; the 2011
    move changes the in-bbox geometry → GEOMETRY_CHANGE. The clipped
    geometry at row 1 has the reference's 7 points."""
    got = contrib(tnm_docs["relation/516"],
                  AOI(bbox=(10.8, 10.3, 22.7, 22.7)),
                  t1="2019-08-01T00:00:00Z")
    assert got[0][3] == [C]
    assert got[1][3] == []
    assert got[2][3] == [GC]
    g = G.from_wkb(got[1][13])  # geom_after_clipped_wkb
    def npoints(geom):
        t, payload = geom
        if t == "Point":
            return 0 if payload is None else 1
        if t in ("LineString",):
            return len(payload)
        if t == "Polygon":
            return sum(len(r) for r in payload)
        if t == "MultiPolygon":
            return sum(len(r) for rings in payload for r in rings)
        if t == "MultiLineString":
            return sum(len(arr) for arr in payload)
        if t == "MultiPoint":
            return len(payload)
        if t == "GeometryCollection":
            return sum(npoints(c) for c in payload)
        return 0
    assert npoints(g) == 7


def test_interval_after_changes_polygon(tnm_docs):
    """testPolygonIntersectingDataCompletelyTimeIntervalAfterChanges
    (:713-739) + testTimeIntervalAfterChanges (:741-758): empty."""
    assert contrib(tnm_docs["relation/517"], RECT_BIG,
                   t0="2016-01-01T00:00:00Z",
                   t1="2018-01-01T00:00:00Z") == []
    assert contrib(tnm_docs["relation/517"],
                   AOI(bbox=(10.8, 10.3, 52.7, 52.7)),
                   t0="2016-01-01T00:00:00Z",
                   t1="2018-01-01T00:00:00Z") == []


def test_bbox_outside_polygon(tnm_docs):
    """testBboxOutsidePolygon (:760-779): disjoint query bbox → empty."""
    assert contrib(tnm_docs["relation/516"],
                   AOI(bbox=(50.0, 50.0, 52.0, 52.0)),
                   t1="2018-01-01T00:00:00Z") == []


def test_self_intersecting_polygon_clipped(tnm_docs):
    """testSelfIntersectingPolygonClipped (:781-809): one contribution,
    geometry is a GeometryCollection (the non-area relation path)."""
    aoi = AOI(polygon=[np.array(
        [(7.31, 1.0), (7.335, 1.0), (7.335, 2.0), (7.31, 2.0), (7.31, 1.0)]
    )])
    got = contrib(tnm_docs["relation/520"], aoi,
                  t1="2018-01-01T00:00:00Z")
    assert len(got) == 1
    assert G.from_wkb(got[0][11])[0] == "GeometryCollection"


def test_members_disappear(tnm_docs):
    """testMembersDisappear (:811-833): 4 rows, first is CREATION."""
    got = contrib(tnm_docs["relation/521"],
                  AOI(bbox=(10.8, 10.3, 22.7, 22.7)),
                  t1="2020-01-01T00:00:00Z")
    assert len(got) == 4
    assert got[0][3] == [C]


def test_members_disappear_and_previous_is_null(tnm_docs):
    """testMembersDisappearAndPreviousIsNull (:835-853): last version has
    no members, previous invisible, window covers only the last → empty."""
    assert contrib(tnm_docs["relation/522"],
                   AOI(bbox=(10.8, 10.3, 22.7, 22.7)),
                   t0="2012-01-01T00:00:00Z",
                   t1="2020-01-01T00:00:00Z") == []


def test_interval_after_deletion_clipped(tnm_docs):
    """testTimeIntervalAfterDeletionInCurrentVersionClipped (:855-888):
    exactly the DELETION lands in the window."""
    got = contrib(tnm_docs["relation/523"], RECT_SMALL,
                  t0="2016-01-01T00:00:00Z",
                  t1="2020-01-01T00:00:00Z")
    assert len(got) == 1
    assert got[0][3] == [D_]
