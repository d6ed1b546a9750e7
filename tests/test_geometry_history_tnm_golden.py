"""OSHDBGeometryBuilderTestOsmHistoryTestDataRelationNotMultipolygonTest
port (oshdb-util/src/test/.../osmhistorytestdata/...NotMultipolygonTest
.java) over different-timestamps/type-not-multipolygon.osm: the same
relation histories as the multipolygon suite, but with non-area types —
every version must build the member GEOMETRY COLLECTION (never a
polygonal assembly), with the reference's exact component counts and
per-component kinds, incl. role-bearing restriction relations."""

from __future__ import annotations

import os

import pytest

from oshdb_spark.geo import geom as G
from oshdb_spark.kernels.geometry_builder import DefaultTagInterpreter, build_geometry
from oshdb_spark.model.synth import parse_osm_xml, typed_row, unix

REF = "/root/reference/oshdb-util/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

class _XmlDecider:
    """≙ OSMXmlReaderTagInterpreter over this fixture: way area iff
    closed ∧ area=yes (none here, so members stay LineStrings); relation
    area iff type=multipolygon (never, the point of this suite)."""

    def is_area(self, entity_type, tags, refs):
        if entity_type == "way":
            return (
                len(refs) >= 4
                and refs[0]["ref"] == refs[-1]["ref"]
                and tags.get("area") == "yes"
            )
        if entity_type == "relation":
            return tags.get("type") == "multipolygon"
        return False

    def is_outer_role(self, role):
        return role in ("outer", "")

    def is_inner_role(self, role):
        return role == "inner"


DECIDER = _XmlDecider()
_DOCS: dict = {}

L, P = "LineString", "Point"


def _doc(rid):
    if not _DOCS:
        _DOCS.update({
            d["doc_id"]: typed_row(d) for d in parse_osm_xml(
                f"{REF}/different-timestamps/type-not-multipolygon.osm"
            )
        })
    from oshdb_spark.kernels.snapshot import _doc_structs, _normalize_ts
    from oshdb_spark.kernels.temporal import sort_versions

    row = _DOCS[f"relation/{rid}"]
    versions, members_by_key, _, _ = _doc_structs(row)
    versions = _normalize_ts(versions)
    for m in members_by_key.values():
        _normalize_ts(m["versions"])
    return sort_versions(versions), members_by_key


def _geom(rid, vi, at=None):
    versions, members = _doc(rid)
    v = versions[vi]
    t = unix(at) if at else v["ts"]
    return build_geometry("relation", v, t, members, DECIDER)


# (rid, version idx, at, expected component kinds — None entries mean
# "present, kind unasserted")
CASES = [
    (500, 0, None, None),                 # testGeometryChange: GC (:34-46)
    (500, 1, None, None),                 # (:48-58)
    (500, 2, None, [None, None, None]),   # 3 components (:60-65)
    (501, 0, None, [L, L]),               # testVisibleChange (:74-89)
    (501, 1, None, "empty"),              # (:91-95)
    (501, 2, None, [L, L]),               # (:102-112)
    (502, 0, None, "empty"),              # testWaysNotExistent (:119-128)
    (503, 0, None, [L]),                  # testTagChange (:137-150)
    (503, 1, None, [L]),
    (503, 2, None, [L]),
    (504, 0, None, [L, L]),               # ...NodeRefsInWays (:183-197)
    (504, 1, None, [L, L]),
    (504, 0, "2012-02-01T00:00:00Z", [L, L]),
    (505, 0, None, [L]),                  # ...NodeCoordinatesInWay
    (505, 0, "2012-02-01T00:00:00Z", [L]),
    (506, 0, None, [P, P, L]),            # ...InRelationAndWay (:266-293)
    (506, 0, "2012-02-01T00:00:00Z", [P, P, L]),
    (507, 0, None, [None] * 6),           # testGeometryCollection (:302-310)
    (509, 0, None, [L]),                  # testVisibleChangeOfNodeInWay
    (509, 0, "2014-02-01T00:00:00Z", [L]),
    (510, 0, None, [L]),                  # testTagChangeOfNodeInWay
    (510, 0, "2014-02-01T00:00:00Z", [L]),
    (511, 0, None, [L]),                  # testVisibleChangeOfWay
    (511, 0, "2017-02-01T00:00:00Z", "empty"),
    (512, 0, None, [L, L]),               # ...OneWayOfOuterRing (:433-457)
    (512, 0, "2018-02-01T00:00:00Z", [None, None]),
    (513, 0, None, [L]),                  # testTagChangeOfWay
    (513, 0, "2009-02-01T00:00:00Z", [L]),
    (513, 0, "2012-02-01T00:00:00Z", [L]),
    (514, 0, None, [L, L]),               # testOneOfTwoPolygonDisappears
    (514, 1, None, [L]),
    (515, 0, None, [L]),                  # testWaySplitUpInTwo (:545-569)
    (515, 1, None, [L, L]),
    (518, 0, None, [L, P, L]),            # testRestrictionRoles (:578-588)
    (519, 0, None, [L, L]),               # testRolesArePartAndOutline
    (519, 1, None, [L, L, L]),            # (:597-621)
]


@pytest.mark.parametrize("rid,vi,at,exp", CASES)
def test_tnm_geometry_history(rid, vi, at, exp):
    g = _geom(rid, vi, at)
    if exp == "empty":
        assert G.is_empty(g)
        return
    assert g[0] == "GeometryCollection"
    if exp is not None:
        # numGeometries counts components as built — invisible members
        # contribute EMPTY geometries (the reference's 512@2018 case
        # asserts `N(0) instanceof LineString || N(1) ...` for exactly
        # this reason); kind asserts apply to the non-empty ones
        assert len(g[1]) == len(exp)
        comps = [c for c in g[1] if not G.is_empty(c)]
        for comp, kind in zip(comps, exp):
            if kind is not None:
                assert comp[0] == kind


def test_nodes_of_ways_not_existent_no_throw():
    """testNodesOfWaysNotExistent (:319-328): GC, no exception."""
    g = _geom(508, 0)
    assert g[0] == "GeometryCollection"
