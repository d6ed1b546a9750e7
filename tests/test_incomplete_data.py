"""Incomplete-extract robustness — ports of the reference's
OSHDBGeometryBuilderTestWayIncompleteDataTest /
...TestPolygonIncompleteDataTest
(oshdb-util/src/test/.../geometry/incomplete/*.java), run over the
reference's own incomplete-osm/*.osm fixtures.

Semantics under test: member references to entities absent from the
extract are silently skipped — a way keeps its available node chain
(ref OSHDBGeometryBuilder.java:87-93 nonNull filter), a multipolygon
assembles from its available way members, and nothing ever throws.
Geometry-type adaptation as in the relation goldens: a single-outer
multipolygon is returned as Polygon here vs JTS MultiPolygon — ring
count, vertex sets, and areas are the exact parity targets.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from oshdb_spark.geo import geom as G
from oshdb_spark.kernels.geometry_builder import build_geometry
from oshdb_spark.model.synth import parse_osm_xml, typed_row, unix

REF = "/root/reference/oshdb-util/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

T2014 = unix("2014-01-01T00:00:00Z")


class _XmlDecider:
    """≙ OSMXmlReaderTagInterpreter: way area iff closed ∧ area=yes;
    relation area iff type=multipolygon; '' / 'outer' → outer role."""

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


def _entity_geom(path, key):
    docs = {d["doc_id"]: typed_row(d) for d in parse_osm_xml(f"{REF}/{path}")}
    from oshdb_spark.kernels.snapshot import _doc_structs, _normalize_ts
    from oshdb_spark.kernels.temporal import sort_versions

    row = docs[key]
    versions, members_by_key, _, _ = _doc_structs(row)
    versions = _normalize_ts(versions)
    for m in members_by_key.values():
        _normalize_ts(m["versions"])
    v = sort_versions(versions)[-1]
    return build_geometry(key.split("/")[0], v, T2014, members_by_key, DECIDER)


def _ring_vertex_set(ring):
    return {(round(float(x), 7), round(float(y), 7)) for x, y in np.asarray(ring)[:-1]}


def _shoelace(ring):
    r = np.asarray(ring, dtype=float)
    return 0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


# --- OSHDBGeometryBuilderTestWayIncompleteDataTest ------------------------

def test_way_one_node_not_existent():
    """testOneOfNodesNotExistent (:31-46): 4 refs, node 4 missing →
    LineString over the 3 available nodes."""
    kind, coords = _entity_geom("incomplete-osm/way.osm", "way/100")
    assert kind == "LineString"
    assert len(coords) >= 3


def test_way_area_yes_unclosed_with_all_nodes():
    """testWayAreaYes (:48-63): area=yes but the ref chain isn't closed →
    stays a LineString (ref falls back at :96-98)."""
    kind, coords = _entity_geom("incomplete-osm/way.osm", "way/101")
    assert kind == "LineString"
    assert len(coords) >= 3


def test_way_all_nodes_not_existent():
    """testAllNodesNotExistent (:65-79): both refs missing → empty
    geometry, no exception (0 coordinates; exact empty TYPE is
    JTS-internal, emptiness is the contract)."""
    g = _entity_geom("incomplete-osm/way.osm", "way/102")
    assert G.is_empty(g)


# --- OSHDBGeometryBuilderTestPolygonIncompleteDataTest --------------------

def test_polygon_some_nodes_of_way_not_existent():
    """testSomeNodesOfWayNotExistent (:33-51): two-way outer ring, 2 refs
    of the second way missing → single 7-coordinate ring matching the
    reference's expected MULTIPOLYGON vertex-for-vertex and by area."""
    kind, rings = _entity_geom("incomplete-osm/polygon.osm", "relation/500")
    assert kind == "Polygon"
    assert len(rings) == 1  # getNumInteriorRing() == 0
    ring = rings[0]
    assert len(ring) == 7
    expected = [(7.34, 1.01), (7.31, 1.01), (7.33, 1.04), (7.32, 1.04),
                (7.32, 1.05), (7.34, 1.05), (7.34, 1.01)]
    assert _ring_vertex_set(ring) == _ring_vertex_set(expected)
    assert abs(_shoelace(ring) - _shoelace(expected)) < 1e-6


def test_polygon_way_not_existent():
    """testWayNotExistent (:53-68): one of two outer ways absent from the
    extract → the remaining closed way alone forms the polygon."""
    kind, rings = _entity_geom("incomplete-osm/polygon.osm", "relation/501")
    assert kind == "Polygon"
    assert len(rings) == 1
    ring = rings[0]
    assert len(ring) == 6
    expected = [(7.31, 1.04), (7.33, 1.05), (7.33, 1.04), (7.32, 1.04),
                (7.31, 1.01), (7.31, 1.04)]
    assert _ring_vertex_set(ring) == _ring_vertex_set(expected)
    assert abs(_shoelace(ring) - _shoelace(expected)) < 1e-6


def test_polygon_all_nodes_of_way_not_existent():
    """testAllNodesOfWayNotExistent (:70-81): the single member way's
    nodes are all absent → must not throw (falls back to the
    geometry-collection path)."""
    g = _entity_geom("incomplete-osm/polygon.osm", "relation/502")
    assert g is not None
