"""Geometry-builder sweep over the public osmcode/osm-testdata corpus.

The reference runs its OSHDBGeometryBuilderTestOsmTestData{1xx,3xx,7xx}
suites over the same `all.osm` (960 nodes / 259 ways / 96 relations —
SURVEY.md §5). This sweep asserts the corpus-wide contracts those suites
rely on:

- every entity builds WITHOUT raising, through the full ladder incl.
  multipolygon assembly (grid 7xx are the multipolygon torture cases)
- geometry-type distribution: nodes→Point; closed area-tagged ways→
  Polygon; open ways→LineString; multipolygon relations→(Multi)Polygon or
  collection fallback
- every produced geometry round-trips through our WKB codec bit-exactly
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from oshdb_spark.geo import geom as G
from oshdb_spark.kernels.geometry_builder import DEFAULT_INTERPRETER, build_geometry
from oshdb_spark.model.synth import parse_osm_xml, typed_row, unix

ALL_OSM = "/root/reference/oshdb-util/src/test/resources/osm-testdata/all.osm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ALL_OSM), reason="reference corpus not available"
)

T = unix("2020-01-01T00:00:00Z")


def _build_all():
    docs = parse_osm_xml(ALL_OSM)
    out = {}
    for d in docs:
        row = typed_row(d)
        v = row["versions"][-1]  # corpus entities have a single version
        if isinstance(v.get("ts"), str):
            v = dict(v, ts=unix(v["ts"]))
        members_by_key = {
            (m["entity_type"], m["id"]): m for m in row["members"]
        }
        for m in members_by_key.values():
            for mv in m["versions"]:
                if isinstance(mv.get("ts"), str):
                    mv["ts"] = unix(mv["ts"])
        g = build_geometry(
            row["entity_type"], v, T, members_by_key, DEFAULT_INTERPRETER
        )
        out[(row["entity_type"], row["id"])] = g
    return out


def test_corpus_builds_everything():
    geoms = _build_all()
    by_type = Counter(k[0] for k in geoms)
    assert by_type["node"] == 960
    assert by_type["way"] == 259
    assert by_type["relation"] == 96


def test_corpus_type_ladder():
    geoms = _build_all()
    node_types = Counter(G.geom_type(g) for (t, _), g in geoms.items()
                         if t == "node" and g is not None)
    assert set(node_types) == {"Point"}
    way_types = Counter(G.geom_type(g) for (t, _), g in geoms.items()
                        if t == "way" and g is not None)
    assert way_types["LineString"] > 100
    assert way_types["Polygon"] > 10
    rel_types = Counter(G.geom_type(g) for (t, _), g in geoms.items()
                        if t == "relation" and g is not None)
    # multipolygon relations resolve to polygonal output or the documented
    # geometry-collection fallback
    assert rel_types["Polygon"] + rel_types["MultiPolygon"] > 50
    assert set(rel_types) <= {
        "Polygon", "MultiPolygon", "GeometryCollection", "LineString", "Point",
        "MultiLineString", "MultiPoint",
    }


def test_corpus_wkb_roundtrip():
    geoms = _build_all()
    n = 0
    for g in geoms.values():
        if g is None or G.is_empty(g):
            continue
        buf = G.to_wkb(g)
        back = G.from_wkb(buf)
        assert G.to_wkb(back) == buf
        n += 1
    assert n > 1000
