"""IterateByTimestampNotOsmTypeSpecificTest /
IterateByContributionNotOsmTypeSpecificTest ports (oshdb-util/src/test/
.../celliterator/*.java) over the reference's own
different-timestamps/not-osm-type-specific.osm fixture: a
type=notmultipolygon relation holding one node member — the
GeometryCollection (non-area) relation path under polygon-AOI culling.

Ported cases: testCellCoveringPolygon (the member node at (10.9, 12.6)
falls OUTSIDE the triangular AOI → no rows) and
testCellFullyInsidePolygon (world-rectangle AOI → rows present, geometry
is the member collection). testCellOutsidePolygon asserts the GRID
layer's cell-bbox skip for a specific z12 cell id — in this engine that
is the partition-pruning/3-state cull layer, golden-tested in
test_plans/test_fast_paths, so the case is not re-ported here."""

from __future__ import annotations

import os

import numpy as np
import pytest

from oshdb_spark.api.timestamps import timestamp_list
from oshdb_spark.kernels.aoi import AOI
from oshdb_spark.kernels.contribution import _emit_doc_contributions
from oshdb_spark.kernels.geometry_builder import DefaultTagInterpreter
from oshdb_spark.kernels.snapshot import _emit_doc_snapshots
from oshdb_spark.model.synth import parse_osm_xml, typed_row, unix

REF = "/root/reference/oshdb-util/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

YEARLY = timestamp_list("2000-01-01", "2018-01-01", "P1Y")
TRIANGLE = AOI(polygon=[np.array(
    [(10.8, 10.3), (12.7, 12.7), (12.7, 10.3), (10.8, 10.3)]
)])
DECIDER = DefaultTagInterpreter()


@pytest.fixture(scope="module")
def doc():
    docs = {d["doc_id"]: typed_row(d) for d in parse_osm_xml(
        f"{REF}/different-timestamps/not-osm-type-specific.osm"
    )}
    return docs["relation/80"]


def _snap(doc, aoi):
    out = []
    _emit_doc_snapshots(doc, sorted(YEARLY), aoi, None, DECIDER, True, out)
    return out


def _contrib(doc, aoi):
    out = []
    _emit_doc_contributions(
        doc, unix("2000-01-01T00:00:00Z"), unix("2018-01-01T00:00:00Z"),
        aoi, None, DECIDER, True, out,
    )
    return out


def test_snapshot_cell_covering_polygon_empty(doc):
    """testCellCoveringPolygon (:106-131): the triangle AOI excludes the
    single member node → no snapshot rows."""
    assert _snap(doc, TRIANGLE) == []


def test_snapshot_cell_fully_inside_polygon(doc):
    """testCellFullyInsidePolygon (:134-161): world-rectangle AOI → one
    row per year since the 2008 relation version, geometry present."""
    got = _snap(doc, AOI(polygon=[np.array(
        [(-180.0, -90.0), (180.0, -90.0), (180.0, 90.0), (-180.0, 90.0),
         (-180.0, -90.0)]
    )]))
    assert len(got) == 11  # 2008..2018 inclusive
    assert all(r[7] is not None for r in got)


def test_contribution_cell_covering_polygon_empty(doc):
    """contribution testCellCoveringPolygon (:67-93): triangle AOI →
    no contributions."""
    assert _contrib(doc, TRIANGLE) == []


def test_contribution_cell_fully_inside_polygon(doc):
    """contribution testCellFullyInsidePolygon (:96-123): world AOI →
    the 2008 CREATION contribution appears."""
    got = _contrib(doc, AOI(polygon=[np.array(
        [(-180.0, -90.0), (180.0, -90.0), (180.0, 90.0), (-180.0, 90.0),
         (-180.0, -90.0)]
    )]))
    assert len(got) >= 1
