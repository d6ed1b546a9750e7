"""Differential parity: vectorized node fast path vs general per-doc path.

The same queries run twice — once through the numpy fast path, once forced
onto the general path by a no-op ('py', ...) filter (python filters disable
fast arrays) — and must produce identical rows. Covers the tricky state
machines: invisible-first, consecutive-invisible, same-changeset squash
runs, tag/geometry change mixes, AOI boundary exit/re-entry.
"""

from __future__ import annotations

import pandas as pd
import pytest

from oshdb_spark.kernels.contribution import contributions
from oshdb_spark.kernels.snapshot import snapshots
from oshdb_spark.model.synth import docs_df, make_doc, make_version

Y = 31_536_000  # ~1 year in seconds
T0 = 1_199_145_600  # 2008-01-01


def _ts(i):
    return T0 + i * Y


def _tricky_docs(spark):
    docs = [
        # invisible first version, then created
        make_doc("node", 1, [
            make_version(1, _ts(0), 100, uid=1, visible=False),
            make_version(2, _ts(1), 101, uid=2, tags={"a": "1"}, lon=10_0000000, lat=10_0000000),
            make_version(3, _ts(2), 102, uid=3, tags={"a": "2"}, lon=10_0000000, lat=10_0000000),
        ]),
        # consecutive invisible (only first emits DELETION)
        make_doc("node", 2, [
            make_version(1, _ts(0), 200, uid=1, tags={"a": "1"}, lon=20_0000000, lat=5_0000000),
            make_version(2, _ts(1), 201, uid=1, visible=False),
            make_version(3, _ts(2), 202, uid=1, visible=False),
            make_version(4, _ts(3), 203, uid=2, tags={"a": "1"}, lon=20_0000000, lat=5_0000000),
        ]),
        # same-changeset squash run (v2,v3 same changeset → keep last)
        make_doc("node", 3, [
            make_version(1, _ts(0), 300, uid=1, tags={"a": "1"}, lon=-30_0000000, lat=-10_0000000),
            make_version(2, _ts(1), 301, uid=1, tags={"a": "2"}, lon=-30_0000000, lat=-10_0000000),
            make_version(3, _ts(1) + 1000, 301, uid=1, tags={"a": "3"}, lon=-31_0000000, lat=-10_0000000),
            make_version(4, _ts(2), 302, uid=2, tags={"a": "3"}, lon=-31_0000000, lat=-10_0000000),
        ]),
        # AOI boundary: moves out of bbox then back in
        make_doc("node", 4, [
            make_version(1, _ts(0), 400, uid=1, tags={"b": "x"}, lon=40_0000000, lat=40_0000000),
            make_version(2, _ts(1), 401, uid=1, tags={"b": "x"}, lon=80_0000000, lat=40_0000000),
            make_version(3, _ts(2), 402, uid=1, tags={"b": "x"}, lon=41_0000000, lat=41_0000000),
        ]),
        # tag-filter transition: matches, then stops matching (filter-DELETION)
        make_doc("node", 5, [
            make_version(1, _ts(0), 500, uid=1, tags={"k": "yes"}, lon=0, lat=0),
            make_version(2, _ts(1), 501, uid=1, tags={"k": "no"}, lon=0, lat=0),
            make_version(3, _ts(2), 502, uid=1, tags={"k": "yes"}, lon=1_0000000, lat=0),
        ]),
    ]
    return docs_df(spark, docs)


def _canon(df):
    pdf = df.toPandas()
    for c in ("tags", "tags_before", "tags_after", "contrib_types"):
        if c in pdf.columns:
            pdf[c] = pdf[c].map(
                lambda v: None if v is None else repr(sorted(v.items()) if isinstance(v, dict) else list(v))
            )
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: None if v is None else repr(v))
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True).fillna("~")


NOOP = ("py", lambda v, et, i: True)
SNAP_TS = [_ts(0) - 1, _ts(0), _ts(1), _ts(1) + 500, _ts(2), _ts(3), _ts(4)]


@pytest.mark.parametrize(
    "aoi_kw",
    [
        {},
        {"bbox": (-35.0, -15.0, 45.0, 45.0)},
        {"polygon": [[(-35.0, -15.0), (45.0, -15.0), (45.0, 45.0), (-35.0, 45.0), (-35.0, -15.0)]]},
    ],
    ids=["world", "bbox", "polygon"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "a")], [("tag_eq", "k", "yes")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_snapshot_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_docs(spark)
    fast = snapshots(docs, SNAP_TS, filter_spec=flt, **aoi_kw)
    slow = snapshots(docs, SNAP_TS, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    a, b = _canon(fast), _canon(slow)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 or flt == [("tag_eq", "k", "yes")] and aoi_kw


@pytest.mark.parametrize(
    "aoi_kw",
    [
        {},
        {"bbox": (-35.0, -15.0, 45.0, 45.0)},
    ],
    ids=["world", "bbox"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "a")], [("tag_eq", "k", "yes")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_contribution_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_docs(spark)
    interval = (_ts(0), _ts(3) + 1)
    fast = contributions(docs, interval, filter_spec=flt, **aoi_kw)
    slow = contributions(docs, interval, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    a, b = _canon(fast), _canon(slow)
    pd.testing.assert_frame_equal(a, b)


def test_contribution_fast_vs_slow_history(spark):
    """Same differential over the events-derived histories (sf0.001)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from oshdb_spark.model.history import CONTRIB_INTERVAL, docs_from_events

    docs = docs_from_events(ev)
    fast = contributions(docs, CONTRIB_INTERVAL)
    slow = contributions(docs, CONTRIB_INTERVAL, filter_spec=[NOOP])
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


# ---------------------------------------------------------------------------
# WAY fast path (vectorized member as-of joins) vs general path
# ---------------------------------------------------------------------------

def _mem(id_, versions):
    return {"entity_type": "node", "id": id_, "versions": versions}


def _tricky_way_docs(spark):
    docs = [
        # open way, nodes move independently; one node deleted mid-history
        make_doc(
            "way", 1,
            [
                make_version(1, _ts(0), 10, uid=1, tags={"highway": "path"},
                             refs=[{"type": "node", "ref": 101, "role": ""},
                                   {"type": "node", "ref": 102, "role": ""},
                                   {"type": "node", "ref": 103, "role": ""}]),
                make_version(2, _ts(2), 11, uid=2, tags={"highway": "track"},
                             refs=[{"type": "node", "ref": 101, "role": ""},
                                   {"type": "node", "ref": 103, "role": ""}]),
            ],
            members=[
                _mem(101, [make_version(1, _ts(0), 10, lon=10_0000000, lat=10_0000000),
                           make_version(2, _ts(1), 12, lon=11_0000000, lat=10_0000000)]),
                _mem(102, [make_version(1, _ts(0), 10, lon=12_0000000, lat=10_0000000),
                           make_version(2, _ts(1) + 50, 13, visible=False)]),
                _mem(103, [make_version(1, _ts(0), 10, lon=13_0000000, lat=11_0000000)]),
            ],
        ),
        # closed ring with area tag → Polygon; area tag disappears later
        make_doc(
            "way", 2,
            [
                make_version(1, _ts(0), 20, uid=1, tags={"building": "yes"},
                             refs=[{"type": "node", "ref": 201, "role": ""},
                                   {"type": "node", "ref": 202, "role": ""},
                                   {"type": "node", "ref": 203, "role": ""},
                                   {"type": "node", "ref": 201, "role": ""}]),
                make_version(2, _ts(2), 21, uid=1, tags={"highway": "path"},
                             refs=[{"type": "node", "ref": 201, "role": ""},
                                   {"type": "node", "ref": 202, "role": ""},
                                   {"type": "node", "ref": 203, "role": ""},
                                   {"type": "node", "ref": 201, "role": ""}]),
            ],
            members=[
                _mem(201, [make_version(1, _ts(0), 20, lon=0, lat=0)]),
                _mem(202, [make_version(1, _ts(0), 20, lon=1_0000000, lat=0)]),
                _mem(203, [make_version(1, _ts(0), 20, lon=1_0000000, lat=1_0000000),
                           make_version(2, _ts(3), 22, lon=2_0000000, lat=2_0000000)]),
            ],
        ),
        # way deleted then restored; missing member (204 has no history);
        # node ids 201/202 REUSED from doc way/2 (slot mapping is doc-scoped)
        make_doc(
            "way", 3,
            [
                make_version(1, _ts(0), 30, uid=1, tags={"a": "1"},
                             refs=[{"type": "node", "ref": 201, "role": ""},
                                   {"type": "node", "ref": 204, "role": ""},
                                   {"type": "node", "ref": 202, "role": ""}]),
                make_version(2, _ts(1), 31, uid=1, visible=False),
                make_version(3, _ts(2), 32, uid=2, tags={"a": "2"},
                             refs=[{"type": "node", "ref": 202, "role": ""},
                                   {"type": "node", "ref": 201, "role": ""}]),
            ],
            members=[
                _mem(201, [make_version(1, _ts(0), 30, lon=-10_0000000, lat=-10_0000000)]),
                _mem(202, [make_version(1, _ts(0), 30, lon=-12_0000000, lat=-10_0000000),
                           make_version(2, _ts(1) + 100, 33, lon=-12_0000000, lat=-12_0000000)]),
            ],
        ),
        # zero-ref version (skipped), single surviving node → Point geometry
        make_doc(
            "way", 4,
            [
                make_version(1, _ts(0), 40, uid=1, tags={"z": "1"}, refs=[]),
                make_version(2, _ts(1), 41, uid=1, tags={"z": "1"},
                             refs=[{"type": "node", "ref": 401, "role": ""},
                                   {"type": "node", "ref": 402, "role": ""}]),
            ],
            members=[
                _mem(401, [make_version(1, _ts(0), 40, lon=50_0000000, lat=50_0000000)]),
                _mem(402, [make_version(1, _ts(2), 42, lon=51_0000000, lat=50_0000000)]),
            ],
        ),
        # area=no override on a closed ring → stays a LineString
        make_doc(
            "way", 5,
            [
                make_version(1, _ts(0), 50, uid=1,
                             tags={"landuse": "farm", "area": "no"},
                             refs=[{"type": "node", "ref": 501, "role": ""},
                                   {"type": "node", "ref": 502, "role": ""},
                                   {"type": "node", "ref": 503, "role": ""},
                                   {"type": "node", "ref": 501, "role": ""}]),
            ],
            members=[
                _mem(501, [make_version(1, _ts(0), 50, lon=30_0000000, lat=30_0000000)]),
                _mem(502, [make_version(1, _ts(0), 50, lon=31_0000000, lat=30_0000000)]),
                _mem(503, [make_version(1, _ts(0), 50, lon=31_0000000, lat=31_0000000)]),
            ],
        ),
    ]
    return docs_df(spark, docs)


# polygon AOIs for the way fast path's kernel-side 3-state routing:
# _BIG_QUAD contains every tricky way fully (all docs stay vectorized);
# _SLIT_QUAD is the same cover with a thin notch descending to the origin
# (docs near the origin become BOUNDARY → demote to the general path and
# get exactly clipped; off-lattice vertices avoid degeneracies)
_BIG_QUAD = [[(-62.0000013, -62.0000021), (62.0000017, -62.0000011),
              (62.0000019, 62.0000023), (-62.0000015, 62.0000027),
              (-62.0000013, -62.0000021)]]
_SLIT_QUAD = [[(-62.0000013, -62.0000021), (62.0000017, -62.0000011),
               (62.0000019, 62.0000023), (0.4000001, 62.0000027),
               (0.5000003, 0.5000001), (-0.6000007, 62.0000025),
               (-62.0000015, 62.0000027), (-62.0000013, -62.0000021)]]


@pytest.mark.parametrize(
    "aoi_kw",
    [
        {},
        {"bbox": (-60.0, -60.0, 60.0, 60.0)},  # all tricky ways fully inside
        {"bbox": (-11.0, -11.0, 20.0, 20.0)},  # some ways cross the border
        {"polygon": _BIG_QUAD},  # polygon AOI, all fully inside → vec path
        {"polygon": _SLIT_QUAD},  # polygon AOI with boundary demotion
    ],
    ids=["world", "inside", "boundary", "poly_inside", "poly_slit"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "highway")], [("tag_eq", "a", "2")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_way_snapshot_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_way_docs(spark)
    fast = snapshots(docs, SNAP_TS, filter_spec=flt, **aoi_kw)
    slow = snapshots(docs, SNAP_TS, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


def test_way_polygon_routing(spark):
    """Proof the polygon-AOI way fast path actually routes: under a
    covering polygon every way doc stays vectorized; under the slit
    polygon the near-origin doc demotes while the rest stay fast."""
    import numpy as np

    from oshdb_spark.kernels.aoi import AOI
    from oshdb_spark.kernels.snapshot import _route_way_fast, prepared_docs

    docs = _tricky_way_docs(spark)
    aoi = AOI(polygon=_BIG_QUAD)
    pdf = prepared_docs(docs, None, aoi, fast_arrays=True, fast_ways=True).toPandas()
    way_raw = (pdf["fast_kind"] == "way").to_numpy()
    assert way_raw.sum() == 5  # all way docs JVM-eligible
    vec, dem = _route_way_fast(pdf, way_raw, aoi)
    assert vec.sum() == 5 and dem.sum() == 0

    aoi2 = AOI(polygon=_SLIT_QUAD)
    pdf2 = prepared_docs(docs, None, aoi2, fast_arrays=True, fast_ways=True).toPandas()
    way_raw2 = (pdf2["fast_kind"] == "way").to_numpy()
    vec2, dem2 = _route_way_fast(pdf2, way_raw2, aoi2)
    assert vec2.sum() >= 3  # far-from-slit docs stay vectorized
    assert dem2.sum() >= 1  # the near-origin doc demotes (boundary)
    # demoted docs kept their spans (they re-enter the general path)
    assert all(
        s is not None and len(s) > 0
        for s in pdf2.loc[np.nonzero(dem2)[0], "spans"]
    )


@pytest.mark.parametrize(
    "aoi_kw",
    [
        {},
        {"bbox": (-60.0, -60.0, 60.0, 60.0)},
        {"polygon": _BIG_QUAD},
        {"polygon": _SLIT_QUAD},
    ],
    ids=["world", "inside", "poly_inside", "poly_slit"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "highway")], [("tag_eq", "a", "2")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_way_contribution_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_way_docs(spark)
    interval = (_ts(0), _ts(3) + 1)
    fast = contributions(docs, interval, filter_spec=flt, **aoi_kw)
    slow = contributions(docs, interval, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


@pytest.mark.parametrize(
    "interval",
    [(0, 2**40), (_ts(1), _ts(2)), (_ts(1) + 1, _ts(3))],
    ids=["all", "mid", "offset"],
)
def test_way_contribution_fast_vs_slow_intervals(spark, interval):
    """Interval boundaries: skipOutput prev-carry, abort-at-end."""
    docs = _tricky_way_docs(spark)
    fast = contributions(docs, interval)
    slow = contributions(docs, interval, filter_spec=[NOOP])
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


def test_way_contribution_fast_vs_slow_reference_fixture(spark):
    import os

    from oshdb_spark.model.synth import parse_osm_xml

    ref = "/root/reference/oshdb-util/src/test/resources/different-timestamps/way.osm"
    if not os.path.isfile(ref):
        pytest.skip("reference fixtures not available")
    from oshdb_spark.model.synth import unix

    docs = docs_df(spark, parse_osm_xml(ref))
    interval = (unix("2000-01-01T00:00:00Z"), unix("2018-01-01T00:00:00Z"))
    fast = contributions(docs, interval)
    slow = contributions(docs, interval, filter_spec=[NOOP])
    a = _canon(fast)
    pd.testing.assert_frame_equal(a, _canon(slow))
    assert len(a) > 10


def test_way_snapshot_fast_vs_slow_reference_fixture(spark):
    """The reference's own way.osm fixture docs through both Spark paths."""
    import os

    from oshdb_spark.model.synth import parse_osm_xml

    ref = "/root/reference/oshdb-util/src/test/resources/different-timestamps/way.osm"
    if not os.path.isfile(ref):
        pytest.skip("reference fixtures not available")
    from oshdb_spark.api.timestamps import timestamp_list

    docs = docs_df(spark, parse_osm_xml(ref))
    ts = timestamp_list("2000-01-01", "2018-01-01", "P1Y")
    fast = snapshots(docs, ts)
    slow = snapshots(docs, ts, filter_spec=[NOOP])
    a = _canon(fast)
    pd.testing.assert_frame_equal(a, _canon(slow))
    assert len(a) > 50


# ---------------------------------------------------------------------------
# RELATION fast path (2-level member recursion) vs general path
# ---------------------------------------------------------------------------

def _wmem(id_, versions):
    return {"entity_type": "way", "id": id_, "versions": versions}


def _tricky_rel_docs(spark):
    """Relation docs exercising: ref-list changes, invisible middle
    versions, missing members, non-embedded relation-type refs, member
    nodes moving/deleted under a member way, a relation-member doc
    (ineligible -> general path), and a multipolygon-typed version
    (ineligible under DefaultTagInterpreter)."""
    nref = lambda i, role="": {"type": "node", "ref": i, "role": role}  # noqa: E731
    wref = lambda i, role="": {"type": "way", "ref": i, "role": role}  # noqa: E731
    docs = [
        # route relation: way + node members, refs change, tags change
        make_doc(
            "relation", 1,
            [
                make_version(1, _ts(0), 10, uid=1, tags={"kind": "route"},
                             refs=[wref(11, "main"), nref(101, "stop")]),
                make_version(2, _ts(1), 11, uid=2, tags={"kind": "trail"},
                             refs=[wref(11, "main"), nref(101, "stop")]),
                make_version(3, _ts(2), 12, uid=3, tags={"kind": "trail"},
                             refs=[wref(11, "main")]),
            ],
            members=[
                _wmem(11, [
                    make_version(1, _ts(0), 10, uid=1, tags={},
                                 refs=[nref(101), nref(102)]),
                    make_version(2, _ts(1) + 100, 13, uid=2, tags={},
                                 refs=[nref(101), nref(102), nref(103)]),
                ]),
                _mem(101, [make_version(1, _ts(0), 10, lon=10_0000000, lat=10_0000000),
                           make_version(2, _ts(1), 14, lon=11_0000000, lat=10_0000000)]),
                _mem(102, [make_version(1, _ts(0), 10, lon=12_0000000, lat=10_0000000),
                           make_version(2, _ts(2) + 50, 15, visible=False)]),
                _mem(103, [make_version(1, _ts(1), 13, lon=13_0000000, lat=11_0000000)]),
            ],
        ),
        # deleted + restored relation; missing member (way 22 absent);
        # a relation-TYPE ref with no embedded member (skipped component)
        make_doc(
            "relation", 2,
            [
                make_version(1, _ts(0), 20, uid=1, tags={"a": "1"},
                             refs=[nref(201), wref(22),
                                   {"type": "relation", "ref": 9, "role": ""}]),
                make_version(2, _ts(1), 21, uid=1, visible=False),
                make_version(3, _ts(2), 22, uid=2, tags={"a": "2"},
                             refs=[nref(201)]),
            ],
            members=[
                _mem(201, [make_version(1, _ts(0), 20, lon=-10_0000000, lat=-10_0000000)]),
            ],
        ),
        # closed way member with building tag -> Polygon component;
        # member way deleted mid-history -> empty LineString component
        make_doc(
            "relation", 3,
            [
                make_version(1, _ts(0), 30, uid=1, tags={"kind": "campus"},
                             refs=[wref(33), nref(301)]),
            ],
            members=[
                _wmem(33, [
                    make_version(1, _ts(0), 30, uid=1, tags={"building": "yes"},
                                 refs=[nref(301), nref(302), nref(303), nref(301)]),
                    make_version(2, _ts(2), 31, uid=1, visible=False),
                ]),
                _mem(301, [make_version(1, _ts(0), 30, lon=0, lat=0)]),
                _mem(302, [make_version(1, _ts(0), 30, lon=1_0000000, lat=0)]),
                _mem(303, [make_version(1, _ts(0), 30, lon=1_0000000, lat=1_0000000)]),
            ],
        ),
        # relation-member doc: NOT fast-eligible (nested relation)
        make_doc(
            "relation", 4,
            [
                make_version(1, _ts(0), 40, uid=1, tags={"kind": "super"},
                             refs=[{"type": "relation", "ref": 1, "role": ""},
                                   nref(401)]),
            ],
            members=[
                {"entity_type": "relation", "id": 1,
                 "versions": [make_version(1, _ts(0), 40, tags={"kind": "route"},
                                           refs=[nref(401)])]},
                _mem(401, [make_version(1, _ts(0), 40, lon=20_0000000, lat=20_0000000)]),
            ],
        ),
        # multipolygon-typed version: fast-eligible, assembled in-kernel
        make_doc(
            "relation", 5,
            [
                make_version(1, _ts(0), 50, uid=1,
                             tags={"type": "multipolygon", "landuse": "farm"},
                             refs=[wref(55, "outer")]),
            ],
            members=[
                _wmem(55, [
                    make_version(1, _ts(0), 50, uid=1, tags={},
                                 refs=[nref(501), nref(502), nref(503), nref(501)]),
                ]),
                _mem(501, [make_version(1, _ts(0), 50, lon=30_0000000, lat=30_0000000)]),
                _mem(502, [make_version(1, _ts(0), 50, lon=31_0000000, lat=30_0000000)]),
                _mem(503, [make_version(1, _ts(0), 50, lon=31_0000000, lat=31_0000000)]),
            ],
        ),
        # type flips GC→multipolygon mid-history; outer ring split across
        # TWO half-ways (ring joining by node id) + an inner hole way; a
        # member node moves under the assembled ring (GEOMETRY_CHANGE via
        # assembled-WKB compare)
        make_doc(
            "relation", 6,
            [
                make_version(1, _ts(0), 60, uid=1, tags={"kind": "area"},
                             refs=[wref(61, "outer"), wref(62, "outer"),
                                   wref(63, "inner")]),
                make_version(2, _ts(1), 61, uid=2,
                             tags={"type": "multipolygon", "kind": "area"},
                             refs=[wref(61, "outer"), wref(62, "outer"),
                                   wref(63, "inner")]),
            ],
            members=[
                _wmem(61, [
                    make_version(1, _ts(0), 60, uid=1, tags={},
                                 refs=[nref(601), nref(602), nref(603)]),
                ]),
                _wmem(62, [
                    make_version(1, _ts(0), 60, uid=1, tags={},
                                 refs=[nref(603), nref(604), nref(601)]),
                ]),
                _wmem(63, [
                    make_version(1, _ts(0), 60, uid=1, tags={},
                                 refs=[nref(605), nref(606), nref(607), nref(605)]),
                ]),
                _mem(601, [make_version(1, _ts(0), 60, lon=-50_0000000, lat=-50_0000000)]),
                _mem(602, [make_version(1, _ts(0), 60, lon=-40_0000000, lat=-50_0000000)]),
                _mem(603, [make_version(1, _ts(0), 60, lon=-40_0000000, lat=-40_0000000),
                           make_version(2, _ts(2), 62, lon=-39_0000000, lat=-39_0000000)]),
                _mem(604, [make_version(1, _ts(0), 60, lon=-50_0000000, lat=-40_0000000)]),
                _mem(605, [make_version(1, _ts(0), 60, lon=-47_0000000, lat=-47_0000000)]),
                _mem(606, [make_version(1, _ts(0), 60, lon=-45_0000000, lat=-47_0000000)]),
                _mem(607, [make_version(1, _ts(0), 60, lon=-45_0000000, lat=-45_0000000)]),
            ],
        ),
        # boundary-typed with an UNCLOSED outer (dangling way) → assembly
        # raises → geometry-collection fallback must match general path
        make_doc(
            "relation", 7,
            [
                make_version(1, _ts(0), 70, uid=1,
                             tags={"type": "boundary", "name": "open"},
                             refs=[wref(71, "outer"), nref(701, "label")]),
            ],
            members=[
                _wmem(71, [
                    make_version(1, _ts(0), 70, uid=1, tags={},
                                 refs=[nref(701), nref(702), nref(703)]),
                ]),
                _mem(701, [make_version(1, _ts(0), 70, lon=55_0000000, lat=-20_0000000)]),
                _mem(702, [make_version(1, _ts(0), 70, lon=56_0000000, lat=-20_0000000)]),
                _mem(703, [make_version(1, _ts(0), 70, lon=56_0000000, lat=-19_0000000)]),
            ],
        ),
    ]
    return docs_df(spark, docs)


@pytest.mark.parametrize(
    "aoi_kw",
    [
        {},
        {"bbox": (-60.0, -60.0, 60.0, 60.0)},
        {"polygon": _BIG_QUAD},
        {"polygon": _SLIT_QUAD},
    ],
    ids=["world", "inside", "poly_inside", "poly_slit"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "kind")], [("tag_eq", "a", "2")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_relation_snapshot_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_rel_docs(spark)
    fast = snapshots(docs, SNAP_TS, filter_spec=flt, **aoi_kw)
    slow = snapshots(docs, SNAP_TS, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


@pytest.mark.parametrize(
    "aoi_kw",
    [{}, {"bbox": (-60.0, -60.0, 60.0, 60.0)}, {"polygon": _BIG_QUAD}],
    ids=["world", "inside", "poly_inside"],
)
@pytest.mark.parametrize(
    "flt",
    [None, [("tag_key", "kind")], [("tag_eq", "a", "2")]],
    ids=["nofilter", "tagkey", "tageq"],
)
def test_relation_contribution_fast_vs_slow(spark, aoi_kw, flt):
    docs = _tricky_rel_docs(spark)
    interval = (_ts(0), _ts(3) + 1)
    fast = contributions(docs, interval, filter_spec=flt, **aoi_kw)
    slow = contributions(docs, interval, filter_spec=(flt or []) + [NOOP], **aoi_kw)
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


@pytest.mark.parametrize(
    "interval",
    [(0, 2**40), (_ts(1), _ts(2)), (_ts(1) + 1, _ts(3))],
    ids=["all", "mid", "offset"],
)
def test_relation_contribution_fast_vs_slow_intervals(spark, interval):
    docs = _tricky_rel_docs(spark)
    fast = contributions(docs, interval)
    slow = contributions(docs, interval, filter_spec=[NOOP])
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))


def test_relation_routing(spark):
    """Eligible relation docs take fast_kind='relation' — including
    multipolygon-typed docs (assembled in-kernel since the MP
    vectorization); only nested-relation members stay general."""
    from oshdb_spark.kernels.aoi import AOI
    from oshdb_spark.kernels.snapshot import prepared_docs

    docs = _tricky_rel_docs(spark)
    pdf = prepared_docs(
        docs, None, AOI(), fast_arrays=True, fast_ways=True,
        fast_rels="default",
    ).toPandas()
    kinds = dict(zip(pdf["id"], pdf["fast_kind"]))
    assert kinds[1] == "relation"
    assert kinds[2] == "relation"
    assert kinds[3] == "relation"
    assert kinds[4] is None  # nested relation member
    assert kinds[5] == "relation"  # multipolygon-typed: in-kernel assembly


def test_relation_fast_vs_slow_reference_fixture(spark):
    """The reference's polygon.osm relation fixture through both Spark
    paths (mixed eligibility: multipolygon docs stay general)."""
    import os

    from oshdb_spark.api.timestamps import timestamp_list
    from oshdb_spark.model.synth import parse_osm_xml, unix

    ref = "/root/reference/oshdb-util/src/test/resources/different-timestamps/polygon.osm"
    if not os.path.isfile(ref):
        pytest.skip("reference fixtures not available")
    docs = docs_df(spark, parse_osm_xml(ref))
    docs = docs.filter("doc_id like 'relation/%'")
    ts = timestamp_list("2000-01-01", "2020-01-01", "P1Y")
    fast = snapshots(docs, ts)
    slow = snapshots(docs, ts, filter_spec=[NOOP])
    a = _canon(fast)
    pd.testing.assert_frame_equal(a, _canon(slow))
    assert len(a) > 20
    interval = (unix("2000-01-01T00:00:00Z"), unix("2020-01-01T00:00:00Z"))
    cfast = contributions(docs, interval)
    cslow = contributions(docs, interval, filter_spec=[NOOP])
    ca = _canon(cfast)
    pd.testing.assert_frame_equal(ca, _canon(cslow))
    assert len(ca) > 10
