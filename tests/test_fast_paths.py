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
