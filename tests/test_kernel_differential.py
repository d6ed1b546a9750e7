"""Independent-replay differential for the node snapshot kernel.

A pure-python reimplementation of the reference's snapshot semantics
(OSHEntities.getByTimestamps as-of join: latest version with ts <= t;
skip invisible; tag filter; point-in-bbox AOI — CellIterator.java:181-347)
is checked against the engine's `_emit_doc_snapshots` on
hypothesis-random node histories. Unlike `test_fast_paths`' fast-vs-
general differential (two ENGINE paths sharing the doc model), this
replay shares no code with the kernel — it derives everything from the
raw version dicts — so a bug common to both engine paths cannot hide.

Boundary coincidences are excluded by construction: node coordinates sit
on a 0.1-degree lattice while bbox bounds sit on .05 offsets, so no
point ever lies exactly on the AOI edge and open/closed conventions
cannot differ.
"""

from __future__ import annotations

import os

# soak multiplier: KERNEL_PROP_SCALE=8 runs every differential here at
# 8x its CI example budget (120-150 -> ~1000) for offline robustness
# soaks; default 1 keeps the committed gate fast
_PROP_SCALE = int(os.environ.get("KERNEL_PROP_SCALE", "1"))

import numpy as np
import pytest

try:
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from oshdb_spark.geo import geom as G
from oshdb_spark.kernels.aoi import AOI
from oshdb_spark.kernels.geometry_builder import DefaultTagInterpreter
from oshdb_spark.kernels.snapshot import _emit_doc_snapshots
from oshdb_spark.model.synth import make_doc, make_version, typed_row

DECIDER = DefaultTagInterpreter()
BASE = 946684800  # 2000-01-01
STEP = 86400 * 31

TAG_POOL = [None, {"amenity": "cafe"}, {"amenity": "bar"}, {"highway": "bus_stop"}]


def _iso(ts: int) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _build_doc(history):
    versions = []
    for k, (dt_steps, visible, tag_i, lon_steps, lat_steps) in enumerate(history):
        versions.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in history[: k + 1]) * STEP),
                changeset=100 + k,
                uid=7,
                tags=TAG_POOL[tag_i],
                lon=lon_steps * 1_000_000,  # 0.1-degree lattice
                lat=lat_steps * 1_000_000,
                visible=visible,
            )
        )
    return typed_row(make_doc("node", 42, versions)), versions


def _replay(versions, requested, bbox, key_filter):
    """Reference semantics, independently: for each requested t, the
    latest version with ts <= t; row iff visible, tag-matching, and (when
    a bbox is given) the point is inside it."""
    from oshdb_spark.model.synth import unix

    out = {}
    any_match = any(
        v["visible"] and (key_filter is None or key_filter in (v["tags"] or {}))
        for v in versions
    )
    if not any_match:
        return out  # CellIterator.java:207-211 pre-filter
    for t in requested:
        vs = [v for v in versions if unix(v["ts"]) <= t]
        if not vs:
            continue
        v = max(vs, key=lambda v: (unix(v["ts"]), v["version"]))
        if not v["visible"]:
            continue
        if key_filter is not None and key_filter not in (v["tags"] or {}):
            continue
        lon, lat = v["lon"] * 1e-7, v["lat"] * 1e-7
        if bbox is not None:
            w, s, e, n = bbox
            if not (w <= lon <= e and s <= lat <= n):
                continue
        out[t] = (v["version"], round(lon, 9), round(lat, 9),
                  tuple(sorted((v["tags"] or {}).items())))
    return out


if HAVE_HYP:
    history_strategy = st.lists(
        st.tuples(
            st.integers(1, 5),        # ts delta (steps)
            st.booleans(),            # visible
            st.integers(0, len(TAG_POOL) - 1),
            st.integers(-80, 80),     # lon (0.1-deg lattice steps)
            st.integers(-60, 60),     # lat
        ),
        min_size=1,
        max_size=8,
    )
    requested_strategy = st.lists(
        st.integers(0, 45), min_size=1, max_size=10, unique=True
    )
    bbox_strategy = st.one_of(
        st.none(),
        st.tuples(
            st.integers(-60, 40), st.integers(-50, 30),
            st.integers(1, 40), st.integers(1, 40),
        ),
    )

    @settings(max_examples=150 * _PROP_SCALE, deadline=None)
    @given(history_strategy, requested_strategy, bbox_strategy,
           st.sampled_from([None, "amenity", "highway"]))
    def test_node_snapshots_match_independent_replay(
        history, req_steps, bbox_spec, key_filter
    ):
        doc, versions = _build_doc(history)
        requested = sorted(BASE + r * STEP + 1 for r in req_steps)
        if bbox_spec is None:
            aoi, bbox = AOI(), None
        else:
            w, s, dw, dh = bbox_spec
            bbox = (w / 10 + 0.05, s / 10 + 0.05,
                    (w + dw) / 10 + 0.05, (s + dh) / 10 + 0.05)
            aoi = AOI(bbox=bbox)
        flt = None
        if key_filter is not None:
            flt = lambda v, et, eid: key_filter in (v.get("tags") or {})  # noqa: E731

        out = []
        _emit_doc_snapshots(doc, requested, aoi, flt, DECIDER, True, out)
        got = {}
        for r in out:
            t = r[0]
            assert t not in got, "duplicate snapshot row for one timestamp"
            g = G.from_wkb(r[8])
            assert g is not None and g[0] == "Point"
            got[t] = (r[3], round(g[1][0], 9), round(g[1][1], 9),
                      tuple(sorted((r[6] or {}).items())))

        want = _replay(versions, requested, bbox, key_filter)
        assert got == want
    def _replay_contribs(versions, t1, bbox):
        """Reference contribution semantics, independently (CellIterator
        .java:437-712 for the node case, no filter, distinct changesets,
        interval covering the whole history — interval-boundary
        suppression corners are pinned by the ported golden suites):
        contribution state is EVENT-based — `before` carries the version
        of the last contribution event (a recreation's before is its
        deleted predecessor because the DELETION was itself an event; a
        never-active predecessor produced no event, so before is None),
        and an inactive state emits a DELETION only once per active run."""
        from oshdb_spark.model.synth import unix

        def active(v):
            if not v["visible"]:
                return False
            if bbox is None:
                return True
            w, s, e, n = bbox
            lon, lat = v["lon"] * 1e-7, v["lat"] * 1e-7
            return w <= lon <= e and s <= lat <= n

        out = {}
        ev = None  # (version_dict, types) of the last contribution event
        for v in sorted(versions, key=lambda v: (unix(v["ts"]), v["version"])):
            t = unix(v["ts"])
            if t >= t1:
                break
            types = None
            if not active(v):
                if ev is not None and "DELETION" not in ev[1]:
                    types = ["DELETION"]
                else:
                    continue  # never active / already deleted: no event
            elif ev is None or "DELETION" in ev[1]:
                types = ["CREATION"]
            else:
                # every modification of an active entity is a
                # contribution — the type set can be EMPTY for a version
                # bump with no observable change (the reference emits
                # the row; its lazily-computed EnumSet is just empty)
                types = []
                pv = ev[0]
                if (pv.get("tags") or {}) != (v.get("tags") or {}):
                    types.append("TAG_CHANGE")
                if (pv["lon"], pv["lat"]) != (v["lon"], v["lat"]):
                    types.append("GEOMETRY_CHANGE")
            out[t] = (
                sorted(types),
                v["changeset"],
                ev[0]["version"] if ev else None,
                v["version"],
                tuple(sorted((v.get("tags") or {}).items())),
            )
            ev = (v, types)
        return out

    @settings(max_examples=150 * _PROP_SCALE, deadline=None)
    @given(history_strategy, bbox_strategy, st.integers(1, 50))
    def test_node_contributions_match_independent_replay(
        history, bbox_spec, t1_steps
    ):
        from oshdb_spark.kernels.contribution import _emit_doc_contributions

        doc, versions = _build_doc(history)
        t0 = BASE - 1
        t1 = BASE + t1_steps * STEP + 1
        if bbox_spec is None:
            aoi, bbox = AOI(), None
        else:
            w, s, dw, dh = bbox_spec
            bbox = (w / 10 + 0.05, s / 10 + 0.05,
                    (w + dw) / 10 + 0.05, (s + dh) / 10 + 0.05)
            aoi = AOI(bbox=bbox)

        out = []
        _emit_doc_contributions(doc, t0, t1, aoi, None, DECIDER, True, out)
        got = {}
        for r in out:
            assert r[0] not in got
            got[r[0]] = (r[3], r[4], r[6], r[7],
                         tuple(sorted((r[9] or {}).items())))

        want = _replay_contribs(versions, t1, bbox)
        assert got == want
else:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)


# ---------------------------------------------------------------------------
# WAY snapshot kernel vs independent replay (member as-of resolution —
# the hardest exactness target, SURVEY §2 #20). The replay derives
# everything from raw version/member dicts: way as-of join, per-ref node
# as-of join, missing/invisible/coordless member skips, empty-refs skip,
# tag filter, and (for bbox AOIs) row presence via a separating-axis
# segment-vs-rect test — a different formulation than the engine's
# Liang-Barsky clip, so a shared blind spot is impossible. Area tags are
# excluded (decider parity is pinned by the ported golden suites);
# geometry bytes are compared UNCLIPPED, presence decides the clip.
# ---------------------------------------------------------------------------

WAY_TAGS = [None, {"highway": "path"}, {"highway": "track"}, {"note": "x"}]


def _build_way_doc(way_hist, member_hists):
    members = []
    mdicts = {}
    for mi, hist in enumerate(member_hists):
        mid = 101 + mi
        mvs = []
        for k, (dt, visible, lon_s, lat_s) in enumerate(hist):
            mvs.append(
                make_version(
                    version=k + 1,
                    ts=_iso(BASE + sum(h[0] for h in hist[: k + 1]) * STEP),
                    changeset=500 + k,
                    lon=None if not visible else lon_s * 1_000_000,
                    lat=None if not visible else lat_s * 1_000_000,
                    visible=visible,
                )
            )
        members.append({"entity_type": "node", "id": mid, "versions": mvs})
        mdicts[mid] = mvs
    wvs = []
    for k, (dt, visible, tag_i, ref_ids) in enumerate(way_hist):
        wvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in way_hist[: k + 1]) * STEP),
                changeset=100 + k,
                uid=7,
                tags=WAY_TAGS[tag_i],
                refs=[{"type": "node", "ref": r, "role": ""} for r in ref_ids],
                visible=visible,
            )
        )
    doc = typed_row(make_doc("way", 7, wvs, members=members))
    return doc, wvs, mdicts


def _seg_hits_rect(p0, p1, bbox):
    """Segment-rect intersection by separating axes (NOT Liang-Barsky):
    no rect edge has both endpoints strictly outside on the same side,
    and the segment's carrier line does not separate the rect corners."""
    w, s, e, n = bbox
    (x0, y0), (x1, y1) = p0, p1
    if (x0 < w and x1 < w) or (x0 > e and x1 > e):
        return False
    if (y0 < s and y1 < s) or (y0 > n and y1 > n):
        return False
    dx, dy = x1 - x0, y1 - y0
    signs = {
        (cx - x0) * dy - (cy - y0) * dx > 0
        for cx, cy in ((w, s), (w, n), (e, s), (e, n))
    }
    return len(signs) > 1 or dx == dy == 0


def _replay_way(wvs, mdicts, requested, bbox, key_filter):
    from oshdb_spark.model.synth import unix

    if key_filter is not None and not any(
        v["visible"] and key_filter in (v["tags"] or {}) for v in wvs
    ):
        return {}

    # reference 3-state cull (CellIterator.java:200-215,320): the DOC
    # bbox spans every coordinate embedded in the blob (typed_row —
    # including members the current version does not reference); when
    # the doc is FULLY INSIDE the AOI a snapshot is emitted even if its
    # geometry is empty (fullyInside || !geom.isEmpty())
    lons = [
        v["lon"] * 1e-7
        for vs in mdicts.values()
        for v in vs
        if v.get("lon") is not None
    ]
    lats = [
        v["lat"] * 1e-7
        for vs in mdicts.values()
        for v in vs
        if v.get("lat") is not None
    ]
    doc_bbox = (
        (min(lons), min(lats), max(lons), max(lats)) if lons else None
    )
    if bbox is not None:
        if doc_bbox is None:
            return {}  # engine: fbbox None -> rel 0 (skip)
        if (
            doc_bbox[2] < bbox[0]
            or bbox[2] < doc_bbox[0]
            or doc_bbox[3] < bbox[1]
            or bbox[3] < doc_bbox[1]
        ):
            return {}
        fully_inside = (
            doc_bbox[0] >= bbox[0]
            and doc_bbox[1] >= bbox[1]
            and doc_bbox[2] <= bbox[2]
            and doc_bbox[3] <= bbox[3]
        )
    else:
        fully_inside = True

    def node_asof(mid, t):
        vs = [v for v in mdicts.get(mid, []) if unix(v["ts"]) <= t]
        if not vs:
            return None
        v = max(vs, key=lambda v: (unix(v["ts"]), v["version"]))
        if not v["visible"] or v["lon"] is None:
            return None
        return (round(v["lon"] * 1e-7, 9), round(v["lat"] * 1e-7, 9))

    out = {}
    for t in requested:
        cand = [v for v in wvs if unix(v["ts"]) <= t]
        if not cand:
            continue
        v = max(cand, key=lambda v: (unix(v["ts"]), v["version"]))
        if not v["visible"] or not v["refs"]:
            continue
        if key_filter is not None and key_filter not in (v["tags"] or {}):
            continue
        pts = [p for p in (node_asof(r["ref"], t) for r in v["refs"])
               if p is not None]
        if len(pts) >= 2:
            geom = ("LineString", tuple(pts))
        elif len(pts) == 1:
            geom = ("Point", pts[0])
        else:
            geom = ("empty",)
        if bbox is not None and not fully_inside:
            if geom[0] == "empty":
                continue
            if geom[0] == "Point":
                x, y = geom[1]
                if not (bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]):
                    continue
            else:
                if not any(
                    _seg_hits_rect(pts[i], pts[i + 1], bbox)
                    for i in range(len(pts) - 1)
                ):
                    continue
        out[t] = (v["version"], tuple(sorted((v["tags"] or {}).items())), geom)
    return out


def _canon_geom(g):
    if g is None:
        return ("empty",)
    t, p = g
    if t == "Point":
        if p is None:
            return ("empty",)
        return ("Point", (round(p[0], 9), round(p[1], 9)))
    assert t == "LineString", t
    return (
        "LineString",
        tuple((round(x, 9), round(y, 9)) for x, y in np.asarray(p)),
    )


if HAVE_HYP:
    member_hist = st.lists(
        st.tuples(
            st.integers(1, 4),      # ts delta (steps)
            st.booleans(),          # visible (invisible ⇒ coords None)
            st.integers(-80, 80),   # lon lattice steps
            st.integers(-60, 60),   # lat
        ),
        min_size=1,
        max_size=3,
    )
    way_hist_strategy = st.lists(
        st.tuples(
            st.integers(1, 4),
            st.booleans(),
            st.integers(0, len(WAY_TAGS) - 1),
            # refs drawn from member ids 101-103 plus 104 (NO history —
            # the incomplete-extract case); repeats allowed, may be empty
            st.lists(st.integers(101, 104), min_size=0, max_size=5),
        ),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=120 * _PROP_SCALE, deadline=None)
    @given(
        way_hist_strategy,
        st.lists(member_hist, min_size=2, max_size=3),
        requested_strategy,
        bbox_strategy,
        st.sampled_from([None, "highway", "note"]),
    )
    def test_way_snapshots_match_independent_replay(
        way_hist, member_hists, req_steps, bbox_spec, key_filter
    ):
        doc, wvs, mdicts = _build_way_doc(way_hist, member_hists)
        requested = sorted(BASE + r * STEP + 1 for r in req_steps)
        if bbox_spec is None:
            aoi, bbox = AOI(), None
        else:
            w, s, dw, dh = bbox_spec
            bbox = (w / 10 + 0.05, s / 10 + 0.05,
                    (w + dw) / 10 + 0.05, (s + dh) / 10 + 0.05)
            aoi = AOI(bbox=bbox)
        flt = None
        if key_filter is not None:
            flt = lambda v, et, eid: key_filter in (v.get("tags") or {})  # noqa: E731

        out = []
        _emit_doc_snapshots(doc, requested, aoi, flt, DECIDER, True, out)
        got = {}
        for r in out:
            assert r[0] not in got, "duplicate snapshot row for one ts"
            got[r[0]] = (
                r[3],
                tuple(sorted((r[6] or {}).items())),
                _canon_geom(G.from_wkb(r[7])),  # UNclipped geometry
            )

        want = _replay_way(wvs, mdicts, requested, bbox, key_filter)
        assert got == want

    def test_way_snapshot_fully_inside_emits_empty_geometry():
        """Pinned hypothesis counterexample (round-4): a way whose only
        referenced node is invisible builds an EMPTY geometry, but the
        DOC bbox (spanning an embedded member the current version does
        not reference) is fully inside the AOI — the reference emits the
        row anyway (CellIterator.java:320 `fullyInside ||
        !geom.isEmpty()`), and so must the engine AND the replay."""
        way_hist = [(1, True, 0, [101])]
        member_hists = [[(1, False, 0, 0)], [(1, True, 1, 0)]]
        doc, wvs, mdicts = _build_way_doc(way_hist, member_hists)
        requested = [BASE + 1 * STEP + 1]
        bbox = (0.05, -0.05, 1.05, 1.05)
        out = []
        _emit_doc_snapshots(
            doc, requested, AOI(bbox=bbox), None, DECIDER, True, out
        )
        got = {
            r[0]: (r[3], tuple(sorted((r[6] or {}).items())),
                   _canon_geom(G.from_wkb(r[7])))
            for r in out
        }
        want = _replay_way(wvs, mdicts, requested, bbox, None)
        assert got == want
        assert got == {requested[0]: (1, (), ("empty",))}


# ---------------------------------------------------------------------------
# RELATION snapshot kernel vs independent replay (geometry-collection
# path: 2-level member resolution — relation refs → embedded node/way
# histories → way refs → node histories, all as-of t). Non-area tags
# keep the decider out of scope (multipolygon assembly is pinned by the
# ported golden suites); empty components (invisible members) are part
# of the contract — the reference's GC keeps them (ref :140-185).
# ---------------------------------------------------------------------------

REL_TAGS = [None, {"kind": "route"}, {"kind": "trail"}, {"note": "x"}]


def _build_rel_doc(rel_hist, way_hist, node_hists):
    members = []
    node_ids = []
    for mi, hist in enumerate(node_hists):
        mid = 101 + mi
        node_ids.append(mid)
        mvs = []
        for k, (dt, visible, lon_s, lat_s) in enumerate(hist):
            mvs.append(
                make_version(
                    version=k + 1,
                    ts=_iso(BASE + sum(h[0] for h in hist[: k + 1]) * STEP),
                    changeset=500 + k,
                    lon=None if not visible else lon_s * 1_000_000,
                    lat=None if not visible else lat_s * 1_000_000,
                    visible=visible,
                )
            )
        members.append({"entity_type": "node", "id": mid, "versions": mvs})
    wvs = []
    for k, (dt, visible, ref_ids) in enumerate(way_hist):
        wvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in way_hist[: k + 1]) * STEP),
                changeset=300 + k,
                refs=[{"type": "node", "ref": r, "role": ""} for r in ref_ids],
                visible=visible,
            )
        )
    members.append({"entity_type": "way", "id": 11, "versions": wvs})
    rvs = []
    for k, (dt, visible, tag_i, refs) in enumerate(rel_hist):
        rvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in rel_hist[: k + 1]) * STEP),
                changeset=100 + k,
                uid=7,
                tags=REL_TAGS[tag_i],
                refs=[{"type": t, "ref": r, "role": ""} for t, r in refs],
                visible=visible,
            )
        )
    doc = typed_row(make_doc("relation", 8, rvs, members=members))
    return doc, rvs, {"way": {11: wvs},
                      "node": {101 + i: h for i, h in
                               enumerate(m["versions"] for m in members[:-1])}}


def _naive_rel_mod_ts(rvs, mem, key_filter):
    """Independent re-derivation of the relation's filtered modification
    timestamps (OSHEntities.java _getModificationTimestamps(OSHRelation,
    recurse, filter)): own matched-transition timestamps, plus member
    child timestamps (nodes: ALL versions; ways: own transitions + their
    node children in the way's windows) selected inside the membership
    validity windows of MATCHING relation versions — windows span
    [version ts, next version ts] INCLUSIVE (the reference's `<= toTs`
    walk). Geometry snapshots between modifications REUSE the last
    modification state, so a member state change that produces no mod
    timestamp (e.g. a never-visible way) is invisible to later
    snapshots — the corner this replay originally got wrong."""
    from oshdb_spark.model.synth import unix

    INF = float("inf")

    def trans(versions, pred):
        out, prev = [], False
        for v in sorted(versions, key=lambda x: unix(x["ts"])):
            if pred(v):
                out.append(unix(v["ts"]))
                prev = True
            else:
                if prev:
                    out.append(unix(v["ts"]))
                prev = False
        return out

    def windows_of(versions, pred, types):
        wins = {}
        vs = sorted(versions, key=lambda x: unix(x["ts"]))
        for i, v in enumerate(vs):
            if not pred(v):
                continue
            frm = unix(v["ts"])
            to = unix(vs[i + 1]["ts"]) if i + 1 < len(vs) else INF
            for r in v.get("refs") or []:
                if r["type"] in types:
                    wins.setdefault((r["type"], r["ref"]), []).append(
                        (frm, to)
                    )
        return wins

    def match(v):
        return v["visible"] and (
            key_filter is None or key_filter in (v["tags"] or {})
        )

    def node_ts(h):
        return [unix(v["ts"]) for v in h]

    def way_ts(wvs):
        out = set(trans(wvs, lambda v: v["visible"]))
        for (_ty, ref), ws in windows_of(
            wvs, lambda v: v["visible"], {"node"}
        ).items():
            h = mem["node"].get(ref)
            if h is None:
                continue
            out |= {
                ct for ct in node_ts(h)
                if any(a <= ct <= b for a, b in ws)
            }
        return sorted(out)

    result = set(trans(rvs, match))
    for (ty, ref), ws in windows_of(rvs, match, {"node", "way"}).items():
        h = mem.get(ty, {}).get(ref)
        if h is None:
            continue
        cts = node_ts(h) if ty == "node" else way_ts(h)
        result |= {ct for ct in cts if any(a <= ct <= b for a, b in ws)}
    return sorted(result)


def _replay_relation(rvs, mem, requested, bbox, key_filter):
    from oshdb_spark.model.synth import unix

    if key_filter is not None and not any(
        v["visible"] and key_filter in (v["tags"] or {}) for v in rvs
    ):
        return {}

    def asof(versions, t):
        vs = [v for v in versions if unix(v["ts"]) <= t]
        if not vs:
            return None
        return max(vs, key=lambda v: (unix(v["ts"]), v["version"]))

    def node_geom(nv):
        if not nv["visible"] or nv["lon"] is None:
            return ("emptyPoint",)
        return ("Point", (round(nv["lon"] * 1e-7, 9),
                          round(nv["lat"] * 1e-7, 9)))

    def way_geom(wv, t):
        if not wv["visible"]:
            return ("LineString", ())
        pts = []
        for r in wv["refs"]:
            h = mem["node"].get(r["ref"])
            if h is None:
                continue
            nv = asof(h, t)
            if nv is None or not nv["visible"] or nv["lon"] is None:
                continue
            pts.append((round(nv["lon"] * 1e-7, 9),
                        round(nv["lat"] * 1e-7, 9)))
        if len(pts) >= 2:
            return ("LineString", tuple(pts))
        if len(pts) == 1:
            return ("Point", pts[0])
        return ("emptyPoint",)

    def hits_bbox(comp):
        if comp[0] == "emptyPoint":
            return False
        if comp[0] == "Point":
            x, y = comp[1]
            return bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]
        pts = comp[1]
        if len(pts) == 0:
            return False
        return any(
            _seg_hits_rect(pts[i], pts[i + 1], bbox)
            for i in range(len(pts) - 1)
        )

    # group requested timestamps by modification state exactly like the
    # reference (CellIterator.java:219-243): the first requested ts at or
    # after each new modification becomes a KEY evaluated for real; the
    # following requested ts reuse the key's emitted state
    # entity-bbox fully-inside shortcut (reference: a doc whose full
    # coordinate history sits inside the query bbox is emitted WITHOUT
    # per-geometry intersection tests — even when the as-of geometry is
    # empty, e.g. all members deleted; the engine's 3-state cull models
    # the same rule at doc granularity)
    coords = [
        (round(v["lon"] * 1e-7, 9), round(v["lat"] * 1e-7, 9))
        for h in mem["node"].values()
        for v in h
        if v["visible"] and v["lon"] is not None
    ]
    fully = False
    if bbox is not None and coords:
        xs = [c[0] for c in coords]
        ys = [c[1] for c in coords]
        fully = (
            min(xs) >= bbox[0] and max(xs) <= bbox[2]
            and min(ys) >= bbox[1] and max(ys) <= bbox[3]
        )

    mods = _naive_rel_mod_ts(rvs, mem, key_filter)
    groups: list[list[int]] = []
    j = 0
    for t in sorted(requested):
        need = False
        while j < len(mods) and mods[j] <= t:
            need = True
            j += 1
        if need:
            groups.append([t])
        elif groups:
            groups[-1].append(t)

    out = {}
    for ts_group in groups:
        t = ts_group[0]
        v = asof(rvs, t)
        if v is None or not v["visible"] or not v["refs"]:
            continue
        if key_filter is not None and key_filter not in (v["tags"] or {}):
            continue
        comps = []
        for r in v["refs"]:
            h = mem.get(r["type"], {}).get(r["ref"])
            if h is None:
                continue  # missing member (incomplete extract)
            mv = asof(h, t)
            if mv is None:
                continue  # member not yet born at t
            comps.append(node_geom(mv) if r["type"] == "node"
                         else way_geom(mv, t))
        if bbox is not None and not fully and not any(
            hits_bbox(c) for c in comps
        ):
            continue
        row = (v["version"], tuple(sorted((v["tags"] or {}).items())),
               ("GC", tuple(comps)))
        for each_t in ts_group:
            out[each_t] = row
    return out


def _canon_rel_geom(g):
    if g is None:
        return ("GC", ())
    t, p = g
    if t != "GeometryCollection":
        # single-component GC may round-trip as the component itself —
        # the engine emits GC always; anything else is a real mismatch
        return _canon_geom(g)
    out = []
    for c in p:
        ct, cp = c
        if ct == "Point":
            out.append(("emptyPoint",) if cp is None
                       else ("Point", (round(cp[0], 9), round(cp[1], 9))))
        elif ct == "LineString":
            arr = np.asarray(cp)
            if len(arr) == 0:
                out.append(("LineString", ()))
            elif len(arr) == 1:
                out.append(("Point", (round(arr[0, 0], 9),
                                      round(arr[0, 1], 9))))
            else:
                out.append((
                    "LineString",
                    tuple((round(x, 9), round(y, 9)) for x, y in arr),
                ))
        else:
            out.append((ct, repr(cp)))
    return ("GC", tuple(out))


if HAVE_HYP:
    rel_hist_strategy = st.lists(
        st.tuples(
            st.integers(1, 4),
            st.booleans(),
            st.integers(0, len(REL_TAGS) - 1),
            # refs: embedded nodes 101-102, embedded way 11, missing way
            # 22, missing relation 9
            st.lists(
                st.sampled_from(
                    [("node", 101), ("node", 102), ("way", 11),
                     ("way", 22), ("relation", 9)]
                ),
                min_size=0,
                max_size=5,
            ),
        ),
        min_size=1,
        max_size=4,
    )
    rel_way_hist = st.lists(
        st.tuples(
            st.integers(1, 4),
            st.booleans(),
            st.lists(st.integers(101, 103), min_size=0, max_size=4),
        ),
        min_size=1,
        max_size=3,
    )

    @settings(max_examples=120 * _PROP_SCALE, deadline=None)
    @given(
        rel_hist_strategy,
        rel_way_hist,
        st.lists(member_hist, min_size=2, max_size=2),
        requested_strategy,
        bbox_strategy,
        st.sampled_from([None, "kind", "note"]),
    )
    # pinned: a never-visible member way produces NO modification
    # timestamp, so snapshots after its (deleted) version must REUSE the
    # geometry of the last modification — the GC does NOT grow an empty
    # LineString (reference queryTs grouping, CellIterator.java:219-243)
    @example(
        rel_hist=[(1, True, 0, [("way", 11)])],
        way_hist=[(2, False, [])],
        node_hists=[[(1, False, 0, 0)], [(1, False, 0, 0)]],
        req_steps=[0, 1, 2],
        bbox_spec=None,
        key_filter=None,
    )
    # pinned: entity-bbox fully inside the query bbox emits WITHOUT a
    # per-geometry test — even an all-empty GC (all members deleted)
    @example(
        rel_hist=[(1, True, 0, [("node", 101)])],
        way_hist=[(1, False, [])],
        node_hists=[[(1, False, 0, 0)], [(1, True, 0, 0)]],
        req_steps=[1],
        bbox_spec=(-1, -1, 1, 1),
        key_filter=None,
    )
    def test_relation_snapshots_match_independent_replay(
        rel_hist, way_hist, node_hists, req_steps, bbox_spec, key_filter
    ):
        doc, rvs, mem = _build_rel_doc(rel_hist, way_hist, node_hists)
        requested = sorted(BASE + r * STEP + 1 for r in req_steps)
        if bbox_spec is None:
            aoi, bbox = AOI(), None
        else:
            w, s, dw, dh = bbox_spec
            bbox = (w / 10 + 0.05, s / 10 + 0.05,
                    (w + dw) / 10 + 0.05, (s + dh) / 10 + 0.05)
            aoi = AOI(bbox=bbox)
        flt = None
        if key_filter is not None:
            flt = lambda v, et, eid: key_filter in (v.get("tags") or {})  # noqa: E731

        out = []
        _emit_doc_snapshots(doc, requested, aoi, flt, DECIDER, True, out)
        got = {}
        for r in out:
            assert r[0] not in got
            got[r[0]] = (
                r[3],
                tuple(sorted((r[6] or {}).items())),
                _canon_rel_geom(G.from_wkb(r[7])),
            )

        want = _replay_relation(rvs, mem, requested, bbox, key_filter)
        assert got == want


# ---------------------------------------------------------------------------
# WAY contribution kernel vs independent replay — the member-validity
# mod-timestamp derivation (SURVEY §2 #20, "the hardest exactness
# target") re-derived naively: windows computed per (way-version, node)
# pair with no merge stack, node-caused timestamps selected by direct
# interval tests, changeset attribution by way-put/node-setdefault, and
# squash by a forward scan. Way versions sit on whole STEP lattice
# points, node versions on half steps, so parent/child timestamp
# collisions (put-wins corner, golden-pinned) never occur and every
# remaining rule is exercised on random histories. World AOI only —
# clipped-geometry classification is covered by the fast-vs-general
# differential and the ported golden suites.
# ---------------------------------------------------------------------------

HALF = STEP // 2


def _build_way_doc_contrib(way_hist, member_hists):
    members = []
    mdicts = {}
    for mi, hist in enumerate(member_hists):
        mid = 101 + mi
        mvs = []
        for k, (dt, visible, lon_s, lat_s, cs_pick) in enumerate(hist):
            mvs.append(
                make_version(
                    version=k + 1,
                    ts=_iso(BASE + sum(h[0] for h in hist[: k + 1]) * STEP
                            + HALF),
                    changeset=300 + cs_pick,
                    lon=None if not visible else lon_s * 1_000_000,
                    lat=None if not visible else lat_s * 1_000_000,
                    visible=visible,
                )
            )
        members.append({"entity_type": "node", "id": mid, "versions": mvs})
        mdicts[mid] = mvs
    wvs = []
    for k, (dt, visible, tag_i, ref_ids) in enumerate(way_hist):
        wvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in way_hist[: k + 1]) * STEP),
                changeset=100 + k,
                uid=7,
                tags=WAY_TAGS[tag_i],
                refs=[{"type": "node", "ref": r, "role": ""} for r in ref_ids],
                visible=visible,
            )
        )
    doc = typed_row(make_doc("way", 7, wvs, members=members))
    return doc, wvs, mdicts


def _replay_way_contribs(wvs, mdicts, members_order, t1, key_filter):
    from oshdb_spark.model.synth import unix

    ws = sorted(wvs, key=lambda v: (unix(v["ts"]), v["version"]))
    wts = [unix(v["ts"]) for v in ws]

    def match(v):
        return v["visible"] and (
            key_filter is None or key_filter in (v["tags"] or {})
        )

    if not any(match(v) for v in ws):
        return {}

    # own filter-aware mods: matching ts + first ts of each non-match run
    # that follows a match
    own = []
    prev_m = False
    for v in ws:
        if match(v):
            own.append(unix(v["ts"]))
            prev_m = True
        elif prev_m:
            own.append(unix(v["ts"]))
            prev_m = False

    # node-caused mods: for each matching way version k referencing node
    # n, the window [ts_k, ts_{k+1}] (inclusive; INF for the last) admits
    # ALL of n's version timestamps
    node_mods = set()
    for k, v in enumerate(ws):
        if not match(v):
            continue
        hi = wts[k + 1] if k + 1 < len(ws) else 2**62
        for r in v["refs"]:
            for nv in mdicts.get(r["ref"], []):
                nt = unix(nv["ts"])
                if wts[k] <= nt <= hi:
                    node_mods.add(nt)

    mods = sorted(set(own) | node_mods)

    # changeset attribution: way versions overwrite, nodes setdefault in
    # member order
    cs = {}
    for v in ws:
        cs[unix(v["ts"])] = v["changeset"]
    for mid in members_order:
        for nv in sorted(mdicts[mid], key=lambda v: (unix(v["ts"]), v["version"])):
            cs.setdefault(unix(nv["ts"]), nv["changeset"])

    # squash: of each consecutive same-changeset run keep the LAST ts
    squashed = [
        t for i, t in enumerate(mods)
        if i + 1 >= len(mods) or cs.get(t) != cs.get(mods[i + 1])
    ]

    def way_asof(t):
        cand = [v for v in ws if unix(v["ts"]) <= t]
        return max(cand, key=lambda v: (unix(v["ts"]), v["version"])) if cand else None

    def node_asof(mid, t):
        vs = [v for v in mdicts.get(mid, []) if unix(v["ts"]) <= t]
        if not vs:
            return None
        v = max(vs, key=lambda v: (unix(v["ts"]), v["version"]))
        if not v["visible"] or v["lon"] is None:
            return None
        return (v["lon"], v["lat"])  # exact ints — equality-safe

    def geom(v, t):
        pts = [p for p in (node_asof(r["ref"], t) for r in v["refs"])
               if p is not None]
        return tuple(pts)

    out = {}
    prev = None  # (version_dict, geom_or_None, types)
    for t in squashed:
        if t >= t1:
            break
        v = way_asof(t)
        if v is None:
            continue
        row = None
        if not v["visible"] or (
            key_filter is not None and key_filter not in (v["tags"] or {})
        ):
            if prev is not None and "DELETION" not in prev[2]:
                row = (["DELETION"],
                       v["changeset"] if not v["visible"] else cs.get(t),
                       prev[0]["version"], v["version"],
                       tuple(sorted((v["tags"] or {}).items())))
                prev = (v, None, {"DELETION"})
            # an already-deleted / never-active state: prev unchanged,
            # matching the engine's continue-without-prev-update
            if row is not None:
                out[t] = row
            continue
        g = geom(v, t)
        if prev is None or "DELETION" in prev[2]:
            types = {"CREATION"}
            bver = prev[0]["version"] if prev else None
        else:
            types = set()
            if (prev[0].get("tags") or {}) != (v.get("tags") or {}):
                types.add("TAG_CHANGE")
            if prev[1] != g:
                types.add("GEOMETRY_CHANGE")
            bver = prev[0]["version"]
        out[t] = (sorted(types), cs.get(t), bver, v["version"],
                  tuple(sorted((v["tags"] or {}).items())))
        prev = (v, g, types)
    return out


def _canon_pts(wkb):
    g = G.from_wkb(wkb)
    if g is None:
        return None
    t, p = g
    if t == "Point":
        return () if p is None else (
            (round(p[0], 9), round(p[1], 9)),
        )
    assert t == "LineString"
    return tuple((round(x, 9), round(y, 9)) for x, y in np.asarray(p))


if HAVE_HYP:
    cmember_hist = st.lists(
        st.tuples(
            st.integers(1, 4),      # ts delta (steps, half-offset)
            st.booleans(),
            st.integers(-80, 80),
            st.integers(-60, 60),
            st.integers(0, 1),      # changeset pick {300, 301} → squash runs
        ),
        min_size=1,
        max_size=3,
    )

    @settings(max_examples=120 * _PROP_SCALE, deadline=None)
    @given(
        way_hist_strategy,
        st.lists(cmember_hist, min_size=2, max_size=3),
        st.integers(1, 40),
        st.sampled_from([None, "highway", "note"]),
    )
    def test_way_contributions_match_independent_replay(
        way_hist, member_hists, t1_steps, key_filter
    ):
        from oshdb_spark.kernels.contribution import _emit_doc_contributions

        doc, wvs, mdicts = _build_way_doc_contrib(way_hist, member_hists)
        t0 = BASE - 1
        t1 = BASE + t1_steps * STEP + 1
        flt = None
        if key_filter is not None:
            flt = lambda v, et, eid: key_filter in (v.get("tags") or {})  # noqa: E731

        out = []
        _emit_doc_contributions(doc, t0, t1, AOI(), flt, DECIDER, True, out)
        got = {}
        for r in out:
            assert r[0] not in got
            got[r[0]] = (r[3], r[4], r[6], r[7],
                         tuple(sorted((r[9] or {}).items())))

        want = _replay_way_contribs(
            wvs, mdicts, sorted(mdicts.keys()), t1, key_filter
        )
        assert got == want


# ---------------------------------------------------------------------------
# RELATION contribution kernel vs independent replay — completes the
# replay matrix (node/way/relation × snapshot/contribution). The deepest
# derivation: relation mod timestamps pull member-node timestamps AND
# member-way recursive timestamps (the way's own filter-free transitions
# plus ITS node children windowed over the way's visible versions), all
# re-selected through the relation's membership windows; changeset
# attribution relation-put / member-setdefault; squash; then the state
# machine over geometry collections with exact integer equality.
# Relation ts on whole steps, way ts on half steps, node member i offset
# by HALF + (i+1) seconds — every parent/child lattice is disjoint, so
# put-wins / set-order ties (golden-pinned) are excluded by construction.
# ---------------------------------------------------------------------------


def _build_rel_doc_contrib(rel_hist, way_hist, node_hists):
    members = []
    node_vs = {}
    for mi, hist in enumerate(node_hists):
        mid = 101 + mi
        mvs = []
        for k, (dt, visible, lon_s, lat_s, cs_pick) in enumerate(hist):
            mvs.append(
                make_version(
                    version=k + 1,
                    ts=_iso(BASE + sum(h[0] for h in hist[: k + 1]) * STEP
                            + HALF + mi + 1),
                    changeset=300 + cs_pick,
                    lon=None if not visible else lon_s * 1_000_000,
                    lat=None if not visible else lat_s * 1_000_000,
                    visible=visible,
                )
            )
        members.append({"entity_type": "node", "id": mid, "versions": mvs})
        node_vs[mid] = mvs
    wvs = []
    for k, (dt, visible, ref_ids) in enumerate(way_hist):
        wvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in way_hist[: k + 1]) * STEP
                        + HALF),
                changeset=200 + k,
                refs=[{"type": "node", "ref": r, "role": ""} for r in ref_ids],
                visible=visible,
            )
        )
    members.append({"entity_type": "way", "id": 11, "versions": wvs})
    rvs = []
    for k, (dt, visible, tag_i, refs) in enumerate(rel_hist):
        rvs.append(
            make_version(
                version=k + 1,
                ts=_iso(BASE + sum(h[0] for h in rel_hist[: k + 1]) * STEP),
                changeset=100 + k,
                uid=7,
                tags=REL_TAGS[tag_i],
                refs=[{"type": t, "ref": r, "role": ""} for t, r in refs],
                visible=visible,
            )
        )
    doc = typed_row(make_doc("relation", 8, rvs, members=members))
    return doc, rvs, wvs, node_vs


def _replay_rel_contribs(rvs, wvs, node_vs, t1, key_filter):
    from oshdb_spark.model.synth import unix

    rs = sorted(rvs, key=lambda v: (unix(v["ts"]), v["version"]))
    rts = [unix(v["ts"]) for v in rs]
    ws = sorted(wvs, key=lambda v: (unix(v["ts"]), v["version"]))
    wts = [unix(v["ts"]) for v in ws]

    def match(v):
        return v["visible"] and (
            key_filter is None or key_filter in (v["tags"] or {})
        )

    if not any(match(v) for v in rs):
        return {}

    def transitions(versions, pred):
        outp, prev_m = [], False
        for v in versions:
            if pred(v):
                outp.append(unix(v["ts"]))
                prev_m = True
            elif prev_m:
                outp.append(unix(v["ts"]))
                prev_m = False
        return outp

    own = transitions(rs, match)

    # member-way recursive unfiltered mods: its own visibility
    # transitions + its node children's ALL timestamps windowed over the
    # way's VISIBLE versions (null filter)
    way_rec = set(transitions(ws, lambda v: v["visible"]))
    for k, wv in enumerate(ws):
        if not wv["visible"]:
            continue
        hi = wts[k + 1] if k + 1 < len(ws) else 2**62
        for r in wv["refs"]:
            for nv in node_vs.get(r["ref"], []):
                nt = unix(nv["ts"])
                if wts[k] <= nt <= hi:
                    way_rec.add(nt)

    member_mods = {
        ("node", nid): [unix(v["ts"]) for v in vs]
        for nid, vs in node_vs.items()
    }
    member_mods[("way", 11)] = sorted(way_rec)

    mods = set(own)
    for k, v in enumerate(rs):
        if not match(v):
            continue
        hi = rts[k + 1] if k + 1 < len(rs) else 2**62
        for r in v["refs"]:
            for mt in member_mods.get((r["type"], r["ref"]), []):
                if rts[k] <= mt <= hi:
                    mods.add(mt)
    mods = sorted(mods)

    # changesets: relation put; members setdefault in member-span order
    # (nodes 101.., then way 11 whose own versions and node children all
    # sit on already-claimed or distinct lattices)
    cs = {}
    for v in rs:
        cs[unix(v["ts"])] = v["changeset"]
    for nid in sorted(node_vs):
        for nv in node_vs[nid]:
            cs.setdefault(unix(nv["ts"]), nv["changeset"])
    for wv in ws:
        cs.setdefault(unix(wv["ts"]), wv["changeset"])

    squashed = [
        t for i, t in enumerate(mods)
        if i + 1 >= len(mods) or cs.get(t) != cs.get(mods[i + 1])
    ]

    def asof(versions, t):
        cand = [v for v in versions if unix(v["ts"]) <= t]
        return max(cand, key=lambda v: (unix(v["ts"]), v["version"])) if cand else None

    def node_pt(nid, t):
        v = asof(node_vs.get(nid, []), t)
        if v is None:
            return None  # not yet born: component skipped
        if not v["visible"] or v["lon"] is None:
            return ("emptyPoint",)
        return ("Point", (v["lon"], v["lat"]))

    def way_g(t):
        v = asof(ws, t)
        if v is None:
            return None
        if not v["visible"]:
            return ("LineString", ())
        pts = []
        for r in v["refs"]:
            p = node_pt(r["ref"], t)
            if p is None or p[0] == "emptyPoint":
                if p == ("emptyPoint",):
                    continue
                continue
            pts.append(p[1])
        if len(pts) >= 2:
            return ("LineString", tuple(pts))
        if len(pts) == 1:
            return ("Point", pts[0])
        return ("emptyPoint",)

    def gc(v, t):
        comps = []
        for r in v["refs"]:
            if r["type"] == "node":
                c = node_pt(r["ref"], t)
            elif r["type"] == "way" and r["ref"] == 11:
                c = way_g(t)
            else:
                c = None  # missing member
            if c is not None:
                comps.append(c)
        return ("GC", tuple(comps))

    out = {}
    prev = None
    for t in squashed:
        if t >= t1:
            break
        v = asof(rs, t)
        if v is None:
            continue
        if not v["visible"] or (
            key_filter is not None and key_filter not in (v["tags"] or {})
        ):
            if prev is not None and "DELETION" not in prev[2]:
                out[t] = (["DELETION"],
                          v["changeset"] if not v["visible"] else cs.get(t),
                          prev[0]["version"], v["version"],
                          tuple(sorted((v["tags"] or {}).items())))
                prev = (v, None, {"DELETION"})
            continue
        g = gc(v, t)
        if prev is None or "DELETION" in prev[2]:
            types = {"CREATION"}
            bver = prev[0]["version"] if prev else None
        else:
            types = set()
            if (prev[0].get("tags") or {}) != (v.get("tags") or {}):
                types.add("TAG_CHANGE")
            if prev[1] != g:
                types.add("GEOMETRY_CHANGE")
            bver = prev[0]["version"]
        out[t] = (sorted(types), cs.get(t), bver, v["version"],
                  tuple(sorted((v["tags"] or {}).items())))
        prev = (v, g, types)
    return out


if HAVE_HYP:
    crel_way_hist = st.lists(
        st.tuples(
            st.integers(1, 4),
            st.booleans(),
            st.lists(st.integers(101, 103), min_size=0, max_size=4),
        ),
        min_size=1,
        max_size=3,
    )

    @settings(max_examples=120 * _PROP_SCALE, deadline=None)
    @given(
        rel_hist_strategy,
        crel_way_hist,
        st.lists(cmember_hist, min_size=2, max_size=2),
        st.integers(1, 40),
        st.sampled_from([None, "kind", "note"]),
    )
    def test_relation_contributions_match_independent_replay(
        rel_hist, way_hist, node_hists, t1_steps, key_filter
    ):
        from oshdb_spark.kernels.contribution import _emit_doc_contributions

        doc, rvs, wvs, node_vs = _build_rel_doc_contrib(
            rel_hist, way_hist, node_hists
        )
        t0 = BASE - 1
        t1 = BASE + t1_steps * STEP + 1
        flt = None
        if key_filter is not None:
            flt = lambda v, et, eid: key_filter in (v.get("tags") or {})  # noqa: E731

        out = []
        _emit_doc_contributions(doc, t0, t1, AOI(), flt, DECIDER, True, out)
        got = {}
        for r in out:
            assert r[0] not in got
            got[r[0]] = (r[3], r[4], r[6], r[7],
                         tuple(sorted((r[9] or {}).items())))

        want = _replay_rel_contribs(rvs, wvs, node_vs, t1, key_filter)
        assert got == want
