"""Contribution kernel: one row per modification of each entity.

Semantics ≙ CellIterator.iterateByContribution
(oshdb-util/.../celliterator/CellIterator.java:437-712):

- modification timestamps = filter-aware own+member timestamps, squashed
  by changeset (OSHEntities.java:240-267)
- walk states oldest→newest carrying `prev`; emit per state:
  * DELETION when visibility lost / filter no longer matches / geometry
    left the AOI (clipped empty) — each only if prev wasn't already a
    DELETION (ref :533-552, 578-595, 625-639)
  * CREATION when no prev or prev was a DELETION (ref :640-642)
  * else TAG_CHANGE on tag diff, GEOMETRY_CHANGE on exact clipped-geometry
    inequality (ref :649-665; JTS equalsExact ≙ geo.geom.geoms_equal)
- requested interval [first,last) half-open
  (OSHDBTimestampInterval.java:30-33); states before the interval are
  processed but output-suppressed (`skipOutput`, ref :510-531); states at/
  after the interval end abort the walk
- contributor attribution: the entity's own uid if the entity itself
  changed at t, else the uid of the first changed child member
  (object/OSMContribution.java:211-257)
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo import cells
from ..geo import geom as G
from ..model import schemas
from .aoi import AOI
from .filters import compile_python
from .geometry_builder import DEFAULT_INTERPRETER, build_geometry
from .snapshot import (
    _FP,
    _doc_rel_vec,
    _doc_structs,
    _empty_frame,
    _flat_node_arrays,
    _normalize_ts,
    _point_wkb_vec,
    _points_in_aoi,
    prepared_docs,
)
from .temporal import (
    changeset_timestamps,
    get_by_timestamps,
    mod_timestamps,
    squash_by_changeset,
)

_CONTRIB_COLS = [f.name for f in schemas.CONTRIBUTIONS.fields]

# contribution-type list per (creation, deletion, tag, geom) bit key
_TYPE_LUT = {}
for _k in range(16):
    _t = []
    if _k & 1:
        _t.append("CREATION")
    if _k & 2:
        _t.append("DELETION")
    if _k & 4:
        _t.append("GEOMETRY_CHANGE")
    if _k & 8:
        _t.append("TAG_CHANGE")
    _TYPE_LUT[_k] = sorted(_t)


def _nodes_contrib_vec(
    pdf: pd.DataFrame, t_first: int, t_last: int, aoi: AOI, with_geometry: bool
) -> pd.DataFrame:
    """Vectorized contribution kernel for member-less node docs.

    The reference's sequential prev-carry walk (CellIterator.java:437-712)
    reduces, for nodes, to lag comparisons over the per-doc state list:
      state list = filter-aware modification timestamps
                   (match ∨ previous-version-matched, OSHEntities.java:287-303)
                   squashed by changeset (:240-267)
      present(i) = visible ∧ match ∧ inside-AOI
      CREATION   = present ∧ ¬present(prev)      (incl. no prev)
      DELETION   = ¬present ∧ present(prev)
      TAG/GEOM   = present ∧ present(prev) ∧ diff (also emits a row when
                   nothing changed — empty type set, as the reference does)
    Emission restricted to [t_first, t_last); earlier states still feed the
    lag (the reference's skipOutput processing, :510-531).
    """
    fa = _flat_node_arrays(pdf)
    starts = fa["starts"]
    vis, match, ts = fa["visible"], fa["match"], fa["ts"]
    doc_idx, combined = fa["doc_idx"], fa["combined"]
    n = len(ts)
    if n == 0:
        return _empty_frame(_CONTRIB_COLS)

    first_in_doc = np.zeros(n, dtype=bool)
    first_in_doc[starts] = True

    # 1. filter-aware state mask: match OR previous-version-matched
    m = vis & match
    pm = np.empty(n, dtype=bool)
    pm[0] = False
    pm[1:] = m[:-1]
    pm[first_in_doc] = False
    keep = m | pm
    kept = np.nonzero(keep)[0]
    if len(kept) == 0:
        return _empty_frame(_CONTRIB_COLS)

    # 2. changeset squash among kept states (keep LAST of each run)
    kd = doc_idx[kept]
    kcs = fa["changeset"][kept]
    drop = np.zeros(len(kept), dtype=bool)
    if len(kept) > 1:
        drop[:-1] = (kd[:-1] == kd[1:]) & (kcs[:-1] == kcs[1:])
    state = kept[~drop]

    # 3. as-of version per state ts (same-ts duplicates resolve to last)
    a = np.searchsorted(combined, combined[state], side="right") - 1
    sdoc = doc_idx[state]
    s_first = np.ones(len(state), dtype=bool)
    s_first[1:] = sdoc[1:] != sdoc[:-1]
    t_arr = ts[state]

    # presence
    doc_rel = _doc_rel_vec(pdf, aoi)
    rel_s = doc_rel[sdoc]
    lon_d = fa["lon"][a] * 1e-7
    lat_d = fa["lat"][a] * 1e-7
    pres = vis[a] & match[a] & (rel_s > 0)
    bnd = pres & (rel_s == 2)
    if bnd.any():
        sel = np.nonzero(bnd)[0]
        pres[sel] &= _points_in_aoi(lon_d[sel], lat_d[sel], aoi)

    # the reference walk SKIPS states before the interval except the single
    # boundary state whose next state is inside (skipOutput processing,
    # CellIterator.java:510-531) — so the prev-carry starts at B = (first
    # in-interval state) - 1, clamped to the doc's first state.
    ns = len(state)
    sidx = np.arange(ns, dtype=np.int64)
    inb = (t_arr >= t_first) & (t_arr < t_last)
    group_starts = np.nonzero(s_first)[0]
    fi_group = np.minimum.reduceat(np.where(inb, sidx, ns + 5), group_starts)
    b_group = np.maximum(fi_group - 1, group_starts)
    group_of = np.cumsum(s_first) - 1
    bmap = b_group[group_of]

    valid_prev = ~s_first & (sidx - 1 >= bmap)
    ppres = np.empty(ns, dtype=bool)
    ppres[0] = False
    ppres[1:] = pres[:-1]
    ppres &= valid_prev

    # canonical tag compare (dict-equality parity: order-insensitive)
    uniq, inv = np.unique(fa["tags"].astype(str), return_inverse=True)
    canon_u = np.array(
        [json.dumps(json.loads(x), sort_keys=True) for x in uniq], dtype=object
    )
    parsed_u = np.array([json.loads(x) for x in uniq], dtype=object)
    canon = canon_u[inv]

    creation = pres & ~ppres
    deletion = ~pres & ~s_first & ppres
    both = pres & ppres

    # `prev` in the reference is the last EMITTED state (consecutive
    # invisible states don't advance it, CellIterator.java:500-697):
    # emitted = present states + first non-present after a present one;
    # states before the per-doc walk start B never emit.
    emitted_any = (creation | deletion | both) & (sidx >= bmap)
    e_shift = np.empty(ns, dtype=np.int64)
    e_shift[0] = -1
    e_shift[1:] = np.where(emitted_any[:-1], sidx[:-1], -1)
    e_shift[s_first] = -1
    big = ns + 2
    enc = sdoc * big + (e_shift + 1)
    acc = np.maximum.accumulate(enc)
    has_prev_emit = (acc // big == sdoc) & (acc % big > 0)
    prev_ptr = np.where(has_prev_emit, acc % big - 1, 0)
    pa = a[prev_ptr]  # version index of the prev (last-emitted) state

    tag_chg = both & (canon[a] != canon[pa])
    geom_chg = both & (
        (fa["lon"][a] != fa["lon"][pa]) | (fa["lat"][a] != fa["lat"][pa])
    )
    emit = emitted_any & (t_arr >= t_first) & (t_arr < t_last)
    sel = np.nonzero(emit)[0]
    if len(sel) == 0:
        return _empty_frame(_CONTRIB_COLS)

    key = (
        creation[sel].astype(np.int8)
        + 2 * deletion[sel].astype(np.int8)
        + 4 * geom_chg[sel].astype(np.int8)
        + 8 * tag_chg[sel].astype(np.int8)
    )
    types = [_TYPE_LUT[int(k)] for k in key]

    asel, pasel = a[sel], pa[sel]
    has_prev = has_prev_emit[sel]
    prev_present = (pres[prev_ptr] & has_prev_emit)[sel]
    cur_present = pres[sel]

    if with_geometry:
        wkb_cur = np.array(
            _point_wkb_vec(fa["lon"][asel] * 1e-7, fa["lat"][asel] * 1e-7),
            dtype=object,
        )
        wkb_prev = np.array(
            _point_wkb_vec(fa["lon"][pasel] * 1e-7, fa["lat"][pasel] * 1e-7),
            dtype=object,
        )
        geom_after = np.where(cur_present, wkb_cur, None)
        geom_before = np.where(prev_present, wkb_prev, None)
    else:
        geom_after = np.full(len(sel), None, dtype=object)
        geom_before = np.full(len(sel), None, dtype=object)

    tokens = cells.token_of_bboxes(
        pdf["bbox_min_lon"].to_numpy(np.int64),
        pdf["bbox_min_lat"].to_numpy(np.int64),
        pdf["bbox_max_lon"].to_numpy(np.int64),
        pdf["bbox_max_lat"].to_numpy(np.int64),
    )
    ids = pdf["id"].to_numpy(np.int64)
    doc_ids = pdf["doc_id"].to_numpy(object)
    dsel = sdoc[sel]

    tags_after = parsed_u[inv[asel]]
    tags_before = np.where(has_prev, parsed_u[inv[pasel]], None)
    ver_before = np.where(
        has_prev, fa["version"][pasel].astype(object), None
    )

    return pd.DataFrame(
        {
            "ts": t_arr[sel],
            "entity_type": "node",
            "id": ids[dsel],
            "contrib_types": types,
            "changeset": fa["changeset"][asel],
            "contributor_uid": fa["uid"][asel].astype(np.int32),
            "version_before": ver_before,
            "version_after": fa["version"][asel].astype(np.int32),
            "tags_before": tags_before,
            "tags_after": tags_after,
            "geom_before_wkb": geom_before,
            "geom_after_wkb": geom_after,
            "geom_before_clipped_wkb": geom_before,
            "geom_after_clipped_wkb": geom_after,
            "cell": tokens[dsel],
            "doc_id": doc_ids[dsel],
        },
        columns=_CONTRIB_COLS,
    )


def contributions(
    docs: DataFrame,
    interval: tuple[int, int] | list[int],
    bbox=None,
    polygon=None,
    filter_spec=None,
    area_decider=None,
    with_geometry: bool = True,
) -> DataFrame:
    """The contribution view (schema model.schemas.CONTRIBUTIONS).

    Member-less node docs run through the vectorized numpy path
    (_nodes_contrib_vec); ways/relations/python-filtered docs go through
    the general per-doc path."""
    if isinstance(interval, (list, tuple)) and len(interval) >= 2:
        t_first, t_last = int(min(interval)), int(max(interval))
    else:
        raise ValueError("interval must provide (first, last) timestamps")
    aoi = AOI(bbox=bbox, polygon=polygon)
    decider = area_decider or DEFAULT_INTERPRETER
    flt = compile_python(filter_spec)
    typed = prepared_docs(docs, filter_spec, aoi, fast_arrays=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fast_mask = pdf["vts"].notna().to_numpy()
            frames = []
            if fast_mask.any():
                frames.append(
                    _nodes_contrib_vec(
                        pdf[fast_mask], t_first, t_last, aoi, with_geometry
                    )
                )
            if (~fast_mask).any():
                out: list[tuple] = []
                for row in pdf[~fast_mask].to_dict("records"):
                    _emit_doc_contributions(
                        row, t_first, t_last, aoi, flt, decider, with_geometry, out
                    )
                frames.append(pd.DataFrame(out, columns=_CONTRIB_COLS))
            yield pd.concat(frames, ignore_index=True) if frames else _empty_frame(_CONTRIB_COLS)

    return typed.mapInPandas(kernel, schema=schemas.CONTRIBUTIONS)


def _tags_equal(a: dict | None, b: dict | None) -> bool:
    return (a or {}) == (b or {})


def _contributor_uid(entity_type, versions_asof, t, v, members_by_key):
    """OSMContribution.getContributorUserId (ref :211-257): entity's uid if
    the entity version changed exactly at t, else uid of the first child
    whose own version timestamp equals t (recursing way→nodes)."""
    if v["ts"] == t:
        return v["uid"]
    for m in members_by_key.values():
        for mv in m["versions"]:
            if mv["ts"] == t:
                return mv["uid"]
    return v["uid"]


def _emit_doc_contributions(
    row, t_first, t_last, aoi, flt, decider, with_geometry, out
):
    entity_type = row["entity_type"]
    eid = row["id"]
    versions, members_by_key, fbbox, token = _doc_structs(row)
    versions = _normalize_ts(versions)
    for m in members_by_key.values():
        _normalize_ts(m["versions"])

    rel = aoi.relation_of_bbox(fbbox) if fbbox is not None else (1 if aoi.is_world else 0)
    if rel == 0:
        return
    fully_inside = rel == 1

    vflt = (lambda v: flt(v, entity_type, eid)) if flt else None
    if vflt is not None and not any(v["visible"] and vflt(v) for v in versions):
        return

    members = list(members_by_key.values())
    cs_map = changeset_timestamps(entity_type, versions, members)
    mod_ts = squash_by_changeset(
        mod_timestamps(entity_type, versions, members, vflt), cs_map
    )
    if not mod_ts or not (t_last >= mod_ts[0] and t_first <= mod_ts[-1]):
        return  # history fully outside interval (inclusive intersects)

    asof = get_by_timestamps(versions, mod_ts)

    prev = None  # (version_dict, geom, clipped, contrib_types)

    def emit(t, types, v_after, v_before, geom_after, clip_after, geom_before,
             clip_before, changeset, skip):
        nonlocal prev
        prev = (v_after, geom_after, clip_after, types)
        if skip:
            return
        uid = _contributor_uid(entity_type, asof, t, v_after, members_by_key)
        out.append(
            (
                t,
                entity_type,
                eid,
                sorted(types),
                changeset,
                uid,
                v_before["version"] if v_before else None,
                v_after["version"],
                (v_before.get("tags") or {}) if v_before else None,
                v_after.get("tags") or {},
                G.to_wkb(geom_before) if with_geometry else None,
                G.to_wkb(geom_after) if with_geometry else None,
                G.to_wkb(clip_before) if with_geometry else None,
                G.to_wkb(clip_after) if with_geometry else None,
                token,
                row["doc_id"],
            )
        )

    for idx, t in enumerate(mod_ts):
        if t not in asof:
            continue
        v = asof[t]
        skip_output = False
        next_t = mod_ts[idx + 1] if idx + 1 < len(mod_ts) else None

        in_interval = t_first <= t < t_last
        if not in_interval:
            if t >= t_last:
                break  # future of the interval → abort (ref :520-521)
            if next_t is None or not (t_first <= next_t < t_last):
                continue  # next state also outside → skip entirely
            skip_output = True  # process for prev-carry, suppress output

        if not v["visible"]:
            if prev is not None and "DELETION" not in prev[3]:
                emit(
                    t, {"DELETION"}, v, prev[0], None, None, prev[1], prev[2],
                    v["changeset"], skip_output,
                )
            continue

        if vflt is not None and not vflt(v):
            if prev is not None and "DELETION" not in prev[3]:
                emit(
                    t, {"DELETION"}, v, prev[0], None, None, prev[1], prev[2],
                    cs_map.get(t), skip_output,
                )
            continue

        geom = build_geometry(entity_type, v, t, members_by_key, decider)
        clipped = geom if fully_inside else aoi.clip(geom)

        if not fully_inside and (clipped is None or G.is_empty(clipped)):
            # left the AOI (or invalid geometry) → DELETION (ref :625-639)
            if prev is not None and "DELETION" not in prev[3]:
                emit(
                    t, {"DELETION"}, v, prev[0], None, None, prev[1], prev[2],
                    cs_map.get(t), skip_output,
                )
            continue

        if prev is None or "DELETION" in prev[3]:
            types = {"CREATION"}
            v_before, g_before, c_before = None, None, None
            if prev is not None:
                v_before, g_before, c_before = prev[0], prev[1], prev[2]
            emit(
                t, types, v, v_before, geom, clipped, g_before, c_before,
                cs_map.get(t), skip_output,
            )
            continue

        types = set()
        if not _tags_equal(prev[0].get("tags"), v.get("tags")):
            types.add("TAG_CHANGE")
        if not G.geoms_equal(
            prev[2] if prev[2] is not None else prev[1],
            clipped if clipped is not None else geom,
        ):
            types.add("GEOMETRY_CHANGE")
        emit(
            t, types, v, prev[0], geom, clipped, prev[1], prev[2],
            cs_map.get(t), skip_output,
        )
