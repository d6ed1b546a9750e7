"""Per-doc temporal reconstruction — the engine's core kernel logic.

Re-implements, from observed semantics, the reference's:

- as-of version lookup            (osh/OSHEntities.java:36-86 getByTimestamps)
- filter-aware modification ts    (OSHEntities.java:287-303: all matching
  version timestamps plus, per run of non-matching versions that follows a
  match, the first timestamp of the run — the "transition out" point)
- member-validity-windowed child modification timestamps for ways and
  relations (OSHEntities.java:315-478): each child's own modification
  timestamps clipped to the union of [thisT, nextT] windows (upper bound
  INCLUSIVE) during which a visible+matching parent version references it
- changeset-timestamp map         (OSHEntities.java:115-170; parent `put`
  wins over child `putIfAbsent`)
- changeset squashing             (OSHEntities.java:240-267: of each
  consecutive same-changeset run keep only the LAST timestamp)
- the snapshot iteration          (celliterator/CellIterator.java:181-347)
- the contribution state machine  (CellIterator.java:437-712)

These functions operate on plain python dicts (one version = one dict with
keys version/visible/ts/changeset/uid/tags/lon/lat/refs, ts as unix
seconds) and are invoked per doc from Arrow-batched kernels; hot paths use
numpy (searchsorted as-of alignment).

A `version filter` is a callable(version_dict) -> bool, or None.
"""

from __future__ import annotations

import bisect

import numpy as np

INF = 2**62  # stand-in for OSHDBTimestamp(Long.MAX_VALUE)


def sort_versions(versions: list[dict]) -> list[dict]:
    """Oldest-first by (ts, version)."""
    return sorted(versions, key=lambda v: (v["ts"], v["version"]))


def asof_index(version_ts: np.ndarray, t: int) -> int:
    """Index of latest version with ts <= t, or -1."""
    return int(np.searchsorted(version_ts, t, side="right")) - 1


def get_by_timestamps(versions: list[dict], ts_list: list[int]) -> dict[int, dict]:
    """{requested_ts: version as-of} — requested ts before the first
    version are absent (OSHEntities.java:41-60)."""
    vts = np.array([v["ts"] for v in versions], dtype=np.int64)
    out = {}
    idx = np.searchsorted(vts, np.asarray(ts_list, dtype=np.int64), side="right") - 1
    for t, i in zip(ts_list, idx):
        if i >= 0:
            out[t] = versions[int(i)]
    return out


def _matches(v: dict, flt) -> bool:
    return bool(v["visible"]) and (flt is None or flt(v))


def own_mod_timestamps(versions: list[dict], flt=None) -> list[int]:
    """Filter-aware own modification timestamps, oldest-first."""
    out: list[int] = []
    run_start: int | None = None  # first ts of the current non-match run
    prev_matched = False
    for v in versions:  # oldest-first
        if _matches(v, flt):
            out.append(v["ts"])
            prev_matched = True
            run_start = None
        else:
            if prev_matched:
                run_start = v["ts"]
                out.append(run_start)
            prev_matched = False
    return out


def _member_windows(versions: list[dict], flt, member_types: set[str]):
    """{(type, id): [(fromTs, toTs_inclusive), ...]} membership validity
    windows, oldest-first (OSHEntities.java:335-367, 415-450)."""
    windows: dict[tuple[str, int], list[list[int]]] = {}
    # iterate newest-first like the reference; merge adjacent intervals
    next_t = INF
    for v in reversed(versions):
        this_t = v["ts"]
        if not _matches(v, flt):
            next_t = this_t
            continue
        for r in v.get("refs") or []:
            rt = r["type"]
            if rt not in member_types:
                continue
            key = (rt, r["ref"])
            stack = windows.setdefault(key, [])
            if stack and stack[-1][0] == next_t:
                stack[-1][0] = this_t  # merge consecutive intervals
            else:
                stack.append([this_t, next_t])
        next_t = this_t
    # stacks were built newest-window-first with [from, to]; reverse
    return {k: [(a, b) for a, b in reversed(s)] for k, s in windows.items()}


def recursive_mod_timestamps_unfiltered(
    member: dict, members_by_key: dict | None = None
) -> list[int]:
    """A member's own modification timestamps incl. ITS children, oldest
    first, unfiltered (OSHEntities.java getModificationTimestamps(osh))."""
    versions = sort_versions(member["versions"])
    if member.get("entity_type") == "node":
        # node variant adds ALL version timestamps, even invisible ones
        # (OSHEntities.java getModificationTimestamps(OSHNode, recurse))
        out = [v["ts"] for v in versions]
    else:
        # way variant routes through the null-filter transition logic
        # (_getModificationTimestamps(osh, recurse, null))
        out = own_mod_timestamps(versions, None)
    if member.get("entity_type") == "way" and members_by_key:
        win = _member_windows(versions, None, {"node"})
        extra = set()
        for key, windows in win.items():
            child = members_by_key.get(key)
            if child is None:
                continue
            cts = [v["ts"] for v in sort_versions(child["versions"])]
            extra |= set(_select_in_windows(cts, windows))
        out = sorted(set(out) | extra)
    return out


def _select_in_windows(child_ts: list[int], windows: list[tuple[int, int]]) -> list[int]:
    """Child timestamps falling in any [from, to]-inclusive window
    (the iterator walk in OSHEntities.java:371-391)."""
    sel = []
    for t in child_ts:
        for a, b in windows:
            if a <= t <= b:
                sel.append(t)
                break
    return sel


def mod_timestamps(
    entity_type: str,
    versions: list[dict],
    members: list[dict] | None,
    flt=None,
) -> list[int]:
    """Filter-aware modification timestamps incl. member recursion,
    oldest-first (dispatch of OSHEntities.java:268-478)."""
    versions = sort_versions(versions)
    own = own_mod_timestamps(versions, flt)
    if entity_type == "node" or not members:
        return own
    members_by_key = {(m["entity_type"], m["id"]): m for m in members}
    member_types = {"node"} if entity_type == "way" else {"node", "way"}
    windows = _member_windows(versions, flt, member_types)
    result = set(own)
    for key, wins in windows.items():
        child = members_by_key.get(key)
        if child is None:
            continue  # missing members tolerated (redaction case)
        cts = recursive_mod_timestamps_unfiltered(child, members_by_key)
        result |= set(_select_in_windows(cts, wins))
    return sorted(result)


def changeset_timestamps(
    entity_type: str, versions: list[dict], members: list[dict] | None
) -> dict[int, int]:
    """ts → changeset id; parent's own versions win over children
    (OSHEntities.java:115-170)."""
    result: dict[int, int] = {}
    for v in sort_versions(versions):
        result[v["ts"]] = v["changeset"]  # put (overwrite)
    if members:
        members_by_key = {(m["entity_type"], m["id"]): m for m in members}
        for m in members:
            if m["entity_type"] == "way":
                # way child: own versions + its node children
                for v in sort_versions(m["versions"]):
                    result.setdefault(v["ts"], v["changeset"])
                for r_key in {
                    (r["type"], r["ref"])
                    for v in m["versions"]
                    for r in (v.get("refs") or [])
                }:
                    child = members_by_key.get(r_key)
                    if child:
                        for v in sort_versions(child["versions"]):
                            result.setdefault(v["ts"], v["changeset"])
            else:
                for v in sort_versions(m["versions"]):
                    result.setdefault(v["ts"], v["changeset"])
    return result


def squash_by_changeset(mod_ts: list[int], cs_map: dict[int, int]) -> list[int]:
    """Keep only the last timestamp of each consecutive same-changeset run
    (OSHEntities.java:240-267)."""
    if len(mod_ts) <= 1:
        return list(mod_ts)
    out = []
    next_cs = object()  # sentinel != any changeset
    for t in reversed(mod_ts):  # newest-first like the reference
        cs = cs_map.get(t)
        if cs != next_cs:
            out.append(t)
        next_cs = cs
    return list(reversed(out))


def query_timestamps(
    requested: list[int], mod_ts: list[int]
) -> dict[int, list[int]]:
    """Map each requested snapshot timestamp to either a fresh geometry
    query or carry it under the previous query key when nothing changed
    (the queryTs optimization, CellIterator.java:217-240). Requested
    timestamps before the first modification are dropped."""
    out: dict[int, list[int]] = {}
    j = 0
    last_key = None
    for t in requested:
        need = False
        while j < len(mod_ts) and mod_ts[j] <= t:
            need = True
            j += 1
        if need:
            out[t] = []
            last_key = t
        elif last_key is not None:
            out[last_key].append(t)
    return out
