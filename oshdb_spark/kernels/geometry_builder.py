"""Per-entity geometry construction (reference: OSHDBGeometryBuilder.java).

Builds the engine's lightweight geometries (geo/geom.py) from an entity
version + as-of-resolved member states:

- node  → Point (empty Point when invisible)         (ref :74-79)
- way   → Polygon iff areaDecider.isArea ∧ ≥4 coords ∧ closed, else
          LineString (≥2) / Point (1) / empty Point (0)  (ref :81-110)
- relation → MultiPolygon assembly when isArea (ring joining by endpoint
          node-id matching, inner-in-outer matching), else
          GeometryCollection of member geometries       (ref :112-301)

The reference's JTS ``buffer(0)`` cleanup of self-touching rings
(ref :269-285) is reproduced structurally by ``split_self_touching_ring``
below: rings are split at repeated vertices into simple sub-rings before
inner-in-outer assignment (no GEOS in the runtime, same observable
result for the ported robustness suites).

Tag interpreters mirror taginterpreter/BaseTagInterpreter.java:18-158 on
string tags instead of integer dictionary ids.
"""

from __future__ import annotations

import numpy as np

from ..geo import geom as G
from .temporal import get_by_timestamps, sort_versions

SCALE = 1e-7  # fixed-point long → degrees (OSHDB.GEOM_PRECISION_TO_LONG)


class TagInterpreter:
    """Area-decider protocol (taginterpreter/TagInterpreter.java)."""

    def is_area(self, entity_type: str, tags: dict, refs: list) -> bool:
        raise NotImplementedError

    def is_outer_role(self, role: str) -> bool:
        # empty role historically means outer (BaseTagInterpreter.java:139-151)
        return role in ("outer", "")

    def is_inner_role(self, role: str) -> bool:
        return role == "inner"


class DefaultTagInterpreter(TagInterpreter):
    """Full polygon-features area rules (the corpus the reference loads
    from polygon-features.json, DefaultTagInterpreter.java:80-120, with
    BaseTagInterpreter.java evaluate{Way,Relation}ForArea semantics):

    - way:      area=no override, else any tag matching its corpus rule
                (all / whitelist∪{no} / blacklist)
    - relation: type ∈ {multipolygon, boundary} ONLY (hardcoded relation
                area tags, DefaultTagInterpreter.java:122-128 — other
                corpus keys do NOT make a relation an area)
    """

    RELATION_AREA_TYPES = frozenset({"multipolygon", "boundary"})

    def _tags_area(self, tags: dict) -> bool:
        from .polygon_features import POLYGON_FEATURES

        if tags.get("area") == "no":
            return False
        for k, v in tags.items():
            rule = POLYGON_FEATURES.get(k)
            if rule is None:
                continue
            mode, values = rule
            if mode == "all":
                if v != "no":
                    return True
            elif mode == "whitelist":
                if v in values:
                    return True
            else:  # blacklist
                if v not in values:
                    return True
        return False

    def is_area(self, entity_type: str, tags: dict, refs: list) -> bool:
        if entity_type == "node":
            return False
        if entity_type == "way":
            # closed-ring precheck on member ids (BaseTagInterpreter.java:82-86)
            if len(refs) < 4 or refs[0]["ref"] != refs[-1]["ref"]:
                return False
            return self._tags_area(tags)
        # relation (no area=no check, BaseTagInterpreter.java:63-73)
        return tags.get("type") in self.RELATION_AREA_TYPES


class AlwaysArea(TagInterpreter):
    """FakeTagInterpreterAreaAlways equivalent (geometry test isolation)."""

    def is_area(self, entity_type, tags, refs):
        return entity_type != "node"


class NeverArea(TagInterpreter):
    def is_area(self, entity_type, tags, refs):
        return False


DEFAULT_INTERPRETER = DefaultTagInterpreter()


def _resolve_ref_coords(refs, members_by_key, t):
    """As-of node coordinates for a way's refs, skipping missing/invisible
    members (ref :87-93: filter nonNull + isVisible)."""
    coords = []
    for r in refs or []:
        m = members_by_key.get(("node", r["ref"]))
        if m is None:
            continue
        v = _asof(m, t)
        if v is None or not v["visible"] or v["lon"] is None:
            continue
        coords.append((v["lon"] * SCALE, v["lat"] * SCALE))
    return coords


def _asof(member, t):
    versions = member.get("_sorted")
    if versions is None:
        versions = sort_versions(member["versions"])
        member["_sorted"] = versions
        # cache the ts array once: rebuilding it per (member, t) lookup
        # dominated the general path's as-of cost
        member["_vts"] = np.array([v["ts"] for v in versions], dtype=np.int64)
    i = int(np.searchsorted(member["_vts"], t, side="right")) - 1
    return versions[i] if i >= 0 else None


def build_geometry(
    entity_type: str,
    version: dict,
    t: int,
    members_by_key: dict,
    area_decider: TagInterpreter = DEFAULT_INTERPRETER,
):
    """Geometry of one entity version as of time t (ref getGeometry)."""
    if entity_type == "node":
        if not version["visible"]:
            return ("Point", None)
        return G.point(version["lon"] * SCALE, version["lat"] * SCALE)

    if entity_type == "way":
        if not version["visible"]:
            return ("LineString", np.empty((0, 2)))
        coords = _resolve_ref_coords(version.get("refs"), members_by_key, t)
        if area_decider.is_area("way", version.get("tags") or {}, version.get("refs") or []):
            if len(coords) >= 4 and coords[0] == coords[-1]:
                return G.polygon([coords])
            # doesn't form a linear ring — fall back to linestring (ref :96-98)
        if len(coords) >= 2:
            return G.linestring(coords)
        if len(coords) == 1:
            return G.point(*coords[0])
        return ("Point", None)

    # relation
    if not version["visible"]:
        return ("GeometryCollection", [])
    if area_decider.is_area("relation", version.get("tags") or {}, []):
        try:
            mp = _multipolygon(version, t, members_by_key, area_decider)
            if mp is not None and not G.is_empty(mp):
                return mp
        except (ValueError, IndexError):
            pass  # fall back to geometry collection (ref :126-131)
    return _geometry_collection(version, t, members_by_key, area_decider)


def _geometry_collection(version, t, members_by_key, area_decider):
    """Member geometries as-of t; missing members tolerated (ref :140-185)."""
    geoms = []
    for r in version.get("refs") or []:
        m = members_by_key.get((r["type"], r["ref"]))
        if m is None:
            continue  # incomplete extract
        v = _asof(m, t)
        if v is None:
            continue  # redacted data case (ref :154-163)
        geoms.append(build_geometry(r["type"], v, t, members_by_key, area_decider))
    return ("GeometryCollection", geoms)


def _member_lines(version, t, members_by_key, role_pred):
    """Visible way-member node chains as-of t, keeping node ids for ring
    joining (ref :193-218)."""
    lines = []
    for r in version.get("refs") or []:
        if r["type"] != "way" or not role_pred(r.get("role") or ""):
            continue
        m = members_by_key.get(("way", r["ref"]))
        if m is None:
            continue
        wv = _asof(m, t)
        if wv is None or not wv["visible"]:
            continue
        chain = []
        for nd in wv.get("refs") or []:
            nm = members_by_key.get(("node", nd["ref"]))
            if nm is None:
                continue
            nv = _asof(nm, t)
            if nv is None or not nv["visible"] or nv["lon"] is None:
                continue
            chain.append((nd["ref"], nv["lon"] * SCALE, nv["lat"] * SCALE))
        if chain:
            lines.append(chain)
    return lines


def join_rings(lines: list[list[tuple]]) -> list[list[tuple]]:
    """Join way fragments into rings by endpoint NODE-ID matching — the
    reference's 4-orientation-case algorithm (ref join(), :304-362)."""
    ways = [list(l) for l in lines]
    joined = []
    while ways:
        current = ways.pop(0)
        joined.append(current)
        while ways:
            first_id, last_id = current[0][0], current[-1][0]
            if first_id == last_id:
                break  # ring closed
            joinable = False
            for i, what in enumerate(ways):
                if last_id == what[0][0]:
                    current.extend(what[1:])
                elif first_id == what[-1][0]:
                    current[:0] = what[:-1]
                elif last_id == what[-1][0]:
                    current.extend(reversed(what[:-1]))
                elif first_id == what[0][0]:
                    current[:0] = list(reversed(what[1:]))
                else:
                    continue
                ways.pop(i)
                joinable = True
                break
            if not joinable:
                break  # dangling way / unclosed ring
    return joined


def split_self_touching_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a closed ring at repeated (exact-equality) vertices into
    simple sub-rings — the engine's stand-in for the reference's JTS
    ``buffer(0)`` cleanup of self-touching/figure-8 rings (ref :269-285).
    Degenerate sub-rings (<3 distinct points) are dropped."""
    pts = [tuple(c) for c in np.asarray(ring)[:-1]]
    seen: dict[tuple, int] = {}
    for i, p in enumerate(pts):
        j = seen.get(p)
        if j is not None:
            lobe = pts[j:i]
            rest = pts[:j] + pts[i:]
            out = []
            for sub in (lobe, rest):
                if len(set(sub)) >= 3:
                    out.extend(
                        split_self_touching_ring(
                            np.asarray(sub + [sub[0]], dtype=np.float64)
                        )
                    )
            return out
        seen[p] = i
    if len(set(pts)) < 3:
        return []
    return [np.asarray(pts + [pts[0]], dtype=np.float64)]


def _points_on_ring_boundary(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """True where a point lies exactly on a ring segment (collinear and
    within the segment bbox)."""
    r = np.asarray(ring)
    x0, y0 = r[:-1, 0][None, :], r[:-1, 1][None, :]
    x1, y1 = r[1:, 0][None, :], r[1:, 1][None, :]
    px_, py_ = px[:, None], py[:, None]
    cross = (x1 - x0) * (py_ - y0) - (y1 - y0) * (px_ - x0)
    inbb = (
        (px_ >= np.minimum(x0, x1)) & (px_ <= np.maximum(x0, x1))
        & (py_ >= np.minimum(y0, y1)) & (py_ <= np.maximum(y0, y1))
    )
    return np.any((cross == 0) & inbb, axis=1)


def ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """Exact JTS-contains analog (ref :289-301 prepared contains): no
    inner vertex strictly outside the outer, and at least one strictly
    inside (boundary-only contact is NOT containment)."""
    from ..geo import clip as C

    px, py = inner[:, 0], inner[:, 1]
    strictly_in = C.points_in_ring(px, py, outer)
    on_bnd = _points_on_ring_boundary(px, py, outer)
    if not bool(np.all(strictly_in | on_bnd)):
        return False
    return bool(np.any(strictly_in & ~on_bnd))


def _multipolygon(version, t, members_by_key, area_decider):
    """Multipolygon assembly (ref getMultiPolygonGeometry, :187-301) from
    per-doc nested structures; the assembly itself is shared with the
    vectorized relation kernel via assemble_multipolygon."""
    outer_lines = _member_lines(version, t, members_by_key, area_decider.is_outer_role)
    inner_lines = _member_lines(version, t, members_by_key, area_decider.is_inner_role)
    return assemble_multipolygon(outer_lines, inner_lines)


def assemble_multipolygon(outer_lines, inner_lines):
    """Multipolygon assembly from resolved member chains ([(node_id, x,
    y), ...] per visible way member, ref order): ring joining by node-id
    endpoint matching, self-touching rings split into simple sub-rings
    (≙ buffer(0) cleanup), inner rings assigned to their containing outer
    by exact containment. Unmatched inners are dropped (the reference's
    open todo does the same via its filter). Raises ValueError on
    unclosed/short rings (≙ JTS IllegalArgumentException → geometry-
    collection fallback)."""
    outer_raw = [
        np.array([(x, y) for _, x, y in ring]) for ring in join_rings(outer_lines)
    ]
    inner_raw = [
        np.array([(x, y) for _, x, y in ring]) for ring in join_rings(inner_lines)
    ]
    # LinearRing construction fails for unclosed/short rings in JTS → the
    # IllegalArgumentException fallback to geometry collection
    for ring in outer_raw + inner_raw:
        if len(ring) < 4 or tuple(ring[0]) != tuple(ring[-1]):
            raise ValueError("unclosed ring")
    if len(outer_raw) == 1 and len(split_self_touching_ring(outer_raw[0])) == 1:
        # single simple outer: all inners become holes unchecked (ref :253)
        return ("Polygon", [outer_raw[0]] + inner_raw)
    outer_rings = [s for ring in outer_raw for s in split_self_touching_ring(ring)]
    inner_rings = [s for ring in inner_raw for s in split_self_touching_ring(ring)]
    if not outer_rings:
        raise ValueError("no valid outer ring")
    polys = []
    for outer in outer_rings:
        holes = [
            inner for inner in inner_rings if ring_contains_ring(outer, inner)
        ]
        polys.append([outer] + holes)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)
