"""Per-entity geometry construction (reference: OSHDBGeometryBuilder.java).

Builds the engine's lightweight geometries (geo/geom.py) from an entity
version + as-of-resolved member states:

- node  → Point (empty Point when invisible)         (ref :74-79)
- way   → Polygon iff areaDecider.isArea ∧ ≥4 coords ∧ closed, else
          LineString (≥2) / Point (1) / empty Point (0)  (ref :81-110)
- relation → MultiPolygon assembly when isArea (ring joining by endpoint
          node-id matching, inner-in-outer matching), else
          GeometryCollection of member geometries       (ref :112-301)

Divergence from the reference: no GEOS ``buffer(0)`` is available, so the
touching-rings cleanup and TopologyException retry (ref :269-285) are
omitted; invalid self-touching multipolygons are returned un-cleaned.

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
    """Simplified default area rules (the reference loads the full
    polygon-features.json corpus, DefaultTagInterpreter.java:23-37; this
    engine ships a compact all-values rule set + area=no override)."""

    ALL_VALUE_KEYS = {
        "building", "landuse", "leisure", "natural", "amenity", "shop",
        "boundary", "place", "tourism", "historic", "craft", "office",
        "building:part", "military", "aeroway", "area:highway",
    }
    KEY_VALUES = {
        "type": {"multipolygon", "boundary"},
        "highway": {"services", "rest_area", "escape", "pedestrian"},
        "railway": {"station", "turntable", "roundhouse", "platform"},
        "waterway": {"riverbank", "dock", "boatyard", "dam"},
        "barrier": {"city_wall", "hedge", "wall", "toll_booth"},
        "power": {"plant", "substation", "generator", "transformer"},
        "public_transport": {"platform"},
        "man_made": {"storage_tank", "silo", "wastewater_plant", "bridge", "pier"},
        "area": {"yes"},
    }

    def _tags_area(self, tags: dict) -> bool:
        if tags.get("area") == "no":
            return False
        for k, v in tags.items():
            if k in self.ALL_VALUE_KEYS:
                return True
            vs = self.KEY_VALUES.get(k)
            if vs and v in vs:
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
        return self._tags_area(tags)  # relation (no area=no check, ref :63-73)


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
    got = get_by_timestamps(versions, [t])
    return got.get(t)


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


def _multipolygon(version, t, members_by_key, area_decider):
    """Multipolygon assembly (ref getMultiPolygonGeometry, :187-301)."""
    from ..geo import clip as C

    outer_lines = _member_lines(version, t, members_by_key, area_decider.is_outer_role)
    inner_lines = _member_lines(version, t, members_by_key, area_decider.is_inner_role)
    outer_rings = [
        np.array([(x, y) for _, x, y in ring]) for ring in join_rings(outer_lines)
    ]
    inner_rings = [
        np.array([(x, y) for _, x, y in ring]) for ring in join_rings(inner_lines)
    ]
    # LinearRing construction fails for unclosed/short rings in JTS → the
    # IllegalArgumentException fallback to geometry collection
    for ring in outer_rings + inner_rings:
        if len(ring) < 4 or tuple(ring[0]) != tuple(ring[-1]):
            raise ValueError("unclosed ring")
    if len(outer_rings) == 1:
        return ("Polygon", [outer_rings[0]] + inner_rings)
    polys = []
    for outer in outer_rings:
        holes = []
        for inner in inner_rings:
            # inner assigned to the outer that contains it (ref :289-301,
            # prepared contains approximated by all-vertices-inside)
            if bool(np.all(C.points_in_ring(inner[:, 0], inner[:, 1], outer))):
                holes.append(inner)
        polys.append([outer] + holes)
    return ("MultiPolygon", polys)
