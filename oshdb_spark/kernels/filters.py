"""Declarative OSM entity filters, compiled to BOTH Catalyst predicates
(doc-level pre-filter, pushed to the parquet scan) and python callables
(per-version exact filter inside kernels).

Mirrors the reference's two fused predicate chains: cheap OSH-level
``preFilters`` + exact OSM-version ``filters``
(MapReducer.java:148-149,1765-1790, evaluated in
CellIterator.java:199-211,464-476). The doc-level Catalyst predicate is
the analog of the pre-filter: "does ANY version match" — if none do, the
doc is skipped before the Python kernel ever sees it (and, with parquet
column stats, often before the row is even decoded).

Spec grammar (JSON-able tuples):
    ("type_in", [entity_types])           — MapReducer.osmType (:397-401)
    ("tag_key", key)                      — osmTag(key) (:455-467)
    ("tag_eq", key, value)                — osmTag(key,value) (:490-504)
    ("tag_in", key, [values])             — osmTag(key, collection) (:515-549)
    ("tag_regex", key, pattern)           — osmTag(key, Pattern) (:560-585)
    ("tag_any", [(key, value|None), ...]) — osmTag(Collection<OSMTagInterface>)
                                            OR-of-tags (:595-632); a None
                                            value means key-presence
    ("id_in", [ids])
    ("py", callable)                      — osmEntityFilter escape hatch
                                            (kernel-only, no pushdown)

Specs AND together; ("tag_any", ...) is the single OR-of-alternatives
node, mirroring the reference's hasTagValue-OR loop.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def compile_python(spec: list | None):
    """Python per-version filter callable(version_dict, entity_type, id)."""
    if not spec:
        return None
    steps = []
    for s in spec:
        op = s[0]
        if op == "type_in":
            allowed = set(s[1])
            steps.append(lambda v, et, i, a=allowed: et in a)
        elif op == "tag_key":
            k = s[1]
            steps.append(lambda v, et, i, k=k: k in (v.get("tags") or {}))
        elif op == "tag_eq":
            k, val = s[1], s[2]
            steps.append(lambda v, et, i, k=k, val=val: (v.get("tags") or {}).get(k) == val)
        elif op == "tag_in":
            k, vals = s[1], set(s[2])
            steps.append(
                lambda v, et, i, k=k, vals=vals: (v.get("tags") or {}).get(k) in vals
            )
        elif op == "tag_regex":
            k, pat = s[1], re.compile(s[2])
            steps.append(
                lambda v, et, i, k=k, pat=pat: pat.search(
                    (v.get("tags") or {}).get(k) or ""
                )
                is not None
            )
        elif op == "tag_any":
            alts = [(k, val) for k, val in s[1]]
            steps.append(
                lambda v, et, i, alts=alts: any(
                    (k in (v.get("tags") or {}))
                    if val is None
                    else ((v.get("tags") or {}).get(k) == val)
                    for k, val in alts
                )
            )
        elif op == "id_in":
            ids = set(s[1])
            steps.append(lambda v, et, i, ids=ids: i in ids)
        elif op == "py":
            steps.append(s[1])
        else:
            raise ValueError(f"unknown filter op {op}")

    def flt(v, entity_type, eid):
        return all(step(v, entity_type, eid) for step in steps)

    return flt


def _q(x) -> str:
    """SQL single-quoted literal with escaping (tag keys/values may carry
    quotes/backslashes in real OSM data)."""
    return "'" + str(x).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _version_pred_sql(s) -> str | None:
    """SQL predicate over one element `v` of the typed versions array."""
    op = s[0]
    if op == "tag_key":
        return f"map_contains_key(v.tags, {_q(s[1])})"
    if op == "tag_eq":
        return f"v.tags[{_q(s[1])}] = {_q(s[2])}"
    if op == "tag_in":
        vals = ", ".join(_q(x) for x in s[2])
        return f"v.tags[{_q(s[1])}] in ({vals})"
    if op == "tag_regex":
        return f"v.tags[{_q(s[1])}] rlike {_q(s[2])}"
    if op == "tag_any":
        alts = [
            f"map_contains_key(v.tags, {_q(k)})"
            if val is None
            else f"v.tags[{_q(k)}] = {_q(val)}"
            for k, val in s[1]
        ]
        # empty alternative list = constant false, matching compile_python's
        # any([]) — both paths agree that zero alternatives match nothing
        return "(" + " or ".join(alts) + ")" if alts else "false"
    return None


def compile_doc_prefilter(spec: list | None) -> Column | None:
    """Catalyst doc-level pre-filter over typed docs (entity_type, id,
    versions). Conservative: may keep extra docs (the exact per-version
    filter re-checks in the kernel), never drops a matching one."""
    if not spec:
        return None
    conds: list[Column] = []
    for s in spec:
        op = s[0]
        if op == "type_in":
            conds.append(F.col("entity_type").isin(list(s[1])))
        elif op == "id_in":
            conds.append(F.col("id").isin([int(x) for x in s[1]]))
        else:
            p = _version_pred_sql(s)
            if p is not None:
                # "no version matches → skip doc" (CellIterator.java:207-211)
                conds.append(F.expr(f"exists(versions, v -> {p})"))
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
