"""Snapshot kernel: entity states as-of requested timestamps.

Spark plan shape (designed for 100 TB):

    parquet/iceberg scan of docs
      → Catalyst doc pre-filter (tag existence, type, id — pushed down)
      → JVM typed decode (higher-order fns; no shuffle)
      → JVM doc-bbox summary + bbox pre-filter (no shuffle)
      → mapInPandas snapshot kernel (narrow! one doc is self-contained,
        so reconstruction never shuffles; Arrow-batched)
      → downstream groupBy/agg (the only shuffle, partial+final via AQE)

Kernel semantics ≙ CellIterator.iterateByTimestamps
(oshdb-util/.../celliterator/CellIterator.java:181-347): filter-aware
modification timestamps, the queryTs carry-forward optimization (geometry
computed once per changed state, O5), visibility/empty-member skips,
3-state AOI culling with boundary clipping, emit-if-nonempty.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import cells
from ..geo import geom as G
from ..model import docs as docs_mod
from ..model import schemas
from .aoi import AOI
from .filters import compile_doc_prefilter, compile_python
from .geometry_builder import DEFAULT_INTERPRETER, build_geometry
from .temporal import (
    get_by_timestamps,
    mod_timestamps,
    query_timestamps,
    sort_versions,
)

_FP = 10_000_000  # degrees → fixed-point


def with_doc_bbox(typed: DataFrame) -> DataFrame:
    """Doc-level bbox summary columns (fixed-point), computed JVM-side over
    own versions ∪ embedded member versions — the analog of the OSH
    entity's stored bounding box used by the reference pre-filter
    (CellIterator.java:201-204)."""
    all_lons = (
        "concat(versions.lon, flatten(transform(members, m -> m.versions.lon)))"
    )
    all_lats = (
        "concat(versions.lat, flatten(transform(members, m -> m.versions.lat)))"
    )
    return (
        typed.withColumn("_lons", F.expr(f"filter({all_lons}, x -> x is not null)"))
        .withColumn("_lats", F.expr(f"filter({all_lats}, x -> x is not null)"))
        .withColumn("bbox_min_lon", F.expr("array_min(_lons)"))
        .withColumn("bbox_max_lon", F.expr("array_max(_lons)"))
        .withColumn("bbox_min_lat", F.expr("array_min(_lats)"))
        .withColumn("bbox_max_lat", F.expr("array_max(_lats)"))
        .drop("_lons", "_lats")
    )


def prepared_docs(
    docs: DataFrame, filter_spec=None, aoi: AOI | None = None
) -> DataFrame:
    """Summarized + JVM-pre-filtered docs (shared by both kernels).

    The typed decode runs JVM-side for pre-filtering and bbox summaries,
    but the kernel input carries only Arrow-safe columns (raw spans +
    scalars): shipping array<struct<...map...>> through the Arrow channel
    segfaults pyarrow's arrow_to_pandas, so version/member JSON is parsed
    in the kernel instead.
    """
    typed = docs_mod.typed_docs(docs)
    pre = compile_doc_prefilter(filter_spec)
    if pre is not None:
        typed = typed.filter(pre)
    typed = with_doc_bbox(typed)
    if aoi is not None and not aoi.is_world:
        b = aoi.bbox
        typed = typed.filter(
            (F.col("bbox_min_lon") <= int(b[2] * _FP))
            & (F.col("bbox_max_lon") >= int(b[0] * _FP))
            & (F.col("bbox_min_lat") <= int(b[3] * _FP))
            & (F.col("bbox_max_lat") >= int(b[1] * _FP))
        )
    return typed.select(
        "doc_id", "entity_type", "id", "spans",
        "bbox_min_lon", "bbox_min_lat", "bbox_max_lon", "bbox_max_lat",
    )


def _doc_structs(row):
    """Arrow row → (versions, members_by_key, fbbox_degrees, cell_token).

    Parses version/member spans from their JSON payloads (the spans array
    itself is Arrow-safe; parsed nested structs with maps are not)."""
    import json

    versions = []
    members = []
    spans = row["spans"]
    if len(spans) and not isinstance(spans[0], dict):
        spans = [
            {"kind": s["kind"], "text": s["text"]}
            if isinstance(s, dict)
            else {"kind": s.kind, "text": s.text}
            for s in spans
        ]
    for s in spans:
        if s["kind"] == "version":
            versions.append(json.loads(s["text"]))
        elif s["kind"] == "member":
            members.append(json.loads(s["text"]))
    versions = sort_versions(versions)
    members_by_key = {(m["entity_type"], m["id"]): m for m in members}
    if row["bbox_min_lon"] is None or pd.isna(row["bbox_min_lon"]):
        fbbox = None
        token = ""
    else:
        fbbox = (
            row["bbox_min_lon"] / _FP,
            row["bbox_min_lat"] / _FP,
            row["bbox_max_lon"] / _FP,
            row["bbox_max_lat"] / _FP,
        )
        token = cells.token_of_bboxes(
            np.array([row["bbox_min_lon"]], dtype=np.int64),
            np.array([row["bbox_min_lat"]], dtype=np.int64),
            np.array([row["bbox_max_lon"]], dtype=np.int64),
            np.array([row["bbox_max_lat"]], dtype=np.int64),
        )[0]
    return versions, members_by_key, fbbox, token


def _normalize_ts(versions):
    """Version dicts carry ISO strings from JSON; kernels need unix secs."""
    from ..model.synth import unix

    for v in versions:
        if isinstance(v.get("ts"), str):
            v["ts"] = unix(v["ts"])
    return versions


def snapshots(
    docs: DataFrame,
    timestamps: list[int],
    bbox=None,
    polygon=None,
    filter_spec=None,
    area_decider=None,
    with_geometry: bool = True,
) -> DataFrame:
    """The snapshot view: one row per (entity, requested timestamp) where
    the entity exists, is visible, matches the filter, and intersects the
    AOI. Returns a DataFrame with schema model.schemas.SNAPSHOTS."""
    aoi = AOI(bbox=bbox, polygon=polygon)
    decider = area_decider or DEFAULT_INTERPRETER
    requested = sorted(timestamps)
    flt = compile_python(filter_spec)
    typed = prepared_docs(docs, filter_spec, aoi)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for _, row in pdf.iterrows():
                _emit_doc_snapshots(
                    row, requested, aoi, flt, decider, with_geometry, out
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in schemas.SNAPSHOTS.fields]
            )

    return typed.mapInPandas(kernel, schema=schemas.SNAPSHOTS)


def _emit_doc_snapshots(row, requested, aoi, flt, decider, with_geometry, out):
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
    if vflt is not None and not any(
        v["visible"] and vflt(v) for v in versions
    ):
        return  # none of the versions matches (CellIterator.java:207-211)

    members = list(members_by_key.values())
    mod_ts = mod_timestamps(entity_type, versions, members, vflt)
    query_ts = query_timestamps(requested, mod_ts)
    if not query_ts:
        return
    asof = get_by_timestamps(versions, list(query_ts.keys()))

    for t, v in asof.items():
        if not v["visible"]:
            continue
        if entity_type == "way" and not (v.get("refs") or []):
            continue  # zero-node way (CellIterator.java:254-257)
        if entity_type == "relation" and not (v.get("refs") or []):
            continue
        if vflt is not None and not vflt(v):
            continue
        geom = None
        clipped = None
        if with_geometry or not fully_inside:
            geom = build_geometry(entity_type, v, t, members_by_key, decider)
            clipped = geom if fully_inside else aoi.clip(geom)
        if fully_inside or (clipped is not None and not G.is_empty(clipped)):
            gwkb = G.to_wkb(geom) if with_geometry else None
            cwkb = G.to_wkb(clipped) if with_geometry else None
            base = (
                v["version"],
                v["changeset"],
                v["uid"],
                v.get("tags") or {},
                gwkb,
                cwkb,
                token,
                row["doc_id"],
            )
            out.append((t, entity_type, eid) + base)
            for extra_t in query_ts[t]:
                out.append((extra_t, entity_type, eid) + base)


# ---------------------------------------------------------------------------
# node-only pure-SQL fast path (zero Python; the 100 TB scale path when no
# member recursion is involved)
# ---------------------------------------------------------------------------

def node_snapshots_sql(
    docs: DataFrame, timestamps: list[int], bbox=None, filter_spec=None
) -> DataFrame:
    """Snapshot view restricted to node docs, expressed entirely in
    Catalyst: validity windows via lead() + broadcast range join against
    the timestamp list. Same output columns as `snapshots` minus WKB (lon/
    lat columns instead). Whole-stage-codegen end to end."""
    spark = docs.sparkSession
    versions = docs_mod.versions_table(docs).filter(F.col("entity_type") == "node")
    pre = None
    if filter_spec:
        from .filters import _version_pred_sql

        for s in filter_spec:
            if s[0] == "type_in" and "node" not in s[1]:
                return spark.createDataFrame([], versions.schema)
            p = _version_pred_sql(s)
            if p:
                pre = p if pre is None else f"({pre}) and ({p})"
    if pre:
        versions = versions.filter(F.expr(pre.replace("v.tags", "tags")))
    ts_df = F.broadcast(
        spark.createDataFrame([(int(t),) for t in timestamps], "ts long")
    )
    snap = versions.join(
        ts_df,
        (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).filter(F.col("visible"))
    if bbox is not None:
        snap = snap.filter(
            (F.col("lon") >= int(bbox[0] * _FP))
            & (F.col("lon") <= int(bbox[2] * _FP))
            & (F.col("lat") >= int(bbox[1] * _FP))
            & (F.col("lat") <= int(bbox[3] * _FP))
        )
    return snap.select(
        "ts", "entity_type", "id", "version", "changeset", "uid", "tags",
        "lon", "lat", "doc_id",
    )
