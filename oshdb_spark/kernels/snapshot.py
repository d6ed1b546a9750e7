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
    docs: DataFrame,
    filter_spec=None,
    aoi: AOI | None = None,
    fast_arrays: bool = False,
) -> DataFrame:
    """Summarized + JVM-pre-filtered docs (shared by both kernels).

    The typed decode runs JVM-side for pre-filtering and bbox summaries,
    but the kernel input carries only Arrow-safe columns (raw spans +
    scalars): shipping array<struct<...map...>> through the Arrow channel
    segfaults pyarrow's arrow_to_pandas, so version/member JSON is parsed
    in the kernel instead.

    With ``fast_arrays=True``, member-less node docs additionally carry
    their version fields as JVM-parsed PRIMITIVE parallel arrays (vts,
    vlon, ... — Arrow-safe, no nested maps) and NULL spans, so the kernel
    can run them through a fully vectorized numpy path with zero
    per-version Python. Tag filters are evaluated JVM-side into a
    ``vmatch`` boolean array (the analog of fusing the reference's exact
    filters into the scan). Docs that need the general path (ways,
    relations, python filters) keep their spans and get NULL arrays.
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
    base = [
        "doc_id", "entity_type", "id",
        "bbox_min_lon", "bbox_min_lat", "bbox_max_lon", "bbox_max_lat",
    ]
    if not fast_arrays:
        return typed.select(*base, "spans")

    from .filters import _version_pred_sql

    has_py = any(s[0] == "py" for s in (filter_spec or []))
    preds = [p for s in (filter_spec or []) for p in [_version_pred_sql(s)] if p]
    fast = F.col("entity_type") == "node"
    if has_py:
        fast = F.lit(False)
    typed = typed.withColumn("_fast", fast & (F.size("members") == 0))

    def arr(expr_sql: str):
        return F.when(F.col("_fast"), F.expr(expr_sql))

    ts_expr = (
        "transform(versions, v -> unix_timestamp("
        "to_timestamp(v.ts, \"yyyy-MM-dd'T'HH:mm:ssX\")))"
    )
    match_expr = None
    if preds:
        conj = " and ".join(f"({p})" for p in preds)
        match_expr = f"transform(versions, v -> coalesce({conj}, false))"
    return typed.select(
        *base,
        F.when(~F.col("_fast"), F.col("spans")).alias("spans"),
        arr(ts_expr).alias("vts"),
        arr("versions.version").alias("vversion"),
        arr("versions.visible").alias("vvisible"),
        arr("versions.changeset").alias("vchangeset"),
        arr("versions.uid").alias("vuid"),
        arr("versions.lon").alias("vlon"),
        arr("versions.lat").alias("vlat"),
        arr("transform(versions, v -> to_json(v.tags))").alias("vtags"),
        (arr(match_expr) if match_expr else F.lit(None).cast("array<boolean>")).alias(
            "vmatch"
        ),
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


def _point_wkb_vec(lon_deg: np.ndarray, lat_deg: np.ndarray) -> list[bytes]:
    """Vectorized ISO little-endian WKB Point encoding (byte-identical to
    geo.geom.to_wkb for Points)."""
    n = len(lon_deg)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 2:5] = 0
    buf[:, 5:13] = (
        np.ascontiguousarray(lon_deg, dtype="<f8").view(np.uint8).reshape(n, 8)
    )
    buf[:, 13:21] = (
        np.ascontiguousarray(lat_deg, dtype="<f8").view(np.uint8).reshape(n, 8)
    )
    return [row.tobytes() for row in buf]


_SNAP_COLS = [f.name for f in schemas.SNAPSHOTS.fields]


def _empty_frame(cols: list[str]) -> pd.DataFrame:
    """Zero-row frame with all-object dtype columns — a plain
    pd.DataFrame({c: []}) defaults to float64, which pyarrow refuses to
    cast to map/binary types on the Arrow return path."""
    return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols},
                        columns=cols)


def _flat_i64(col, fill: int = 0) -> np.ndarray:
    """Concatenate a pandas column of per-doc arrays into one int64 array,
    mapping nulls (e.g. missing coords on deleted versions) to `fill`."""
    x = np.concatenate([np.asarray(v) for v in col])
    if x.dtype == object or np.issubdtype(x.dtype, np.floating):
        mask = pd.isna(x)
        if mask.any():
            x = np.where(mask, fill, x)
    return x.astype(np.int64)


def _flat_bool(col) -> np.ndarray:
    x = np.concatenate([np.asarray(v) for v in col])
    if x.dtype == object or np.issubdtype(x.dtype, np.floating):
        mask = pd.isna(x)
        if mask.any():
            x = np.where(mask, False, x)
    return x.astype(bool)


def _flat_node_arrays(pdf: pd.DataFrame) -> dict:
    """Flat (all docs of the batch concatenated) version arrays + doc
    segmentation, for the vectorized node kernels. `combined` is globally
    monotonic: doc_index * 2^34 + ts (ts < 2^31 « 2^34)."""
    n_docs = len(pdf)
    lens = np.fromiter((len(v) for v in pdf["vts"]), dtype=np.int64, count=n_docs)
    starts = np.cumsum(lens) - lens
    a = {
        "n_docs": n_docs,
        "lens": lens,
        "starts": starts,
        "ts": _flat_i64(pdf["vts"]),
        "version": _flat_i64(pdf["vversion"]),
        "visible": _flat_bool(pdf["vvisible"]),
        "changeset": _flat_i64(pdf["vchangeset"]),
        "uid": _flat_i64(pdf["vuid"]),
        "lon": _flat_i64(pdf["vlon"]),
        "lat": _flat_i64(pdf["vlat"]),
        "tags": np.concatenate(
            [np.asarray(v, dtype=object) for v in pdf["vtags"]]
        ),
    }
    null_tags = pd.isna(a["tags"])
    if null_tags.any():
        a["tags"] = np.where(null_tags, "{}", a["tags"])
    first = pdf["vmatch"].iloc[0]
    if first is not None and not (isinstance(first, float) and pd.isna(first)):
        a["match"] = _flat_bool(pdf["vmatch"])
    else:
        a["match"] = np.ones(len(a["ts"]), dtype=bool)
    a["doc_idx"] = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    a["combined"] = a["doc_idx"] * (1 << 34) + a["ts"]
    return a


def _doc_rel_vec(pdf: pd.DataFrame, aoi: AOI) -> np.ndarray:
    """Vector of per-doc AOI 3-states (0 disjoint / 1 inside / 2 boundary)."""
    n_docs = len(pdf)
    if aoi.is_world:
        return np.ones(n_docs, dtype=np.int8)
    bmin_lon = pdf["bbox_min_lon"].to_numpy(dtype=np.float64) / _FP
    bmin_lat = pdf["bbox_min_lat"].to_numpy(dtype=np.float64) / _FP
    bmax_lon = pdf["bbox_max_lon"].to_numpy(dtype=np.float64) / _FP
    bmax_lat = pdf["bbox_max_lat"].to_numpy(dtype=np.float64) / _FP
    w, s, e, n = aoi.bbox
    inside = (bmin_lon >= w) & (bmax_lon <= e) & (bmin_lat >= s) & (bmax_lat <= n)
    overlap = (bmin_lon <= e) & (bmax_lon >= w) & (bmin_lat <= n) & (bmax_lat >= s)
    doc_rel = np.where(inside, 1, np.where(overlap, 2, 0)).astype(np.int8)
    if aoi.polygon is not None:
        from .aoi import bbox_vs_polygon

        for i in np.nonzero(doc_rel != 0)[0]:
            prel = bbox_vs_polygon(
                (bmin_lon[i], bmin_lat[i], bmax_lon[i], bmax_lat[i]), aoi.polygon
            )
            if prel == 0:
                doc_rel[i] = 0
            elif prel == 2 or doc_rel[i] == 2:
                doc_rel[i] = 2
    return doc_rel


def _points_in_aoi(lon_deg: np.ndarray, lat_deg: np.ndarray, aoi: AOI) -> np.ndarray:
    if aoi.polygon is not None:
        from ..geo.clip import points_in_polygon

        return points_in_polygon(lon_deg, lat_deg, aoi.polygon)
    w, s, e, n = aoi.bbox
    return (lon_deg >= w) & (lon_deg <= e) & (lat_deg >= s) & (lat_deg <= n)


def _nodes_snapshot_vec(
    pdf: pd.DataFrame, requested: list[int], aoi: AOI, with_geometry: bool
) -> pd.DataFrame:
    """Fully vectorized snapshot kernel for member-less node docs.

    As-of alignment across ALL docs of the batch in one searchsorted per
    requested timestamp: versions are sorted (ts, version) within each doc,
    so keying by doc_index * 2^34 + ts makes the flat array globally
    monotonic (ts < 2^31 « 2^34). Zero per-version Python
    (CellIterator.java:181-347 semantics; the queryTs/O5 reuse rule is
    subsumed — point geometry is computed straight from the state arrays).
    """
    import json

    fa = _flat_node_arrays(pdf)
    n_docs, starts = fa["n_docs"], fa["starts"]
    flat_ts, flat_ver = fa["ts"], fa["version"]
    flat_vis, flat_cs, flat_uid = fa["visible"], fa["changeset"], fa["uid"]
    flat_lon, flat_lat, flat_tags = fa["lon"], fa["lat"], fa["tags"]
    flat_match, combined = fa["match"], fa["combined"]

    # doc-level AOI 3-state (rel==0 rows were pruned JVM-side for bbox AOIs;
    # polygon AOIs still need the exact doc-level test here)
    doc_rel = _doc_rel_vec(pdf, aoi)

    tokens = cells.token_of_bboxes(
        pdf["bbox_min_lon"].to_numpy(np.int64),
        pdf["bbox_min_lat"].to_numpy(np.int64),
        pdf["bbox_max_lon"].to_numpy(np.int64),
        pdf["bbox_max_lat"].to_numpy(np.int64),
    )
    ids = pdf["id"].to_numpy(np.int64)
    doc_ids = pdf["doc_id"].to_numpy(object)

    docs_arange = np.arange(n_docs, dtype=np.int64)
    frames = []
    for t in requested:
        pos = np.searchsorted(combined, docs_arange * (1 << 34) + t, side="right") - 1
        ok = (pos >= starts) & (doc_rel > 0)
        p = np.where(ok, pos, 0)
        ok &= flat_vis[p] & flat_match[p]
        # boundary docs: exact point-in-AOI test (the "clip" of a point)
        bnd = ok & (doc_rel == 2)
        if bnd.any():
            sel = np.nonzero(bnd)[0]
            pip = _points_in_aoi(
                flat_lon[pos[sel]] * 1e-7, flat_lat[pos[sel]] * 1e-7, aoi
            )
            keep = np.ones(n_docs, dtype=bool)
            keep[sel] = pip
            ok &= keep
        sel = np.nonzero(ok)[0]
        if len(sel) == 0:
            continue
        ps = pos[sel]
        if with_geometry:
            wkb = _point_wkb_vec(flat_lon[ps] * 1e-7, flat_lat[ps] * 1e-7)
        else:
            wkb = None
        # parse each DISTINCT tag-json once (real tag payloads repeat a lot)
        uniq, inv = np.unique(flat_tags[ps].astype(str), return_inverse=True)
        parsed = np.array([json.loads(x) for x in uniq], dtype=object)
        frames.append(
            pd.DataFrame(
                {
                    "ts": np.full(len(sel), t, dtype=np.int64),
                    "entity_type": "node",
                    "id": ids[sel],
                    "version": flat_ver[ps].astype(np.int32),
                    "changeset": flat_cs[ps],
                    "uid": flat_uid[ps].astype(np.int32),
                    "tags": parsed[inv],
                    "geom_wkb": wkb,
                    "geom_clipped_wkb": wkb,
                    "cell": tokens[sel],
                    "doc_id": doc_ids[sel],
                },
                columns=_SNAP_COLS,
            )
        )
    if not frames:
        return _empty_frame(_SNAP_COLS)
    return pd.concat(frames, ignore_index=True)


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
    AOI. Returns a DataFrame with schema model.schemas.SNAPSHOTS.

    Member-less node docs run through the vectorized numpy path
    (_nodes_snapshot_vec); ways/relations/python-filtered docs go through
    the general per-doc path."""
    aoi = AOI(bbox=bbox, polygon=polygon)
    decider = area_decider or DEFAULT_INTERPRETER
    requested = sorted(timestamps)
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
                    _nodes_snapshot_vec(
                        pdf[fast_mask], requested, aoi, with_geometry
                    )
                )
            if (~fast_mask).any():
                out: list[tuple] = []
                for row in pdf[~fast_mask].to_dict("records"):
                    _emit_doc_snapshots(
                        row, requested, aoi, flt, decider, with_geometry, out
                    )
                frames.append(pd.DataFrame(out, columns=_SNAP_COLS))
            yield pd.concat(frames, ignore_index=True) if frames else _empty_frame(_SNAP_COLS)

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
