"""Deterministic synthetic docs builders (no external data).

Three producers of the canonical interleaved docs table:

1. ``make_doc`` / ``docs_df`` — hand-built fixtures for golden tests
   (ports of the reference's OSM-XML test resources, SURVEY.md §5).
2. ``parse_osm_xml`` — parses the reference's .osm history fixtures at
   test time (read-only) into docs rows, embedding member histories the
   way the reference ETL embeds child entities into OSH blobs
   (osh/OSHEntity.java:27-33).
3. ``synth_docs_sql`` — a pure-JVM (Catalyst expression) generator used by
   the bench harness: scales to millions of docs without Python, with a
   Zipf-hot spatial distribution to exercise salting/AQE (FIXTURES.md F10).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas

ISO = "%Y-%m-%dT%H:%M:%SZ"


def iso(ts) -> str:
    if isinstance(ts, str):
        return ts
    if isinstance(ts, (int, float)):
        return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime(ISO)
    return ts.strftime(ISO)


def unix(ts_iso: str) -> int:
    # fromisoformat is C-implemented in 3.11+ (~15x faster than strptime)
    # and accepts 'Z' and numeric offsets; naive ⇒ UTC
    try:
        dt = datetime.fromisoformat(ts_iso)
    except ValueError:
        dt = datetime.strptime(ts_iso, ISO)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def make_version(
    version: int,
    ts,
    changeset: int,
    uid: int = 0,
    tags: dict | None = None,
    lon: int | None = None,
    lat: int | None = None,
    refs: list | None = None,
    visible: bool = True,
) -> dict:
    return {
        "version": version,
        "visible": visible,
        "ts": iso(ts),
        "changeset": changeset,
        "uid": uid,
        "tags": tags or {},
        "lon": lon,
        "lat": lat,
        "refs": refs or [],
    }


def make_doc(
    entity_type: str,
    id: int,
    versions: list[dict],
    members: list[dict] | None = None,
    media: list[tuple[str, str]] | None = None,
) -> dict:
    """Build one docs row. Version spans newest-first (FIXTURES.md §1);
    optional media spans are interleaved to exercise the passthrough
    invariant (F9)."""
    spans = [
        {
            "kind": "meta",
            "text": json.dumps({"entity_type": entity_type, "id": id}),
            "media_ref": "",
            "offset": 0,
        }
    ]
    newest_first = sorted(versions, key=lambda v: (v["ts"], v["version"]), reverse=True)
    for v in newest_first:
        spans.append(
            {"kind": "version", "text": json.dumps(v), "media_ref": "", "offset": 0}
        )
    for m in members or []:
        spans.append(
            {"kind": "member", "text": json.dumps(m), "media_ref": "", "offset": 0}
        )
    doc_id = f"{entity_type}/{id}"
    for i, (caption, ref_suffix) in enumerate(media or []):
        # interleave at deterministic positions
        spans.insert(
            1 + i * 2,
            {
                "kind": "media",
                "text": json.dumps({"caption": caption}),
                "media_ref": f"blob://{doc_id}/{ref_suffix}",
                "offset": 0,
            },
        )
    for i, s in enumerate(spans):
        s["offset"] = i
    return {"doc_id": doc_id, "spans": spans}


def docs_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    rows = [
        (
            d["doc_id"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
        )
        for d in docs
    ]
    return spark.createDataFrame(rows, schema=schemas.DOCS)


# ---------------------------------------------------------------------------
# reference OSM-XML fixture parser (test-time only)
# ---------------------------------------------------------------------------

def parse_osm_xml(path: str) -> list[dict]:
    """Parse an OSM full-history XML fixture into docs rows.

    Way/relation docs embed the full histories of their member nodes/ways
    found in the same file (the reference does the same when building OSH
    blobs: celliterator/helpers/GridOSHFactory.java:36-99)."""
    tree = ET.parse(path)
    root = tree.getroot()
    hist: dict[tuple[str, int], list[dict]] = {}
    refsets: dict[tuple[str, int], set] = {}
    for el in root:
        if el.tag not in ("node", "way", "relation"):
            continue
        eid = int(el.attrib["id"])
        visible = el.attrib.get("visible", "true") == "true"
        tags = {t.attrib["k"]: t.attrib["v"] for t in el.findall("tag")}
        refs = []
        if el.tag == "way":
            refs = [
                {"type": "node", "ref": int(nd.attrib["ref"]), "role": ""}
                for nd in el.findall("nd")
            ]
        elif el.tag == "relation":
            refs = [
                {
                    "type": m.attrib["type"],
                    "ref": int(m.attrib["ref"]),
                    "role": m.attrib.get("role", ""),
                }
                for m in el.findall("member")
            ]
        v = make_version(
            version=int(el.attrib.get("version", "1")),
            ts=el.attrib["timestamp"].replace(".000", ""),
            changeset=int(el.attrib.get("changeset", "0")),
            uid=int(el.attrib.get("uid", "0")),
            tags=tags,
            lon=int(round(float(el.attrib["lon"]) * 1e7)) if "lon" in el.attrib else None,
            lat=int(round(float(el.attrib["lat"]) * 1e7)) if "lat" in el.attrib else None,
            refs=refs,
            visible=visible,
        )
        key = (el.tag, eid)
        hist.setdefault(key, []).append(v)
        refsets.setdefault(key, set()).update(
            (r["type"], r["ref"]) for r in refs
        )
    docs = []
    for (etype, eid), versions in hist.items():
        members = []
        if etype in ("way", "relation"):
            seen = set()
            wanted = set(refsets[(etype, eid)])
            if etype == "relation":
                # embed nodes referenced by member ways too (2-level recursion)
                for (mt, mid) in list(wanted):
                    if mt == "way" and (mt, mid) in refsets:
                        wanted |= refsets[("way", mid)]
            for (mt, mid) in sorted(wanted):
                if (mt, mid) in hist and (mt, mid) not in seen:
                    seen.add((mt, mid))
                    members.append(
                        {"entity_type": mt, "id": mid, "versions": hist[(mt, mid)]}
                    )
        docs.append(make_doc(etype, eid, versions, members or None))
    return docs


def typed_row(doc: dict) -> dict:
    """Build the typed-row dict the pandas kernels consume, without Spark —
    the python mirror of docs.typed_docs + snapshot.with_doc_bbox. Used by
    the pure-python golden tests (fast iteration on kernel semantics)."""
    meta = versions = None
    members = []
    for s in doc["spans"]:
        if s["kind"] == "meta":
            meta = json.loads(s["text"])
        elif s["kind"] == "version":
            versions = versions or []
            versions.append(json.loads(s["text"]))
        elif s["kind"] == "member":
            members.append(json.loads(s["text"]))
    lons = [v["lon"] for v in versions if v.get("lon") is not None]
    lats = [v["lat"] for v in versions if v.get("lat") is not None]
    for m in members:
        lons += [v["lon"] for v in m["versions"] if v.get("lon") is not None]
        lats += [v["lat"] for v in m["versions"] if v.get("lat") is not None]
    return {
        "doc_id": doc["doc_id"],
        "entity_type": meta["entity_type"],
        "id": meta["id"],
        "versions": sorted(versions, key=lambda v: (v["ts"], v["version"])),
        "members": members,
        "spans": doc["spans"],
        "bbox_min_lon": min(lons) if lons else None,
        "bbox_max_lon": max(lons) if lons else None,
        "bbox_min_lat": min(lats) if lats else None,
        "bbox_max_lat": max(lats) if lats else None,
    }


# ---------------------------------------------------------------------------
# JVM-side scalable generator (bench / skew)
# ---------------------------------------------------------------------------

def synth_docs_sql(
    spark: SparkSession,
    n_docs: int,
    versions_per_doc: int = 4,
    hot_fraction: float = 0.4,
    partitions: int | None = None,
    typed_columns: bool = True,
) -> DataFrame:
    """Generate `n_docs` node docs entirely with Catalyst expressions.

    `hot_fraction` of docs land in ONE dense urban cell (~Heidelberg),
    the rest spread worldwide — a Zipf-ish hot-tile distribution that
    exercises salting + AQE skew handling (FIXTURES.md F10). Deterministic:
    all columns derive from the doc index via integer arithmetic.

    With ``typed_columns`` (default) the docs ALSO carry native
    entity_type/id/versions/members columns built from the SAME structs
    whose to_json produces the span text (the model.history store-v2
    layout — they cannot diverge): typed_docs passes them through with
    no from_json, and Catalyst prunes the JSON spans when nothing reads
    them. ``typed_columns=False`` emits the raw 2-column input_hint
    shape (doc_id, spans) — the cold-ingest decode path, kept for A/B
    and decode-correctness tests.
    """
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    hot = (F.pmod(F.col("id") * 2654435761, F.lit(1000)) < int(hot_fraction * 1000))
    # hot docs: jitter inside ~0.05° around (8.68, 49.41); cold: worldwide
    lon7 = F.when(
        hot, 86800000 + F.pmod(F.col("id") * 104729, F.lit(500000)) - 250000
    ).otherwise(F.pmod(F.col("id") * 7919, F.lit(3_600_000_000)) - 1_800_000_000)
    lat7 = F.when(
        hot, 494100000 + F.pmod(F.col("id") * 93719, F.lit(500000)) - 250000
    ).otherwise(F.pmod(F.col("id") * 6101, F.lit(1_700_000_000)) - 850_000_000)
    df = df.withColumn("lon7", lon7.cast("long")).withColumn("lat7", lat7.cast("long"))
    # k versions (NATIVE structs, oldest-first — the span JSON derives
    # from these same structs below): ts spaced yearly from 2008 + a
    # per-doc phase; every 3rd version moves the node, every 4th edits
    # tags
    vnative = F.expr(
        f"""
        transform(sequence(1, {versions_per_doc}), i -> named_struct(
             'version', cast(i as int),
             'visible', true,
             'ts', date_format(
                timestamp_seconds(1199145600 + pmod(id, 31536000)
                                  + (i - 1) * 31536000), "yyyy-MM-dd'T'HH:mm:ssX"),
             'changeset', id * 10 + i,
             'uid', cast(pmod(id, 1000) as int),
             'tags', map('amenity', case when pmod(id + i, 4) = 0
                                         then 'cafe' else 'bench' end),
             'lon', lon7 + (i - 1) * case when pmod(i, 3) = 0 then 100 else 0 end,
             'lat', lat7,
             'refs', cast(array()
                          as array<struct<type:string,ref:bigint,role:string>>)
        ))
        """
    )
    vjson = F.expr(
        f"""
        transform(versions, (t, j) -> named_struct(
          'kind', 'version',
          'text', to_json(t),
          'media_ref', '',
          'offset', {versions_per_doc} - j
        ))
        """
    )
    meta = F.expr(
        """
        named_struct('kind', 'meta',
                     'text', to_json(named_struct('entity_type', 'node', 'id', id)),
                     'media_ref', '', 'offset', 0)
        """
    )
    media = F.expr(
        f"""
        named_struct('kind', 'media',
                     'text', to_json(named_struct('caption', concat('img-', id))),
                     'media_ref', concat('blob://node/', id, '/0'),
                     'offset', {versions_per_doc} + 1)
        """
    )
    out = (
        df.withColumn("versions", vnative)
        .withColumn("meta_span", meta)
        .withColumn("version_spans", vjson)
        .withColumn("media_span", media)
    )
    spans = F.expr(
        "concat(array(meta_span), reverse(version_spans), array(media_span))"
    ).alias("spans")
    if not typed_columns:
        return out.select(
            F.concat(F.lit("node/"), F.col("id")).alias("doc_id"), spans
        )
    return out.select(
        F.concat(F.lit("node/"), F.col("id")).alias("doc_id"),
        spans,
        F.lit("node").alias("entity_type"),
        F.col("id"),
        F.col("versions"),
        F.expr("array()").cast(T.ArrayType(schemas.MEMBER_JSON)).alias("members"),
    )
