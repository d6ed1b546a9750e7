"""Engine schemas (FIXTURES.md §1-2).

The canonical input is the interleaved text+media docs table mandated by
BASELINE.json.input_hint:

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

One doc = one OSH entity: all versions of one OSM element plus embedded
member histories (mirrors osh/OSHEntity.java:11-34 — a way carries its node
histories so geometry at any timestamp is computable without joins).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

REF = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("ref", T.LongType()),
        T.StructField("role", T.StringType()),
    ]
)

# JSON payload of a `version` span (FIXTURES.md §1.1); mirrors
# osm/OSMEntity.java:13-39 + OSMNode/OSMWay/OSMRelation extras.
VERSION_JSON = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("ts", T.StringType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("lon", T.LongType()),  # fixed-point 1e-7 deg (OSHDB.java:8-9)
        T.StructField("lat", T.LongType()),
        T.StructField("refs", T.ArrayType(REF)),
    ]
)

MEMBER_JSON = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("versions", T.ArrayType(VERSION_JSON)),
    ]
)

# reduced member decode for the vectorized kernels: from_json skips JSON
# fields absent from the schema, so member tags/refs (never needed by the
# flat member tables or the bbox summary) are not materialized
VERSION_LITE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("ts", T.StringType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("lon", T.LongType()),
        T.StructField("lat", T.LongType()),
    ]
)

MEMBER_LITE = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("versions", T.ArrayType(VERSION_LITE)),
    ]
)

# relation fast-path member decode: way members additionally need their
# per-version tags (area decision) and ref ids (node resolution); from_json
# keeps only the listed fields (role/type of refs are not needed — way
# refs are always nodes)
VERSION_REL = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("ts", T.StringType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("lon", T.LongType()),
        T.StructField("lat", T.LongType()),
        T.StructField(
            "refs",
            T.ArrayType(T.StructType([T.StructField("ref", T.LongType())])),
        ),
    ]
)

MEMBER_REL = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("versions", T.ArrayType(VERSION_REL)),
    ]
)

META_JSON = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

# flat exploded per-version table (engine-internal; FIXTURES.md §2)
VERSIONS = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("valid_from", T.LongType()),  # unix seconds
        T.StructField("valid_to", T.LongType()),  # lead(valid_from); null = open
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("lon", T.LongType()),
        T.StructField("lat", T.LongType()),
        T.StructField("refs", T.ArrayType(REF)),
        T.StructField("doc_id", T.StringType()),
    ]
)

SNAPSHOTS = T.StructType(
    [
        T.StructField("ts", T.LongType()),  # snapshot timestamp, unix seconds
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.IntegerType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom_wkb", T.BinaryType()),
        T.StructField("geom_clipped_wkb", T.BinaryType()),
        T.StructField("cell", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)

CONTRIBUTIONS = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("id", T.LongType()),
        # CREATION | DELETION | TAG_CHANGE | GEOMETRY_CHANGE
        # (celliterator/ContributionType.java:1-8)
        T.StructField("contrib_types", T.ArrayType(T.StringType())),
        T.StructField("changeset", T.LongType()),
        T.StructField("contributor_uid", T.IntegerType()),
        T.StructField("version_before", T.IntegerType()),
        T.StructField("version_after", T.IntegerType()),
        T.StructField("tags_before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("tags_after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom_before_wkb", T.BinaryType()),
        T.StructField("geom_after_wkb", T.BinaryType()),
        T.StructField("geom_before_clipped_wkb", T.BinaryType()),
        T.StructField("geom_after_clipped_wkb", T.BinaryType()),
        T.StructField("cell", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)

CONTRIBUTION_TYPES = ("CREATION", "DELETION", "TAG_CHANGE", "GEOMETRY_CHANGE")
