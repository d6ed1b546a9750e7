"""Deterministic OSM-history derivation from the driver's `events` table.

The correctness gate (driver's DuckDB oracle) and the bench harness need an
OSM-style full-history workload derived from the fixed testdata — no
external data. This module maps `events(event_id, ts, user_id, event_type,
value, props)` to node histories with EXACTLY these rules (the oracle SQL in
__spark_entry__.py mirrors them term for term; keep both in sync):

  sec       = floor(epoch seconds of ts)                       [bigint]
  dedup     : keep the row with MIN event_id per (user_id, sec)
              (guards against same-second collisions; sf0.1 has one)
  entity    : node id = user_id, one doc per user
  version   = row_number over (partition by user_id order by sec)
  visible   = event_type <> 'error'      (errors model deleted versions)
  g         = (version - 1) div 3        (geometry epoch: coords move
                                          every 3rd version — gives the
                                          contribution kernel real
                                          GEOMETRY_CHANGE/no-change mix)
  lon7      = (user_id*1103515245 + g*1000003) mod 3.6e9 - 1.8e9
  lat7      = (user_id*1234567891 + g*999983)  mod 1.7e9 - 0.85e9
              (large multipliers so small ids still spread over the globe)
  changeset = event_id (unique → changeset squash is a no-op here; squash
              semantics are covered by the golden fixture tests)
  uid       = user_id
  tags      = map('event_type', event_type)

Both producers are pure Catalyst (zero Python), so at 100 TB the derivation
is a narrow whole-stage-codegen pipeline; the only shuffles are the two
per-user windows (same key → one exchange, reused by both) and the doc
group-by, all on the same key `user_id`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas

LON_MOD = 3_600_000_000
LAT_MOD = 1_700_000_000

# Derived docs ALSO carry native typed columns (entity_type, id,
# versions, members) next to the JSON spans: the span text is built BY
# to_json OVER THESE SAME STRUCTS (they cannot diverge), and
# typed_docs/prepared_docs consume the structs directly — so the
# to_json→from_json round trip disappears from every kernel plan, and
# Catalyst materializes the JSON spans only for rows a general-path
# consumer actually reads. Field order follows schemas.VERSION_JSON
# everywhere (relation docs concat way- and node-member structs into one
# array, so the element types must be identical).
_EMPTY_REFS = (
    "cast(array() as array<struct<type:string,ref:bigint,role:string>>)"
)


def _empty_members():
    return F.expr("array()").cast(T.ArrayType(schemas.MEMBER_JSON))

# snapshot grid used by the entry-point queries: weekly Mondays spanning the
# events table's Jan-2024 range, plus one instant past the end (exercises
# open validity windows). unix seconds, UTC.
SNAPSHOT_TS = [
    1704067200,  # 2024-01-01
    1704672000,  # 2024-01-08
    1705276800,  # 2024-01-15
    1705881600,  # 2024-01-22
    1706486400,  # 2024-01-29
    1707091200,  # 2024-02-05 (after last event)
]
CONTRIB_INTERVAL = (1704672000, 1705881600)  # [2024-01-08, 2024-01-22)


def versions_from_events(events: DataFrame) -> DataFrame:
    """events → flat per-version node table with validity windows.

    Columns: entity_type,id,version,visible,valid_from,valid_to,changeset,
    uid,tags,lon,lat,refs,doc_id — same shape as model.docs.versions_table.
    """
    # The parquet timestamps are naive wall times; the DuckDB oracle (and
    # the engine's ISO span payloads) interpret them as UTC. Pin the
    # session timezone so `unix_timestamp`/`date_format` agree with that
    # regardless of how the caller built its SparkSession.
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    sec = F.unix_timestamp("ts").cast("long")
    ded = (
        events.withColumn("sec", sec)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "sec").orderBy("event_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    v = (
        ded.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to", F.lead("sec").over(w))
        .withColumn("g", ((F.col("version") - 1) / 3).cast("long"))
    )
    lon7 = (
        F.pmod(
            F.col("user_id") * F.lit(1103515245) + F.col("g") * 1000003,
            F.lit(LON_MOD),
        )
        - LON_MOD // 2
    )
    lat7 = (
        F.pmod(
            F.col("user_id") * F.lit(1234567891) + F.col("g") * 999983,
            F.lit(LAT_MOD),
        )
        - LAT_MOD // 2
    )
    return v.select(
        F.lit("node").alias("entity_type"),
        F.col("user_id").cast("long").alias("id"),
        F.col("version").cast("int").alias("version"),
        (F.col("event_type") != "error").alias("visible"),
        F.col("sec").alias("valid_from"),
        F.col("valid_to"),
        F.col("event_id").cast("long").alias("changeset"),
        F.col("user_id").cast("int").alias("uid"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("tags"),
        lon7.cast("long").alias("lon"),
        lat7.cast("long").alias("lat"),
        F.expr("array()").cast("array<struct<type:string,ref:bigint,role:string>>").alias("refs"),
        F.concat(F.lit("node/"), F.col("user_id")).alias("doc_id"),
    )


def way_docs_from_events(events: DataFrame) -> DataFrame:
    """events → WAY docs with embedded member-node histories (the
    member-recursion kernel path, oracle-reproducible).

    Derivation (mirrored by the `way_snapshot_length` oracle SQL):
      - each user owns 3 member nodes, node_id = user_id*10 + j (j=0,1,2);
        node j's versions are the user's deduped events with
        row_number%3==j (renumbered 1..k in time order)
      - node version k sits at
          lon7 = (node_id*1103515245 + k*1000003) mod 3.6e9 - 1.8e9
          lat7 = (node_id*1234567891 + k*999983)  mod 1.7e9 - 0.85e9
        (a fresh position every version → every node edit is a way
        geometry change)
      - the way (id = user_id) has ONE visible version timestamped at the
        LATEST first-version ts of its 3 nodes (so all nodes exist at
        every snapshot ≥ the way's creation), refs = [n0, n1, n2],
        tags = {'kind': 'trace'}
    """
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    sec = F.unix_timestamp("ts").cast("long")
    ded = (
        events.withColumn("sec", sec)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "sec").orderBy("event_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    ev = ded.withColumn("urn", F.row_number().over(w)).withColumn(
        "j", F.pmod(F.col("urn"), F.lit(3)).cast("int")
    )
    wj = Window.partitionBy("user_id", "j").orderBy("sec")
    nv = ev.withColumn("k", F.row_number().over(wj)).withColumn(
        "node_id", F.col("user_id") * 10 + F.col("j")
    )
    lon7 = (
        F.pmod(F.col("node_id") * F.lit(1103515245) + F.col("k") * 1000003,
               F.lit(LON_MOD)) - LON_MOD // 2
    )
    lat7 = (
        F.pmod(F.col("node_id") * F.lit(1234567891) + F.col("k") * 999983,
               F.lit(LAT_MOD)) - LAT_MOD // 2
    )
    nv = nv.withColumn("lon7", lon7).withColumn("lat7", lat7)
    vstruct = F.expr(
        f"""
        named_struct(
          'version', k, 'visible', true,
          'ts', date_format(timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ssX"),
          'changeset', event_id, 'uid', cast(user_id as int),
          'tags', map(), 'lon', lon7, 'lat', lat7,
          'refs', {_EMPTY_REFS})
        """
    )
    node_hist = (
        nv.withColumn("_vt", vstruct)
        .groupBy("user_id", "j", "node_id")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(k as k, _vt as t)),"
                " (a,b) -> case when a.k < b.k then -1 when a.k > b.k then 1"
                " else 0 end)"
            ).alias("_sorted"),
            F.min("sec").alias("first_sec"),
        )
        .withColumn("vstructs", F.expr("transform(_sorted, x -> x.t)"))
        .withColumn(
            # span text derives from the SAME structs (cannot diverge);
            # evaluated only when the spans column is actually consumed
            "member_json",
            F.expr(
                "concat('{\"entity_type\":\"node\",\"id\":', node_id,"
                " ', \"versions\":[',"
                " concat_ws(',', transform(_sorted, x -> to_json(x.t))),"
                " ']}')"
            ),
        )
        .drop("_sorted")
    )
    per_way = node_hist.groupBy("user_id").agg(
        F.expr(
            "array_sort(collect_list(struct(j as j, member_json as m,"
            " node_id as nid, vstructs as vs)),"
            " (a,b) -> case when a.j < b.j then -1 when a.j > b.j then 1"
            " else 0 end)"
        ).alias("_ms"),
        F.max("first_sec").alias("way_sec"),
    ).withColumn(
        "members", F.expr("transform(_ms, x -> named_struct('m', x.m, 'nid', x.nid))")
    ).withColumn(
        "members_typed",
        F.expr(
            "transform(_ms, x -> named_struct('entity_type', 'node',"
            " 'id', x.nid, 'versions', x.vs))"
        ),
    ).drop("_ms")
    way_vstruct = F.expr(
        """
        named_struct(
          'version', 1, 'visible', true,
          'ts', date_format(timestamp_seconds(way_sec),
                            "yyyy-MM-dd'T'HH:mm:ssX"),
          'changeset', user_id, 'uid', cast(user_id as int),
          'tags', map('kind', 'trace'),
          'lon', cast(null as bigint), 'lat', cast(null as bigint),
          'refs', transform(members, x -> named_struct(
              'type', 'node', 'ref', x.nid, 'role', '')))
        """
    )
    spans = F.expr(
        """
        transform(
          concat(
            array(named_struct('kind', 'meta',
              'text', to_json(named_struct('entity_type', 'way',
                                           'id', user_id)),
              'media_ref', '', 'offset', 0)),
            array(named_struct('kind', 'version', 'text', to_json(_wvt),
                               'media_ref', '', 'offset', 0)),
            transform(members, x -> named_struct('kind', 'member',
              'text', x.m, 'media_ref', '', 'offset', 0))),
          (s, i) -> named_struct('kind', s.kind, 'text', s.text,
                                 'media_ref', s.media_ref, 'offset', i))
        """
    )
    return (
        per_way.withColumn("_wvt", way_vstruct)
        .withColumn("spans", spans)
        .select(
            F.concat(F.lit("way/"), F.col("user_id")).alias("doc_id"),
            "spans",
            F.lit("way").alias("entity_type"),
            F.col("user_id").cast("long").alias("id"),
            F.expr("array(_wvt)").alias("versions"),
            F.col("members_typed").alias("members"),
        )
    )


def relation_docs_from_events(events: DataFrame) -> DataFrame:
    """events → RELATION docs: one relation per user with members
    [its way, its node 0] and 2-level embedded histories (way + all its
    nodes) — exercises the relation kernel's recursive member-window
    modification timestamps and as-of member resolution. Non-area tags →
    GeometryCollection([way LineString, node Point]); total length equals
    the way's, so the `way_snapshot_length` oracle applies verbatim."""
    way_docs = way_docs_from_events(events)
    # rewrap the way doc: its own version becomes a way-member payload,
    # its node-member histories carry over, and a new relation
    # meta/version pair heads the doc. Native typed columns compose from
    # the way doc's native columns directly; the JSON spans derive from
    # the same structs.
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    wid = F.expr("cast(substring(doc_id, 5) as bigint)")  # 'way/<id>'
    d = way_docs.withColumn("_id", wid)
    node_members = F.expr("filter(spans, s -> s.kind = 'member')")
    rel_vstruct = F.expr(
        """
        named_struct(
          'version', 1, 'visible', true,
          'ts', versions[0].ts,
          'changeset', _id, 'uid', cast(_id as int),
          'tags', map('kind', 'route'),
          'lon', cast(null as bigint), 'lat', cast(null as bigint),
          'refs', array(
            named_struct('type', 'way', 'ref', _id, 'role', 'main'),
            named_struct('type', 'node', 'ref', _id * 10, 'role', 'stop')))
        """
    )
    way_member = F.expr(
        """
        concat('{"entity_type":"way","id":', _id,
               ', "versions":[', to_json(versions[0]), ']}')
        """
    )
    members_typed = F.expr(
        """
        concat(
          array(named_struct('entity_type', 'way', 'id', _id,
                             'versions', versions)),
          members)
        """
    )
    spans = F.expr(
        """
        transform(
          concat(
            array(named_struct('kind', 'meta',
              'text', to_json(named_struct('entity_type', 'relation',
                                           'id', _id)),
              'media_ref', '', 'offset', 0)),
            array(named_struct('kind', 'version', 'text', to_json(_rvt),
                               'media_ref', '', 'offset', 0)),
            array(named_struct('kind', 'member', 'text', way_m,
                               'media_ref', '', 'offset', 0)),
            node_ms),
          (s, i) -> named_struct('kind', s.kind, 'text', s.text,
                                 'media_ref', s.media_ref, 'offset', i))
        """
    )
    return (
        d.withColumn("node_ms", node_members)
        .withColumn("_rvt", rel_vstruct)
        .withColumn("way_m", way_member)
        .withColumn("members_typed", members_typed)
        .withColumn("spans", spans)
        .select(
            F.concat(F.lit("relation/"), F.col("_id")).alias("doc_id"),
            "spans",
            F.lit("relation").alias("entity_type"),
            F.col("_id").alias("id"),
            F.expr("array(_rvt)").alias("versions_rel"),
            F.col("members_typed").alias("members"),
        )
        .withColumnRenamed("versions_rel", "versions")
    )


def multipolygon_docs_from_events(events: DataFrame) -> DataFrame:
    """events → MULTIPOLYGON relation docs (assembly-path coverage): per
    user a square outer ring — 4 corner nodes (single version each at the
    user's first event), a closed way [n0,n1,n2,n3,n0], and a
    type=multipolygon relation with the way as outer member.

    Corner j of user's square (side 0.1° = 1_000_000 fixed-point units):
      base_lon = (user_id*1103515245) mod 3.4e9 - 1.7e9   (margin for +s)
      base_lat = (user_id*1234567891) mod 1.5e9 - 0.75e9
      corners: (0,0), (s,0), (s,s), (0,s)
    """
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    sec = F.unix_timestamp("ts").cast("long")
    first = (
        events.withColumn("sec", sec)
        .groupBy("user_id")
        .agg(F.min("sec").alias("t0"))
    )
    S = 1_000_000
    base_lon = F.pmod(F.col("user_id") * F.lit(1103515245), F.lit(3_400_000_000)) - 1_700_000_000
    base_lat = F.pmod(F.col("user_id") * F.lit(1234567891), F.lit(1_500_000_000)) - 750_000_000
    d = first.withColumn("blon", base_lon).withColumn("blat", base_lat)
    corner_offsets = [(0, 0), (S, 0), (S, S), (0, S)]
    node_vstructs = []
    for j, (dx, dy) in enumerate(corner_offsets):
        node_vstructs.append(
            f"""named_struct(
                'version', 1, 'visible', true,
                'ts', date_format(timestamp_seconds(t0),
                                  "yyyy-MM-dd'T'HH:mm:ssX"),
                'changeset', user_id, 'uid', cast(user_id as int),
                'tags', map(), 'lon', blon + {dx}, 'lat', blat + {dy},
                'refs', {_EMPTY_REFS})"""
        )
    way_vstruct = """
        named_struct(
          'version', 1, 'visible', true,
          'ts', date_format(timestamp_seconds(t0), "yyyy-MM-dd'T'HH:mm:ssX"),
          'changeset', user_id, 'uid', cast(user_id as int), 'tags', map(),
          'lon', cast(null as bigint), 'lat', cast(null as bigint),
          'refs', transform(array(0, 1, 2, 3, 0), j -> named_struct(
              'type', 'node', 'ref', user_id*10+j, 'role', '')))
    """
    rel_vstruct = """
        named_struct(
          'version', 1, 'visible', true,
          'ts', date_format(timestamp_seconds(t0), "yyyy-MM-dd'T'HH:mm:ssX"),
          'changeset', user_id, 'uid', cast(user_id as int),
          'tags', map('type', 'multipolygon', 'landuse', 'meadow'),
          'lon', cast(null as bigint), 'lat', cast(null as bigint),
          'refs', array(named_struct('type', 'way', 'ref', user_id,
                                     'role', 'outer')))
    """
    node_members = [
        f"""concat('{{"entity_type":"node","id":', user_id*10+{j},
          ', "versions":[', to_json({v}), ']}}')"""
        for j, v in enumerate(node_vstructs)
    ]
    way_member = f"""
        concat('{{"entity_type":"way","id":', user_id,
               ', "versions":[', to_json({way_vstruct}), ']}}')
    """
    members_typed = F.expr(
        "array("
        f"named_struct('entity_type', 'way', 'id', cast(user_id as bigint),"
        f" 'versions', array({way_vstruct})), "
        + ", ".join(
            f"named_struct('entity_type', 'node',"
            f" 'id', cast(user_id*10+{j} as bigint),"
            f" 'versions', array({v}))"
            for j, v in enumerate(node_vstructs)
        )
        + ")"
    )
    all_members = ", ".join(
        f"named_struct('kind', 'member', 'text', {m}, 'media_ref', '', 'offset', 0)"
        for m in [way_member] + node_members
    )
    spans = F.expr(
        f"""
        transform(
          concat(
            array(named_struct('kind', 'meta',
              'text', to_json(named_struct('entity_type', 'relation',
                                           'id', user_id)),
              'media_ref', '', 'offset', 0)),
            array(named_struct('kind', 'version', 'text', to_json({rel_vstruct}),
                               'media_ref', '', 'offset', 0)),
            array({all_members})),
          (s, i) -> named_struct('kind', s.kind, 'text', s.text,
                                 'media_ref', s.media_ref, 'offset', i))
        """
    )
    return d.withColumn("spans", spans).select(
        F.concat(F.lit("relation/"), F.col("user_id")).alias("doc_id"),
        "spans",
        F.lit("relation").alias("entity_type"),
        F.col("user_id").cast("long").alias("id"),
        F.expr(f"array({rel_vstruct})").alias("versions"),
        members_typed.alias("members"),
    )


def docs_from_events(events: DataFrame) -> DataFrame:
    """events → interleaved docs table (input_hint shape): one doc per user,
    version spans newest-first, one meta span, one trailing media span.
    All span payloads via to_json — pure Catalyst."""
    v = versions_from_events(events)
    vstruct = F.expr(
        """
        named_struct(
          'version', version, 'visible', visible,
          'ts', date_format(timestamp_seconds(valid_from),
                            "yyyy-MM-dd'T'HH:mm:ssX"),
          'changeset', changeset, 'uid', uid, 'tags', tags,
          'lon', lon, 'lat', lat, 'refs', refs)
        """
    )
    per = v.withColumn("_vt", vstruct).groupBy("doc_id", "id").agg(
        F.expr(
            "array_sort(collect_list(struct(version as v, _vt as t)),"
            " (a,b) -> case when a.v < b.v then -1 when a.v > b.v then 1 else 0 end)"
        ).alias("_sorted")
    ).withColumn(
        # span storage order is newest-first (FIXTURES.md §1); the JSON
        # text derives from the SAME structs as the native column
        "vspans",
        F.expr(
            "transform(reverse(_sorted), x -> named_struct("
            "'kind', 'version', 'text', to_json(x.t),"
            " 'media_ref', '', 'offset', 0))"
        ),
    ).withColumn(
        "versions", F.expr("transform(_sorted, x -> x.t)")
    ).drop("_sorted")
    meta = F.expr(
        """
        named_struct('kind','meta',
          'text', to_json(named_struct('entity_type','node','id', id)),
          'media_ref','', 'offset', 0)
        """
    )
    media = F.expr(
        """
        named_struct('kind','media',
          'text', to_json(named_struct('caption', concat('trace-', id))),
          'media_ref', concat('blob://', doc_id, '/0'), 'offset', 0)
        """
    )
    spans = F.expr(
        """
        transform(
          concat(array(meta_span), vspans, array(media_span)),
          (s, i) -> named_struct('kind', s.kind, 'text', s.text,
                                 'media_ref', s.media_ref, 'offset', i))
        """
    )
    return (
        per.withColumn("meta_span", meta)
        .withColumn("media_span", media)
        .withColumn("spans", spans)
        .select(
            "doc_id", "spans",
            F.lit("node").alias("entity_type"), F.col("id"),
            "versions", _empty_members().alias("members"),
        )
    )
