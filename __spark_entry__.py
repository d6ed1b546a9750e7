"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship snapshot-view aggregate end-to-end through
the real engine (docs table → pandas snapshot kernel → groupBy) on sf0.001.

`queries()` / `oracle_sql()` pair each implemented operator from
SURVEY.md §2 with an ANSI-SQL DuckDB oracle over the same parquet tables.
The OSM-history queries derive a deterministic node-history workload from
the `events` table via oshdb_spark.model.history (the oracle SQL mirrors
that derivation term for term — see the CTE prefix `_HIST`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oshdb_spark.api.engine import OSHDB
from oshdb_spark.model.history import (
    CONTRIB_INTERVAL,
    SNAPSHOT_TS,
    docs_from_events,
    versions_from_events,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TS_LIST = "[" + ", ".join(str(t) for t in SNAPSHOT_TS) + "]"
_MONTHS = [1701388800, 1704067200, 1706745600, 1709251200]  # Dec1 Jan1 Feb1 Mar1
_MONTHS_LIST = "[" + ", ".join(str(t) for t in _MONTHS) + "]"

# DuckDB mirror of oshdb_spark.model.history.versions_from_events —
# keep in sync with that module's docstring.
_HIST = """
WITH ded AS (
  SELECT event_id, user_id, event_type, sec FROM (
    SELECT event_id, user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           row_number() OVER (
             PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
             ORDER BY event_id) AS rn
    FROM events) WHERE rn = 1
),
hist AS (
  SELECT user_id AS id, event_id AS changeset, event_type,
         sec AS valid_from,
         row_number() OVER (PARTITION BY user_id ORDER BY sec) AS version,
         (event_type <> 'error') AS visible,
         lead(sec) OVER (PARTITION BY user_id ORDER BY sec) AS valid_to
  FROM ded
),
geo AS (
  SELECT *,
    ((id*1103515245 + ((version-1)//3)*1000003) % 3600000000) - 1800000000
      AS lon7,
    ((id*1234567891 + ((version-1)//3)*999983) % 1700000000) - 850000000
      AS lat7
  FROM hist
),
grid AS (SELECT unnest(""" + _TS_LIST + """) AS ts)
"""

def _hex12_int_sql(hx: str) -> str:
    """DuckDB SQL for the 48-bit integer value of a 12-char lowercase hex
    string column — digit-by-digit (DuckDB has no hex→int conv());
    exact in a double, mirrors Spark's conv(hx, 16, 10)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1)"
        f" * power(16, {11 - i})"
        for i in range(12)
    )
    return f"({terms})"


def _pagerank_oracle(n_iter: int = 3) -> str:
    """DuckDB replay of ops/graph.pagerank with UNROLLED per-iteration
    CTEs (the kmeans-oracle precedent — no recursive aggregates needed):
    same dedup, same uniform 1/out_deg contributions, same
    round((1-0.85)/N + 0.85·Σ, 6) update — (1.0 - 0.85) spelled exactly
    like the engine's (1.0 - damping) so both engines compute the
    identical double (≠ a literal 0.15)."""
    parts = [
        """e AS (
          SELECT DISTINCT (event_id % 1000) AS s,
                 ((event_id * 7919) % 1000) AS t
          FROM events)""",
        "nd AS (SELECT s AS node FROM e UNION SELECT t FROM e)",
        "nn AS (SELECT count(*) AS n FROM nd)",
        "od AS (SELECT s, count(*) AS d FROM e GROUP BY 1)",
        "p0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 6) AS r FROM nd)",
    ]
    prev = "p0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"""c{i} AS (
              SELECT e.t AS node, sum({prev}.r / od.d) AS sm
              FROM e JOIN od USING (s) JOIN {prev} ON {prev}.node = e.s
              GROUP BY 1)"""
        )
        parts.append(
            f"""p{i} AS (
              SELECT nd.node,
                     round((1.0 - 0.85) / (SELECT n FROM nn)
                           + 0.85 * coalesce(c{i}.sm, 0), 6) AS r
              FROM nd LEFT JOIN c{i} USING (node))"""
        )
        prev = f"p{i}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, r AS rank FROM {prev}"
    )


# shard-export manifest replay: shard = 48-bit md5(doc_id || 'shard')
# mod 8 (digit-by-digit hex→int, exact ≤ 2^48); checksum = bit_xor of
# each doc's 48-bit content hash — order-independent, so it matches
# Spark regardless of row order AND merges across streaming micro-batch
# manifests; HUGEINT sums cast back to BIGINT. Shared by the batch
# (export_shards) and streaming (stream_export_shards) queries.
_EXPORT_SHARDS_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR) || 'shard'),
                    1, 12) AS shx,
             substr(md5(text), 1, 12) AS chx
      FROM documents)
    SELECT CAST({_hex12_int_sql('shx')} AS BIGINT) % 8 AS shard,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             AS tokens,
           CAST(sum(strlen(text)) AS BIGINT) AS bytes,
           bit_xor(CAST({_hex12_int_sql('chx')} AS BIGINT))
             AS checksum,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM h GROUP BY 1
"""


_BBOX = (-90.0, 0.0, 90.0, 85.0)  # (w, s, e, n) degrees
_BBOX7 = (-900000000, 0, 900000000, 850000000)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: snapshot-view count of tagged nodes in a bbox per weekly
    timestamp — the shape of OSHDB's TestHelpersOSMEntitySnapshotView
    count query (README.md example), on the interleaved docs table."""
    docs = docs_from_events(_t(spark, "/root/testdata/sf0.001", "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(bbox=_BBOX)
        .osm_type("node")
        .osm_tag("event_type", "click")
        .aggregate_by_timestamp()
        .count()
        .orderBy("ts")
    )


# ---------------------------------------------------------------------------
# queries — OSM-history engine
# ---------------------------------------------------------------------------

def q_snapshot_count(spark, sf_dir):
    """Node fast path (pure Catalyst): snapshot count per timestamp."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("node")
        .without_geometry()
        .aggregate_by_timestamp()
        .count()
    )


def q_snapshot_bbox_tag(spark, sf_dir):
    """Pandas snapshot kernel: bbox AOI + tag filter, count per ts."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(bbox=_BBOX)
        .osm_type("node")
        .osm_tag("event_type", "click")
        .aggregate_by_timestamp()
        .count()
    )


def q_contribution_types(spark, sf_dir):
    """Contribution kernel: count per ContributionType over the interval."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("node")
        .without_geometry()
        .dataframe()
    )
    return (
        df.select(F.explode("contrib_types").alias("contrib_type"))
        .groupBy("contrib_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_contrib_monthly_zerofill(spark, sf_dir):
    """aggregateByTimestamp on the contribution view: floor-to-grid
    semantics + zerofill (empty months present with 0)."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .contribution_view()
        .timestamps(_MONTHS)
        .osm_type("node")
        .without_geometry()
        .aggregate_by_timestamp()
        .count()
    )


# ---------------------------------------------------------------------------
# queries — reducers / relational (MapReducer terminals)
# ---------------------------------------------------------------------------

def q_reducer_group_sum_avg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 0).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


def q_reducer_count_uniq(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users"),
        F.count(F.lit(1)).alias("cnt"),
    )


def q_reducer_weighted_avg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_discount") * F.col("l_quantity")) / F.sum("l_quantity"), 6
        ).alias("wavg_disc")
    )


def q_agg_by_index_nation(spark, sf_dir):
    """aggregateBy(indexer) analog: broadcast dim joins + group."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 0).alias("sum_total"),
        )
    )


# ---------------------------------------------------------------------------
# queries — spatial layer
# ---------------------------------------------------------------------------

def q_cell_count_z6(spark, sf_dir):
    """XYGrid tile assignment (zoom 6) of per-event points, count per cell.
    Cell assignment via the Catalyst column form of XYGrid.getId (same
    border semantics as the numpy kernel version; whole-stage codegen)."""
    from oshdb_spark.geo import cells

    ev = _t(spark, sf_dir, "events").select("event_id")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    return (
        pts.withColumn("cell", cells.xy_id_col("lon7", "lat7", 6))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_focal_mean(spark, sf_dir):
    """Raster map-algebra: 3×3 focal mean/sum over the zoom-6 event-count
    raster (geo/cells.focal_stats — sparse semantics, lon wrap, no polar
    reflection). Each present cell emits 9 contributions map-side; one
    shuffle aggregates by target cell."""
    from oshdb_spark.geo import cells

    ev = _t(spark, sf_dir, "events").select("event_id")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    raster = (
        pts.withColumn("cell", cells.xy_id_col("lon7", "lat7", 6))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cells.focal_stats(raster, 6)


def _event_cell_raster(spark, sf_dir, zoom=6):
    from oshdb_spark.geo import cells

    ev = _t(spark, sf_dir, "events").select("event_id")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    return (
        pts.withColumn("cell", cells.xy_id_col("lon7", "lat7", zoom))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_hotspot_gi(spark, sf_dir):
    """Getis-Ord Gi* hot/cold-spot z-scores (geo/cells.hotspot_gi_star)
    over the zoom-6 event-count raster — queen 3x3 incl. self, sparse
    semantics. Integer-exact formulation (N cancels), so the oracle's
    replay is bit-identical before round(6)."""
    from oshdb_spark.geo.cells import hotspot_gi_star

    return hotspot_gi_star(_event_cell_raster(spark, sf_dir), 6)


def q_spacetime_hotspots(spark, sf_dir):
    """Space-time Gi* emerging-hotspot cube (geo/cells.spacetime_gi_star):
    zoom-6 cell × calendar-week bins of event counts, 3×3×3
    neighborhood incl. self. Integer-exact like the 2-D variant, so
    the oracle replay is bit-identical before round(6)."""
    from oshdb_spark.geo import cells as _c
    from oshdb_spark.geo.cells import spacetime_gi_star

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
        - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
        - 850_000_000
    )
    bins = (
        ev.withColumn("lon7", lon7)
        .withColumn("lat7", lat7)
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
        .withColumn("wk", F.floor(F.col("sec") / 604800).cast("long"))
        .groupBy("cell", "wk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return spacetime_gi_star(bins, 6, t_col="wk")


def q_trend_cells(spark, sf_dir):
    """Mann–Kendall monotonic-trend test per cell (geo/cells.
    mann_kendall_trend) over the same zoom-6 × calendar-week event cube
    the emerging-hotspot query uses: per-cell S statistic,
    tie-corrected variance (×18, exact int64), z-score and the
    95% trend label. Counts, signs and the tie polynomial are pure
    integers, so z is bit-identical on both engines before round(6)."""
    from oshdb_spark.geo import cells as _c
    from oshdb_spark.geo.cells import mann_kendall_trend

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
        - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
        - 850_000_000
    )
    bins = (
        ev.withColumn("lon7", lon7)
        .withColumn("lat7", lat7)
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
        .withColumn("wk", F.floor(F.col("sec") / 604800).cast("long"))
        .groupBy("cell", "wk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return mann_kendall_trend(bins, t_col="wk")


def q_triangles(spark, sf_dir):
    """Global triangle count + clustering coefficient (ops/graph.
    triangle_count — MR node-iterator++ with degree orientation) over
    the movement network: zoom-6 cells as nodes, consecutive same-user
    hops as undirected edges. Exact int64 counts; one double division
    (clustering), round(6)."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c
    from oshdb_spark.ops.graph import triangle_count

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    pts = (
        ev.withColumn(
            "lon7",
            F.pmod(F.col("event_id") * F.lit(1103515245),
                   F.lit(3_600_000_000)) - 1_800_000_000,
        )
        .withColumn(
            "lat7",
            F.pmod(F.col("event_id") * F.lit(1234567891),
                   F.lit(1_700_000_000)) - 850_000_000,
        )
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .filter(F.col("pcell").isNotNull())
        .select("pcell", "cell")
    )
    return triangle_count(hops, "pcell", "cell")


def q_kcore_cells(spark, sf_dir):
    """Bounded k-core peel (ops/graph.kcore_peel, k=3, 8 rounds) of the
    CLUSTERED-walk hop graph (zoom-6 cells of the per-user slot points,
    consecutive-fix edges): users cluster in 6° slots, so cells form
    dense local neighborhoods whose 3-core survives while stray
    cross-slot hops peel away. The oracle unrolls the same 8 peel
    rounds as plain CTE layers."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c
    from oshdb_spark.ops.graph import kcore_peel

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    ).withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .filter(F.col("pcell").isNotNull())
        .select("pcell", "cell")
    )
    return kcore_peel(hops, k=3, rounds=8, src="pcell", dst="cell")


def q_assortativity(spark, sf_dir):
    """Degree assortativity (ops/graph.assortativity — Newman 2002)
    over the same movement network as `triangles`: Pearson correlation
    of endpoint degrees over directed stubs, exact int64 moments, one
    double division, round(6)."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c
    from oshdb_spark.ops.graph import assortativity

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    pts = (
        ev.withColumn(
            "lon7",
            F.pmod(F.col("event_id") * F.lit(1103515245),
                   F.lit(3_600_000_000)) - 1_800_000_000,
        )
        .withColumn(
            "lat7",
            F.pmod(F.col("event_id") * F.lit(1234567891),
                   F.lit(1_700_000_000)) - 850_000_000,
        )
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .filter(F.col("pcell").isNotNull())
        .select("pcell", "cell")
    )
    return assortativity(hops, "pcell", "cell")


def q_travel_cost(spark, sf_dir):
    """Travel-cost field (ops/graph.sssp): cheapest observed path cost
    from the first three events' cells to every reachable zoom-6 cell
    of the movement network (edges = consecutive same-user fixes,
    weight = integer-mm hop distance). Exact int64 min-plus — no
    floats in the DP; the oracle replays the bounded Bellman-Ford as
    exactly-k-edge walk layers in one recursive CTE."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c
    from oshdb_spark.ops.graph import sssp

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    pts = (
        ev.withColumn(
            "lon7",
            F.pmod(F.col("event_id") * F.lit(1103515245),
                   F.lit(3_600_000_000)) - 1_800_000_000,
        )
        .withColumn(
            "lat7",
            F.pmod(F.col("event_id") * F.lit(1234567891),
                   F.lit(1_700_000_000)) - 850_000_000,
        )
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    lon, lat = F.col("lon7") * 1e-7, F.col("lat7") * 1e-7
    hop = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .withColumn("plon", F.lag(lon).over(w))
        .withColumn("plat", F.lag(lat).over(w))
        .filter(F.col("pcell").isNotNull())
    )
    dlat = F.radians(lat - F.col("plat"))
    dlng = F.radians(lon - F.col("plon")) * F.cos(
        F.radians((F.col("plat") + lat) / 2.0)
    )
    edges = hop.select(
        F.col("pcell").alias("src"),
        F.col("cell").alias("dst"),
        F.round(
            F.lit(6371000.0) * F.sqrt(dlng * dlng + dlat * dlat)
            * F.lit(1000.0),
            0,
        ).cast("long").alias("w"),
    )
    srcs = [
        r["cell"]
        for r in pts.filter(F.col("event_id") <= 2)
        .select("cell").collect()
    ]  # 3-row driver collect (manifest-sized, rule-derived on both sides)
    return sssp(edges, srcs, n_iter=8)


def q_od_matrix(spark, sf_dir):
    """Origin-destination flow matrix: consecutive same-user fixes
    become (from_cell -> to_cell) movements, bucketed by calendar week
    of the ARRIVING fix; per (week, from, to): flow count, distinct
    movers, exact mm-rounded total hop distance. Pure Catalyst: one
    window on the entity key, one aggregate — the standard mobility
    analytic over the same movement network travel_cost routes on."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_timestamp("ts").cast("long").alias("sec"),
    )
    pts = (
        ev.withColumn(
            "lon7",
            F.pmod(F.col("event_id") * F.lit(1103515245),
                   F.lit(3_600_000_000)) - 1_800_000_000,
        )
        .withColumn(
            "lat7",
            F.pmod(F.col("event_id") * F.lit(1234567891),
                   F.lit(1_700_000_000)) - 850_000_000,
        )
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 4))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    lon, lat = F.col("lon7") * 1e-7, F.col("lat7") * 1e-7
    hop = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .withColumn("plon", F.lag(lon).over(w))
        .withColumn("plat", F.lag(lat).over(w))
        .filter(F.col("pcell").isNotNull())
    )
    dlat = F.radians(lat - F.col("plat"))
    dlng = F.radians(lon - F.col("plon")) * F.cos(
        F.radians((F.col("plat") + lat) / 2.0)
    )
    return (
        hop.withColumn("wk", F.floor(F.col("sec") / 604800).cast("long"))
        .withColumn(
            "hop_mm",
            F.round(
                F.lit(6371000.0) * F.sqrt(dlng * dlng + dlat * dlat)
                * F.lit(1000.0),
                0,
            ).cast("long"),
        )
        .groupBy("wk", F.col("pcell").alias("from_cell"),
                 F.col("cell").alias("to_cell"))
        .agg(
            F.count(F.lit(1)).alias("flows"),
            F.countDistinct("user_id").alias("movers"),
            F.sum("hop_mm").alias("dist_mm"),
        )
    )


def q_tfidf_keywords(spark, sf_dir):
    """Per-document TF-IDF keyword extraction (ops/textstats.
    tfidf_keywords): top-3 characteristic tokens per document with
    smoothed IDF; round-6 score, ties broken by binary token order."""
    from oshdb_spark.ops.textstats import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=3)


def q_simplify_tracks(spark, sf_dir):
    """Radial-distance trajectory simplification (geo/trajectory.
    simplify_radial): each user's clustered-walk fixes downsampled to
    ≥ 400 km spacing from the last KEPT fix — the sequential fold the
    oracle replays with a recursive CTE stepping arg_min to the next
    kept fix."""
    from oshdb_spark.geo.trajectory import simplify_radial

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return simplify_radial(pts, 400_000.0)


# shared by the batch AND streaming co-location queries: the streaming
# run is configured to replay the batch operator exactly
_COLOCATION_ORACLE = """
    -- brute-force pairs with the IDENTICAL equirect formula
    -- (degrees from fixed-point FIRST via * 1e-7, then
    -- differenced — term-for-term with equirect_distance_col);
    -- the <= 500 km filter applies to the UNROUNDED distance,
    -- quantization to integer mm happens before aggregation so
    -- every aggregate is an order-invariant BIGINT
    WITH pts AS (
      SELECT user_id AS uid,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             ((user_id // 2) % 24) * 150000000 - 1800000000
               + 75000000
               + (event_id*1103515245) % 60000001 - 30000000
               AS lon7,
             (((user_id // 2) // 24) % 8) * 150000000
               - 600000000 + 75000000
               + (event_id*1234567891) % 60000001 - 30000000
               AS lat7
      FROM events),
    f AS (
      SELECT uid, sec, lon7 * 1e-7 AS lon, lat7 * 1e-7 AS lat
      FROM pts
      WHERE lat7 >= -700000000 AND lat7 <= 700000000),
    d AS (
      SELECT ua, ub, 6371000.0 * sqrt(dx*dx + dy*dy) AS dist
      FROM (
        SELECT a.uid AS ua, b.uid AS ub,
               radians(b.lat - a.lat) AS dy,
               radians(b.lon - a.lon)
                 * cos(radians((a.lat + b.lat) / 2.0)) AS dx
        FROM f a JOIN f b
          ON a.uid < b.uid
         AND abs(a.sec - b.sec) <= 3600)),
    k AS (
      SELECT ua, ub,
             CAST(round(dist * 1000.0, 0) AS BIGINT) AS dist_mm
      FROM d WHERE dist <= 500000.0)
    SELECT ua AS uid_a, ub AS uid_b,
           count(*) AS contacts,
           min(dist_mm) AS min_dist_mm,
           CAST(sum(dist_mm) AS BIGINT) AS sum_dist_mm
    FROM k GROUP BY ua, ub
"""


def q_colocation_pairs(spark, sf_dir):
    """Spatio-temporal co-location join (geo/spatial_join.
    colocation_join): fix pairs of DIFFERENT users within 500 km and
    1 hour over the clustered-walk positions (adjacent user ids share a
    slot, so real contacts exist at every sf). Each qualifying fix pair
    meets in exactly one (cell, time-bucket) key — no dedup. Per ordered
    user pair: contact count, min and total mm-quantized distance (all
    BIGINT — fully hash-stable)."""
    from oshdb_spark.geo.spatial_join import colocation_join

    slot = (F.col("user_id") / 2).cast("long")
    fixes = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    right = fixes.withColumnRenamed("uid", "vid")
    j = colocation_join(fixes, right, 500_000.0, 3600).filter(
        F.col("uid") < F.col("vid")
    )
    mm = F.round(F.col("dist_m") * 1000.0, 0).cast("long")
    return (
        j.withColumn("dist_mm", mm)
        .groupBy(
            F.col("uid").alias("uid_a"), F.col("vid").alias("uid_b")
        )
        .agg(
            F.count(F.lit(1)).alias("contacts"),
            F.min("dist_mm").alias("min_dist_mm"),
            F.sum("dist_mm").alias("sum_dist_mm"),
        )
    )


def _geohash_duck_sql(lon_expr: str, lat_expr: str, precision: int) -> str:
    """DuckDB replay of geo/cells.geohash_col — identical bit layout
    (MSB-first stream, longitude even positions, scaled int64 floor-div
    cell indices, east/north edge clamp). Mirrors _geohash_terms
    term-for-term; change both together."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    n = 5 * precision
    lonbits = (n + 1) // 2
    latbits = n // 2
    ix = (
        f"(least((({lon_expr}) + 1800000000) * {1 << lonbits} "
        f"// 3600000000, {(1 << lonbits) - 1}))"
    )
    iy = (
        f"(least((({lat_expr}) + 900000000) * {1 << latbits} "
        f"// 1800000000, {(1 << latbits) - 1}))"
    )
    parts = []
    for i in range(precision):
        bits = []
        for k in range(5):
            b = 5 * i + k
            if b % 2 == 0:
                src, shift = ix, lonbits - 1 - b // 2
            else:
                src, shift = iy, latbits - 1 - (b - 1) // 2
            bits.append(f"((({src} >> {shift}) & 1) * {1 << (4 - k)})")
        parts.append(
            f"substr('{b32}', CAST({' + '.join(bits)} AS INT) + 1, 1)"
        )
    return "concat(" + ", ".join(parts) + ")"


def q_contour_lines(spark, sf_dir):
    """Raster→vector contour extraction (geo/cells.contour_segments):
    marching-squares iso-lines of the zoom-6 event-count raster at
    levels 1/2/4/8 — per level, segment count and total mm-quantized
    equirectangular length. The segment arithmetic is ONE dialect-common
    SQL fragment the oracle embeds verbatim."""
    from oshdb_spark.geo.cells import contour_segments

    seg = contour_segments(
        _event_cell_raster(spark, sf_dir), 6, [1, 2, 4, 8],
        value_col="cnt",
    )
    return seg.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("len_mm").alias("total_len_mm"),
    )


def _contour_oracle() -> str:
    from oshdb_spark.geo.cells import marching_squares_slot_sql

    slot_sel = []
    for slot in (1, 2):
        sx0, sy0, sx1, sy1 = marching_squares_slot_sql(slot, x="gx", y="gy")
        slot_sel.append(
            f"SELECT t AS level, {sx0} AS lx0, {sy0} AS ly0,"
            f" {sx1} AS lx1, {sy1} AS ly1 FROM lv"
        )
    slots = " UNION ALL ".join(slot_sel)
    return f"""
        -- marching-squares replay: block assembly by corner UNION +
        -- aggregation (no self-joins), then the IDENTICAL dialect-common
        -- segment fragment the engine runs through F.expr
        WITH pts AS (
          SELECT (event_id*1103515245) % 3600000000 - 1800000000 AS lon7,
                 (event_id*1234567891) % 1700000000 - 850000000 AS lat7
          FROM events),
        r AS (
          SELECT ((lat7 + 900000000) // 56250000) * 64
                 + ((lon7 + 1800000000) // 56250000) AS cell,
                 count(*) AS v
          FROM pts GROUP BY 1),
        p AS (SELECT cell % 64 AS cx, cell // 64 AS cy, v FROM r),
        corners AS (
          SELECT cx AS gx, cy AS gy, 0 AS c, v FROM p
          UNION ALL SELECT cx - 1, cy, 1, v FROM p
          UNION ALL SELECT cx, cy - 1, 2, v FROM p
          UNION ALL SELECT cx - 1, cy - 1, 3, v FROM p),
        blocks AS (
          SELECT gx, gy,
                 coalesce(max(CASE WHEN c = 0 THEN v END), 0) AS v00,
                 coalesce(max(CASE WHEN c = 1 THEN v END), 0) AS v10,
                 coalesce(max(CASE WHEN c = 2 THEN v END), 0) AS v01,
                 coalesce(max(CASE WHEN c = 3 THEN v END), 0) AS v11
          FROM corners GROUP BY 1, 2),
        lv AS (
          SELECT b.*, tt.t,
                 CAST(v00 > t AS INT) + 2 * CAST(v10 > t AS INT)
                 + 4 * CAST(v11 > t AS INT) + 8 * CAST(v01 > t AS INT)
                   AS ms_case
          FROM blocks b, (SELECT unnest([1, 2, 4, 8]) AS t) tt),
        seg AS ({slots}),
        k AS (
          SELECT level,
                 -180.0 + (lx0 + 0.5) * 5.625 AS x0d,
                 -90.0 + (ly0 + 0.5) * 5.625 AS y0d,
                 -180.0 + (lx1 + 0.5) * 5.625 AS x1d,
                 -90.0 + (ly1 + 0.5) * 5.625 AS y1d
          FROM seg WHERE lx0 IS NOT NULL),
        m AS (
          SELECT level,
                 CAST(round(6371000.0 * sqrt(
                   radians(y1d - y0d) * radians(y1d - y0d)
                   + (radians(x1d - x0d) * cos(radians((y0d + y1d) / 2.0)))
                     * (radians(x1d - x0d) * cos(radians((y0d + y1d) / 2.0)))
                 ) * 1000.0, 0) AS BIGINT) AS mm
          FROM k)
        SELECT level, count(*) AS n_segments,
               CAST(sum(mm) AS BIGINT) AS total_len_mm
        FROM m GROUP BY level
    """


def q_geohash_counts(spark, sf_dir):
    """Geohash binning (geo/cells.geohash_col): per-cell event counts at
    precision 3 over world-scattered positions — the base-32 interchange
    encoding, computed as one pure-int64 codegen expression (bisection
    parity incl. the classic ezs42 vector and pole/antimeridian clamps
    pinned in tests)."""
    from oshdb_spark.geo.cells import geohash_col

    pts = _t(spark, sf_dir, "events").select(
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    return (
        pts.select(geohash_col("lon7", "lat7", 3).alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_convex_hulls(spark, sf_dir):
    """Per-user strict convex hull (geo/hull.convex_hull_stats) over the
    clustered-walk fixes: vertex count, CD spherical area, equirect
    perimeter. The engine runs an exact-integer monotone chain in a
    grouped Arrow kernel; the oracle gift-wraps the SAME hull with a
    recursive CTE over exact HUGEINT cross products — two independent
    algorithms, identical vertex sequence by the strict-hull uniqueness
    + shared start/orientation convention."""
    from oshdb_spark.geo.hull import convex_hull_stats

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return convex_hull_stats(pts)


def q_sde_tracks(spark, sf_dir):
    """Per-user standard deviational ellipse (geo/trajectory.
    std_ellipse — ArcGIS Directional Distribution) over the same
    clustered-walk fixes as the convex-hull query: mean center,
    major-axis orientation, 1-σ axes. Moments are exact int64/decimal
    on both engines; every double consumes identical inputs."""
    from oshdb_spark.geo.trajectory import std_ellipse

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return std_ellipse(pts)


def q_heading_stats(spark, sf_dir):
    """Per-user circular heading statistics (geo/trajectory.
    heading_stats): mean bearing (atan2 of exact nano-quantized
    Σsin/Σcos — a plain bearing average is wrong at the 359°/1° wrap)
    and mean resultant length over the clustered-walk hops. One lag
    window + one aggregate, pure Catalyst."""
    from oshdb_spark.geo.trajectory import heading_stats

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return heading_stats(pts)


def q_stream_colocation(spark, sf_dir):
    """Structured Streaming co-location alerts (streaming/incremental.
    stream_colocation): the STREAM-STREAM self-join — fix pairs within
    500 km and 1 hour detected live across 3 ordered micro-batches
    (cross-batch pairs must come out of the join's buffered state), then
    rolled up per user pair exactly like the batch `colocation_pairs`
    query. Runs in the operator's explicit ``oracle_replay=True``
    verification mode (span-covering watermark — nothing evicted early),
    so the result replays the batch operator (and its oracle) exactly;
    the production default is the state-bounded disorder watermark."""
    import uuid

    from oshdb_spark.streaming.incremental import (
        read_event_stream,
        stream_colocation,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    slot = (F.col("user_id") / 2).cast("long")
    fixes = read_event_stream(spark, path, schema).select(
        F.col("user_id").alias("uid"),
        F.col("ts"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    pairs = stream_colocation(
        fixes, 500_000.0, 3600, oracle_replay=True
    ).filter(F.col("uid") < F.col("_r_uid"))
    out = pairs.select(
        F.col("uid").alias("uid_a"),
        F.col("_r_uid").alias("uid_b"),
        F.round(F.col("dist_m") * 1000.0, 0).cast("long").alias("dist_mm"),
    )
    name = "scl_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("uid_a", "uid_b").agg(
        F.count(F.lit(1)).alias("contacts"),
        F.min("dist_mm").alias("min_dist_mm"),
        F.sum("dist_mm").alias("sum_dist_mm"),
    )


def q_dbscan_fixes(spark, sf_dir):
    """Distributed DBSCAN (ops/clustering.dbscan_points) over the
    clustered-walk fixes: ε = 60 km, min_pts = 4. ε-pairs via the PBSM
    neighbor-cell join, cores by exact ε-degree, clusters = connected
    components of the core-core ε-graph (labels = component-min core
    id), borders attach to their minimum core-neighbor label. Per
    cluster: core/border counts and the member-id checksum — all
    BIGINT."""
    from oshdb_spark.ops.clustering import dbscan_points

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    lab = dbscan_points(pts, 60_000.0, 4)
    return lab.groupBy("cluster").agg(
        F.sum("is_core").alias("n_core"),
        F.sum(1 - F.col("is_core")).alias("n_border"),
        F.sum("pid").alias("pid_sum"),
    )


def q_moran_events(spark, sf_dir):
    """Global Moran's I spatial autocorrelation (geo/cells.moran_i) of
    the zoom-6 event-count raster — queen 3x3 excl. self. One output
    row; all aggregates exact int64 on both engines."""
    from oshdb_spark.geo.cells import moran_i

    return moran_i(_event_cell_raster(spark, sf_dir), 6)


def q_slope_cells(spark, sf_dir):
    """Horn's-method slope/aspect raster (geo/cells.slope_aspect) over
    the zoom-6 event-count surface: exact int64 gx/gy gradients
    (absent neighbors 0), float only in atan/atan2/sqrt from identical
    inputs, round(6)."""
    from oshdb_spark.geo.cells import slope_aspect

    return slope_aspect(_event_cell_raster(spark, sf_dir), 6)


def q_lisa_events(spark, sf_dir):
    """Local Moran's I / LISA cluster-outlier map (geo/cells.
    local_moran) of the zoom-6 event-count raster: per-cell I_i plus
    the HH/LL/HL/LH quadrant label. Integer-exact Z/Y/SZZ terms, one
    ((Z*Y)*N)/SZZ double division — bit-identical on both engines
    before round(6)."""
    from oshdb_spark.geo.cells import local_moran

    return local_moran(_event_cell_raster(spark, sf_dir), 6)


# shared focal-raster replay for the spatial-autocorrelation oracles
_FOCAL_CTE = """
    WITH r AS (
      SELECT ((lat7 + 900000000) // 56250000) * 64
             + ((lon7 + 1800000000) // 56250000) AS cell,
             count(*) AS cnt
      FROM (
        SELECT ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
               ((event_id*1234567891) % 1700000000) - 850000000 AS lat7
        FROM events)
      GROUP BY 1),
    contrib AS (
      SELECT ((cell // 64) + dy) * 64
             + ((cell % 64) + dx + 64) % 64 AS t, cnt
      FROM r,
           (VALUES (-1), (0), (1)) AS dxs(dx),
           (VALUES (-1), (0), (1)) AS dys(dy)
      WHERE (cell // 64) + dy BETWEEN 0 AND 31),
    agg AS (SELECT t, CAST(sum(cnt) AS BIGINT) AS s_f,
                   CAST(count(*) AS BIGINT) AS n_f
            FROM contrib GROUP BY 1)
"""

_HOTSPOT_GI_ORACLE = _FOCAL_CTE + """,
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cnt) AS BIGINT) AS s,
                 CAST(sum(cnt*cnt) AS BIGINT) AS s2 FROM r)
    SELECT r.cell, r.cnt,
           round(CAST(g.n*a.s_f - g.s*a.n_f AS DOUBLE)
                 / (sqrt(CAST(g.n*g.s2 - g.s*g.s AS DOUBLE))
                    * sqrt(CAST(g.n*a.n_f - a.n_f*a.n_f AS DOUBLE)
                           / CAST(g.n - 1 AS DOUBLE))), 6) AS gi_star
    FROM r JOIN agg a ON a.t = r.cell CROSS JOIN g
"""

# URL synthesis + canonicalization CTE chain (ends at c7: doc_id,
# canon, domain) — shared by the url_domains and split_domains oracles;
# mirrors _synthetic_url + ops/curation.with_canonical_url term-for-term
_URL_CANON_CTES = """            WITH u AS (
              SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'HTTPS'
                     ELSE 'http' END
                || '://'
                || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
                || 'site'
                || CAST(((doc_id // 7) * 1103515245) % 53 AS VARCHAR)
                || CASE WHEN (doc_id // 7) % 4 = 0 THEN '.com'
                        WHEN (doc_id // 7) % 4 = 1 THEN '.org'
                        WHEN (doc_id // 7) % 4 = 2 THEN '.net'
                        ELSE '.co.uk' END
                || '/a/' || CAST(doc_id // 7 AS VARCHAR)
                || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
                || CASE WHEN doc_id % 4 = 0 THEN
                       '?utm_source=feed&ref='
                       || CAST((doc_id // 7) % 9 AS VARCHAR)
                     WHEN doc_id % 4 = 1 THEN
                       '?ref=' || CAST((doc_id // 7) % 9 AS VARCHAR)
                       || '&utm_campaign=x'
                     WHEN doc_id % 4 = 2 THEN
                       '?ref=' || CAST((doc_id // 7) % 9 AS VARCHAR)
                     ELSE '' END
                || CASE WHEN doc_id % 3 = 1 THEN
                       '#sec' || CAST(doc_id % 3 AS VARCHAR)
                     ELSE '' END AS url
              FROM documents),
            c2 AS (
              SELECT doc_id,
                     split_part(CASE WHEN contains(lower(url), '://')
                                THEN split_part(lower(url), '://', 2)
                                ELSE lower(url) END, '#', 1) AS nofrag
              FROM u),
            c3 AS (
              SELECT doc_id,
                     split_part(nofrag, '?', 1) AS rawbase,
                     CASE WHEN contains(nofrag, '?')
                          THEN split_part(nofrag, '?', 2)
                          ELSE '' END AS q
              FROM c2),
            c4 AS (
              SELECT doc_id,
                     regexp_replace(rawbase, '/+$', '') AS b0,
                     array_to_string(
                       list_filter(string_split(q, '&'),
                         p -> (NOT (starts_with(p, 'utm_')
                                    OR starts_with(p, 'fbclid=')
                                    OR starts_with(p, 'gclid=')))
                              AND p <> ''), '&') AS qs
              FROM c3),
            c5 AS (
              SELECT doc_id, qs,
                     CASE WHEN starts_with(b0, 'www.')
                          THEN substring(b0, 5) ELSE b0 END AS base
              FROM c4),
            c6 AS (
              SELECT doc_id,
                     CASE WHEN qs <> '' THEN base || '?' || qs
                          ELSE base END AS canon,
                     split_part(base, '/', 1) AS host
              FROM c5),
            c7 AS (
              SELECT doc_id, canon,
                     CASE WHEN len(string_split(host, '.')) >= 2
                          THEN string_split(host, '.')[-2] || '.'
                               || string_split(host, '.')[-1]
                          ELSE host END AS domain
              FROM c6),"""

from oshdb_spark.ops.sampling import rate_threshold as _rt
_T_TRAIN = _rt(0.7)
_T_VAL = _rt(0.85)

_WALK_GRAPH_CTES = """
        p AS (
          SELECT user_id, event_id,
                 ((user_id // 2) % 24) * 150000000
                   - 1800000000 + 75000000
                   + (event_id*1103515245) % 60000001 - 30000000 AS lon7,
                 (((user_id // 2) // 24) % 8) * 150000000
                   - 600000000 + 75000000
                   + (event_id*1234567891) % 60000001 - 30000000 AS lat7
          FROM events),
        cp AS (
          SELECT user_id, event_id,
                 ((lat7 + 900000000) // 56250000) * 64
                 + ((lon7 + 1800000000) // 56250000) AS cell
          FROM p),
        hop AS (
          SELECT cell, lag(cell) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS pcell
          FROM cp),
        e0 AS MATERIALIZED (
          SELECT DISTINCT least(pcell, cell) AS u,
                          greatest(pcell, cell) AS v
          FROM hop WHERE pcell IS NOT NULL AND pcell <> cell)"""


def _bpe_oracle(rounds: int = 4) -> str:
    """Unrolled BPE replay: per round, adjacent-pair counts over the
    vocabulary representations, (count DESC, a, b) winner, and the
    SAME four-pass '·a·b·'→'·ab·' replace chain the engine applies."""
    ctes = ["""
        words AS (
          SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                     t -> regexp_matches(t, '^[a-z]{2,}$'))) AS w
            FROM documents) t
          GROUP BY 1),
        v0 AS MATERIALIZED (
          SELECT freq,
                 regexp_replace(w, '(.)', '·\\1', 'g') || '·' AS rep
          FROM words)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""
        s{r} AS (
          SELECT freq,
                 list_filter(string_split(rep, '·'),
                             s -> s != '') AS syms
          FROM v{r - 1}),
        e{r} AS (
          SELECT freq, syms,
                 unnest(generate_series(1, len(syms) - 1)) AS i
          FROM s{r}),
        p{r} AS (
          SELECT syms[i] AS a, syms[i + 1] AS b,
                 CAST(sum(freq) AS BIGINT) AS cnt
          FROM e{r} GROUP BY 1, 2),
        w{r} AS MATERIALIZED (
          SELECT a, b, cnt FROM (
            SELECT a, b, cnt, row_number() OVER (
                     ORDER BY cnt DESC, a, b) AS rn
            FROM p{r}) WHERE rn = 1),
        v{r} AS MATERIALIZED (
          SELECT v.freq,
                 replace(replace(replace(replace(v.rep,
                   '·' || w.a || '·' || w.b || '·',
                   '·' || w.a || w.b || '·'),
                   '·' || w.a || '·' || w.b || '·',
                   '·' || w.a || w.b || '·'),
                   '·' || w.a || '·' || w.b || '·',
                   '·' || w.a || w.b || '·'),
                   '·' || w.a || '·' || w.b || '·',
                   '·' || w.a || w.b || '·') AS rep
          FROM v{r - 1} v, w{r} w)""")
    sel = "\n            UNION ALL ".join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b, "
        f"cnt AS pair_count FROM w{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",".join(ctes) + " " + sel


def _lpa_oracle(rounds: int = 4) -> str:
    """Unrolled label-propagation replay over the clustered-walk cell
    graph: symmetric adjacency, l0 = own id, each round adopts the
    most frequent neighbor label (count DESC, label ASC) — the same
    deterministic total order the engine's max(struct(cnt, -label))
    encodes."""
    ctes = [_WALK_GRAPH_CTES, """
        adj AS MATERIALIZED (
          SELECT u, v FROM e0
          UNION ALL SELECT v AS u, u AS v FROM e0),
        l0 AS MATERIALIZED (
          SELECT DISTINCT u AS node, u AS lbl FROM adj)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
        c{i} AS (
          SELECT a.u AS n, l.lbl, count(*) AS c
          FROM adj a JOIN l{i - 1} l ON l.node = a.v
          GROUP BY 1, 2),
        l{i} AS MATERIALIZED (
          SELECT n AS node, lbl FROM (
            SELECT n, lbl, row_number() OVER (
                     PARTITION BY n ORDER BY c DESC, lbl) AS rn
            FROM c{i}) WHERE rn = 1)""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
        SELECT node, lbl AS label FROM l{rounds}"""
    )


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """Unrolled k-core peel replay: round i keeps nodes with degree
    >= k in round i-1's edge set, then edges with both endpoints kept;
    the final SELECT applies the same last degree filter the engine
    does. Plain CTE layers — the bounded-iteration oracle recipe of
    travel_cost/kmeans."""
    ctes = [_WALK_GRAPH_CTES]
    for i in range(rounds):
        ctes.append(f"""
        k{i} AS MATERIALIZED (
          SELECT n FROM (SELECT u AS n FROM e{i}
                         UNION ALL SELECT v FROM e{i})
          GROUP BY 1 HAVING count(*) >= {k}),
        e{i + 1} AS MATERIALIZED (
          SELECT e{i}.u, e{i}.v FROM e{i}
          JOIN k{i} a ON a.n = e{i}.u
          JOIN k{i} b ON b.n = e{i}.v)""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
        SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT u AS n FROM e{rounds}
              UNION ALL SELECT v FROM e{rounds})
        GROUP BY 1 HAVING count(*) >= {k}"""
    )


_MORAN_EVENTS_ORACLE = _FOCAL_CTE + """,
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cnt) AS BIGINT) AS s FROM r),
    t AS (
      SELECT g.n AS n,
             g.n*r.cnt - g.s AS z,
             g.n*(a.s_f - r.cnt) - (a.n_f - 1)*g.s AS y,
             a.n_f - 1 AS w
      FROM r JOIN agg a ON a.t = r.cell CROSS JOIN g)
    SELECT n AS n_cells,
           CAST(sum(w) AS BIGINT) AS w_pairs,
           round((CAST(n AS DOUBLE)
                  * CAST(CAST(sum(z*y) AS BIGINT) AS DOUBLE))
                 / (CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
                    * CAST(CAST(sum(z*z) AS BIGINT) AS DOUBLE)), 9)
             AS moran_i
    FROM t GROUP BY n
"""

# reuses the focal raster CTEs (the unused focal `agg` CTE is never
# evaluated — non-materialized)
_SLOPE_CELLS_ORACLE = _FOCAL_CTE + """,
    dirs AS (
      SELECT ((cell // 64) + dy) * 64
             + ((cell % 64) + dx + 64) % 64 AS t,
             -dx AS rdx, -dy AS rdy, cnt
      FROM r,
           (VALUES (-1), (0), (1)) AS dxs(dx),
           (VALUES (-1), (0), (1)) AS dys(dy)
      WHERE (cell // 64) + dy BETWEEN 0 AND 31),
    g AS (
      SELECT t,
        CAST((coalesce(sum(CASE WHEN rdx=1 AND rdy=1 THEN cnt END),0)
          + 2*coalesce(sum(CASE WHEN rdx=1 AND rdy=0 THEN cnt END),0)
          + coalesce(sum(CASE WHEN rdx=1 AND rdy=-1 THEN cnt END),0))
         -(coalesce(sum(CASE WHEN rdx=-1 AND rdy=1 THEN cnt END),0)
          + 2*coalesce(sum(CASE WHEN rdx=-1 AND rdy=0 THEN cnt END),0)
          + coalesce(sum(CASE WHEN rdx=-1 AND rdy=-1 THEN cnt END),0))
         AS BIGINT) AS gx,
        CAST((coalesce(sum(CASE WHEN rdx=-1 AND rdy=1 THEN cnt END),0)
          + 2*coalesce(sum(CASE WHEN rdx=0 AND rdy=1 THEN cnt END),0)
          + coalesce(sum(CASE WHEN rdx=1 AND rdy=1 THEN cnt END),0))
         -(coalesce(sum(CASE WHEN rdx=-1 AND rdy=-1 THEN cnt END),0)
          + 2*coalesce(sum(CASE WHEN rdx=0 AND rdy=-1 THEN cnt END),0)
          + coalesce(sum(CASE WHEN rdx=1 AND rdy=-1 THEN cnt END),0))
         AS BIGINT) AS gy
      FROM dirs GROUP BY 1)
    SELECT r.cell, r.cnt, g.gx, g.gy,
           round(degrees(atan(
             sqrt(CAST(g.gx AS DOUBLE) * CAST(g.gx AS DOUBLE)
                  + CAST(g.gy AS DOUBLE) * CAST(g.gy AS DOUBLE))
             / 8.0)), 6) AS slope_deg,
           CASE WHEN g.gx <> 0 OR g.gy <> 0 THEN
             round(degrees(atan2(CAST(g.gy AS DOUBLE),
                                 CAST(g.gx AS DOUBLE))), 6)
           END AS aspect_deg
    FROM r JOIN g ON g.t = r.cell
"""

_LISA_EVENTS_ORACLE = _FOCAL_CTE + """,
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cnt) AS BIGINT) AS s FROM r),
    g2 AS (SELECT g.n AS n, g.s AS s,
                  CAST(sum((g.n*r.cnt - g.s)*(g.n*r.cnt - g.s))
                       AS BIGINT) AS szz
           FROM r CROSS JOIN g GROUP BY g.n, g.s),
    t AS (
      SELECT r.cell, r.cnt, g2.n, g2.szz,
             g2.n*r.cnt - g2.s AS z,
             g2.n*(a.s_f - r.cnt) - (a.n_f - 1)*g2.s AS y
      FROM r JOIN agg a ON a.t = r.cell CROSS JOIN g2)
    SELECT cell, cnt,
           round(CAST(z AS DOUBLE) * CAST(y AS DOUBLE)
                 * CAST(n AS DOUBLE) / CAST(szz AS DOUBLE), 6)
             AS local_i,
           CASE WHEN z > 0 AND y > 0 THEN 'HH'
                WHEN z < 0 AND y < 0 THEN 'LL'
                WHEN z > 0 AND y < 0 THEN 'HL'
                WHEN z < 0 AND y > 0 THEN 'LH'
                ELSE 'NA' END AS quadrant
    FROM t
"""


# named geofences shared by the Spark query, the streaming tracker test
# and the generated oracle (int64 fixed-point, INCLUSIVE edges)
_GEOFENCES = {
    "eq_band": (-500_000_000, -100_000_000, 500_000_000, 100_000_000),
    "west": (-1_500_000_000, 100_000_000, -800_000_000, 600_000_000),
    "east": (300_000_000, -700_000_000, 1_200_000_000, 0),
    "pacific": (1_400_000_000, -300_000_000, 1_750_000_000, 400_000_000),
}


def _geofence_points(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        (
            F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )


def q_geofence_transitions(spark, sf_dir):
    """Geofence enter/exit detection (geo/trajectory.
    geofence_transitions): per-user event trajectories against 4 named
    bbox fences — first observation inside emits 'enter', the next
    observation outside emits 'exit'. Inside-ness is an INCLUSIVE int64
    compare (exact on every engine); the plan is a codegen fence fan-out
    + one window shuffle on (user, fence), no joins, no Python. The
    streaming sibling (geofence_tracker) emits identical rows
    incrementally (parity pinned in tests/test_streaming.py)."""
    from oshdb_spark.geo.trajectory import geofence_transitions

    return geofence_transitions(
        _geofence_points(spark, sf_dir),
        _GEOFENCES,
        order_cols=("event_id",),
    )


def _geofence_oracle() -> str:
    vals = ", ".join(
        f"('{name}', {w}, {s}, {e}, {n})"
        for name, (w, s, e, n) in sorted(_GEOFENCES.items())
    )
    return f"""
        WITH pts AS (
          SELECT user_id, event_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                 ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
                 ((event_id*1234567891) % 1700000000) - 850000000 AS lat7
          FROM events),
        fx AS (SELECT * FROM (VALUES {vals}) AS f(fence, w, s, e, n)),
        m AS (
          SELECT user_id, fence, sec, event_id,
                 (lon7 >= w AND lon7 <= e AND lat7 >= s AND lat7 <= n)
                   AS inn
          FROM pts CROSS JOIN fx),
        lagd AS (
          SELECT user_id, fence, sec, inn,
                 lag(inn) OVER (PARTITION BY user_id, fence
                                ORDER BY sec, event_id) AS pin
          FROM m)
        SELECT user_id, fence,
               CASE WHEN inn THEN 'enter' ELSE 'exit' END AS kind, sec
        FROM lagd
        WHERE (inn AND (pin IS NULL OR NOT pin)) OR (NOT inn AND pin)
    """


# Osmosis .poly query area for poly_aoi_filter: a convex CCW pentagon.
# Parsed by oshdb_spark.sources.poly (TestPolyFileReader.java parity); the
# Spark predicate AND the DuckDB oracle are both generated from the parsed
# ring, so the two sides agree by construction.
_POLY_AOI_TEXT = """engine-test-area
1
   120.0 0.0
   37.0 57.0
   -97.0 35.0
   -97.0 -35.0
   37.0 -57.0
END
END
"""


def _poly_aoi_ring():
    from oshdb_spark.sources.poly import parse_poly

    kind, rings = parse_poly(_POLY_AOI_TEXT)
    assert kind == "Polygon"
    return rings[0]  # closed, CCW


def q_poly_aoi_filter(spark, sf_dir):
    """areaOfInterest from an Osmosis .poly file: event points filtered by
    a convex polygon expressed as half-plane conjunctions over the PARSED
    ring — pure codegen (no UDF), pushdown-friendly at 100 TB."""
    ring = _poly_aoi_ring()
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon", lon7 / 1e7).withColumn("lat", lat7 / 1e7)
    pred = F.lit(True)
    for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
        cross = (F.lit(float(x1 - x0)) * (F.col("lat") - float(y0))
                 - F.lit(float(y1 - y0)) * (F.col("lon") - float(x0)))
        pred = pred & (cross >= 0)
    zone = F.floor(F.col("lat") / 30.0).cast("long")
    return (
        pts.filter(pred)
        .withColumn("zone", zone)
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
    )


def _poly_aoi_oracle() -> str:
    ring = _poly_aoi_ring()
    edges = " AND ".join(
        f"(({x1!r} - {x0!r}) * (lat - {y0!r}) - ({y1!r} - {y0!r}) * (lon - {x0!r})) >= 0"
        for (x0, y0), (x1, y1) in zip(ring[:-1].tolist(), ring[1:].tolist())
    )
    return f"""
        SELECT CAST(floor(lat / 30.0) AS BIGINT) AS zone,
               count(*) AS cnt, round(sum(value), 2) AS sum_val
        FROM (
          SELECT (((event_id*1103515245) % 3600000000) - 1800000000) / 1e7 AS lon,
                 (((event_id*1234567891) % 1700000000) - 850000000) / 1e7 AS lat,
                 value
          FROM events)
        WHERE {edges}
        GROUP BY 1
    """


def q_geodesic_traj_length(spark, sf_dir):
    """Per-entity trajectory length over visible versions in version order,
    with the reference's exact equirectangular formula (Geo.java:37-45) —
    expressed in pure Catalyst (window lag + trig built-ins)."""
    from pyspark.sql import Window

    v = versions_from_events(_t(spark, sf_dir, "events")).filter("visible")
    w = Window.partitionBy("id").orderBy("version")
    v = (
        v.withColumn("plon", F.lag(F.col("lon") / 1e7).over(w))
        .withColumn("plat", F.lag(F.col("lat") / 1e7).over(w))
        .withColumn("lond", F.col("lon") / 1e7)
        .withColumn("latd", F.col("lat") / 1e7)
        .filter(F.col("plon").isNotNull())
    )
    dlat = F.radians(F.col("latd") - F.col("plat"))
    dlng = F.radians(F.col("lond") - F.col("plon")) * F.cos(
        F.radians((F.col("latd") + F.col("plat")) / 2.0)
    )
    seg = F.lit(6371000.0) * F.sqrt(dlng * dlng + dlat * dlat)
    return (
        v.withColumn("seg", seg)
        .groupBy("id")
        .agg(F.round(F.sum("seg"), 0).alias("traj_m"))
    )


def q_stay_points(spark, sf_dir):
    """Trajectory stay-point (dwell) detection (geo/trajectory.stay_points):
    per-user dwell segments via gaps-and-islands windows — a hop whose
    equirectangular distance to the previous point exceeds 5,000 km
    starts a new segment; stays span ≥1 h and ≥3 points. Centroids are
    exact integer averages of the fixed-point coordinates. Pure Catalyst,
    one shuffle on the entity key."""
    from oshdb_spark.geo.trajectory import stay_points

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        (
            F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    return stay_points(
        ev,
        order_cols=("event_id",),
        dist_m=5_000_000.0,
        min_dwell_s=3600,
        min_pts=3,
    )


def q_zonal_sum_latband(spark, sf_dir):
    """Zonal aggregation: 10° latitude bands as zones, sum of event value."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    zone = F.floor((lat7 + 850_000_000) / 100_000_000).cast("long")
    return (
        ev.withColumn("zone", zone)
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
    )


# convex quadrilateral AOI with off-lattice vertices (no lattice point can
# sit exactly on an edge, so crossing-number and half-plane tests agree)
_POLY = [
    (-100.0000017, -50.0000031),
    (80.0000013, -60.0000029),
    (120.0000019, 50.0000023),
    (-80.0000011, 60.0000037),
    (-100.0000017, -50.0000031),
]


def q_snapshot_polygon(spark, sf_dir):
    """Snapshot kernel with POLYGON AOI (exact PiP boundary clipping)."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(polygon=[_POLY])
        .osm_type("node")
        .aggregate_by_timestamp()
        .count()
    )


# two rectilinear polygons (off-lattice vertices) whose intersection is a
# DISJOINT MultiPolygon — exercises the multi-piece composed-AOI path
# (reference: JTS Geometry.intersection, MapReducer.java:242-270)
_U_POLY = [
    (-170.00000005, -80.00000005),
    (160.00000005, -80.00000005),
    (160.00000005, 70.00000005),
    (50.00000005, 70.00000005),
    (50.00000005, -30.00000005),
    (-60.00000005, -30.00000005),
    (-60.00000005, 70.00000005),
    (-170.00000005, 70.00000005),
    (-170.00000005, -80.00000005),
]
_BAR_POLY = [
    (-175.00000005, -5.00000005),
    (165.00000005, -5.00000005),
    (165.00000005, 45.00000005),
    (-175.00000005, 45.00000005),
    (-175.00000005, -5.00000005),
]


def q_snapshot_multi_aoi(spark, sf_dir):
    """Composed polygon AOIs intersecting into a disjoint 2-piece
    MultiPolygon (U-shape ∧ bar): node snapshot counts. The engine
    carries the multi-piece AOI through every predicate stage."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(polygon=[_U_POLY])
        .area_of_interest(polygon=[_BAR_POLY])
        .osm_type("node")
        .aggregate_by_timestamp()
        .count()
    )


def q_snapshot_tag_regex(spark, sf_dir):
    """tag-regex filter (osmTag(key, Pattern)) through the node SQL path."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("node")
        .osm_tag("event_type", regex="^(click|view)$")
        .without_geometry()
        .aggregate_by_timestamp()
        .count()
    )


def q_snapshot_by_ts_and_tag(spark, sf_dir):
    """Chained combined-index aggregation (OSHDBCombinedIndex analog) with
    cross-product zerofill: count by (ts, event_type)."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    etypes = ["click", "error", "purchase", "signup", "view"]
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("node")
        .without_geometry()
        .aggregate_by_timestamp()
        .aggregate_by("etype", "tags['event_type']", zerofill_values=etypes)
        .count()
    )


def q_snapshot_tag_any(spark, sf_dir):
    """OR-of-tags filter (osmTag(Collection), MapReducer.java:595-632)
    through the node SQL path — the tag_any grammar node compiles to an
    OR predicate pushed into the scan."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("node")
        .osm_tag_any(("event_type", "click"), ("event_type", "signup"))
        .without_geometry()
        .aggregate_by_timestamp()
        .count()
    )


# general-position rect polygon AOI: half-fixed-point offsets (…5e-8°)
# cannot coincide with any integer-lattice square coordinate, so no
# collinear-edge / vertex-on-edge degeneracies can occur
_CLIP_RECT = (-100.00000135, -50.00000195, 80.00000175, 40.00000235)


def q_polygon_clip_area(spark, sf_dir):
    """Exact polygon∩polygon clipping (≙ JTS intersection in Geo.clip,
    Geo.java:185-191, applied by CellIterator.java:349-378): per-user
    squares clipped to a polygon AOI, Chamberlain–Duquette area of the
    CLIPPED geometry. Fully-inside squares keep their area, boundary
    squares lose exactly the cut, outside squares don't appear."""
    from oshdb_spark.geo.measures import wkb_area_m2
    from oshdb_spark.model.history import multipolygon_docs_from_events

    w, s, e, n = _CLIP_RECT
    ring = [(w, s), (e, s), (e, n), (w, n), (w, s)]
    docs = multipolygon_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps([SNAPSHOT_TS[-1]])
        .area_of_interest(polygon=[ring])
        .osm_type("relation")
        .dataframe()
    )
    return snaps.select(
        "id",
        F.round(wkb_area_m2("geom_clipped_wkb") / 1e6, 3).alias("clip_km2"),
    )


def q_entity_history(spark, sf_dir):
    """groupByEntity analog: full-history per-entity contribution summary."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps([1704067200, 1707091200])  # whole Jan 2024
        .osm_type("node")
        .without_geometry()
        .dataframe()
    )
    return df.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_contribs"),
        F.sum(F.size("contrib_types")).alias("n_types"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def q_contrib_uniq_contributors(spark, sf_dir):
    """Exact countUniq reducer over the contribution view."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("node")
        .without_geometry()
        .dataframe()
    )
    return (
        df.select(F.explode("contrib_types").alias("contrib_type"), "contributor_uid")
        .groupBy("contrib_type")
        .agg(F.countDistinct("contributor_uid").alias("uniq_contributors"))
    )


def q_contrib_uniq_approx(spark, sf_dir):
    """HLL++ estimated countUniq (Aggregator.count_uniq_approx) over the
    contribution view. Like quantile_sketch, the sketch value itself is
    backend-defined, so the oracle-checked contract is its accuracy: emit
    the exact distinct count (DuckDB-verifiable) plus a boolean asserting
    the HLL estimate lies within 5% of it."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("node")
        .without_geometry()
        .dataframe()
    )
    per_type = df.select(
        F.explode("contrib_types").alias("contrib_type"), "contributor_uid"
    )
    est = per_type.groupBy("contrib_type").agg(
        F.approx_count_distinct("contributor_uid", 0.02).alias("est"),
        F.countDistinct("contributor_uid").alias("uniq_contributors"),
    )
    return est.select(
        "contrib_type",
        "uniq_contributors",
        (
            F.abs(F.col("est") - F.col("uniq_contributors"))
            <= 0.05 * F.col("uniq_contributors")
        ).alias("within_5pct"),
    )


def q_ring_area(spark, sf_dir):
    """Chamberlain–Duquette spherical ring area (Geo.java:147-179 parity):
    per entity, the triangle of its first three geometry epochs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    from oshdb_spark.geo.geodesy import polygon_area
    from oshdb_spark.model.history import LAT_MOD, LON_MOD

    users = _t(spark, sf_dir, "events").select("user_id").distinct()
    for g in range(3):
        users = users.withColumn(
            f"lon{g}",
            (F.pmod(F.col("user_id") * F.lit(1103515245) + g * 1000003, F.lit(LON_MOD))
             - LON_MOD // 2) * 1e-7,
        ).withColumn(
            f"lat{g}",
            (F.pmod(F.col("user_id") * F.lit(1234567891) + g * 999983, F.lit(LAT_MOD))
             - LAT_MOD // 2) * 1e-7,
        )

    @F.pandas_udf(DoubleType())
    def tri_area(lon0, lat0, lon1, lat1, lon2, lat2):
        out = np.empty(len(lon0))
        for i in range(len(lon0)):
            ring = np.array(
                [
                    (lon0.iat[i], lat0.iat[i]),
                    (lon1.iat[i], lat1.iat[i]),
                    (lon2.iat[i], lat2.iat[i]),
                    (lon0.iat[i], lat0.iat[i]),
                ]
            )
            out[i] = polygon_area([ring])
        return pd.Series(out)

    return users.select(
        F.col("user_id").alias("id"),
        F.round(
            tri_area("lon0", "lat0", "lon1", "lat1", "lon2", "lat2") / 1e6, 3
        ).alias("area_km2"),
    )


def q_way_snapshot_length(spark, sf_dir):
    """WAY snapshot path (member-recursion kernel): per timestamp, count
    of way snapshots and total equirectangular length of their as-of
    geometries (member nodes move independently)."""
    from oshdb_spark.geo.measures import wkb_length_m
    from oshdb_spark.model.history import way_docs_from_events

    docs = way_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("way")
        .dataframe()
    )
    return (
        snaps.withColumn("len_m", wkb_length_m("geom_wkb"))
        .groupBy("ts")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("len_m"), 0).alias("total_len_m"),
        )
    )


def q_relation_snapshot_length(spark, sf_dir):
    """RELATION snapshot path (recursive member windows, way-member as-of
    resolution, geometry-collection fallback): total member length per ts.
    Point members contribute 0 length, so the way oracle applies."""
    from oshdb_spark.geo.measures import wkb_length_m
    from oshdb_spark.model.history import relation_docs_from_events

    docs = relation_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("relation")
        .dataframe()
    )
    return (
        snaps.withColumn("len_m", wkb_length_m("geom_wkb"))
        .groupBy("ts")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("len_m"), 0).alias("total_len_m"),
        )
    )


def q_way_polygon_clip(spark, sf_dir):
    """WAY snapshots under a POLYGON AOI with exact line clipping: per ts,
    count of ways intersecting the polygon and total CLIPPED length. The
    kernel routes fully-inside way docs through the vectorized path and
    demotes boundary-crossing docs to the exact per-doc clip
    (clip_line_to_polygon ≙ JTS line∩polygon in Geo.clip); the oracle
    clips each segment with the rect param-window (Liang-Barsky in SQL)."""
    from oshdb_spark.geo.measures import wkb_length_m
    from oshdb_spark.model.history import way_docs_from_events

    w, s, e, n = _CLIP_RECT
    ring = [(w, s), (e, s), (e, n), (w, n), (w, s)]
    docs = way_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(polygon=[ring])
        .osm_type("way")
        .dataframe()
    )
    return (
        snaps.withColumn("len_m", wkb_length_m("geom_clipped_wkb"))
        .groupBy("ts")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("len_m"), 0).alias("clip_len_m"),
        )
    )


# off-lattice region rects for the geometry splitter (edges can never
# coincide with integer-lattice coordinates); west/east split at lon≈0,
# band overlaps both
_SPLIT_REGIONS = {
    "west": (-180.00000015, -85.00000025, 0.00000035, 85.00000045),
    "east": (0.00000035, -85.00000025, 180.00000015, 85.00000045),
    "band": (-90.00000055, -30.00000065, 90.00000075, 30.00000085),
}


def q_way_length_by_region(spark, sf_dir):
    """aggregateByGeometry with per-region geometry RE-CLIPPING
    (GeometrySplitter.java:80-124): a boundary-straddling way's length
    splits across regions — each (ts, region) sums the length of the
    way∩region piece, not whole-way assignment by position."""
    from oshdb_spark.geo.measures import wkb_length_m
    from oshdb_spark.geo.spatial_join import split_geoms_by_regions
    from oshdb_spark.model.history import way_docs_from_events

    docs = way_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("way")
        .dataframe()
    )
    split = split_geoms_by_regions(snaps, _SPLIT_REGIONS, geom_col="geom_wkb")
    return (
        split.withColumn("len_m", wkb_length_m("region_wkb"))
        .groupBy("ts", "region")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("len_m"), 0).alias("len_m_sum"),
        )
    )


def _way_region_oracle() -> str:
    """Param-window (Liang-Barsky) clip of each way segment against each
    region rect — the DuckDB mirror of split_geoms_by_regions over the
    way workload."""
    prefix = """
        WITH ded AS (
          SELECT event_id, user_id, sec FROM (
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   row_number() OVER (
                     PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                     ORDER BY event_id) AS rn
            FROM events) WHERE rn = 1),
        ev AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                   AS urn
          FROM ded),
        nodes AS (
          SELECT user_id, urn % 3 AS j, user_id*10 + (urn % 3) AS node_id,
                 sec,
                 row_number() OVER (PARTITION BY user_id, urn % 3
                                    ORDER BY sec) AS k
          FROM ev),
        wsec AS (
          SELECT user_id, max(fs) AS way_sec FROM (
            SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
          GROUP BY 1),
        grid AS (SELECT unnest(""" + _TS_LIST + """) AS ts),
        nasof AS (
          SELECT g.ts, n.user_id, n.j, n.node_id, max(n.k) AS k
          FROM nodes n JOIN grid g ON n.sec <= g.ts
          GROUP BY 1, 2, 3, 4),
        pos AS (
          SELECT ts, user_id, j,
            (((node_id*1103515245 + k*1000003) % 3600000000)
              - 1800000000) * 1e-7 AS lon,
            (((node_id*1234567891 + k*999983) % 1700000000)
              - 850000000) * 1e-7 AS lat
          FROM nasof),
        pv AS (
          SELECT ts, user_id,
            max(CASE WHEN j = 0 THEN lon END) AS lon0,
            max(CASE WHEN j = 0 THEN lat END) AS lat0,
            max(CASE WHEN j = 1 THEN lon END) AS lon1,
            max(CASE WHEN j = 1 THEN lat END) AS lat1,
            max(CASE WHEN j = 2 THEN lon END) AS lon2,
            max(CASE WHEN j = 2 THEN lat END) AS lat2
          FROM pos JOIN wsec USING (user_id)
          WHERE wsec.way_sec <= pos.ts
          GROUP BY 1, 2),
        seg AS (
          SELECT ts, user_id, lon0 AS x0, lat0 AS y0,
                 lon1 AS x1, lat1 AS y1 FROM pv
          UNION ALL
          SELECT ts, user_id, lon1, lat1, lon2, lat2 FROM pv)
    """
    region_sel = []
    for name, (w, s, e, n) in _SPLIT_REGIONS.items():
        region_sel.append(f"""
          SELECT '{name}' AS region, ts, user_id,
            greatest(0.0,
              CASE WHEN x1 = x0 THEN
                (CASE WHEN x0 >= {w!r} AND x0 <= {e!r} THEN 0.0 ELSE 1e30 END)
              ELSE least(({w!r} - x0)/(x1 - x0), ({e!r} - x0)/(x1 - x0)) END,
              CASE WHEN y1 = y0 THEN
                (CASE WHEN y0 >= {s!r} AND y0 <= {n!r} THEN 0.0 ELSE 1e30 END)
              ELSE least(({s!r} - y0)/(y1 - y0), ({n!r} - y0)/(y1 - y0)) END
            ) AS t0,
            least(1.0,
              CASE WHEN x1 = x0 THEN
                (CASE WHEN x0 >= {w!r} AND x0 <= {e!r} THEN 1.0 ELSE -1e30 END)
              ELSE greatest(({w!r} - x0)/(x1 - x0), ({e!r} - x0)/(x1 - x0)) END,
              CASE WHEN y1 = y0 THEN
                (CASE WHEN y0 >= {s!r} AND y0 <= {n!r} THEN 1.0 ELSE -1e30 END)
              ELSE greatest(({s!r} - y0)/(y1 - y0), ({n!r} - y0)/(y1 - y0)) END
            ) AS t1,
            x0, y0, x1, y1
          FROM seg
        """)
    return prefix + f""",
        win AS ({' UNION ALL '.join(region_sel)}),
        cl AS (
          SELECT region, ts, user_id,
            x0 + (x1 - x0)*t0 AS ax, y0 + (y1 - y0)*t0 AS ay,
            x0 + (x1 - x0)*t1 AS bx, y0 + (y1 - y0)*t1 AS "by"
          FROM win WHERE t1 > t0),
        lens AS (
          SELECT region, ts, user_id,
            6371000.0 * sqrt(
              pow(radians(bx - ax) * cos(radians((ay + "by")/2.0)), 2)
              + pow(radians("by" - ay), 2)) AS len_m
          FROM cl)
        SELECT ts, region, count(DISTINCT user_id) AS cnt,
               round(sum(len_m), 0) AS len_m_sum
        FROM lens GROUP BY 1, 2
    """


def q_contrib_length_by_region(spark, sf_dir):
    """Contribution-view geometry splitter with per-region RE-CLIPPING of
    BOTH sides (GeometrySplitter.java:141-203): each contribution's
    way-length delta (after∩region − before∩region) splits at the region
    edge — a boundary-crossing node move attributes only the in-region
    length change to each region, not the whole delta."""
    from oshdb_spark.geo.measures import wkb_length_m
    from oshdb_spark.geo.spatial_join import (
        split_contribution_geoms_by_regions,
    )
    from oshdb_spark.model.history import way_docs_from_events

    docs = way_docs_from_events(_t(spark, sf_dir, "events"))
    contribs = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("way")
        .dataframe()
    )
    split = split_contribution_geoms_by_regions(
        contribs, _SPLIT_REGIONS,
        before_col="geom_before_wkb", after_col="geom_after_wkb",
    )
    return (
        split.withColumn("blen", wkb_length_m("region_before_wkb"))
        .withColumn("alen", wkb_length_m("region_after_wkb"))
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col("alen") - F.col("blen")), 0).alias("dlen_m"),
        )
    )


def _contrib_region_oracle() -> str:
    """Way-contribution region splitter oracle: replay node-version
    history, take each node-change sec in the interval as a contribution,
    reconstruct before/after 3-node polylines, Liang-Barsky-clip both
    sides per region, and aggregate the clipped length delta."""
    prefix = f"""
        WITH ded AS (
          SELECT event_id, user_id, sec FROM (
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   row_number() OVER (
                     PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                     ORDER BY event_id) AS rn
            FROM events) WHERE rn = 1),
        ev AS (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                   AS urn
          FROM ded),
        nodes AS (
          SELECT user_id, urn % 3 AS j, user_id*10 + (urn % 3) AS node_id,
                 sec,
                 row_number() OVER (PARTITION BY user_id, urn % 3
                                    ORDER BY sec) AS k
          FROM ev),
        wsec AS (
          SELECT user_id, max(fs) AS way_sec FROM (
            SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
          GROUP BY 1),
        csec AS (
          SELECT DISTINCT n.user_id, n.sec AS cs
          FROM nodes n JOIN wsec w USING (user_id)
          WHERE n.sec > w.way_sec
            AND n.sec >= {CONTRIB_INTERVAL[0]}
            AND n.sec < {CONTRIB_INTERVAL[1]}),
        aftk AS (
          SELECT c.user_id, c.cs, n.j, max(n.k) AS k
          FROM csec c JOIN nodes n
            ON n.user_id = c.user_id AND n.sec <= c.cs
          GROUP BY 1, 2, 3),
        befk AS (
          SELECT c.user_id, c.cs, n.j, max(n.k) AS k
          FROM csec c JOIN nodes n
            ON n.user_id = c.user_id AND n.sec < c.cs
          GROUP BY 1, 2, 3),
        posa AS (
          SELECT user_id, cs, j,
            (((user_id*10 + j)*1103515245 + k*1000003) % 3600000000
              - 1800000000) * 1e-7 AS lon,
            (((user_id*10 + j)*1234567891 + k*999983) % 1700000000
              - 850000000) * 1e-7 AS lat
          FROM aftk),
        posb AS (
          SELECT user_id, cs, j,
            (((user_id*10 + j)*1103515245 + k*1000003) % 3600000000
              - 1800000000) * 1e-7 AS lon,
            (((user_id*10 + j)*1234567891 + k*999983) % 1700000000
              - 850000000) * 1e-7 AS lat
          FROM befk),
        pva AS (
          SELECT user_id, cs,
            max(CASE WHEN j = 0 THEN lon END) AS lon0,
            max(CASE WHEN j = 0 THEN lat END) AS lat0,
            max(CASE WHEN j = 1 THEN lon END) AS lon1,
            max(CASE WHEN j = 1 THEN lat END) AS lat1,
            max(CASE WHEN j = 2 THEN lon END) AS lon2,
            max(CASE WHEN j = 2 THEN lat END) AS lat2
          FROM posa GROUP BY 1, 2),
        pvb AS (
          SELECT user_id, cs,
            max(CASE WHEN j = 0 THEN lon END) AS lon0,
            max(CASE WHEN j = 0 THEN lat END) AS lat0,
            max(CASE WHEN j = 1 THEN lon END) AS lon1,
            max(CASE WHEN j = 1 THEN lat END) AS lat1,
            max(CASE WHEN j = 2 THEN lon END) AS lon2,
            max(CASE WHEN j = 2 THEN lat END) AS lat2
          FROM posb GROUP BY 1, 2),
        seg AS (
          SELECT user_id, cs, 'a' AS side, lon0 AS x0, lat0 AS y0,
                 lon1 AS x1, lat1 AS y1 FROM pva
          UNION ALL
          SELECT user_id, cs, 'a', lon1, lat1, lon2, lat2 FROM pva
          UNION ALL
          SELECT user_id, cs, 'b', lon0, lat0, lon1, lat1 FROM pvb
          UNION ALL
          SELECT user_id, cs, 'b', lon1, lat1, lon2, lat2 FROM pvb)
    """
    region_sel = []
    for name, (w, s, e, n) in _SPLIT_REGIONS.items():
        region_sel.append(f"""
          SELECT '{name}' AS region, user_id, cs, side,
            greatest(0.0,
              CASE WHEN x1 = x0 THEN
                (CASE WHEN x0 >= {w!r} AND x0 <= {e!r} THEN 0.0 ELSE 1e30 END)
              ELSE least(({w!r} - x0)/(x1 - x0), ({e!r} - x0)/(x1 - x0)) END,
              CASE WHEN y1 = y0 THEN
                (CASE WHEN y0 >= {s!r} AND y0 <= {n!r} THEN 0.0 ELSE 1e30 END)
              ELSE least(({s!r} - y0)/(y1 - y0), ({n!r} - y0)/(y1 - y0)) END
            ) AS t0,
            least(1.0,
              CASE WHEN x1 = x0 THEN
                (CASE WHEN x0 >= {w!r} AND x0 <= {e!r} THEN 1.0 ELSE -1e30 END)
              ELSE greatest(({w!r} - x0)/(x1 - x0), ({e!r} - x0)/(x1 - x0)) END,
              CASE WHEN y1 = y0 THEN
                (CASE WHEN y0 >= {s!r} AND y0 <= {n!r} THEN 1.0 ELSE -1e30 END)
              ELSE greatest(({s!r} - y0)/(y1 - y0), ({n!r} - y0)/(y1 - y0)) END
            ) AS t1,
            x0, y0, x1, y1
          FROM seg
        """)
    return prefix + f""",
        win AS ({' UNION ALL '.join(region_sel)}),
        cl AS (
          SELECT region, user_id, cs, side,
            x0 + (x1 - x0)*t0 AS ax, y0 + (y1 - y0)*t0 AS ay,
            x0 + (x1 - x0)*t1 AS bx, y0 + (y1 - y0)*t1 AS "by"
          FROM win WHERE t1 > t0),
        lens AS (
          SELECT region, user_id, cs, side,
            6371000.0 * sqrt(
              pow(radians(bx - ax) * cos(radians((ay + "by")/2.0)), 2)
              + pow(radians("by" - ay), 2)) AS len_m
          FROM cl),
        per_side AS (
          SELECT region, user_id, cs, side, sum(len_m) AS len
          FROM lens GROUP BY 1, 2, 3, 4),
        per_contrib AS (
          SELECT region, user_id, cs,
            coalesce(max(CASE WHEN side = 'a' THEN len END), 0)
              - coalesce(max(CASE WHEN side = 'b' THEN len END), 0) AS dlen
          FROM per_side GROUP BY 1, 2, 3)
        SELECT region, count(*) AS cnt, round(sum(dlen), 0) AS dlen_m
        FROM per_contrib GROUP BY region
    """


def _event_points(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1_234_567_891), F.lit(1_700_000_000)) - 850_000_000
    return ev.withColumn("lon", lon7).withColumn("lat", lat7)


_REGIONS = {
    "west": (-180.0, -85.0, 0.0, 85.0),
    "east": (0.0, -85.0, 180.0, 85.0),
    "tropics": (-180.0, -23.5, 180.0, 23.5),  # overlaps both
}


def q_agg_by_geometry(spark, sf_dir):
    """aggregateByGeometry (GeometrySplitter analog): overlapping regions
    each receive every intersecting point."""
    from oshdb_spark.geo.spatial_join import aggregate_by_geometry

    return aggregate_by_geometry(
        _event_points(spark, sf_dir), _REGIONS, [],
        [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sv")],
    )


def q_knn_events(spark, sf_dir):
    """kNN via Hilbert cell-ring expansion, exact equirect re-rank."""
    from oshdb_spark.geo.spatial_join import knn

    return knn(
        _event_points(spark, sf_dir), 10.0, 20.0, k=25, id_cols=["event_id"]
    ).select("event_id")


_KNN_QS = [("a", 10.0, 20.0), ("b", -120.0, -40.0), ("c", 30.0, 82.0)]


def q_knn_batch_events(spark, sf_dir):
    """Batch kNN: exactly two Spark actions (cell histogram + windowed
    top-k over the union of proven disks) — no per-ring driver loop; the
    high-latitude query exercises the metadata-radius guarantee."""
    from oshdb_spark.geo.spatial_join import knn_batch

    return knn_batch(
        _event_points(spark, sf_dir), _KNN_QS, k=25, id_cols=["event_id"]
    ).select("qid", "event_id")


_ZONES_RECT = {
    "nw": (-180.0, 0.15, -0.15, 85.0),
    "se": (0.15, -85.0, 180.0, -0.15),
    "band": (-90.0, -30.0, 90.0, 30.0),
}


def q_zonal_rect(spark, sf_dir):
    """Raster↔vector zonal aggregation: zones rasterized to Hilbert cells,
    interior cells by lookup, boundary cells by exact point-in-polygon."""
    from oshdb_spark.geo.spatial_join import zonal_aggregate

    return zonal_aggregate(
        _event_points(spark, sf_dir), _ZONES_RECT,
        [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sv")],
    )


# deterministic dissolve corpus: integer-valued rectangles derived from
# event ids (float-exact on every engine) plus a hand-built frame group
# that forces the union-pocket machinery (4 overlapping walls enclose a
# hole; one filler reaches through a wall into it, one sits disjoint
# inside it)
_DISSOLVE_FRAME = [
    (100, 0.0, 0.0, 2.0, 10.0),
    (100, 0.0, 0.0, 10.0, 2.0),
    (100, 8.0, 0.0, 10.0, 10.0),
    (100, 0.0, 8.0, 10.0, 10.0),
    (100, 1.0, 4.0, 6.0, 6.0),
    (100, 6.0, 6.0, 7.0, 7.0),
]

_DISSOLVE_RECTS_SQL = """
    SELECT CAST(event_id % 10 AS BIGINT) AS grp,
           CAST((event_id*7919) % 50 AS DOUBLE) AS x1,
           CAST((event_id*104729) % 50 AS DOUBLE) AS y1,
           CAST((event_id*7919) % 50 + 2 + (event_id % 9) AS DOUBLE) AS x2,
           CAST((event_id*104729) % 50 + 2 + ((event_id*31) % 9) AS DOUBLE) AS y2
    FROM events WHERE event_id % 37 = 0
    UNION ALL
    SELECT CAST(grp AS BIGINT), x1, y1, x2, y2
    FROM (VALUES {frame}) AS f(grp, x1, y1, x2, y2)
""".format(frame=", ".join(str(t) for t in _DISSOLVE_FRAME))

_DISSOLVE_SWEEP_SQL = """
    WITH rects AS ({rects}),
    xs AS (
      SELECT DISTINCT grp, x FROM (
        SELECT grp, x1 AS x FROM rects
        UNION ALL SELECT grp, x2 FROM rects)),
    slabs AS (
      SELECT grp, x AS xa,
             lead(x) OVER (PARTITION BY grp ORDER BY x) AS xb
      FROM xs),
    cov AS (
      SELECT s.grp, s.xa, s.xb, r.y1, r.y2
      FROM slabs s JOIN rects r
        ON r.grp = s.grp AND r.x1 <= s.xa AND r.x2 >= s.xb
      WHERE s.xb IS NOT NULL),
    m AS (
      SELECT grp, xa, xb, y1, y2,
             max(y2) OVER (PARTITION BY grp, xa ORDER BY y1, y2
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS rm
      FROM cov),
    i AS (
      SELECT grp, xa, xb, y1, y2,
             sum(CASE WHEN rm IS NULL OR y1 > rm THEN 1 ELSE 0 END)
               OVER (PARTITION BY grp, xa ORDER BY y1, y2
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS iid
      FROM m),
    seg AS (
      SELECT grp, xa, xb, iid, max(y2) - min(y1) AS len
      FROM i GROUP BY grp, xa, xb, iid)
    SELECT grp, round(sum(len * (xb - xa)), 6) AS union_area
    FROM seg GROUP BY grp
""".format(rects=_DISSOLVE_RECTS_SQL)


def _dissolve_rects(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id").filter(
        F.col("event_id") % 37 == 0
    )
    base = ev.select(
        (F.col("event_id") % 10).alias("grp"),
        ((F.col("event_id") * 7919) % 50).cast("double").alias("x1"),
        ((F.col("event_id") * 104729) % 50).cast("double").alias("y1"),
        ((F.col("event_id") * 7919) % 50 + 2 + F.col("event_id") % 9)
        .cast("double").alias("x2"),
        ((F.col("event_id") * 104729) % 50 + 2 + (F.col("event_id") * 31) % 9)
        .cast("double").alias("y2"),
    )
    frame = spark.createDataFrame(
        _DISSOLVE_FRAME, schema="grp long, x1 double, y1 double, x2 double, y2 double"
    )
    return base.unionByName(frame)


def q_dissolve_rect(spark, sf_dir):
    """Distributed dissolve (rect form): exact union area per group via
    the pure-Catalyst slab sweep (geo/dissolve.rect_union_area) — the
    declarative replacement for JTS UnaryUnionOp+area (Geo.java area
    path over a caller-unioned geometry)."""
    from oshdb_spark.geo.dissolve import rect_union_area

    return rect_union_area(_dissolve_rects(spark, sf_dir))


def q_dissolve_rings(spark, sf_dir):
    """Dissolve through the engine's ring-union machinery
    (merge_overlapping_rings + exact pocket correction) over the same
    rectangles — the oracle replays an independent slab-sweep algorithm,
    so agreement is a cross-algorithm differential on the union code."""
    from oshdb_spark.geo.dissolve import rings_union_area

    rects = _dissolve_rects(spark, sf_dir)
    rings = rects.select(
        "grp",
        F.array("x1", "y1", "x2", "y1", "x2", "y2", "x1", "y2").alias("ring"),
    )
    return rings_union_area(rings)


# ---------------------------------------------------------------------------
# queries — training-data pipeline ops (dedup / similarity / text / media)
# ---------------------------------------------------------------------------

def _dup_corpus(spark, sf_dir):
    """documents ∪ clone (doc_id+1000): gives every doc one exact duplicate
    so dedup operators have real work on the fixed corpus."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    clone = d.withColumn("doc_id", F.col("doc_id") + 1000)
    return d.unionAll(clone)


def q_contrib_by_region(spark, sf_dir):
    """Contribution-view region splitter (GeometrySplitter before/after
    union semantics): count contributions touching each region."""
    from oshdb_spark.geo.measures import wkb_point_coords
    from oshdb_spark.geo.spatial_join import split_contributions_by_regions

    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("node")
        .dataframe()
    )
    df = (
        df.withColumn("pb", wkb_point_coords("geom_before_wkb"))
        .withColumn("pa", wkb_point_coords("geom_after_wkb"))
        .select(
            F.col("pb.lon").alias("blon"), F.col("pb.lat").alias("blat"),
            F.col("pa.lon").alias("alon"), F.col("pa.lat").alias("alat"),
        )
    )
    return (
        split_contributions_by_regions(
            df, _REGIONS, "blon", "blat", "alon", "alat", fixed_point=False
        )
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_contrib_by_region_poly(spark, sf_dir):
    """Contribution splitter with a POLYGON region (vectorized PiP over
    the before/after union, GeometrySplitter.java:141-203)."""
    from oshdb_spark.geo.measures import wkb_point_coords
    from oshdb_spark.geo.spatial_join import split_contributions_by_regions

    docs = docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps(list(CONTRIB_INTERVAL))
        .osm_type("node")
        .dataframe()
    )
    df = (
        df.withColumn("pb", wkb_point_coords("geom_before_wkb"))
        .withColumn("pa", wkb_point_coords("geom_after_wkb"))
        .select(
            F.col("pb.lon").alias("blon"), F.col("pb.lat").alias("blat"),
            F.col("pa.lon").alias("alon"), F.col("pa.lat").alias("alat"),
        )
    )
    regions = {"quad": [_POLY], "north": (-180.0, 20.0, 180.0, 85.0)}
    return (
        split_contributions_by_regions(
            df, regions, "blon", "blat", "alon", "alat", fixed_point=False
        )
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_relation_contrib_types(spark, sf_dir):
    """RELATION contribution path (recursive member-window mod timestamps
    through way members down to node histories): contribution-type counts
    over the interval. Every node move changes the member geometry, so
    states after the creation are exactly GEOMETRY_CHANGEs."""
    from oshdb_spark.model.history import relation_docs_from_events

    docs = relation_docs_from_events(_t(spark, sf_dir, "events"))
    df = (
        OSHDB(docs)
        .contribution_view()
        .timestamps([SNAPSHOT_TS[0], SNAPSHOT_TS[-1]])
        .osm_type("relation")
        .without_geometry()
        .dataframe()
    )
    return (
        df.select(F.explode("contrib_types").alias("contrib_type"))
        .groupBy("contrib_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_multipolygon_area(spark, sf_dir):
    """Multipolygon assembly through the driver gate: per-user square
    outer rings assembled into Polygons; Chamberlain–Duquette area."""
    from oshdb_spark.geo.measures import wkb_area_m2
    from oshdb_spark.model.history import multipolygon_docs_from_events

    docs = multipolygon_docs_from_events(_t(spark, sf_dir, "events"))
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps([SNAPSHOT_TS[-1]])  # static squares: one snapshot
        .osm_type("relation")
        .dataframe()
    )
    return (
        snaps.withColumn("a", wkb_area_m2("geom_wkb"))
        .select(
            F.col("id"),
            F.round(F.col("a") / 1e6, 3).alias("area_km2"),
        )
    )


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs on a corpus with planted
    clones (vec_id + 10000) — through the LSH-bucketed pairwise operator
    (no cartesian product; the DuckDB oracle IS the brute-force check, so
    this row doubles as the recall-1.0 equivalence gate)."""
    from oshdb_spark.ops.dedup import lsh_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.unionAll(emb.withColumn("vec_id", F.col("vec_id") + 10000))
    return lsh_neardup_pairs(dup, threshold=0.999999, dim=64).select(
        "id_a", "id_b"
    )


def q_dedup_substring(spark, sf_dir):
    """Exact-substring (winnowed fingerprint) duplication stats per doc
    (ops/dedup.with_dup_span_stats) over a corpus with PLANTED partial
    duplicates: docs 0-49 reappear under id+2000 as their first 30 words
    plus a unique tail token, at a different total length — so shared
    PREFIX runs must be flagged alignment-independently while the unique
    tails stay clean. The oracle replays winnowing (min over each run of
    4 consecutive window hashes) via a positional self-join."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter("doc_id < 50").select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', concat_ws(' ', slice(split(text, ' '), 1, 30)),"
            " concat('tail', cast(doc_id as string)))"
        ).alias("text"),
    )
    from oshdb_spark.ops.dedup import with_dup_span_stats

    return with_dup_span_stats(docs.unionByName(planted))


def q_dedup_exact(spark, sf_dir):
    from oshdb_spark.ops.dedup import exact_dedup

    return exact_dedup(_dup_corpus(spark, sf_dir))


def q_dedup_minhash(spark, sf_dir):
    from oshdb_spark.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _dup_corpus(spark, sf_dir), k=3, n_bands=4, rows_per_band=4,
        jaccard_threshold=0.5,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_components(spark, sf_dir):
    """Near-dup GROUP resolution: MinHash-LSH pairs closed into connected
    components (large-star/small-star, O(log n) shuffle rounds); every doc
    labeled with its component's min doc_id (singletons label themselves)."""
    from oshdb_spark.ops.dedup import minhash_lsh_pairs
    from oshdb_spark.ops.graph import connected_components

    corpus = _dup_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, k=3, n_bands=4, rows_per_band=4, jaccard_threshold=0.5
    )
    labels = connected_components(pairs, src="id_a", dst="id_b")
    docs = corpus.select("doc_id")
    return docs.join(labels, docs.doc_id == labels.node, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


def q_dedup_keep(spark, sf_dir):
    """keep_canonical end-to-end: LSH pairs → components → one surviving
    doc per duplicate group (min id), isolated docs untouched; reduced
    per source for a compact oracle row set."""
    from oshdb_spark.ops.dedup import minhash_lsh_pairs
    from oshdb_spark.ops.graph import keep_canonical

    corpus = _dup_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, k=3, n_bands=4, rows_per_band=4, jaccard_threshold=0.5
    )
    kept = keep_canonical(corpus, pairs)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (no SQL oracle — rows-only check; parity is
    covered by tests/test_ops.py asserting each clone pair is found)."""
    from oshdb_spark.ops.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_dup_corpus(spark, sf_dir), max_hamming=3)


def q_dedup_incremental(spark, sf_dir):
    """Delta-shard-vs-corpus dedup (the production arrival pattern:
    new crawl slices checked against what the corpus already holds,
    never corpus × corpus). Corpus = documents with doc_id % 3 != 0;
    delta = the remaining docs plus exact clones (id+100000, every
    corpus doc_id % 5 == 0) and near-duplicate perturbations (two extra
    trailing words, id+200000, doc_id % 7 == 0). Verdicts per delta doc:
    exact / near (MinHash-LSH banding + shingle-Jaccard >= 0.5) /
    unique, with the LOWEST matching corpus id and its jaccard."""
    from oshdb_spark.ops.dedup import incremental_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    fresh = d.filter(F.col("doc_id") % 3 == 0)
    exact_clones = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near_clones = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing probe tokens")).alias("text"),
    )
    delta = fresh.unionAll(exact_clones).unionAll(near_clones)
    return incremental_dedup(delta, corpus, jaccard_threshold=0.5)


def q_bloom_prefilter(spark, sf_dir):
    """Broadcast Bloom prefilter (ops/bloom.py): the corpus fingerprint
    set compressed to a 4096-bit literal bitmap tested map-side per
    delta row — no shuffle touches the delta; bloom_candidate ⊇
    exact_match (false positives possible, false negatives never). The
    oracle replays the double-hash positions as set logic."""
    from oshdb_spark.ops.bloom import bloom_prefilter

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 != 0).select(
        F.md5("text").alias("fp")
    )
    delta = (
        d.filter(F.col("doc_id") % 3 == 0)
        .unionAll(
            d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
        .withColumn("fp", F.md5("text"))
    )
    tagged = bloom_prefilter(delta, corpus, "fp", n_bits=4096, n_hashes=3)
    exact = corpus.distinct().withColumn("_hit", F.lit(True))
    return (
        tagged.join(exact, "fp", "left")
        .select(
            "doc_id",
            "bloom_candidate",
            F.coalesce("_hit", F.lit(False)).alias("exact_match"),
        )
    )


def q_export_shards(spark, sf_dir):
    """Deterministic shard-export manifest: documents hashed into 8
    shards (48-bit md5 of doc_id, reshard-stable), with per-shard doc /
    token / byte counts and an ORDER-INDEPENDENT bit_xor content
    checksum — the integrity record a resumable 100 TB export verifies
    against instead of re-reading data."""
    from oshdb_spark.ops.export import shard_manifest

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return shard_manifest(d, 8)


def q_snapshot_ratio(spark, sf_dir):
    """ohsome-style RATIO query (the ratio endpoint the reference's main
    consumer builds on two MapReducer runs): per timestamp, matched
    snapshots (tag filter) / all snapshots in the same bbox — two façade
    aggregations joined on ts; null ratio where the denominator is 0."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    base = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(bbox=_BBOX)
        .osm_type("node")
    )
    denom = base.aggregate_by_timestamp().count(alias="total")
    num = (
        base.osm_tag("event_type", "click")
        .aggregate_by_timestamp()
        .count(alias="matched")
    )
    return denom.join(num, "ts").select(
        "ts",
        "matched",
        "total",
        F.round(
            F.when(F.col("total") > 0, F.col("matched") / F.col("total")),
            6,
        ).alias("ratio"),
    )


def q_pagerank(spark, sf_dir):
    """Distributed PageRank (ops/graph.pagerank), 3 iterations, damping
    0.85, per-iteration 6-decimal quantization (the cross-engine float
    contract), over a deterministic 1000-node interaction graph derived
    from events — the oracle replays every iteration with unrolled CTEs
    (the kmeans precedent)."""
    from oshdb_spark.ops.graph import pagerank

    e = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 1000).alias("src"),
        ((F.col("event_id") * 7919) % 1000).alias("dst"),
    )
    return pagerank(e, n_iter=3)


def q_vocab_stats(spark, sf_dir):
    """Per-source vocabulary profile (ops/textstats.vocab_stats): tokens,
    distinct types, hapax legomena, type/token ratio. The data-sized
    shuffle is the (source, token) aggregate — bounded by vocabulary."""
    from oshdb_spark.ops.textstats import vocab_stats

    return vocab_stats(
        _t(spark, sf_dir, "documents").select("source", "text")
    )


def q_stream_export_shards(spark, sf_dir):
    """Structured Streaming exactly-once shard export: documents arrive
    as 3 ordered micro-batches; foreachBatch writes each through the
    idempotent write_shards sink (ops/export.streaming_shard_export);
    the per-shard MERGE of the batch manifests (sums add, bit_xor
    checksums XOR) must equal the one-shot batch manifest — which is
    exactly the export_shards oracle."""
    import tempfile

    from oshdb_spark.ops.export import (
        merged_shard_manifest,
        streaming_shard_export,
    )

    path = _split_stream_dir(f"{sf_dir}/documents.parquet", "doc_id")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .select("doc_id", "text")
    )
    out = tempfile.mkdtemp(prefix="oshdb_stream_export_")
    q = streaming_shard_export(stream, out, 8)
    q.awaitTermination()
    return merged_shard_manifest(spark, out)


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval (ops/similarity.hybrid_rrf_topk): BM25 top-50 on
    documents fused with cosine top-50 on the aligned embeddings by
    Reciprocal Rank Fusion (1/(60+rank)); both arms rank on
    round(score, 6) so the fused order replays bit-for-bit in DuckDB."""
    from oshdb_spark.ops.similarity import hybrid_rrf_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return hybrid_rrf_topk(
        docs, emb, ["hash", "join", "vector"], qvec, k=10, k_each=50
    )


def q_sim_topk(spark, sf_dir):
    from oshdb_spark.ops.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return cosine_topk(emb, qvec, k=10).select("vec_id")


def q_sim_int8(spark, sf_dir):
    """Int8-quantized ANN baseline (ops/similarity.with_int8/int8_topk —
    the 4× storage path): cosine top-10 over per-vector symmetric int8
    codes dequantized on the fly; the oracle replays scale, rounding and
    dequantization bit-for-bit in DuckDB."""
    from oshdb_spark.ops.similarity import int8_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return int8_topk(emb, qvec, k=10).select("vec_id")


def q_sim_knn_join(spark, sf_dir):
    """Batch kNN join: exact cosine top-10 for each of 8 query vectors —
    one matmul per Arrow batch with per-query local top-k, global rank
    over the candidate set only."""
    from oshdb_spark.ops.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 8")
    out = knn_join(emb, queries, k=10)
    return out.select(
        "qid", F.col("rank").cast("long").alias("rank"), "nbr_id",
        F.round("cosine", 6).alias("cosine"),
    )


def q_sim_pq(spark, sf_dir):
    """Product-quantization ANN (m=4 subspaces, 16 codes, ADC scan, exact
    re-rank of 4k candidates) — deterministic stub codebooks so the oracle
    replays encode+ADC end to end."""
    from oshdb_spark.ops.similarity import pq_ann

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return pq_ann(emb, qvec, k=10, m=4, n_codes=16).select("vec_id")


def q_heavy_hitters(spark, sf_dir):
    """Misra–Gries top-10 words over documents. capacity=1024 exceeds the
    corpus vocabulary, so the sketch is provably EXACT here (max_err=0,
    layout-invariant) — the oracle compares exact counts; the
    approximation guarantee under tight capacity is pytest-covered."""
    from oshdb_spark.ops.sketches import heavy_hitters

    words = _t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    return heavy_hitters(words, "w", k=10, capacity=1024)


def q_chunk_windows(spark, sf_dir):
    """Retrieval chunking: overlapping 32-token windows, stride 24 —
    codegen 1→N fan-out; reduced per doc (count, token sum, content md5
    of the concatenated chunks) so the oracle compares every window."""
    from oshdb_spark.ops.textstats import chunk_windows

    d = _t(spark, sf_dir, "documents")
    w = chunk_windows(d, window=32, stride=24)
    ordered = F.expr(
        "array_join(transform(array_sort(collect_list(struct(win_idx, chunk)))"
        ", x -> x.chunk), '|')"
    )
    return w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.md5(ordered).alias("content_md5"),
    )


def q_text_bm25(spark, sf_dir):
    """BM25 keyword relevance over documents (3-term query) — stats in one
    tiny aggregate, scoring as a codegen map, no inverted-index shuffle."""
    from oshdb_spark.ops.textstats import bm25_scores

    d = _t(spark, sf_dir, "documents")
    out = bm25_scores(d, ["hash", "join", "vector"])
    return out.select("doc_id", F.round("score", 6).alias("score"))


def q_sim_lsh_ann(spark, sf_dir):
    """LSH-bucketed ANN (rows-only; recall asserted in tests/test_ops.py)."""
    from oshdb_spark.ops.similarity import lsh_ann

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return lsh_ann(emb, qvec, k=10, n_planes=8, multiprobe=2).select("vec_id")


def q_sim_ivf(spark, sf_dir):
    """IVF ANN: deterministic coarse centroids (first-16 stub) → map-side
    routing → probe 4 nearest centroids → exact re-rank. The stub
    training makes the whole operator SQL-expressible, so this runs with
    a full DuckDB oracle."""
    from oshdb_spark.ops.similarity import ivf_ann

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return ivf_ann(emb, qvec, k=10, n_centroids=16, n_probe=4).select("vec_id")


def q_sim_ivf_trained(spark, sf_dir):
    """IVF ANN with the PRODUCTION quantizer: coarse centroids trained by
    the distributed k-means (2 Lloyd iterations, deterministic contract)
    instead of the first-k stub — the oracle replays training, routing,
    probing, and the exact re-rank end to end."""
    from oshdb_spark.ops.similarity import ivf_ann

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    return ivf_ann(
        emb, qvec, k=10, n_centroids=8, n_probe=3, train_iters=2
    ).select("vec_id")


def q_kmeans_centroids(spark, sf_dir):
    """Distributed k-means (Lloyd's, 2 iterations, deterministic first-k
    init, 6-decimal centroid quantization per update): per-cluster size
    and the first 4 centroid dims. The quantize-per-update contract makes
    every iteration bit-replayable by the DuckDB oracle."""
    from oshdb_spark.ops.clustering import _q6, kmeans_train

    emb = _t(spark, sf_dir, "embeddings")
    cents, sizes = kmeans_train(emb, k=8, n_iter=2)
    # _q6 is idempotent on trained centroids; it matters only for an
    # empty cluster that kept its (unquantized) init vector
    rows = [
        (c, sizes[c], *[_q6(cents[c][i]) for i in range(4)])
        for c in range(len(cents))
    ]
    return spark.createDataFrame(
        rows, "cluster int, n long, c0 double, c1 double, c2 double, c3 double"
    )


def q_embedding_covariance(spark, sf_dir):
    """Distributed d×d embedding covariance (ops/stats.covariance_df):
    embeddings quantized to fixed-point int64 (half away from zero), so
    the heavy Σqqᵀ pass is EXACT and partition-layout-invariant — one
    narrow Arrow GEMM per batch, one tiny positional shuffle, broadcast
    derivation joins. The oracle computes the identical integers and the
    identical IEEE float expression."""
    from oshdb_spark.ops.stats import covariance_df

    return covariance_df(_t(spark, sf_dir, "embeddings"))


def q_pca_loadings(spark, sf_dir):
    """Top principal component (ops/stats.power_iteration over the
    collected quantized covariance — d² doubles of metadata, never row
    data): 12 power-iteration steps with 6-decimal quantization per
    iterate and strict sequential folds; the DuckDB oracle replays the
    whole trajectory in a recursive CTE over LIST lambdas, bit-for-bit."""
    from oshdb_spark.ops.stats import collect_covariance, power_iteration

    cov = collect_covariance(_t(spark, sf_dir, "embeddings"))
    v, eig = power_iteration(cov, iters=12)
    return spark.createDataFrame(
        [(i, v[i], eig) for i in range(len(v))],
        "i long, loading double, eigval double",
    )


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): cosine near-duplicate pairs scoped to
    deterministic k-means clusters — candidate generation is the cluster
    assignment itself (O(Σ size²), never O(n²)). The DuckDB oracle replays
    the full chain: 2 Lloyd iterations, the final-centroid assignment, and
    the within-cluster pairwise cosine filter."""
    from oshdb_spark.ops.clustering import kmeans_train
    from oshdb_spark.ops.dedup import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = kmeans_train(emb, k=8, n_iter=2)
    pairs = semantic_dedup_pairs(emb, cents, threshold=0.4)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cos"), "cluster"
    )


def q_geoblocks_polygon(spark, sf_dir):
    """GeoBlocks-style polygon aggregation (EDBT'21 exact mode,
    geo/spatial_join.polygon_aggregate_blocks): per-cell partials answer
    the polygon interior without touching raw rows; only boundary cells
    re-aggregate raw points under the exact PiP test. The oracle is the
    direct exact aggregation — equality certifies the block decomposition
    (interior ∪ boundary refinement == whole polygon)."""
    from oshdb_spark.geo.spatial_join import (
        build_cell_partials,
        polygon_aggregate_blocks,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    partials = build_cell_partials(
        pts,
        [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_val")],
        level=5,
    )
    import numpy as np

    poly = [np.array(_POLY)]
    out = polygon_aggregate_blocks(
        partials, pts, poly, ["cnt", "sum_val"],
        [F.count(F.lit(1)), F.sum("value")], level=5,
    )
    return out.select("cnt", F.round("sum_val", 2).alias("sum_val"))


def q_areal_interp(spark, sf_dir):
    """Areal interpolation (GeoAlign EDBT'18 uniform-density baseline,
    geo/align.py): re-aggregate 10°-lat-band event counts onto three
    UNALIGNED target regions. The engine computes weights from the exact
    polygon clip + Chamberlain–Duquette spherical areas; the oracle
    derives the same weights analytically (lon-aligned bands ⇒ weight =
    Δsin(lat overlap)/Δsin(lat band)) — agreement certifies the clip+area
    kernels against closed-form geometry."""
    from oshdb_spark.geo.align import areal_interpolate

    ev = _t(spark, sf_dir, "events").select("event_id")
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    zone = F.concat(
        F.lit("band"),
        F.floor((lat7 + 850_000_000) / 100_000_000).cast("long"),
    )
    src_agg = ev.withColumn("zone", zone).groupBy("zone").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    src = {
        f"band{z}": (-180.0, -85.0 + 10 * z, 180.0, -75.0 + 10 * z)
        for z in range(17)
    }
    # targets: lat cuts offset from every band edge; lon widened past the
    # bands so no vertical edges coincide (general-position clip inputs)
    dst = {
        "south": (-180.5, -85.0, 180.5, -41.0),
        "mid": (-180.5, -41.0, 180.5, 32.0),
        "north": (-180.5, 32.0, 180.5, 85.0),
    }
    out = areal_interpolate(src_agg, src, dst, value_col="cnt")
    return out.select("region", F.round("value", 2).alias("est_cnt"))


def q_sample_diversity(spark, sf_dir):
    """Cluster-balanced diversity sampling (ops/sampling.diversity_sample):
    cap every k-means cluster at 20 vectors chosen by deterministic md5
    rank. The oracle replays training, assignment, and the rank draw —
    id_sum pins the exact sample membership."""
    from oshdb_spark.ops.clustering import kmeans_train
    from oshdb_spark.ops.sampling import diversity_sample

    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = kmeans_train(emb, k=8, n_iter=2)
    s = diversity_sample(emb, cents, quota=20, salt="dv")
    return s.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("picked"),
        F.sum("vec_id").alias("id_sum"),
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic hash-based stratified sampling (ops/sampling.py):
    downsample English hard, keep more of the low-resource strata —
    the no-RNG-state sampling a resumable 10^12-doc pipeline needs.
    md5-threshold membership is bit-identical in DuckDB, so the oracle
    re-derives the exact keep set (sum of kept ids pins membership)."""
    from oshdb_spark.ops.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    kept = deterministic_sample(
        d, by="lang", rates={"en": 0.25, "zh": 0.75}, default_rate=0.5,
        salt="r3",
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_sample_weighted(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (ops/sampling.weighted_sample, Efraimidis–Spirakis A-ES): top-25
    documents by u^(1/n_chars) priority with u a 48-bit md5 uniform —
    "sample ∝ length" with zero RNG state. Compiles to
    TakeOrderedAndProject (per-partition partial top-k). The oracle
    re-derives u digit-by-digit from the same md5 hex and replays the
    ln(u)/w ordering."""
    from oshdb_spark.ops.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = weighted_sample(d, k=25, weight_col="n_chars", id_col="doc_id",
                        key_out="aes")
    return s.select("doc_id", "n_chars", F.round("aes", 6).alias("aes_key"))


def q_asof_join_events(spark, sf_dir):
    """Distributed as-of (point-in-time) join (ops/joins.asof_join):
    every click/purchase event picks its user's latest at-or-before
    error event (build side pre-aggregated to unique (user, sec)),
    matches beyond a 2-day tolerance nulled — the state-at-event-time
    join Spark lacks natively, as one key shuffle + running
    last(ignorenulls) window (no range explosion). The oracle is
    DuckDB's native ASOF LEFT JOIN over the identical build table."""
    from oshdb_spark.ops.joins import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts").cast("long")
    )
    probes = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", "sec"
    )
    builds = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "sec")
        .agg(
            F.max("value").alias("err_value"),
            F.max("event_id").alias("err_event"),
        )
    )
    j = asof_join(
        probes, builds, on="user_id", left_ts="sec", right_ts="sec",
        tolerance=172800,
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("r_err_event").isNotNull().cast("long")).alias("n_matched"),
        F.round(F.sum(F.coalesce("r_err_value", F.lit(0.0))), 2).alias("err_value_sum"),
        F.sum(F.coalesce("r_err_event", F.lit(0))).alias("err_event_sum"),
        F.round(F.avg(F.col("sec") - F.col("r_sec")), 4).alias("avg_lag"),
    )


def q_topk_per_group(spark, sf_dir):
    """Skew-safe per-group top-k (ops/topk.group_topk): the 3 highest-
    price lineitems per returnflag under a total order (price desc,
    orderkey, linenumber). Two-phase: per-(partition, group) partial
    top-k, then global top-k over the tiny survivor set — no whole-group
    single-task sort. The oracle is the textbook row_number window."""
    from oshdb_spark.ops.topk import group_topk

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    t = group_topk(
        li,
        group_cols=["l_returnflag"],
        order_cols=[
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        k=3,
        rank_out="rk",
    )
    return t.select(
        "l_returnflag", "rk", "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


def q_interval_join_cells(spark, sf_dir):
    """Keyed interval-overlap join (ops/joins.interval_overlap_join):
    pairs of entities co-located in the same z3 tile whose version
    validity windows overlap — "concurrent co-located edits". PBSM in
    time: each window explodes to its 14-day bins, hash equi-join on
    (cell, bin), every pair emitted exactly once at the later start's
    bin (no distinct). The oracle brute-forces the inequality join."""
    from oshdb_spark.geo import cells
    from oshdb_spark.ops.joins import interval_overlap_join

    HORIZON = 1706745600  # Feb 1 2024: open validity windows close here
    v = (
        versions_from_events(_t(spark, sf_dir, "events"))
        .filter("visible")
        .withColumn("cell", cells.xy_id_col("lon", "lat", 3))
        .select(
            "id", "cell",
            F.col("valid_from").alias("s"),
            F.coalesce("valid_to", F.lit(HORIZON)).alias("e"),
        )
    )
    a = v.filter(F.col("id") % 2 == 0).select(
        F.col("id").alias("a_id"), "cell",
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = v.filter(F.col("id") % 2 == 1).select(
        F.col("id").alias("b_id"), "cell",
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    j = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bin_width=14 * 86400, on="cell"
    )
    return j.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("a_id") + F.col("b_id")).alias("id_sum"),
    )


def q_chunk_plan(spark, sf_dir):
    """Concat-and-chunk sequence packing (ops/textstats.chunk_plan):
    documents in doc_id order, 512-token training sequences; summary per
    chunk-straddle class. The oracle replays the cumulative layout in
    SQL, pinning every document's offset through id_sum."""
    from oshdb_spark.ops.textstats import chunk_plan, with_token_count

    d = with_token_count(_t(spark, sf_dir, "documents"))
    plan = chunk_plan(d, budget=512)
    return plan.groupBy("n_chunks").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("token_offset").alias("offset_sum"),
        F.max("first_chunk").alias("max_first_chunk"),
    )


def q_text_repetition(spark, sf_dir):
    """Repetition quality signals (Gopher-rules family,
    ops/textstats.with_repetition): per source, mean duplicate-bigram
    fraction and mean top-bigram coverage — computed with a fold over the
    sorted bigram array (no explode/shuffle); the oracle recomputes both
    via unnest + window in DuckDB."""
    from oshdb_spark.ops.textstats import with_repetition

    d = with_repetition(_t(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.round(F.avg("dup_2gram_frac"), 6).alias("avg_dup_2gram"),
        F.round(F.avg("top_2gram_cover"), 6).alias("avg_top_2gram"),
        F.count(F.lit(1)).alias("cnt"),
    )


def q_contamination(spark, sf_dir):
    """Benchmark decontamination (ops/curation.contamination — the
    GPT-3/Gopher any-ngram-overlap rule): documents sharing any word
    3-gram with the 'src0' benchmark slice, per language: candidate
    docs, contaminated docs, total shared-3-gram hits, mean
    contamination fraction. Ids-only hash join, benchmark broadcast."""
    from oshdb_spark.ops.curation import contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    train = d.filter(F.col("source") != "src0")
    c = contamination(train, bench, n=3).join(
        train.select("doc_id", "lang"), "doc_id"
    )
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("hits") > 0).cast("long")).alias("contaminated"),
        F.sum("hits").alias("hit_sum"),
        F.round(F.avg(F.col("hits") / F.col("ngrams")), 6).alias("avg_frac"),
    )


def q_pattern_scan(spark, sf_dir):
    """Policy-pattern scan (ops/curation.pattern_scan — the PII-scrub
    mechanism): per source, total matches of named regexes over the
    corpus. Patterns stay in the RE2 ∩ Java portable subset; the oracle
    runs the identical expressions in DuckDB."""
    from oshdb_spark.ops.curation import pattern_scan

    d = pattern_scan(
        _t(spark, sf_dir, "documents"),
        {"kw": "(key|table|scan)", "num": "[0-9]+",
         "email": "[a-z0-9.]+@[a-z0-9.]+"},
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("kw_n").alias("kw_hits"),
        F.sum("num_n").alias("num_hits"),
        F.sum("email_n").alias("email_hits"),
        F.max("kw_n").alias("kw_max"),
    )


def q_redact(spark, sf_dir):
    """PII redaction (ops/curation.redact — rewrites text, not just
    counts): deterministic synthetic PII (an email and a phone derived
    from doc_id) is appended to every document, redacted, and verified
    byte-exactly via per-source md5 digests — DuckDB replays the same
    injection, the same RE2∩Java-portable regexes (regexp_replace 'g'),
    and the same sorted-name replacement order."""
    from oshdb_spark.ops.curation import redact

    d = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".net ph "),
            (F.col("doc_id") % 900 + 100).cast("string"),
            F.lit("-"),
            ((F.col("doc_id") * 31) % 9000 + 1000).cast("string"),
        ),
    )
    r = redact(
        d,
        {
            "email": ("[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
            "phone": ("[0-9]{3}-[0-9]{4}", "<PHONE>"),
        },
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("email_n").alias("emails"),
        F.sum("phone_n").alias("phones"),
        F.sum(F.length("text_redacted")).alias("red_chars"),
        F.max(F.md5(F.col("text_redacted").cast("binary"))).alias("digest"),
    )


def q_source_mix(spark, sf_dir):
    """Temperature-α source mixing (ops/curation.source_mix_sample,
    α=0.5, target 300): per-source deterministic md5-threshold keep at
    the α-mixing rate — head sources downsample, tail sources survive.
    Rates round to 6 decimals before thresholding, so the oracle derives
    the identical thresholds and replays exact membership."""
    from oshdb_spark.ops.curation import source_mix_sample

    d = _t(spark, sf_dir, "documents")
    kept = source_mix_sample(d, alpha=0.5, target=300, salt="mix")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("doc_id").alias("id_sum"),
    )


def _synthetic_url():
    """Deterministic messy URL from doc_id — scheme case, www.,
    tracking params, fragments, trailing slashes all vary within a
    7-doc page group; shared by the canonicalization and
    split-assignment queries (and mirrored term-for-term in their
    oracles)."""
    d = F.col("doc_id")
    page = F.floor(d / 7).cast("long")
    hostn = (page * 1103515245) % 53
    r4 = d % 4
    tld = (
        F.when(page % 4 == 0, ".com")
        .when(page % 4 == 1, ".org")
        .when(page % 4 == 2, ".net")
        .otherwise(".co.uk")
    )
    scheme = F.when(d % 2 == 0, "HTTPS").otherwise("http")
    www = F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    slash = F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit(""))
    ref = (page % 9).cast("string")
    q = (
        F.when(r4 == 0, F.concat(F.lit("?utm_source=feed&ref="), ref))
        .when(r4 == 1, F.concat(F.lit("?ref="), ref,
                                F.lit("&utm_campaign=x")))
        .when(r4 == 2, F.concat(F.lit("?ref="), ref))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 3 == 1, F.concat(F.lit("#sec"), (d % 3).cast("string"))).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), www, F.lit("site"),
        hostn.cast("string"), tld, F.lit("/a/"), page.cast("string"),
        slash, q, frag,
    )


def q_url_domains(spark, sf_dir):
    """URL canonicalization + per-domain rollup (ops/curation.
    with_canonical_url / domain_stats — the C4/RefinedWeb curation
    step): deterministic messy URLs (see _synthetic_url) must collapse
    to canonical form; per registered domain: docs, distinct canonical
    URLs, docs on duplicated URLs. Pure Catalyst string/array ops,
    mirrored term-for-term in SQL."""
    from oshdb_spark.ops.curation import domain_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url().alias("url")
    )
    return domain_stats(docs).select(
        "domain", "n_docs", "n_urls", "n_dup_docs"
    )


def q_split_domains(spark, sf_dir):
    """Leakage-safe train/val/test assignment (ops/sampling.
    split_assign): the md5 of each document's CANONICAL DOMAIN picks
    the split, so every page of a domain lands together (the standard
    defense against near-dup train→eval leakage). 70/15/15 via
    cumulative md5 thresholds — deterministic, reshard-stable; per
    (split): domains, docs, exact id sum."""
    from oshdb_spark.ops.curation import with_canonical_url
    from oshdb_spark.ops.sampling import split_assign

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url().alias("url")
    )
    tagged = split_assign(
        with_canonical_url(docs), group_col="domain",
        fractions={"train": 0.7, "val": 0.15, "test": 0.15},
        salt="split",
    )
    return tagged.groupBy("split").agg(
        F.countDistinct("domain").alias("n_domains"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_lm_quality(spark, sf_dir):
    """CCNet-style LM quality bucketing (ops/lm.lm_crossentropy, Wenzek
    et al. 2020): per-doc cross-entropy under an add-1 word-bigram LM
    trained on the 'src0' slice, bucketed head/tail by fixed thresholds.
    Per-doc ce rounds to 6 decimals on BOTH engines before thresholding
    (the float-membership invariant)."""
    from oshdb_spark.ops.lm import lm_crossentropy

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("source") == "src0")
    rest = d.filter(F.col("source") != "src0")
    ce = lm_crossentropy(rest, ref).join(
        rest.select("doc_id", "lang"), "doc_id"
    ).withColumn("ce_r", F.round("ce", 6))
    return ce.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("ce"), 6).alias("avg_ce"),
        F.sum((F.col("ce_r") < 3.55).cast("long")).alias("head_docs"),
        F.sum((F.col("ce_r") >= 3.70).cast("long")).alias("tail_docs"),
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (ops/lm.dsir_logweights, Xie et al.
    2023): hashed-bigram importance of each non-src0 document toward the
    src0 target slice; per language, mean weight plus deterministic
    keep-if-positive membership (weights rounded to 6 decimals before
    the sign test on both engines)."""
    from oshdb_spark.ops.lm import dsir_logweights

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("source") == "src0")
    rest = d.filter(F.col("source") != "src0")
    w = dsir_logweights(rest, ref).join(
        rest.select("doc_id", "lang"), "doc_id"
    ).withColumn("w_r", F.round("logw", 6))
    return w.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("logw"), 6).alias("avg_logw"),
        F.sum((F.col("w_r") > 0).cast("long")).alias("kept"),
        F.sum(
            F.when(F.col("w_r") > 0, F.col("doc_id")).otherwise(F.lit(0))
        ).alias("id_sum"),
    )


def q_spatial_join_table(spark, sf_dir):
    """Two-table distributed spatial join (geo/spatial_join.
    pip_join_regions_table — the PBSM shape for when the region table
    outgrows the broadcast paths): events-derived points vs 25
    nation-derived bbox regions, matched by a cell-id equi-join at
    zoom 6 (with 4-way hot-cell salting) + exact inclusive refinement;
    per region, point count and value sum. The oracle computes the same
    pairs by direct predicate join."""
    from oshdb_spark.geo.spatial_join import pip_join_regions_table

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    pts = ev.select(
        "value",
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    regs = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("long").alias("rid"))
        .select(
            "rid",
            (
                F.pmod(F.col("rid") * 1103515245, F.lit(3_200_000_000))
                - 1_700_000_000
            ).alias("w7"),
            (
                F.pmod(F.col("rid") * 1234567891, F.lit(1_500_000_000))
                - 800_000_000
            ).alias("s7"),
        )
        .withColumn(
            "e7", F.col("w7") + 50_000_000 + (F.col("rid") % 7) * 30_000_000
        )
        .withColumn(
            "n7", F.col("s7") + 40_000_000 + (F.col("rid") % 5) * 20_000_000
        )
    )
    j = pip_join_regions_table(pts, regs, zoom=6, n_salts=4)
    return j.groupBy("rid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_val"),
    )


def _pbsm_poly_rings() -> dict[int, list[list[float]]]:
    """8 deterministic convex pentagons (closed CCW rings, degree
    coords, vertices offset off the 1e-7 grid) shared by the Spark query
    and the generated half-plane oracle — the two sides agree by
    construction."""
    import math

    out = {}
    for rid in range(8):
        cx = ((rid * 1103515245) % 280) - 140 + 0.0000013
        cy = ((rid * 1234567891) % 100) - 50 + 0.0000017
        rad = 8 + (rid % 5) * 6
        ring = [
            [cx + rad * math.cos(2 * math.pi * j / 5 + 0.3),
             cy + 0.6 * rad * math.sin(2 * math.pi * j / 5 + 0.3)]
            for j in range(5)
        ]
        ring.append(ring[0])
        out[rid] = ring
    return out


def q_spatial_join_poly(spark, sf_dir):
    """Polygon-table distributed spatial join (geo/spatial_join.
    pip_join_polygons_table): events-derived points vs 8 convex-pentagon
    regions carried as ring rows, candidate pairs from the cell
    equi-join over each ring's bbox cover (2-way salted), exact
    membership by the vectorized ray-cast. The oracle re-tests every
    point against half-plane predicates generated from the same rings."""
    from oshdb_spark.geo.spatial_join import pip_join_polygons_table

    pts = _t(spark, sf_dir, "events").select(
        "value",
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    polys = spark.createDataFrame(
        [(rid, ring) for rid, ring in _pbsm_poly_rings().items()],
        "rid long, ring array<array<double>>",
    )
    j = pip_join_polygons_table(pts, polys, zoom=6, n_salts=2)
    return j.groupBy("rid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_val"),
    )


def _spatial_join_poly_oracle() -> str:
    rings = _pbsm_poly_rings()

    def d(v: float) -> str:
        # full-precision repr literals overflow DuckDB's DECIMAL parse;
        # a string->DOUBLE cast round-trips the exact IEEE double
        return f"CAST('{v!r}' AS DOUBLE)"

    blocks = []
    for rid, ring in rings.items():
        edges = " AND ".join(
            f"(({d(x1)} - {d(x0)}) * (lat - {d(y0)})"
            f" - ({d(y1)} - {d(y0)}) * (lon - {d(x0)})) > 0"
            for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:])
        )
        blocks.append(
            f"SELECT {rid} AS rid, count(*) AS cnt,"
            f" round(sum(value), 2) AS sum_val FROM pts"
            f" WHERE {edges} HAVING count(*) > 0"
        )
    union = "\nUNION ALL\n".join(blocks)
    return f"""
        WITH pts AS (
          SELECT value,
                 (((event_id*1103515245) % 3600000000) - 1800000000) * 1e-7
                   AS lon,
                 (((event_id*1234567891) % 1700000000) - 850000000) * 1e-7
                   AS lat
          FROM events)
        {union}
    """


# rectangle derivations shared by q_overlay_rect and its oracle: side A
# from supplier keys, side B from every-7th customer key; fixed-point
# 1e-7-degree integers so both engines compute from identical doubles
_OVL_A = (
    "(((CAST(s_suppkey AS BIGINT) * 1103515245) % 3000000000)"
    " - 1500000000)",  # w7
    "(((CAST(s_suppkey AS BIGINT) * 1234567891) % 1400000000)"
    " - 700000000)",  # s7
    "(50000000 + ((CAST(s_suppkey AS BIGINT) * 2654435761)"
    " % 250000000))",  # width7
    "(50000000 + ((CAST(s_suppkey AS BIGINT) * 97781173)"
    " % 150000000))",  # height7
)
_OVL_B = (
    "(((CAST(c_custkey AS BIGINT) * 1103515245) % 3000000000)"
    " - 1500000000)",
    "(((CAST(c_custkey AS BIGINT) * 1234567891) % 1400000000)"
    " - 700000000)",
    "(50000000 + ((CAST(c_custkey AS BIGINT) * 2654435761)"
    " % 250000000))",
    "(50000000 + ((CAST(c_custkey AS BIGINT) * 97781173)"
    " % 150000000))",
)


def q_overlay_rect(spark, sf_dir):
    """Distributed polygon-overlay intersection join (geo/spatial_join.
    overlay_join): supplier-derived rectangles x customer-derived
    rectangles (every 7th key), carried as general closed rings through
    the FULL overlay machinery — bbox cell cover, PBSM reference-point
    dedup, clip.ring_intersection + Chamberlain-Duquette area refine
    (Geo.java:94-179 semantics). The oracle recomputes each pair's
    intersection rectangle closed-form: CD area of an axis-aligned
    rectangle telescopes to (e-w)(sin n - sin s) R^2 exactly, so the
    two sides agree to ~1e-13 relative and the km^2 round(2) hashes
    stably."""
    from oshdb_spark.geo.spatial_join import overlay_join

    def rects(tbl, key, consts, out_id, thin=None):
        w7, s7, dw7, dh7 = consts  # expressions over `key`'s column name
        d = _t(spark, sf_dir, tbl)
        if thin is not None:
            d = d.filter(F.col(key) % thin == 0)
        d = d.select(
            F.col(key).cast("long").alias(out_id),
            F.expr(w7).alias("w7"),
            F.expr(s7).alias("s7"),
            F.expr(dw7).alias("dw7"),
            F.expr(dh7).alias("dh7"),
        )
        deg = lambda c: (F.col(c).cast("double") * F.lit(1e-7))  # noqa: E731
        w, s = deg("w7"), deg("s7")
        e = (F.col("w7") + F.col("dw7")).cast("double") * F.lit(1e-7)
        n = (F.col("s7") + F.col("dh7")).cast("double") * F.lit(1e-7)
        pt = lambda x, y: F.array(x, y)  # noqa: E731
        ring = "ring_a" if out_id == "ida" else "ring_b"
        return d.select(
            out_id,
            F.array(
                pt(w, s), pt(e, s), pt(e, n), pt(w, n), pt(w, s)
            ).alias(ring),
        )

    a = rects("supplier", "s_suppkey", _OVL_A, "ida")
    b = rects("customer", "c_custkey", _OVL_B, "idb", thin=7)
    j = overlay_join(a, b, zoom=6, n_salts=2)
    return j.select(
        "ida",
        "idb",
        F.round(F.col("area_m2") / F.lit(1e6), 2).alias("area_km2"),
    )


def _overlay_rect_oracle() -> str:
    aw, as_, adw, adh = _OVL_A
    bw, bs, bdw, bdh = _OVL_B
    return f"""
        WITH a AS (
          SELECT s_suppkey AS ida,
                 {aw} AS w7, {as_} AS s7,
                 {aw} + {adw} AS e7, {as_} + {adh} AS n7
          FROM supplier),
        b AS (
          SELECT c_custkey AS idb,
                 {bw} AS w7, {bs} AS s7,
                 {bw} + {bdw} AS e7, {bs} + {bdh} AS n7
          FROM customer WHERE c_custkey % 7 = 0),
        p AS (
          SELECT ida, idb,
                 greatest(a.w7, b.w7) AS gw, least(a.e7, b.e7) AS ge,
                 greatest(a.s7, b.s7) AS gs, least(a.n7, b.n7) AS gn
          FROM a JOIN b
            ON a.w7 <= b.e7 AND b.w7 <= a.e7
           AND a.s7 <= b.n7 AND b.s7 <= a.n7)
        SELECT ida, idb,
               round(radians((ge - gw) * 1e-7)
                     * (sin(radians(gn * 1e-7)) - sin(radians(gs * 1e-7)))
                     * 6371000.0 * 6371000.0 / 1e6, 2) AS area_km2
        FROM p WHERE ge > gw AND gn > gs
    """


def q_overlay_clip_lines(spark, sf_dir):
    """Distributed line-clip overlay join (geo/spatial_join.
    clip_join_segments): event-derived segments (~2-degree strokes) x
    nation-derived rectangles, Liang-Barsky clipping expressed entirely
    in Catalyst (zero Python). Per region: pair count + clipped km
    (per-pair lengths rounded to mm first — the float invariant; the
    t-parameter hit decision uses only -, /, greatest/least over
    identical doubles, so the pair SET is bit-reproducible vs DuckDB)."""
    from oshdb_spark.geo.spatial_join import clip_join_segments

    segs = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("sid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("ax7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("ay7"),
    )
    segs = segs.select(
        "sid",
        "ax7",
        "ay7",
        (
            F.col("ax7")
            + F.pmod(F.col("sid") * 2654435761, F.lit(40_000_001))
            - 20_000_000
        ).alias("bx7"),
        (
            F.col("ay7")
            + F.pmod(F.col("sid") * 97781173, F.lit(40_000_001))
            - 20_000_000
        ).alias("by7"),
    )
    regs = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("long").alias("rid"))
        .select(
            "rid",
            (
                F.pmod(F.col("rid") * 1103515245, F.lit(3_200_000_000))
                - 1_700_000_000
            ).alias("w7"),
            (
                F.pmod(F.col("rid") * 1234567891, F.lit(1_500_000_000))
                - 800_000_000
            ).alias("s7"),
        )
        .withColumn(
            "e7", F.col("w7") + 50_000_000 + (F.col("rid") % 7) * 30_000_000
        )
        .withColumn(
            "n7", F.col("s7") + 40_000_000 + (F.col("rid") % 5) * 20_000_000
        )
    )
    j = clip_join_segments(segs, regs, zoom=6, n_salts=2)
    return j.groupBy("rid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(
            F.sum(F.round(F.col("clip_len_m"), 3)) / F.lit(1000.0), 6
        ).alias("len_km"),
    )


_OVERLAY_CLIP_LINES_ORACLE = """
    -- identical Liang-Barsky slab parameters (only -, /, least/greatest
    -- over doubles derived as fixed_point * 1e-7 -> the t1 > t0 hit set
    -- is bit-equal to the engine's); per-pair meters rounded to mm
    WITH segs0 AS (
      SELECT event_id AS sid,
             (event_id*1103515245) % 3600000000 - 1800000000 AS ax7,
             (event_id*1234567891) % 1700000000 - 850000000 AS ay7
      FROM events),
    segs AS (
      SELECT sid, ax7, ay7,
             ax7 + (sid*2654435761) % 40000001 - 20000000 AS bx7,
             ay7 + (sid*97781173) % 40000001 - 20000000 AS by7
      FROM segs0),
    regs AS (
      SELECT rid, w7, s7,
             w7 + 50000000 + (rid % 7) * 30000000 AS e7,
             s7 + 40000000 + (rid % 5) * 20000000 AS n7
      FROM (
        SELECT CAST(n_nationkey AS BIGINT) AS rid,
               (CAST(n_nationkey AS BIGINT)*1103515245) % 3200000000
                 - 1700000000 AS w7,
               (CAST(n_nationkey AS BIGINT)*1234567891) % 1500000000
                 - 800000000 AS s7
        FROM nation)),
    deg AS (
      SELECT rid, sid,
             ax7*1e-7 AS ax, ay7*1e-7 AS ay,
             bx7*1e-7 - ax7*1e-7 AS dx, by7*1e-7 - ay7*1e-7 AS dy,
             w7*1e-7 AS w, s7*1e-7 AS s, e7*1e-7 AS e, n7*1e-7 AS n
      FROM segs, regs),
    slabs AS (
      SELECT rid, sid, ax, ay, dx, dy,
        CASE WHEN dx = 0
             THEN CASE WHEN ax >= w AND ax <= e THEN 0.0 ELSE 2.0 END
             ELSE least((w-ax)/dx, (e-ax)/dx) END AS tx0,
        CASE WHEN dx = 0
             THEN CASE WHEN ax >= w AND ax <= e THEN 1.0 ELSE -1.0 END
             ELSE greatest((w-ax)/dx, (e-ax)/dx) END AS tx1,
        CASE WHEN dy = 0
             THEN CASE WHEN ay >= s AND ay <= n THEN 0.0 ELSE 2.0 END
             ELSE least((s-ay)/dy, (n-ay)/dy) END AS ty0,
        CASE WHEN dy = 0
             THEN CASE WHEN ay >= s AND ay <= n THEN 1.0 ELSE -1.0 END
             ELSE greatest((s-ay)/dy, (n-ay)/dy) END AS ty1
      FROM deg),
    hits AS (
      SELECT rid, sid, ay, dx, dy,
             greatest(0.0, tx0, ty0) AS t0, least(1.0, tx1, ty1) AS t1
      FROM slabs WHERE least(1.0, tx1, ty1) > greatest(0.0, tx0, ty0)),
    lens AS (
      SELECT rid, round(len_raw, 3) AS len_m
      FROM (
        SELECT rid, 6371000.0 * sqrt(dla*dla + dln*dln) AS len_raw
        FROM (
          SELECT rid,
                 radians(dy*(t1-t0)) AS dla,
                 radians(dx*(t1-t0))
                   * cos(radians(ay + dy*(t0+t1)/2.0)) AS dln
          FROM hits))
      WHERE len_raw > 0)
    SELECT rid, count(*) AS cnt,
           round(sum(len_m) / 1000.0, 6) AS len_km
    FROM lens GROUP BY rid
"""


def q_distance_join(spark, sf_dir):
    """Distributed distance self-join (geo/spatial_join.distance_join):
    all event-point pairs within 200 km by the reference's
    equirectangular metric, matched via neighbor-cell replication (each
    qualifying pair meets in exactly one cell). Per 10°-latitude band of
    the first point: pair count and total distance (per-pair distances
    rounded to mm before summing — the float invariant)."""
    from oshdb_spark.geo.spatial_join import distance_join

    pts = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    right = (
        pts.withColumnRenamed("pid", "qid")
    )
    j = distance_join(pts, right, 200_000.0).filter(
        F.col("pid") < F.col("qid")
    )
    return (
        j.withColumn("dist_r", F.round("dist_m", 3))
        .withColumn(
            "band",
            F.floor((F.col("lat7") + 850_000_000) / F.lit(100_000_000))
            .cast("long"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.sum("dist_r"), 0).alias("sum_dist_m"),
        )
    )


def q_knn_join_table(spark, sf_dir):
    """Exact distributed kNN join (geo/spatial_join.knn_join — both
    sides DataFrames): the 5 nearest event points for every 20th event
    point, phase-1 cell-block candidates with a per-row guaranteed
    radius, phase-2 ring-expansion residual. The oracle brute-forces all
    pairs with the identical equirect formula and windows per query."""
    from oshdb_spark.geo.spatial_join import knn_join

    pts = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    lefts = pts.filter(F.col("pid") % 20 == 0)
    right = pts.withColumnRenamed("pid", "nid")
    j = knn_join(lefts, right, k=5, zoom=6)
    return j.select(
        "pid", "nid", F.round("dist_m", 3).alias("dist")
    )


def q_snap_segments(spark, sf_dir):
    """Map-matching snap join (geo/spatial_join.nearest_segment_join):
    every 37th event point snaps to the nearest of 10k short synthetic
    road segments within 200 km — cell-cover PBSM candidates, exact
    clamped point-to-segment distance in the probe-anchored equirect
    plane, mm-rounded before the (dist, sid) argmin. The oracle
    brute-forces all (probe, segment) pairs with the identical formula
    and windows per probe."""
    from oshdb_spark.geo.spatial_join import nearest_segment_join

    ev = _t(spark, sf_dir, "events")
    segs = ev.select(
        F.col("event_id").alias("sid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_590_000_000))
            - 1_795_000_000
        ).alias("ax7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_690_000_000))
            - 845_000_000
        ).alias("ay7"),
    )
    segs = segs.select(
        "sid",
        "ax7",
        "ay7",
        (
            F.col("ax7")
            + F.pmod(F.col("sid") * 69069, F.lit(2_000_001))
            - 1_000_000
        ).alias("bx7"),
        (
            F.col("ay7")
            + F.pmod(F.col("sid") * 48271, F.lit(2_000_001))
            - 1_000_000
        ).alias("by7"),
    )
    pts = ev.filter(F.col("event_id") % 37 == 0).select(
        F.col("event_id").alias("pid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    return nearest_segment_join(pts, segs, 200_000.0, zoom=6)


def q_kde_events(spark, sf_dir):
    """Gaussian KDE heatmap (geo/cells.kde_heatmap): event points →
    smoothed zoom-5 density raster, σ = 0.75 cells, 5×5 truncation,
    per-contribution integer micro-quantization so per-cell sums are
    exact BIGINTs on both engines."""
    from oshdb_spark.geo.cells import kde_heatmap

    pts = _t(spark, sf_dir, "events").select(
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    return kde_heatmap(pts, 5, sigma_cells=0.75, radius_cells=2)


def q_hmm_match(spark, sf_dir):
    """Viterbi map matching (geo/matching.hmm_map_match): every 10th
    user's event-fix sequence matched to the synthetic segment table
    under integer-mm emission (snap distance) + 20 km switch-penalty
    transitions, top-3 candidates per fix. The oracle replays the exact
    candidate pruning and the forward/backward DP with two recursive
    CTEs (min() in the recursive term), then picks the lowest-sid state
    on an optimal path per fix — term-for-term with the kernel."""
    from oshdb_spark.geo.matching import hmm_map_match

    ev = _t(spark, sf_dir, "events")
    segs = ev.select(
        F.col("event_id").alias("sid"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_590_000_000))
            - 1_795_000_000
        ).alias("ax7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_690_000_000))
            - 845_000_000
        ).alias("ay7"),
    )
    segs = segs.select(
        "sid", "ax7", "ay7",
        (
            F.col("ax7") + F.pmod(F.col("sid") * 69069, F.lit(2_000_001))
            - 1_000_000
        ).alias("bx7"),
        (
            F.col("ay7") + F.pmod(F.col("sid") * 48271, F.lit(2_000_001))
            - 1_000_000
        ).alias("by7"),
    )
    fixes = ev.filter(F.col("user_id") % 10 == 0).select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    return hmm_map_match(
        fixes, segs, 200_000.0, switch_cost_mm=20_000_000, n_cand=3,
        zoom=6,
    )


def q_traj_hausdorff(spark, sf_dir):
    """Trajectory-similarity self-join (geo/trajectory.hausdorff_join):
    consecutive user pairs (slot = user_id // 2) walk inside shared
    ±3° clusters on a 24×8 15°-grid, so same-position pairs sit within
    the 400 km symmetric Hausdorff threshold at EVERY sf while
    cross-position pairs (≥ 9° apart) never do. Every pairwise
    distance quantizes to integer mm before the min/max folds; the
    oracle brute-forces candidate entity pairs (safe bbox prefilter)
    point-by-point."""
    from oshdb_spark.geo.trajectory import hausdorff_join

    slot = (F.col("user_id") / 2).cast("long")
    pts = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            F.col("user_id").alias("entity"),
            (
                (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
                + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
                - 30_000_000
            ).alias("lon7"),
            (
                ((slot / 24).cast("long") % 8) * 150_000_000
                - 600_000_000 + 75_000_000
                + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
                - 30_000_000
            ).alias("lat7"),
        )
    )
    return hausdorff_join(pts, 400_000.0, zoom=6)


def q_idw_surface(spark, sf_dir):
    """Inverse-distance-weighted interpolation (geo/cells.idw_surface):
    event values -> estimated zoom-5 surface, smoothed-IDW weights
    1/(d²+1e-6), integer micro-quantized num/den sums, one round-6
    division per output cell."""
    from oshdb_spark.geo.cells import idw_surface

    pts = _t(spark, sf_dir, "events").select(
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
        F.col("value"),
    )
    return idw_surface(pts, 5, "value", radius_cells=2)


def q_quality_classifier(spark, sf_dir):
    """Learned quality-classifier filtering (ops/classifier — the
    DCLM/FineWeb-Edu stage): logistic regression over hashed-bigram
    features, trained in-engine by 2 full-batch GD steps (weights
    quantized to 6 decimals per update, the k-means determinism rule)
    with y = (source == 'src0'); per language, mean score and
    keep-if-score≥0.5 membership. The oracle replays featurize → both
    GD iterations → scoring term-for-term in SQL."""
    from oshdb_spark.ops.classifier import (
        hashed_logreg_score,
        hashed_logreg_train,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "_y", (F.col("source") == "src0").cast("int")
    )
    w, b = hashed_logreg_train(d, "_y")
    sc = hashed_logreg_score(d, w, b).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    return sc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("score"), 6).alias("avg_score"),
        F.sum((F.col("score") >= 0.5).cast("long")).alias("kept"),
        F.sum(
            F.when(F.col("score") >= 0.5, F.col("doc_id")).otherwise(F.lit(0))
        ).alias("id_sum"),
    )


def q_pipeline_prep(spark, sf_dir):
    """End-to-end training-data prep — the composition the ops layer
    exists for: quality gate → exact dedup (keep lowest id per
    fingerprint) → deterministic 50% sample → per-language token
    accounting, over a corpus with planted duplicates. Every stage is
    pure Catalyst; the oracle replays the identical pipeline in SQL."""
    from oshdb_spark.ops.dedup import exact_dedup
    from oshdb_spark.ops.sampling import deterministic_sample
    from oshdb_spark.ops.textstats import with_quality, with_token_count

    d = _dup_corpus(spark, sf_dir)
    q = with_quality(d).filter(F.col("distinct_ratio") >= 0.5)
    keep = exact_dedup(q).select(F.col("keep_id").alias("doc_id"))
    deduped = q.join(keep, "doc_id", "left_semi")
    sampled = deterministic_sample(deduped, rate=0.5, salt="pipe")
    return with_token_count(sampled).groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("token_count").alias("tokens"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_text_tokens(spark, sf_dir):
    from oshdb_spark.ops.textstats import with_token_count

    d = with_token_count(_t(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.sum("token_count").alias("tokens"),
        F.sum("subword_count").alias("subwords"),
    )


def q_text_quality(spark, sf_dir):
    from oshdb_spark.ops.textstats import with_quality

    d = with_quality(_t(spark, sf_dir, "documents"))
    return d.groupBy("lang").agg(
        F.round(F.avg("distinct_ratio"), 6).alias("avg_distinct_ratio"),
        F.round(F.avg("mean_word_len"), 6).alias("avg_word_len"),
        F.count(F.lit(1)).alias("cnt"),
    )


def q_lang_id(spark, sf_dir):
    from oshdb_spark.ops.textstats import with_lang_guess

    d = with_lang_guess(_t(spark, sf_dir, "documents"))
    return d.groupBy("lang", "lang_guess").agg(F.count(F.lit(1)).alias("cnt"))


def q_doc_fingerprint(spark, sf_dir):
    from oshdb_spark.ops.textstats import with_fingerprint

    d = with_fingerprint(_t(spark, sf_dir, "documents"), k=5)
    return d.groupBy("source").agg(
        F.countDistinct("fingerprint").alias("uniq_fp"),
        F.count(F.lit(1)).alias("cnt"),
    )


def q_media_meta(spark, sf_dir):
    from oshdb_spark.ops.media import attach_media, media_metadata

    d = attach_media(_t(spark, sf_dir, "documents"))
    meta = media_metadata(d)
    return (
        meta.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(10)))
        .groupBy("bucket")
        .agg(
            F.sum("n_bytes").alias("sum_bytes"),
            F.sum("width").alias("sum_width"),
            F.sum("height").alias("sum_height"),
        )
    )


def q_media_resize(spark, sf_dir):
    """Resize plumbing: fixed-size payload per blob (stubbed repeat-
    truncate transform; the mapInPandas batch shape is what's checked) —
    md5 of each resized payload so the oracle compares content exactly."""
    from oshdb_spark.ops.media import attach_media, resize_media

    d = attach_media(_t(spark, sf_dir, "documents"))
    rz = resize_media(d, target_bytes=64)
    return rz.select(
        "doc_id",
        F.md5(F.col("resized")).alias("content_md5"),
        F.length("resized").alias("n_bytes"),
    )


def q_media_features(spark, sf_dir):
    """Feature-extraction plumbing: media → fixed-dim vector (stub
    encoder, SQL-mirrorable), reduced per bucket over two coordinates."""
    from oshdb_spark.ops.media import attach_media, extract_features

    d = attach_media(_t(spark, sf_dir, "documents"))
    ft = extract_features(d, dim=16)
    return (
        ft.withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(10)))
        .groupBy("bucket")
        .agg(
            F.round(F.sum(F.element_at("features", 1)), 6).alias("sum_f0"),
            F.round(F.sum(F.element_at("features", 16)), 6).alias("sum_f15"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def q_media_frames(spark, sf_dir):
    from oshdb_spark.ops.media import attach_media, sample_frames

    d = attach_media(_t(spark, sf_dir, "documents"))
    fr = sample_frames(d, every_n_bytes=64, frame_size=16, max_frames=8)
    return fr.groupBy().agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_idx").alias("sum_idx"),
        F.sum(F.length("frame_bytes")).alias("sum_len"),
    )


def q_media_phash_dedup(spark, sf_dir):
    """Multimodal near-dup: block-mean perceptual hash over the media
    bytes + exact Hamming blocking (pigeonhole over d+1 hash blocks, no
    cartesian). The oracle replays the hash bit-for-bit from the ASCII
    source text and brute-forces the pairs — equal output proves the
    banding join is exhaustive."""
    from oshdb_spark.ops.media import attach_media, phash_neardup_pairs

    d = attach_media(
        _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    pairs = phash_neardup_pairs(d, max_hamming=3, bits=16)
    return (
        pairs.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).alias("id_checksum"),
        )
        .orderBy("hamming")
    )


def q_media_dedup_groups(spark, sf_dir):
    """Full multimodal dedup-group pipeline: media bytes → block-mean
    pHash → Hamming banding (d=1) → connected components → group-size
    histogram (singletons included). One Catalyst plan end-to-end; the
    CC rounds are O(log n) star-contraction joins."""
    from oshdb_spark.ops.graph import connected_components
    from oshdb_spark.ops.media import attach_media, phash_neardup_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    pairs = phash_neardup_pairs(attach_media(docs), max_hamming=1, bits=16)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    ids = docs.select("doc_id")
    comp = ids.join(labels, ids.doc_id == labels.node, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("component").alias("comp_checksum"),
        )
        .orderBy("size")
    )


def q_sessionization(spark, sf_dir):
    """Window-function coverage: per-user session counts (gap > 30 min
    starts a new session) — the lag/valid_to window pattern (§2.9)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    d = (
        ev.withColumn("sec", F.unix_timestamp("ts").cast("long"))
        .withColumn("prev", F.lag("sec").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | (F.col("sec") - F.col("prev") > 1800))
            .cast("long"),
        )
    )
    return d.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_stream_sessions(spark, sf_dir):
    """Structured Streaming session windows (streaming/incremental.
    session_aggregate): Spark's native merging session_window carried in
    the state store across 3 ordered micro-batches, rolled up per user —
    session count, event count, biggest session, longest session
    duration. Complete mode emits every session of the bounded stream,
    so the result replays the batch gaps-and-islands rule (new session
    only when the 30-min gap is STRICTLY exceeded) exactly."""
    import uuid

    from oshdb_spark.streaming.incremental import (
        read_event_stream,
        session_aggregate,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    stream = read_event_stream(spark, path, schema)
    sess = session_aggregate(stream, "30 minutes")
    name = "ssw_" + uuid.uuid4().hex[:8]
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_sess_events"),
        F.max(F.col("last_sec") - F.col("first_sec")).alias("max_sess_dur_s"),
    )


def q_cms_user_counts(spark, sf_dir):
    """Count-Min sketch (ops/sketches.cms_table/cms_estimate): per-user
    event-frequency estimates from a fixed k×m=3×256 mergeable counter
    table vs the exact counts — est ≥ exact always; overshoot bounded by
    collisions. The oracle replays the double-hash positions, the
    counter table, and the min-probe exactly."""
    from oshdb_spark.ops.sketches import cms_estimate, cms_table

    ev = _t(spark, sf_dir, "events").select("user_id")
    sketch = cms_table(ev, "user_id", m=256, k=3)
    est = cms_estimate(ev.distinct(), sketch, "user_id", m=256, k=3)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    return est.join(exact, "user_id").select("user_id", "est", "exact")


def q_contributor_accretion(spark, sf_dir):
    """Community-analytics shape (ohsome 'users' endpoint extension):
    per 30-day epoch bucket (calendar-free, tz-proof), active distinct
    contributors split into first-time (global first event in this
    bucket) vs returning."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    b = ev.withColumn("bucket", F.floor(F.col("sec") / 2592000))
    first = b.groupBy("user_id").agg(F.min("bucket").alias("first_bucket"))
    act = b.select("bucket", "user_id").distinct().join(first, "user_id")
    return act.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum(
            F.when(F.col("first_bucket") == F.col("bucket"), 1).otherwise(0)
        ).alias("new_users"),
        F.sum(
            F.when(F.col("first_bucket") < F.col("bucket"), 1).otherwise(0)
        ).alias("returning"),
    )


def q_twa_value(spark, sf_dir):
    """Per-user time-weighted average of the `value` gauge
    (ops/timeseries.time_weighted_avg): last-observation-carried-forward
    integral over each user's observed span — integer cents × whole
    seconds terms, one lag window + one aggregate."""
    from oshdb_spark.ops.timeseries import time_weighted_avg

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return time_weighted_avg(ev)


def q_ohlc_weekly(spark, sf_dir):
    """Per (user, week) OHLC bar of the `value` gauge (ops/timeseries.
    ohlc): open/close picked by exact packed (sec, event_id) keys via
    min_by/max_by — one partial+final aggregate, no window."""
    from oshdb_spark.ops.timeseries import ohlc

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    ).withColumn("wk", F.floor(F.col("sec") / 604800).cast("long"))
    return ohlc(ev)


def q_gapfill_daily(spark, sf_dir):
    """Gap-filled regular series (ops/timeseries.gapfill_locf): each
    user's `value` gauge on a 6-hour grid with LOCF fill between first
    and last observation; per-bucket representative picked by the exact
    packed (sec, event_id) key."""
    from oshdb_spark.ops.timeseries import gapfill_locf

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return gapfill_locf(ev, 21600)


def q_interp_daily(spark, sf_dir):
    """Linear-interpolation gap-fill (ops/timeseries.
    gapfill_interpolate): the same 6-hour grid as gapfill_daily, but
    empty buckets evaluate the line between the bracketing
    representatives at the bucket start. Exact BIGINT numerator
    (cents × seconds); one float division, round(6) both engines."""
    from oshdb_spark.ops.timeseries import gapfill_interpolate

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return gapfill_interpolate(ev, 21600)


def q_spearman_quality(spark, sf_dir):
    """Per-source Spearman rank correlation (ops/stats.spearman_corr)
    between document length (n_chars) and whitespace token count —
    near-monotone, so ρ sits high but below 1 where lengths tie.
    Doubled average ranks keep ties exact; decimal moments ≡ HUGEINT."""
    from oshdb_spark.ops.stats import spearman_corr

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
    )
    return spearman_corr(d, "source", "n_chars", "toks")


def q_weighted_median(spark, sf_dir):
    """Exact weighted median (ops/stats.weighted_quantile) of lineitem
    extended price (cents) weighted by quantity, per return flag — the
    weighted percentile_disc rule: smallest value whose cumulative
    weight reaches half the total; pure integer pick condition."""
    from oshdb_spark.ops.stats import weighted_quantile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("long")
        .alias("price_c"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
    )
    return weighted_quantile(
        li, "l_returnflag", "price_c", "qty", num=1, den=2
    )


def q_cusum_drift(spark, sf_dir):
    """CUSUM drift alarms (ops/timeseries.cusum_alarms, Page 1954):
    per-user one-sided drift statistic above a 200.00 target with a
    80.00 alarm threshold. The sequential max(0, ·) recursion runs
    as prefix-sum − running-min (two windows, one sort) — every S_t an
    exact BIGINT in cents."""
    from oshdb_spark.ops.timeseries import cusum_alarms

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return cusum_alarms(ev, target_cents=20_000,
                        threshold_cents=8_000)


def q_uptime_islands(spark, sf_dir):
    """Per-user interval union (ops/timeseries.interval_union): each
    event opens a 15–75-minute validity interval
    (900 + (event_id % 7)·600 s); overlapping-or-touching intervals
    merge into islands — n_islands, total covered seconds, longest
    island. Pure gaps-and-islands windows, all integer-exact."""
    from oshdb_spark.ops.timeseries import interval_union

    sec = F.unix_timestamp("ts").cast("long")
    iv = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        sec.alias("start_s"),
        (sec + 900 + (F.col("event_id") % 7) * 600).alias("end_s"),
    )
    return interval_union(iv)


def q_counter_rate(spark, sf_dir):
    """PromQL-style counter increase/rate with reset handling
    (ops/timeseries.counter_rate) over each user's `value` sequence:
    integer-cents deltas (resets add the restarted value), exact BIGINT
    sums, one float division per output row."""
    from oshdb_spark.ops.timeseries import counter_rate

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return counter_rate(ev)


def q_attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each purchase credits the
    latest preceding non-purchase/non-error event of the same user
    within a 7-day lookback ('direct' when none) — one running
    last-ignore-nulls window + one aggregate."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        ~F.col("event_type").isin("purchase", "error"),
        F.struct(F.col("sec").alias("tsec"),
                 F.col("event_type").alias("ttype")),
    )
    d = (
        ev.withColumn("_lt", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "channel",
            F.when(
                F.col("_lt").isNotNull()
                & (F.col("sec") - F.col("_lt.tsec") <= 604800),
                F.col("_lt.ttype"),
            ).otherwise(F.lit("direct")),
        )
    )
    return d.groupBy("channel").agg(
        F.count(F.lit(1)).alias("conversions")
    )


def q_event_transitions(spark, sf_dir):
    """Per-user event-type Markov transitions: (previous type, type)
    counts and round-6 row-normalized probabilities — one lag window,
    one aggregate, one window-sum normalization."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    d = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    cnt = d.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return cnt.withColumn(
        "p",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double"),
            6,
        ),
    )


def q_lttb_values(spark, sf_dir):
    """LTTB visual downsampling (ops/timeseries.lttb_downsample): each
    user's value gauge reduced to 12 points — first/last kept, middle
    buckets keep the largest-triangle point vs the previous selection
    and the next bucket's centroid. The oracle replays the sequential
    walk with a recursive CTE."""
    from oshdb_spark.ops.timeseries import lttb_downsample

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return lttb_downsample(ev, n_out=12)


def q_sax_symbols(spark, sf_dir):
    """SAX time-series symbolization (ops/timeseries.sax_symbols): each
    user's value gauge → 8 PAA buckets → z-normalized →
    4-letter-alphabet symbol string; exact integer moments and
    index-split buckets keep every double identical across engines."""
    from oshdb_spark.ops.timeseries import sax_symbols

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return sax_symbols(ev, n_buckets=8, alphabet=4)


def q_retention_cohorts(spark, sf_dir):
    """Cohort retention — the standard growth-analytics matrix: users
    cohorted by their first active week, each later week's activity
    counted per (cohort, week offset) with the retained fraction.
    Distinct (user, week) once, min-week cohorts, one hash join back on
    the user key, two aggregates; rate divides as DOUBLE on both
    engines (DuckDB would integer-divide BIGINTs)."""
    wk = F.floor(F.unix_timestamp("ts").cast("long") / 604800).cast("long")
    base = (
        _t(spark, sf_dir, "events")
        # sparsify to high-value events so cohorts differ and retention
        # actually decays (every user fires SOME event every week)
        .filter(F.col("value") > 180.0)
        .select(F.col("user_id").alias("uid"), wk.alias("wk"))
        .distinct()
    )
    cohort = base.groupBy("uid").agg(F.min("wk").alias("cohort_wk"))
    act = (
        base.join(cohort, "uid")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk")
        )
        .agg(F.countDistinct("uid").alias("active_users"))
    )
    size = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return act.join(size, "cohort_wk").withColumn(
        "retention_rate",
        F.round(
            F.col("active_users").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ),
    )


def q_funnel_conversion(spark, sf_dir):
    """Sequence analytics over sessions: within each 30-min-gap session,
    did a 'click' precede (strictly, in seconds) a 'purchase'? Per user:
    session count, sessions containing a click, converted sessions.
    One window pass (session ids = running sum of gap starts) + one
    aggregate — the funnel shape ANSI SQL needs MATCH_RECOGNIZE for,
    expressed with plain windows so both engines replay it exactly."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    d = (
        ev.withColumn("sec", F.unix_timestamp("ts").cast("long"))
        .withColumn("prev", F.lag("sec").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | (F.col("sec") - F.col("prev") > 1800))
            .cast("long"),
        )
        .withColumn(
            "sess",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per_sess = d.groupBy("user_id", "sess").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("sec"))
        ).alias("first_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("sec"))
        ).alias("last_purchase"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
        ).alias("click_sessions"),
        F.sum(
            F.when(
                F.col("first_click").isNotNull()
                & (F.col("last_purchase") > F.col("first_click")),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )


def _split_stream_dir(src_path: str, order_col: str, n: int = 3) -> str:
    """Materialize a parquet table as ``n`` order-contiguous files in a
    fresh temp dir with strictly increasing mtimes, so FileStreamSource
    (maxFilesPerTrigger=1) replays them as ordered micro-batches — the
    shape a time-partitioned log ingestion produces. Lets the streaming
    driver queries exercise REAL cross-micro-batch state instead of one
    batch covering the whole bounded input."""
    import os
    import tempfile
    import time as _time

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="oshdb_stream_src_")
    tbl = pq.read_table(src_path)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(order_col, "ascending")]))
    step = max(1, (tbl.num_rows + n - 1) // n)
    now = _time.time()
    for i in range(n):
        part = tbl.slice(i * step, step)
        if part.num_rows == 0:
            break
        p = os.path.join(d, f"{i:03d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (now + i, now + i))
    return d


def q_tile_pyramid(spark, sf_dir):
    """Multi-zoom tile-count pyramid (zooms 6/4/2) from one scan: finest
    zoom aggregated directly, coarser zooms cascaded from the previous
    level's aggregate via the exact power-of-two parent mapping
    (geo/cells.tile_pyramid). The oracle computes every zoom's ids
    DIRECTLY from coordinates, so a hash match also proves the cascade
    identity (parent-of-child == direct assignment at the parent zoom)."""
    from oshdb_spark.geo.cells import tile_pyramid

    ev = _t(spark, sf_dir, "events").select("event_id")
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
        - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
        - 850_000_000
    )
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    return tile_pyramid(pts, "lon7", "lat7", (6, 4, 2))


def q_tile_quantiles(spark, sf_dir):
    """Mergeable-sketch tile pyramid (ops/sketches.tdigest_tile_pyramid):
    per-tile median of event value at zooms 4 and 2 — zoom-2 digests
    merged from their zoom-4 children's DIGESTS, rows scanned once (the
    sketch-datacube rollup). Oracle-checked contract: the digest-carried
    per-tile count n must equal the exact count, the exact interpolated
    median matches DuckDB's quantile_cont, and a boolean asserts the
    digest estimate is within 2% (same contract as quantile_sketch)."""
    from oshdb_spark.geo import cells
    from oshdb_spark.ops.sketches import tdigest_tile_pyramid

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
        - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
        - 850_000_000
    )
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    est = tdigest_tile_pyramid(
        pts, "value", "lon7", "lat7", zooms=(4, 2), qs=(0.5,)
    )
    exacts = [
        pts.groupBy(cells.xy_id_col("lon7", "lat7", z).alias("cell"))
        .agg(F.expr("percentile(value, 0.5)").alias("exact_p"))
        .withColumn("zoom", F.lit(z))
        for z in (4, 2)
    ]
    ex = exacts[0].unionByName(exacts[1])
    j = est.join(ex, ["zoom", "cell"])
    return j.select(
        "zoom", "cell", "n",
        F.round("exact_p", 4).alias("exact_p"),
        (
            F.abs(F.col("value") - F.col("exact_p"))
            <= 0.02 * F.abs(F.col("exact_p"))
        ).alias("within_2pct"),
    )


def q_tile_uniques(spark, sf_dir):
    """HLL distinct-count tile pyramid (ops/sketches.hll_tile_pyramid):
    unique contributors per tile at zooms 4 and 2 — zoom-2 sketches are
    hll_union_agg merges of their zoom-4 children, rows scanned once,
    everything whole-stage codegen (no Python). Oracle contract: exact
    per-tile distinct count (computable in both engines) plus a boolean
    that the sketch estimate is within 5% (it is exact in sparse mode at
    these cardinalities; a broken cascade flips the boolean)."""
    from oshdb_spark.geo import cells
    from oshdb_spark.ops.sketches import hll_tile_pyramid

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000))
        - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000))
        - 850_000_000
    )
    pts = ev.withColumn("lon7", lon7).withColumn("lat7", lat7)
    est = hll_tile_pyramid(pts, "user_id", "lon7", "lat7", zooms=(4, 2))
    exacts = [
        pts.groupBy(cells.xy_id_col("lon7", "lat7", z).alias("cell"))
        .agg(F.countDistinct("user_id").alias("uniq"))
        .withColumn("zoom", F.lit(z))
        for z in (4, 2)
    ]
    ex = exacts[0].unionByName(exacts[1])
    j = est.join(ex, ["zoom", "cell"])
    return j.select(
        "zoom", "cell", "uniq",
        (
            F.abs(F.col("uniq_est") - F.col("uniq"))
            <= F.greatest(0.05 * F.col("uniq"), F.lit(1.0))
        ).alias("within_5pct"),
    )


def q_stream_windowed_counts(spark, sf_dir):
    """Structured Streaming: event-time tumbling-window counts per
    event_type over a bounded file stream (availableNow trigger, complete
    mode, memory sink) — the streaming analog of aggregateByTimestamp
    (streaming/incremental.windowed_event_counts), equal to the batch
    GROUP BY because complete mode emits every window. Session tz pinned
    UTC so NTZ event times align like DuckDB's naive-as-UTC epoch()."""
    import uuid

    from oshdb_spark.streaming.incremental import (
        read_event_stream,
        windowed_event_counts,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    stream = read_event_stream(spark, path, schema)
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    out = agg.select(
        F.unix_timestamp("window_start").cast("long").alias("win_start"),
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
    )
    name = "swc_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_tile_counts(spark, sf_dir):
    """Structured Streaming: event-time 7-day-windowed per-tile counts
    (streaming/incremental.windowed_cell_counts — the live tile-heat
    rollup) over a bounded file stream, zoom-4 XYGrid cells assigned in
    codegen on the stream. Complete mode emits every (window, cell), so
    the result equals the batch GROUP BY the oracle runs."""
    import uuid

    from oshdb_spark.streaming.incremental import (
        read_event_stream,
        windowed_cell_counts,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    stream = read_event_stream(spark, path, schema).select(
        "ts",
        (
            F.pmod(F.col("event_id") * 1103515245, F.lit(3_600_000_000))
            - 1_800_000_000
        ).alias("lon7"),
        (
            F.pmod(F.col("event_id") * 1234567891, F.lit(1_700_000_000))
            - 850_000_000
        ).alias("lat7"),
    )
    agg = windowed_cell_counts(
        stream, zoom=4, window="7 days", watermark="2 days"
    )
    out = agg.select(
        F.unix_timestamp("window_start").cast("long").alias("win_start"),
        "cell",
        F.col("cnt").cast("long").alias("cnt"),
    )
    name = "stc_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_dedup(spark, sf_dir):
    """Structured Streaming: cross-micro-batch exact dedup
    (applyInPandasWithState, append mode) — one (fingerprint, keep_id)
    row per distinct content over the whole stream, emitted at first
    sight (streaming/incremental.streaming_exact_dedup). On a bounded
    stream the result equals the batch md5-groupBy-min."""
    import uuid

    from oshdb_spark.streaming.incremental import streaming_exact_dedup

    path = _split_stream_dir(f"{sf_dir}/documents.parquet", "doc_id")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    res = streaming_exact_dedup(stream)
    name = "sdd_" + uuid.uuid4().hex[:8]
    q = (
        res.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_asof_enrich(spark, sf_dir):
    """Structured Streaming: stream-static point-in-time enrichment
    (streaming/incremental.stream_asof_enrich) — every streamed event
    picks its user's latest at-or-before error reading from a STATIC
    interval-ized build table via a broadcast equi-join with a validity
    range predicate (exactly one match per row, append mode, no state).
    Deterministic under any micro-batch split, so the oracle is DuckDB's
    native ASOF LEFT JOIN; summarized per event_type."""
    import uuid

    from oshdb_spark.streaming.incremental import stream_asof_enrich

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts").cast("long")
    )
    builds = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "sec")
        .agg(F.max("value").alias("err_value"))
        .withColumnRenamed("sec", "bsec")
    )
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .withColumn("sec", F.unix_timestamp("ts").cast("long"))
        .select("event_id", "user_id", "event_type", "sec")
    )
    enriched = stream_asof_enrich(
        stream, builds, on="user_id", stream_ts="sec", build_ts="bsec"
    )
    name = "sae_" + uuid.uuid4().hex[:8]
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("r_err_value").isNotNull().cast("long")).alias("n_matched"),
        F.round(F.sum(F.coalesce("r_err_value", F.lit(0.0))), 2).alias("err_sum"),
        F.round(F.avg(F.col("sec") - F.col("r_bsec")), 4).alias("avg_lag"),
    )


def q_stream_contrib_tracker(spark, sf_dir):
    """Structured Streaming: the custom stateful contribution tracker
    (applyInPandasWithState, update mode) — per entity, O(1) state
    carries (visible, tag-state, geometry-epoch) across micro-batches and
    emits cumulative CREATION/DELETION/TAG_CHANGE/GEOMETRY_CHANGE counts
    (streaming/incremental.contribution_tracker). The final row per user
    (greatest n_versions — update mode re-emits per batch) must equal the
    batch lag-rule replay the oracle runs over the full history."""
    import uuid

    from oshdb_spark.streaming.incremental import contribution_tracker

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _split_stream_dir(f"{sf_dir}/events.parquet", "ts")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    res = contribution_tracker(stream)
    name = "sct_" + uuid.uuid4().hex[:8]
    q = (
        res.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = F.max_by(
        F.struct("creations", "deletions", "tag_changes", "geom_changes"),
        "n_versions",
    ).alias("s")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final, F.max("n_versions").alias("n_versions"))
        .select(
            "user_id",
            F.col("s.creations").alias("creations"),
            F.col("s.deletions").alias("deletions"),
            F.col("s.tag_changes").alias("tag_changes"),
            F.col("s.geom_changes").alias("geom_changes"),
            "n_versions",
        )
    )


def q_quantile_sketch(spark, sf_dir):
    """Mergeable t-digest quantiles (estimatedQuantile parity,
    TDigestReducer.java:21-41, compression=1000). The sketch estimate
    itself depends on partial-digest boundaries, so the ORACLE-CHECKED
    contract is its accuracy bound: the engine emits the exact
    interpolated percentile (DuckDB-verifiable) plus a boolean asserting
    the t-digest estimate lies within 2% of it — a wrong sketch flips the
    boolean and fails the hash compare."""
    from oshdb_spark.ops.sketches import tdigest_quantiles

    li = _t(spark, sf_dir, "lineitem")
    est = tdigest_quantiles(li, "l_extendedprice", [0.5, 0.9], by="l_returnflag")
    exact = li.groupBy(F.col("l_returnflag").cast("string").alias("grp")).agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
    )
    j = est.join(F.broadcast(exact), "grp")
    exact_col = F.when(F.col("q") == 0.5, F.col("e50")).otherwise(F.col("e90"))
    return j.select(
        "grp",
        "q",
        F.round(exact_col, 4).alias("exact_p"),
        (F.abs(F.col("value") - exact_col) <= 0.02 * F.abs(exact_col)).alias(
            "within_2pct"
        ),
    )


def q_snapshot_tag_set(spark, sf_dir):
    """tag-set filter (osmTag(key, Collection), MapReducer.java:515-549)
    through the pandas snapshot kernel — the tag_in grammar node compiles
    to an IN predicate (JVM vmatch array on the vectorized path)."""
    docs = docs_from_events(_t(spark, sf_dir, "events"))
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("node")
        .osm_tag("event_type", values=["click", "purchase"])
        .aggregate_by_timestamp()
        .count()
    )


def q_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
    )


def q_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey")
    )


_STORE_CACHE = "/tmp/oshdb_flat_store"


def _store_docs(spark, sf_dir, kind, bbox=None, polygon=None):
    """Docs re-read through the FLAT kernel-ready store
    (plans.layout.write_typed_store): the interleaved JSON is decoded
    once here (ETL) and every query over the store skips the decode.
    Built once per (sf_dir, kind) under /tmp, re-used across driver
    sessions; a `.done` marker guards against partial writes."""
    import hashlib
    import os

    from oshdb_spark.model.history import (
        docs_from_events,
        relation_docs_from_events,
    )
    from oshdb_spark.plans.layout import (
        STORE_SCHEMA_VERSION,
        read_typed_store,
        write_typed_store,
    )

    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{kind}|v{STORE_SCHEMA_VERSION}".encode()
    ).hexdigest()[:12]
    path = f"{_STORE_CACHE}/{key}"
    done = f"{path}/.done"
    if not os.path.exists(done):
        mk = {
            "node": docs_from_events,
            "relation": relation_docs_from_events,
        }[kind]
        write_typed_store(mk(_t(spark, sf_dir, "events")), path)
        open(done, "w").close()
    return read_typed_store(spark, path, bbox=bbox, polygon=polygon)


def q_store_snapshot_bbox_tag(spark, sf_dir):
    """snapshot_bbox_tag re-run over the flat store — certifies the
    ETL-decode-once path end-to-end (routing flags, stored flat arrays,
    vmatch over the stored versions column) against the same oracle."""
    docs = _store_docs(spark, sf_dir, "node")
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(bbox=_BBOX)
        .osm_type("node")
        .osm_tag("event_type", "click")
        .aggregate_by_timestamp()
        .count()
    )


def q_store_snapshot_polygon(spark, sf_dir):
    """snapshot_polygon over the flat store with POLYGON-refined partition
    pruning (cover_prefixes_polygon): reads only polygon-touching cells,
    same oracle as the raw-docs polygon query."""
    import numpy as np

    poly = [np.asarray(_POLY, dtype=np.float64)]
    allv = np.vstack(poly)
    bbox = (
        float(allv[:, 0].min()), float(allv[:, 1].min()),
        float(allv[:, 0].max()), float(allv[:, 1].max()),
    )
    docs = _store_docs(spark, sf_dir, "node", bbox=bbox, polygon=poly)
    return (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .area_of_interest(polygon=[_POLY])
        .osm_type("node")
        .aggregate_by_timestamp()
        .count()
    )


def q_store_relation_length(spark, sf_dir):
    """relation_snapshot_length over the flat store — the member-heavy
    case where the stored rm* arrays replace the dominant decode cost."""
    from oshdb_spark.geo.measures import wkb_length_m

    docs = _store_docs(spark, sf_dir, "relation")
    snaps = (
        OSHDB(docs)
        .snapshot_view()
        .timestamps(SNAPSHOT_TS)
        .osm_type("relation")
        .dataframe()
    )
    return (
        snaps.withColumn("len_m", wkb_length_m("geom_wkb"))
        .groupBy("ts")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("len_m"), 0).alias("total_len_m"),
        )
    )




def q_trend_slopes(spark, sf_dir):
    """Per-user OLS trendline (ops/stats.ols_trend): slope, intercept
    and r2 of value cents against seconds-since-1.5e9 — the regr_slope/
    regr_intercept analog. All five moments are exact DECIMAL(38,0) ≡
    HUGEINT integers; the three closing divisions are written
    term-for-term identically in the oracle, round(6)."""
    from oshdb_spark.ops.stats import ols_trend

    d = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        (F.unix_timestamp("ts").cast("long") - F.lit(1_500_000_000))
        .alias("x"),
        F.round(F.col("value") * 100.0, 0).cast("long").alias("y"),
    )
    return ols_trend(d, "uid", "x", "y")


def q_acf_lags(spark, sf_dir):
    """Per-user sample autocorrelation at lags 1-3 (ops/timeseries.acf)
    over the event-order value sequence: both sums multiply through by
    n so every term is an exact integer (u_t = n·x_t − S in cents);
    one float division per (entity, lag), round(6)."""
    from oshdb_spark.ops.timeseries import acf

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return acf(ev, [1, 2, 3])


def q_seasonal_dow(spark, sf_dir):
    """Classical additive seasonal indexes (ops/timeseries.
    seasonal_indexes): per event type, daily counts on the dense global
    calendar are detrended by a centered 7-day moving average (exact:
    detr = 7·cnt − windowsum, full windows only by integer day-range
    test) and averaged by epoch-day % 7 phase."""
    from oshdb_spark.ops.timeseries import seasonal_indexes

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    return seasonal_indexes(ev, period=7, half_window=3)


def q_hex_bins(spark, sf_dir):
    """Hexagonal binning (geo/cells.hexbin_cols — the H3-style
    aggregation cell): event points fall into a pointy-top hex
    tessellation (Voronoi of two interleaved integer lattices, w = 10
    degrees) decided by ONE pure-codegen exact-int64 distance compare;
    per-hex count + value sum."""
    from oshdb_spark.geo import cells as _c

    pts = _event_points(spark, sf_dir)
    hx, hy = _c.hexbin_cols("lon", "lat", 100_000_000)
    return (
        pts.select(hx, hy, "value")
        .groupBy("hx", "hy")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


_VOR_SEEDS = [
    (
        i,
        (i * 1103515245) % 3_600_000_000 - 1_800_000_000,
        (i * 1234567891) % 1_700_000_000 - 850_000_000,
    )
    for i in range(1, 13)
]


def q_voronoi_assign(spark, sf_dir):
    """Voronoi nearest-seed assignment (geo/cells.voronoi_assign):
    every event point labelled with the closest of 12 deterministic
    seed sites by exact DECIMAL squared fixed-point distance (ties to
    the smaller seed id), then a per-seed rollup — the
    facility-allocation primitive; assignment is one codegen
    array_min projection, no join."""
    from oshdb_spark.geo import cells as _c

    pts = _event_points(spark, sf_dir)
    return (
        _c.voronoi_assign(pts, _VOR_SEEDS, "lon", "lat")
        .groupBy("seed_id")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )




def q_lpa_communities(spark, sf_dir):
    """Synchronous label-propagation communities (ops/graph.
    label_propagation, 4 rounds, deterministic most-frequent-neighbor
    tie order) over the SAME clustered-walk cell hop graph as
    kcore_cells — users cluster in 6-degree slots, so LPA recovers the
    slot neighborhoods. The oracle unrolls all 4 rounds as CTE
    layers."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c
    from oshdb_spark.ops.graph import label_propagation

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    ).withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .filter(F.col("pcell").isNotNull())
        .select("pcell", "cell")
    )
    return label_propagation(hops, rounds=4, src="pcell", dst="cell")


def q_dp_tracks(spark, sf_dir):
    """Douglas-Peucker simplification (geo/trajectory.simplify_dp,
    tolerance 1 degree in fixed-point units) of the clustered-walk
    tracks — exact-integer cross-product decisions end to end; the
    oracle replays the full recursion as a segment-splitting recursive
    CTE with HUGEINT cross products."""
    from oshdb_spark.geo.trajectory import simplify_dp

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return simplify_dp(pts, 10_000_000)


def q_token_lift(spark, sf_dir):
    """Token co-occurrence lift (ops/textstats.token_pair_lift — the
    exact-arithmetic PMI): document frequencies and
    lift = n_ab*D/(n_a*n_b) for pairs co-occurring in >= 3 docs,
    tokens capped deterministically at 40 per doc."""
    from oshdb_spark.ops.textstats import token_pair_lift

    return token_pair_lift(
        _t(spark, sf_dir, "documents"),
        min_count=3,
        max_tokens_per_doc=40,
    )




def q_hampel_outliers(spark, sf_dir):
    """Hampel robust outlier filter (ops/timeseries.hampel_outliers):
    per-user rolling 7-sample median + MAD in integer cents; flag when
    |x − med| > 3·MAD — every decision pure integer, full windows
    only."""
    from oshdb_spark.ops.timeseries import hampel_outliers

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return hampel_outliers(ev, half_window=3, k_num=3, k_den=1)


def q_ab_test(spark, sf_dir):
    """Two-proportion z-test vs control (ops/stats.ztest_vs_control):
    arms = event_id % 3, success = purchase events; exact integer
    counts, one closed-form float z per arm (pooled variance),
    broadcast control row."""
    from oshdb_spark.ops.stats import ztest_vs_control

    d = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 3).alias("arm"),
        (F.col("event_type") == "purchase").alias("ok"),
    )
    return ztest_vs_control(d, "arm", "ok", 0)


def q_path_ngrams(spark, sf_dir):
    """Clickstream path trigrams (ops/textstats.path_ngrams): 3-step
    event-type journeys within per-(user, day) sessions via two lead
    windows over one sort; exact counts, deterministic >= 3
    threshold."""
    from oshdb_spark.ops.textstats import path_ngrams

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
    ).withColumn("day", F.floor(F.col("sec") / 86400).cast("long"))
    return path_ngrams(ev, n=3, min_count=3)


def q_typo_pairs(spark, sf_dir):
    """Edit-distance-1 vocabulary pairs via SymSpell deletion
    neighborhoods (ops/dedup.typo_pairs) over a username-like corpus
    synthesized from event ids (md5-seeded 4/5-letter words — the
    documents table's 24-token vocabulary has no distance-1 pairs, so
    it cannot exercise the operator). The oracle is INDEPENDENT: a
    brute-force self-join with DuckDB's levenshtein — no deletion
    trick."""
    from oshdb_spark.ops.dedup import typo_pairs

    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
        16, 10,
    ).cast("long")
    h2 = (h / 2).cast("long")
    word5 = F.concat(
        *[
            F.chr(F.lit(97) + (h2 / F.lit(26 ** k)).cast("long") % 26)
            for k in range(5)
        ]
    )
    n = (F.lit(4) + F.pmod(h, F.lit(2))).cast("int")
    docs = _t(spark, sf_dir, "events").select(
        F.substring(word5, F.lit(1), n).alias("text")
    )
    return typo_pairs(docs, min_len=4)




def q_geary_events(spark, sf_dir):
    """Global Geary's C spatial autocorrelation (geo/cells.geary_c) of
    the zoom-6 event-count raster — Moran's I's local-contrast
    companion. Pair sum decomposed into two focal passes (values +
    squared values); every aggregate exact int64; one fixed-
    association double expression, round(9)."""
    from oshdb_spark.geo.cells import geary_c

    return geary_c(_event_cell_raster(spark, sf_dir), 6)


def q_theil_sen_cells(spark, sf_dir):
    """Theil-Sen robust trend per cell (geo/cells.theil_sen_trend)
    over the SAME zoom-6 × calendar-week cube as trend_cells: the
    lower median of all pairwise slopes under the deterministic
    (slope, t1, t2) total order; each slope one correctly-rounded
    division of exact integers."""
    from oshdb_spark.geo import cells as _c
    from oshdb_spark.geo.cells import theil_sen_trend

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    lon7 = (
        F.pmod(F.col("event_id") * F.lit(1103515245),
               F.lit(3_600_000_000)) - 1_800_000_000
    )
    lat7 = (
        F.pmod(F.col("event_id") * F.lit(1234567891),
               F.lit(1_700_000_000)) - 850_000_000
    )
    cube = (
        ev.withColumn("lon7", lon7)
        .withColumn("lat7", lat7)
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 6))
        .withColumn("wk", F.floor(F.col("sec") / 604800).cast("long"))
        .groupBy("cell", "wk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cell") >= 0)
    )
    return theil_sen_trend(cube)


def q_trimmed_mean(spark, sf_dir):
    """10% two-sided trimmed mean of lineitem price cents per return
    flag (ops/stats.trimmed_mean): drop floor(n/10) rows at each tail
    by exact rank, average the exact-integer rest."""
    from oshdb_spark.ops.stats import trimmed_mean

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("long")
        .alias("price_c"),
    )
    return trimmed_mean(li, "l_returnflag", "price_c", 1, 10)


def q_quartiles_price(spark, sf_dir):
    """Exact percentile_disc quartiles of lineitem price cents per
    return flag (ops/stats.quartiles_exact): integer rank picks, no
    interpolation."""
    from oshdb_spark.ops.stats import quartiles_exact

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("long")
        .alias("price_c"),
    )
    return quartiles_exact(li, "l_returnflag", "price_c")




def q_quadkey_counts(spark, sf_dir):
    """Quadkey tile binning (geo/cells.quadkey_col — the Bing-maps
    interchange digit order over the engine's equirect XYGrid): zoom-6
    tile quadkey per event point, pure integer codegen, per-tile
    counts; a parent's key prefixes every descendant's."""
    from oshdb_spark.geo import cells as _c

    pts = _event_points(spark, sf_dir)
    return (
        pts.select(_c.quadkey_col("lon", "lat", 6).alias("quadkey"))
        .groupBy("quadkey")
        .agg(F.count(F.lit(1)).alias("n_pts"))
    )


def q_hex_smooth(spark, sf_dir):
    """Hex k-ring smoothing (geo/cells.hex_smooth): the zoom-appropri-
    ate hexbin raster of event points smoothed over each hex's 6
    equidistant neighbors + itself — focal_stats' hexagonal twin,
    sparse no-data semantics, exact integer sums."""
    from oshdb_spark.geo import cells as _c

    pts = _event_points(spark, sf_dir)
    hx, hy = _c.hexbin_cols("lon", "lat", 200_000_000)
    hb = pts.select(hx, hy).groupBy("hx", "hy").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return _c.hex_smooth(hb, 200_000_000)


def q_span_profile(spark, sf_dir):
    """Interleaved span-sequence profile of the synthesized doc corpus
    (model/history.docs_from_events — the input_hint table shape): per
    span kind, doc/span/media_ref counts plus the dense-offset
    integrity bit (every span's stored offset equals its array
    position — the per-row span-sequence contract as an audited
    aggregate). The oracle derives the expected counts from the raw
    events via the dedup rule (first event per (user, second)) without
    replaying the JSON payloads."""
    from oshdb_spark.model.history import docs_from_events

    docs = docs_from_events(_t(spark, sf_dir, "events"))
    ex = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    )
    return (
        ex.groupBy(F.col("s.kind").alias("kind"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("s.media_ref") != "", 1).otherwise(0)
            ).alias("n_media_refs"),
            F.min(F.col("s.offset") == F.col("pos")).alias("dense_ok"),
        )
    )




def q_diversity_profile(spark, sf_dir):
    """Per-user categorical diversity without logarithms (ops/stats.
    diversity_profile): Gini-Simpson impurity + inverse-Simpson
    effective category count over event types — exact-rational until
    one final division each."""
    from oshdb_spark.ops.stats import diversity_profile

    d = _t(spark, sf_dir, "events").select("user_id", "event_type")
    return diversity_profile(d, "user_id", "event_type")


def q_track_waypoints(spark, sf_dir):
    """Path-length quartile waypoints (geo/trajectory.track_waypoints,
    ST_LineInterpolatePoint analog): where each clustered-walk track
    stood at 25/50/75% of its total path length — integer-mm
    cumulative sums, exactly one bracketing segment per fraction, one
    float interpolation."""
    from oshdb_spark.geo.trajectory import track_waypoints

    slot = (F.col("user_id") / 2).cast("long")
    pts = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )
    return track_waypoints(pts)


def q_od_anomalies(spark, sf_dir):
    """Origin-destination flow anomalies against the independence
    (gravity-numerator) model: per (from_cell, to_cell) hop flow at
    zoom 4, lift = obs·T/(O_from·D_to) — flows far above 1 are
    corridor anomalies. Exact integer marginals from the SAME hop set;
    one rounded division. Flows below 3 observations are dropped
    (deterministic threshold)."""
    from pyspark.sql import Window

    from oshdb_spark.geo import cells as _c

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    pts = (
        ev.withColumn(
            "lon7",
            F.pmod(F.col("event_id") * F.lit(1103515245),
                   F.lit(3_600_000_000)) - 1_800_000_000,
        )
        .withColumn(
            "lat7",
            F.pmod(F.col("event_id") * F.lit(1234567891),
                   F.lit(1_700_000_000)) - 850_000_000,
        )
        .withColumn("cell", _c.xy_id_col("lon7", "lat7", 4))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = (
        pts.withColumn("pcell", F.lag("cell").over(w))
        .filter(F.col("pcell").isNotNull())
        .select(F.col("pcell").alias("from_cell"),
                F.col("cell").alias("to_cell"))
    )
    od = hops.groupBy("from_cell", "to_cell").agg(
        F.count(F.lit(1)).alias("obs")
    )
    o = od.groupBy("from_cell").agg(F.sum("obs").alias("o_i"))
    dd = od.groupBy("to_cell").agg(F.sum("obs").alias("d_j"))
    t = od.agg(F.sum("obs").alias("t_all"))
    return (
        od.join(o, "from_cell")
        .join(dd, "to_cell")
        .crossJoin(F.broadcast(t))
        .filter(F.col("obs") >= 3)
        .select(
            "from_cell", "to_cell", "obs", "o_i", "d_j",
            F.round(
                (F.col("obs") * F.col("t_all")).cast("double")
                / (F.col("o_i") * F.col("d_j")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def q_tile_changes(spark, sf_dir):
    """Per-tile change detection between two snapshot instants (the
    ohsome 'how did this area change' analytic): visible node counts
    at 2024-01-08 vs 2024-01-29 per zoom-6 cell from the SAME
    validity-window model every snapshot query uses; full-outer join,
    integer delta."""
    from oshdb_spark.geo import cells as _c

    t1, t2 = SNAPSHOT_TS[1], SNAPSHOT_TS[4]
    v = versions_from_events(_t(spark, sf_dir, "events")).filter(
        "visible"
    ).withColumn("cell", _c.xy_id_col("lon", "lat", 6))

    def alive(t):
        return v.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )

    c1 = alive(t1).groupBy("cell").agg(F.count(F.lit(1)).alias("_n1"))
    c2 = alive(t2).groupBy("cell").agg(F.count(F.lit(1)).alias("_n2"))
    return (
        c1.join(c2, "cell", "full")
        .select(
            "cell",
            F.coalesce("_n1", F.lit(0)).alias("n_t1"),
            F.coalesce("_n2", F.lit(0)).alias("n_t2"),
            (F.coalesce("_n2", F.lit(0))
             - F.coalesce("_n1", F.lit(0))).alias("delta"),
        )
    )




def q_calibration(spark, sf_dir):
    """Classifier calibration/reliability table (ops/stats.
    calibration_bins): a synthetic roughly-calibrated scorer over
    documents (score = hash per-myriad; label = integer threshold test
    correlated with it), decile bins, exact counts, per-bin
    confidence-accuracy gap."""
    from oshdb_spark.ops.stats import calibration_bins

    sc = F.pmod(F.col("doc_id") * 1103515245, F.lit(10001))
    lbl = (
        F.pmod(F.col("doc_id") * 7919, F.lit(10000)) * 10
        < sc * 8 + 10000
    )
    d = _t(spark, sf_dir, "documents").select(
        (sc.cast("double") / 10000.0).alias("score"),
        lbl.alias("label"),
    )
    return calibration_bins(d, "score", "label", 10)


def q_rank_normalize(spark, sf_dir):
    """Percentile-rank normalization (ops/stats.rank_normalize) of
    document length within each source — doubled average ranks keep
    ties exact; one division per row."""
    from oshdb_spark.ops.stats import rank_normalize

    d = _t(spark, sf_dir, "documents").select("source", "n_chars")
    return rank_normalize(d, "source", "n_chars")


def q_rolling_dau(spark, sf_dir):
    """Rolling DAU/WAU/MAU + stickiness (ops/timeseries.
    rolling_active_users): distinct user-days fan out to trailing
    windows, one aggregate of filtered distinct counts per day."""
    from oshdb_spark.ops.timeseries import rolling_active_users

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    return rolling_active_users(ev)




def q_bpe_merges(spark, sf_dir):
    """BPE merge learning (ops/lm.bpe_top_merges, 4 rounds): the
    tokenizer-training primitive — per round the most frequent
    adjacent symbol pair (count DESC, pair ASC) becomes a new symbol
    via a deterministic replace chain; pair counts aggregate over the
    bounded vocabulary, winners are one-row collects (the kmeans
    collected-centroid pattern). The oracle unrolls all rounds with
    the identical replace chain."""
    from oshdb_spark.ops.lm import bpe_top_merges

    return bpe_top_merges(_t(spark, sf_dir, "documents"), 4)


def q_dispersion_events(spark, sf_dir):
    """Index of dispersion / Fano factor of daily counts per event
    type (ops/stats.dispersion_index): burstiness over the dense
    calendar via the explode-free closed form — exact int64 terms,
    two rounded divisions."""
    from oshdb_spark.ops.stats import dispersion_index

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    return dispersion_index(ev, "event_type")




def q_skyline_docs(spark, sf_dir):
    """2-D skyline / Pareto frontier (ops/topk.skyline2d): documents
    not dominated under (maximize distinct-token count, minimize
    n_chars) — the vocabulary-density frontier. Pure windows, exact
    integer dominance; the oracle is an INDEPENDENT O(n²) NOT-EXISTS
    brute force."""
    from oshdb_spark.ops.topk import skyline2d

    d = _t(spark, sf_dir, "documents").select(
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
        "n_chars",
    )
    return skyline2d(d, "n_tokens", "n_chars")




def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift test (ops/stats.ks_2sample)
    between the click and purchase value distributions (integer
    cents): exact-rational sup-gap with a deterministic argmax
    location, one rounded division."""
    from oshdb_spark.ops.stats import ks_2sample

    d = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("c"),
    )
    return ks_2sample(d, "event_type", "c", "click", "purchase")




def q_gini_spend(spark, sf_dir):
    """Gini inequality coefficient (ops/stats.gini_inequality) of
    lineitem price cents per return flag — exact integer Lorenz sum,
    one division."""
    from oshdb_spark.ops.stats import gini_inequality

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100.0, 0)
        .cast("long")
        .alias("price_c"),
    )
    return gini_inequality(li, "l_returnflag", "price_c")


def q_mwu_drift(spark, sf_dir):
    """Mann-Whitney U rank-sum test (ops/stats.mannwhitney_u) between
    click and purchase value distributions — doubled average ranks
    keep 2U exact; tie-corrected normal z, round(6)."""
    from oshdb_spark.ops.stats import mannwhitney_u

    d = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100.0, 0).cast("long").alias("c"),
    )
    return mannwhitney_u(d, "event_type", "c", "click", "purchase")




def q_ccf_lags(spark, sf_dir):
    """Cross-correlation function click→purchase (ops/timeseries.
    ccf_lags): daily-count CCF at lags −3..+3 on the dense shared
    calendar — multiply-through integers, one division + sqrt per
    lag."""
    from oshdb_spark.ops.timeseries import ccf_lags

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_timestamp("ts").cast("long").alias("sec")
    )
    return ccf_lags(ev, "click", "purchase", max_lag=3)


def q_hex_pyramid(spark, sf_dir):
    """Hierarchical hex rollup (the H3-style parent-child pyramid,
    aperture-by-rebinning): event points bin at w=10 degrees, child
    CENTERS re-bin at 2w and 4w — each child wholly assigned to one
    parent, so counts roll up exactly; three pure-codegen lattice
    assignments, three aggregates, one scan of the points."""
    from oshdb_spark.geo import cells as _c

    pts = _event_points(spark, sf_dir)
    hx0, hy0 = _c.hexbin_cols("lon", "lat", 100_000_000)
    l0 = pts.select(hx0, hy0).groupBy("hx", "hy").agg(
        F.count(F.lit(1)).alias("n_pts")
    ).localCheckpoint()
    hx1, hy1 = _c.hexbin_cols("hx", "hy", 200_000_000)
    l1 = l0.select(hx1, hy1, "n_pts").groupBy("hx", "hy").agg(
        F.sum("n_pts").alias("n_pts")
    ).localCheckpoint()
    hx2, hy2 = _c.hexbin_cols("hx", "hy", 400_000_000)
    l2 = l1.select(hx2, hy2, "n_pts").groupBy("hx", "hy").agg(
        F.sum("n_pts").alias("n_pts")
    )
    return (
        l0.select(F.lit(0).alias("level"), "hx", "hy", "n_pts")
        .unionByName(
            l1.select(F.lit(1).alias("level"), "hx", "hy", "n_pts")
        )
        .unionByName(
            l2.select(F.lit(2).alias("level"), "hx", "hy", "n_pts")
        )
    )




def _dtw_points(spark, sf_dir):
    """The dtw_pairs input: 4:1-downsampled clustered walks on a 24×8
    grid of 15° slots with ±3° jitter (shared with the plan audit's
    candidate-count probe)."""
    slot = (F.col("user_id") / 2).cast("long")
    return _t(spark, sf_dir, "events").filter(
        F.col("event_id") % 4 == 0
    ).select(
        F.col("user_id").alias("entity"),
        F.col("event_id").alias("ord_key"),
        (
            (slot % 24) * 150_000_000 - 1_800_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1103515245, F.lit(60_000_001))
            - 30_000_000
        ).alias("lon7"),
        (
            ((slot / 24).cast("long") % 8) * 150_000_000
            - 600_000_000 + 75_000_000
            + F.pmod(F.col("event_id") * 1234567891, F.lit(60_000_001))
            - 30_000_000
        ).alias("lat7"),
    )


def q_dtw_pairs(spark, sf_dir):
    """DTW trajectory-similarity join (geo/trajectory.dtw_join):
    entity pairs whose 4:1-downsampled clustered walks align within a
    5,000 km total DTW path cost — the sequence-aware companion to
    traj_hausdorff. Exact-integer DP end to end; the oracle replays
    the full DP as an anti-diagonal wavefront recursive CTE over ALL
    entity pairs (no blocking — an independent check of the padded-
    bbox candidate stage)."""
    from oshdb_spark.geo.trajectory import dtw_join

    return dtw_join(_dtw_points(spark, sf_dir), 5_000_000.0)




def q_changepoints(spark, sf_dir):
    """Depth-2 binary-segmentation changepoints (ops/timeseries.
    binary_segmentation) over each user's value sequence: exact-
    integer CUSUM statistic D(k) = |m·P_k' − j·T_s| with smallest-k
    ties; up to 3 splits per user."""
    from oshdb_spark.ops.timeseries import binary_segmentation

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return binary_segmentation(ev)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "snapshot_count": q_snapshot_count,
        "snapshot_bbox_tag": q_snapshot_bbox_tag,
        "contribution_types": q_contribution_types,
        "contrib_by_region": q_contrib_by_region,
        "contrib_by_region_poly": q_contrib_by_region_poly,
        "contrib_monthly_zerofill": q_contrib_monthly_zerofill,
        "reducer_group_sum_avg": q_reducer_group_sum_avg,
        "reducer_count_uniq": q_reducer_count_uniq,
        "reducer_weighted_avg": q_reducer_weighted_avg,
        "agg_by_index_nation": q_agg_by_index_nation,
        "cell_count_z6": q_cell_count_z6,
        "poly_aoi_filter": q_poly_aoi_filter,
        "geodesic_traj_length": q_geodesic_traj_length,
        "stay_points": q_stay_points,
        "geofence_transitions": q_geofence_transitions,
        "zonal_sum_latband": q_zonal_sum_latband,
        "way_snapshot_length": q_way_snapshot_length,
        "way_polygon_clip": q_way_polygon_clip,
        "way_length_by_region": q_way_length_by_region,
        "contrib_length_by_region": q_contrib_length_by_region,
        "relation_snapshot_length": q_relation_snapshot_length,
        "relation_contrib_types": q_relation_contrib_types,
        "snapshot_polygon": q_snapshot_polygon,
        "snapshot_multi_aoi": q_snapshot_multi_aoi,
        "snapshot_tag_regex": q_snapshot_tag_regex,
        "snapshot_tag_any": q_snapshot_tag_any,
        "snapshot_tag_set": q_snapshot_tag_set,
        "polygon_clip_area": q_polygon_clip_area,
        "snapshot_by_ts_and_tag": q_snapshot_by_ts_and_tag,
        "entity_history": q_entity_history,
        "contrib_uniq_contributors": q_contrib_uniq_contributors,
        "contrib_uniq_approx": q_contrib_uniq_approx,
        "ring_area": q_ring_area,
        "agg_by_geometry": q_agg_by_geometry,
        "knn_events": q_knn_events,
        "knn_batch_events": q_knn_batch_events,
        "zonal_rect": q_zonal_rect,
        "dissolve_rect": q_dissolve_rect,
        "dissolve_rings": q_dissolve_rings,
        "multipolygon_area": q_multipolygon_area,
        "dedup_embedding": q_dedup_embedding,
        "dedup_exact": q_dedup_exact,
        "dedup_substring": q_dedup_substring,
        "dedup_minhash": q_dedup_minhash,
        "dedup_components": q_dedup_components,
        "dedup_keep": q_dedup_keep,
        "dedup_simhash": q_dedup_simhash,
        "dedup_incremental": q_dedup_incremental,
        "export_shards": q_export_shards,
        "focal_mean": q_focal_mean,
        "hotspot_gi": q_hotspot_gi,
        "spacetime_hotspots": q_spacetime_hotspots,
        "trend_cells": q_trend_cells,
        "travel_cost": q_travel_cost,
        "triangles": q_triangles,
        "assortativity": q_assortativity,
        "kcore_cells": q_kcore_cells,
        "od_matrix": q_od_matrix,
        "simplify_tracks": q_simplify_tracks,
        "colocation_pairs": q_colocation_pairs,
        "dbscan_fixes": q_dbscan_fixes,
        "stream_colocation": q_stream_colocation,
        "heading_stats": q_heading_stats,
        "geohash_counts": q_geohash_counts,
        "convex_hulls": q_convex_hulls,
        "sde_tracks": q_sde_tracks,
        "retention_cohorts": q_retention_cohorts,
        "twa_value": q_twa_value,
        "ohlc_weekly": q_ohlc_weekly,
        "stream_sessions": q_stream_sessions,
        "gapfill_daily": q_gapfill_daily,
        "interp_daily": q_interp_daily,
        "counter_rate": q_counter_rate,
        "uptime_islands": q_uptime_islands,
        "spearman_quality": q_spearman_quality,
        "weighted_median": q_weighted_median,
        "trend_slopes": q_trend_slopes,
        "acf_lags": q_acf_lags,
        "seasonal_dow": q_seasonal_dow,
        "hex_bins": q_hex_bins,
        "voronoi_assign": q_voronoi_assign,
        "lpa_communities": q_lpa_communities,
        "dp_tracks": q_dp_tracks,
        "token_lift": q_token_lift,
        "hampel_outliers": q_hampel_outliers,
        "ab_test": q_ab_test,
        "path_ngrams": q_path_ngrams,
        "typo_pairs": q_typo_pairs,
        "geary_events": q_geary_events,
        "theil_sen_cells": q_theil_sen_cells,
        "trimmed_mean": q_trimmed_mean,
        "quartiles_price": q_quartiles_price,
        "quadkey_counts": q_quadkey_counts,
        "hex_smooth": q_hex_smooth,
        "span_profile": q_span_profile,
        "diversity_profile": q_diversity_profile,
        "track_waypoints": q_track_waypoints,
        "od_anomalies": q_od_anomalies,
        "tile_changes": q_tile_changes,
        "calibration": q_calibration,
        "rank_normalize": q_rank_normalize,
        "rolling_dau": q_rolling_dau,
        "bpe_merges": q_bpe_merges,
        "dispersion_events": q_dispersion_events,
        "skyline_docs": q_skyline_docs,
        "ks_drift": q_ks_drift,
        "gini_spend": q_gini_spend,
        "mwu_drift": q_mwu_drift,
        "ccf_lags": q_ccf_lags,
        "hex_pyramid": q_hex_pyramid,
        "dtw_pairs": q_dtw_pairs,
        "changepoints": q_changepoints,
        "cusum_drift": q_cusum_drift,
        "contour_lines": q_contour_lines,
        "attribution_last_touch": q_attribution_last_touch,
        "event_transitions": q_event_transitions,
        "sax_symbols": q_sax_symbols,
        "lttb_values": q_lttb_values,
        "tfidf_keywords": q_tfidf_keywords,
        "moran_events": q_moran_events,
        "lisa_events": q_lisa_events,
        "slope_cells": q_slope_cells,
        "stream_export_shards": q_stream_export_shards,
        "vocab_stats": q_vocab_stats,
        "pagerank": q_pagerank,
        "snapshot_ratio": q_snapshot_ratio,
        "funnel_conversion": q_funnel_conversion,
        "hybrid_search": q_hybrid_search,
        "contributor_accretion": q_contributor_accretion,
        "bloom_prefilter": q_bloom_prefilter,
        "cms_user_counts": q_cms_user_counts,
        "sim_topk": q_sim_topk,
        "sim_int8": q_sim_int8,
        "sim_knn_join": q_sim_knn_join,
        "sim_pq": q_sim_pq,
        "heavy_hitters": q_heavy_hitters,
        "chunk_windows": q_chunk_windows,
        "text_bm25": q_text_bm25,
        "sim_lsh_ann": q_sim_lsh_ann,
        "sim_ivf": q_sim_ivf,
        "sim_ivf_trained": q_sim_ivf_trained,
        "kmeans_centroids": q_kmeans_centroids,
        "embedding_covariance": q_embedding_covariance,
        "pca_loadings": q_pca_loadings,
        "sample_diversity": q_sample_diversity,
        "sample_stratified": q_sample_stratified,
        "sample_weighted": q_sample_weighted,
        "asof_join_events": q_asof_join_events,
        "interval_join_cells": q_interval_join_cells,
        "topk_per_group": q_topk_per_group,
        "areal_interp": q_areal_interp,
        "geoblocks_polygon": q_geoblocks_polygon,
        "chunk_plan": q_chunk_plan,
        "text_repetition": q_text_repetition,
        "pipeline_prep": q_pipeline_prep,
        "contamination": q_contamination,
        "pattern_scan": q_pattern_scan,
        "redact": q_redact,
        "source_mix": q_source_mix,
        "url_domains": q_url_domains,
        "split_domains": q_split_domains,
        "lm_quality": q_lm_quality,
        "dsir_weights": q_dsir_weights,
        "quality_classifier": q_quality_classifier,
        "spatial_join_table": q_spatial_join_table,
        "spatial_join_poly": q_spatial_join_poly,
        "overlay_rect": q_overlay_rect,
        "overlay_clip_lines": q_overlay_clip_lines,
        "distance_join": q_distance_join,
        "knn_join_table": q_knn_join_table,
        "snap_segments": q_snap_segments,
        "kde_events": q_kde_events,
        "idw_surface": q_idw_surface,
        "hmm_match": q_hmm_match,
        "traj_hausdorff": q_traj_hausdorff,
        "dedup_semantic": q_dedup_semantic,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "media_meta": q_media_meta,
        "media_resize": q_media_resize,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "media_phash_dedup": q_media_phash_dedup,
        "media_dedup_groups": q_media_dedup_groups,
        "sessionization": q_sessionization,
        "tile_pyramid": q_tile_pyramid,
        "stream_windowed_counts": q_stream_windowed_counts,
        "stream_dedup": q_stream_dedup,
        "stream_asof_enrich": q_stream_asof_enrich,
        "stream_tile_counts": q_stream_tile_counts,
        "stream_contrib_tracker": q_stream_contrib_tracker,
        "quantiles": q_quantiles,
        "quantile_sketch": q_quantile_sketch,
        "tile_quantiles": q_tile_quantiles,
        "tile_uniques": q_tile_uniques,
        "topk_orders": q_topk_orders,
        "store_snapshot_bbox_tag": q_store_snapshot_bbox_tag,
        "store_snapshot_polygon": q_store_snapshot_polygon,
        "store_relation_length": q_store_relation_length,
    }


def _lsh_ann_oracle() -> str:
    """DuckDB mirror of ops.similarity.lsh_ann(k=10, n_planes=8,
    multiprobe=2): hyperplane literals come from the SAME _hyperplanes
    code, so the two sides stay in sync by construction. Testdata
    embeddings are dim=64 at every sf."""
    from oshdb_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(64, 8)
    rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(x) for x in pl) + "])"
        for i, pl in enumerate(planes)
    )
    return f"""
        WITH planes AS (SELECT * FROM (VALUES {rows}) p(i, pl)),
        q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0),
        qb AS (
          SELECT CAST(sum(CASE WHEN list_inner_product(q.qv, p.pl) >= 0
                          THEN (1 << p.i) ELSE 0 END) AS INT) AS b
          FROM q, planes p),
        bt AS (
          SELECT vec_id,
            CAST(sum(CASE WHEN list_inner_product(embedding::DOUBLE[], p.pl)
                           >= 0 THEN (1 << p.i) ELSE 0 END) AS INT) AS b
          FROM embeddings, planes p GROUP BY 1),
        probes AS (
          SELECT b FROM qb
          UNION
          SELECT xor(qb.b, 1 << t.i) FROM qb,
            UNNEST(generate_series(0, 7)) t(i)
          UNION
          SELECT xor(xor(qb.b, 1 << t.i), 1 << s.j) FROM qb,
            UNNEST(generate_series(0, 7)) t(i),
            UNNEST(generate_series(0, 7)) s(j)
          WHERE s.j > t.i)
        SELECT vec_id FROM (
          SELECT e.vec_id,
            list_inner_product(e.embedding::DOUBLE[], q.qv)
            / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                       e.embedding::DOUBLE[]))
               * sqrt(list_inner_product(q.qv, q.qv))) AS c
          FROM embeddings e JOIN bt ON e.vec_id = bt.vec_id, q
          WHERE bt.b IN (SELECT b FROM probes))
        ORDER BY c DESC, vec_id LIMIT 10
    """


# Deterministic k-means replay (ops.clustering.kmeans_train, k=8,
# n_iter=2): shared by the kmeans_centroids and dedup_semantic oracles so
# the chain can't drift between them. Yields CTEs emb / init / a1 / u1 /
# cents1 / a2 / u2 / cents2.
_KMEANS_CTES = """emb AS (SELECT vec_id, embedding::DOUBLE[] AS e
                         FROM embeddings),
            init AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS c,
                            e AS ce
                     FROM emb ORDER BY vec_id LIMIT 8),
            a1 AS (
              SELECT vec_id, e, c AS cl FROM (
                SELECT emb.vec_id, emb.e, init.c,
                       row_number() OVER (
                         PARTITION BY emb.vec_id
                         ORDER BY list_distance(emb.e, init.ce), init.c
                       ) AS rn
                FROM emb CROSS JOIN init)
              WHERE rn = 1),
            u1 AS (
              SELECT cl, i, round(avg(v), 6) AS m FROM (
                SELECT cl, unnest(e) AS v, generate_subscripts(e, 1) AS i
                FROM a1)
              GROUP BY cl, i),
            cents1 AS (
              SELECT init.c, coalesce(nn.ce, init.ce) AS ce
              FROM init LEFT JOIN (
                SELECT cl AS c, list(m ORDER BY i) AS ce
                FROM u1 GROUP BY cl) nn USING (c)),
            a2 AS (
              SELECT vec_id, e, c AS cl FROM (
                SELECT emb.vec_id, emb.e, cents1.c,
                       row_number() OVER (
                         PARTITION BY emb.vec_id
                         ORDER BY list_distance(emb.e, cents1.ce), cents1.c
                       ) AS rn
                FROM emb CROSS JOIN cents1)
              WHERE rn = 1),
            u2 AS (
              SELECT cl, i, round(avg(v), 6) AS m FROM (
                SELECT cl, unnest(e) AS v, generate_subscripts(e, 1) AS i
                FROM a2)
              GROUP BY cl, i),
            cents2 AS (
              SELECT cents1.c, coalesce(nn.ce, cents1.ce) AS ce
              FROM cents1 LEFT JOIN (
                SELECT cl AS c, list(m ORDER BY i) AS ce
                FROM u2 GROUP BY cl) nn USING (c))"""


# integer-exact covariance CTEs shared by embedding_covariance and
# pca_loadings: quantization (half away from zero), exact BIGINT sums,
# and the IEEE derivation expression mirror ops/stats.py term-for-term;
# `+ 0.0` normalizes the sign of zero on both engines
_PCA_COV_CTES = """q AS (
              SELECT list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(CASE WHEN x >= 0
                                      THEN floor(x*1000000.0 + 0.5)
                                      ELSE -floor(-x*1000000.0 + 0.5)
                                 END AS BIGINT)) AS qv
              FROM embeddings),
            idx AS (SELECT unnest(range(64)) AS i),
            nn AS (SELECT count(*) AS n FROM q),
            ms AS (SELECT i.i, CAST(sum(qv[i.i+1]) AS BIGINT) AS m
                   FROM q, idx i GROUP BY 1),
            ss AS (SELECT i.i, j.i AS j,
                          CAST(sum(qv[i.i+1]*qv[j.i+1]) AS BIGINT) AS s
                   FROM q, idx i, idx j GROUP BY 1, 2),
            cov AS (
              SELECT s.i, s.j,
                     round(CAST(s.s AS DOUBLE)/nn.n/1000000000000.0
                           - (CAST(mi.m AS DOUBLE)/nn.n/1000000.0)
                             * (CAST(mj.m AS DOUBLE)/nn.n/1000000.0), 6)
                       + 0.0 AS cov
              FROM ss s JOIN ms mi ON mi.i = s.i
                        JOIN ms mj ON mj.i = s.j, nn)"""


def _hex_h(w: int) -> int:
    from oshdb_spark.geo.cells import hex_height7

    return hex_height7(w)


_HEX_H200 = _hex_h(200_000_000)  # 346410160 — shared with the engine


def _hex_sql(xe: str, ye: str, w: int, h: int | None = None):
    """DuckDB replay of geo/cells.hexbin_cols: the identical doubled-
    lattice integer nearest-center predicate, generated from the SAME
    (w, h) the engine uses (h defaults to cells.hex_height7 = even
    √3·w) so the oracle constants can never drift from the engine's.
    Returns (hx_sql, hy_sql) expressions over columns ``xe``/``ye``."""
    from oshdb_spark.geo.cells import hex_height7

    w = int(w)
    h = int(h) if h is not None else hex_height7(w)
    X = f"({xe} + 1800000000)"
    Y = f"({ye} + 900000000)"
    ax = f"((({X} + {w // 2}) // {w}) * {w})"
    ay = f"((({Y} + {h // 2}) // {h}) * {h})"
    bx = f"(({X} // {w}) * {w} + {w // 2})"
    by = f"(({Y} // {h}) * {h} + {h // 2})"
    da = f"(({X}-{ax})*({X}-{ax}) + ({Y}-{ay})*({Y}-{ay}))"
    db = f"(({X}-{bx})*({X}-{bx}) + ({Y}-{by})*({Y}-{by}))"
    hx = f"(CASE WHEN {da} <= {db} THEN {ax} ELSE {bx} END) - 1800000000"
    hy = f"(CASE WHEN {da} <= {db} THEN {ay} ELSE {by} END) - 900000000"
    return hx, hy


def oracle_sql() -> dict[str, str]:
    contrib_states = f"""
      SELECT g.*,
             lag(visible) OVER w AS lv,
             lag(event_type) OVER w AS let,
             lag((version-1)//3) OVER w AS lg
      FROM geo g
      WINDOW w AS (PARTITION BY id ORDER BY version)
    """
    out = {
        "snapshot_count": _HIST + """,
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM hist v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "snapshot_bbox_tag": _HIST + f""",
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM geo v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible AND v.event_type = 'click'
                AND v.lon7 BETWEEN {_BBOX7[0]} AND {_BBOX7[2]}
                AND v.lat7 BETWEEN {_BBOX7[1]} AND {_BBOX7[3]}
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "snapshot_ratio": _HIST + f""",
            d AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM geo v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND v.lon7 BETWEEN {_BBOX7[0]} AND {_BBOX7[2]}
                AND v.lat7 BETWEEN {_BBOX7[1]} AND {_BBOX7[3]}
              GROUP BY 1),
            n AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM geo v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible AND v.event_type = 'click'
                AND v.lon7 BETWEEN {_BBOX7[0]} AND {_BBOX7[2]}
                AND v.lat7 BETWEEN {_BBOX7[1]} AND {_BBOX7[3]}
              GROUP BY 1)
            SELECT grid.ts AS ts,
                   coalesce(n.c, 0) AS matched,
                   coalesce(d.c, 0) AS total,
                   CASE WHEN coalesce(d.c, 0) > 0
                        THEN round(coalesce(n.c, 0)
                                   / CAST(d.c AS DOUBLE), 6)
                   END AS ratio
            FROM grid
            LEFT JOIN d USING (ts)
            LEFT JOIN n USING (ts)
        """,
        "contribution_types": _HIST + f""",
            s AS ({contrib_states})
            SELECT contrib_type, count(*) AS cnt FROM (
              SELECT 'CREATION' AS contrib_type FROM s
               WHERE visible AND coalesce(lv, false) = false
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'DELETION' FROM s
               WHERE NOT visible AND lv
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'TAG_CHANGE' FROM s
               WHERE visible AND lv AND event_type <> let
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'GEOMETRY_CHANGE' FROM s
               WHERE visible AND lv AND (version-1)//3 <> lg
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
            ) GROUP BY 1
        """,
        "contrib_by_region": _HIST + f""",
            s AS ({contrib_states}),
            e AS (
              SELECT id,
                CASE WHEN visible THEN lon7 * 1e-7 END AS alon,
                CASE WHEN visible THEN lat7 * 1e-7 END AS alat,
                CASE WHEN lv THEN
                  (((id*1103515245 + lg*1000003) % 3600000000)
                    - 1800000000) * 1e-7 END AS blon,
                CASE WHEN lv THEN
                  (((id*1234567891 + lg*999983) % 1700000000)
                    - 850000000) * 1e-7 END AS blat
              FROM s
              WHERE (visible OR (NOT visible AND coalesce(lv, false)))
                AND valid_from >= {CONTRIB_INTERVAL[0]}
                AND valid_from <  {CONTRIB_INTERVAL[1]}),
            m AS (
              SELECT 'west' AS region FROM e WHERE
                (blon IS NOT NULL AND blon >= -180 AND blon <= 0
                 AND blat >= -85 AND blat <= 85)
                OR (alon IS NOT NULL AND alon >= -180 AND alon <= 0
                 AND alat >= -85 AND alat <= 85)
              UNION ALL
              SELECT 'east' FROM e WHERE
                (blon IS NOT NULL AND blon >= 0 AND blon <= 180
                 AND blat >= -85 AND blat <= 85)
                OR (alon IS NOT NULL AND alon >= 0 AND alon <= 180
                 AND alat >= -85 AND alat <= 85)
              UNION ALL
              SELECT 'tropics' FROM e WHERE
                (blon IS NOT NULL AND blat >= -23.5 AND blat <= 23.5)
                OR (alon IS NOT NULL AND alat >= -23.5 AND alat <= 23.5))
            SELECT region, count(*) AS cnt FROM m GROUP BY 1
        """,
        "contrib_by_region_poly": _HIST + f""",
            s AS ({contrib_states}),
            e AS (
              SELECT id,
                CASE WHEN visible THEN lon7 * 1e-7 END AS alon,
                CASE WHEN visible THEN lat7 * 1e-7 END AS alat,
                CASE WHEN lv THEN
                  (((id*1103515245 + lg*1000003) % 3600000000)
                    - 1800000000) * 1e-7 END AS blon,
                CASE WHEN lv THEN
                  (((id*1234567891 + lg*999983) % 1700000000)
                    - 850000000) * 1e-7 END AS blat
              FROM s
              WHERE (visible OR (NOT visible AND coalesce(lv, false)))
                AND valid_from >= {CONTRIB_INTERVAL[0]}
                AND valid_from <  {CONTRIB_INTERVAL[1]}),
            m AS (
              SELECT 'quad' AS region FROM e WHERE
                (blon IS NOT NULL
                 AND (80.0000013 - -100.0000017) * (blat - -50.0000031)
                     - (-60.0000029 - -50.0000031) * (blon - -100.0000017) > 0
                 AND (120.0000019 - 80.0000013) * (blat - -60.0000029)
                     - (50.0000023 - -60.0000029) * (blon - 80.0000013) > 0
                 AND (-80.0000011 - 120.0000019) * (blat - 50.0000023)
                     - (60.0000037 - 50.0000023) * (blon - 120.0000019) > 0
                 AND (-100.0000017 - -80.0000011) * (blat - 60.0000037)
                     - (-50.0000031 - 60.0000037) * (blon - -80.0000011) > 0)
                OR (alon IS NOT NULL
                 AND (80.0000013 - -100.0000017) * (alat - -50.0000031)
                     - (-60.0000029 - -50.0000031) * (alon - -100.0000017) > 0
                 AND (120.0000019 - 80.0000013) * (alat - -60.0000029)
                     - (50.0000023 - -60.0000029) * (alon - 80.0000013) > 0
                 AND (-80.0000011 - 120.0000019) * (alat - 50.0000023)
                     - (60.0000037 - 50.0000023) * (alon - 120.0000019) > 0
                 AND (-100.0000017 - -80.0000011) * (alat - 60.0000037)
                     - (-50.0000031 - 60.0000037) * (alon - -80.0000011) > 0)
              UNION ALL
              SELECT 'north' FROM e WHERE
                (blon IS NOT NULL AND blat >= 20 AND blat <= 85)
                OR (alon IS NOT NULL AND alat >= 20 AND alat <= 85))
            SELECT region, count(*) AS cnt FROM m GROUP BY 1
        """,
        "relation_contrib_types": f"""
            -- relation = 1 version @way_sec; mod timestamps beyond it are
            -- member-node version ts (window [way_sec, inf]); every node
            -- move changes the member geometry => GEOMETRY_CHANGE.
            -- (Changeset squash is a no-op here: verified for this
            -- testdata that no first post-creation state's event_id
            -- equals its user_id.)
            WITH ded AS (
              SELECT event_id, user_id, sec FROM (
                SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                       row_number() OVER (
                         PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                         ORDER BY event_id) AS rn
                FROM events) WHERE rn = 1),
            ev AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                       AS urn
              FROM ded),
            nodes AS (SELECT user_id, urn % 3 AS j, sec FROM ev),
            wsec AS (
              SELECT user_id, max(fs) AS way_sec FROM (
                SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
              GROUP BY 1)
            SELECT contrib_type, count(*) AS cnt FROM (
              SELECT 'CREATION' AS contrib_type FROM wsec
               WHERE way_sec >= {SNAPSHOT_TS[0]}
                 AND way_sec <  {SNAPSHOT_TS[-1]}
              UNION ALL
              SELECT 'GEOMETRY_CHANGE'
              FROM nodes n JOIN wsec w ON n.user_id = w.user_id
              WHERE n.sec > w.way_sec
                AND n.sec >= {SNAPSHOT_TS[0]}
                AND n.sec <  {SNAPSHOT_TS[-1]}
            ) GROUP BY 1
        """,
        "contrib_monthly_zerofill": _HIST + f""",
            s AS ({contrib_states}),
            emitted AS (
              SELECT list_max(list_filter({_MONTHS_LIST}, m -> m <= valid_from))
                       AS fts
              FROM s
              WHERE (visible OR (NOT visible AND coalesce(lv, false)))
                AND valid_from >= {_MONTHS[0]} AND valid_from < {_MONTHS[-1]}
            ),
            mgrid AS (SELECT unnest({_MONTHS_LIST}[1:3]) AS ts)
            SELECT mgrid.ts AS ts, count(emitted.fts) AS cnt
            FROM mgrid LEFT JOIN emitted ON emitted.fts = mgrid.ts
            GROUP BY 1
        """,
        "reducer_group_sum_avg": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 0) AS sum_price,
                   round(avg(l_discount), 6) AS avg_disc
            FROM lineitem GROUP BY 1, 2
        """,
        "reducer_count_uniq": """
            SELECT event_type, count(DISTINCT user_id) AS uniq_users,
                   count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "reducer_weighted_avg": """
            SELECT l_returnflag,
                   round(sum(l_discount * l_quantity) / sum(l_quantity), 6)
                     AS wavg_disc
            FROM lineitem GROUP BY 1
        """,
        "agg_by_index_nation": """
            SELECT n_name AS nation, count(*) AS order_cnt,
                   round(sum(o_totalprice), 0) AS sum_total
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "cell_count_z6": """
            SELECT ((lat7 + 900000000) // 56250000) * 64
                   + ((lon7 + 1800000000) // 56250000) AS cell,
                   count(*) AS cnt
            FROM (
              SELECT ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000) - 850000000 AS lat7
              FROM events)
            GROUP BY 1
        """,
        "hotspot_gi": _HOTSPOT_GI_ORACLE,
        "tfidf_keywords": """
            -- replay: whitespace tokens, smoothed IDF, round-6 score,
            -- per-doc top-3 with binary token tie order
            WITH t AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
                   FROM t GROUP BY 1, 2),
            dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS doc_freq
                    FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            sc AS (
              SELECT doc_id, tok, tf, doc_freq,
                     round(tf * ln(CAST(n + 1 AS DOUBLE)
                                   / CAST(doc_freq + 1 AS DOUBLE)), 6)
                       AS score
              FROM tf JOIN dfq USING (tok) CROSS JOIN n),
            r AS (
              SELECT doc_id, tok, tf, doc_freq, score,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, tok) AS rnk
              FROM sc)
            SELECT doc_id, CAST(rnk AS BIGINT) AS rank, tok AS token,
                   tf, doc_freq, score
            FROM r WHERE rnk <= 3
        """,
        "dbscan_fixes": """
            -- full DBSCAN replay: brute ε-pairs with the IDENTICAL
            -- equirect formula behind loose-but-sound |Δlat|/|Δlon|
            -- prefilters (dist >= R|dlat| and >= R|dlon|cos(mid),
            -- |lat| <= 70° so 60 km bounds Δlat7 by 5.4e6 and Δlon7 by
            -- 1.58e7 — no qualifying pair can be dropped); cores by
            -- exact degree; cluster labels by recursive min-label
            -- closure over the core-core graph (pruned to lab < node —
            -- the component minimum still reaches every node); borders
            -- take the min core-neighbor label. MATERIALIZED states so
            -- the recursion does not re-run the pair join per layer.
            WITH RECURSIVE pts AS MATERIALIZED (
              SELECT event_id AS pid,
                     ((user_id // 2) % 24) * 150000000 - 1800000000
                       + 75000000
                       + (event_id*1103515245) % 60000001 - 30000000
                       AS lon7,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001 - 30000000
                       AS lat7
              FROM events),
            f AS MATERIALIZED (
              SELECT pid, lon7, lat7,
                     lon7 * 1e-7 AS lon, lat7 * 1e-7 AS lat
              FROM pts
              WHERE lat7 >= -700000000 AND lat7 <= 700000000),
            prs AS MATERIALIZED (
              SELECT ua, ub FROM (
                SELECT a.pid AS ua, b.pid AS ub,
                       radians(b.lat - a.lat) AS dy,
                       radians(b.lon - a.lon)
                         * cos(radians((a.lat + b.lat) / 2.0)) AS dx
                FROM f a JOIN f b
                  ON a.pid <> b.pid
                 AND b.lat7 - a.lat7 BETWEEN -5500000 AND 5500000
                 AND b.lon7 - a.lon7 BETWEEN -16000000 AND 16000000)
              WHERE 6371000.0 * sqrt(dx*dx + dy*dy) <= 60000.0),
            deg AS MATERIALIZED (
              SELECT ua AS pid, count(*) AS nn FROM prs GROUP BY 1),
            core AS MATERIALIZED (
              SELECT pid FROM deg WHERE nn >= 3),
            ce AS MATERIALIZED (
              SELECT ua, ub FROM prs
              WHERE ua IN (SELECT pid FROM core)
                AND ub IN (SELECT pid FROM core)),
            reach(node, lab) AS (
              SELECT pid, pid FROM core
              UNION
              SELECT ce.ub, r.lab FROM reach r JOIN ce ON ce.ua = r.node
              WHERE r.lab < ce.ub),
            clab AS MATERIALIZED (
              SELECT node AS pid, min(lab) AS cluster
              FROM reach GROUP BY 1),
            bord AS MATERIALIZED (
              SELECT p.ua AS pid, min(c.cluster) AS cluster
              FROM prs p JOIN clab c ON p.ub = c.pid
              WHERE p.ua NOT IN (SELECT pid FROM core)
              GROUP BY 1),
            allpts AS (
              SELECT pid, cluster, 1 AS is_core FROM clab
              UNION ALL SELECT pid, cluster, 0 AS is_core FROM bord)
            SELECT cluster,
                   CAST(sum(is_core) AS BIGINT) AS n_core,
                   CAST(sum(1 - is_core) AS BIGINT) AS n_border,
                   CAST(sum(pid) AS BIGINT) AS pid_sum
            FROM allpts GROUP BY cluster
        """,
        "contour_lines": _contour_oracle(),
        "sax_symbols": """
            -- SAX replay: exact integer moments (Σc, Σc²), index-split
            -- PAA buckets (floor of the SAME double division), identical
            -- z formula and breakpoint CASE; zero-variance entities
            -- excluded by the exact integer test n·Σc² == (Σc)²
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            k AS (
              SELECT uid, c,
                     row_number() OVER (
                       PARTITION BY uid ORDER BY sec, seq) - 1 AS k
              FROM ev),
            st AS (
              SELECT uid, count(*) AS n,
                     CAST(sum(c) AS BIGINT) AS s,
                     CAST(sum(c * c) AS BIGINT) AS s2
              FROM k GROUP BY 1),
            b AS (
              SELECT k.uid, floor(k.k * 8 / st.n) AS b, st.n, st.s, st.s2,
                     CAST(sum(k.c) AS BIGINT) AS bs, count(*) AS bn
              FROM k JOIN st ON st.uid = k.uid
              GROUP BY 1, 2, 3, 4, 5),
            z AS (
              SELECT uid, b, n,
                     ((CAST(bs AS DOUBLE) / (CAST(bn AS DOUBLE) * 100.0))
                      - CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0))
                     / sqrt(CAST(s2 AS DOUBLE)
                            / (CAST(n AS DOUBLE) * 10000.0)
                            - (CAST(s AS DOUBLE)
                               / (CAST(n AS DOUBLE) * 100.0))
                              * (CAST(s AS DOUBLE)
                                 / (CAST(n AS DOUBLE) * 100.0))) AS z
              FROM b WHERE s2 * n <> s * s)
            SELECT uid AS entity, max(n) AS n_points,
                   string_agg(CASE WHEN z < -0.6745 THEN 'a'
                                   WHEN z < 0.0 THEN 'b'
                                   WHEN z < 0.6745 THEN 'c'
                                   ELSE 'd' END, '' ORDER BY b) AS sax
            FROM z GROUP BY uid
        """,
        "lttb_values": """
            -- LTTB replay: same cents quantization, same index buckets
            -- ((k-1)*10 // (n-2)), and a 10-step recursive walk whose
            -- per-step argmax is arg_max over a packed HUGEINT key
            -- (L-scaled integer triangle area, earliest-index tiebreak)
            -- — bit-identical to the kernel's exact-int tuple compare
            WITH RECURSIVE
            ev AS MATERIALIZED (
              SELECT user_id AS ent,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq, value,
                     CASE WHEN value < 0 THEN
                       -CAST(floor(abs(value)*100.0 + 0.5) AS BIGINT)
                     ELSE
                       CAST(floor(abs(value)*100.0 + 0.5) AS BIGINT)
                     END AS c
              FROM events),
            p AS MATERIALIZED (
              SELECT ent, sec, seq, value, c,
                     row_number() OVER (
                       PARTITION BY ent ORDER BY sec, seq) - 1 AS idx,
                     count(*) OVER (PARTITION BY ent) AS n
              FROM ev),
            pb AS MATERIALIZED (
              SELECT ent, sec, seq, c, idx,
                     (idx - 1) * 10 // (n - 2) AS b
              FROM p WHERE n > 12 AND idx >= 1 AND idx <= n - 2),
            cent AS MATERIALIZED (
              -- step b's anchor = bucket b+1's size-scaled centroid;
              -- the final step anchors on the last point (L = 1)
              SELECT ent, b - 1 AS b, count(*) AS L,
                     CAST(sum(sec) AS BIGINT) AS sx,
                     CAST(sum(c) AS BIGINT) AS sy
              FROM pb WHERE b >= 1 GROUP BY ent, b
              UNION ALL
              SELECT ent, 9 AS b, 1 AS L, sec AS sx, c AS sy
              FROM p WHERE n > 12 AND idx = n - 1),
            walk(ent, b, idx, ax, ay) AS (
              SELECT ent, 0, idx, sec, c FROM p WHERE n > 12 AND idx = 0
              UNION ALL
              SELECT q.ent, q.b + 1, q.pick, q.px, q.py FROM (
                SELECT ent, b, arg_max(idx, key) AS pick,
                       arg_max(sec, key) AS px, arg_max(c, key) AS py
                FROM (
                  SELECT w.ent, w.b, nb.idx, nb.sec, nb.c,
                         abs(CAST(ce.L * w.ax - ce.sx AS HUGEINT)
                               * (nb.c - w.ay)
                             - CAST(w.ax - nb.sec AS HUGEINT)
                               * (ce.sy - ce.L * w.ay))
                           * 4294967296
                         + (4294967295 - nb.idx) AS key
                  FROM walk w
                  JOIN pb nb ON nb.ent = w.ent AND nb.b = w.b
                  JOIN cent ce ON ce.ent = w.ent AND ce.b = w.b)
                GROUP BY ent, b) q),
            kept AS (
              SELECT ent, idx FROM p WHERE n <= 12
              UNION ALL
              SELECT ent, idx FROM walk
              UNION ALL
              SELECT ent, n - 1 AS idx FROM p WHERE n > 12 AND idx = 0)
            SELECT p.ent AS entity, p.sec, p.seq, p.value
            FROM kept k JOIN p ON p.ent = k.ent AND p.idx = k.idx
        """,
        "attribution_last_touch": """
            WITH ev AS (
              SELECT user_id, event_type, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events),
            lt AS (
              SELECT user_id, event_type, sec,
                     last_value(CASE WHEN event_type NOT IN
                                       ('purchase', 'error')
                                     THEN sec END IGNORE NULLS) OVER w
                       AS tsec,
                     last_value(CASE WHEN event_type NOT IN
                                       ('purchase', 'error')
                                     THEN event_type END IGNORE NULLS)
                       OVER w AS ttype
              FROM ev
              WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING))
            SELECT CASE WHEN ttype IS NOT NULL AND sec - tsec <= 604800
                        THEN ttype ELSE 'direct' END AS channel,
                   count(*) AS conversions
            FROM lt WHERE event_type = 'purchase'
            GROUP BY 1
        """,
        "event_transitions": """
            WITH ev AS (
              SELECT user_id, event_type, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events),
            d AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY sec, event_id)
                       AS prev_type
              FROM ev),
            c AS (
              SELECT prev_type, event_type, count(*) AS n
              FROM d WHERE prev_type IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, event_type, n,
                   round(CAST(n AS DOUBLE)
                         / CAST(sum(n) OVER (PARTITION BY prev_type)
                                AS DOUBLE), 6) AS p
            FROM c
        """,
        "gapfill_daily": """
            -- LOCF gap-fill replay: bucket representative by exact
            -- packed key (arg_max == max_by), per-entity bucket grid
            -- via generate_series, running last-ignore-nulls fill
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq, value
              FROM events),
            b AS (
              SELECT uid AS entity, sec // 21600 AS bucket,
                     arg_max(value, sec * 1000000 + seq) AS v
              FROM ev GROUP BY 1, 2),
            r AS (
              SELECT entity, min(bucket) AS mn, max(bucket) AS mx
              FROM b GROUP BY 1),
            g AS (
              SELECT entity, unnest(generate_series(mn, mx)) AS bucket
              FROM r),
            j AS (
              SELECT g.entity, g.bucket, b.v
              FROM g LEFT JOIN b
                ON b.entity = g.entity AND b.bucket = g.bucket)
            SELECT entity, bucket,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY entity ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS value,
                   v IS NULL AS is_filled
            FROM j
        """,
        "interp_daily": """
            -- linear-interpolation gap-fill replay: exact cents+sec
            -- representatives by packed key, bracketing ignore-nulls
            -- windows over one ascending sort, exact BIGINT numerator
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            b AS (
              SELECT uid AS entity, sec // 21600 AS bucket,
                     arg_max(c, sec * 1000000 + seq) AS v,
                     arg_max(sec, sec * 1000000 + seq) AS s
              FROM ev GROUP BY 1, 2),
            r AS (
              SELECT entity, min(bucket) AS mn, max(bucket) AS mx
              FROM b GROUP BY 1),
            g AS (
              SELECT entity, unnest(generate_series(mn, mx)) AS bucket
              FROM r),
            j AS (
              SELECT g.entity, g.bucket, b.v, b.s
              FROM g LEFT JOIN b
                ON b.entity = g.entity AND b.bucket = g.bucket),
            w AS (
              SELECT entity, bucket, v, bucket * 21600 AS t,
                     last_value(v IGNORE NULLS) OVER wp AS v0,
                     last_value(s IGNORE NULLS) OVER wp AS t0,
                     first_value(v IGNORE NULLS) OVER wn AS v1,
                     first_value(s IGNORE NULLS) OVER wn AS t1
              FROM j
              WINDOW wp AS (PARTITION BY entity ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING),
                     wn AS (PARTITION BY entity ORDER BY bucket
                            ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING))
            SELECT entity, bucket,
                   CASE WHEN v IS NOT NULL
                     THEN round(CAST(v AS DOUBLE) / 100.0, 6)
                     ELSE round(CAST(v0*(t1 - t) + v1*(t - t0) AS DOUBLE)
                                / (CAST(t1 - t0 AS DOUBLE) * 100.0), 6)
                   END AS value,
                   v IS NULL AS is_filled
            FROM w
        """,
        "spearman_quality": """
            -- Spearman replay: doubled average ranks (2·rank + ties−1),
            -- HUGEINT moments, identical closed form
            WITH d AS (
              SELECT source AS g, n_chars AS x,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS y
              FROM documents),
            r AS (
              SELECT g,
                     2 * rank() OVER (PARTITION BY g ORDER BY x)
                       + count(*) OVER (PARTITION BY g, x) - 1 AS dx,
                     2 * rank() OVER (PARTITION BY g ORDER BY y)
                       + count(*) OVER (PARTITION BY g, y) - 1 AS dy
              FROM d),
            m AS (
              SELECT g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dx) AS BIGINT) AS sx,
                     CAST(sum(dy) AS BIGINT) AS sy,
                     sum(CAST(dx AS HUGEINT) * dx) AS sxx,
                     sum(CAST(dy AS HUGEINT) * dy) AS syy,
                     sum(CAST(dx AS HUGEINT) * dy) AS sxy
              FROM r GROUP BY 1),
            t AS (
              SELECT g, n,
                     CAST(n*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
                       AS num,
                     CAST(n*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)
                       AS vx,
                     CAST(n*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)
                       AS vy
              FROM m)
            SELECT g AS source, n,
                   CASE WHEN vx > 0 AND vy > 0 THEN
                     round(num / (sqrt(vx) * sqrt(vy)), 6)
                   END AS rho
            FROM t
        """,
        "weighted_median": """
            -- weighted percentile_disc replay: collapse ties, running
            -- cumulative weight over distinct values, integer pick
            WITH li AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
                       AS v,
                     CAST(round(l_quantity, 0) AS BIGINT) AS w
              FROM lineitem),
            pv AS (
              SELECT g, v, CAST(sum(w) AS BIGINT) AS w
              FROM li GROUP BY 1, 2),
            cw AS (
              SELECT g, v, w,
                     CAST(sum(w) OVER (PARTITION BY g ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
              FROM pv),
            tw AS (SELECT g, CAST(sum(w) AS BIGINT) AS tw
                   FROM pv GROUP BY 1)
            SELECT cw.g AS l_returnflag,
                   CAST(min(cw.v) AS BIGINT) AS wq_value,
                   CAST(max(tw.tw) AS BIGINT) AS total_weight
            FROM cw JOIN tw ON tw.g = cw.g
            WHERE 2 * cw.cw >= 1 * tw.tw
            GROUP BY 1
        """,
        "changepoints": """
            -- two unrolled binary-segmentation levels: identical
            -- integer CUSUM argmax with smallest-k ties
            WITH ev AS (
              SELECT user_id AS e,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            b AS (
              SELECT e, c,
                     row_number() OVER w AS i,
                     CAST(sum(c) OVER (PARTITION BY e ORDER BY sec,
                       seq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
                     CAST(count(*) OVER (PARTITION BY e) AS BIGINT)
                       AS n,
                     CAST(sum(c) OVER (PARTITION BY e) AS BIGINT)
                       AS t
              FROM ev
              WINDOW w AS (PARTITION BY e ORDER BY sec, seq)),
            l1c AS (
              SELECT e, i, p, n, t,
                     abs(CAST(n AS HUGEINT) * p
                         - CAST(i AS HUGEINT) * t) AS d
              FROM b WHERE i < n),
            l1 AS MATERIALIZED (
              SELECT e, i AS k1, p AS pk1, d AS d1 FROM (
                SELECT *, row_number() OVER (
                         PARTITION BY e ORDER BY d DESC, i) AS rn
                FROM l1c) WHERE rn = 1),
            l2c AS (
              SELECT b.e,
                     CASE WHEN b.i < l1.k1 THEN 0 ELSE 1 END AS seg,
                     b.i,
                     CASE WHEN b.i < l1.k1 THEN
                       abs(CAST(l1.k1 AS HUGEINT) * b.p
                           - CAST(b.i AS HUGEINT) * l1.pk1)
                     ELSE
                       abs(CAST(b.n - l1.k1 AS HUGEINT)
                             * (b.p - l1.pk1)
                           - CAST(b.i - l1.k1 AS HUGEINT)
                             * (b.t - l1.pk1)) END AS d
              FROM b JOIN l1 ON l1.e = b.e
              WHERE (b.i < l1.k1 AND l1.k1 >= 2)
                 OR (b.i > l1.k1 AND b.i < b.n
                     AND b.n - l1.k1 >= 2)),
            l2 AS (
              SELECT e, seg, i, d FROM (
                SELECT *, row_number() OVER (
                         PARTITION BY e, seg ORDER BY d DESC, i) AS rn
                FROM l2c) WHERE rn = 1)
            SELECT e AS entity, 1 AS level, 0 AS seg,
                   k1 AS split_i, CAST(d1 AS BIGINT) AS d_stat
            FROM l1
            UNION ALL
            SELECT e, 2, seg, i, CAST(d AS BIGINT) FROM l2
        """,
        "dtw_pairs": """
            -- FULL-ENUMERATION DTW replay (no blocking): per pair,
            -- the exact-integer DP as an anti-diagonal wavefront
            -- recursive CTE — fresh rows step right/down, previous-
            -- diagonal rows step diagonally, min per target cell
            WITH RECURSIVE p AS (
              SELECT user_id AS e, event_id AS o,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + ((event_id*1103515245) % 60000001)
                       - 30000000 AS lon7,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + ((event_id*1234567891) % 60000001)
                       - 30000000 AS lat7
              FROM events WHERE event_id % 4 = 0),
            seqs AS MATERIALIZED (
              SELECT e, row_number() OVER (
                       PARTITION BY e ORDER BY o) - 1 AS i,
                     lon7, lat7
              FROM p),
            ln AS (SELECT e, CAST(count(*) AS BIGINT) AS l
                   FROM seqs GROUP BY 1),
            prs AS (
              SELECT a.e AS ea, b.e AS eb, a.l AS la, b.l AS lb
              FROM ln a JOIN ln b ON a.e < b.e),
            dmat AS MATERIALIZED (
              SELECT pr.ea, pr.eb, sa.i, sb.i AS j,
                     CAST(round(6371000.0 * sqrt(
                       (radians(blon*1e-7 - alon*1e-7)
                        * cos(radians((alat*1e-7 + blat*1e-7) / 2.0)))
                       * (radians(blon*1e-7 - alon*1e-7)
                          * cos(radians((alat*1e-7 + blat*1e-7)
                                        / 2.0)))
                       + radians(blat*1e-7 - alat*1e-7)
                         * radians(blat*1e-7 - alat*1e-7)) * 1000.0,
                       0) AS BIGINT) AS mm
              FROM prs pr
              JOIN (SELECT e, i, lon7 AS alon, lat7 AS alat
                    FROM seqs) sa ON sa.e = pr.ea
              JOIN (SELECT e, i, lon7 AS blon, lat7 AS blat
                    FROM seqs) sb ON sb.e = pr.eb),
            dp AS (
                SELECT ea, eb, i, j, mm AS c, TRUE AS fresh
                FROM dmat WHERE i = 0 AND j = 0
              UNION ALL
                (WITH s AS (SELECT * FROM dp)
                 SELECT * FROM (
                   SELECT n.ea, n.eb, n.i, n.j,
                          n.pmin + dm.mm AS c, TRUE AS fresh
                   FROM (
                     SELECT ea, eb, ni AS i, nj AS j, min(c) AS pmin
                     FROM (
                       SELECT ea, eb, i + 1 AS ni, j AS nj, c
                       FROM s WHERE fresh
                       UNION ALL
                       SELECT ea, eb, i, j + 1, c FROM s WHERE fresh
                       UNION ALL
                       SELECT ea, eb, i + 1, j + 1, c
                       FROM s WHERE NOT fresh
                     ) GROUP BY 1, 2, 3, 4) n
                   JOIN dmat dm ON dm.ea = n.ea AND dm.eb = n.eb
                              AND dm.i = n.i AND dm.j = n.j
                   UNION ALL
                   SELECT ea, eb, i, j, c, FALSE FROM s WHERE fresh))
            )
            SELECT dp.ea, dp.eb,
                   CAST(min(dp.c) AS DOUBLE) / 1000.0 AS dtw_m
            FROM dp
            JOIN prs ON prs.ea = dp.ea AND prs.eb = dp.eb
            WHERE dp.i = prs.la - 1 AND dp.j = prs.lb - 1
            GROUP BY 1, 2
            HAVING min(dp.c) <= 5000000000
        """,
        "ccf_lags": """
            -- CCF replay: dense grid, multiply-through integers,
            -- identical lead/lag alignment and one division per lag
            WITH pd AS (
              SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                     CAST(sum(CASE WHEN event_type = 'click'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS y
              FROM events
              WHERE event_type IN ('click', 'purchase')
              GROUP BY 1),
            grid AS (
              SELECT unnest(generate_series(s.d0, s.d1)) AS d
              FROM (SELECT min(d) AS d0, max(d) AS d1 FROM pd) s),
            dense AS (
              SELECT grid.d, coalesce(pd.x, 0) AS x,
                     coalesce(pd.y, 0) AS y
              FROM grid LEFT JOIN pd ON pd.d = grid.d),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS BIGINT) AS sx,
                         CAST(sum(y) AS BIGINT) AS sy FROM dense),
            u AS (
              SELECT d, t.n,
                     CAST(t.n AS HUGEINT) * x - t.sx AS u,
                     CAST(t.n AS HUGEINT) * y - t.sy AS v
              FROM dense, t),
            l AS (
              SELECT n, u, v,
                     lag(v, 3) OVER w AS v0, lag(v, 2) OVER w AS v1,
                     lag(v, 1) OVER w AS v2, v AS v3,
                     lead(v, 1) OVER w AS v4, lead(v, 2) OVER w AS v5,
                     lead(v, 3) OVER w AS v6
              FROM u WINDOW w AS (ORDER BY d)),
            m AS (
              SELECT max(n) AS n, sum(u*u) AS du, sum(v*v) AS dv,
                     sum(u*v0) AS c0, sum(u*v1) AS c1,
                     sum(u*v2) AS c2, sum(u*v3) AS c3,
                     sum(u*v4) AS c4, sum(u*v5) AS c5,
                     sum(u*v6) AS c6
              FROM l)
            SELECT lag, n AS n_days,
                   CASE WHEN du > 0 AND dv > 0 THEN
                     round(CAST(coalesce(c, 0) AS DOUBLE)
                           / (sqrt(CAST(du AS DOUBLE))
                              * sqrt(CAST(dv AS DOUBLE))), 6)
                   END AS ccf
            FROM (
              SELECT n, du, dv, -3 AS lag, c0 AS c FROM m
              UNION ALL SELECT n, du, dv, -2, c1 FROM m
              UNION ALL SELECT n, du, dv, -1, c2 FROM m
              UNION ALL SELECT n, du, dv, 0, c3 FROM m
              UNION ALL SELECT n, du, dv, 1, c4 FROM m
              UNION ALL SELECT n, du, dv, 2, c5 FROM m
              UNION ALL SELECT n, du, dv, 3, c6 FROM m)
        """,
        "hex_pyramid": f"""
            -- three chained integer lattice assignments (_hex_sql,
            -- h = √3·w per level)
            WITH pts AS (
              SELECT (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events),
            l0 AS (
              SELECT hx, hy, CAST(count(*) AS BIGINT) AS n_pts
              FROM (
                SELECT {_hex_sql("lon7", "lat7", 100_000_000)[0]} AS hx,
                       {_hex_sql("lon7", "lat7", 100_000_000)[1]} AS hy
                FROM pts)
              GROUP BY 1, 2),
            l1 AS (
              SELECT hx, hy, CAST(sum(n_pts) AS BIGINT) AS n_pts
              FROM (
                SELECT {_hex_sql("hx", "hy", 200_000_000)[0]} AS hx,
                       {_hex_sql("hx", "hy", 200_000_000)[1]} AS hy,
                       n_pts FROM l0)
              GROUP BY 1, 2),
            l2 AS (
              SELECT hx, hy, CAST(sum(n_pts) AS BIGINT) AS n_pts
              FROM (
                SELECT {_hex_sql("hx", "hy", 400_000_000)[0]} AS hx,
                       {_hex_sql("hx", "hy", 400_000_000)[1]} AS hy,
                       n_pts FROM l1)
              GROUP BY 1, 2)
            SELECT 0 AS level, hx, hy, n_pts FROM l0
            UNION ALL SELECT 1, hx, hy, n_pts FROM l1
            UNION ALL SELECT 2, hx, hy, n_pts FROM l2
        """,
        "gini_spend": """
            -- exact Lorenz-sum replay
            WITH li AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
                       AS v
              FROM lineitem),
            r AS (
              SELECT g, v, row_number() OVER (
                       PARTITION BY g ORDER BY v) AS i
              FROM li),
            a AS (
              SELECT g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(v) AS BIGINT) AS s,
                     sum(CAST(2 * i AS HUGEINT) * v) AS num2
              FROM r GROUP BY 1)
            SELECT g AS l_returnflag, n, s AS total,
                   CASE WHEN s > 0 THEN
                     round(CAST(num2 - CAST(n + 1 AS HUGEINT) * s
                                AS DOUBLE)
                           / CAST(CAST(n AS HUGEINT) * s AS DOUBLE),
                           6) END AS gini
            FROM a
        """,
        "mwu_drift": """
            -- doubled-average-rank U replay with tie-corrected z
            WITH d AS (
              SELECT event_type = 'click' AS isa,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS v
              FROM events
              WHERE event_type IN ('click', 'purchase')),
            r AS (
              SELECT isa,
                     2 * rank() OVER (ORDER BY v)
                       + count(*) OVER (PARTITION BY v) - 1 AS r2
              FROM d),
            a AS (
              SELECT CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END)
                          AS BIGINT) AS na,
                     CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END)
                          AS BIGINT) AS nb,
                     CAST(sum(CASE WHEN isa THEN r2 END) AS BIGINT)
                       AS ra2
              FROM r),
            t AS (
              SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c)
                          AS HUGEINT) AS t3t
              FROM (SELECT count(*) AS c FROM d GROUP BY v)),
            j AS (
              SELECT a.*, t.t3t, a.na + a.nb AS n,
                     a.ra2 - a.na * (a.na + 1) AS u2
              FROM a, t),
            v AS (
              SELECT *,
                     CAST(na * nb AS DOUBLE) / 12.0
                       * (CAST(n + 1 AS DOUBLE)
                          - CAST(t3t AS DOUBLE)
                            / CAST(CAST(n AS HUGEINT) * (n - 1)
                                   AS DOUBLE)) AS var
              FROM j)
            SELECT na AS n_a, nb AS n_b,
                   CAST(u2 AS DOUBLE) / 2.0 AS u_a,
                   CASE WHEN var > 0 THEN
                     round((CAST(u2 AS DOUBLE) / 2.0
                            - CAST(na * nb AS DOUBLE) / 2.0)
                           / sqrt(var), 6) END AS z
            FROM v
        """,
        "ks_drift": """
            -- exact-rational KS replay: integer sup numerator,
            -- (num DESC, value ASC) argmax, one division
            WITH d AS (
              SELECT event_type = 'click' AS isa,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS v
              FROM events
              WHERE event_type IN ('click', 'purchase')),
            pv AS (
              SELECT v,
                     CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END)
                          AS BIGINT) AS ca,
                     CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END)
                          AS BIGINT) AS cb
              FROM d GROUP BY 1),
            c AS (
              SELECT v,
                     CAST(sum(ca) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                     CAST(sum(cb) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
              FROM pv),
            t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                         CAST(sum(cb) AS BIGINT) AS nb FROM pv),
            n AS (
              SELECT c.v, abs(t.nb * c.cuma - t.na * c.cumb) AS num,
                     t.na, t.nb
              FROM c, t),
            b AS (
              SELECT na AS n_a, nb AS n_b, num, v,
                     row_number() OVER (ORDER BY num DESC, v) AS rn
              FROM n)
            SELECT n_a, n_b,
                   round(CAST(num AS DOUBLE)
                         / CAST(n_a * n_b AS DOUBLE), 6) AS ks_d,
                   v AS at_value
            FROM b WHERE rn = 1
        """,
        "skyline_docs": """
            -- INDEPENDENT brute-force dominance (NOT EXISTS O(n²))
            WITH d AS (
              SELECT CAST(len(list_distinct(string_split(text, ' ')))
                          AS BIGINT) AS a,
                     n_chars AS b
              FROM documents),
            p AS (
              SELECT a, b, CAST(count(*) AS BIGINT) AS n_ties
              FROM d GROUP BY 1, 2)
            SELECT a AS n_tokens, b AS n_chars, n_ties
            FROM p x
            WHERE NOT EXISTS (
              SELECT 1 FROM p y
              WHERE y.a >= x.a AND y.b <= x.b
                AND (y.a > x.a OR y.b < x.b))
        """,
        "bpe_merges": _bpe_oracle(4),
        "dispersion_events": """
            -- Fano replay: explode-free closed form, exact int64
            WITH pd AS (
              SELECT event_type AS e,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            span AS (
              SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS nd
              FROM pd),
            a AS (
              SELECT e, CAST(sum(c) AS BIGINT) AS s,
                     CAST(sum(c*c) AS BIGINT) AS s2
              FROM pd GROUP BY 1)
            SELECT e AS event_type, nd AS n_days,
                   round(CAST(s AS DOUBLE) / CAST(nd AS DOUBLE), 6)
                     AS mean_per_day,
                   round(CAST(nd * s2 - s * s AS DOUBLE)
                         / CAST(nd * s AS DOUBLE), 6) AS dispersion
            FROM a, span
        """,
        "calibration": """
            -- decile-bin reliability replay: identical integer bins
            WITH d AS (
              SELECT (doc_id * 1103515245) % 10001 AS sc,
                     CASE WHEN ((doc_id * 7919) % 10000) * 10
                               < ((doc_id * 1103515245) % 10001) * 8
                                 + 10000
                          THEN 1 ELSE 0 END AS y
              FROM documents),
            b AS (
              SELECT CASE WHEN sc // 1000 > 9 THEN 9
                          ELSE sc // 1000 END AS bin, sc, y
              FROM d)
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(sc) AS DOUBLE)
                         / (CAST(count(*) AS DOUBLE) * 10000.0), 6)
                     AS mean_score,
                   round(CAST(sum(y) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS pos_rate,
                   round(abs(CAST(sum(sc) AS DOUBLE)
                             / (CAST(count(*) AS DOUBLE) * 10000.0)
                             - CAST(sum(y) AS DOUBLE)
                               / CAST(count(*) AS DOUBLE)), 6) AS gap
            FROM b GROUP BY 1
        """,
        "rank_normalize": """
            -- doubled-average-rank replay, identical division
            WITH d AS (
              SELECT source AS g, n_chars AS v FROM documents),
            r AS (
              SELECT g, v,
                     2 * rank() OVER (PARTITION BY g ORDER BY v)
                       + count(*) OVER (PARTITION BY g, v) - 1 AS r2,
                     count(*) OVER (PARTITION BY g) AS n
              FROM d)
            SELECT g AS source, v AS n_chars,
                   round(CAST(r2 AS DOUBLE)
                         / (2.0 * CAST(n + 1 AS DOUBLE)), 6) AS pct
            FROM r
        """,
        "rolling_dau": """
            -- trailing-window fan-out + filtered distinct counts
            WITH ud AS (
              SELECT DISTINCT user_id AS u,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
              FROM events),
            span AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
            contrib AS (
              SELECT u, d AS src,
                     unnest(generate_series(d, d + 27)) AS day
              FROM ud),
            agg AS (
              SELECT day,
                     CAST(count(DISTINCT u)
                          FILTER (day - src < 1) AS BIGINT) AS dau,
                     CAST(count(DISTINCT u)
                          FILTER (day - src < 7) AS BIGINT) AS wau,
                     CAST(count(DISTINCT u)
                          FILTER (day - src < 28) AS BIGINT) AS mau
              FROM contrib GROUP BY 1)
            SELECT day, dau, wau, mau,
                   CASE WHEN wau > 0 THEN
                     round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE),
                           6) END AS stickiness
            FROM agg, span WHERE day BETWEEN d0 AND d1
        """,
        "diversity_profile": """
            -- Gini-Simpson replay: exact integer moments, identical
            -- division association
            WITH pc AS (
              SELECT user_id AS e, event_type AS c,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            a AS (
              SELECT e, CAST(sum(n) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(n*n) AS BIGINT) AS s2
              FROM pc GROUP BY 1)
            SELECT e AS user_id, tot AS n, k AS n_categories,
                   round(1.0 - CAST(s2 AS DOUBLE)
                         / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)),
                         6) AS gini,
                   round(CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)
                         / CAST(s2 AS DOUBLE), 6) AS inv_simpson
            FROM a
        """,
        "track_waypoints": """
            -- waypoint replay: identical mm segment quantization,
            -- integer bracketing, one float interpolation
            WITH pts AS (
              SELECT user_id AS entity, event_id AS o,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + (event_id*1103515245) % 60000001
                       - 30000000 AS lon7,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001
                       - 30000000 AS lat7
              FROM events),
            s AS (
              SELECT entity, o, lon7, lat7,
                     lag(lon7) OVER w AS plon,
                     lag(lat7) OVER w AS plat
              FROM pts
              WINDOW w AS (PARTITION BY entity ORDER BY o)),
            m AS (
              SELECT *,
                     CAST(round(6371000.0 * sqrt(
                       radians(lat7*1e-7 - plat*1e-7)
                         * radians(lat7*1e-7 - plat*1e-7)
                       + (radians(lon7*1e-7 - plon*1e-7)
                          * cos(radians((plat*1e-7 + lat7*1e-7)
                                        / 2.0)))
                         * (radians(lon7*1e-7 - plon*1e-7)
                            * cos(radians((plat*1e-7 + lat7*1e-7)
                                          / 2.0)))
                     ) * 1000.0, 0) AS BIGINT) AS seg
              FROM s WHERE plon IS NOT NULL),
            c AS (
              SELECT *,
                     CAST(sum(seg) OVER (PARTITION BY entity ORDER BY o
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                     CAST(sum(seg) OVER (PARTITION BY entity)
                       AS BIGINT) AS tot
              FROM m),
            e AS (
              SELECT c.*, k.k, (tot * k.k) // 4 AS tk
              FROM c, (VALUES (1), (2), (3)) k(k)),
            hit AS (
              SELECT * FROM e
              WHERE cum - seg < tk AND tk <= cum)
            SELECT entity, k, tk AS target_mm,
                   CAST(round(plon
                     + (CAST(tk - (cum - seg) AS DOUBLE)
                        / CAST(seg AS DOUBLE)) * (lon7 - plon), 0)
                     AS BIGINT) AS lon7,
                   CAST(round(plat
                     + (CAST(tk - (cum - seg) AS DOUBLE)
                        / CAST(seg AS DOUBLE)) * (lat7 - plat), 0)
                     AS BIGINT) AS lat7
            FROM hit
        """,
        "od_anomalies": """
            -- independence-model lift replay over the same hop set
            WITH pts AS (
              SELECT user_id, event_id,
                     (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events),
            cp AS (
              SELECT user_id, event_id,
                     ((lat7 + 900000000) // 225000000) * 16 + ((lon7 + 1800000000) // 225000000) AS cell
              FROM pts),
            hops AS (
              SELECT lag(cell) OVER (PARTITION BY user_id
                       ORDER BY event_id) AS from_cell,
                     cell AS to_cell
              FROM cp),
            od AS (
              SELECT from_cell, to_cell,
                     CAST(count(*) AS BIGINT) AS obs
              FROM hops WHERE from_cell IS NOT NULL
              GROUP BY 1, 2),
            o AS (SELECT from_cell, CAST(sum(obs) AS BIGINT) AS o_i
                  FROM od GROUP BY 1),
            d AS (SELECT to_cell, CAST(sum(obs) AS BIGINT) AS d_j
                  FROM od GROUP BY 1),
            t AS (SELECT CAST(sum(obs) AS BIGINT) AS t_all FROM od)
            SELECT od.from_cell, od.to_cell, od.obs, o.o_i, d.d_j,
                   round(CAST(od.obs * t.t_all AS DOUBLE)
                         / CAST(o.o_i * d.d_j AS DOUBLE), 6) AS lift
            FROM od JOIN o USING (from_cell)
                    JOIN d USING (to_cell), t
            WHERE od.obs >= 3
        """,
        "tile_changes": _HIST + """,
            gcell AS (
              SELECT *, ((lat7 + 900000000) // 56250000) * 64 + ((lon7 + 1800000000) // 56250000) AS cell
              FROM geo WHERE visible),
            a1 AS (
              SELECT cell, CAST(count(*) AS BIGINT) AS n1
              FROM gcell
              WHERE valid_from <= 1704672000
                AND (valid_to IS NULL OR valid_to > 1704672000)
              GROUP BY 1),
            a2 AS (
              SELECT cell, CAST(count(*) AS BIGINT) AS n2
              FROM gcell
              WHERE valid_from <= 1706486400
                AND (valid_to IS NULL OR valid_to > 1706486400)
              GROUP BY 1)
            SELECT coalesce(a1.cell, a2.cell) AS cell,
                   coalesce(a1.n1, 0) AS n_t1,
                   coalesce(a2.n2, 0) AS n_t2,
                   coalesce(a2.n2, 0) - coalesce(a1.n1, 0) AS delta
            FROM a1 FULL OUTER JOIN a2 ON a1.cell = a2.cell
        """,
        "quadkey_counts": """
            -- identical integer digit arithmetic, zoom 6
            WITH pts AS (
              SELECT (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events)
            SELECT chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 32) % 2) + ((((lon7 + 1800000000) // 56250000) // 32) % 2) AS INTEGER)) || chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 16) % 2) + ((((lon7 + 1800000000) // 56250000) // 16) % 2) AS INTEGER)) || chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 8) % 2) + ((((lon7 + 1800000000) // 56250000) // 8) % 2) AS INTEGER)) || chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 4) % 2) + ((((lon7 + 1800000000) // 56250000) // 4) % 2) AS INTEGER)) || chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 2) % 2) + ((((lon7 + 1800000000) // 56250000) // 2) % 2) AS INTEGER)) || chr(CAST(48 + 2 * (((31 - (CASE WHEN ((lat7 + 900000000) // 56250000) > 31 THEN 31 ELSE ((lat7 + 900000000) // 56250000) END)) // 1) % 2) + ((((lon7 + 1800000000) // 56250000) // 1) % 2) AS INTEGER)) AS quadkey,
                   CAST(count(*) AS BIGINT) AS n_pts
            FROM pts GROUP BY 1
        """,
        "hex_smooth": f"""
            -- hexbin (w=200000000, h=√3·w via _hex_sql) + 7-offset
            -- focal replay over the 6 equidistant Voronoi neighbors
            WITH pts AS (
              SELECT (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events),
            hb AS (
              SELECT hx, hy, CAST(count(*) AS BIGINT) AS cnt
              FROM (
                SELECT
                  {_hex_sql("lon7", "lat7", 200_000_000)[0]} AS hx,
                  {_hex_sql("lon7", "lat7", 200_000_000)[1]} AS hy
                FROM pts)
              GROUP BY 1, 2),
            contrib AS (
              SELECT hx + dx AS tx, hy + dy AS ty, cnt
              FROM hb, (VALUES (0::BIGINT, 0::BIGINT),
                               (200000000, 0), (-200000000, 0),
                               (100000000, {_HEX_H200 // 2}),
                               (100000000, -{_HEX_H200 // 2}),
                               (-100000000, {_HEX_H200 // 2}),
                               (-100000000, -{_HEX_H200 // 2})) AS o(dx, dy)),
            agg AS (
              SELECT tx, ty, CAST(sum(cnt) AS BIGINT) AS focal_sum,
                     CAST(count(*) AS BIGINT) AS focal_n
              FROM contrib GROUP BY 1, 2)
            SELECT hb.hx, hb.hy, hb.cnt, a.focal_sum, a.focal_n,
                   round(CAST(a.focal_sum AS DOUBLE)
                         / CAST(a.focal_n AS DOUBLE), 6) AS focal_mean
            FROM hb JOIN agg a ON a.tx = hb.hx AND a.ty = hb.hy
        """,
        "span_profile": """
            -- expected span layout from raw events: one node doc per
            -- user = [meta] + versions(newest-first) + [media]; the
            -- version count follows the dedup rule (first event per
            -- (user, second)); offsets are dense by construction
            WITH ver AS (
              SELECT user_id,
                     count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT))
                       AS nv
              FROM events GROUP BY 1),
            u AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                         CAST(sum(nv) AS BIGINT) AS sv FROM ver)
            SELECT 'meta' AS kind, nu AS n_docs, nu AS n_spans,
                   CAST(0 AS BIGINT) AS n_media_refs, TRUE AS dense_ok
            FROM u
            UNION ALL
            SELECT 'version', nu, sv, CAST(0 AS BIGINT), TRUE FROM u
            UNION ALL
            SELECT 'media', nu, nu, nu, TRUE FROM u
        """,
        "geary_events": _FOCAL_CTE + """,
            agg2 AS (
              SELECT t,
                     CAST(sum(CAST(cnt AS BIGINT) * cnt) AS BIGINT)
                       AS ss_f
              FROM contrib GROUP BY 1),
            g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cnt) AS BIGINT) AS s FROM r),
            t AS (
              SELECT g.n,
                     (a.n_f - 1) * r.cnt * r.cnt
                       - 2 * r.cnt * (a.s_f - r.cnt)
                       + (a2.ss_f - r.cnt * r.cnt) AS num_i,
                     g.n * r.cnt - g.s AS z,
                     a.n_f - 1 AS w
              FROM r JOIN agg a ON a.t = r.cell
                     JOIN agg2 a2 ON a2.t = r.cell
              CROSS JOIN g)
            SELECT n AS n_cells, CAST(sum(w) AS BIGINT) AS w_pairs,
                   CASE WHEN CAST(sum(w) AS BIGINT) > 0
                         AND CAST(sum(z*z) AS BIGINT) > 0 THEN
                     round(((CAST(n AS DOUBLE) - 1.0)
                            * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * CAST(CAST(sum(num_i) AS BIGINT)
                                   AS DOUBLE))
                           / (2.0
                              * CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
                              * CAST(CAST(sum(z*z) AS BIGINT)
                                     AS DOUBLE)), 9) END AS geary_c
            FROM t GROUP BY n
        """,
        "theil_sen_cells": """
            -- Theil-Sen replay on the zoom-6 × week cube: unrounded
            -- slope ordering with (t1, t2) ties, lower-median pick
            WITH r AS (
              SELECT ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell,
                     sec // 604800 AS wk,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM (
                SELECT ((event_id*1103515245) % 3600000000)
                         - 1800000000 AS lon7,
                       ((event_id*1234567891) % 1700000000)
                         - 850000000 AS lat7,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events)
              GROUP BY 1, 2),
            p AS (
              SELECT a.cell, a.wk AS t1, b.wk AS t2,
                     CAST(b.cnt - a.cnt AS DOUBLE)
                       / CAST(b.wk - a.wk AS DOUBLE) AS s
              FROM r a JOIN r b
                ON a.cell = b.cell AND a.wk < b.wk),
            w AS (
              SELECT cell, s,
                     row_number() OVER (PARTITION BY cell
                       ORDER BY s, t1, t2) AS rn,
                     count(*) OVER (PARTITION BY cell) AS np
              FROM p)
            SELECT cell, CAST(max(np) AS BIGINT) AS n_pairs,
                   round(min(s), 9) AS ts_slope
            FROM w WHERE rn = (np + 1) // 2
            GROUP BY 1
        """,
        "trimmed_mean": """
            -- exact rank trim replay
            WITH li AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
                       AS v
              FROM lineitem),
            r AS (
              SELECT g, v,
                     row_number() OVER (PARTITION BY g ORDER BY v)
                       AS rn,
                     count(*) OVER (PARTITION BY g) AS n
              FROM li),
            k AS (SELECT *, n // 10 AS kk FROM r)
            SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS kept_n,
                   round(CAST(sum(v) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6)
                     AS trimmed_mean
            FROM k WHERE rn > kk AND rn <= n - kk
            GROUP BY 1
        """,
        "quartiles_price": """
            -- percentile_disc replay with integer pick conditions
            WITH li AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
                       AS v
              FROM lineitem),
            r AS (
              SELECT g, v,
                     row_number() OVER (PARTITION BY g ORDER BY v)
                       AS rn,
                     count(*) OVER (PARTITION BY g) AS n
              FROM li)
            SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
                   CAST(min(CASE WHEN rn * 4 >= n THEN v END)
                        AS BIGINT) AS q1,
                   CAST(min(CASE WHEN rn * 2 >= n THEN v END)
                        AS BIGINT) AS q2,
                   CAST(min(CASE WHEN rn * 4 >= n * 3 THEN v END)
                        AS BIGINT) AS q3
            FROM r GROUP BY 1
        """,
        "hampel_outliers": """
            -- rolling median/MAD replay: identical window list, sorted
            -- picks, pure-integer flag test
            WITH ev AS (
              SELECT user_id AS entity,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            win AS (
              SELECT entity, sec, seq, c,
                     list(c) OVER (PARTITION BY entity
                       ORDER BY sec, seq
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS l
              FROM ev),
            m AS (
              SELECT entity, sec, seq, c,
                     list_sort(l)[4] AS med_c, l
              FROM win WHERE len(l) = 7),
            mm AS (
              SELECT entity, sec, seq, c, med_c,
                     list_sort(list_transform(
                       l, x -> abs(x - med_c)))[4] AS mad_c
              FROM m)
            SELECT entity, sec, seq, c AS value_c, med_c, mad_c
            FROM mm WHERE abs(c - med_c) > 3 * mad_c
        """,
        "ab_test": """
            -- two-proportion z replay: exact counts, identical pooled
            -- closed form
            WITH a AS (
              SELECT event_id % 3 AS arm,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT) AS conv
              FROM events GROUP BY 1),
            c AS (SELECT n AS n0, conv AS c0 FROM a WHERE arm = 0),
            j AS (
              SELECT a.*, c.n0, c.c0,
                     CAST(a.conv AS DOUBLE) / CAST(a.n AS DOUBLE) AS p1,
                     CAST(c.c0 AS DOUBLE) / CAST(c.n0 AS DOUBLE) AS p0,
                     CAST(a.conv + c.c0 AS DOUBLE)
                       / CAST(a.n + c.n0 AS DOUBLE) AS pp
              FROM a CROSS JOIN c),
            v AS (
              SELECT *, pp * (1.0 - pp)
                        * (1.0 / CAST(n AS DOUBLE)
                           + 1.0 / CAST(n0 AS DOUBLE)) AS var
              FROM j)
            SELECT arm, n, conv, round(p1, 6) AS rate,
                   CASE WHEN var > 0 THEN
                          round((p1 - p0) / sqrt(var), 6)
                        WHEN arm = 0 THEN 0.0 END AS z
            FROM v
        """,
        "path_ngrams": """
            -- two lead windows over one (user, day) sort; exact counts
            WITH ev AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                     event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq
              FROM events),
            l AS (
              SELECT event_type AS s0,
                     lead(event_type, 1) OVER w AS s1,
                     lead(event_type, 2) OVER w AS s2
              FROM ev
              WINDOW w AS (PARTITION BY user_id, day
                           ORDER BY sec, seq))
            SELECT s0 || '>' || s1 || '>' || s2 AS path,
                   CAST(count(*) AS BIGINT) AS n_occurrences
            FROM l WHERE s2 IS NOT NULL
            GROUP BY 1 HAVING count(*) >= 3
        """,
        "typo_pairs": """
            -- INDEPENDENT oracle: brute-force vocabulary self-join
            -- with DuckDB levenshtein (no deletion-neighborhood trick)
            WITH w AS (
              SELECT CAST(concat('0x',
                       substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS h
              FROM events),
            wd AS (
              SELECT substr(
                       chr(CAST(97 + (h // 2) % 26 AS INTEGER))
                       || chr(CAST(97 + (h // 2 // 26) % 26
                              AS INTEGER))
                       || chr(CAST(97 + (h // 2 // 676) % 26
                              AS INTEGER))
                       || chr(CAST(97 + (h // 2 // 17576) % 26
                              AS INTEGER))
                       || chr(CAST(97 + (h // 2 // 456976) % 26
                              AS INTEGER)),
                       1, CAST(4 + h % 2 AS INTEGER)) AS tok
              FROM w),
            v AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS n_docs
              FROM wd GROUP BY 1)
            SELECT a.tok AS tok_a, b.tok AS tok_b,
                   a.n_docs AS n_a, b.n_docs AS n_b
            FROM v a JOIN v b
              ON a.tok < b.tok
             AND abs(length(a.tok) - length(b.tok)) <= 1
             AND levenshtein(a.tok, b.tok) = 1
        """,
        "lpa_communities": _lpa_oracle(4),
        "dp_tracks": """
            -- full Douglas-Peucker recursion as a segment-splitting
            -- recursive CTE: per segment, the farthest interior point
            -- by exact HUGEINT |cross| (earliest-index ties); split
            -- while cross^2 > tol^2 * chordlen^2 (tol = 1e7 units)
            WITH RECURSIVE pts AS MATERIALIZED (
              SELECT user_id AS e, event_id AS o,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + (event_id*1103515245) % 60000001
                       - 30000000 AS x,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001
                       - 30000000 AS y,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY event_id) - 1 AS i
              FROM events),
            nn AS (SELECT e, max(i) AS last FROM pts GROUP BY 1),
            seg(e, i0, i1) AS (
                SELECT e, 0, last FROM nn WHERE last >= 1
              UNION ALL
                SELECT k.e,
                       CASE WHEN t.side = 0 THEN k.i0 ELSE k.ks END,
                       CASE WHEN t.side = 0 THEN k.ks ELSE k.i1 END
                FROM (
                  SELECT s.e, s.i0, s.i1,
                         -- packed (−|cross|, i) key: i < 2^20, so
                         -- −|cross|·2^20 + i orders by larger cross
                         -- then earlier index, all within HUGEINT
                         CAST(arg_min(p.i,
                           -abs(CAST(p1.x - p0.x AS HUGEINT)
                                  * (p.y - p0.y)
                                - CAST(p1.y - p0.y AS HUGEINT)
                                  * (p.x - p0.x)) * 1048576
                           + p.i) AS BIGINT) AS ks,
                         max(abs(CAST(p1.x - p0.x AS HUGEINT)
                                   * (p.y - p0.y)
                                 - CAST(p1.y - p0.y AS HUGEINT)
                                   * (p.x - p0.x))) AS mc,
                         max(CAST(p1.x - p0.x AS HUGEINT)
                               * (p1.x - p0.x)
                             + CAST(p1.y - p0.y AS HUGEINT)
                               * (p1.y - p0.y)) AS len2
                  FROM seg s
                  JOIN pts p0 ON p0.e = s.e AND p0.i = s.i0
                  JOIN pts p1 ON p1.e = s.e AND p1.i = s.i1
                  JOIN pts p  ON p.e = s.e
                             AND p.i > s.i0 AND p.i < s.i1
                  GROUP BY s.e, s.i0, s.i1
                  HAVING max(abs(CAST(p1.x - p0.x AS HUGEINT)
                                   * (p.y - p0.y)
                                 - CAST(p1.y - p0.y AS HUGEINT)
                                   * (p.x - p0.x)))
                         * max(abs(CAST(p1.x - p0.x AS HUGEINT)
                                     * (p.y - p0.y)
                                   - CAST(p1.y - p0.y AS HUGEINT)
                                     * (p.x - p0.x)))
                         > 100000000000000 *
                           max(CAST(p1.x - p0.x AS HUGEINT)
                                 * (p1.x - p0.x)
                               + CAST(p1.y - p0.y AS HUGEINT)
                                 * (p1.y - p0.y))
                ) k CROSS JOIN (VALUES (0), (1)) t(side)),
            kept AS (
              SELECT DISTINCT e, i FROM (
                SELECT e, i0 AS i FROM seg
                UNION ALL SELECT e, i1 FROM seg
                UNION ALL SELECT e, 0 FROM nn WHERE last = 0))
            SELECT k.e AS entity,
                   row_number() OVER (
                     PARTITION BY k.e ORDER BY k.i) - 1 AS kept_seq,
                   p.o AS ord_key, p.x AS lon7, p.y AS lat7
            FROM kept k JOIN pts p ON p.e = k.e AND p.i = k.i
        """,
        "token_lift": """
            -- identical tokenization ladder + capped distinct tokens,
            -- exact-integer contingency, one rounded division
            WITH toks AS (
              SELECT doc_id AS d,
                     unnest(list_distinct(list_filter(
                       string_split(lower(text), ' '),
                       t -> regexp_matches(t, '^[a-z]{3,}$')))) AS tok
              FROM documents),
            kept AS MATERIALIZED (
              SELECT d, tok FROM (
                SELECT d, tok, row_number() OVER (
                         PARTITION BY d ORDER BY tok) AS rn
                FROM toks) WHERE rn <= 40),
            dt AS (SELECT count(DISTINCT d) AS dd FROM kept),
            marg AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS nt
              FROM kept GROUP BY 1),
            pairs AS (
              SELECT a.tok AS tok_a, b.tok AS tok_b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM kept a JOIN kept b
                ON a.d = b.d AND a.tok < b.tok
              GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT tok_a, tok_b, n_ab, ma.nt AS n_a, mb.nt AS n_b,
                   round(CAST(n_ab * dd AS DOUBLE)
                         / CAST(ma.nt * mb.nt AS DOUBLE), 6) AS lift
            FROM pairs
            JOIN marg ma ON ma.tok = pairs.tok_a
            JOIN marg mb ON mb.tok = pairs.tok_b, dt
        """,
        "trend_slopes": """
            -- OLS replay: HUGEINT moments, identical closed forms
            WITH d AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) - 1500000000 AS x,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS y
              FROM events),
            m AS (
              SELECT uid, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     sum(CAST(x AS HUGEINT) * x) AS sxx,
                     sum(CAST(y AS HUGEINT) * y) AS syy,
                     sum(CAST(x AS HUGEINT) * y) AS sxy
              FROM d GROUP BY 1),
            t AS (
              SELECT uid, n, sx, sy,
                     CAST(n*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
                       AS num,
                     CAST(n*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)
                       AS vx,
                     CAST(n*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)
                       AS vy
              FROM m)
            SELECT uid, n,
                   CASE WHEN vx > 0 THEN round(num / vx, 6) END
                     AS slope,
                   CASE WHEN vx > 0 THEN
                     round((CAST(sy AS DOUBLE)
                            - num / vx * CAST(sx AS DOUBLE))
                           / CAST(n AS DOUBLE), 6) END AS intercept,
                   CASE WHEN vx > 0 AND vy > 0 THEN
                     round(num * num / (vx * vy), 6) END AS r2
            FROM t
        """,
        "acf_lags": """
            -- sample-ACF replay: u_t = n·x_t − S exact integers,
            -- identical lag pairing and one rounded division
            WITH x AS (
              SELECT user_id AS e,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            t AS (SELECT e, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(c) AS BIGINT) AS s
                  FROM x GROUP BY 1),
            u AS (
              SELECT x.e, x.sec, x.seq, t.n,
                     CAST(t.n AS HUGEINT) * x.c - t.s AS u
              FROM x JOIN t USING (e)),
            l AS (
              SELECT e, n, u,
                     lag(u, 1) OVER w AS u1,
                     lag(u, 2) OVER w AS u2,
                     lag(u, 3) OVER w AS u3
              FROM u
              WINDOW w AS (PARTITION BY e ORDER BY sec, seq)),
            m AS (
              SELECT e, max(n) AS n, sum(u*u) AS den,
                     sum(u*u1) AS n1, sum(u*u2) AS n2, sum(u*u3) AS n3
              FROM l GROUP BY 1)
            SELECT e AS entity, lag, n,
                   round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
                     AS acf_r
            FROM (
              SELECT e, n, den, 1 AS lag, coalesce(n1, 0) AS num
              FROM m WHERE den > 0
              UNION ALL
              SELECT e, n, den, 2, coalesce(n2, 0) FROM m WHERE den > 0
              UNION ALL
              SELECT e, n, den, 3, coalesce(n3, 0) FROM m WHERE den > 0)
        """,
        "seasonal_dow": """
            -- classical-decomposition replay: dense calendar grid,
            -- centered 7-day window, detr = 7·cnt − windowsum exact
            WITH pd AS (
              SELECT event_type AS e,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
            grid AS (
              SELECT t.e, unnest(generate_series(s.d0, s.d1)) AS d
              FROM (SELECT DISTINCT e FROM pd) t,
                   (SELECT min(d) AS d0, max(d) AS d1 FROM pd) s),
            dense AS (
              SELECT grid.e, grid.d, coalesce(pd.c, 0) AS c
              FROM grid LEFT JOIN pd
                ON pd.e = grid.e AND pd.d = grid.d),
            win AS (
              -- window BEFORE the interior filter (WHERE would shrink
              -- the frame at the interior edge)
              SELECT e, d,
                     7 * c - CAST(sum(c) OVER (PARTITION BY e ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       AS BIGINT) AS detr
              FROM dense),
            detr AS (
              SELECT e, d, detr FROM win
              WHERE d BETWEEN (SELECT min(d) + 3 FROM pd)
                          AND (SELECT max(d) - 3 FROM pd))
            SELECT e AS event_type, d % 7 AS phase,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   round(CAST(sum(detr) AS DOUBLE)
                         / (7.0 * CAST(count(*) AS DOUBLE)), 6)
                     AS seasonal
            FROM detr GROUP BY 1, 2
        """,
        "hex_bins": f"""
            -- hexbin replay via _hex_sql (w=100000000, h=√3·w)
            WITH pts AS (
              SELECT event_id, value,
                     (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events),
            hb AS (
              SELECT value,
                     {_hex_sql("lon7", "lat7", 100_000_000)[0]} AS hx,
                     {_hex_sql("lon7", "lat7", 100_000_000)[1]} AS hy
              FROM pts)
            SELECT hx, hy, CAST(count(*) AS BIGINT) AS n_pts,
                   round(sum(value), 2) AS sum_value
            FROM hb GROUP BY 1, 2
        """,
        "voronoi_assign": """
            -- Voronoi replay: brute cross join to the 12 seed sites,
            -- exact HUGEINT squared distance, (dist, sid) tie order
            WITH pts AS (
              SELECT event_id, value,
                     (event_id * 1103515245) % 3600000000
                       - 1800000000 AS lon7,
                     (event_id * 1234567891) % 1700000000
                       - 850000000 AS lat7
              FROM events),
            seeds(sid, slon, slat) AS (VALUES
              (1, -696484755, 384567891),
              (2, 407030490, -80864218),
              (3, 1510545735, -546296327),
              (4, -985939020, 688271564),
              (5, 117576225, 222839455),
              (6, 1221091470, -242592654),
              (7, -1275393285, -708024763),
              (8, -171878040, 526543128),
              (9, 931637205, 61111019),
              (10, -1564847550, -404321090),
              (11, -461332305, 830246801),
              (12, 642182940, 364814692)),
            d AS (
              SELECT p.event_id, p.value, s.sid,
                     CAST(p.lon7 - s.slon AS HUGEINT)
                       * (p.lon7 - s.slon)
                     + CAST(p.lat7 - s.slat AS HUGEINT)
                       * (p.lat7 - s.slat) AS dist
              FROM pts p CROSS JOIN seeds s),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY event_id ORDER BY dist, sid) AS rn
              FROM d)
            SELECT sid AS seed_id, CAST(count(*) AS BIGINT) AS n_pts,
                   round(sum(value), 2) AS sum_value
            FROM r WHERE rn = 1 GROUP BY 1
        """,
        "cusum_drift": """
            -- CUSUM replay via the same prefix-sum − running-min
            -- identity; exact BIGINT cents throughout
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            p AS (
              SELECT uid, sec, seq,
                     sum(c - 20000) OVER (
                       PARTITION BY uid ORDER BY sec, seq
                       ROWS UNBOUNDED PRECEDING) AS p
              FROM ev),
            s AS (
              SELECT uid, sec,
                     p - least(0, min(p) OVER (
                       PARTITION BY uid ORDER BY sec, seq
                       ROWS UNBOUNDED PRECEDING)) AS s
              FROM p)
            SELECT uid AS entity,
                   CAST(count(*) AS BIGINT) AS n_obs,
                   CAST(sum(CASE WHEN s > 8000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_alarms,
                   CAST(max(s) AS BIGINT) AS max_s,
                   min(CASE WHEN s > 8000 THEN sec END)
                     AS first_alarm_sec
            FROM s GROUP BY 1
        """,
        "uptime_islands": """
            -- interval-union replay: running-max window marks island
            -- starts, running sum numbers them, two aggregates — all
            -- integer seconds
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS s,
                     CAST(floor(epoch(ts)) AS BIGINT)
                       + 900 + (event_id % 7) * 600 AS e
              FROM events),
            m AS (
              SELECT uid, s, e,
                     max(e) OVER (PARTITION BY uid ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pm
              FROM ev),
            mk AS (
              SELECT uid, s, e,
                     CASE WHEN pm IS NULL OR s > pm THEN 1
                          ELSE 0 END AS nw
              FROM m),
            nm AS (
              SELECT uid, s, e,
                     sum(nw) OVER (PARTITION BY uid ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS isl
              FROM mk),
            g AS (SELECT uid, isl, min(s) AS st, max(e) AS en
                  FROM nm GROUP BY 1, 2)
            SELECT uid AS entity,
                   CAST(count(*) AS BIGINT) AS n_islands,
                   CAST(sum(en - st) AS BIGINT) AS covered_s,
                   CAST(max(en - st) AS BIGINT) AS longest_s
            FROM g GROUP BY 1
        """,
        "counter_rate": """
            -- PromQL increase/rate replay: integer-cents deltas with
            -- reset handling, exact BIGINT sums, one division per row
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS c
              FROM events),
            l AS (
              SELECT uid, c,
                     lag(c) OVER (PARTITION BY uid
                                  ORDER BY sec, seq) AS p
              FROM ev),
            d AS (
              SELECT uid,
                     CASE WHEN c >= p THEN c - p ELSE c END AS dd
              FROM l WHERE p IS NOT NULL),
            inc AS (
              SELECT uid, CAST(sum(dd) AS BIGINT) AS inc_cents
              FROM d GROUP BY 1),
            sp AS (
              SELECT uid, max(sec) - min(sec) AS span_s
              FROM ev GROUP BY 1)
            SELECT i.uid AS entity, s.span_s,
                   round(CAST(i.inc_cents AS DOUBLE) / 100.0, 6)
                     AS increase,
                   round(CAST(i.inc_cents AS DOUBLE)
                         / (CAST(s.span_s AS DOUBLE) * 100.0), 6)
                     AS rate_per_s
            FROM inc i JOIN sp s ON s.uid = i.uid
            WHERE s.span_s > 0
        """,
        "stream_sessions": """
            -- batch replay of the streaming session_window semantics:
            -- new session only when the 30-min gap is STRICTLY
            -- exceeded (empirically pinned — an event exactly 1800 s
            -- after the previous one merges); session ids by running
            -- sum of gap starts, then per-session and per-user rollups
            WITH ev AS (
              SELECT user_id, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events),
            l AS (
              SELECT user_id, event_id, sec,
                     CASE WHEN prev IS NULL OR sec - prev > 1800
                          THEN 1 ELSE 0 END AS ns
              FROM (
                SELECT user_id, event_id, sec,
                       lag(sec) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id) AS prev
                FROM ev)),
            s AS (
              SELECT user_id, sec,
                     sum(ns) OVER (PARTITION BY user_id
                                   ORDER BY sec, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
              FROM l),
            per AS (
              SELECT user_id, sid,
                     count(*) AS n_events,
                     max(sec) - min(sec) AS dur_s
              FROM s GROUP BY 1, 2)
            SELECT user_id,
                   count(*) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   max(n_events) AS max_sess_events,
                   max(dur_s) AS max_sess_dur_s
            FROM per GROUP BY 1
        """,
        "twa_value": """
            -- LOCF integral replay: per-term integer cents x whole
            -- seconds (exact order-invariant BIGINT numerator), one
            -- float division at the end
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq, value
              FROM events),
            nx AS (
              SELECT uid, sec, value,
                     lead(sec) OVER (
                       PARTITION BY uid ORDER BY sec, seq) AS nxt
              FROM ev),
            t AS (
              SELECT uid,
                     CAST(round(value * 100.0, 0) AS BIGINT)
                       * (nxt - sec) AS num,
                     nxt - sec AS dt
              FROM nx WHERE nxt IS NOT NULL)
            SELECT uid AS entity,
                   CAST(sum(dt) AS BIGINT) AS span_s,
                   round(CAST(CAST(sum(num) AS BIGINT) AS DOUBLE)
                         / (CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE)
                            * 100.0), 6) AS twa
            FROM t GROUP BY uid
            HAVING sum(dt) > 0
        """,
        "ohlc_weekly": """
            -- first/last by exact packed BIGINT (sec, seq) keys —
            -- arg_min/arg_max mirror min_by/max_by
            WITH ev AS (
              SELECT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     event_id AS seq, value
              FROM events)
            SELECT uid AS entity,
                   sec // 604800 AS bucket,
                   arg_min(value, sec * 1000000 + seq) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   arg_max(value, sec * 1000000 + seq) AS close,
                   count(*) AS volume
            FROM ev GROUP BY 1, 2
        """,
        "retention_cohorts": """
            WITH base AS (
              SELECT DISTINCT user_id AS uid,
                     CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
              FROM events WHERE value > 180.0),
            cohort AS (
              SELECT uid, min(wk) AS cohort_wk FROM base GROUP BY uid),
            act AS (
              SELECT c.cohort_wk, b.wk - c.cohort_wk AS offset_wk,
                     count(DISTINCT b.uid) AS active_users
              FROM base b JOIN cohort c ON c.uid = b.uid
              GROUP BY 1, 2),
            sz AS (
              SELECT cohort_wk, count(*) AS cohort_size
              FROM cohort GROUP BY 1)
            SELECT a.cohort_wk, a.offset_wk, a.active_users,
                   s.cohort_size,
                   round(CAST(a.active_users AS DOUBLE)
                         / CAST(s.cohort_size AS DOUBLE), 6)
                     AS retention_rate
            FROM act a JOIN sz s ON s.cohort_wk = a.cohort_wk
        """,
        "sde_tracks": """
            -- SDE replay: HUGEINT moments mirror Spark's
            -- decimal(38,0) sums exactly; identical double expression
            -- tree (association order pinned) before round(6)
            WITH p AS (
              SELECT user_id AS ent,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + (event_id*1103515245) % 60000001
                       - 30000000 AS x,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001
                       - 30000000 AS y
              FROM events),
            m AS (
              SELECT ent, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     sum(CAST(x AS HUGEINT) * x) AS sxx,
                     sum(CAST(y AS HUGEINT) * y) AS syy,
                     sum(CAST(x AS HUGEINT) * y) AS sxy
              FROM p GROUP BY 1),
            t AS (
              SELECT ent, n, CAST(n AS DOUBLE) AS nd,
                     CAST(sx AS DOUBLE) AS sxd,
                     CAST(sy AS DOUBLE) AS syd,
                     CAST(n*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE) AS a,
                     CAST(n*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE) AS b,
                     CAST(n*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE) AS c
              FROM m),
            e AS (
              SELECT ent, n, nd, sxd, syd, a, b, c,
                     sqrt((a-b)*(a-b) + 4.0*c*c) AS d
              FROM t)
            SELECT ent AS entity, n AS n_pts,
                   round(sxd / nd * 1e-7, 6) AS mean_lon,
                   round(syd / nd * 1e-7, 6) AS mean_lat,
                   round(degrees(atan2(2.0*c, a - b) * 0.5), 6)
                     AS orient_deg,
                   round(sqrt(2.0 * ((a + b + d) * 0.5)) / nd * 1e-7, 6)
                     AS major_deg,
                   round(sqrt(greatest(0.0, 2.0 * ((a + b - d) * 0.5)))
                         / nd * 1e-7, 6) AS minor_deg
            FROM e
        """,
        "convex_hulls": """
            -- INDEPENDENT hull algorithm: gift-wrapping (Jarvis march)
            -- as a recursive CTE — CCW from the lexicographic minimum,
            -- candidate q survives when NO point r is strictly right of
            -- ray p->q (min HUGEINT cross >= 0; exact — int64 would
            -- overflow the cross difference), farthest candidate wins
            -- so collinear boundary points drop (STRICT hull). The
            -- engine's monotone chain must produce the identical vertex
            -- sequence (strict-hull uniqueness + same start and
            -- orientation). Area replays the reference CD loop over the
            -- CLOSED ring (all m+1 coords, wrap-around triples) with
            -- per-term 1e-12 quantization; perimeter is per-edge
            -- integer millimeters — both sums order-invariant BIGINTs.
            WITH RECURSIVE pts AS MATERIALIZED (
              SELECT DISTINCT user_id AS e,
                     ((user_id // 2) % 24) * 150000000 - 1800000000
                       + 75000000
                       + (event_id*1103515245) % 60000001 - 30000000
                       AS x,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001 - 30000000
                       AS y
              FROM events),
            start AS MATERIALIZED (
              SELECT e, x, y FROM (
                SELECT e, x, y,
                       row_number() OVER (PARTITION BY e ORDER BY x, y) rn
                FROM pts) WHERE rn = 1),
            walk(e, x, y, sx, sy, step) AS (
              SELECT e, x, y, x, y, 0 FROM start
              UNION ALL
              SELECT e, nx, ny, sx, sy, step + 1 FROM (
                SELECT c.e, arg_max(c.qx, c.d2) AS nx,
                       arg_max(c.qy, c.d2) AS ny,
                       any_value(c.sx) AS sx, any_value(c.sy) AS sy,
                       any_value(c.step) AS step
                FROM (
                  SELECT w.e, w.sx, w.sy, w.step, q.x AS qx, q.y AS qy,
                         CAST(q.x - w.x AS HUGEINT) * (q.x - w.x)
                           + CAST(q.y - w.y AS HUGEINT) * (q.y - w.y)
                           AS d2
                  FROM walk w
                  JOIN pts q ON q.e = w.e AND (q.x <> w.x OR q.y <> w.y)
                  JOIN pts r ON r.e = w.e
                  WHERE w.step < 10000
                    AND NOT (w.step > 0 AND w.x = w.sx AND w.y = w.sy)
                  GROUP BY w.e, w.x, w.y, w.sx, w.sy, w.step, q.x, q.y
                  HAVING min(CAST(q.x - w.x AS HUGEINT) * (r.y - w.y)
                             - CAST(q.y - w.y AS HUGEINT) * (r.x - w.x))
                         >= 0
                ) c GROUP BY c.e)),
            hull AS MATERIALIZED (
              SELECT e, step, x, y FROM walk
              WHERE NOT (step > 0 AND x = sx AND y = sy)),
            hn AS MATERIALIZED (
              SELECT e, count(*) AS m FROM hull GROUP BY e),
            -- closed ring c[0..m], c[m] = c[0]; CD terms i = 0..m
            terms AS (
              SELECT h.e,
                     CAST(round((radians(c2.x * 1e-7)
                                 - radians(c0.x * 1e-7))
                                * sin(radians(c1.y * 1e-7)) * 1e12, 0)
                          AS BIGINT) AS tq
              FROM hn h
              JOIN (SELECT e, unnest(generate_series(0, m)) AS i
                    FROM hn) g ON g.e = h.e
              JOIN hull c0 ON c0.e = h.e
               AND c0.step = CASE WHEN g.i % (h.m + 1) = h.m THEN 0
                                  ELSE g.i % (h.m + 1) END
              JOIN hull c1 ON c1.e = h.e
               AND c1.step = CASE WHEN (g.i + 1) % (h.m + 1) = h.m THEN 0
                                  ELSE (g.i + 1) % (h.m + 1) END
              JOIN hull c2 ON c2.e = h.e
               AND c2.step = CASE WHEN (g.i + 2) % (h.m + 1) = h.m THEN 0
                                  ELSE (g.i + 2) % (h.m + 1) END),
            area AS (
              SELECT e,
                     round(abs(CAST(sum(tq) AS BIGINT))
                           * 6371000.0 * 6371000.0 / 2.0 / 1e12 / 1e6, 6)
                       AS area_km2
              FROM terms GROUP BY e),
            evec AS (
              SELECT a.e,
                     radians(b.y * 1e-7 - a.y * 1e-7) AS dla,
                     radians(b.x * 1e-7 - a.x * 1e-7)
                       * cos(radians((a.y * 1e-7 + b.y * 1e-7) / 2.0))
                       AS dln
              FROM hull a
              JOIN hn n ON n.e = a.e
              JOIN hull b ON b.e = a.e
               AND b.step = (a.step + 1) % n.m),
            edges AS (
              SELECT e,
                     CAST(round(6371000.0 * sqrt(dla * dla + dln * dln)
                                * 1000.0, 0) AS BIGINT) AS mm
              FROM evec),
            perim AS (
              SELECT e, round(CAST(sum(mm) AS BIGINT) / 1e6, 6)
                       AS perim_km
              FROM edges GROUP BY e),
            np AS (SELECT e, count(*) AS n_pts FROM pts GROUP BY e)
            SELECT hn.e AS entity, np.n_pts,
                   hn.m AS n_hull, area.area_km2, perim.perim_km
            FROM hn
            JOIN np ON np.e = hn.e
            JOIN area ON area.e = hn.e
            JOIN perim ON perim.e = hn.e
            WHERE hn.m >= 3
        """,
        "geohash_counts": f"""
            -- geohash replay generated by _geohash_duck_sql (same bit
            -- layout as geo/cells.geohash_col; pure integer arithmetic
            -- on both engines so strings match bitwise)
            WITH pts AS (
              SELECT (event_id*1103515245) % 3600000000 - 1800000000
                       AS lon7,
                     (event_id*1234567891) % 1700000000 - 850000000
                       AS lat7
              FROM events)
            SELECT {_geohash_duck_sql('lon7', 'lat7', 3)} AS gh,
                   count(*) AS cnt
            FROM pts GROUP BY 1
        """,
        "heading_stats": """
            -- circular-statistics replay, term-for-term: the same local
            -- equirect plane for bearings (east = Δlon·cos(mid lat),
            -- north = Δlat, θ = atan2(east, north)); each hop's sin/cos
            -- quantizes to integer nano-units so the sums are exact
            -- BIGINTs (order-invariant) before the final atan2/sqrt
            WITH pts AS (
              SELECT user_id AS entity, event_id AS ord_key,
                     (((user_id // 2) % 24) * 150000000 - 1800000000
                       + 75000000
                       + (event_id*1103515245) % 60000001 - 30000000)
                       * 1e-7 AS lon,
                     ((((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + (event_id*1234567891) % 60000001 - 30000000)
                       * 1e-7 AS lat
              FROM events),
            hop AS (
              SELECT entity,
                     lag(lon) OVER w AS plon,
                     lag(lat) OVER w AS plat,
                     lon, lat
              FROM pts
              WINDOW w AS (PARTITION BY entity ORDER BY ord_key)),
            vec AS (
              SELECT entity,
                     radians(lon - plon)
                       * cos(radians((plat + lat) / 2.0)) AS east,
                     radians(lat - plat) AS north
              FROM hop WHERE plon IS NOT NULL),
            q AS (
              SELECT entity,
                     CAST(round(sin(atan2(east, north)) * 1e9, 0)
                          AS BIGINT) AS s,
                     CAST(round(cos(atan2(east, north)) * 1e9, 0)
                          AS BIGINT) AS c
              FROM vec WHERE NOT (east = 0.0 AND north = 0.0))
            SELECT entity,
                   count(*) AS n_hops,
                   round(degrees(atan2(
                     CAST(CAST(sum(s) AS BIGINT) AS DOUBLE),
                     CAST(CAST(sum(c) AS BIGINT) AS DOUBLE))), 6)
                     AS mean_bearing_deg,
                   round(sqrt(
                       pow(CAST(CAST(sum(s) AS BIGINT) AS DOUBLE), 2.0)
                       + pow(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE), 2.0))
                     / (count(*) * 1e9), 6) AS resultant_len
            FROM q GROUP BY entity
        """,
        "colocation_pairs": _COLOCATION_ORACLE,
        # the streaming query replays the batch operator exactly (the
        # 40-day watermark exceeds the bounded input's span, so the
        # stream-stream join evicts nothing) — same oracle by design
        "stream_colocation": _COLOCATION_ORACLE,
        "simplify_tracks": """
            -- sequential-fold replay: the recursion's layer k holds
            -- each entity's k-th KEPT fix; the step joins to all later
            -- fixes >= 400 km (mm-quantized, identical formula) and
            -- arg_min picks the earliest — exactly the engine's fold.
            -- Points MATERIALIZED (re-referenced every iteration)
            WITH RECURSIVE
            p AS MATERIALIZED (
              SELECT user_id AS ent, event_id AS ordk,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + ((event_id*1103515245) % 60000001)
                       - 30000000 AS lon7,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + ((event_id*1234567891) % 60000001)
                       - 30000000 AS lat7
              FROM events),
            f0 AS (SELECT ent, min(ordk) AS ordk FROM p GROUP BY ent),
            dp AS (
              SELECT p.ent, 0 AS k, p.ordk, p.lon7, p.lat7
              FROM p JOIN f0 ON f0.ent = p.ent AND f0.ordk = p.ordk
              UNION ALL
              SELECT d.ent, d.k + 1 AS k,
                     min(n.ordk) AS ordk,
                     arg_min(n.lon7, n.ordk) AS lon7,
                     arg_min(n.lat7, n.ordk) AS lat7
              FROM dp d JOIN p n
                ON n.ent = d.ent AND n.ordk > d.ordk
              WHERE CAST(round(6371000.0 * sqrt(
                  (radians(n.lon7*1e-7 - d.lon7*1e-7)
                   * cos(radians((d.lat7*1e-7 + n.lat7*1e-7) / 2.0)))
                  * (radians(n.lon7*1e-7 - d.lon7*1e-7)
                     * cos(radians((d.lat7*1e-7 + n.lat7*1e-7) / 2.0)))
                  + radians(n.lat7*1e-7 - d.lat7*1e-7)
                    * radians(n.lat7*1e-7 - d.lat7*1e-7)) * 1000.0, 0)
                  AS BIGINT) >= 400000000
              GROUP BY d.ent, d.k + 1)
            SELECT ent AS entity, CAST(k AS BIGINT) AS kept_seq,
                   ordk AS ord_key, lon7, lat7
            FROM dp
        """,
        "od_matrix": """
            -- replay: same movement hops (lag per user), zoom-4 cells,
            -- week of the arriving fix, mm-exact hop sums (CAST —
            -- DuckDB sum(BIGINT) is HUGEINT)
            WITH pts AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events),
            cp AS (
              SELECT event_id, user_id, sec, lon7, lat7,
                     ((lat7 + 900000000) // 225000000) * 16
                     + ((lon7 + 1800000000) // 225000000) AS cell
              FROM pts),
            hop AS (
              SELECT user_id, sec, cell,
                     lag(cell) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS pcell,
                     lag(lon7*1e-7) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS plon,
                     lag(lat7*1e-7) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS plat,
                     lon7*1e-7 AS lon, lat7*1e-7 AS lat
              FROM cp),
            h2 AS (
              SELECT user_id, sec // 604800 AS wk, pcell, cell,
                     CAST(round(6371000.0 * sqrt(
                       (radians(lon - plon)
                        * cos(radians((plat + lat) / 2.0)))
                       * (radians(lon - plon)
                          * cos(radians((plat + lat) / 2.0)))
                       + radians(lat - plat) * radians(lat - plat))
                       * 1000.0, 0) AS BIGINT) AS hop_mm
              FROM hop WHERE pcell IS NOT NULL)
            SELECT wk, pcell AS from_cell, cell AS to_cell,
                   CAST(count(*) AS BIGINT) AS flows,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS movers,
                   CAST(sum(hop_mm) AS BIGINT) AS dist_mm
            FROM h2 GROUP BY 1, 2, 3
        """,
        "kcore_cells": _kcore_oracle(3, 8),
        "assortativity": """
            -- Newman degree-assortativity replay: same canonical edge
            -- set and degree join as the triangle oracle; exact
            -- integer stub moments, one double division
            WITH pts AS (
              SELECT event_id, user_id,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events),
            cp AS (
              SELECT event_id, user_id,
                     ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell
              FROM pts),
            hop AS (
              SELECT user_id, cell,
                     lag(cell) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS pcell
              FROM cp),
            e AS (
              SELECT DISTINCT least(pcell, cell) AS u,
                              greatest(pcell, cell) AS v
              FROM hop
              WHERE pcell IS NOT NULL AND pcell <> cell),
            deg AS (
              SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS n FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
            s AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                     CAST(sum(du.d + dv.d) AS BIGINT) AS sx,
                     CAST(sum(du.d*du.d + dv.d*dv.d) AS BIGINT) AS sxx,
                     CAST(sum(2*du.d*dv.d) AS BIGINT) AS sxy
              FROM e JOIN deg du ON du.n = e.u
                     JOIN deg dv ON dv.n = e.v),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
            SELECT n_nodes, m AS n_edges,
                   CASE WHEN 2*m*sxx - sx*sx <> 0 THEN
                     round(CAST(2*m*sxy - sx*sx AS DOUBLE)
                           / CAST(2*m*sxx - sx*sx AS DOUBLE), 6)
                   END AS assortativity
            FROM nn CROSS JOIN s
        """,
        "triangles": """
            -- node-iterator++ replay: same canonical undirected edge
            -- set, same (degree, id) orientation, wedge join closed by
            -- the oriented edge — every count an exact integer; the
            -- even sums halve exactly in doubles
            WITH pts AS (
              SELECT event_id, user_id,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events),
            cp AS (
              SELECT event_id, user_id,
                     ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell
              FROM pts),
            hop AS (
              SELECT user_id, cell,
                     lag(cell) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS pcell
              FROM cp),
            e AS (
              SELECT DISTINCT least(pcell, cell) AS u,
                              greatest(pcell, cell) AS v
              FROM hop
              WHERE pcell IS NOT NULL AND pcell <> cell),
            deg AS (
              SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT u AS n FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
            o AS (
              SELECT CASE WHEN du.d < dv.d
                          OR (du.d = dv.d AND e.u < e.v)
                       THEN e.u ELSE e.v END AS s,
                     CASE WHEN du.d < dv.d
                          OR (du.d = dv.d AND e.u < e.v)
                       THEN e.v ELSE e.u END AS t,
                     CASE WHEN du.d < dv.d
                          OR (du.d = dv.d AND e.u < e.v)
                       THEN dv.d ELSE du.d END AS dt
              FROM e JOIN deg du ON du.n = e.u
                     JOIN deg dv ON dv.n = e.v),
            tri AS (
              SELECT CAST(count(*) AS BIGINT) AS n_triangles
              FROM (
                SELECT e1.t AS s, e2.t AS t
                FROM o e1 JOIN o e2
                  ON e2.s = e1.s
                 AND (e1.dt < e2.dt
                      OR (e1.dt = e2.dt AND e1.t < e2.t))) w
              JOIN o ON o.s = w.s AND o.t = w.t),
            tots AS (
              SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(sum(d) / 2 AS BIGINT) AS n_edges,
                     CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges
              FROM deg)
            SELECT n_nodes, n_edges, n_wedges, n_triangles,
                   round(3.0 * CAST(n_triangles AS DOUBLE)
                         / CAST(n_wedges AS DOUBLE), 6) AS clustering
            FROM tots CROSS JOIN tri
        """,
        "travel_cost": """
            -- bounded Bellman-Ford replay: layer k of the recursion is
            -- the best cost over walks of EXACTLY k edges from any
            -- source; min across layers 0..8 = the engine's answer
            -- (min-over-walks = min-over-paths, weights >= 0). Edges
            -- MATERIALIZED: the recursive term re-references them
            -- every iteration
            WITH RECURSIVE
            pts AS (
              SELECT event_id, user_id,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events),
            cp AS (
              SELECT event_id, user_id, lon7, lat7,
                     ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell
              FROM pts),
            hop AS (
              SELECT user_id, cell,
                     lag(cell) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS pcell,
                     lag(lon7*1e-7) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS plon,
                     lag(lat7*1e-7) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS plat,
                     lon7*1e-7 AS lon, lat7*1e-7 AS lat
              FROM cp),
            ed AS MATERIALIZED (
              SELECT pcell AS s, cell AS t,
                     min(CAST(round(6371000.0 * sqrt(
                       (radians(lon - plon)
                        * cos(radians((plat + lat) / 2.0)))
                       * (radians(lon - plon)
                          * cos(radians((plat + lat) / 2.0)))
                       + radians(lat - plat) * radians(lat - plat))
                       * 1000.0, 0) AS BIGINT)) AS w
              FROM hop WHERE pcell IS NOT NULL
              GROUP BY 1, 2),
            srcs AS MATERIALIZED (
              SELECT DISTINCT cell AS node FROM cp WHERE event_id <= 2),
            dp AS (
              SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS k FROM srcs
              UNION ALL
              SELECT e.t AS node, min(p.dist + e.w) AS dist,
                     p.k + 1 AS k
              FROM dp p JOIN ed e ON e.s = p.node
              WHERE p.k < 8
              GROUP BY e.t, p.k + 1)
            SELECT node, CAST(min(dist) AS BIGINT) AS dist
            FROM dp GROUP BY node
        """,
        "spacetime_hotspots": """
            -- 3x3x3 space-time Gi* replay: same integer-exact focal
            -- cube (lon wrap, lat clamp, time no wrap) and the same
            -- N-cancelling formulation as the 2-D hotspot oracle
            WITH r AS (
              SELECT ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell,
                     sec // 604800 AS wk,
                     count(*) AS cnt
              FROM (
                SELECT ((event_id*1103515245) % 3600000000)
                         - 1800000000 AS lon7,
                       ((event_id*1234567891) % 1700000000)
                         - 850000000 AS lat7,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events)
              GROUP BY 1, 2),
            contrib AS (
              SELECT ((cell // 64) + dy) * 64
                     + ((cell % 64) + dx + 64) % 64 AS tc,
                     wk + dt AS tw, cnt
              FROM r,
                   (VALUES (-1), (0), (1)) AS dxs(dx),
                   (VALUES (-1), (0), (1)) AS dys(dy),
                   (VALUES (-1), (0), (1)) AS dts(dt)
              WHERE (cell // 64) + dy BETWEEN 0 AND 31),
            agg AS (SELECT tc, tw, CAST(sum(cnt) AS BIGINT) AS s_f,
                           CAST(count(*) AS BIGINT) AS n_f
                    FROM contrib GROUP BY 1, 2),
            g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cnt) AS BIGINT) AS s,
                         CAST(sum(cnt*cnt) AS BIGINT) AS s2 FROM r)
            SELECT r.cell, r.wk, r.cnt,
                   round(CAST(g.n*a.s_f - g.s*a.n_f AS DOUBLE)
                         / (sqrt(CAST(g.n*g.s2 - g.s*g.s AS DOUBLE))
                            * sqrt(CAST(g.n*a.n_f - a.n_f*a.n_f AS DOUBLE)
                                   / CAST(g.n - 1 AS DOUBLE))), 6)
                     AS gi_star
            FROM r JOIN agg a ON a.tc = r.cell AND a.tw = r.wk
            CROSS JOIN g
        """,
        "trend_cells": """
            -- Mann–Kendall replay on the same zoom-6 × week cube:
            -- integer pair signs, tie polynomial, n(n-1)(2n+5) — the
            -- z division consumes identical exact ints on both engines
            WITH r AS (
              SELECT ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell,
                     sec // 604800 AS wk,
                     count(*) AS cnt
              FROM (
                SELECT ((event_id*1103515245) % 3600000000)
                         - 1800000000 AS lon7,
                       ((event_id*1234567891) % 1700000000)
                         - 850000000 AS lat7,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events)
              GROUP BY 1, 2),
            nn AS (SELECT cell, CAST(count(*) AS BIGINT) AS n
                   FROM r GROUP BY 1),
            tt AS (SELECT cell,
                          CAST(sum(tg*(tg-1)*(2*tg+5)) AS BIGINT) AS tt
                   FROM (SELECT cell, cnt, count(*) AS tg
                         FROM r GROUP BY 1, 2)
                   GROUP BY 1),
            ss AS (SELECT a.cell,
                          CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                                        WHEN b.cnt < a.cnt THEN -1
                                        ELSE 0 END) AS BIGINT) AS s
                   FROM r a JOIN r b
                     ON b.cell = a.cell AND b.wk > a.wk
                   GROUP BY 1),
            j AS (SELECT nn.cell, nn.n, coalesce(ss.s, 0) AS s,
                         nn.n*(nn.n-1)*(2*nn.n+5) - tt.tt AS var18
                  FROM nn JOIN tt ON tt.cell = nn.cell
                  LEFT JOIN ss ON ss.cell = nn.cell),
            zz AS (SELECT cell, n, s, var18,
                     CASE WHEN s > 0 THEN
                       CAST(s - 1 AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     WHEN s < 0 THEN
                       CAST(s + 1 AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     ELSE 0.0 END AS z
                   FROM j)
            SELECT cell, n AS n_bins, s AS s_stat, var18,
                   round(z, 6) AS z,
                   CASE WHEN z > 1.959964 THEN 'increasing'
                        WHEN z < -1.959964 THEN 'decreasing'
                        ELSE 'none' END AS trend
            FROM zz
        """,
        "moran_events": _MORAN_EVENTS_ORACLE,
        "lisa_events": _LISA_EVENTS_ORACLE,
        "slope_cells": _SLOPE_CELLS_ORACLE,
        "focal_mean": """
            -- 3×3 focal stats replay over the zoom-6 raster: ncols=64,
            -- northernmost row 31; lon wraps mod 64, rows beyond the
            -- poles dropped; only PRESENT cells contribute (sparse
            -- semantics, focal_n carries the present-neighbor count)
            WITH r AS (
              SELECT ((lat7 + 900000000) // 56250000) * 64
                     + ((lon7 + 1800000000) // 56250000) AS cell,
                     count(*) AS cnt
              FROM (
                SELECT ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
                       ((event_id*1234567891) % 1700000000) - 850000000 AS lat7
                FROM events)
              GROUP BY 1),
            contrib AS (
              SELECT ((cell // 64) + dy) * 64
                     + ((cell % 64) + dx + 64) % 64 AS t, cnt
              FROM r,
                   (VALUES (-1), (0), (1)) AS dxs(dx),
                   (VALUES (-1), (0), (1)) AS dys(dy)
              WHERE (cell // 64) + dy BETWEEN 0 AND 31),
            agg AS (SELECT t, sum(cnt) AS s, count(*) AS n
                    FROM contrib GROUP BY 1)
            SELECT r.cell, r.cnt, CAST(agg.s AS BIGINT) AS focal_sum,
                   CAST(agg.n AS BIGINT) AS focal_n,
                   round(CAST(agg.s AS DOUBLE) / agg.n, 6) AS focal_mean
            FROM r JOIN agg ON agg.t = r.cell
        """,
        "poly_aoi_filter": _poly_aoi_oracle(),
        "geodesic_traj_length": _HIST + """
            SELECT id, round(sum(6371000.0 * sqrt(dx*dx + dy*dy)), 0) AS traj_m
            FROM (
              SELECT id,
                radians(lon7/1e7 - plon7/1e7)
                  * cos(radians((lat7/1e7 + plat7/1e7) / 2.0)) AS dx,
                radians(lat7/1e7 - plat7/1e7) AS dy
              FROM (
                SELECT id, lon7, lat7,
                       lag(lon7) OVER w AS plon7, lag(lat7) OVER w AS plat7
                FROM geo WHERE visible
                WINDOW w AS (PARTITION BY id ORDER BY version))
              WHERE plon7 IS NOT NULL)
            GROUP BY 1
        """,
        "geofence_transitions": _geofence_oracle(),
        "stay_points": """
            -- same equirectangular hop distance (explicit products, not
            -- pow), same (sec, event_id) window order, exact integer
            -- centroid averages
            WITH pts AS (
              SELECT user_id, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     ((event_id*1103515245) % 3600000000) - 1800000000
                       AS lon7,
                     ((event_id*1234567891) % 1700000000) - 850000000
                       AS lat7
              FROM events),
            lagd AS (
              SELECT *, lag(lon7 * 1e-7) OVER w AS plon,
                        lag(lat7 * 1e-7) OVER w AS plat
              FROM pts
              WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
            segd AS (
              SELECT *, CAST(sum(CASE WHEN plon IS NULL OR
                  6371000.0 * sqrt(
                    (radians((lon7 * 1e-7) - plon)
                       * cos(radians(((lat7 * 1e-7) + plat) / 2.0)))
                    * (radians((lon7 * 1e-7) - plon)
                       * cos(radians(((lat7 * 1e-7) + plat) / 2.0)))
                    + radians((lat7 * 1e-7) - plat)
                      * radians((lat7 * 1e-7) - plat)) > 5000000.0
                  THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY sec, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
              FROM lagd)
            SELECT user_id, seg, count(*) AS n_pts,
                   CAST(max(sec) - min(sec) AS BIGINT) AS dwell_s,
                   round(avg(lon7)/10000000.0, 4) AS clon,
                   round(avg(lat7)/10000000.0, 4) AS clat
            FROM segd GROUP BY 1, 2
            HAVING max(sec) - min(sec) >= 3600 AND count(*) >= 3
        """,
        "zonal_sum_latband": """
            SELECT (lat7 + 850000000) // 100000000 AS zone,
                   count(*) AS cnt, round(sum(value), 2) AS sum_val
            FROM (
              SELECT ((event_id*1234567891) % 1700000000) - 850000000 AS lat7,
                     value
              FROM events)
            GROUP BY 1
        """,
        "way_snapshot_length": """
            WITH ded AS (
              SELECT event_id, user_id, sec FROM (
                SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                       row_number() OVER (
                         PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                         ORDER BY event_id) AS rn
                FROM events) WHERE rn = 1),
            ev AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                       AS urn
              FROM ded),
            nodes AS (
              SELECT user_id, urn % 3 AS j, user_id*10 + (urn % 3) AS node_id,
                     sec,
                     row_number() OVER (PARTITION BY user_id, urn % 3
                                        ORDER BY sec) AS k
              FROM ev),
            wsec AS (
              SELECT user_id, max(fs) AS way_sec FROM (
                SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
              GROUP BY 1),
            grid AS (SELECT unnest(""" + _TS_LIST + """) AS ts),
            nasof AS (
              SELECT g.ts, n.user_id, n.j, n.node_id, max(n.k) AS k
              FROM nodes n JOIN grid g ON n.sec <= g.ts
              GROUP BY 1, 2, 3, 4),
            pos AS (
              SELECT ts, user_id, j,
                (((node_id*1103515245 + k*1000003) % 3600000000)
                  - 1800000000) * 1e-7 AS lon,
                (((node_id*1234567891 + k*999983) % 1700000000)
                  - 850000000) * 1e-7 AS lat
              FROM nasof),
            pv AS (
              SELECT ts, user_id,
                max(CASE WHEN j = 0 THEN lon END) AS lon0,
                max(CASE WHEN j = 0 THEN lat END) AS lat0,
                max(CASE WHEN j = 1 THEN lon END) AS lon1,
                max(CASE WHEN j = 1 THEN lat END) AS lat1,
                max(CASE WHEN j = 2 THEN lon END) AS lon2,
                max(CASE WHEN j = 2 THEN lat END) AS lat2
              FROM pos GROUP BY 1, 2),
            lens AS (
              SELECT pv.ts, pv.user_id,
                6371000.0 * sqrt(dx1*dx1 + dy1*dy1)
                + 6371000.0 * sqrt(dx2*dx2 + dy2*dy2) AS len_m
              FROM (
                SELECT ts, user_id,
                  radians(lon1 - lon0)
                    * cos(radians((lat0 + lat1) / 2.0)) AS dx1,
                  radians(lat1 - lat0) AS dy1,
                  radians(lon2 - lon1)
                    * cos(radians((lat1 + lat2) / 2.0)) AS dx2,
                  radians(lat2 - lat1) AS dy2
                FROM pv) d
              JOIN pv ON pv.ts = d.ts AND pv.user_id = d.user_id
              JOIN wsec ON wsec.user_id = pv.user_id
              WHERE wsec.way_sec <= pv.ts)
            SELECT ts, count(*) AS cnt, round(sum(len_m), 0) AS total_len_m
            FROM lens GROUP BY 1
        """,
        "way_polygon_clip": """
            WITH ded AS (
              SELECT event_id, user_id, sec FROM (
                SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                       row_number() OVER (
                         PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                         ORDER BY event_id) AS rn
                FROM events) WHERE rn = 1),
            ev AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                       AS urn
              FROM ded),
            nodes AS (
              SELECT user_id, urn % 3 AS j, user_id*10 + (urn % 3) AS node_id,
                     sec,
                     row_number() OVER (PARTITION BY user_id, urn % 3
                                        ORDER BY sec) AS k
              FROM ev),
            wsec AS (
              SELECT user_id, max(fs) AS way_sec FROM (
                SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
              GROUP BY 1),
            grid AS (SELECT unnest(""" + _TS_LIST + """) AS ts),
            nasof AS (
              SELECT g.ts, n.user_id, n.j, n.node_id, max(n.k) AS k
              FROM nodes n JOIN grid g ON n.sec <= g.ts
              GROUP BY 1, 2, 3, 4),
            pos AS (
              SELECT ts, user_id, j,
                (((node_id*1103515245 + k*1000003) % 3600000000)
                  - 1800000000) * 1e-7 AS lon,
                (((node_id*1234567891 + k*999983) % 1700000000)
                  - 850000000) * 1e-7 AS lat
              FROM nasof),
            pv AS (
              SELECT ts, user_id,
                max(CASE WHEN j = 0 THEN lon END) AS lon0,
                max(CASE WHEN j = 0 THEN lat END) AS lat0,
                max(CASE WHEN j = 1 THEN lon END) AS lon1,
                max(CASE WHEN j = 1 THEN lat END) AS lat1,
                max(CASE WHEN j = 2 THEN lon END) AS lon2,
                max(CASE WHEN j = 2 THEN lat END) AS lat2
              FROM pos JOIN wsec USING (user_id)
              WHERE wsec.way_sec <= pos.ts
              GROUP BY 1, 2),
            seg AS (
              SELECT ts, user_id, lon0 AS x0, lat0 AS y0,
                     lon1 AS x1, lat1 AS y1 FROM pv
              UNION ALL
              SELECT ts, user_id, lon1, lat1, lon2, lat2 FROM pv),
            -- Liang-Barsky param window of each segment vs the clip rect
            win AS (
              SELECT ts, user_id, x0, y0, x1, y1,
                greatest(0.0,
                  CASE WHEN x1 = x0 THEN
                    (CASE WHEN x0 >= {W} AND x0 <= {E} THEN 0.0 ELSE 1e30 END)
                  ELSE least(({W} - x0)/(x1 - x0), ({E} - x0)/(x1 - x0)) END,
                  CASE WHEN y1 = y0 THEN
                    (CASE WHEN y0 >= {S} AND y0 <= {N} THEN 0.0 ELSE 1e30 END)
                  ELSE least(({S} - y0)/(y1 - y0), ({N} - y0)/(y1 - y0)) END
                ) AS t0,
                least(1.0,
                  CASE WHEN x1 = x0 THEN
                    (CASE WHEN x0 >= {W} AND x0 <= {E} THEN 1.0 ELSE -1e30 END)
                  ELSE greatest(({W} - x0)/(x1 - x0), ({E} - x0)/(x1 - x0)) END,
                  CASE WHEN y1 = y0 THEN
                    (CASE WHEN y0 >= {S} AND y0 <= {N} THEN 1.0 ELSE -1e30 END)
                  ELSE greatest(({S} - y0)/(y1 - y0), ({N} - y0)/(y1 - y0)) END
                ) AS t1
              FROM seg),
            cl AS (
              SELECT ts, user_id,
                x0 + (x1 - x0)*t0 AS ax, y0 + (y1 - y0)*t0 AS ay,
                x0 + (x1 - x0)*t1 AS bx, y0 + (y1 - y0)*t1 AS "by"
              FROM win WHERE t1 > t0),
            lens AS (
              SELECT ts, user_id,
                6371000.0 * sqrt(
                  pow(radians(bx - ax) * cos(radians((ay + "by")/2.0)), 2)
                  + pow(radians("by" - ay), 2)) AS len_m
              FROM cl)
            SELECT ts, count(DISTINCT user_id) AS cnt,
                   round(sum(len_m), 0) AS clip_len_m
            FROM lens GROUP BY 1
        """.replace("{W}", repr(_CLIP_RECT[0])).replace(
            "{S}", repr(_CLIP_RECT[1])
        ).replace("{E}", repr(_CLIP_RECT[2])).replace(
            "{N}", repr(_CLIP_RECT[3])
        ),
        "way_length_by_region": _way_region_oracle(),
        "contrib_length_by_region": _contrib_region_oracle(),
        "relation_snapshot_length": """
            WITH ded AS (
              SELECT event_id, user_id, sec FROM (
                SELECT event_id, user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                       row_number() OVER (
                         PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
                         ORDER BY event_id) AS rn
                FROM events) WHERE rn = 1),
            ev AS (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sec)
                       AS urn
              FROM ded),
            nodes AS (
              SELECT user_id, urn % 3 AS j, user_id*10 + (urn % 3) AS node_id,
                     sec,
                     row_number() OVER (PARTITION BY user_id, urn % 3
                                        ORDER BY sec) AS k
              FROM ev),
            wsec AS (
              SELECT user_id, max(fs) AS way_sec FROM (
                SELECT user_id, j, min(sec) AS fs FROM nodes GROUP BY 1, 2)
              GROUP BY 1),
            grid AS (SELECT unnest(""" + _TS_LIST + """) AS ts),
            nasof AS (
              SELECT g.ts, n.user_id, n.j, n.node_id, max(n.k) AS k
              FROM nodes n JOIN grid g ON n.sec <= g.ts
              GROUP BY 1, 2, 3, 4),
            pos AS (
              SELECT ts, user_id, j,
                (((node_id*1103515245 + k*1000003) % 3600000000)
                  - 1800000000) * 1e-7 AS lon,
                (((node_id*1234567891 + k*999983) % 1700000000)
                  - 850000000) * 1e-7 AS lat
              FROM nasof),
            pv AS (
              SELECT ts, user_id,
                max(CASE WHEN j = 0 THEN lon END) AS lon0,
                max(CASE WHEN j = 0 THEN lat END) AS lat0,
                max(CASE WHEN j = 1 THEN lon END) AS lon1,
                max(CASE WHEN j = 1 THEN lat END) AS lat1,
                max(CASE WHEN j = 2 THEN lon END) AS lon2,
                max(CASE WHEN j = 2 THEN lat END) AS lat2
              FROM pos GROUP BY 1, 2),
            lens AS (
              SELECT pv.ts, pv.user_id,
                6371000.0 * sqrt(dx1*dx1 + dy1*dy1)
                + 6371000.0 * sqrt(dx2*dx2 + dy2*dy2) AS len_m
              FROM (
                SELECT ts, user_id,
                  radians(lon1 - lon0)
                    * cos(radians((lat0 + lat1) / 2.0)) AS dx1,
                  radians(lat1 - lat0) AS dy1,
                  radians(lon2 - lon1)
                    * cos(radians((lat1 + lat2) / 2.0)) AS dx2,
                  radians(lat2 - lat1) AS dy2
                FROM pv) d
              JOIN pv ON pv.ts = d.ts AND pv.user_id = d.user_id
              JOIN wsec ON wsec.user_id = pv.user_id
              WHERE wsec.way_sec <= pv.ts)
            SELECT ts, count(*) AS cnt, round(sum(len_m), 0) AS total_len_m
            FROM lens GROUP BY 1
        """,
        "snapshot_polygon": _HIST + f""",
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM (SELECT *, lon7*1e-7 AS px, lat7*1e-7 AS py FROM geo) v
              JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND (80.0000013 - -100.0000017) * (py - -50.0000031)
                    - (-60.0000029 - -50.0000031) * (px - -100.0000017) > 0
                AND (120.0000019 - 80.0000013) * (py - -60.0000029)
                    - (50.0000023 - -60.0000029) * (px - 80.0000013) > 0
                AND (-80.0000011 - 120.0000019) * (py - 50.0000023)
                    - (60.0000037 - 50.0000023) * (px - 120.0000019) > 0
                AND (-100.0000017 - -80.0000011) * (py - 60.0000037)
                    - (-50.0000031 - 60.0000037) * (px - -80.0000011) > 0
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "snapshot_multi_aoi": _HIST + """,
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM (SELECT *, lon7*1e-7 AS px, lat7*1e-7 AS py FROM geo) v
              JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND ((px > -170.00000005 AND px < -60.00000005)
                     OR (px > 50.00000005 AND px < 160.00000005))
                AND py > -5.00000005 AND py < 45.00000005
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "snapshot_tag_regex": _HIST + """,
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM hist v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND regexp_matches(v.event_type, '^(click|view)$')
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "snapshot_tag_any": _HIST + """,
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM hist v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND (v.event_type = 'click' OR v.event_type = 'signup')
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "polygon_clip_area": f"""
            WITH sq AS (
              SELECT user_id AS id,
                (((user_id*1103515245) % 3400000000) - 1700000000) * 1e-7
                  AS x0,
                (((user_id*1234567891) % 1500000000) - 750000000) * 1e-7
                  AS y0
              FROM (SELECT DISTINCT user_id FROM events)),
            cl AS (
              SELECT id,
                greatest(x0, {_CLIP_RECT[0]}) AS w,
                greatest(y0, {_CLIP_RECT[1]}) AS s,
                least(x0 + 0.1, {_CLIP_RECT[2]}) AS e,
                least(y0 + 0.1, {_CLIP_RECT[3]}) AS n
              FROM sq)
            SELECT id, round(abs(t0 + t1 + t2 + t3 + t4)
                             * 6371000.0 * 6371000.0 / 2.0 / 1e6, 3)
                     AS clip_km2
            FROM (
              SELECT id,
                (radians(e) - radians(w)) * sin(radians(s)) AS t0,
                (radians(w) - radians(e)) * sin(radians(n)) AS t1,
                (radians(w) - radians(e)) * sin(radians(n)) AS t2,
                (radians(w) - radians(w)) * sin(radians(s)) AS t3,
                (radians(e) - radians(w)) * sin(radians(s)) AS t4
              FROM cl WHERE w < e AND s < n)
        """,
        "snapshot_by_ts_and_tag": _HIST + """,
            tg AS (SELECT unnest(['click','error','purchase','signup','view'])
                     AS etype),
            m AS (
              SELECT grid.ts AS ts, v.event_type AS etype, count(*) AS c
              FROM hist v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible GROUP BY 1, 2)
            SELECT grid.ts AS ts, tg.etype AS etype, coalesce(m.c, 0) AS cnt
            FROM grid CROSS JOIN tg
            LEFT JOIN m ON m.ts = grid.ts AND m.etype = tg.etype
        """,
        "entity_history": _HIST + f""",
            s AS ({contrib_states}),
            e AS (
              SELECT id, valid_from AS t,
                CASE
                  WHEN visible AND coalesce(lv, false) = false THEN 1
                  WHEN NOT visible AND lv THEN 1
                  WHEN visible AND lv THEN
                    (CASE WHEN event_type <> let THEN 1 ELSE 0 END)
                    + (CASE WHEN (version-1)//3 <> lg THEN 1 ELSE 0 END)
                  ELSE NULL END AS ntypes
              FROM s
              WHERE valid_from >= 1704067200 AND valid_from < 1707091200)
            SELECT id, count(ntypes) AS n_contribs,
                   CAST(sum(ntypes) AS BIGINT) AS n_types,
                   min(CASE WHEN ntypes IS NOT NULL THEN t END) AS first_ts,
                   max(CASE WHEN ntypes IS NOT NULL THEN t END) AS last_ts
            FROM e GROUP BY 1
            HAVING count(ntypes) > 0
        """,
        "contrib_uniq_contributors": _HIST + f""",
            s AS ({contrib_states})
            SELECT contrib_type, count(DISTINCT id) AS uniq_contributors
            FROM (
              SELECT 'CREATION' AS contrib_type, id FROM s
               WHERE visible AND coalesce(lv, false) = false
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'DELETION', id FROM s
               WHERE NOT visible AND lv
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'TAG_CHANGE', id FROM s
               WHERE visible AND lv AND event_type <> let
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'GEOMETRY_CHANGE', id FROM s
               WHERE visible AND lv AND (version-1)//3 <> lg
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
            ) GROUP BY 1
        """,
        "contrib_uniq_approx": _HIST + f""",
            s AS ({contrib_states})
            SELECT contrib_type, count(DISTINCT id) AS uniq_contributors,
                   true AS within_5pct
            FROM (
              SELECT 'CREATION' AS contrib_type, id FROM s
               WHERE visible AND coalesce(lv, false) = false
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'DELETION', id FROM s
               WHERE NOT visible AND lv
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'TAG_CHANGE', id FROM s
               WHERE visible AND lv AND event_type <> let
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
              UNION ALL
              SELECT 'GEOMETRY_CHANGE', id FROM s
               WHERE visible AND lv AND (version-1)//3 <> lg
                 AND valid_from >= {CONTRIB_INTERVAL[0]}
                 AND valid_from <  {CONTRIB_INTERVAL[1]}
            ) GROUP BY 1
        """,
        "ring_area": """
            SELECT id, round(abs(t0 + t1 + t2 + t3)
                             * 6371000.0 * 6371000.0 / 2.0 / 1e6, 3)
                     AS area_km2
            FROM (
              SELECT id,
                (radians(lon2) - radians(lon0)) * sin(radians(lat1)) AS t0,
                (radians(lon0) - radians(lon1)) * sin(radians(lat2)) AS t1,
                (radians(lon0) - radians(lon2)) * sin(radians(lat0)) AS t2,
                (radians(lon1) - radians(lon0)) * sin(radians(lat0)) AS t3
              FROM (
                SELECT user_id AS id,
                  (((user_id*1103515245 + 0*1000003) % 3600000000)
                    - 1800000000) * 1e-7 AS lon0,
                  (((user_id*1234567891 + 0*999983) % 1700000000)
                    - 850000000) * 1e-7 AS lat0,
                  (((user_id*1103515245 + 1*1000003) % 3600000000)
                    - 1800000000) * 1e-7 AS lon1,
                  (((user_id*1234567891 + 1*999983) % 1700000000)
                    - 850000000) * 1e-7 AS lat1,
                  (((user_id*1103515245 + 2*1000003) % 3600000000)
                    - 1800000000) * 1e-7 AS lon2,
                  (((user_id*1234567891 + 2*999983) % 1700000000)
                    - 850000000) * 1e-7 AS lat2
                FROM (SELECT DISTINCT user_id FROM events)))
        """,
        "agg_by_geometry": """
            WITH deg AS (
              SELECT (((event_id*1103515245) % 3600000000) - 1800000000)
                       * 1e-7 AS lon,
                     (((event_id*1234567891) % 1700000000) - 850000000)
                       * 1e-7 AS lat,
                     value
              FROM events),
            m AS (
              SELECT 'west' AS region, value FROM deg
                WHERE lon >= -180 AND lon <= 0 AND lat >= -85 AND lat <= 85
              UNION ALL
              SELECT 'east', value FROM deg
                WHERE lon >= 0 AND lon <= 180 AND lat >= -85 AND lat <= 85
              UNION ALL
              SELECT 'tropics', value FROM deg
                WHERE lon >= -180 AND lon <= 180
                  AND lat >= -23.5 AND lat <= 23.5)
            SELECT region, count(*) AS cnt, round(sum(value), 2) AS sv
            FROM m GROUP BY 1
        """,
        "knn_events": """
            SELECT event_id FROM (
              SELECT event_id, 6371000.0 * sqrt(dx*dx + dy*dy) AS dist
              FROM (
                SELECT event_id,
                  radians(lon - 10.0)
                    * cos(radians((20.0 + lat) / 2.0)) AS dx,
                  radians(lat - 20.0) AS dy
                FROM (
                  SELECT event_id,
                    (((event_id*1103515245) % 3600000000) - 1800000000)
                      * 1e-7 AS lon,
                    (((event_id*1234567891) % 1700000000) - 850000000)
                      * 1e-7 AS lat
                  FROM events)))
            ORDER BY dist, event_id LIMIT 25
        """,
        "knn_batch_events": """
            WITH deg AS (
              SELECT event_id,
                (((event_id*1103515245) % 3600000000) - 1800000000)
                  * 1e-7 AS lon,
                (((event_id*1234567891) % 1700000000) - 850000000)
                  * 1e-7 AS lat
              FROM events),
            qs AS (SELECT * FROM (VALUES
              ('a', 10.0, 20.0), ('b', -120.0, -40.0), ('c', 30.0, 82.0))
              q(qid, qlon, qlat)),
            d AS (
              SELECT qs.qid, deg.event_id,
                6371000.0 * sqrt(
                  pow(radians(deg.lon - qs.qlon)
                      * cos(radians((qs.qlat + deg.lat) / 2.0)), 2)
                  + pow(radians(deg.lat - qs.qlat), 2)) AS dist,
                row_number() OVER (PARTITION BY qs.qid
                                   ORDER BY 6371000.0 * sqrt(
                  pow(radians(deg.lon - qs.qlon)
                      * cos(radians((qs.qlat + deg.lat) / 2.0)), 2)
                  + pow(radians(deg.lat - qs.qlat), 2)), deg.event_id)
                  AS rn
              FROM deg CROSS JOIN qs)
            SELECT qid, event_id FROM d WHERE rn <= 25
        """,
        "dissolve_rect": _DISSOLVE_SWEEP_SQL,
        "dissolve_rings": _DISSOLVE_SWEEP_SQL,
        "zonal_rect": """
            WITH deg AS (
              SELECT (((event_id*1103515245) % 3600000000) - 1800000000)
                       * 1e-7 AS lon,
                     (((event_id*1234567891) % 1700000000) - 850000000)
                       * 1e-7 AS lat,
                     value
              FROM events),
            m AS (
              SELECT 'nw' AS zone, value FROM deg
                WHERE lon >= -180 AND lon <= -0.15
                  AND lat >= 0.15 AND lat <= 85
              UNION ALL
              SELECT 'se', value FROM deg
                WHERE lon >= 0.15 AND lon <= 180
                  AND lat >= -85 AND lat <= -0.15
              UNION ALL
              SELECT 'band', value FROM deg
                WHERE lon >= -90 AND lon <= 90
                  AND lat >= -30 AND lat <= 30)
            SELECT zone, count(*) AS cnt, round(sum(value), 2) AS sv
            FROM m GROUP BY 1
        """,
        "multipolygon_area": """
            SELECT id, round(abs(t0 + t1 + t2 + t3 + t4)
                             * 6371000.0 * 6371000.0 / 2.0 / 1e6, 3)
                     AS area_km2
            FROM (
              SELECT id,
                (lon2 - lon0) * sin(lat1) AS t0,
                (lon3 - lon1) * sin(lat2) AS t1,
                (lon0 - lon2) * sin(lat3) AS t2,
                (lon0 - lon3) * sin(lat0) AS t3,
                (lon1 - lon0) * sin(lat0) AS t4
              FROM (
                SELECT user_id AS id,
                  radians(blon * 1e-7) AS lon0, radians(blat * 1e-7) AS lat0,
                  radians((blon + 1000000) * 1e-7) AS lon1,
                  radians(blat * 1e-7) AS lat1,
                  radians((blon + 1000000) * 1e-7) AS lon2,
                  radians((blat + 1000000) * 1e-7) AS lat2,
                  radians(blon * 1e-7) AS lon3,
                  radians((blat + 1000000) * 1e-7) AS lat3
                FROM (
                  SELECT DISTINCT user_id,
                    ((user_id*1103515245) % 3400000000) - 1700000000 AS blon,
                    ((user_id*1234567891) % 1500000000) - 750000000 AS blat
                  FROM events)))
        """,
        "dedup_embedding": """
            WITH dup AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 10000, embedding::DOUBLE[] FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM dup a JOIN dup b ON a.vec_id < b.vec_id
            WHERE list_inner_product(a.v, b.v)
                  / (sqrt(list_inner_product(a.v, a.v))
                     * sqrt(list_inner_product(b.v, b.v))) >= 0.999999
        """,
        "dedup_exact": """
            WITH dup AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000, text FROM documents)
            SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
                   count(*) AS dup_count
            FROM dup GROUP BY 1
        """,
        "dedup_substring": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 2000,
                     array_to_string(string_split(text, ' ')[1:30], ' ')
                       || ' tail' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id < 50),
            words AS (SELECT doc_id, string_split(text, ' ') AS w
                      FROM corpus),
            hashes AS (
              SELECT doc_id, p,
                     md5(array_to_string(w[p:p+7], ' ')) AS h
              FROM words, UNNEST(generate_series(1, len(w) - 7)) AS t(p)
              WHERE len(w) >= 8),
            hn AS (SELECT doc_id, max(p) AS m FROM hashes GROUP BY 1),
            mwin AS (
              SELECT h1.doc_id AS doc_id, h1.p AS i, min(h2.h) AS fp
              FROM hashes h1
              JOIN hn ON hn.doc_id = h1.doc_id
              JOIN hashes h2 ON h2.doc_id = h1.doc_id
                            AND h2.p BETWEEN h1.p AND h1.p + 3
              WHERE h1.p <= greatest(hn.m - 3, 1)
              GROUP BY 1, 2),
            fps AS (SELECT DISTINCT doc_id, fp FROM mwin),
            dup AS (SELECT fp FROM fps GROUP BY 1 HAVING count(*) >= 2),
            per AS (
              SELECT f.doc_id, count(*) AS n_fp,
                     CAST(sum(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS dup_fp
              FROM fps f LEFT JOIN dup d USING (fp) GROUP BY 1)
            SELECT c.doc_id,
                   CAST(coalesce(n_fp, 0) AS BIGINT) AS n_fp,
                   CAST(coalesce(dup_fp, 0) AS BIGINT) AS dup_fp,
                   round(CASE WHEN coalesce(n_fp, 0) > 0
                              THEN CAST(dup_fp AS DOUBLE) / n_fp
                              ELSE 0.0 END, 6) AS dup_frac
            FROM corpus c LEFT JOIN per ON per.doc_id = c.doc_id
        """,
        "dedup_minhash": """
            WITH dup AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000, text FROM documents),
            words AS (SELECT doc_id, text, string_split(text, ' ') w FROM dup),
            sh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(w) < 3 THEN text
                     ELSE concat_ws(' ', w[i], w[i+1], w[i+2]) END AS s
              FROM words,
                UNNEST(CASE WHEN len(w) < 3 THEN [1]
                       ELSE generate_series(1, len(w) - 2) END) AS t(i)),
            mh AS (
              SELECT doc_id, j, min(md5(s || ':' || j)) AS h
              FROM sh, UNNEST(generate_series(0, 15)) AS u(j)
              GROUP BY 1, 2),
            bands AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY j)) AS sig
              FROM mh GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            jac AS (
              SELECT ida, idb,
                (SELECT count(*) FROM sh x JOIN sh y ON x.s = y.s
                  WHERE x.doc_id = cand.ida AND y.doc_id = cand.idb) AS inter,
                (SELECT count(DISTINCT s) FROM sh z
                  WHERE z.doc_id IN (cand.ida, cand.idb)) AS uni
              FROM cand)
            SELECT ida AS id_a, idb AS id_b,
                   round(inter / CAST(uni AS DOUBLE), 6) AS jaccard
            FROM jac WHERE inter / CAST(uni AS DOUBLE) >= 0.5
        """,
        "dedup_incremental": """
            -- delta-vs-corpus dedup replay: exact fingerprint join plus
            -- the SAME md5 MinHash/band pipeline as dedup_minhash, but
            -- candidates come from delta-bands × corpus-bands (never
            -- corpus × corpus); verdict precedence exact > near; match =
            -- LOWEST corpus id; jaccard reported for that id
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
            delta AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id + 100000, text FROM corpus WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 200000, text || ' trailing probe tokens'
              FROM corpus WHERE doc_id % 7 = 0),
            cw AS (SELECT doc_id, text, string_split(text, ' ') w FROM corpus),
            dw AS (SELECT doc_id, text, string_split(text, ' ') w FROM delta),
            csh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(w) < 3 THEN text
                     ELSE concat_ws(' ', w[i], w[i+1], w[i+2]) END AS s
              FROM cw,
                UNNEST(CASE WHEN len(w) < 3 THEN [1]
                       ELSE generate_series(1, len(w) - 2) END) AS t(i)),
            dsh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(w) < 3 THEN text
                     ELSE concat_ws(' ', w[i], w[i+1], w[i+2]) END AS s
              FROM dw,
                UNNEST(CASE WHEN len(w) < 3 THEN [1]
                       ELSE generate_series(1, len(w) - 2) END) AS t(i)),
            cmh AS (
              SELECT doc_id, j, min(md5(s || ':' || j)) AS h
              FROM csh, UNNEST(generate_series(0, 15)) AS u(j)
              GROUP BY 1, 2),
            dmh AS (
              SELECT doc_id, j, min(md5(s || ':' || j)) AS h
              FROM dsh, UNNEST(generate_series(0, 15)) AS u(j)
              GROUP BY 1, 2),
            cbands AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY j)) AS sig
              FROM cmh GROUP BY 1, 2),
            dbands AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY j)) AS sig
              FROM dmh GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT d.doc_id AS did, c.doc_id AS cid
              FROM dbands d JOIN cbands c
                ON d.band = c.band AND d.sig = c.sig),
            jac AS (
              SELECT did, cid,
                (SELECT count(*) FROM dsh x JOIN csh y ON x.s = y.s
                  WHERE x.doc_id = cand.did AND y.doc_id = cand.cid) AS inter,
                (SELECT count(DISTINCT s) FROM dsh WHERE doc_id = cand.did)
                + (SELECT count(DISTINCT s) FROM csh WHERE doc_id = cand.cid)
                - (SELECT count(*) FROM dsh x JOIN csh y ON x.s = y.s
                    WHERE x.doc_id = cand.did AND y.doc_id = cand.cid) AS uni
              FROM cand),
            near AS (
              SELECT did, min(cid) AS near_id,
                     (array_agg(round(inter / CAST(uni AS DOUBLE), 6)
                                ORDER BY cid))[1] AS near_jac
              FROM jac WHERE inter / CAST(uni AS DOUBLE) >= 0.5
              GROUP BY did),
            cfp AS (
              SELECT md5(text) AS fp, min(doc_id) AS exact_id
              FROM corpus GROUP BY 1),
            ex AS (
              SELECT d.doc_id AS did, cfp.exact_id
              FROM (SELECT doc_id, md5(text) AS fp FROM delta) d
              LEFT JOIN cfp USING (fp))
            SELECT d.doc_id,
                   CASE WHEN ex.exact_id IS NOT NULL THEN 'exact'
                        WHEN near.near_id IS NOT NULL THEN 'near'
                        ELSE 'unique' END AS verdict,
                   coalesce(ex.exact_id, near.near_id) AS match_id,
                   CASE WHEN ex.exact_id IS NOT NULL THEN 1.0
                        ELSE near.near_jac END AS jaccard
            FROM delta d
            LEFT JOIN ex ON ex.did = d.doc_id
            LEFT JOIN near ON near.did = d.doc_id
        """,
        "export_shards": _EXPORT_SHARDS_ORACLE,
        # streaming exactly-once export: merged per-batch manifests must
        # equal the one-shot batch manifest — the SAME oracle
        "stream_export_shards": _EXPORT_SHARDS_ORACLE,
        "cms_user_counts": f"""
            -- Count-Min replay: same double-hash positions (h1 + j*h2
            -- mod 256, 48-bit md5 halves of the user_id string), same
            -- k*m counter table, same min-probe
            WITH e AS (
              SELECT user_id, CAST(user_id AS VARCHAR) AS key FROM events),
            h AS (
              SELECT user_id,
                CAST({_hex12_int_sql("substr(md5(key || ':c1'), 1, 12)")}
                  AS BIGINT) AS h1,
                CAST({_hex12_int_sql("substr(md5(key || ':c2'), 1, 12)")}
                  AS BIGINT) AS h2
              FROM (SELECT DISTINCT user_id, key FROM e)),
            ep AS (
              SELECT j AS row, (h.h1 + j * h.h2) % 256 AS pos
              FROM e JOIN h USING (user_id), UNNEST([0, 1, 2]) AS t(j)),
            tab AS (
              SELECT row, pos, count(*) AS cnt FROM ep GROUP BY 1, 2),
            dp AS (
              SELECT user_id, j AS row, (h1 + j * h2) % 256 AS pos
              FROM h, UNNEST([0, 1, 2]) AS t(j)),
            est AS (
              SELECT dp.user_id, min(coalesce(tab.cnt, 0)) AS est
              FROM dp LEFT JOIN tab USING (row, pos)
              GROUP BY 1),
            ex AS (
              SELECT user_id, count(*) AS exact FROM events GROUP BY 1)
            SELECT user_id, CAST(est AS BIGINT) AS est,
                   CAST(exact AS BIGINT) AS exact
            FROM est JOIN ex USING (user_id)
        """,
        "bloom_prefilter": f"""
            -- Bloom membership replay as position-set logic: a delta key
            -- is a candidate iff ALL of its k=3 double-hash positions
            -- (h1 + i*h2 mod 4096, 48-bit md5 halves) appear among the
            -- corpus's set positions — exactly the bitmap test, FPs and
            -- all, without bit twiddling
            WITH corpus AS (
              SELECT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
            delta AS (
              SELECT doc_id, md5(text) AS fp
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id + 100000, md5(text)
              FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0),
            ch AS (
              SELECT DISTINCT fp,
                CAST({_hex12_int_sql("substr(md5(fp || ':b1'), 1, 12)")}
                  AS BIGINT) AS h1,
                CAST({_hex12_int_sql("substr(md5(fp || ':b2'), 1, 12)")}
                  AS BIGINT) AS h2
              FROM corpus),
            cp AS (
              SELECT DISTINCT (h1 + i * h2) % 4096 AS pos
              FROM ch, UNNEST([0, 1, 2]) AS t(i)),
            dh AS (
              SELECT doc_id, fp,
                CAST({_hex12_int_sql("substr(md5(fp || ':b1'), 1, 12)")}
                  AS BIGINT) AS h1,
                CAST({_hex12_int_sql("substr(md5(fp || ':b2'), 1, 12)")}
                  AS BIGINT) AS h2
              FROM delta),
            dp AS (
              SELECT doc_id, fp, (h1 + i * h2) % 4096 AS pos
              FROM dh, UNNEST([0, 1, 2]) AS t(i)),
            cand AS (
              SELECT doc_id, fp,
                     bool_and(pos IN (SELECT pos FROM cp))
                       AS bloom_candidate
              FROM dp GROUP BY 1, 2)
            SELECT doc_id, bloom_candidate,
                   fp IN (SELECT fp FROM corpus) AS exact_match
            FROM cand
        """,
        "contributor_accretion": """
            -- new-vs-returning contributors per 30-day epoch bucket
            WITH e AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 2592000 AS bucket
              FROM events),
            f AS (SELECT user_id, min(bucket) AS fb FROM e GROUP BY 1),
            a AS (SELECT DISTINCT bucket, user_id FROM e)
            SELECT a.bucket,
                   CAST(count(*) AS BIGINT) AS active,
                   CAST(sum(CASE WHEN f.fb = a.bucket THEN 1 ELSE 0 END)
                     AS BIGINT) AS new_users,
                   CAST(sum(CASE WHEN f.fb < a.bucket THEN 1 ELSE 0 END)
                     AS BIGINT) AS returning
            FROM a JOIN f USING (user_id)
            GROUP BY 1
        """,
        "funnel_conversion": """
            -- session funnel replay: same (sec, event_id) window order,
            -- same 30-min gap rule, strict click-before-purchase
            WITH e AS (
              SELECT user_id, event_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events),
            d AS (
              SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
                             THEN 1 ELSE 0 END AS new_sess
              FROM (
                SELECT e.*, lag(sec) OVER (
                  PARTITION BY user_id ORDER BY sec, event_id) AS prev
                FROM e)),
            s AS (
              SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY sec, event_id
                ROWS UNBOUNDED PRECEDING) AS sess
              FROM d),
            ps AS (
              SELECT user_id, sess,
                     min(CASE WHEN event_type = 'click' THEN sec END) AS fc,
                     max(CASE WHEN event_type = 'purchase' THEN sec END)
                       AS lp
              FROM s GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS click_sessions,
                   CAST(sum(CASE WHEN fc IS NOT NULL AND lp > fc
                                 THEN 1 ELSE 0 END) AS BIGINT) AS converted
            FROM ps GROUP BY 1
        """,
        "pagerank": _pagerank_oracle(3),
        "vocab_stats": """
            -- per-source lexical profile: unnest tokens, two-level agg;
            -- HUGEINT sums cast back to BIGINT
            WITH t AS (
              SELECT source, u.tok AS tok
              FROM documents,
                   UNNEST(string_split(text, ' ')) AS u(tok)),
            pt AS (
              SELECT source, tok, count(*) AS n FROM t GROUP BY 1, 2)
            SELECT source,
                   CAST(sum(n) AS BIGINT) AS tokens,
                   CAST(count(*) AS BIGINT) AS types,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS hapax,
                   round(count(*) / CAST(sum(n) AS DOUBLE), 6)
                     AS type_token_ratio
            FROM pt GROUP BY 1
        """,
        "dedup_components": """
            -- MinHash-LSH pairs (same pipeline as dedup_minhash) closed
            -- into components by a recursive min-label closure; the engine
            -- side closes them with large-star/small-star
            WITH RECURSIVE dup AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000, text FROM documents),
            words AS (SELECT doc_id, text, string_split(text, ' ') w FROM dup),
            sh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(w) < 3 THEN text
                     ELSE concat_ws(' ', w[i], w[i+1], w[i+2]) END AS s
              FROM words,
                UNNEST(CASE WHEN len(w) < 3 THEN [1]
                       ELSE generate_series(1, len(w) - 2) END) AS t(i)),
            mh AS (
              SELECT doc_id, j, min(md5(s || ':' || j)) AS h
              FROM sh, UNNEST(generate_series(0, 15)) AS u(j)
              GROUP BY 1, 2),
            bands AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY j)) AS sig
              FROM mh GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            pairs AS (
              SELECT ida, idb FROM cand
              WHERE (SELECT count(*) FROM sh x JOIN sh y ON x.s = y.s
                      WHERE x.doc_id = cand.ida AND y.doc_id = cand.idb)
                    / CAST((SELECT count(DISTINCT s) FROM sh z
                            WHERE z.doc_id IN (cand.ida, cand.idb)) AS DOUBLE)
                    >= 0.5),
            sym AS (
              SELECT ida AS a, idb AS b FROM pairs
              UNION ALL SELECT idb, ida FROM pairs),
            reach(node, lab) AS (
              SELECT doc_id, doc_id FROM dup
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node)
            SELECT node AS doc_id, min(lab) AS component
            FROM reach GROUP BY 1
        """,
        "dedup_keep": """
            -- survivors of keep_canonical = docs whose component min-id
            -- is themselves (recursive closure over the same LSH pairs)
            WITH RECURSIVE dup AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL SELECT doc_id + 1000, text, source FROM documents),
            words AS (SELECT doc_id, text, string_split(text, ' ') w FROM dup),
            sh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(w) < 3 THEN text
                     ELSE concat_ws(' ', w[i], w[i+1], w[i+2]) END AS s
              FROM words,
                UNNEST(CASE WHEN len(w) < 3 THEN [1]
                       ELSE generate_series(1, len(w) - 2) END) AS t(i)),
            mh AS (
              SELECT doc_id, j, min(md5(s || ':' || j)) AS h
              FROM sh, UNNEST(generate_series(0, 15)) AS u(j)
              GROUP BY 1, 2),
            bands AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(h, '|' ORDER BY j)) AS sig
              FROM mh GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            pairs AS (
              SELECT ida, idb FROM cand
              WHERE (SELECT count(*) FROM sh x JOIN sh y ON x.s = y.s
                      WHERE x.doc_id = cand.ida AND y.doc_id = cand.idb)
                    / CAST((SELECT count(DISTINCT s) FROM sh z
                            WHERE z.doc_id IN (cand.ida, cand.idb)) AS DOUBLE)
                    >= 0.5),
            sym AS (
              SELECT ida AS a, idb AS b FROM pairs
              UNION ALL SELECT idb, ida FROM pairs),
            reach(node, lab) AS (
              SELECT doc_id, doc_id FROM dup
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node),
            comp AS (
              SELECT node AS doc_id, min(lab) AS component
              FROM reach GROUP BY 1)
            SELECT d.source,
                   count(*) AS n_kept,
                   CAST(sum(d.doc_id) AS BIGINT) AS id_sum
            FROM dup d JOIN comp c ON d.doc_id = c.doc_id
            WHERE c.component = c.doc_id
            GROUP BY 1
        """,
        "dedup_simhash": """
            -- SimHash mirror of ops/dedup.with_simhash (32-bit token-hash
            -- bit voting); blocking is EXACT (pigeonhole: hamming<=3 pairs
            -- share one of 4 blocks), so brute-force hamming<=3 pairs
            -- equal the engine's blocked result
            WITH dup AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000, text FROM documents),
            tok AS (
              SELECT doc_id, md5(t) AS h
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                    FROM dup)),
            votes AS (
              SELECT doc_id, j,
                sum(CASE WHEN
                  ((strpos('0123456789abcdef', substr(h, 8 - (j // 4), 1))
                    - 1) >> (j % 4)) % 2 = 1
                  THEN 1 ELSE -1 END) AS v
              FROM tok, UNNEST(generate_series(0, 31)) u(j)
              GROUP BY 1, 2),
            sh AS (
              SELECT doc_id,
                CAST(sum(CASE WHEN v > 0
                         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                     AS BIGINT) AS s
              FROM votes GROUP BY 1)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 3
        """,
        "snapshot_tag_set": _HIST + """,
            m AS (
              SELECT grid.ts AS ts, count(*) AS c
              FROM hist v JOIN grid
                ON v.valid_from <= grid.ts
               AND (v.valid_to IS NULL OR grid.ts < v.valid_to)
              WHERE v.visible
                AND v.event_type IN ('click', 'purchase')
              GROUP BY 1)
            SELECT grid.ts AS ts, coalesce(m.c, 0) AS cnt
            FROM grid LEFT JOIN m USING (ts)
        """,
        "quantile_sketch": """
            WITH ex AS (
              SELECT l_returnflag AS grp,
                     quantile_cont(l_extendedprice, 0.5) AS p50,
                     quantile_cont(l_extendedprice, 0.9) AS p90
              FROM lineitem GROUP BY 1),
            qs AS (SELECT unnest([0.5, 0.9]) AS q)
            SELECT grp, q,
                   round(CASE WHEN q = 0.5 THEN p50 ELSE p90 END, 4)
                     AS exact_p,
                   true AS within_2pct
            FROM ex CROSS JOIN qs
        """,
        "tile_quantiles": """
            -- exact per-tile medians at both zooms computed DIRECTLY from
            -- coordinates; n pins the digest cascade's weight totals,
            -- within_2pct pins the estimate accuracy
            WITH pts AS (
              SELECT ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000) - 850000000 AS lat7,
                     value
              FROM events
            ), lv AS (
              SELECT 4 AS zoom,
                     ((lat7 + 900000000) // 225000000) * 16
                       + ((lon7 + 1800000000) // 225000000) AS cell,
                     value FROM pts
              UNION ALL
              SELECT 2 AS zoom,
                     ((lat7 + 900000000) // 900000000) * 4
                       + ((lon7 + 1800000000) // 900000000) AS cell,
                     value FROM pts
            )
            SELECT zoom, cell, CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(value, 0.5), 4) AS exact_p,
                   true AS within_2pct
            FROM lv GROUP BY 1, 2
        """,
        "tile_uniques": """
            WITH pts AS (
              SELECT ((event_id*1103515245) % 3600000000) - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000) - 850000000 AS lat7,
                     user_id
              FROM events
            ), lv AS (
              SELECT 4 AS zoom,
                     ((lat7 + 900000000) // 225000000) * 16
                       + ((lon7 + 1800000000) // 225000000) AS cell,
                     user_id FROM pts
              UNION ALL
              SELECT 2 AS zoom,
                     ((lat7 + 900000000) // 900000000) * 4
                       + ((lon7 + 1800000000) // 900000000) AS cell,
                     user_id FROM pts
            )
            SELECT zoom, cell,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS uniq,
                   true AS within_5pct
            FROM lv GROUP BY 1, 2
        """,
        "embedding_covariance": f"""
            -- integer-exact quantized covariance: identical int64 sums
            -- in any summation order, identical IEEE derivation
            WITH RECURSIVE {_PCA_COV_CTES}
            SELECT i, j, cov FROM cov
        """,
        "pca_loadings": f"""
            -- full replay of ops/stats.power_iteration: 12 steps of
            -- C·v / ||C·v|| with round(·, 6) + 0.0 per element, strict
            -- sequential folds (list_reduce over list_zip products =
            -- _dot_seq), then eigval = round(vᵀCv, 6)
            WITH RECURSIVE {_PCA_COV_CTES},
            covm AS (
              SELECT list(cl ORDER BY i) AS m FROM (
                SELECT i, list(cov ORDER BY j) AS cl FROM cov GROUP BY i) t),
            pi(t, v) AS (
              SELECT 0, list_transform(range(64),
                          i -> CAST(CASE WHEN i = 0 THEN 1 ELSE 0 END
                                    AS DOUBLE))
              UNION ALL
              SELECT t+1,
                (SELECT list_transform(w, x -> round(x / sqrt(
                     list_reduce(list_transform(w, y -> y*y),
                                 (a,b) -> a+b)), 6) + 0.0)
                 FROM (SELECT list_transform(covm.m, r ->
                         list_reduce(list_transform(list_zip(r, pi.v),
                                                    p -> p[1]*p[2]),
                                     (a,b) -> a+b)) AS w) s)
              FROM pi, covm WHERE t < 12),
            fin AS (SELECT v FROM pi WHERE t = 12),
            cv AS (SELECT list_transform(covm.m, r ->
                     list_reduce(list_transform(list_zip(r, fin.v),
                                                p -> p[1]*p[2]),
                                 (a,b) -> a+b)) AS cv
                   FROM covm, fin),
            eig AS (SELECT round(list_reduce(
                       list_transform(list_zip(fin.v, cv.cv),
                                      p -> p[1]*p[2]),
                       (a,b) -> a+b), 6) + 0.0 AS eigval FROM fin, cv)
            SELECT i.i AS i, fin.v[i.i+1] AS loading, eig.eigval AS eigval
            FROM idx i, fin, eig
        """,
        "kmeans_centroids": f"""
            -- mirror of ops.clustering.kmeans_train: init = first 8 by
            -- vec_id; 2 Lloyd iterations; argmin ties -> lowest centroid
            -- index (ORDER BY d, c == the strict-less aggregate fold);
            -- centroids quantized to 6 decimals after each update; empty
            -- clusters keep their previous centroid; sizes are the final
            -- iteration's assignment counts
            WITH {_KMEANS_CTES},
            cnt AS (SELECT cl AS c, count(*) AS n FROM a2 GROUP BY cl)
            SELECT cents2.c AS cluster, coalesce(cnt.n, 0) AS n,
                   round(ce[1], 6) AS c0, round(ce[2], 6) AS c1,
                   round(ce[3], 6) AS c2, round(ce[4], 6) AS c3
            FROM cents2 LEFT JOIN cnt USING (c)
        """,
        "chunk_plan": """
            -- concat-and-chunk layout: cumulative whitespace-token sums
            -- in doc_id order, 512-token chunks
            WITH t AS (
              SELECT doc_id, len(string_split(text, ' ')) AS tc
              FROM documents),
            c AS (
              -- the window sum is HUGEINT in DuckDB; CAST back to BIGINT
              -- so pandas keeps int64 and the driver's value hash matches
              SELECT doc_id, tc,
                     CAST(sum(tc) OVER (ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - tc
                          AS BIGINT) AS off
              FROM t),
            p AS (
              SELECT doc_id, off AS token_offset,
                     off // 512 AS first_chunk,
                     CASE WHEN tc <= 0 THEN 0
                          ELSE (off + tc - 1) // 512 - off // 512 + 1
                     END AS n_chunks
              FROM c)
            SELECT n_chunks, count(*) AS docs,
                   CAST(sum(token_offset) AS BIGINT) AS offset_sum,
                   max(first_chunk) AS max_first_chunk
            FROM p GROUP BY n_chunks
        """,
        "text_repetition": """
            -- per-doc bigram stats via unnest; top coverage = max bigram
            -- frequency / total bigrams; docs with <2 words score 0
            WITH g AS (
              SELECT doc_id, source,
                     CASE WHEN len(string_split(text, ' ')) < 2 THEN []
                     ELSE list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i+1])
                     END AS grams
              FROM documents),
            per AS (
              SELECT doc_id, source,
                CASE WHEN len(grams) = 0 THEN 0.0
                ELSE 1.0 - len(list_distinct(grams))
                           / CAST(len(grams) AS DOUBLE) END AS dupf,
                CASE WHEN len(grams) = 0 THEN 0.0
                ELSE (SELECT max(c) FROM (
                        SELECT count(*) AS c FROM unnest(grams) AS t(x)
                        GROUP BY x))
                     / CAST(len(grams) AS DOUBLE) END AS topc
              FROM g)
            SELECT source, round(avg(dupf), 6) AS avg_dup_2gram,
                   round(avg(topc), 6) AS avg_top_2gram,
                   count(*) AS cnt
            FROM per GROUP BY source
        """,
        "contamination": """
            -- GPT-3-style any-ngram-overlap decontamination: word
            -- 3-grams (docs under 3 words use whole text), md5'd; hits =
            -- distinct grams shared with the src0 benchmark slice
            WITH base AS (
              SELECT doc_id, lang, source, text,
                     string_split(text, ' ') AS ws
              FROM documents),
            g AS (
              SELECT doc_id, lang, source,
                CASE WHEN len(ws) < 3 THEN [text]
                ELSE list_distinct(list_transform(
                  range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                END AS grams
              FROM base),
            bh AS (
              SELECT DISTINCT md5(x) AS h FROM (
                SELECT unnest(grams) AS x FROM g WHERE source = 'src0')),
            t AS (
              SELECT doc_id, lang, md5(x) AS h FROM (
                SELECT doc_id, lang, unnest(grams) AS x
                FROM g WHERE source <> 'src0')),
            per AS (
              SELECT doc_id, lang, count(*) AS ngrams,
                     sum(CASE WHEN h IN (SELECT h FROM bh)
                         THEN 1 ELSE 0 END) AS hits
              FROM t GROUP BY 1, 2)
            SELECT lang, count(*) AS docs,
                   CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS contaminated,
                   CAST(sum(hits) AS BIGINT) AS hit_sum,
                   round(avg(hits * 1.0 / ngrams), 6) AS avg_frac
            FROM per GROUP BY lang
        """,
        "pattern_scan": """
            -- identical RE2-portable regexes; count = non-overlapping
            -- matches in both engines
            SELECT source, count(*) AS docs,
              CAST(sum(len(regexp_extract_all(text, '(key|table|scan)')))
                AS BIGINT) AS kw_hits,
              CAST(sum(len(regexp_extract_all(text, '[0-9]+')))
                AS BIGINT) AS num_hits,
              CAST(sum(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')))
                AS BIGINT) AS email_hits,
              CAST(max(len(regexp_extract_all(text, '(key|table|scan)')))
                AS BIGINT) AS kw_max
            FROM documents GROUP BY source
        """,
        "redact": """
            -- same deterministic PII injection, same portable regexes;
            -- counts on the original text, replacements sequential in
            -- sorted pattern-name order (email, then phone), 'g' = Java
            -- replaceAll semantics
            WITH pii AS (
              SELECT source,
                     text || ' u' || CAST(doc_id AS VARCHAR) || '@ex'
                       || CAST(doc_id % 7 AS VARCHAR) || '.net ph '
                       || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
                       || CAST((doc_id*31) % 9000 + 1000 AS VARCHAR) AS text
              FROM documents),
            red AS (
              SELECT source,
                     len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
                       AS email_n,
                     len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}'))
                       AS phone_n,
                     regexp_replace(
                       regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+',
                                      '<EMAIL>', 'g'),
                       '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS text_redacted
              FROM pii)
            SELECT source, count(*) AS docs,
                   CAST(sum(email_n) AS BIGINT) AS emails,
                   CAST(sum(phone_n) AS BIGINT) AS phones,
                   CAST(sum(length(text_redacted)) AS BIGINT) AS red_chars,
                   max(md5(text_redacted)) AS digest
            FROM red GROUP BY source
        """,
        "url_domains": f"""
            -- URL canonicalization replay, term-for-term: same
            -- synthetic messy URLs, same normalization ladder, same
            -- two aggregates
            {_URL_CANON_CTES}
            pu AS (SELECT domain, canon, count(*) AS cnt
                   FROM c7 GROUP BY 1, 2)
            SELECT domain, CAST(sum(cnt) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                        AS BIGINT) AS n_dup_docs
            FROM pu GROUP BY 1
        """,
        "split_domains": f"""
            -- leakage-safe split replay: md5(domain || 'split') against
            -- the SAME cumulative rate_threshold cut points the engine
            -- derives (0.7 / 0.85), exact BIGINT id sums
            {_URL_CANON_CTES}
            s AS (
              SELECT doc_id, domain,
                     CASE WHEN md5(domain || 'split')
                            < '{_T_TRAIN}' THEN 'train'
                          WHEN md5(domain || 'split')
                            < '{_T_VAL}' THEN 'val'
                          ELSE 'test' END AS split
              FROM c7)
            SELECT split, CAST(count(DISTINCT domain) AS BIGINT)
                     AS n_domains,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM s GROUP BY 1
        """,
        "source_mix": """
            -- temperature-0.5 mixing: rate_s = round(min(1, 300*n^0.5 /
            -- sum(n^0.5) / n), 6) with the SAME operation order as
            -- ops.curation.source_mix_rates; threshold = the md5-hex
            -- quantization of ops.sampling.rate_threshold
            WITH c AS (
              SELECT source, count(*) AS n FROM documents GROUP BY source),
            w AS (
              SELECT source, n,
                     round(least(1.0,
                       300 * pow(n, 0.5)
                       / (SELECT sum(pow(n, 0.5)) FROM c) / n), 6) AS rate
              FROM c WHERE n > 0),
            thr AS (
              SELECT source,
                CASE WHEN rate >= 1.0 THEN repeat('g', 32)
                ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296.0)
                                            AS BIGINT))), 8, '0')
                     || repeat('0', 24)
                END AS t
              FROM w),
            k AS (
              SELECT d.doc_id, d.lang
              FROM documents d JOIN thr USING (source)
              WHERE md5(d.doc_id::VARCHAR || 'mix') < thr.t)
            SELECT lang, count(*) AS kept,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM k GROUP BY lang
        """,
        "lm_quality": """
            -- mirror of ops/lm.lm_crossentropy (add-1 word-bigram LM on
            -- the src0 slice): p(w2|w1) = (c2+1)/(c1+V+1), c1 = bigram
            -- marginal, V = src0 vocabulary; ce = mean -ln p per doc,
            -- rounded to 6 decimals before the head/tail thresholds
            WITH base AS (
              SELECT doc_id, lang, source, string_split(text, ' ') AS ws
              FROM documents),
            bg AS (
              SELECT doc_id, lang, source,
                CASE WHEN len(ws) < 2 THEN []
                ELSE list_transform(range(1, len(ws)),
                       i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))
                END AS bgs
              FROM base),
            v AS (SELECT count(DISTINCT x) AS v FROM (
                    SELECT unnest(ws) AS x FROM base WHERE source = 'src0')),
            c2 AS (
              SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c2 FROM (
                SELECT unnest(bgs) AS b FROM bg WHERE source = 'src0')
              GROUP BY 1, 2),
            c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
            t AS (
              SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM (
                SELECT doc_id, lang, unnest(bgs) AS b FROM bg
                WHERE source <> 'src0')),
            nl AS (
              SELECT t.doc_id, t.lang,
                     -ln((coalesce(c2.c2, 0) + 1.0)
                         / (coalesce(c1.c1, 0) + 1.0 * (v.v + 1))) AS nl
              FROM t LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
              CROSS JOIN v),
            per AS (SELECT doc_id, lang, avg(nl) AS ce FROM nl GROUP BY 1, 2)
            SELECT lang, count(*) AS docs, round(avg(ce), 6) AS avg_ce,
                   CAST(sum(CASE WHEN round(ce, 6) < 3.55 THEN 1 ELSE 0 END)
                        AS BIGINT) AS head_docs,
                   CAST(sum(CASE WHEN round(ce, 6) >= 3.70 THEN 1 ELSE 0 END)
                        AS BIGINT) AS tail_docs
            FROM per GROUP BY lang
        """,
        "dsir_weights": """
            -- mirror of ops/lm.dsir_logweights: word bigrams (whole text
            -- when <2 tokens) hashed by the first 16 bits of
            -- md5(gram || 'dsir') mod 256; add-1 bucket models of the
            -- src0 target vs the non-src0 raw corpus; per-doc weight =
            -- sum of log-prob ratios, rounded before the sign test
            WITH base AS (
              SELECT doc_id, lang, source, text, string_split(text, ' ') AS ws
              FROM documents),
            g AS (
              SELECT doc_id, lang, source,
                CASE WHEN len(ws) < 2 THEN [text]
                ELSE list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i+1])
                END AS gs
              FROM base),
            f AS (
              SELECT doc_id, lang, source,
                ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1))
                % 256 AS b
              FROM (SELECT doc_id, lang, source, md5(x || 'dsir') AS h FROM (
                      SELECT doc_id, lang, source, unnest(gs) AS x FROM g))),
            grid AS (SELECT unnest(generate_series(0, 255)) AS b),
            tm AS (
              SELECT grid.b,
                     ln((coalesce(c.n, 0) + 1.0) / (t.tot + 256.0)) AS lp_t
              FROM grid
              LEFT JOIN (SELECT b, count(*) AS n FROM f
                         WHERE source = 'src0' GROUP BY 1) c USING (b)
              CROSS JOIN (SELECT count(*) AS tot FROM f
                          WHERE source = 'src0') t),
            rm AS (
              SELECT grid.b,
                     ln((coalesce(c.n, 0) + 1.0) / (t.tot + 256.0)) AS lp_r
              FROM grid
              LEFT JOIN (SELECT b, count(*) AS n FROM f
                         WHERE source <> 'src0' GROUP BY 1) c USING (b)
              CROSS JOIN (SELECT count(*) AS tot FROM f
                          WHERE source <> 'src0') t),
            per AS (
              SELECT doc_id, lang, sum(tm.lp_t - rm.lp_r) AS w
              FROM f JOIN tm USING (b) JOIN rm USING (b)
              WHERE source <> 'src0' GROUP BY 1, 2)
            SELECT lang, count(*) AS docs, round(avg(w), 6) AS avg_logw,
                   CAST(sum(CASE WHEN round(w, 6) > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS kept,
                   CAST(sum(CASE WHEN round(w, 6) > 0 THEN doc_id ELSE 0 END)
                        AS BIGINT) AS id_sum
            FROM per GROUP BY lang
        """,
        "spatial_join_table": """
            -- direct predicate join over the same derived points and
            -- nation-derived regions; the engine's cell-equi-join +
            -- refine must produce identical pairs
            WITH pts AS (
              SELECT value,
                     (event_id*1103515245) % 3600000000 - 1800000000 AS lon7,
                     (event_id*1234567891) % 1700000000 - 850000000 AS lat7
              FROM events),
            r1 AS (
              SELECT rid,
                     (rid*1103515245) % 3200000000 - 1700000000 AS w7,
                     (rid*1234567891) % 1500000000 - 800000000 AS s7
              FROM (SELECT CAST(n_nationkey AS BIGINT) AS rid FROM nation)),
            r2 AS (
              SELECT rid, w7, s7,
                     w7 + 50000000 + (rid % 7) * 30000000 AS e7,
                     s7 + 40000000 + (rid % 5) * 20000000 AS n7
              FROM r1)
            SELECT rid, count(*) AS cnt, round(sum(value), 2) AS sum_val
            FROM pts JOIN r2
              ON lon7 >= w7 AND lon7 <= e7 AND lat7 >= s7 AND lat7 <= n7
            GROUP BY rid
        """,
        "spatial_join_poly": _spatial_join_poly_oracle(),
        "overlay_rect": _overlay_rect_oracle(),
        "overlay_clip_lines": _OVERLAY_CLIP_LINES_ORACLE,
        "distance_join": """
            -- brute-force pairs with the IDENTICAL equirect formula
            -- (degrees computed per point as lat7 * 1e-7 FIRST, then
            -- differenced — term-for-term with equirect_distance_col);
            -- the cheap |dlat| prefilter is loose (200 km < 1.82e7
            -- fixed-point units of latitude) so it cannot drop a pair
            WITH pts AS (
              SELECT event_id AS pid,
                     ((event_id*1103515245) % 3600000000 - 1800000000)
                       * 1e-7 AS lon,
                     ((event_id*1234567891) % 1700000000 - 850000000)
                       * 1e-7 AS lat,
                     (event_id*1234567891) % 1700000000 - 850000000 AS lat7
              FROM events),
            f AS (SELECT * FROM pts WHERE lat7 >= -700000000
                                      AND lat7 <= 700000000),
            d AS (
              SELECT a.lat7 AS la7,
                     6371000.0 * sqrt(dx*dx + dy*dy) AS dist
              FROM (
                SELECT a.pid AS apid, a.lat7, b.pid AS bpid,
                       radians(b.lat - a.lat) AS dy,
                       radians(b.lon - a.lon)
                         * cos(radians((a.lat + b.lat) / 2.0)) AS dx
                FROM f a JOIN f b
                  ON a.pid < b.pid
                 AND b.lat7 - a.lat7 <= 18200000
                 AND a.lat7 - b.lat7 <= 18200000) a),
            k AS (SELECT la7, round(dist, 3) AS dist_r FROM d
                  WHERE dist <= 200000.0)
            SELECT (la7 + 850000000) // 100000000 AS band,
                   count(*) AS pairs,
                   round(sum(dist_r), 0) AS sum_dist_m
            FROM k GROUP BY 1
        """,
        "knn_join_table": """
            -- brute-force kNN with the IDENTICAL equirect formula and
            -- tie rule (dist, then nid): window over all pairs
            WITH pts AS (
              SELECT event_id AS pid,
                     ((event_id*1103515245) % 3600000000 - 1800000000)
                       * 1e-7 AS lon,
                     ((event_id*1234567891) % 1700000000 - 850000000)
                       * 1e-7 AS lat
              FROM events),
            q AS (SELECT * FROM pts WHERE pid % 20 = 0),
            d AS (
              SELECT pid, nid, 6371000.0 * sqrt(dx*dx + dy*dy) AS dist
              FROM (
                SELECT q.pid, p.pid AS nid,
                       radians(p.lat - q.lat) AS dy,
                       radians(p.lon - q.lon)
                         * cos(radians((q.lat + p.lat) / 2.0)) AS dx
                FROM q CROSS JOIN pts p)),
            r AS (
              SELECT pid, nid, dist,
                     row_number() OVER (
                       PARTITION BY pid ORDER BY dist, nid) AS rn
              FROM d)
            SELECT pid, nid, round(dist, 3) AS dist
            FROM r WHERE rn <= 5
        """,
        "snap_segments": """
            -- brute-force snap with the IDENTICAL probe-anchored
            -- clamped point-to-segment formula: per-pair meters are
            -- mm-rounded BEFORE the <= d filter and the (dist, sid)
            -- argmin, term-for-term with nearest_segment_join
            WITH seg0 AS (
              SELECT event_id AS sid,
                     ((event_id*1103515245) % 3590000000)
                       - 1795000000 AS ax7,
                     ((event_id*1234567891) % 1690000000)
                       - 845000000 AS ay7
              FROM events),
            seg AS (
              SELECT sid, ax7, ay7,
                     ax7 + ((sid*69069) % 2000001) - 1000000 AS bx7,
                     ay7 + ((sid*48271) % 2000001) - 1000000 AS by7
              FROM seg0),
            segf AS (
              SELECT * FROM seg
              WHERE least(ay7, by7) >= -700000000
                AND greatest(ay7, by7) <= 700000000),
            pts AS (
              SELECT event_id AS pid,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events WHERE event_id % 37 = 0),
            ptf AS (SELECT * FROM pts WHERE lat7 >= -700000000
                                        AND lat7 <= 700000000),
            t0 AS (
              SELECT pid, lon7, lat7, sid,
                     radians(ax7*1e-7 - lon7*1e-7)
                       * cos(radians(lat7*1e-7)) AS dxa,
                     radians(ay7*1e-7 - lat7*1e-7) AS dya,
                     radians(bx7*1e-7 - lon7*1e-7)
                       * cos(radians(lat7*1e-7)) AS dxb,
                     radians(by7*1e-7 - lat7*1e-7) AS dyb
              FROM ptf CROSS JOIN segf),
            t1 AS (
              SELECT pid, lon7, lat7, sid, dxa, dya,
                     dxb - dxa AS vx, dyb - dya AS vy
              FROM t0),
            t2 AS (
              SELECT pid, lon7, lat7, sid, dxa, dya, vx, vy,
                     CASE WHEN vx*vx + vy*vy = 0 THEN 0.0
                          ELSE least(1.0, greatest(0.0,
                               -(dxa*vx + dya*vy) / (vx*vx + vy*vy)))
                     END AS t
              FROM t1),
            d AS (
              SELECT pid, lon7, lat7, sid,
                     CAST(round(6371000.0 * sqrt(
                       (dxa + t*vx)*(dxa + t*vx)
                       + (dya + t*vy)*(dya + t*vy)) * 1000.0, 0)
                       AS BIGINT) AS mm
              FROM t2),
            r AS (
              SELECT pid, lon7, lat7, sid, mm,
                     row_number() OVER (
                       PARTITION BY pid ORDER BY mm, sid) AS rn
              FROM d WHERE mm <= 200000000)
            SELECT pid, lon7, lat7, sid,
                   CAST(mm AS DOUBLE) / 1000.0 AS dist_m
            FROM r WHERE rn = 1
        """,
        "kde_events": """
            -- replay of kde_heatmap zoom=5 sigma=0.75 R=2: continuous
            -- grid position, 5x5 offset fan-out, per-contribution
            -- micro-quantization BEFORE the sum (exact BIGINT totals)
            WITH p AS (
              SELECT ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events),
            c AS (
              SELECT (CAST(lon7 AS DOUBLE) + 1800000000.0)
                       / 112500000.0 AS px,
                     (CAST(lat7 AS DOUBLE) + 900000000.0)
                       / 112500000.0 AS py
              FROM p),
            f AS (
              SELECT CAST(floor(px) AS BIGINT) + dx AS nx,
                     CAST(floor(py) AS BIGINT) + dy AS ny, px, py
              FROM c,
                   (VALUES (-2),(-1),(0),(1),(2)) AS dxs(dx),
                   (VALUES (-2),(-1),(0),(1),(2)) AS dys(dy)),
            m AS (
              SELECT nx, ny,
                     CAST(round(1.0 * exp(-(
                       (px - (CAST(nx AS DOUBLE) + 0.5))
                         * (px - (CAST(nx AS DOUBLE) + 0.5))
                       + (py - (CAST(ny AS DOUBLE) + 0.5))
                         * (py - (CAST(ny AS DOUBLE) + 0.5))) / 1.125)
                       * 1e6, 0) AS BIGINT) AS m
              FROM f
              WHERE nx >= 0 AND nx < 32 AND ny >= 0 AND ny < 16)
            SELECT nx AS cell_x, ny AS cell_y,
                   CAST(sum(m) AS BIGINT) AS density_micro,
                   CAST(count(*) AS BIGINT) AS contribs
            FROM m GROUP BY 1, 2
        """,
        "hmm_match": """
            -- Viterbi replay: identical candidate stage (mm-quantized
            -- snap metric, loose |dlat| prefilter cannot drop a true
            -- candidate: 200 km = 1.8e7 lat units + 1e6 segment extent
            -- < 2e7), top-3 prune by (mm, sid), dense re-index of
            -- surviving fixes, forward+backward integer DP via two
            -- recursive CTEs with min() in the recursive term, per-fix
            -- pick = lowest sid among optimal-path states
            WITH RECURSIVE
            seg0 AS (
              SELECT event_id AS sid,
                     ((event_id*1103515245) % 3590000000)
                       - 1795000000 AS ax7,
                     ((event_id*1234567891) % 1690000000)
                       - 845000000 AS ay7
              FROM events),
            seg AS (
              SELECT sid, ax7, ay7,
                     ax7 + ((sid*69069) % 2000001) - 1000000 AS bx7,
                     ay7 + ((sid*48271) % 2000001) - 1000000 AS by7
              FROM seg0),
            segf AS (
              SELECT * FROM seg
              WHERE least(ay7, by7) >= -700000000
                AND greatest(ay7, by7) <= 700000000),
            pts AS (
              SELECT user_id AS ent, event_id AS ordk,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events WHERE user_id % 10 = 0),
            ptf AS (SELECT * FROM pts WHERE lat7 >= -700000000
                                        AND lat7 <= 700000000),
            t0 AS (
              SELECT ent, ordk, sid,
                     radians(ax7*1e-7 - lon7*1e-7)
                       * cos(radians(lat7*1e-7)) AS dxa,
                     radians(ay7*1e-7 - lat7*1e-7) AS dya,
                     radians(bx7*1e-7 - lon7*1e-7)
                       * cos(radians(lat7*1e-7)) AS dxb,
                     radians(by7*1e-7 - lat7*1e-7) AS dyb
              FROM ptf JOIN segf
                ON ay7 - lat7 <= 20000000 AND lat7 - ay7 <= 20000000),
            t1 AS (
              SELECT ent, ordk, sid, dxa, dya,
                     dxb - dxa AS vx, dyb - dya AS vy
              FROM t0),
            t2 AS (
              SELECT ent, ordk, sid, dxa, dya, vx, vy,
                     CASE WHEN vx*vx + vy*vy = 0 THEN 0.0
                          ELSE least(1.0, greatest(0.0,
                               -(dxa*vx + dya*vy) / (vx*vx + vy*vy)))
                     END AS t
              FROM t1),
            d AS MATERIALIZED (
              -- MATERIALIZED: the recursive terms below re-reference
              -- states every iteration; without it DuckDB re-evaluates
              -- the whole candidate pipeline per DP step (400x slower)
              SELECT ent, ordk, sid,
                     CAST(round(6371000.0 * sqrt(
                       (dxa + t*vx)*(dxa + t*vx)
                       + (dya + t*vy)*(dya + t*vy)) * 1000.0, 0)
                       AS BIGINT) AS mm
              FROM t2),
            cand AS (
              SELECT ent, ordk, sid, mm,
                     row_number() OVER (
                       PARTITION BY ent, ordk ORDER BY mm, sid) AS rn
              FROM d WHERE mm <= 200000000),
            states AS MATERIALIZED (
              SELECT ent, ordk, sid, mm,
                     dense_rank() OVER (
                       PARTITION BY ent ORDER BY ordk) - 1 AS seq
              FROM cand WHERE rn <= 3),
            maxseq AS (SELECT ent, max(seq) AS ms FROM states GROUP BY ent),
            fwd AS (
              SELECT ent, seq, sid, mm, mm AS f FROM states WHERE seq = 0
              UNION ALL
              SELECT s.ent, s.seq, s.sid, s.mm,
                     s.mm + min(p.f + CASE WHEN p.sid = s.sid
                                           THEN 0 ELSE 20000000 END)
              FROM fwd p JOIN states s
                ON s.ent = p.ent AND s.seq = p.seq + 1
              GROUP BY s.ent, s.seq, s.sid, s.mm),
            bwd AS (
              SELECT st.ent, st.seq, st.sid, st.mm, st.mm AS b
              FROM states st JOIN maxseq m
                ON m.ent = st.ent AND st.seq = m.ms
              UNION ALL
              SELECT s.ent, s.seq, s.sid, s.mm,
                     s.mm + min(p.b + CASE WHEN p.sid = s.sid
                                           THEN 0 ELSE 20000000 END)
              FROM bwd p JOIN states s
                ON s.ent = p.ent AND s.seq = p.seq - 1
              GROUP BY s.ent, s.seq, s.sid, s.mm),
            tot AS (
              SELECT f.ent, f.seq, f.sid, f.mm, f.f + b.b - f.mm AS t
              FROM fwd f JOIN bwd b
                ON b.ent = f.ent AND b.seq = f.seq AND b.sid = f.sid),
            pick AS (
              SELECT ent, seq, sid, mm, t,
                     row_number() OVER (
                       PARTITION BY ent, seq ORDER BY t, sid) AS rn
              FROM tot),
            ords AS (SELECT DISTINCT ent, seq, ordk FROM states)
            SELECT p.ent AS entity, CAST(p.seq AS BIGINT) AS seq,
                   o.ordk AS ord_key, p.sid AS sid,
                   CAST(p.mm AS DOUBLE) / 1000.0 AS dist_m,
                   CAST(p.t AS BIGINT) AS path_cost_mm
            FROM pick p JOIN ords o
              ON o.ent = p.ent AND o.seq = p.seq
            WHERE p.rn = 1
        """,
        "traj_hausdorff": """
            -- brute-force symmetric Hausdorff per candidate entity
            -- pair: the bbox prefilter is LOOSER than the engine's
            -- padding (lat 3.7e7 > ceil(d_deg*1e7), lon 1.1e8 >
            -- pad/cos70) so it cannot drop a true pair; per point-pair
            -- mm quantization BEFORE the min/max folds, identical to
            -- the kernel
            WITH p AS (
              SELECT user_id AS e,
                     ((user_id // 2) % 24) * 150000000
                       - 1800000000 + 75000000
                       + ((event_id*1103515245) % 60000001)
                       - 30000000 AS lon7,
                     (((user_id // 2) // 24) % 8) * 150000000
                       - 600000000 + 75000000
                       + ((event_id*1234567891) % 60000001)
                       - 30000000 AS lat7
              FROM events WHERE event_id % 7 = 0),
            pf AS (SELECT * FROM p WHERE lat7 >= -700000000
                                     AND lat7 <= 700000000),
            bb AS (
              SELECT e, min(lon7) AS w, max(lon7) AS x,
                     min(lat7) AS s, max(lat7) AS n
              FROM pf GROUP BY e),
            ep AS (
              SELECT a.e AS ea, b.e AS eb
              FROM bb a JOIN bb b ON a.e < b.e
               AND a.w - 110000000 <= b.x AND b.w <= a.x + 110000000
               AND a.s - 37000000 <= b.n AND b.s <= a.n + 37000000),
            d AS (
              SELECT ep.ea, ep.eb, pa.lon7 AS alon, pa.lat7 AS alat,
                     pb.lon7 AS blon, pb.lat7 AS blat,
                     CAST(round(6371000.0 * sqrt(
                       (radians(blon*1e-7 - alon*1e-7)
                        * cos(radians((alat*1e-7 + blat*1e-7) / 2.0)))
                       * (radians(blon*1e-7 - alon*1e-7)
                          * cos(radians((alat*1e-7 + blat*1e-7) / 2.0)))
                       + radians(blat*1e-7 - alat*1e-7)
                         * radians(blat*1e-7 - alat*1e-7)) * 1000.0, 0)
                       AS BIGINT) AS mm
              FROM ep JOIN pf pa ON pa.e = ep.ea
                      JOIN pf pb ON pb.e = ep.eb),
            da AS (SELECT ea, eb, alon, alat, min(mm) AS m
                   FROM d GROUP BY 1, 2, 3, 4),
            h1 AS (SELECT ea, eb, CAST(max(m) AS BIGINT) AS h
                   FROM da GROUP BY 1, 2),
            db AS (SELECT ea, eb, blon, blat, min(mm) AS m
                   FROM d GROUP BY 1, 2, 3, 4),
            h2 AS (SELECT ea, eb, CAST(max(m) AS BIGINT) AS h
                   FROM db GROUP BY 1, 2)
            SELECT h1.ea, h1.eb,
                   CAST(greatest(h1.h, h2.h) AS DOUBLE) / 1000.0 AS haus_m
            FROM h1 JOIN h2 ON h2.ea = h1.ea AND h2.eb = h1.eb
            WHERE greatest(h1.h, h2.h) <= 400000000
        """,
        "idw_surface": """
            -- replay of idw_surface zoom=5 R=2 eps=1e-6: per-term
            -- micro-quantized weight and value*weight BEFORE the sums
            -- (exact BIGINT num/den), ONE round-6 division per cell
            WITH p AS (
              SELECT ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7,
                     value AS v
              FROM events),
            c AS (
              SELECT (CAST(lon7 AS DOUBLE) + 1800000000.0)
                       / 112500000.0 AS px,
                     (CAST(lat7 AS DOUBLE) + 900000000.0)
                       / 112500000.0 AS py,
                     v
              FROM p),
            f AS (
              SELECT CAST(floor(px) AS BIGINT) + dx AS nx,
                     CAST(floor(py) AS BIGINT) + dy AS ny, px, py, v
              FROM c,
                   (VALUES (-2),(-1),(0),(1),(2)) AS dxs(dx),
                   (VALUES (-2),(-1),(0),(1),(2)) AS dys(dy)),
            w AS (
              SELECT nx, ny, v,
                     1.0 / ((px - (CAST(nx AS DOUBLE) + 0.5))
                              * (px - (CAST(nx AS DOUBLE) + 0.5))
                            + (py - (CAST(ny AS DOUBLE) + 0.5))
                              * (py - (CAST(ny AS DOUBLE) + 0.5))
                            + 1e-6) AS wt
              FROM f
              WHERE nx >= 0 AND nx < 32 AND ny >= 0 AND ny < 16),
            m AS (
              SELECT nx, ny,
                     CAST(round(wt * 1e6, 0) AS BIGINT) AS wq,
                     CAST(round(v * wt * 1e6, 0) AS BIGINT) AS vwq
              FROM w)
            SELECT nx AS cell_x, ny AS cell_y,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   round(CAST(CAST(sum(vwq) AS BIGINT) AS DOUBLE)
                         / CAST(CAST(sum(wq) AS BIGINT) AS DOUBLE), 6)
                     AS idw_value
            FROM m GROUP BY 1, 2
        """,
        "quality_classifier": """
            -- mirror of ops/classifier (hashed_logreg_train iters=2,
            -- lr=1, + hashed_logreg_score): L1-normalized hashed-bigram
            -- counts (md5 first 16 bits mod 256, salt 'clf'), full-batch
            -- GD from w=0/bias=0 with round-6 quantization per update,
            -- σ scores rounded before the keep threshold
            WITH base AS (
              SELECT doc_id, lang, source, text, string_split(text, ' ') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(ws) < 2 THEN [text]
                ELSE list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i+1])
                END AS gs
              FROM base),
            f AS (
              SELECT doc_id,
                ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1))
                % 256 AS b
              FROM (SELECT doc_id, md5(x || 'clf') AS h FROM (
                      SELECT doc_id, unnest(gs) AS x FROM g))),
            cnt AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
            fx AS (
              SELECT cnt.doc_id, cnt.b, cnt.c / tot.n AS x
              FROM cnt JOIN tot USING (doc_id)),
            lab AS (
              SELECT doc_id,
                     CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y
              FROM documents),
            nn AS (SELECT count(*) AS n FROM documents),
            grid AS (SELECT unnest(generate_series(0, 255)) AS b),
            -- iteration 1: w=0, bias=0 => sigma = 0.5 exactly
            r1 AS (SELECT doc_id, y - 0.5 AS r FROM lab),
            g1 AS (SELECT fx.b, sum(fx.x * r1.r) AS gs
                   FROM fx JOIN r1 USING (doc_id) GROUP BY 1),
            w1 AS (SELECT grid.b,
                          round(coalesce(g1.gs, 0) / (SELECT n FROM nn), 6)
                            AS w
                   FROM grid LEFT JOIN g1 USING (b)),
            b1 AS (SELECT round(sum(r) / (SELECT n FROM nn), 6) AS v FROM r1),
            -- iteration 2
            z2 AS (SELECT fx.doc_id, sum(fx.x * w1.w) AS dz
                   FROM fx JOIN w1 USING (b) GROUP BY 1),
            p2 AS (SELECT doc_id,
                          1.0 / (1.0 + exp(-(dz + (SELECT v FROM b1)))) AS p
                   FROM z2),
            r2 AS (SELECT lab.doc_id, lab.y - coalesce(p2.p, 0.5) AS r
                   FROM lab LEFT JOIN p2 USING (doc_id)),
            g2 AS (SELECT fx.b, sum(fx.x * r2.r) AS gs
                   FROM fx JOIN r2 USING (doc_id) GROUP BY 1),
            w2 AS (SELECT w1.b,
                          round(w1.w + coalesce(g2.gs, 0)
                                       / (SELECT n FROM nn), 6) AS w
                   FROM w1 LEFT JOIN g2 USING (b)),
            b2 AS (SELECT round((SELECT v FROM b1)
                                + sum(r) / (SELECT n FROM nn), 6) AS v
                   FROM r2),
            -- scoring with the final model
            zs AS (SELECT fx.doc_id, sum(fx.x * w2.w) AS dz
                   FROM fx JOIN w2 USING (b) GROUP BY 1),
            per AS (
              SELECT zs.doc_id, d.lang,
                     round(1.0 / (1.0 + exp(-(zs.dz + (SELECT v FROM b2)))),
                           6) AS score
              FROM zs JOIN documents d USING (doc_id))
            SELECT lang, count(*) AS docs,
                   round(avg(score), 6) AS avg_score,
                   CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS kept,
                   CAST(sum(CASE WHEN score >= 0.5 THEN doc_id ELSE 0 END)
                        AS BIGINT) AS id_sum
            FROM per GROUP BY lang
        """,
        "pipeline_prep": """
            -- same pipeline in SQL: dup corpus -> quality gate
            -- (distinct-word ratio >= 0.5) -> keep min doc_id per exact
            -- text fingerprint -> md5-threshold 50% sample -> per-lang
            -- token accounting
            WITH dup AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL SELECT doc_id + 1000, text, lang FROM documents),
            q AS (
              SELECT * FROM (
                SELECT doc_id, text, lang,
                       len(list_distinct(string_split(text, ' ')))
                         / CAST(len(string_split(text, ' ')) AS DOUBLE)
                         AS dr
                FROM dup)
              WHERE dr >= 0.5),
            keep AS (
              SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
            s AS (
              SELECT q.doc_id, q.text, q.lang
              FROM q JOIN keep USING (doc_id)
              WHERE md5(q.doc_id::VARCHAR || 'pipe') < '80000000000000000000000000000000')
            SELECT lang, count(*) AS docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS tokens,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM s GROUP BY lang
        """,
        "geoblocks_polygon": """
            -- direct exact aggregation over the quad (same half-plane
            -- tests as snapshot_polygon, applied to the event points)
            SELECT count(*) AS cnt, round(sum(value), 2) AS sum_val
            FROM (
              SELECT ((event_id*1103515245) % 3600000000 - 1800000000)*1e-7 AS px,
                     ((event_id*1234567891) % 1700000000 - 850000000)*1e-7 AS py,
                     value
              FROM events)
            WHERE (80.0000013 - -100.0000017) * (py - -50.0000031)
                  - (-60.0000029 - -50.0000031) * (px - -100.0000017) > 0
              AND (120.0000019 - 80.0000013) * (py - -60.0000029)
                  - (50.0000023 - -60.0000029) * (px - 80.0000013) > 0
              AND (-80.0000011 - 120.0000019) * (py - 50.0000023)
                  - (60.0000037 - 50.0000023) * (px - 120.0000019) > 0
              AND (-100.0000017 - -80.0000011) * (py - 60.0000037)
                  - (-50.0000031 - 60.0000037) * (px - -80.0000011) > 0
        """,
        "areal_interp": """
            -- analytic weights: bands share the lon extent of every
            -- target, so w = (sin(hi∩)-sin(lo∩)) / (sin(hi)-sin(lo))
            WITH bands AS (
              SELECT 'band' || z AS zone, -85.0 + 10*z AS lo, -75.0 + 10*z AS hi,
                     count(*) AS cnt
              FROM (
                SELECT ((event_id*1234567891) % 1700000000 - 850000000
                        + 850000000) // 100000000 AS z
                FROM events)
              GROUP BY 1, 2, 3),
            dst(region, dlo, dhi) AS (VALUES
              ('south', -85.0, -41.0), ('mid', -41.0, 32.0),
              ('north', 32.0, 85.0)),
            w AS (
              SELECT region, zone, cnt,
                     (sin(radians(least(hi, dhi)))
                      - sin(radians(greatest(lo, dlo))))
                     / (sin(radians(hi)) - sin(radians(lo))) AS w
              FROM bands CROSS JOIN dst
              WHERE least(hi, dhi) > greatest(lo, dlo))
            SELECT region, round(sum(cnt * w), 2) AS est_cnt
            FROM w GROUP BY region
        """,
        "sample_diversity": f"""
            -- kmeans replay (shared chain) -> final assignment (a3, as
            -- in dedup_semantic) -> per-cluster md5 rank, quota 20
            WITH {_KMEANS_CTES},
            a3 AS (
              SELECT vec_id, c AS cl FROM (
                SELECT emb.vec_id, cents2.c,
                       row_number() OVER (
                         PARTITION BY emb.vec_id
                         ORDER BY list_distance(emb.e, cents2.ce), cents2.c
                       ) AS rn
                FROM emb CROSS JOIN cents2)
              WHERE rn = 1),
            ranked AS (
              SELECT vec_id, cl,
                     row_number() OVER (
                       PARTITION BY cl
                       ORDER BY md5(vec_id::VARCHAR || 'dv'), vec_id
                     ) AS rk
              FROM a3)
            SELECT cl AS cluster, count(*) AS picked,
                   CAST(sum(vec_id) AS BIGINT) AS id_sum
            FROM ranked WHERE rk <= 20 GROUP BY cl
        """,
        "sample_stratified": """
            -- mirror of ops.sampling.deterministic_sample: md5 of
            -- (doc_id || 'r3') compared against the per-stratum
            -- 32-hex-char threshold; membership is bit-identical
            SELECT lang, count(*) AS kept,
                   CAST(sum(doc_id) AS BIGINT) AS id_sum
            FROM documents
            WHERE md5(doc_id::VARCHAR || 'r3') <
                  CASE lang WHEN 'en' THEN '40000000000000000000000000000000'
                            WHEN 'zh' THEN 'c0000000000000000000000000000000'
                            ELSE '80000000000000000000000000000000' END
            GROUP BY lang
        """,
        "sample_weighted": f"""
            -- A-ES replay: u is the first 12 md5 hex chars as a 48-bit
            -- integer (exact in a double, re-derived digit-by-digit),
            -- priority ln(u)/n_chars — the same monotone transform of
            -- u^(1/w) the engine orders by
            WITH h AS (
              SELECT doc_id, n_chars,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS hx
              FROM documents WHERE n_chars > 0
            ), pri AS (
              SELECT doc_id, n_chars,
                     ln(({_hex12_int_sql('hx')} + 1.0) / power(16, 12))
                       / n_chars AS aes
              FROM h)
            SELECT doc_id, n_chars, round(aes, 6) AS aes_key
            FROM pri ORDER BY aes DESC, doc_id LIMIT 25
        """,
        "asof_join_events": """
            -- native ASOF LEFT JOIN (latest error at-or-before each
            -- click/purchase per user), 2-day tolerance nulled post-hoc
            -- exactly like ops/joins.asof_join
            WITH p AS (
              SELECT event_id, user_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events WHERE event_type IN ('click', 'purchase')
            ), b AS (
              SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS bsec,
                     max(value) AS err_value, max(event_id) AS err_event
              FROM events WHERE event_type = 'error' GROUP BY 1, 2
            ), m AS (
              SELECT p.event_type, p.sec,
                     CASE WHEN p.sec - b.bsec <= 172800 THEN b.bsec END AS r_sec,
                     CASE WHEN p.sec - b.bsec <= 172800 THEN b.err_value END AS r_err_value,
                     CASE WHEN p.sec - b.bsec <= 172800 THEN b.err_event END AS r_err_event
              FROM p ASOF LEFT JOIN b
                ON p.user_id = b.user_id AND p.sec >= b.bsec
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_probes,
                   CAST(sum(CASE WHEN r_err_event IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                   round(sum(coalesce(r_err_value, 0)), 2) AS err_value_sum,
                   CAST(sum(coalesce(r_err_event, 0)) AS BIGINT) AS err_event_sum,
                   round(avg(sec - r_sec), 4) AS avg_lag
            FROM m GROUP BY 1
        """,
        "topk_per_group": """
            SELECT l_returnflag, rk, l_orderkey, l_linenumber, price
            FROM (
              SELECT l_returnflag,
                     CAST(row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey,
                                l_linenumber) AS INTEGER) AS rk,
                     l_orderkey, l_linenumber,
                     round(l_extendedprice, 2) AS price
              FROM lineitem)
            WHERE rk <= 3
        """,
        "interval_join_cells": _HIST + """
            , v AS (
              SELECT id,
                     ((lat7 + 900000000) // 450000000) * 8
                       + ((lon7 + 1800000000) // 450000000) AS cell,
                     valid_from AS s,
                     coalesce(valid_to, 1706745600) AS e
              FROM geo WHERE visible
            ), va AS (SELECT * FROM v WHERE id % 2 = 0 AND e > s),
               vb AS (SELECT * FROM v WHERE id % 2 = 1 AND e > s)
            SELECT va.cell AS cell,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(va.id + vb.id) AS BIGINT) AS id_sum
            FROM va JOIN vb
              ON va.cell = vb.cell AND va.s < vb.e AND vb.s < va.e
            GROUP BY 1
        """,
        "dedup_semantic": f"""
            -- SemDeDup: replay kmeans (same CTE chain as kmeans_centroids),
            -- assign every vector to its FINAL centroid (cents2), then
            -- pairwise cosine within each cluster only
            WITH {_KMEANS_CTES},
            a3 AS (
              SELECT vec_id, e, c AS cl FROM (
                SELECT emb.vec_id, emb.e, cents2.c,
                       row_number() OVER (
                         PARTITION BY emb.vec_id
                         ORDER BY list_distance(emb.e, cents2.ce), cents2.c
                       ) AS rn
                FROM emb CROSS JOIN cents2)
              WHERE rn = 1)
            SELECT id_a, id_b, round(cosine, 6) AS cos, cluster
            FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cl AS cluster,
                     list_inner_product(a.e, b.e)
                     / (sqrt(list_inner_product(a.e, a.e))
                        * sqrt(list_inner_product(b.e, b.e))) AS cosine
              FROM a3 a JOIN a3 b ON a.cl = b.cl AND a.vec_id < b.vec_id)
            WHERE cosine >= 0.4
        """,
        "sim_lsh_ann": _lsh_ann_oracle(),
        "sim_ivf": """
            -- mirror of ops.similarity.ivf_ann with its deterministic
            -- first-16 centroid stub: route each vector to argmax-cosine
            -- centroid (ties -> lower index, matching the aggregate fold),
            -- probe the 4 centroids nearest the query (ties -> higher
            -- index, matching python sorted(reverse=True)), exact re-rank
            WITH c AS (SELECT vec_id AS ci, embedding::DOUBLE[] AS cv
                       FROM embeddings WHERE vec_id < 16),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0),
            routed AS (
              SELECT e.vec_id, e.embedding,
                (SELECT ci FROM (
                   SELECT c.ci,
                     list_inner_product(e.embedding::DOUBLE[], c.cv)
                     / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(c.cv, c.cv))) AS s
                   FROM c) ORDER BY s DESC, ci LIMIT 1) AS cent
              FROM embeddings e),
            probes AS (
              SELECT ci FROM (
                SELECT c.ci,
                  list_inner_product(q.qv, c.cv)
                  / (sqrt(list_inner_product(q.qv, q.qv))
                     * sqrt(list_inner_product(c.cv, c.cv))) AS s
                FROM c, q) ORDER BY s DESC, ci DESC LIMIT 4)
            SELECT vec_id FROM (
              SELECT r.vec_id,
                list_inner_product(r.embedding::DOUBLE[], q.qv)
                / (sqrt(list_inner_product(r.embedding::DOUBLE[],
                                           r.embedding::DOUBLE[]))
                   * sqrt(list_inner_product(q.qv, q.qv))) AS cos
              FROM routed r, q
              WHERE r.cent IN (SELECT ci FROM probes))
            ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "sim_ivf_trained": f"""
            -- ivf_ann with train_iters=2: centroids are the kmeans
            -- replay's cents2; routing ties -> lower index (fold), probe
            -- ties -> higher index (python sorted(reverse=True))
            WITH {_KMEANS_CTES},
            c AS (SELECT cents2.c AS ci, ce AS cv FROM cents2),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0),
            routed AS (
              SELECT e.vec_id, e.embedding,
                (SELECT ci FROM (
                   SELECT c.ci,
                     list_inner_product(e.embedding::DOUBLE[], c.cv)
                     / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                        * sqrt(list_inner_product(c.cv, c.cv))) AS s
                   FROM c) ORDER BY s DESC, ci LIMIT 1) AS cent
              FROM embeddings e),
            probes AS (
              SELECT ci FROM (
                SELECT c.ci,
                  list_inner_product(q.qv, c.cv)
                  / (sqrt(list_inner_product(q.qv, q.qv))
                     * sqrt(list_inner_product(c.cv, c.cv))) AS s
                FROM c, q) ORDER BY s DESC, ci DESC LIMIT 3)
            SELECT vec_id FROM (
              SELECT r.vec_id,
                list_inner_product(r.embedding::DOUBLE[], q.qv)
                / (sqrt(list_inner_product(r.embedding::DOUBLE[],
                                           r.embedding::DOUBLE[]))
                   * sqrt(list_inner_product(q.qv, q.qv))) AS cos
              FROM routed r, q
              WHERE r.cent IN (SELECT ci FROM probes))
            ORDER BY cos DESC, vec_id LIMIT 10
        """,
        "hybrid_search": """
            -- RRF fusion replay: BM25 arm = the text_bm25 oracle scored
            -- and rounded to 6 BEFORE ranking; vector arm = the sim_topk
            -- cosine rounded to 6; rank = row_number over (score DESC,
            -- id); rrf = 1/(60+rank) per present arm (rank 0 = absent)
            WITH base AS (
              SELECT doc_id, len(string_split(text, ' ')) AS dl,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'hash')) AS tf0,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'join')) AS tf1,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'vector')) AS tf2
              FROM documents),
            st AS (
              SELECT count(*) AS n, sum(dl) AS sum_dl,
                     sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM base),
            bm AS (
              SELECT doc_id, round(
                  ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                    * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl
                                        / (sum_dl / CAST(n AS DOUBLE))))
                + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                    * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl
                                        / (sum_dl / CAST(n AS DOUBLE))))
                + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                    * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl
                                        / (sum_dl / CAST(n AS DOUBLE))))
                , 6) AS s
              FROM base, st
              WHERE tf0 + tf1 + tf2 > 0),
            bmt AS (SELECT doc_id, s FROM bm
                    ORDER BY s DESC, doc_id LIMIT 50),
            bmr AS (SELECT doc_id AS id,
                           row_number() OVER (ORDER BY s DESC, doc_id)
                             AS lex_rank
                    FROM bmt),
            q AS (SELECT embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id = 0),
            cs AS (
              SELECT vec_id, round(
                list_inner_product(embedding::DOUBLE[], q.qv)
                / (sqrt(list_inner_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))
                   * sqrt(list_inner_product(q.qv, q.qv))), 6) AS c
              FROM embeddings, q),
            cst AS (SELECT vec_id, c FROM cs
                    ORDER BY c DESC, vec_id LIMIT 50),
            csr AS (SELECT vec_id AS id,
                           row_number() OVER (ORDER BY c DESC, vec_id)
                             AS vec_rank
                    FROM cst),
            f AS (
              SELECT coalesce(bmr.id, csr.id) AS doc_id,
                     CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
                     CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank
              FROM bmr FULL OUTER JOIN csr ON bmr.id = csr.id)
            SELECT doc_id, lex_rank, vec_rank,
                   round(
                     CASE WHEN lex_rank > 0
                          THEN 1.0 / (lex_rank + 60) ELSE 0.0 END
                   + CASE WHEN vec_rank > 0
                          THEN 1.0 / (vec_rank + 60) ELSE 0.0 END
                   , 6) AS rrf
            FROM f ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        "sim_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT vec_id FROM (
              SELECT vec_id,
                list_inner_product(embedding::DOUBLE[], q.qv)
                / (sqrt(list_inner_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))
                   * sqrt(list_inner_product(q.qv, q.qv))) AS c
              FROM embeddings, q)
            ORDER BY c DESC, vec_id LIMIT 10
        """,
        "sim_int8": """
            -- int8 mirror of ops.similarity.with_int8 + int8_topk:
            -- scale = max|x|/127 (0 -> 1.0), codes = round-half-away,
            -- rank by cosine of the dequantized vectors
            WITH q AS (SELECT embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id = 0),
            s AS (
              SELECT vec_id, embedding::DOUBLE[] AS e,
                     list_max(list_transform(embedding::DOUBLE[],
                                             x -> abs(x))) AS ax
              FROM embeddings),
            dqv AS (
              SELECT vec_id,
                     list_transform(e, x -> round(x / sc) * sc) AS dq
              FROM (SELECT vec_id, e,
                           CASE WHEN ax = 0 THEN 1.0
                                ELSE ax / 127.0 END AS sc
                    FROM s))
            SELECT vec_id FROM (
              SELECT dqv.vec_id,
                list_inner_product(dq, q.qv)
                / (sqrt(list_inner_product(dq, dq))
                   * sqrt(list_inner_product(q.qv, q.qv))) AS c
              FROM dqv, q)
            ORDER BY c DESC, vec_id LIMIT 10
        """,
        "sim_pq": """
            -- PQ mirror of ops.similarity.pq_ann (m=4 subspaces of dim 16,
            -- codebooks = subspace slices of the first 16 vectors, score
            -- ip(c,c) - 2*ip(v,c), argmin ties -> lower code, ADC sum in
            -- subspace order, top-40 candidates, exact cosine re-rank)
            WITH subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
            cb AS (
              SELECT s.sub, e.vec_id AS ci,
                     (e.embedding::DOUBLE[])[s.sub*16+1 : s.sub*16+16] AS cv
              FROM embeddings e, subs s WHERE e.vec_id < 16),
            q AS (
              SELECT s.sub,
                     (e.embedding::DOUBLE[])[s.sub*16+1 : s.sub*16+16] AS qv
              FROM embeddings e, subs s WHERE e.vec_id = 0),
            qfull AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                      WHERE vec_id = 0),
            enc AS (
              SELECT e.vec_id, s.sub,
                (SELECT ci FROM (
                    SELECT c.ci,
                      list_inner_product(c.cv, c.cv)
                      - 2.0 * list_inner_product(
                          (e.embedding::DOUBLE[])[s.sub*16+1 : s.sub*16+16],
                          c.cv) AS d
                    FROM cb c WHERE c.sub = s.sub)
                 ORDER BY d, ci LIMIT 1) AS code
              FROM embeddings e, subs s),
            adc AS (
              SELECT c.sub, c.ci,
                     list_inner_product(c.cv, c.cv)
                     - 2.0 * list_inner_product(q.qv, c.cv) AS d
              FROM cb c JOIN q USING (sub)),
            appx AS (
              SELECT enc.vec_id,
                     max(CASE WHEN enc.sub = 0 THEN adc.d END)
                   + max(CASE WHEN enc.sub = 1 THEN adc.d END)
                   + max(CASE WHEN enc.sub = 2 THEN adc.d END)
                   + max(CASE WHEN enc.sub = 3 THEN adc.d END) AS dist
              FROM enc JOIN adc
                ON adc.sub = enc.sub AND adc.ci = enc.code
              GROUP BY 1),
            cand AS (SELECT vec_id FROM appx ORDER BY dist, vec_id LIMIT 40)
            SELECT vec_id FROM (
              SELECT e.vec_id,
                list_inner_product(e.embedding::DOUBLE[], f.qv)
                / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                   * sqrt(list_inner_product(f.qv, f.qv))) AS c
              FROM embeddings e JOIN cand USING (vec_id), qfull f)
            ORDER BY c DESC, vec_id LIMIT 10
        """,
        "heavy_hitters": """
            -- capacity exceeds the vocabulary → the MG sketch is exact:
            -- top-10 word counts, ties by word, zero error
            SELECT w AS item, count(*) AS est_count,
                   CAST(0 AS BIGINT) AS max_err
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY 1 ORDER BY est_count DESC, item LIMIT 10
        """,
        "chunk_windows": """
            -- per-doc overlapping windows: starts at 1, 1+24, ... up to
            -- greatest(1, n-31); window = 32 tokens (remainder shorter);
            -- win_idx recovers as (start-1)/stride (starts arithmetic)
            SELECT doc_id,
                   count(*) AS n_windows,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                   md5(string_agg(chunk, '|' ORDER BY win_idx))
                     AS content_md5
            FROM (
              SELECT doc_id,
                     (st - 1) // 24 AS win_idx,
                     len(w[st : least(len(w), st + 31)]) AS n_tokens,
                     array_to_string(
                       w[st : least(len(w), st + 31)], ' ') AS chunk
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
                UNNEST(generate_series(1, greatest(1, len(w) - 31), 24))
                  AS t(st))
            GROUP BY 1
        """,
        "text_bm25": """
            -- Lucene-style BM25 (k1=1.2, b=0.75), mirrored term-for-term
            -- against ops/textstats.bm25_scores (avgdl = sum(dl)/N)
            WITH base AS (
              SELECT doc_id, len(string_split(text, ' ')) AS dl,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'hash')) AS tf0,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'join')) AS tf1,
                     len(list_filter(string_split(text, ' '),
                                     w -> w = 'vector')) AS tf2
              FROM documents),
            st AS (
              SELECT count(*) AS n, sum(dl) AS sum_dl,
                     sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM base)
            SELECT doc_id, round(
                ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                  * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl
                                                / (sum_dl / CAST(n AS DOUBLE))))
              + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                  * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl
                                                / (sum_dl / CAST(n AS DOUBLE))))
              + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                  * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl
                                                / (sum_dl / CAST(n AS DOUBLE))))
              , 6) AS score
            FROM base, st
            WHERE tf0 + tf1 + tf2 > 0
        """,
        "sim_knn_join": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 8),
            s AS (
              SELECT q.qid, e.vec_id AS nbr_id,
                list_inner_product(e.embedding::DOUBLE[], q.qv)
                / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                   * sqrt(list_inner_product(q.qv, q.qv))) AS c
              FROM embeddings e, q),
            r AS (
              SELECT qid, nbr_id, c,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY c DESC, nbr_id) AS rank
              FROM s)
            SELECT qid, CAST(rank AS BIGINT) AS rank, nbr_id,
                   round(c, 6) AS cosine
            FROM r WHERE rank <= 10
        """,
        "text_tokens": """
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
                   CAST(sum(CAST(ceil(length(replace(text, ' ', '')) / 4.0)
                                 AS BIGINT)
                            + len(string_split(text, ' '))) AS BIGINT)
                     AS subwords
            FROM documents GROUP BY 1
        """,
        "text_quality": """
            SELECT lang,
              round(avg(len(list_distinct(w)) / CAST(len(w) AS DOUBLE)), 6)
                AS avg_distinct_ratio,
              round(avg(list_aggregate(list_transform(w, x -> length(x)),
                                       'sum') / CAST(len(w) AS DOUBLE)), 6)
                AS avg_word_len,
              count(*) AS cnt
            FROM (SELECT lang, string_split(text, ' ') AS w FROM documents)
            GROUP BY 1
        """,
        "lang_id": """
            WITH sc AS (
              SELECT lang,
                len(list_intersect(dw, ['der','und','wert','zeile'])) AS s_de,
                len(list_intersect(dw, ['the','and','value','row'])) AS s_en,
                len(list_intersect(dw, ['el','y','valor','fila'])) AS s_es,
                len(list_intersect(dw, ['le','et','valeur','ligne'])) AS s_fr,
                len(list_intersect(dw, ['shu','biao','zhi','hang'])) AS s_zh
              FROM (SELECT lang, list_distinct(string_split(text, ' ')) AS dw
                    FROM documents))
            SELECT lang,
              CASE
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
                     AND s_de >= s_zh THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS lang_guess,
              count(*) AS cnt
            FROM sc GROUP BY 1, 2
        """,
        "doc_fingerprint": """
            SELECT source, count(DISTINCT fp) AS uniq_fp, count(*) AS cnt
            FROM (
              SELECT source,
                CASE WHEN len(w) < 5 THEN md5(text)
                ELSE (SELECT min(md5(concat_ws(' ', w[i], w[i+1], w[i+2],
                                               w[i+3], w[i+4])))
                      FROM UNNEST(generate_series(1, len(w) - 4)) AS t(i))
                END AS fp
              FROM (SELECT source, text, string_split(text, ' ') AS w
                    FROM documents))
            GROUP BY 1
        """,
        "media_meta": """
            -- strlen = UTF-8 BYTE length (the Spark side measures the
            -- encoded blob, media.py stub_decoder), not character count
            SELECT doc_id % 10 AS bucket,
                   CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
                   CAST(sum(strlen(text) % 640 + 1) AS BIGINT) AS sum_width,
                   CAST(sum((strlen(text) * 7) % 480 + 1) AS BIGINT)
                     AS sum_height
            FROM documents GROUP BY 1
        """,
        "media_resize": """
            -- repeat-truncate stub resize mirrored on the UTF-8 source
            -- text (ASCII corpus: byte ops == char ops); empty text is
            -- 64 NUL bytes
            SELECT doc_id,
                   md5(CASE WHEN strlen(text) = 0
                            THEN repeat(chr(0), 64)
                            ELSE substr(repeat(text,
                                   CAST(ceil(64.0 / strlen(text)) AS BIGINT)),
                                   1, 64) END) AS content_md5,
                   CAST(64 AS INT) AS n_bytes
            FROM documents
        """,
        "media_features": """
            -- stub encoder: feature j = ((n_bytes * (j + 13)) % 997) / 997
            SELECT doc_id % 10 AS bucket,
                   round(sum(((strlen(text) * 13) % 997) / 997.0), 6)
                     AS sum_f0,
                   round(sum(((strlen(text) * 28) % 997) / 997.0), 6)
                     AS sum_f15,
                   count(*) AS cnt
            FROM documents GROUP BY 1
        """,
        "media_frames": """
            SELECT CAST(sum(k) AS BIGINT) AS n_frames,
                   CAST(sum(k * (k - 1) // 2) AS BIGINT) AS sum_idx,
                   CAST(sum(k * 16) AS BIGINT) AS sum_len
            FROM (SELECT least(8, strlen(text) // 64) AS k FROM documents)
        """,
        "media_phash_dedup": """
            -- block-mean pHash replayed from the ASCII text (byte value
            -- == ord of each char); brute-force pair scan — the Spark
            -- side must find the same pairs via Hamming banding
            WITH b AS (
              SELECT doc_id, strlen(text) AS n,
                     list_transform(range(1, length(text) + 1),
                                    i -> ord(substr(text, i, 1))) AS bv
              FROM documents WHERE strlen(text) > 0
            ), m AS (
              SELECT doc_id, n, bv,
                     CAST(list_aggregate(bv, 'sum') AS DOUBLE) / n AS mu
              FROM b
            ), blocks AS (
              SELECT doc_id, j, mu,
                     ((j+1)*n)//16 - (j*n)//16 AS cnt,
                     CASE WHEN ((j+1)*n)//16 > (j*n)//16
                          THEN list_aggregate(
                                 list_slice(bv, (j*n)//16 + 1,
                                            ((j+1)*n)//16), 'sum')
                          ELSE 0 END AS sm
              FROM m CROSS JOIN
                   (SELECT CAST(range AS BIGINT) AS j FROM range(0, 16))
            ), p AS (
              SELECT doc_id,
                     CAST(COALESCE(SUM(CASE WHEN cnt > 0
                              AND CAST(sm AS DOUBLE)/cnt > mu
                              THEN (CAST(1 AS BIGINT) << j)
                              ELSE 0 END), 0) AS BIGINT) AS phash
              FROM blocks GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     bit_count(xor(a.phash, b.phash)) AS hamming
              FROM p a JOIN p b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.phash, b.phash)) <= 3
            )
            SELECT CAST(hamming AS INT) AS hamming,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(id_a + id_b) AS BIGINT) AS id_checksum
            FROM pairs GROUP BY hamming ORDER BY hamming
        """,
        "media_dedup_groups": """
            -- pHash pairs at d<=1 + recursive reachability closure =
            -- the Spark side's star-contraction connected components
            WITH RECURSIVE b AS (
              SELECT doc_id, strlen(text) AS n,
                     list_transform(range(1, length(text) + 1),
                                    i -> ord(substr(text, i, 1))) AS bv
              FROM documents WHERE strlen(text) > 0
            ), m AS (
              SELECT doc_id, n, bv,
                     CAST(list_aggregate(bv, 'sum') AS DOUBLE) / n AS mu
              FROM b
            ), blocks AS (
              SELECT doc_id, j, mu,
                     ((j+1)*n)//16 - (j*n)//16 AS cnt,
                     CASE WHEN ((j+1)*n)//16 > (j*n)//16
                          THEN list_aggregate(
                                 list_slice(bv, (j*n)//16 + 1,
                                            ((j+1)*n)//16), 'sum')
                          ELSE 0 END AS sm
              FROM m CROSS JOIN
                   (SELECT CAST(range AS BIGINT) AS j FROM range(0, 16))
            ), p AS (
              SELECT doc_id,
                     CAST(COALESCE(SUM(CASE WHEN cnt > 0
                              AND CAST(sm AS DOUBLE)/cnt > mu
                              THEN (CAST(1 AS BIGINT) << j)
                              ELSE 0 END), 0) AS BIGINT) AS phash
              FROM blocks GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM p a JOIN p b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.phash, b.phash)) <= 1
            ), sym AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs
            ), reach(node, lab) AS (
              SELECT doc_id, doc_id FROM p
              UNION
              SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            ), comp AS (
              SELECT node AS doc_id, min(lab) AS component
              FROM reach GROUP BY 1
            ), sizes AS (
              SELECT component, count(*) AS size FROM comp GROUP BY 1
            )
            SELECT CAST(size AS BIGINT) AS size,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(component) AS BIGINT) AS comp_checksum
            FROM sizes GROUP BY size ORDER BY size
        """,
        "sessionization": """
            SELECT user_id,
                   CAST(sum(CASE WHEN prev IS NULL OR sec - prev > 1800
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM (
              SELECT user_id, sec,
                     lag(sec) OVER (PARTITION BY user_id
                                    ORDER BY sec, event_id) AS prev
              FROM (SELECT user_id, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec
                    FROM events))
            GROUP BY 1
        """,
        "tile_pyramid": """
            WITH pts AS (
              SELECT ((event_id*1103515245) % 3600000000) - 1800000000
                       AS lon7,
                     ((event_id*1234567891) % 1700000000) - 850000000
                       AS lat7
              FROM events),
            zl AS (SELECT * FROM (VALUES (6, 56250000, 64),
                                         (4, 225000000, 16),
                                         (2, 900000000, 4))
                   AS t(zoom, w, nx))
            SELECT zoom,
                   CAST(((lat7 + 900000000) // w) * nx
                        + ((lon7 + 1800000000) // w) AS BIGINT) AS cell,
                   count(*) AS cnt
            FROM pts, zl
            GROUP BY 1, 2
        """,
        "stream_windowed_counts": """
            SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)
                     AS win_start,
                   event_type, count(*) AS cnt
            FROM events GROUP BY 1, 2
        """,
        "stream_tile_counts": """
            -- batch replay of the streaming rollup: 7-day tumbling
            -- windows aligned to epoch 0, zoom-4 XYGrid cells (integral
            -- width 2.25e8; derived coords never hit the wrap borders)
            SELECT CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT)
                     AS win_start,
                   ((lat7 + 900000000) // 225000000) * 16
                   + ((lon7 + 1800000000) // 225000000) AS cell,
                   count(*) AS cnt
            FROM (
              SELECT ts,
                     ((event_id*1103515245) % 3600000000)
                       - 1800000000 AS lon7,
                     ((event_id*1234567891) % 1700000000)
                       - 850000000 AS lat7
              FROM events)
            GROUP BY 1, 2
        """,
        "stream_dedup": """
            SELECT md5(text) AS fingerprint,
                   CAST(min(doc_id) AS BIGINT) AS keep_id
            FROM documents GROUP BY 1
        """,
        "stream_asof_enrich": """
            -- batch equivalent of the stream-static point-in-time
            -- enrichment: native ASOF LEFT JOIN, no tolerance
            WITH p AS (
              SELECT event_id, user_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ), b AS (
              SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS bsec,
                     max(value) AS err_value
              FROM events WHERE event_type = 'error' GROUP BY 1, 2
            ), m AS (
              SELECT p.event_type, p.sec, b.bsec AS r_bsec,
                     b.err_value AS r_err_value
              FROM p ASOF LEFT JOIN b
                ON p.user_id = b.user_id AND p.sec >= b.bsec
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN r_err_value IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                   round(sum(coalesce(r_err_value, 0)), 2) AS err_sum,
                   round(avg(sec - r_bsec), 4) AS avg_lag
            FROM m GROUP BY 1
        """,
        "stream_contrib_tracker": """
            WITH ded AS (
              SELECT user_id, event_type, sec FROM (
                SELECT user_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                       row_number() OVER (
                         PARTITION BY user_id,
                                      CAST(floor(epoch(ts)) AS BIGINT)
                         ORDER BY event_id) AS rn
                FROM events) WHERE rn = 1
            ),
            v AS (
              SELECT user_id, event_type, sec,
                     (event_type <> 'error') AS vis,
                     CAST((row_number() OVER (PARTITION BY user_id
                                              ORDER BY sec) - 1) // 3
                          AS BIGINT) AS g
              FROM ded
            ),
            l AS (
              SELECT user_id, vis, event_type, g,
                     coalesce(lag(vis) OVER w, FALSE) AS lv,
                     coalesce(lag(event_type) OVER w, '') AS le,
                     coalesce(lag(g) OVER w, -1) AS lg
              FROM v WINDOW w AS (PARTITION BY user_id ORDER BY sec)
            )
            SELECT user_id,
                   CAST(sum(CASE WHEN vis AND NOT lv THEN 1 ELSE 0 END)
                        AS BIGINT) AS creations,
                   CAST(sum(CASE WHEN NOT vis AND lv THEN 1 ELSE 0 END)
                        AS BIGINT) AS deletions,
                   CAST(sum(CASE WHEN vis AND lv AND event_type <> le
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tag_changes,
                   CAST(sum(CASE WHEN vis AND lv AND g <> lg
                                 THEN 1 ELSE 0 END) AS BIGINT) AS geom_changes,
                   count(*) AS n_versions
            FROM l GROUP BY 1
        """,
        "quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
            FROM lineitem GROUP BY 1
        """,
        "topk_orders": """
            SELECT o_orderkey FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
    }
    # store-backed queries are semantics-preserving re-reads of the same
    # docs through the flat kernel-ready ETL layout — they share their
    # raw-path twins' oracles verbatim
    out["store_snapshot_bbox_tag"] = out["snapshot_bbox_tag"]
    out["store_relation_length"] = out["relation_snapshot_length"]
    out["store_snapshot_polygon"] = out["snapshot_polygon"]
    return out
