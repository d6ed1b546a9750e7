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


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "snapshot_count": q_snapshot_count,
        "snapshot_bbox_tag": q_snapshot_bbox_tag,
        "contribution_types": q_contribution_types,
        "contrib_monthly_zerofill": q_contrib_monthly_zerofill,
        "reducer_group_sum_avg": q_reducer_group_sum_avg,
        "reducer_count_uniq": q_reducer_count_uniq,
        "reducer_weighted_avg": q_reducer_weighted_avg,
        "agg_by_index_nation": q_agg_by_index_nation,
        "cell_count_z6": q_cell_count_z6,
        "geodesic_traj_length": q_geodesic_traj_length,
        "zonal_sum_latband": q_zonal_sum_latband,
    }


def oracle_sql() -> dict[str, str]:
    contrib_states = f"""
      SELECT g.*,
             lag(visible) OVER w AS lv,
             lag(event_type) OVER w AS let,
             lag((version-1)//3) OVER w AS lg
      FROM geo g
      WINDOW w AS (PARTITION BY id ORDER BY version)
    """
    return {
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
        "zonal_sum_latband": """
            SELECT (lat7 + 850000000) // 100000000 AS zone,
                   count(*) AS cnt, round(sum(value), 2) AS sum_val
            FROM (
              SELECT ((event_id*1234567891) % 1700000000) - 850000000 AS lat7,
                     value
              FROM events)
            GROUP BY 1
        """,
    }
