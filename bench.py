"""Bench harness (driver contract): headline queries at $SPARK_GRAFT_SF_DIR
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the engine's characteristic plans:
  - snapshot_sql        pure-Catalyst node snapshot path (scale path)
  - snapshot_kernel     pandas snapshot kernel w/ bbox clip + tag filter
  - contribution_kernel contribution-type extraction
  - snapshot_synth      flagship: snapshot spatial join over a synthetic
                        interleaved docs table (BASELINE.json metric —
                        docs/sec reported as `docs_per_sec`)
  - cell_assign         XYGrid tile assignment + count (whole-stage codegen)
  - traj_length         windowed geodesic length (equirect formula, JVM)
  - nation_join         broadcast dim join + agg

Scaling evidence (north rule, N vs 4N executors) is produced by
tools/scaling_bench.py which shells out to this file at two parallelism
levels — see BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_SYNTH_DOCS", "100000"))


def main():
    import __spark_entry__ as E
    from oshdb_spark.kernels.snapshot import snapshots
    from oshdb_spark.model.history import SNAPSHOT_TS
    from oshdb_spark.model.synth import synth_docs_sql
    from oshdb_spark.session import build_session

    spark = build_session("bench", master=f"local[{CPUS}]")
    spark.range(10_000).selectExpr("sum(id)").collect()  # JVM warmup
    # warm the two plan shapes once (codegen JIT + python worker pool) —
    # a cluster amortizes this across the job; the timings below measure
    # steady-state execution
    from pyspark.sql import functions as _F

    _wdocs = synth_docs_sql(spark, 2000, versions_per_doc=4)
    snapshots(_wdocs, SNAPSHOT_TS[:2]).groupBy("ts").count().collect()
    E.q_snapshot_count(spark, SF_DIR.replace("sf0.1", "sf0.001")).collect()

    # materialize the synth docs ONCE (untimed) — the engine queries
    # stored docs; generating+encoding inline would double-count string
    # bandwidth no per-query deployment pays (same methodology as
    # tools/scaling_bench.py)
    import tempfile

    synth_path = os.path.join(tempfile.mkdtemp(prefix="benchdocs"), "docs.parquet")
    synth_docs_sql(spark, SYNTH_DOCS, versions_per_doc=4).write.parquet(synth_path)

    def synth_snapshot(spark, sf_dir):
        docs = spark.read.parquet(synth_path)
        # type_in node matches the driver flagship entry()'s .osm_type
        # declaration — typed queries skip the way/relation member-table
        # projections entirely (kernels.snapshot._allowed_types)
        snaps = snapshots(
            docs,
            SNAPSHOT_TS,
            bbox=(-120.0, -60.0, 120.0, 60.0),
            filter_spec=[("type_in", ["node"]), ("tag_eq", "amenity", "cafe")],
        )
        from pyspark.sql import functions as F

        return snaps.groupBy("ts").agg(F.count(F.lit(1)).alias("cnt"))

    # way-kernel workload: member-recursion snapshots + geodesic length
    # (the reference's expensive path). Events yield ~1.5k ways at sf0.1 —
    # replicate ×20 (distinct doc ids, untimed, stored) so the kernel
    # cost dominates Spark fixed overhead.
    from oshdb_spark.model.history import way_docs_from_events

    way_reps = int(os.environ.get("SPARK_GRAFT_WAY_REPS", "20"))
    way_path = os.path.join(tempfile.mkdtemp(prefix="benchways"), "ways.parquet")
    _ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _wd = way_docs_from_events(_ev)
    _reps = spark.range(way_reps).select(_F.col("id").alias("rep"))
    # store-v2 typed layout (native versions/members next to the spans,
    # same treatment as the flagship corpus): typed_docs passes the
    # columns through with zero from_json; replicas share `id` exactly
    # as the raw meta-span decode produced
    (_wd.crossJoin(_reps)
        .select(_F.concat("doc_id", _F.lit("#"), "rep").alias("doc_id"),
                "spans", "entity_type", _wd["id"], "versions", "members")
        .repartition(CPUS).write.parquet(way_path))
    way_docs_n = spark.read.parquet(way_path).count()

    def way_snapshot_length(spark, sf_dir):
        from oshdb_spark.geo.measures import wkb_length_m

        docs = spark.read.parquet(way_path)
        snaps = snapshots(docs, SNAPSHOT_TS, filter_spec=[("type_in", ["way"])])
        return (
            snaps.withColumn("len_m", wkb_length_m("geom_wkb"))
            .groupBy("ts")
            .agg(_F.count(_F.lit(1)).alias("cnt"),
                 _F.round(_F.sum("len_m"), 0).alias("total_len_m"))
        )

    # relation workload (general per-doc path: 2-level member recursion)
    from oshdb_spark.model.history import relation_docs_from_events

    rel_reps = int(os.environ.get("SPARK_GRAFT_REL_REPS", "10"))
    rel_path = os.path.join(tempfile.mkdtemp(prefix="benchrels"), "rels.parquet")
    _rd = relation_docs_from_events(_ev)
    _rreps = spark.range(rel_reps).select(_F.col("id").alias("rep"))
    (_rd.crossJoin(_rreps)
        .select(_F.concat("doc_id", _F.lit("#"), "rep").alias("doc_id"),
                "spans", "entity_type", _rd["id"], "versions", "members")
        .repartition(CPUS).write.parquet(rel_path))
    rel_docs_n = spark.read.parquet(rel_path).count()

    def relation_snapshot_length(spark, sf_dir):
        from oshdb_spark.geo.measures import wkb_length_m

        docs = spark.read.parquet(rel_path)
        snaps = snapshots(
            docs, SNAPSHOT_TS, filter_spec=[("type_in", ["relation"])]
        )
        return (
            snaps.withColumn("len_m", wkb_length_m("geom_wkb"))
            .groupBy("ts")
            .agg(_F.count(_F.lit(1)).alias("cnt"),
                 _F.round(_F.sum("len_m"), 0).alias("total_len_m"))
        )

    qs = {
        "snapshot_sql": E.q_snapshot_count,
        "snapshot_kernel": E.q_snapshot_bbox_tag,
        "contribution_kernel": E.q_contribution_types,
        "snapshot_synth": synth_snapshot,
        "way_kernel": way_snapshot_length,
        "relation_kernel": relation_snapshot_length,
        "cell_assign": E.q_cell_count_z6,
        "traj_length": E.q_geodesic_traj_length,
        "nation_join": E.q_agg_by_index_nation,
    }

    # min-of-3 default: this VM's run-to-run variance widened to 2-5×
    # within a single session (BASELINE.md round-3 notes); two samples
    # routinely both land in a slow burst
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in qs.items():
        best = float("inf")
        out = []
        for _ in range(reps):  # min-of-N: this VM shows heavy run-to-run
            t0 = time.time()   # variance (noisy neighbors / CPU steal)
            out = fn(spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        rows[name] = len(out)

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query wall time (sum)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "synth_docs": SYNTH_DOCS,
        "docs_per_sec": round(SYNTH_DOCS / times["snapshot_synth"], 1),
        "way_docs": way_docs_n,
        "way_docs_per_sec": round(way_docs_n / times["way_kernel"], 1),
        "rel_docs": rel_docs_n,
        "rel_docs_per_sec": round(rel_docs_n / times["relation_kernel"], 1),
        "rows": rows,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
