"""Spatial-join layer tests: region splitter, kNN, zonal aggregation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oshdb_spark.geo import spatial_join as SJ
from oshdb_spark.geo.clip import points_in_polygon

SF = "/root/testdata/sf0.001"


def _points(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1_234_567_891), F.lit(1_700_000_000)) - 850_000_000
    return ev.withColumn("lon", lon7).withColumn("lat", lat7)


RECTS = {
    "west": (-180.0, -85.0, 0.0, 85.0),
    "east": (0.0, -85.0, 180.0, 85.0),
    "tropics": (-180.0, -23.5, 180.0, 23.5),  # overlaps both
}
# same rectangles expressed as polygon rings
RECT_POLYS = {
    k: [[(w, s), (e, s), (e, n), (w, n), (w, s)]]
    for k, (w, s, e, n) in RECTS.items()
}


def test_split_bbox_vs_polygon_paths_agree(spark):
    pts = _points(spark)
    a = (
        SJ.split_by_regions(pts, RECTS)
        .groupBy("region").count().orderBy("region").collect()
    )
    b = (
        SJ.split_by_regions(pts, RECT_POLYS)
        .groupBy("region").count().orderBy("region").collect()
    )
    assert [(r.region, r["count"]) for r in a] == [
        (r.region, r["count"]) for r in b
    ]
    # overlapping regions double-emit (GeometrySplitter semantics)
    total = sum(r["count"] for r in a)
    assert total > pts.count()


def test_aggregate_by_geometry(spark):
    pts = _points(spark)
    out = SJ.aggregate_by_geometry(
        pts, RECTS, [], [F.count(F.lit(1)).alias("cnt"),
                         F.round(F.sum("value"), 2).alias("sv")],
    ).collect()
    by = {r.region: r.cnt for r in out}
    assert set(by) == set(RECTS)
    assert by["west"] + by["east"] == pts.count()


def test_knn_matches_bruteforce(spark):
    pts = _points(spark)
    q = (10.0, 20.0)
    got = SJ.knn(pts, q[0], q[1], k=15, id_cols=["event_id"]).collect()
    # brute force reference
    rows = pts.collect()
    lat1 = np.radians(q[1])

    def d(r):
        lon, lat = r.lon * 1e-7, r.lat * 1e-7
        dlat = np.radians(lat - q[1])
        dlng = np.radians(lon - q[0]) * np.cos(np.radians((lat + q[1]) / 2))
        return 6371000.0 * np.sqrt(dlng * dlng + dlat * dlat)

    ref = sorted(rows, key=lambda r: (d(r), r.event_id))[:15]
    assert [r.event_id for r in got] == [r.event_id for r in ref]


TRIANGLE_ZONES = {
    "t1": [[(-120.0, -40.0), (40.0, -50.0), (0.0, 60.0), (-120.0, -40.0)]],
    "t2": [[(20.0, -10.0), (160.0, 0.0), (90.0, 70.0), (20.0, -10.0)]],
}


def test_zonal_polygon_vs_python_reference(spark):
    pts = _points(spark)
    out = SJ.zonal_aggregate(
        pts, TRIANGLE_ZONES, [F.count(F.lit(1)).alias("cnt")]
    ).collect()
    got = {r.zone: r.cnt for r in out}
    rows = pts.collect()
    px = np.array([r.lon * 1e-7 for r in rows])
    py = np.array([r.lat * 1e-7 for r in rows])
    for key, rings in TRIANGLE_ZONES.items():
        expect = int(
            points_in_polygon(px, py, [np.asarray(r) for r in rings]).sum()
        )
        assert got.get(key, 0) == expect


def test_rasterize_zones_interior_subset(spark):
    interior, boundary = SJ.rasterize_zones(TRIANGLE_ZONES, level=6)
    for k in TRIANGLE_ZONES:
        assert len(interior[k]) > 0
        assert len(boundary[k]) > 0
        assert not (set(interior[k]) & set(boundary[k]))


def test_knn_high_latitude_exact(spark):
    """kNN near the pole: the EW cell shrink (cos lat) must not break the
    ring-disk exactness guarantee."""
    pts = _points(spark)
    q = (30.0, 80.0)
    got = SJ.knn(pts, q[0], q[1], k=10, id_cols=["event_id"]).collect()
    rows = pts.collect()

    def d(r):
        lon, lat = r.lon * 1e-7, r.lat * 1e-7
        dlat = np.radians(lat - q[1])
        dlng = np.radians(lon - q[0]) * np.cos(np.radians((lat + q[1]) / 2))
        return 6371000.0 * np.sqrt(dlng * dlng + dlat * dlat)

    ref = sorted(rows, key=lambda r: (d(r), r.event_id))[:10]
    assert [r.event_id for r in got] == [r.event_id for r in ref]


def test_knn_batch_matches_bruteforce_two_jobs(spark):
    """knn_batch is exact for a batch (incl. a high-latitude query) and
    issues exactly TWO Spark jobs (histogram + result) — no ring loop."""
    pts = _points(spark).cache()
    pts.count()  # materialize outside the measured group
    queries = [("a", 10.0, 20.0), ("b", -120.0, -40.0), ("c", 30.0, 82.0)]
    k = 15

    sc = spark.sparkContext
    sc.setJobGroup("knn-batch-test", "knn_batch job count")
    out = SJ.knn_batch(pts, queries, k=k, id_cols=["event_id"]).collect()
    jobs = sc.statusTracker().getJobIdsForGroup("knn-batch-test")
    sc.setJobGroup(None, None)
    # two ACTIONS (histogram + result); AQE may split the result query
    # into a few sub-jobs, but the count must be a small constant that
    # does NOT grow with k/radius (i.e. no per-ring driver loop)
    sc.setJobGroup("knn-batch-test2", "knn_batch job count 2")
    SJ.knn_batch(pts, queries, k=3 * k, id_cols=["event_id"]).collect()
    jobs2 = sc.statusTracker().getJobIdsForGroup("knn-batch-test2")
    sc.setJobGroup(None, None)
    assert len(jobs) <= 8, f"knn_batch used {len(jobs)} jobs"
    assert len(jobs2) <= len(jobs) + 1, "job count grows with k (ring loop?)"

    got = {}
    for r in out:
        got.setdefault(r.qid, []).append((round(r.dist_m, 6), r.event_id))
    rows = pts.select("event_id", "lon", "lat").collect()
    import math

    for qid, qlon, qlat in queries:
        dists = []
        for r in rows:
            lat1, lon1 = qlat, qlon
            lat2, lon2 = r.lat * 1e-7, r.lon * 1e-7
            dlat = math.radians(lat2 - lat1)
            dlng = math.radians(lon2 - lon1) * math.cos(
                math.radians((lat1 + lat2) / 2.0)
            )
            dists.append(
                (6371000.0 * math.sqrt(dlng * dlng + dlat * dlat), r.event_id)
            )
        want = sorted(dists)[:k]
        assert sorted(got[qid]) == sorted(
            [(round(d, 6), e) for d, e in want]
        ), f"query {qid} mismatch"


def test_zonal_blocked_fragments_equal_full_rings(spark):
    """Blocked per-cell fragment parity (FastPolygonOperations pattern)
    must equal the full point-in-zone test — concave zone, plus points
    sitting EXACTLY on cell boundaries (cell width at level 8 is
    1.40625°, so lon = multiples of it are edge cases)."""
    import pandas as pd

    from oshdb_spark.geo.spatial_join import (
        _points_in_rings_parity, rasterize_zones, zonal_aggregate,
    )

    concave = [[
        (-10.0, -10.0), (20.0, -10.0), (20.0, 20.0), (5.0, 20.0),
        (5.0, 2.0), (-2.0, 2.0), (-2.0, 20.0), (-10.0, 20.0),
        (-10.0, -10.0),
    ]]
    zones = {"cc": concave, "box": (0.0, 0.0, 12.0, 12.0)}

    # direct check: fragment parity vs full rings on a dense lattice that
    # includes exact cell-edge coordinates
    cw = 360.0 / 256
    xs = np.concatenate([
        np.linspace(-12, 22, 171),
        np.arange(-12, 22, cw),      # exact cell-edge lons
    ])
    ys = np.linspace(-12, 22, 69)
    px, py = np.meshgrid(xs, ys)
    px, py = px.ravel(), py.ravel()
    interior, boundary, frags = rasterize_zones(zones, 8, with_fragments=True)
    from oshdb_spark.geo import cells as C

    toks = C.token_of_points(
        (px * 1e7).astype(np.int64), (py * 1e7).astype(np.int64), 8
    )
    for k, rings in [("cc", [np.asarray(r) for r in concave])]:
        full = points_in_polygon(px, py, rings)
        got = np.zeros(len(px), dtype=bool)
        iset, bset = set(interior[k]), set(boundary[k])
        for i, t in enumerate(toks):
            if t in iset:
                got[i] = True
            elif t in bset:
                got[i] = _points_in_rings_parity(
                    px[i : i + 1], py[i : i + 1], frags[k].get(t, [])
                )[0]
        assert (got == full).all(), f"{(got != full).sum()} mismatches"

    # end-to-end: zonal_aggregate over event points agrees with direct PiP
    pts = _points(spark)
    out = {r.zone: r.cnt for r in zonal_aggregate(
        pts, zones, [F.count(F.lit(1)).alias("cnt")]
    ).collect()}
    rows = pts.select("lon", "lat").toPandas()
    qx = rows["lon"].to_numpy() * 1e-7
    qy = rows["lat"].to_numpy() * 1e-7
    want_cc = int(points_in_polygon(qx, qy, [np.asarray(r) for r in concave]).sum())
    assert out.get("cc", 0) == want_cc


def test_knn_batch_with_manifest_counts_single_action(spark):
    """With a precomputed cell-count histogram (the docs store manifest),
    knn_batch skips the histogram job — same exact results."""
    pts = _points(spark).cache()
    pts.count()
    queries = [("a", 10.0, 20.0), ("b", -120.0, -40.0)]
    base = {(r.qid, r.event_id) for r in
            SJ.knn_batch(pts, queries, k=10, id_cols=["event_id"]).collect()}

    rows = pts.select("event_id", "lon", "lat").collect()
    from oshdb_spark.geo import cells as C

    toks = C.token_of_points(
        np.array([r.lon for r in rows], dtype=np.int64),
        np.array([r.lat for r in rows], dtype=np.int64), 6,
    )
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1

    sc = spark.sparkContext
    sc.setJobGroup("knn-manifest", "manifest-count knn")
    got = {(r.qid, r.event_id) for r in
           SJ.knn_batch(pts, queries, k=10, id_cols=["event_id"],
                        cell_counts=counts).collect()}
    jobs = sc.statusTracker().getJobIdsForGroup("knn-manifest")
    sc.setJobGroup(None, None)
    assert got == base
    assert len(jobs) <= 4  # single action (AQE may split), no histogram job


def test_split_geoms_by_regions_reclips(spark):
    """GeometrySplitter parity: a region-straddling LineString is split —
    each region gets ITS piece, pieces sum to the whole, and a region
    not touched produces no row."""
    import numpy as np

    from oshdb_spark.geo import geom as G
    from oshdb_spark.geo.geodesy import length_of_line
    from oshdb_spark.geo.spatial_join import split_geoms_by_regions

    line = G.linestring([(-10.0, 0.5), (10.0, 0.5)])  # crosses lon=0
    point = G.point(5.0, 0.5)
    df = spark.createDataFrame(
        [(1, G.to_wkb(line)), (2, G.to_wkb(point))], "id long, geom_wkb binary"
    )
    regions = {
        "w": (-180.00000015, -85.00000025, 0.00000035, 85.00000045),
        "e": (0.00000035, -85.00000025, 180.00000015, 85.00000045),
        "far": (100.00000035, 50.00000045, 120.00000055, 60.00000065),
    }
    rows = split_geoms_by_regions(df, regions).collect()
    by = {(r["id"], r["region"]): G.from_wkb(bytes(r["region_wkb"])) for r in rows}
    assert set(by) == {(1, "w"), (1, "e"), (2, "e")}
    lw = G.length(by[(1, "w")])
    le = G.length(by[(1, "e")])
    assert lw > 0 and le > 0
    total = length_of_line(np.asarray(line[1]))
    assert abs(lw + le - total) < 1e-6 * total
    assert by[(2, "e")][0] == "Point"


def test_split_geoms_token_index_parity(spark):
    """Beyond 16 regions the geometry splitter routes candidates through
    the cell-token index — output must be IDENTICAL to the plain
    all-regions loop (here: forced by slicing to <16 and unioning)."""
    from oshdb_spark.geo import geom as G
    from oshdb_spark.geo.spatial_join import split_geoms_by_regions

    # 6x6 off-lattice grid of regions over [-60,60]^2 (36 > 16 → index)
    regions = {}
    for gx in range(6):
        for gy in range(6):
            w = -60.0 + 20.0 * gx + 1.5e-7
            s = -60.0 + 20.0 * gy + 2.5e-7
            regions[f"r{gx}_{gy}"] = (w, s, w + 20.0, s + 20.0)
    lines = [
        (i, G.to_wkb(G.linestring([(-55.0 + 7 * i, -58.0 + 11 * i),
                                   (-41.0 + 7 * i, -47.0 + 11 * i)])))
        for i in range(10)
    ]
    df = spark.createDataFrame(lines, "id long, geom_wkb binary")
    got = {
        (r["id"], r["region"], bytes(r["region_wkb"]))
        for r in split_geoms_by_regions(df, regions).collect()
    }
    # reference: run each region alone (plain loop, no index)
    want = set()
    for k, box in regions.items():
        for r in split_geoms_by_regions(df, {k: box}).collect():
            want.add((r["id"], r["region"], bytes(r["region_wkb"])))
    assert got == want and len(got) > 10


def test_split_contribution_geoms_by_regions(spark):
    """Contribution-view GeometrySplitter parity (GeometrySplitter.java:
    141-203): regions match on the before∪after envelope, both sides are
    re-clipped at the region edge, a fully-inside match passes through
    unclipped, a creation keeps its NULL before, and a region where both
    clips are empty yields no row."""
    import numpy as np

    from oshdb_spark.geo import geom as G
    from oshdb_spark.geo.geodesy import length_of_line
    from oshdb_spark.geo.spatial_join import (
        split_contribution_geoms_by_regions,
    )

    # way moved across lon=0: before entirely west, after straddles
    before = G.linestring([(-10.0, 0.5), (-1.0, 0.5)])
    after = G.linestring([(-10.0, 0.5), (10.0, 0.5)])
    # fully-inside-west edit
    b2 = G.linestring([(-20.0, 10.0), (-19.0, 10.0)])
    a2 = G.linestring([(-20.0, 10.0), (-18.0, 10.0)])
    # creation (no before), east only
    a3 = G.linestring([(5.0, -10.0), (6.0, -10.0)])
    df = spark.createDataFrame(
        [
            (1, G.to_wkb(before), G.to_wkb(after)),
            (2, G.to_wkb(b2), G.to_wkb(a2)),
            (3, None, G.to_wkb(a3)),
        ],
        "id long, before_wkb binary, after_wkb binary",
    )
    regions = {
        "w": (-180.00000015, -85.00000025, 0.00000035, 85.00000045),
        "e": (0.00000035, -85.00000025, 180.00000015, 85.00000045),
        "far": (100.00000035, 50.00000045, 120.00000055, 60.00000065),
    }
    rows = split_contribution_geoms_by_regions(df, regions).collect()
    by = {
        (r["id"], r["region"]): (
            G.from_wkb(bytes(r["region_before_wkb"]))
            if r["region_before_wkb"] is not None else None,
            G.from_wkb(bytes(r["region_after_wkb"]))
            if r["region_after_wkb"] is not None else None,
        )
        for r in rows
    }
    assert set(by) == {(1, "w"), (1, "e"), (2, "w"), (3, "e")}
    # straddling way: west keeps the full before + the west piece of
    # after; east has NO before piece and the east piece of after
    bw, aw = by[(1, "w")]
    be, ae = by[(1, "e")]
    assert be is None
    total_after = length_of_line(np.asarray(after[1]))
    lw = G.length(aw)
    le = G.length(ae)
    assert abs(lw + le - total_after) < 1e-6 * total_after
    assert abs(G.length(bw) - length_of_line(np.asarray(before[1]))) < 1e-9
    # fully inside: bitwise pass-through (no re-clip round trip)
    b2o, a2o = by[(2, "w")]
    assert G.to_wkb(b2o) == G.to_wkb(b2) and G.to_wkb(a2o) == G.to_wkb(a2)
    # creation: before stays NULL
    b3o, a3o = by[(3, "e")]
    assert b3o is None and a3o is not None


def test_knn_single_query_action_count(spark):
    """Interactive knn = knn_batch with one query: exactly ONE action with
    a store manifest (cell_counts), TWO without (histogram + disk scan) —
    no per-ring driver loop."""
    # Spark 4: the concrete class is classic.dataframe.DataFrame (the
    # pyspark.sql.DataFrame name is the abstract facade)
    from pyspark.sql.classic.dataframe import DataFrame as DF
    from pyspark.sql import functions as F

    from oshdb_spark.geo.spatial_join import knn

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select("event_id")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon", lon7).withColumn("lat", lat7)

    calls = {"n": 0}
    orig_collect, orig_count = DF.collect, DF.count

    def wrap_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    def wrap_count(self):
        calls["n"] += 1
        return orig_count(self)

    # reference result (no instrumentation)
    expect = [r["event_id"] for r in knn(pts, 10.0, 20.0, k=7, id_cols=["event_id"]).collect()]

    DF.collect, DF.count = wrap_collect, wrap_count
    try:
        calls["n"] = 0
        got = [r["event_id"] for r in knn(pts, 10.0, 20.0, k=7, id_cols=["event_id"]).collect()]
        assert calls["n"] == 2  # histogram + final scan
        # with a precomputed histogram: single action
        from oshdb_spark.geo import cells
        import numpy as np
        import pandas as pd
        rows = pts.select("lon", "lat").toPandas()
        toks = cells.token_of_points(
            rows["lon"].to_numpy(np.int64), rows["lat"].to_numpy(np.int64), 6
        )
        counts = pd.Series(toks).value_counts().to_dict()
        calls["n"] = 0
        got2 = [r["event_id"] for r in knn(
            pts, 10.0, 20.0, k=7, id_cols=["event_id"], cell_counts=counts
        ).collect()]
        assert calls["n"] == 1  # manifest radius: disk scan only
    finally:
        DF.collect, DF.count = orig_collect, orig_count
    assert got == expect and got2 == expect


def test_split_by_regions_thousand_polygons(spark):
    """Indexed polygon splitter at region counts where the naive
    per-region loop would melt: 1,000 square polygon regions, results
    equal brute-force point-in-polygon."""
    import time

    import numpy as np
    from pyspark.sql import functions as F

    from oshdb_spark.geo.clip import points_in_polygon
    from oshdb_spark.geo.spatial_join import split_by_regions

    rng = np.random.default_rng(7)
    regions = {}
    for i in range(1000):
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-80, 80))
        s = float(rng.uniform(1.0, 6.0))
        regions[f"z{i}"] = [[(cx, cy), (cx + s, cy), (cx + s, cy + s),
                             (cx, cy + s), (cx, cy)]]
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select("event_id")
    lon7 = F.pmod(F.col("event_id") * F.lit(1103515245), F.lit(3_600_000_000)) - 1_800_000_000
    lat7 = F.pmod(F.col("event_id") * F.lit(1234567891), F.lit(1_700_000_000)) - 850_000_000
    pts = ev.withColumn("lon", lon7).withColumn("lat", lat7)
    t0 = time.time()
    got = split_by_regions(pts, regions).select("event_id", "region").collect()
    elapsed = time.time() - t0
    got_set = {(r["event_id"], r["region"]) for r in got}

    rows = pts.toPandas()
    px = rows["lon"].to_numpy(np.float64) * 1e-7
    py = rows["lat"].to_numpy(np.float64) * 1e-7
    expect = set()
    for k, rings in regions.items():
        inside = points_in_polygon(px, py, [np.asarray(r) for r in rings])
        for i in np.nonzero(inside)[0]:
            expect.add((int(rows["event_id"].iloc[i]), k))
    assert got_set == expect
    assert len(expect) > 0
    print(f"1000-region split: {len(rows)} pts in {elapsed:.2f}s")


def test_polygon_aggregate_blocks_exact(spark):
    """GeoBlocks pattern: partials for interior cells + exact boundary
    refinement must equal the direct exact aggregation, and the interior
    must actually carry mass (the raw-row-free path is exercised)."""
    import numpy as np

    from oshdb_spark.geo.spatial_join import (
        build_cell_partials,
        polygon_aggregate_blocks,
        rasterize_zones,
    )

    rng = np.random.default_rng(5)
    n = 20_000
    lon7 = rng.integers(-1_500_000_000, 1_500_000_000, n)
    lat7 = rng.integers(-800_000_000, 800_000_000, n)
    val = rng.integers(0, 100, n)
    df = spark.createDataFrame(
        [(int(a), int(b), int(v)) for a, b, v in zip(lon7, lat7, val)],
        "lon7 long, lat7 long, value long",
    )
    poly = [np.array([
        (-100.0000017, -50.0000031), (80.0000013, -60.0000029),
        (120.0000019, 50.0000023), (-80.0000011, 60.0000037),
        (-100.0000017, -50.0000031),
    ])]
    level = 4
    got = polygon_aggregate_blocks(
        build_cell_partials(
            df, [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
            level=level,
        ),
        df, poly, ["cnt", "sv"],
        [F.count(F.lit(1)), F.sum("value")], level=level,
    ).collect()[0]

    from oshdb_spark.geo.clip import points_in_polygon

    inside = points_in_polygon(lon7 * 1e-7, lat7 * 1e-7, poly)
    assert got["cnt"] == int(inside.sum())
    assert got["sv"] == int(val[inside].sum())
    interior, boundary, _ = rasterize_zones({"q": poly}, level,
                                            with_fragments=True)
    assert interior["q"]  # the metadata-only path carries real mass
    assert boundary["q"]


def test_polygon_aggregate_blocks_disjoint_is_zero(spark):
    """A polygon disjoint from the data aggregates to 0, not NULL."""
    import numpy as np

    from oshdb_spark.geo.spatial_join import (
        build_cell_partials,
        polygon_aggregate_blocks,
    )

    df = spark.createDataFrame(
        [(10_000_000, 10_000_000, 5)], "lon7 long, lat7 long, value long"
    )
    poly = [np.array([(100.0, 50.0), (110.0, 50.0), (110.0, 60.0),
                      (100.0, 60.0), (100.0, 50.0)])]
    got = polygon_aggregate_blocks(
        build_cell_partials(df, [F.count(F.lit(1)).alias("cnt")], level=4),
        df, poly, ["cnt"], [F.count(F.lit(1))], level=4,
    ).collect()[0]
    assert got["cnt"] == 0


# ---------------------------------------------------------------------------
# pip_join_regions_table (PBSM two-table join)
# ---------------------------------------------------------------------------

def _pbsm_fixtures(spark, n_pts=400, n_reg=23):
    import numpy as np

    rng = np.random.default_rng(7)
    lon7 = rng.integers(-1_799_999_999, 1_799_999_999, n_pts)
    lat7 = rng.integers(-899_999_999, 899_999_999, n_pts)
    pts = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(lon7, lat7))],
        "pid long, lon7 long, lat7 long",
    )
    w = rng.integers(-1_700_000_000, 1_500_000_000, n_reg)
    e = w + rng.integers(1_000_000, 300_000_000, n_reg)
    s = rng.integers(-850_000_000, 700_000_000, n_reg)
    n = s + rng.integers(1_000_000, 150_000_000, n_reg)
    regs = spark.createDataFrame(
        [
            (int(i), int(a), int(b), int(c), int(d))
            for i, (a, b, c, d) in enumerate(zip(w, s, e, n))
        ],
        "rid long, w7 long, s7 long, e7 long, n7 long",
    )
    return pts, regs


def _naive_pairs(pts, regs):
    got = set()
    for p in pts.collect():
        for r in regs.collect():
            if (
                r["w7"] <= p["lon7"] <= r["e7"]
                and r["s7"] <= p["lat7"] <= r["n7"]
            ):
                got.add((p["pid"], r["rid"]))
    return got


def test_pip_join_matches_naive_cross_join(spark):
    from oshdb_spark.geo.spatial_join import pip_join_regions_table

    pts, regs = _pbsm_fixtures(spark)
    exp = _naive_pairs(pts, regs)
    for zoom in (4, 6, 12):
        got = {
            (r["pid"], r["rid"])
            for r in pip_join_regions_table(pts, regs, zoom=zoom).collect()
        }
        assert got == exp, f"zoom={zoom}"


def test_pip_join_salt_invariant(spark):
    from oshdb_spark.geo.spatial_join import pip_join_regions_table

    pts, regs = _pbsm_fixtures(spark, n_pts=200, n_reg=9)
    base = {
        (r["pid"], r["rid"])
        for r in pip_join_regions_table(pts, regs, zoom=5).collect()
    }
    salted = {
        (r["pid"], r["rid"])
        for r in pip_join_regions_table(
            pts, regs, zoom=5, n_salts=8
        ).collect()
    }
    assert salted == base


def test_pip_join_no_duplicate_pairs(spark):
    from oshdb_spark.geo.spatial_join import pip_join_regions_table

    pts, regs = _pbsm_fixtures(spark, n_pts=300, n_reg=11)
    rows = pip_join_regions_table(pts, regs, zoom=3).collect()
    pairs = [(r["pid"], r["rid"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_pip_join_polygons_matches_full_scan(spark):
    import numpy as np

    from oshdb_spark.geo.clip import points_in_polygon
    from oshdb_spark.geo.spatial_join import pip_join_polygons_table

    rng = np.random.default_rng(11)
    lon7 = rng.integers(-1_700_000_000, 1_700_000_000, 500)
    lat7 = rng.integers(-850_000_000, 850_000_000, 500)
    pts = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(lon7, lat7))],
        "pid long, lon7 long, lat7 long",
    )
    polys = []
    rings = {}
    for rid in range(7):
        cx = float(rng.uniform(-150, 150))
        cy = float(rng.uniform(-70, 70))
        rad = float(rng.uniform(3, 25))
        ang = np.sort(rng.uniform(0, 2 * np.pi, 6))
        ring = [
            [float(cx + rad * np.cos(a)), float(cy + 0.7 * rad * np.sin(a))]
            for a in ang
        ]
        ring.append(ring[0])
        polys.append((rid, ring))
        rings[rid] = np.asarray(ring, dtype=np.float64)
    pdf = spark.createDataFrame(
        polys, "rid long, ring array<array<double>>"
    )
    exp = set()
    px = lon7.astype(np.float64) * 1e-7
    py = lat7.astype(np.float64) * 1e-7
    for rid, rg in rings.items():
        for i in np.nonzero(points_in_polygon(px, py, [rg]))[0]:
            exp.add((int(i), rid))
    for zoom, salts in ((4, 1), (7, 4)):
        got = {
            (r["pid"], r["rid"])
            for r in pip_join_polygons_table(
                pts, pdf, zoom=zoom, n_salts=salts
            ).collect()
        }
        assert got == exp, f"zoom={zoom} salts={salts}"


def test_distance_join_matches_brute_force(spark):
    import numpy as np

    from oshdb_spark.geo.spatial_join import distance_join

    rng = np.random.default_rng(23)
    n = 800
    # cluster some points so real pairs exist
    base_lon = rng.integers(-1_500_000_000, 1_500_000_000, n // 4)
    base_lat = rng.integers(-680_000_000, 680_000_000, n // 4)
    lon7 = np.concatenate(
        [base_lon + rng.integers(-30_000_000, 30_000_000, n // 4)
         for _ in range(4)]
    )
    lat7 = np.concatenate(
        [base_lat + rng.integers(-30_000_000, 30_000_000, n // 4)
         for _ in range(4)]
    )
    pts = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(lon7, lat7))],
        "pid long, lon7 long, lat7 long",
    )
    right = (
        pts.withColumnRenamed("pid", "qid")
    )
    d = 200_000.0
    got = {
        (r["pid"], r["qid"])
        for r in distance_join(pts, right, d).collect()
        if r["pid"] < r["qid"]
    }
    # brute force with the same equirect metric
    R = 6_371_000.0
    la = lat7 * 1e-7
    lo = lon7 * 1e-7
    keep = np.abs(la) <= 70.0
    exp = set()
    idx = np.nonzero(keep)[0]
    for ii, i in enumerate(idx):
        j = idx[ii + 1:]
        dlat = np.radians(la[j] - la[i])
        dlng = np.radians(lo[j] - lo[i]) * np.cos(
            np.radians((la[j] + la[i]) / 2.0)
        )
        dist = R * np.sqrt(dlat * dlat + dlng * dlng)
        for k in j[dist <= d]:
            exp.add((min(i, int(k)), max(i, int(k))))
    assert got == exp
    assert len(exp) > 50


def test_knn_join_matches_brute_force(spark):
    import numpy as np

    from oshdb_spark.geo.spatial_join import knn_join

    rng = np.random.default_rng(31)
    n = 600
    lon7 = rng.integers(-1_700_000_000, 1_700_000_000, n)
    lat7 = rng.integers(-880_000_000, 880_000_000, n)  # incl. high lats
    pts = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(lon7, lat7))],
        "pid long, lon7 long, lat7 long",
    )
    right = (
        pts.withColumnRenamed("pid", "nid")
    )
    k = 4
    out = knn_join(pts, right, k=k, zoom=6).collect()
    got = {}
    for r in out:
        got.setdefault(r["pid"], []).append((r["nid"], r["dist_m"]))
    R = 6_371_000.0
    la = lat7 * 1e-7
    lo = lon7 * 1e-7
    for i in range(n):
        dlat = np.radians(la - la[i])
        dlng = np.radians(lo - lo[i]) * np.cos(np.radians((la + la[i]) / 2))
        dist = R * np.sqrt(dlat * dlat + dlng * dlng)
        order = sorted(range(n), key=lambda j: (dist[j], j))[:k]
        want = [int(j) for j in order]
        have = [nid for nid, _ in sorted(got[i], key=lambda t: (t[1], t[0]))]
        assert have == want, f"pid={i}"

    # distributed escalation branch (local_escalation_max=0 disables the
    # driver ring-expansion): identical rows — both branches are exact
    out2 = knn_join(
        pts, right, k=k, zoom=6, local_escalation_max=0
    ).collect()
    a = sorted((r["pid"], r["nid"], round(r["dist_m"], 6)) for r in out)
    b = sorted((r["pid"], r["nid"], round(r["dist_m"], 6)) for r in out2)
    assert a == b


# ---------------------------------------------------------------------------
# overlay_join (polygon-overlay intersection join)
# ---------------------------------------------------------------------------

def _overlay_fixtures(n_a=60, n_b=60, seed=42):
    from oshdb_spark.geo.clip import ring_intersection
    from oshdb_spark.geo.geodesy import ring_area_signed

    rng = np.random.default_rng(seed)

    def convex(cx, cy, r, k):
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        pts = np.stack(
            [cx + r * np.cos(ang), cy + 0.7 * r * np.sin(ang)], axis=1
        )
        return np.vstack([pts, pts[:1]])

    A = [
        (i, convex(rng.uniform(-60, 60), rng.uniform(-50, 50),
                   rng.uniform(1, 6), rng.integers(3, 8)))
        for i in range(n_a)
    ]
    B = [
        (j, convex(rng.uniform(-60, 60), rng.uniform(-50, 50),
                   rng.uniform(1, 6), rng.integers(3, 8)))
        for j in range(n_b)
    ]
    exp = {}
    for i, ra in A:
        for j, rb in B:
            area = sum(
                abs(ring_area_signed(p)) for p in ring_intersection(ra, rb)
            )
            if area > 0:
                exp[(i, j)] = area
    return A, B, exp


def test_overlay_join_matches_brute_force(spark):
    """PBSM plumbing differential: candidate cover + reference-point
    dedup + Arrow refine reproduce the all-pairs driver loop exactly
    (same pair set, same areas), on irregular convex rings — the
    ring_intersection semantics themselves carry their own hypothesis
    suite in test_polygon_clip."""
    A, B, exp = _overlay_fixtures()
    dfa = spark.createDataFrame(
        [(i, r.tolist()) for i, r in A],
        "ida long, ring_a array<array<double>>",
    )
    dfb = spark.createDataFrame(
        [(j, r.tolist()) for j, r in B],
        "idb long, ring_b array<array<double>>",
    )
    got = {
        (r.ida, r.idb): r.area_m2
        for r in SJ.overlay_join(dfa, dfb, zoom=5).collect()
    }
    assert set(got) == set(exp)
    for k_, v in exp.items():
        assert got[k_] == v  # identical float path (same kernel fns)

    # each surviving pair appears exactly ONCE even when the bbox covers
    # share many cells (reference-point rule) -> dict size == row count
    rows = SJ.overlay_join(dfa, dfb, zoom=5).count()
    assert rows == len(got)

    # zoom- and salt-invariance of the result set
    got8 = {
        (r.ida, r.idb): r.area_m2
        for r in SJ.overlay_join(dfa, dfb, zoom=8).collect()
    }
    gots = {
        (r.ida, r.idb): r.area_m2
        for r in SJ.overlay_join(dfa, dfb, zoom=5, n_salts=3).collect()
    }
    assert got8 == got
    assert gots == got


def test_overlay_join_measure_zero_contacts_excluded(spark):
    """Shared-edge and shared-corner rectangle pairs intersect with
    measure zero -> no output row (JTS polygon-area-of-LineString == 0
    parity); a genuinely overlapping pair survives."""
    def rect(w, s, e, n):
        return [[w, s], [e, s], [e, n], [w, n], [w, s]]

    dfa = spark.createDataFrame(
        [(0, rect(0.0, 0.0, 1.0, 1.0))],
        "ida long, ring_a array<array<double>>",
    )
    dfb = spark.createDataFrame(
        [
            (0, rect(1.0, 0.0, 2.0, 1.0)),   # shared edge
            (1, rect(1.0, 1.0, 2.0, 2.0)),   # shared corner
            (2, rect(0.5, 0.5, 1.5, 1.5)),   # real overlap
            (3, rect(5.0, 5.0, 6.0, 6.0)),   # disjoint
        ],
        "idb long, ring_b array<array<double>>",
    )
    rows = SJ.overlay_join(dfa, dfb, zoom=6).collect()
    assert [(r.ida, r.idb) for r in rows] == [(0, 2)]
    from oshdb_spark.geo.geodesy import EARTH_RADIUS

    cf = (
        np.radians(0.5)
        * (np.sin(np.radians(1.0)) - np.sin(np.radians(0.5)))
        * EARTH_RADIUS ** 2
    )
    assert rows[0].area_m2 == pytest.approx(cf, rel=1e-12)


def test_clip_join_segments_matches_brute_force(spark):
    """Liang-Barsky line-clip overlay join vs an all-pairs driver loop:
    identical pair set and clipped lengths (the t-parameters are pure
    -, /, greatest/least arithmetic, so equality is exact), plus salt-
    and zoom-invariance."""
    from oshdb_spark.geo.geodesy import EARTH_RADIUS

    rng = np.random.default_rng(3)
    segs = []
    for i in range(300):
        ax = int(rng.integers(-1_600_000_000, 1_600_000_000))
        ay = int(rng.integers(-750_000_000, 750_000_000))
        segs.append((
            i, ax, ay,
            ax + int(rng.integers(-80_000_000, 80_000_000)),
            ay + int(rng.integers(-80_000_000, 80_000_000)),
        ))
    regs = []
    for j in range(40):
        w = int(rng.integers(-1_600_000_000, 1_500_000_000))
        s = int(rng.integers(-750_000_000, 700_000_000))
        regs.append((
            j, w, s,
            w + int(rng.integers(10_000_000, 200_000_000)),
            s + int(rng.integers(10_000_000, 150_000_000)),
        ))
    dfs = spark.createDataFrame(
        segs, "sid long, ax7 long, ay7 long, bx7 long, by7 long"
    )
    dfr = spark.createDataFrame(
        regs, "rid long, w7 long, s7 long, e7 long, n7 long"
    )
    got = {
        (r.sid, r.rid): r.clip_len_m
        for r in SJ.clip_join_segments(dfs, dfr, zoom=6).collect()
    }

    def clip_len(ax7, ay7, bx7, by7, w7, s7, e7, n7):
        ax, ay, bx, by, w, s, e, n = (
            v * 1e-7 for v in (ax7, ay7, bx7, by7, w7, s7, e7, n7)
        )
        dx, dy = bx - ax, by - ay

        def slab(pos, d, lo, hi):
            if d == 0:
                return (0.0, 1.0) if lo <= pos <= hi else (2.0, -1.0)
            t1, t2 = (lo - pos) / d, (hi - pos) / d
            return min(t1, t2), max(t1, t2)

        tx0, tx1 = slab(ax, dx, w, e)
        ty0, ty1 = slab(ay, dy, s, n)
        t0, t1 = max(0.0, tx0, ty0), min(1.0, tx1, ty1)
        if not t1 > t0:
            return None
        dt = t1 - t0
        mid = ay + dy * (t0 + t1) / 2.0
        dla = np.radians(dy * dt)
        dln = np.radians(dx * dt) * np.cos(np.radians(mid))
        ln = EARTH_RADIUS * np.sqrt(dla * dla + dln * dln)
        return ln if ln > 0 else None

    exp = {}
    for sid, ax7, ay7, bx7, by7 in segs:
        for rid, w7, s7, e7, n7 in regs:
            ln = clip_len(ax7, ay7, bx7, by7, w7, s7, e7, n7)
            if ln is not None:
                exp[(sid, rid)] = ln
    assert set(got) == set(exp)
    for k_, v in exp.items():
        assert got[k_] == pytest.approx(v, rel=1e-12)

    gots = {
        (r.sid, r.rid): r.clip_len_m
        for r in SJ.clip_join_segments(dfs, dfr, zoom=6, n_salts=3).collect()
    }
    got9 = {
        (r.sid, r.rid): r.clip_len_m
        for r in SJ.clip_join_segments(dfs, dfr, zoom=9).collect()
    }
    assert gots == got
    assert got9 == got


def test_clip_join_segments_degenerate_cases(spark):
    """Axis-parallel and point-degenerate segments: vertical/horizontal
    strokes clip by the slab-membership CASE; grazes along a boundary
    edge count (positive length ON the closed rect); a segment
    collapsing to a point, or touching only at a corner, yields
    nothing."""
    F7 = 10_000_000
    segs = [
        (0, 1 * F7, -1 * F7, 1 * F7, 3 * F7),    # vertical, crosses
        (1, -1 * F7, 1 * F7, 3 * F7, 1 * F7),    # horizontal, crosses
        (2, 0, 0, 0, 2 * F7),                    # along the w edge
        (3, 2 * F7, 2 * F7, 4 * F7, 4 * F7),     # corner touch (NE)
        (4, 1 * F7, 1 * F7, 1 * F7, 1 * F7),     # degenerate point
        (5, 5 * F7, 5 * F7, 6 * F7, 6 * F7),     # disjoint
    ]
    dfs = spark.createDataFrame(
        segs, "sid long, ax7 long, ay7 long, bx7 long, by7 long"
    )
    dfr = spark.createDataFrame(
        [(0, 0, 0, 2 * F7, 2 * F7)],
        "rid long, w7 long, s7 long, e7 long, n7 long",
    )
    got = {
        r.sid: r.clip_len_m
        for r in SJ.clip_join_segments(dfs, dfr, zoom=6).collect()
    }
    assert set(got) == {0, 1, 2}
    from oshdb_spark.geo.geodesy import EARTH_RADIUS

    two_deg_lat = EARTH_RADIUS * np.radians(2.0)
    assert got[0] == pytest.approx(two_deg_lat, rel=1e-12)
    assert got[2] == pytest.approx(two_deg_lat, rel=1e-12)
    assert got[1] == pytest.approx(
        EARTH_RADIUS * np.radians(2.0) * np.cos(np.radians(1.0)), rel=1e-12
    )


# ---------------------------------------------------------------------------
# nearest_segment_join (snap-to-line / map-matching primitive)
# ---------------------------------------------------------------------------

def _brute_snap(plon7, plat7, segs, d):
    """numpy replay of the probe-anchored clamped point-segment metric."""
    R = 6_371_000.0
    plon, plat = plon7 * 1e-7, plat7 * 1e-7
    k = np.cos(np.radians(plat))
    ax = np.radians(segs[:, 1] * 1e-7 - plon) * k
    ay = np.radians(segs[:, 2] * 1e-7 - plat)
    bx = np.radians(segs[:, 3] * 1e-7 - plon) * k
    by = np.radians(segs[:, 4] * 1e-7 - plat)
    vx, vy = bx - ax, by - ay
    den = vx * vx + vy * vy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(
            den == 0, 0.0, np.clip(-(ax * vx + ay * vy) / den, 0.0, 1.0)
        )
    cx, cy = ax + t * vx, ay + t * vy
    mm = np.rint(R * np.sqrt(cx * cx + cy * cy) * 1000.0).astype(np.int64)
    ok = mm <= int(round(d * 1000.0))
    if not ok.any():
        return None
    # min (mm, sid) — the op's packed tie-break contract
    cand = sorted(
        (int(mm[i]), int(segs[i, 0])) for i in np.nonzero(ok)[0]
    )
    return (cand[0][0] / 1000.0, cand[0][1])


def test_nearest_segment_join_matches_brute_force(spark):
    from oshdb_spark.geo.spatial_join import nearest_segment_join

    rng = np.random.default_rng(47)
    ns, npb = 1500, 200
    ax = rng.integers(-1_700_000_000, 1_700_000_000, ns)
    ay = rng.integers(-800_000_000, 800_000_000, ns)
    bx = ax + rng.integers(-2_000_000, 2_000_001, ns)  # ~±0.2° segments
    by = ay + rng.integers(-2_000_000, 2_000_001, ns)
    segs = np.stack([np.arange(ns), ax, ay, bx, by], axis=1)
    plon = rng.integers(-1_750_000_000, 1_750_000_000, npb)
    plat = rng.integers(-840_000_000, 840_000_000, npb)  # incl. |lat|>70

    seg_df = spark.createDataFrame(
        [tuple(int(v) for v in row) for row in segs],
        "sid long, ax7 long, ay7 long, bx7 long, by7 long",
    )
    pts_df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in
         enumerate(zip(plon, plat))],
        "pid long, lon7 long, lat7 long",
    )
    d = 300_000.0
    out = {
        r["pid"]: (r["dist_m"], r["sid"])
        for r in nearest_segment_join(pts_df, seg_df, d, zoom=6).collect()
    }
    lat_ok = np.abs(segs[:, 2] * 1e-7) <= 70.0
    lat_ok &= np.abs(segs[:, 4] * 1e-7) <= 70.0
    segs_kept = segs[lat_ok]
    n_hits = 0
    for i in range(npb):
        if abs(plat[i] * 1e-7) > 70.0:
            assert i not in out
            continue
        want = _brute_snap(float(plon[i]), float(plat[i]), segs_kept, d)
        if want is None:
            assert i not in out
        else:
            n_hits += 1
            assert i in out, f"pid={i} missing (want {want})"
            assert out[i] == (want[0], want[1]), f"pid={i}"
    assert n_hits > 30  # non-vacuous


def test_nearest_segment_join_tie_breaks_on_sid(spark):
    from oshdb_spark.geo.spatial_join import nearest_segment_join

    # two segments sharing the vertex nearest to the probe: identical
    # mm-rounded distances, contract picks the LOWER sid
    seg_df = spark.createDataFrame(
        [
            (7, 10_000_000, 10_000_000, 30_000_000, 10_000_000),
            (3, 10_000_000, 10_000_000, 10_000_000, 30_000_000),
        ],
        "sid long, ax7 long, ay7 long, bx7 long, by7 long",
    )
    pts_df = spark.createDataFrame(
        [(1, 0, 0)], "pid long, lon7 long, lat7 long"
    )
    rows = nearest_segment_join(pts_df, seg_df, 500_000.0).collect()
    assert len(rows) == 1 and rows[0]["sid"] == 3

    # a salted run returns the identical row
    rows2 = nearest_segment_join(
        pts_df, seg_df, 500_000.0, n_salts=4
    ).collect()
    assert [tuple(r) for r in rows2] == [tuple(r) for r in rows]


# ---------------------------------------------------------------------------
# hmm_map_match (Viterbi map matching)
# ---------------------------------------------------------------------------

def _brute_cands(plon7, plat7, segs, d, n_cand):
    """All (mm, sid) candidates ≤ d for one fix, pruned to top n_cand by
    (mm, sid) — the same metric replay as _brute_snap."""
    R = 6_371_000.0
    plon, plat = plon7 * 1e-7, plat7 * 1e-7
    k = np.cos(np.radians(plat))
    ax = np.radians(segs[:, 1] * 1e-7 - plon) * k
    ay = np.radians(segs[:, 2] * 1e-7 - plat)
    bx = np.radians(segs[:, 3] * 1e-7 - plon) * k
    by = np.radians(segs[:, 4] * 1e-7 - plat)
    vx, vy = bx - ax, by - ay
    den = vx * vx + vy * vy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(
            den == 0, 0.0, np.clip(-(ax * vx + ay * vy) / den, 0.0, 1.0)
        )
    cx, cy = ax + t * vx, ay + t * vy
    mm = np.rint(R * np.sqrt(cx * cx + cy * cy) * 1000.0).astype(np.int64)
    ok = np.nonzero(mm <= int(round(d * 1000.0)))[0]
    cand = sorted((int(mm[i]), int(segs[i, 0])) for i in ok)
    return cand[:n_cand]


def test_hmm_map_match_matches_path_enumeration(spark):
    """Viterbi output vs EXHAUSTIVE path enumeration (not a second DP):
    per entity the engine's per-fix picks must equal the lowest-sid
    state on an optimal full path, and path_cost_mm must equal the
    enumerated optimum."""
    import itertools

    from oshdb_spark.geo.matching import hmm_map_match

    rng = np.random.default_rng(83)
    ns = 250
    ax = rng.integers(-400_000_000, 400_000_000, ns)
    ay = rng.integers(-300_000_000, 300_000_000, ns)
    bx = ax + rng.integers(-2_000_000, 2_000_001, ns)
    by = ay + rng.integers(-2_000_000, 2_000_001, ns)
    segs = np.stack([np.arange(ns), ax, ay, bx, by], axis=1)
    seg_df = spark.createDataFrame(
        [tuple(int(v) for v in r) for r in segs],
        "sid long, ax7 long, ay7 long, bx7 long, by7 long",
    )
    n_ent, n_fix = 5, 7
    fixes = []
    for e in range(n_ent):
        lon = rng.integers(-400_000_000, 400_000_000)
        lat = rng.integers(-300_000_000, 300_000_000)
        for i in range(n_fix):
            lon += rng.integers(-40_000_000, 40_000_001)
            lat += rng.integers(-40_000_000, 40_000_001)
            fixes.append((e, i, int(lon), int(lat)))
    fix_df = spark.createDataFrame(
        fixes, "entity long, ord_key long, lon7 long, lat7 long"
    )
    d, P, C = 500_000.0, 7_000_000, 3
    out = hmm_map_match(
        fix_df, seg_df, d, switch_cost_mm=P, n_cand=C
    ).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r["entity"], {})[r["seq"]] = (
            r["ord_key"], r["sid"], r["dist_m"], r["path_cost_mm"]
        )

    n_checked = 0
    for e in range(n_ent):
        layers = []
        for (ent, i, lon, lat) in fixes:
            if ent != e:
                continue
            c = _brute_cands(float(lon), float(lat), segs, d, C)
            if c:
                layers.append((i, c))
        if not layers:
            assert e not in got
            continue
        # exhaustive enumeration over all candidate combinations
        best = None
        for combo in itertools.product(*[c for _, c in layers]):
            cost = sum(mm for mm, _ in combo)
            cost += sum(
                P
                for a, b in zip(combo, combo[1:])
                if a[1] != b[1]
            )
            if best is None or cost < best:
                best = cost
        # per fix: lowest sid among states on ANY optimal path
        want_sids = [set() for _ in layers]
        for combo in itertools.product(*[c for _, c in layers]):
            cost = sum(mm for mm, _ in combo)
            cost += sum(
                P for a, b in zip(combo, combo[1:]) if a[1] != b[1]
            )
            if cost == best:
                for i, (_, sid) in enumerate(combo):
                    want_sids[i].add(sid)
        assert e in got, f"entity {e} missing"
        assert len(got[e]) == len(layers)
        for i, (ordv, cands) in enumerate(layers):
            g_ord, g_sid, g_dist, g_cost = got[e][i]
            assert g_ord == ordv
            assert g_cost == best
            assert g_sid == min(want_sids[i]), f"entity {e} fix {i}"
            mm = dict((s, m) for m, s in cands)[g_sid]
            assert g_dist == mm / 1000.0
            n_checked += 1
    assert n_checked >= 20  # non-vacuous


def test_hmm_map_match_stickiness(spark):
    """A large switch penalty holds the path on one segment even when a
    rival segment is closer at one fix; P=0 degenerates to the per-fix
    nearest pick."""
    from oshdb_spark.geo.matching import hmm_map_match

    # segment 1 ~ lat 0; segment 2 ~ lat 0.01 deg north; fixes hug
    # segment 1 except fix#1 which sits right on segment 2
    seg_df = spark.createDataFrame(
        [
            (1, -10_000_000, 0, 30_000_000, 0),
            (2, -10_000_000, 100_000, 30_000_000, 100_000),
        ],
        "sid long, ax7 long, ay7 long, bx7 long, by7 long",
    )
    fix_df = spark.createDataFrame(
        [
            (9, 0, 0, 10_000),
            (9, 1, 10_000_000, 100_000),
            (9, 2, 20_000_000, 10_000),
        ],
        "entity long, ord_key long, lon7 long, lat7 long",
    )
    sticky = {
        r["seq"]: r["sid"]
        for r in hmm_map_match(
            fix_df, seg_df, 50_000.0, switch_cost_mm=10_000_000, n_cand=2
        ).collect()
    }
    assert sticky == {0: 1, 1: 1, 2: 1}
    greedy = {
        r["seq"]: r["sid"]
        for r in hmm_map_match(
            fix_df, seg_df, 50_000.0, switch_cost_mm=0, n_cand=2
        ).collect()
    }
    assert greedy == {0: 1, 1: 2, 2: 1}


def test_hausdorff_join_matches_brute_force(spark):
    """Pairwise symmetric Hausdorff self-join vs a numpy brute force
    over ALL entity pairs (no candidate pruning)."""
    from oshdb_spark.geo.trajectory import hausdorff_join

    rng = np.random.default_rng(97)
    n_ent, n_fix = 24, 15
    pts = []
    for e in range(n_ent):
        # clustered walks so near pairs exist
        lon = rng.integers(-200_000_000, 200_000_000)
        lat = rng.integers(-150_000_000, 150_000_000)
        if e % 3 == 0 and e > 0:
            # shadow a previous entity's start for guaranteed near pairs
            lon, lat = pts[(e - 3) * n_fix][2] + 500_000, \
                pts[(e - 3) * n_fix][3] - 300_000
        for i in range(n_fix):
            lon += rng.integers(-5_000_000, 5_000_001)
            lat += rng.integers(-5_000_000, 5_000_001)
            pts.append((e, i, int(lon), int(lat)))
    df = spark.createDataFrame(
        pts, "entity long, seq long, lon7 long, lat7 long"
    )
    d = 400_000.0
    got = {
        (r["ea"], r["eb"]): r["haus_m"]
        for r in hausdorff_join(df, d).collect()
    }
    R = 6_371_000.0
    arr = {}
    for e, i, lon, lat in pts:
        arr.setdefault(e, []).append((lon, lat))
    exp = {}
    for ea in range(n_ent):
        for eb in range(ea + 1, n_ent):
            A = np.array(arr[ea], dtype=np.float64)
            B = np.array(arr[eb], dtype=np.float64)
            la, lb = A[:, 1] * 1e-7, B[:, 1] * 1e-7
            lo, lp = A[:, 0] * 1e-7, B[:, 0] * 1e-7
            dlat = np.radians(lb[None, :] - la[:, None])
            dlng = np.radians(lp[None, :] - lo[:, None]) * np.cos(
                np.radians((la[:, None] + lb[None, :]) / 2.0)
            )
            mm = np.rint(R * np.sqrt(dlng * dlng + dlat * dlat)
                         * 1000.0).astype(np.int64)
            h = max(int(mm.min(axis=1).max()), int(mm.min(axis=0).max()))
            if h <= d * 1000.0:
                exp[(ea, eb)] = h / 1000.0
    assert got == exp
    assert len(exp) >= 3  # non-vacuous: shadowed walks produce pairs


def test_colocation_join_matches_brute_force(spark):
    import numpy as np

    from oshdb_spark.geo.spatial_join import colocation_join

    rng = np.random.default_rng(31)
    n = 600
    # clustered positions so spatial pairs exist; timestamps straddle
    # bucket boundaries (including negative epochs — floor bucketing)
    base_lon = rng.integers(-1_500_000_000, 1_500_000_000, n // 4)
    base_lat = rng.integers(-680_000_000, 680_000_000, n // 4)
    lon7 = np.concatenate(
        [base_lon + rng.integers(-30_000_000, 30_000_000, n // 4)
         for _ in range(4)]
    )
    lat7 = np.concatenate(
        [base_lat + rng.integers(-30_000_000, 30_000_000, n // 4)
         for _ in range(4)]
    )
    secs = rng.integers(-7_200, 7_200, n)
    pts = spark.createDataFrame(
        [
            (int(i), int(a), int(b), int(s))
            for i, (a, b, s) in enumerate(zip(lon7, lat7, secs))
        ],
        "pid long, lon7 long, lat7 long, sec long",
    )
    right = pts.withColumnRenamed("pid", "qid")
    d, t = 200_000.0, 900
    got = {
        (r["pid"], r["qid"])
        for r in colocation_join(pts, right, d, t).collect()
        if r["pid"] < r["qid"]
    }
    R = 6_371_000.0
    la = lat7 * 1e-7
    lo = lon7 * 1e-7
    keep = np.abs(la) <= 70.0
    exp = set()
    idx = np.nonzero(keep)[0]
    for ii, i in enumerate(idx):
        j = idx[ii + 1:]
        dlat = np.radians(la[j] - la[i])
        dlng = np.radians(lo[j] - lo[i]) * np.cos(
            np.radians((la[j] + la[i]) / 2.0)
        )
        dist = R * np.sqrt(dlat * dlat + dlng * dlng)
        near = (dist <= d) & (np.abs(secs[j] - secs[i]) <= t)
        for k in j[near]:
            exp.add((min(i, int(k)), max(i, int(k))))
    assert got == exp
    # non-vacuous both ways: real contacts exist AND the temporal
    # predicate rejects some spatially-close pairs
    assert len(exp) > 20
    spatial_only = {
        (r["pid"], r["qid"])
        for r in colocation_join(pts, right, d, 20_000).collect()
        if r["pid"] < r["qid"]
    }
    assert len(spatial_only) > len(exp)
