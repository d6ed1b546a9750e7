"""Trajectory mining over event streams: stay-point (dwell) detection.

Speed-based variant of the classic stay-point extractors (Li et al.
2008 "Mining user similarity based on location history" detect stays as
runs of slow movement): a point continues the current dwell segment iff
its equirectangular distance to the PREVIOUS point is within `dist_m`;
a longer hop (or the first point) starts a new segment (gaps-and-
islands over a lag + running sum — pure Catalyst, one shuffle on the
entity key, no python). A segment is a stay when it spans at least
`min_dwell_s` seconds and `min_pts` points.

The anchor-based original (distance to the segment's FIRST point)
needs sequential state and would force a per-entity kernel; the
previous-point formulation is the declarative equivalent used by
streaming systems (it differs only on slow drifts that creep beyond
the radius) and keeps the whole operator inside whole-stage codegen.

Positions come in as fixed-point 1e-7 integer degrees (`lon7`/`lat7`,
the engine's native encoding — geo/geodesy.py), so segment centroids
are exact integer averages; distances use the reference's
equirectangular formula (reference Geo.java:37-45) written with the
same operation order as the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def stay_points(
    df: DataFrame,
    id_col: str = "user_id",
    sec_col: str = "sec",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    order_cols: tuple[str, ...] = (),
    dist_m: float = 500.0,
    min_dwell_s: int = 1800,
    min_pts: int = 3,
) -> DataFrame:
    """One row per detected stay: (id, seg, n_pts, dwell_s, clon, clat).

    `seg` is the 1-based dwell-segment ordinal within the entity (stable
    across partition layouts: the window order is (sec, *order_cols) —
    pass a tiebreaker if seconds can collide). Centroids are exact
    integer averages of the fixed-point coordinates, emitted in degrees
    rounded to 4 decimals."""
    w = Window.partitionBy(id_col).orderBy(sec_col, *order_cols)
    lond = F.col(lon7_col) * 1e-7
    latd = F.col(lat7_col) * 1e-7
    d = (
        df.withColumn("_plon", F.lag(F.col(lon7_col) * 1e-7).over(w))
        .withColumn("_plat", F.lag(F.col(lat7_col) * 1e-7).over(w))
    )
    dlat = F.radians(latd - F.col("_plat"))
    dlng = F.radians(lond - F.col("_plon")) * F.cos(
        F.radians((latd + F.col("_plat")) / 2.0)
    )
    seg_m = F.lit(6371000.0) * F.sqrt(dlng * dlng + dlat * dlat)
    d = d.withColumn(
        "_new",
        (F.col("_plon").isNull() | (seg_m > F.lit(float(dist_m)))).cast(
            "long"
        ),
    ).withColumn(
        "_seg",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        d.groupBy(F.col(id_col), F.col("_seg").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            (F.max(sec_col) - F.min(sec_col)).alias("dwell_s"),
            F.round(F.avg(lon7_col) / 1e7, 4).alias("clon"),
            F.round(F.avg(lat7_col) / 1e7, 4).alias("clat"),
        )
        .filter(
            (F.col("dwell_s") >= F.lit(int(min_dwell_s)))
            & (F.col("n_pts") >= F.lit(int(min_pts)))
        )
    )


def geofence_transitions(
    df: DataFrame,
    fences: dict[str, tuple[int, int, int, int]],
    id_col: str = "user_id",
    sec_col: str = "sec",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Geofence enter/exit detection: one row per transition of an
    entity's trajectory across a named bbox fence — (id, fence, kind
    'enter'|'exit', sec). ``fences``: name -> (w7, s7, e7, n7) int64
    fixed-point bboxes (INCLUSIVE edges — integer compares, so the
    in/out decision is exact on every engine; no float boundary).

    Semantics: observations sort by (sec, *order_cols) per entity; the
    first observation inside a fence emits 'enter' at its sec; a later
    observation outside after being inside emits 'exit'. An entity never
    seen inside emits nothing for that fence. Transitions are
    level-triggered on OBSERVATIONS (sampling a fence crossing between
    two points is attributed to the later point — the standard telemetry
    contract).

    Plan: the fence list fans out map-side as a literal array (codegen
    explode, |fences| small), inside-ness is an integer range predicate,
    and ONE window per (entity, fence) computes the lag — a single
    shuffle on the composite key, no joins, no Python. The streaming
    sibling (streaming.incremental.geofence_tracker) carries (last_in)
    per key across micro-batches and emits the identical rows."""
    items = ", ".join(
        f"named_struct('fence', '{name}', 'w', {w}L, 's', {s}L, "
        f"'e', {e}L, 'n', {n}L)"
        for name, (w, s, e, n) in sorted(fences.items())
    )
    d = df.withColumn("_f", F.explode(F.expr(f"array({items})")))
    inside = (
        (F.col(lon7_col) >= F.col("_f.w"))
        & (F.col(lon7_col) <= F.col("_f.e"))
        & (F.col(lat7_col) >= F.col("_f.s"))
        & (F.col(lat7_col) <= F.col("_f.n"))
    )
    w = Window.partitionBy(id_col, "_f.fence").orderBy(sec_col, *order_cols)
    d = d.withColumn("_in", inside).withColumn(
        "_pin", F.lag("_in").over(w)
    )
    trans = d.filter(
        (F.col("_in") & (F.col("_pin").isNull() | ~F.col("_pin")))
        | (~F.col("_in") & F.col("_pin"))
    )
    return trans.select(
        F.col(id_col),
        F.col("_f.fence").alias("fence"),
        F.when(F.col("_in"), F.lit("enter")).otherwise(F.lit("exit"))
        .alias("kind"),
        F.col(sec_col).alias("sec"),
    )


def hausdorff_join(
    points: DataFrame,
    d_meters: float,
    entity_col: str = "entity",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    zoom: int = 6,
    lat_max: float = 70.0,
    n_salts: int = 1,
) -> DataFrame:
    """Trajectory-similarity self-join: every pair of entities whose
    point sets are within ``d_meters`` symmetric Hausdorff distance —
    the "find entities that moved along similar paths" analytic
    (discrete Hausdorff max–min over the reference's two-point equirect
    metric, Geo.java:37-45).

    Plan shape (100 TB): ONE groupBy(entity) collapses each entity to
    (bbox, packed point array) — trajectories are small relative to the
    point table, so the pair join moves per-entity summaries, not raw
    points; entity-pair candidates meet through the shared PBSM stage
    (`_bbox_pair_candidates`: A-side bboxes pad by d, cell-cover
    equi-join, reference-point dedup ⇒ each pair refines exactly once),
    correct because H(A,B) ≤ d forces every A point within d of B, so
    the padded bboxes overlap; the refine is one narrow Arrow stage
    computing the full pairwise mm-matrix per pair (numpy, ~10⁵ cells
    for 300-point trajectories). ``ea < eb`` keeps each unordered pair
    once; ``n_salts`` routes hot cells.

    Determinism: every pairwise distance quantizes to integer mm BEFORE
    the min/max folds, so the Hausdorff value is an exact integer on
    any engine. Points with |lat| > lat_max are dropped (documented
    contract, mirrored by oracles). Output: ea, eb, haus_m (mm-exact
    meters, haus_m ≤ d_meters)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .geodesy import EARTH_RADIUS
    from .spatial_join import _bbox_pair_candidates

    d_deg = d_meters / (math.pi / 180.0 * EARTH_RADIUS)
    pad_lat7 = int(math.ceil(d_deg * 1e7))
    pad_lon7 = int(math.ceil(d_deg / math.cos(math.radians(lat_max)) * 1e7))
    lat7_cap = int(lat_max * 1e7)

    per_ent = (
        points.filter(
            (F.col(lat7_col) >= -lat7_cap) & (F.col(lat7_col) <= lat7_cap)
        )
        .groupBy(F.col(entity_col).alias("_e"))
        .agg(
            F.min(lon7_col).alias("_w"),
            F.max(lon7_col).alias("_x"),
            F.min(lat7_col).alias("_s"),
            F.max(lat7_col).alias("_n"),
            F.collect_list(F.struct(lon7_col, lat7_col)).alias("_pts"),
        )
    )
    a = (
        per_ent.select(
            F.col("_e").alias("ea"), F.col("_pts").alias("_pa"),
            (F.col("_w") - pad_lon7).alias("_aw7"),
            (F.col("_x") + pad_lon7).alias("_ae7"),
            (F.col("_s") - pad_lat7).alias("_as7"),
            (F.col("_n") + pad_lat7).alias("_an7"),
        )
    )
    b = (
        per_ent.select(
            F.col("_e").alias("eb"), F.col("_pts").alias("_pb"),
            F.col("_w").alias("_bw7"), F.col("_x").alias("_be7"),
            F.col("_s").alias("_bs7"), F.col("_n").alias("_bn7"),
        )
    )
    cand = _bbox_pair_candidates(
        a, b, zoom, n_salts, F.struct(F.col("eb"))
    ).filter(F.col("ea") < F.col("eb")).select("ea", "eb", "_pa", "_pb")

    mm_cap = int(round(d_meters * 1000.0))
    out_schema = T.StructType(
        [
            T.StructField("ea", T.LongType()),
            T.StructField("eb", T.LongType()),
            T.StructField("haus_m", T.DoubleType()),
        ]
    )

    def refine(it):
        for pdf in it:
            rows = []
            for ea, eb, pa, pb in zip(
                pdf["ea"], pdf["eb"], pdf["_pa"], pdf["_pb"]
            ):
                A = np.array([(p["lon7"], p["lat7"]) for p in pa],
                             dtype=np.float64)
                B = np.array([(p["lon7"], p["lat7"]) for p in pb],
                             dtype=np.float64)
                la, lb = A[:, 1] * 1e-7, B[:, 1] * 1e-7
                lo, lp = A[:, 0] * 1e-7, B[:, 0] * 1e-7
                dlat = np.radians(lb[None, :] - la[:, None])
                dlng = np.radians(lp[None, :] - lo[:, None]) * np.cos(
                    np.radians((la[:, None] + lb[None, :]) / 2.0)
                )
                mm = np.rint(
                    EARTH_RADIUS * np.sqrt(dlng * dlng + dlat * dlat)
                    * 1000.0
                ).astype(np.int64)
                h = max(
                    int(mm.min(axis=1).max()), int(mm.min(axis=0).max())
                )
                if h <= mm_cap:
                    rows.append((int(ea), int(eb), h / 1000.0))
            if rows:
                yield pd.DataFrame(rows, columns=["ea", "eb", "haus_m"])
            else:
                yield pd.DataFrame(
                    {c: pd.Series([], dtype=object)
                     for c in ["ea", "eb", "haus_m"]}
                )

    return cand.mapInPandas(refine, schema=out_schema)


def simplify_radial(
    points: DataFrame,
    d_meters: float,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Radial-distance trajectory simplification: per entity, walk the
    fix sequence in order and KEEP a fix iff its distance from the LAST
    KEPT fix is ≥ ``d_meters`` (the first fix is always kept) — the
    standard GPS downsampling pass before storage / map matching
    (bounds points per unit path length while preserving shape to d).

    This is an order-dependent SEQUENTIAL FOLD (each decision depends
    on the last KEPT point, not the previous raw point), so it cannot
    be a window function; it runs as one grouped-Arrow kernel per
    entity — the inherently-sequential-per-entity shape map matching
    also has; cross-entity it is embarrassingly parallel and the only
    shuffle is the entity groupBy. Distances quantize to integer mm
    before the ≥ comparison (engine-exact; the oracle replays the fold
    with a recursive CTE stepping arg_min to the next kept fix).

    ``order_col`` must be unique per entity. Output: entity, kept_seq
    (0-based), ord_key, lon7, lat7."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .geodesy import EARTH_RADIUS

    dmm = int(round(d_meters * 1000.0))
    schema = T.StructType(
        [
            T.StructField("entity", T.LongType()),
            T.StructField("kept_seq", T.LongType()),
            T.StructField("ord_key", T.LongType()),
            T.StructField("lon7", T.LongType()),
            T.StructField("lat7", T.LongType()),
        ]
    )
    sel = points.select(
        F.col(entity_col).cast("long").alias("_ent"),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(lon7_col).cast("long").alias("_lon"),
        F.col(lat7_col).cast("long").alias("_lat"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in ["entity", "kept_seq", "ord_key", "lon7",
                           "lat7"]}
            )
        ent = int(pdf["_ent"].iloc[0])
        pdf = pdf.sort_values("_ord", kind="mergesort")
        ords = pdf["_ord"].to_numpy(np.int64)
        lon = pdf["_lon"].to_numpy(np.int64)
        lat = pdf["_lat"].to_numpy(np.int64)
        lod = lon * 1e-7
        lad = lat * 1e-7
        rows = []
        i = 0
        while i is not None and i < len(ords):
            rows.append(
                (ent, len(rows), int(ords[i]), int(lon[i]), int(lat[i]))
            )
            rest = slice(i + 1, len(ords))
            dlat = np.radians(lad[rest] - lad[i])
            dlng = np.radians(lod[rest] - lod[i]) * np.cos(
                np.radians((lad[i] + lad[rest]) / 2.0)
            )
            mm = np.rint(
                EARTH_RADIUS * np.sqrt(dlng * dlng + dlat * dlat) * 1000.0
            ).astype(np.int64)
            far = np.nonzero(mm >= dmm)[0]
            i = (i + 1 + int(far[0])) if len(far) else None
        return pd.DataFrame(
            rows, columns=["entity", "kept_seq", "ord_key", "lon7",
                           "lat7"]
        )

    return sel.groupBy("_ent").applyInPandas(kernel, schema)


def heading_stats(
    pts: DataFrame,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Per-entity circular heading statistics over consecutive hops —
    mean bearing and resultant length (Mardia & Jupp directional stats;
    the mobility analytic behind commute-direction detection and
    drift/loitering classification). A plain average of bearings is
    WRONG at the 359°/1° wrap; the circular mean is
    atan2(Σ sin θ, Σ cos θ) and the mean resultant length
    R = |Σ e^{iθ}| / n ∈ [0, 1] measures directional concentration
    (1 = dead straight, 0 = uniformly dispersed).

    Bearings use the same local equirectangular plane as every distance
    in the engine (Geo.java:37-45): east = Δlon·cos(mid lat),
    north = Δlat, θ = atan2(east, north) — navigational, 0 = north,
    clockwise. Zero-length hops (repeated fix) carry no direction and
    are excluded from n.

    Determinism: float Σ sin/Σ cos are order-dependent, so each hop's
    sin/cos quantizes to integer NANO-units (round-6-then-scale keeps
    the value exactly representable) and the sums are exact BIGINTs —
    bit-reproducible across partitionings and vs the SQL oracle. One
    lag window on the entity key + one aggregate; pure Catalyst."""
    w = Window.partitionBy(entity_col).orderBy(order_col)
    lon = F.col(lon7_col) * 1e-7
    lat = F.col(lat7_col) * 1e-7
    hop = (
        pts.withColumn("_plon", F.lag(lon).over(w))
        .withColumn("_plat", F.lag(lat).over(w))
        .filter(F.col("_plon").isNotNull())
    )
    east = F.radians(lon - F.col("_plon")) * F.cos(
        F.radians((F.col("_plat") + lat) / 2.0)
    )
    north = F.radians(lat - F.col("_plat"))
    theta = F.atan2(east, north)
    moving = hop.filter((east != 0.0) | (north != 0.0)).withColumn(
        "_s", F.round(F.sin(theta) * 1e9, 0).cast("long")
    ).withColumn("_c", F.round(F.cos(theta) * 1e9, 0).cast("long"))
    return moving.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_hops"),
        F.round(
            F.degrees(
                F.atan2(
                    F.sum("_s").cast("double"), F.sum("_c").cast("double")
                )
            ),
            6,
        ).alias("mean_bearing_deg"),
        F.round(
            F.sqrt(
                F.pow(F.sum("_s").cast("double"), F.lit(2.0))
                + F.pow(F.sum("_c").cast("double"), F.lit(2.0))
            )
            / (F.count(F.lit(1)) * F.lit(1e9)),
            6,
        ).alias("resultant_len"),
    )


def std_ellipse(
    pts: DataFrame,
    entity_col: str = "entity",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Per-entity standard deviational ellipse — the classic
    "directional distribution" summary of a point cloud (Lefever 1926;
    the ArcGIS Directional Distribution tool): mean center, major-axis
    orientation, and 1-σ axis lengths of the coordinate scatter. The
    ellipse is the eigendecomposition of the 2×2 coordinate covariance;
    with raw fixed-point moments it is closed-form:

        A = n·Σx² − (Σx)²   B = n·Σy² − (Σy)²   C = n·Σxy − Σx·Σy
        θ = ½·atan2(2C, A − B)           (major-axis bearing from east)
        λ± = ((A+B) ± sqrt((A−B)² + 4C²)) / 2
        axis± = sqrt(2·λ±) / n           (ArcGIS √2 factor, ~63% cover)

    Determinism: Σx, Σy are exact int64; the int64 products x², y², xy
    (|lon7| ≤ 1.8e9 → ≤ 3.24e18 < 2⁶³) sum into DECIMAL(38,0), exact
    like DuckDB's HUGEINT sums, so A/B/C are exact integers on both
    engines and every double op consumes identical inputs. The
    discriminant is computed in doubles (A² would overflow any fixed
    width); same expression both sides. n = 1 or coincident points
    yield A=B=C=0 → zero axes, θ = atan2(0,0) = 0.

    Plan shape (100 TB): ONE partial+final hash aggregate over the
    entity key computing six moments — no window, no join, no Python;
    the ellipse math is per-group scalar codegen. Returns
    (entity, n_pts, mean_lon, mean_lat, orient_deg, major_deg,
    minor_deg), degrees round(6)."""
    x = F.col(lon7_col)
    y = F.col(lat7_col)
    dec = "decimal(38,0)"
    m = pts.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * x).cast(dec)).alias("_sxx"),
        F.sum((y * y).cast(dec)).alias("_syy"),
        F.sum((x * y).cast(dec)).alias("_sxy"),
    )
    nD = F.col("_n").cast(dec)
    sxD, syD = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    a = (nD * F.col("_sxx") - sxD * sxD).cast("double")
    b = (nD * F.col("_syy") - syD * syD).cast("double")
    c = (nD * F.col("_sxy") - sxD * syD).cast("double")
    d = F.sqrt((a - b) * (a - b) + 4.0 * c * c)
    nd = F.col("_n").cast("double")
    return m.select(
        F.col(entity_col),
        F.col("_n").alias("n_pts"),
        F.round(
            F.col("_sx").cast("double") / nd * F.lit(1e-7), 6
        ).alias("mean_lon"),
        F.round(
            F.col("_sy").cast("double") / nd * F.lit(1e-7), 6
        ).alias("mean_lat"),
        F.round(
            F.degrees(F.atan2(2.0 * c, a - b) * 0.5), 6
        ).alias("orient_deg"),
        F.round(
            F.sqrt(2.0 * ((a + b + d) * 0.5)) / nd * F.lit(1e-7), 6
        ).alias("major_deg"),
        F.round(
            F.sqrt(
                F.greatest(F.lit(0.0), 2.0 * ((a + b - d) * 0.5))
            ) / nd * F.lit(1e-7), 6
        ).alias("minor_deg"),
    )


def simplify_dp(
    points: DataFrame,
    tolerance_units: int,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Douglas–Peucker trajectory simplification (the shape-preserving
    complement to `simplify_radial`'s spacing rule): per entity, keep
    the endpoints, find the interior point farthest from the chord,
    and recurse on both halves while that distance exceeds
    ``tolerance_units`` (planar fixed-point units — the same exactness
    frame as hexbin/voronoi).

    Every decision is EXACT INTEGER arithmetic: within one chord the
    perpendicular distance ranks by |cross product| alone (shared
    chord-length denominator), so the farthest point is an int64
    argmax with earliest-index ties; the keep test compares
    cross² > tol²·chordlen² in Python big ints (no float enters any
    branch, so the DuckDB recursive-CTE oracle replays bit-for-bit).
    Closed rings (first == last position) keep the duplicate endpoints.

    Plan: one groupBy(entity) Arrow kernel — the same
    embarrassingly-parallel-per-entity shape as simplify_radial; the
    recursion is in-kernel over numpy arrays, O(depth·n) worst case.
    Output: entity, kept_seq (order-position among kept), ord_key,
    lon7, lat7."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    tol = int(tolerance_units)
    tol2 = tol * tol
    schema = T.StructType(
        [
            T.StructField("entity", T.LongType()),
            T.StructField("kept_seq", T.LongType()),
            T.StructField("ord_key", T.LongType()),
            T.StructField("lon7", T.LongType()),
            T.StructField("lat7", T.LongType()),
        ]
    )
    sel = points.select(
        F.col(entity_col).cast("long").alias("_ent"),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(lon7_col).cast("long").alias("_lon"),
        F.col(lat7_col).cast("long").alias("_lat"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in ["entity", "kept_seq", "ord_key", "lon7",
                           "lat7"]}
            )
        ent = int(pdf["_ent"].iloc[0])
        pdf = pdf.sort_values("_ord", kind="mergesort")
        ords = pdf["_ord"].to_numpy(np.int64)
        x = pdf["_lon"].to_numpy(np.int64)
        y = pdf["_lat"].to_numpy(np.int64)
        n = len(ords)
        # int64 cross products need |span|² · 2 < 2^63; wider tracks
        # (anti-meridian-scale) fall back to exact Python big ints
        wide = (
            int(x.max()) - int(x.min()) > 2_000_000_000
            or int(y.max()) - int(y.min()) > 2_000_000_000
        )
        xo = x.astype(object) if wide else x
        yo = y.astype(object) if wide else y
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)] if n > 2 else []
        while stack:
            i0, i1 = stack.pop()
            if i1 - i0 < 2:
                continue
            dx = int(x[i1] - x[i0])
            dy = int(y[i1] - y[i0])
            seg = slice(i0 + 1, i1)
            # cross of (chord, point-i0): |cross|/|chord| is the
            # perpendicular distance; int64-exact for slot-local spans
            cross = dx * (yo[seg] - yo[i0]) - dy * (xo[seg] - xo[i0])
            k_rel = int(np.argmax(np.abs(cross)))  # earliest-index tie
            c = int(cross[k_rel])
            if c * c > tol2 * (dx * dx + dy * dy):
                k = i0 + 1 + k_rel
                keep[k] = True
                stack.append((k, i1))
                stack.append((i0, k))
        idx = np.flatnonzero(keep)
        return pd.DataFrame(
            {
                "entity": np.full(len(idx), ent, dtype=np.int64),
                "kept_seq": np.arange(len(idx), dtype=np.int64),
                "ord_key": ords[idx],
                "lon7": x[idx],
                "lat7": y[idx],
            }
        )

    return sel.groupBy("_ent").applyInPandas(kernel, schema)


def track_waypoints(
    points: DataFrame,
    fractions=(1, 2, 3),
    denom: int = 4,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Points along each track at path-length fractions (quartiles by
    default) — the 'where was the vehicle halfway through its run'
    primitive (ST_LineInterpolatePoint over the fix sequence).

    Determinism: segment lengths quantize to integer mm with the SAME
    equirectangular formula the length ops use, cumulative sums are
    exact BIGINT, the target t_k = (total·k) div denom is integer, and
    the bracketing test prev < t ≤ cum is pure integer — exactly ONE
    segment matches per fraction (zero-length segments can never
    bracket; all-stationary tracks emit nothing). Only the final
    within-segment interpolation is float (coordinates rounded to
    int).

    Plan: two windows over ONE per-entity sort + a 3-element literal
    explode + one filter — no join, no kernel. Returns
    (entity, k, target_mm, lon7, lat7)."""
    from pyspark.sql import Window

    sel = points.select(
        F.col(entity_col).alias("entity"),
        F.col(order_col).alias("_ord"),
        F.col(lon7_col).alias("_lon"),
        F.col(lat7_col).alias("_lat"),
    )
    w = Window.partitionBy("entity").orderBy("_ord")
    lod = F.col("_lon") * 1e-7
    lad = F.col("_lat") * 1e-7
    plod = F.lag("_lon").over(w) * 1e-7
    plad = F.lag("_lat").over(w) * 1e-7
    dla = F.radians(lad - plad)
    dln = F.radians(lod - plod) * F.cos(F.radians((plad + lad) / 2.0))
    seg_mm = F.round(
        F.lit(6371000.0) * F.sqrt(dla * dla + dln * dln) * 1000.0, 0
    ).cast("long")
    d = (
        sel.withColumn("_plon", F.lag("_lon").over(w))
        .withColumn("_plat", F.lag("_lat").over(w))
        .withColumn("_seg", seg_mm)
        .filter(F.col("_seg").isNotNull())
        .withColumn(
            "_cum",
            F.sum("_seg").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_tot",
            F.sum("_seg").over(
                Window.partitionBy("entity").rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            ),
        )
    )
    ks = F.explode(
        F.array(*[F.lit(int(k)) for k in fractions])
    ).alias("k")
    e = d.select("*", ks).withColumn(
        "_tk",
        F.expr(f"(_tot * k) div {int(denom)}"),
    )
    hit = e.filter(
        (F.col("_cum") - F.col("_seg") < F.col("_tk"))
        & (F.col("_tk") <= F.col("_cum"))
    )
    frac = (
        (F.col("_tk") - (F.col("_cum") - F.col("_seg"))).cast("double")
        / F.col("_seg").cast("double")
    )
    return hit.select(
        "entity",
        "k",
        F.col("_tk").alias("target_mm"),
        F.round(
            F.col("_plon") + frac * (F.col("_lon") - F.col("_plon")), 0
        ).cast("long").alias("lon7"),
        F.round(
            F.col("_plat") + frac * (F.col("_lat") - F.col("_plat")), 0
        ).cast("long").alias("lat7"),
    )


def dtw_join(
    points: DataFrame,
    dtw_max_m: float,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    zoom: int = 6,
    lat_max: float = 70.0,
    n_salts: int = 1,
    _return_candidates: bool = False,
) -> DataFrame:
    """Dynamic-time-warping trajectory-similarity self-join: every
    pair of entities whose ORDERED fix sequences align within a total
    DTW path cost of ``dtw_max_m`` meters — the sequence-aware
    companion to `hausdorff_join` (Hausdorff ignores order; DTW
    requires the tracks to run the same route in the same direction).

    Classic DTW: D[i,j] = d(aᵢ, bⱼ) + min(D[i−1,j], D[i,j−1],
    D[i−1,j−1]); the reported cost is D[la−1, lb−1]. Every d is the
    engine's mm-quantized equirect distance, so the whole DP is exact
    integer arithmetic — the DuckDB oracle replays it bit-for-bit as
    an anti-diagonal wavefront recursive CTE.

    Blocking correctness: a path cost ≤ T forces every matched pair
    within T, and DTW matches every A point to ≥1 B point, so the
    padded-bbox PBSM candidate stage (shared `_bbox_pair_candidates`,
    pad = T as a distance) provably covers all qualifying pairs —
    the hausdorff_join argument verbatim. The refine is one narrow
    Arrow stage; per-pair cost O(la·lb) — intended for DOWNSAMPLED
    tracks (compose with simplify_radial/simplify_dp first; the
    driver query downsamples 4:1). Points beyond |lat| > lat_max are
    dropped (documented contract). Output: ea, eb, dtw_m (mm-exact
    meters, ≤ dtw_max_m)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .geodesy import EARTH_RADIUS
    from .spatial_join import _bbox_pair_candidates

    d_deg = dtw_max_m / (math.pi / 180.0 * EARTH_RADIUS)
    pad_lat7 = int(math.ceil(d_deg * 1e7))
    pad_lon7 = int(
        math.ceil(d_deg / math.cos(math.radians(lat_max)) * 1e7)
    )
    lat7_cap = int(lat_max * 1e7)

    per_ent = (
        points.filter(
            (F.col(lat7_col) >= -lat7_cap)
            & (F.col(lat7_col) <= lat7_cap)
        )
        .groupBy(F.col(entity_col).alias("_e"))
        .agg(
            F.min(lon7_col).alias("_w"),
            F.max(lon7_col).alias("_x"),
            F.min(lat7_col).alias("_s"),
            F.max(lat7_col).alias("_n"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(lon7_col).alias("lon7"),
                        F.col(lat7_col).alias("lat7"),
                    )
                )
            ).alias("_pts"),
        )
    )
    a = per_ent.select(
        F.col("_e").alias("ea"), F.col("_pts").alias("_pa"),
        (F.col("_w") - pad_lon7).alias("_aw7"),
        (F.col("_x") + pad_lon7).alias("_ae7"),
        (F.col("_s") - pad_lat7).alias("_as7"),
        (F.col("_n") + pad_lat7).alias("_an7"),
        # unpadded A bbox for the envelope lower bound below
        F.col("_w").alias("_uaw7"), F.col("_x").alias("_uae7"),
        F.col("_s").alias("_uas7"), F.col("_n").alias("_uan7"),
    )
    b = per_ent.select(
        F.col("_e").alias("eb"), F.col("_pts").alias("_pb"),
        F.col("_w").alias("_bw7"), F.col("_x").alias("_be7"),
        F.col("_s").alias("_bs7"), F.col("_n").alias("_bn7"),
    )
    cand = _bbox_pair_candidates(
        a, b, zoom, n_salts, F.struct(F.col("eb"))
    ).filter(F.col("ea") < F.col("eb")).select(
        "ea", "eb", "_pa", "_pb",
        "_uaw7", "_uae7", "_uas7", "_uan7",
        "_bw7", "_be7", "_bs7", "_bn7",
    )

    mm_cap = int(round(dtw_max_m * 1000.0))

    # exact endpoint lower bound, in codegen BEFORE the Arrow DP: a
    # DTW path always matches a₀↔b₀ and a_last↔b_last, so the path
    # cost is ≥ each endpoint distance — with a generous T the padded
    # bboxes overlap near-globally and this filter does the real
    # candidate pruning (same formula as the kernel, float compare
    # against a mm slack of +2 so quantization can never drop a true
    # pair; the DP re-checks exactly)
    def _end_mm(pa, pb, idx):
        p = F.element_at(F.col(pa), idx)
        q = F.element_at(F.col(pb), idx)
        la_ = p["lat7"] * 1e-7
        lb_ = q["lat7"] * 1e-7
        dla = F.radians(lb_ - la_)
        dln = F.radians((q["lon7"] - p["lon7"]) * 1e-7) * F.cos(
            F.radians((la_ + lb_) / 2.0)
        )
        return (
            F.lit(float(EARTH_RADIUS))
            * F.sqrt(dln * dln + dla * dla) * 1000.0
        )

    cand = cand.filter(
        (_end_mm("_pa", "_pb", 1) <= mm_cap + 2)
        & (_end_mm("_pa", "_pb", -1) <= mm_cap + 2)
    )

    # Keogh-style ENVELOPE lower bound, also codegen, also before the
    # Arrow DP: every DTW path matches every A point to ≥1 B point, so
    # path cost ≥ Σᵢ d(aᵢ, nearest point of B) ≥ Σᵢ boxdist(aᵢ, bbox(B))
    # (and symmetrically for B vs bbox(A)). boxdist under-estimates the
    # kernel's equirect metric: the lat term is exact (Δlat to the box
    # edge), the lon term is scaled by cos(lat_max) ≤ cos(midlat) since
    # both endpoints satisfy |lat| ≤ lat_max. Against a near-global
    # budget the endpoint bound prunes only pairs ≥ T apart; this one
    # prunes pairs ≥ T/len apart (the whole track must traverse the
    # gap), collapsing the quadratic refined-pair blowup. Slack: the DP
    # rint()s each element (−0.5 mm) plus float noise → keep if
    # Σ ≤ cap + 2·len, mirroring the endpoint bound's +2/term; the DP
    # re-checks survivors exactly, so pruning is loss-free.
    _coslat = math.cos(math.radians(lat_max))

    def _lb_env(pts: str, w: str, s_: str, e: str, n_: str):
        dlat = f"greatest(0L, {s_} - p.lat7, p.lat7 - {n_})"
        dlon = f"greatest(0L, {w} - p.lon7, p.lon7 - {e})"
        return F.expr(
            f"aggregate({pts}, 0.0D, (acc, p) -> acc + "
            f"{float(EARTH_RADIUS)!r} * sqrt("
            f"pow(radians({dlat} * 1e-7), 2) + "
            f"pow(radians({dlon} * 1e-7) * {_coslat!r}, 2)"
            f") * 1000.0)"
        )

    cand = cand.filter(
        (
            _lb_env("_pa", "_bw7", "_bs7", "_be7", "_bn7")
            <= mm_cap + 2.0 * F.size("_pa")
        )
        & (
            _lb_env("_pb", "_uaw7", "_uas7", "_uae7", "_uan7")
            <= mm_cap + 2.0 * F.size("_pb")
        )
    ).select("ea", "eb", "_pa", "_pb")
    if _return_candidates:
        # audit hook: the refined-pair set AFTER all codegen lower
        # bounds, BEFORE the O(la·lb) Arrow DP
        return cand.select("ea", "eb")
    out_schema = T.StructType(
        [
            T.StructField("ea", T.LongType()),
            T.StructField("eb", T.LongType()),
            T.StructField("dtw_m", T.DoubleType()),
        ]
    )

    def refine(it):
        for pdf in it:
            rows = []
            for ea, eb, pa, pb in zip(
                pdf["ea"], pdf["eb"], pdf["_pa"], pdf["_pb"]
            ):
                A = np.array(
                    [(p["lon7"], p["lat7"]) for p in pa],
                    dtype=np.float64,
                )
                B = np.array(
                    [(p["lon7"], p["lat7"]) for p in pb],
                    dtype=np.float64,
                )
                la_, lb_ = A[:, 1] * 1e-7, B[:, 1] * 1e-7
                lo_, lp_ = A[:, 0] * 1e-7, B[:, 0] * 1e-7
                dlat = np.radians(lb_[None, :] - la_[:, None])
                dlng = np.radians(
                    lp_[None, :] - lo_[:, None]
                ) * np.cos(
                    np.radians((la_[:, None] + lb_[None, :]) / 2.0)
                )
                mm = np.rint(
                    EARTH_RADIUS
                    * np.sqrt(dlng * dlng + dlat * dlat) * 1000.0
                ).astype(np.int64)
                n, m = mm.shape
                D = np.empty((n, m), dtype=np.int64)
                D[0, 0] = mm[0, 0]
                for j in range(1, m):
                    D[0, j] = mm[0, j] + D[0, j - 1]
                for i in range(1, n):
                    D[i, 0] = mm[i, 0] + D[i - 1, 0]
                    row, prow = D[i], D[i - 1]
                    mrow = mm[i]
                    for j in range(1, m):
                        row[j] = mrow[j] + min(
                            prow[j], prow[j - 1], row[j - 1]
                        )
                dtw = int(D[n - 1, m - 1])
                if dtw <= mm_cap:
                    rows.append((int(ea), int(eb), dtw / 1000.0))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["ea", "eb", "dtw_m"]
                )
            else:
                yield pd.DataFrame(
                    {c: pd.Series([], dtype=object)
                     for c in ["ea", "eb", "dtw_m"]}
                )

    return cand.mapInPandas(refine, schema=out_schema)
