"""Irregular time-series rollups: time-weighted averages and OHLC bars.

The two aggregates every metrics/telemetry pipeline needs and plain
AVG/GROUP BY get wrong: an irregularly-sampled gauge must weight each
observation by how long it was current (last-observation-carried-forward
integral — TimescaleDB's ``time_weight``), and per-bucket summaries need
the FIRST/LAST observation by event time, not an arbitrary row.

Both are pure Catalyst — one lag window (TWA) or one partial+final
aggregate with ``min_by``/``max_by`` (OHLC); the determinism contracts:

- TWA quantizes each term to integer cents × whole seconds, so the
  numerator is an exact order-invariant BIGINT sum; only the final
  division is float (rounded 6 on both engines);
- OHLC breaks first/last ties with a packed BIGINT
  ``sec * 1_000_000 + seq`` key (callers guarantee ``seq < 1e6`` —
  event ids at any tested scale), so the chosen rows are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    events: DataFrame,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-entity time-weighted average under last-observation-carried-
    forward: each value holds from its timestamp to the next one; the
    average is the integral over the observed span divided by the span.
    Entities whose span is zero (fewer than 2 distinct timestamps) are
    omitted — no interval ever carries their value.

    Values are quantized to integer cents per term (exact for 2-decimal
    gauges; a documented 0.005 quantum otherwise), each term multiplies
    whole seconds, and the BIGINT sum is order-invariant. Output:
    (entity, span_s, twa) with twa rounded to 6 decimals."""
    w = Window.partitionBy(entity_col).orderBy(sec_col, seq_col)
    nxt = F.lead(sec_col).over(w)
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    terms = (
        events.withColumn("_nxt", nxt)
        .filter(F.col("_nxt").isNotNull())
        .withColumn("_num", cents * (F.col("_nxt") - F.col(sec_col)))
        .withColumn("_dt", F.col("_nxt") - F.col(sec_col))
    )
    return (
        terms.groupBy(F.col(entity_col).alias("entity"))
        .agg(
            F.sum("_dt").alias("span_s"),
            F.sum("_num").alias("_numsum"),
        )
        .filter(F.col("span_s") > 0)
        .select(
            "entity",
            "span_s",
            F.round(
                F.col("_numsum").cast("double")
                / (F.col("span_s").cast("double") * 100.0),
                6,
            ).alias("twa"),
        )
    )


def ohlc(
    events: DataFrame,
    entity_col: str = "uid",
    bucket_col: str = "wk",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Per (entity, bucket) OHLC bar: open/close are the values at the
    minimum/maximum packed (sec, seq) key — exact integer tie-breaks, no
    arbitrary-row ``first()`` — plus high/low/volume. One partial+final
    hash aggregate; the only shuffle is the group key."""
    key = F.col(sec_col) * F.lit(1_000_000) + F.col(seq_col)
    return events.groupBy(
        F.col(entity_col).alias("entity"), F.col(bucket_col).alias("bucket")
    ).agg(
        F.min_by(value_col, key).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, key).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


def gapfill_locf(
    events: DataFrame,
    bucket_s: int,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Regularize an irregular series onto a fixed bucket grid with
    last-observation-carried-forward fill (TimescaleDB
    ``time_bucket_gapfill`` + ``locf``): every bucket between an
    entity's first and last observation gets a row; empty buckets carry
    the latest earlier value and are flagged ``is_filled``.

    Per-bucket representative = the LAST observation in the bucket by
    the exact packed (sec, seq) key (max_by — no arbitrary row). The
    grid explode is per-entity span/bucket_s rows (output-sized, not a
    cross join); the LOCF is one running last-ignore-nulls window. The
    first bucket is an observed one by construction, so no leading
    nulls."""
    bucket = F.floor(F.col(sec_col) / F.lit(int(bucket_s))).cast("long")
    key = F.col(sec_col) * F.lit(1_000_000) + F.col(seq_col)
    last = (
        events.groupBy(
            F.col(entity_col).alias("entity"), bucket.alias("bucket")
        )
        .agg(F.max_by(value_col, key).alias("_v"))
    )
    rng = last.groupBy("entity").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    grid = rng.select(
        "entity", F.explode(F.sequence("_mn", "_mx")).alias("bucket")
    )
    j = grid.join(last, ["entity", "bucket"], "left")
    w = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "entity",
        "bucket",
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.col("_v").isNull().alias("is_filled"),
    )


def gapfill_interpolate(
    events: DataFrame,
    bucket_s: int,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Regularize an irregular series onto a fixed bucket grid with
    LINEAR interpolation between bracketing observations (TimescaleDB
    ``time_bucket_gapfill`` + ``interpolate`` — the other standard fill
    next to gapfill_locf): every bucket between an entity's first and
    last observation gets a row; observed buckets keep their exact
    representative (last observation by the packed (sec, seq) key);
    empty buckets evaluate the line between the previous and next
    representatives at the bucket's start time.

    Determinism: representatives carry integer cents AND their actual
    integer second, so the interpolation numerator
    ``v0*(t1−t) + v1*(t−t0)`` is an exact BIGINT; only the final
    division is float (round 6 on both engines). The grid explode is
    output-sized; the bracketing scans are two ignore-nulls windows
    over ONE ascending sort of the same (entity, bucket) partition —
    no extra shuffle, no join beyond the grid's. Grid edges are
    observed buckets by construction, so both brackets always exist on
    the filled branch (t0 < t < t1)."""
    bucket = F.floor(F.col(sec_col) / F.lit(int(bucket_s))).cast("long")
    key = F.col(sec_col) * F.lit(1_000_000) + F.col(seq_col)
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    last = (
        events.groupBy(
            F.col(entity_col).alias("entity"), bucket.alias("bucket")
        )
        .agg(
            F.max_by(cents, key).alias("_v"),
            F.max_by(F.col(sec_col), key).alias("_s"),
        )
    )
    rng = last.groupBy("entity").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    grid = rng.select(
        "entity", F.explode(F.sequence("_mn", "_mx")).alias("bucket")
    )
    j = grid.join(last, ["entity", "bucket"], "left")
    wp = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.col("bucket") * F.lit(int(bucket_s))
    v0 = F.last("_v", ignorenulls=True).over(wp)
    t0 = F.last("_s", ignorenulls=True).over(wp)
    v1 = F.first("_v", ignorenulls=True).over(wn)
    t1 = F.first("_s", ignorenulls=True).over(wn)
    interp = (
        (v0 * (t1 - t) + v1 * (t - t0)).cast("double")
        / ((t1 - t0).cast("double") * 100.0)
    )
    return j.select(
        "entity",
        "bucket",
        F.round(
            F.when(
                F.col("_v").isNotNull(),
                F.col("_v").cast("double") / 100.0,
            ).otherwise(interp),
            6,
        ).alias("value"),
        F.col("_v").isNull().alias("is_filled"),
    )


def counter_rate(
    events: DataFrame,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Monotonic-counter increase and per-second rate with reset
    handling (PromQL ``increase``/``rate``): per entity in (sec, seq)
    order, each step adds ``cur - prev`` cents, except across a reset
    (cur < prev) where the counter restarted and the step adds ``cur``.
    Integer-cents deltas sum exactly; entities with zero span are
    omitted (no elapsed time to rate over)."""
    w = Window.partitionBy(entity_col).orderBy(sec_col, seq_col)
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    d = (
        events.withColumn("_c", cents)
        .withColumn("_p", F.lag("_c").over(w))
        .filter(F.col("_p").isNotNull())
        .withColumn(
            "_d",
            F.when(F.col("_c") >= F.col("_p"), F.col("_c") - F.col("_p"))
            .otherwise(F.col("_c")),
        )
    )
    spans = events.groupBy(F.col(entity_col).alias("entity")).agg(
        (F.max(sec_col) - F.min(sec_col)).alias("span_s")
    )
    inc = d.groupBy(F.col(entity_col).alias("entity")).agg(
        F.sum("_d").alias("_inc_cents")
    )
    return (
        inc.join(spans, "entity")
        .filter(F.col("span_s") > 0)
        .select(
            "entity",
            "span_s",
            F.round(F.col("_inc_cents").cast("double") / 100.0, 6).alias(
                "increase"
            ),
            F.round(
                F.col("_inc_cents").cast("double")
                / (F.col("span_s").cast("double") * 100.0),
                6,
            ).alias("rate_per_s"),
        )
    )


def sax_symbols(
    events: DataFrame,
    n_buckets: int = 8,
    alphabet: int = 4,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """SAX symbolization (Lin/Keogh Symbolic Aggregate approXimation —
    the classic time-series indexing transform): each entity's value
    sequence reduces to ``n_buckets`` PAA means, z-normalized by the
    entity's own mean/std, then mapped to an ``alphabet``-letter symbol
    string via the standard N(0,1) breakpoint table.

    Determinism: the entity moments come from exact integer cents sums
    (Σc, Σc²), PAA buckets split by integer row index (floor(k·B/n)),
    and the per-bucket mean divides two exact integers — so every double
    is identical across engines and partitionings. Zero-variance
    entities are omitted (z undefined). Pure Catalyst: two windows (row
    index), two aggregates, a breakpoint CASE, one ordered array fold —
    no Python anywhere."""
    if alphabet not in (3, 4, 5):
        raise ValueError("alphabet must be 3, 4 or 5")
    # N(0,1) equiprobable breakpoints (Lin et al., table 3)
    bps = {
        3: [-0.43, 0.43],
        4: [-0.6745, 0.0, 0.6745],
        5: [-0.84, -0.25, 0.25, 0.84],
    }[alphabet]
    letters = "abcde"
    w = Window.partitionBy(entity_col).orderBy(sec_col, seq_col)
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    d = events.withColumn("_c", cents).withColumn(
        "_k", F.row_number().over(w) - 1
    )
    stats = d.groupBy(F.col(entity_col).alias("entity")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_c").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
    )
    d2 = d.join(
        stats, F.col(entity_col) == F.col("entity")
    ).withColumn(
        "_b",
        F.floor(
            F.col("_k") * F.lit(int(n_buckets)) / F.col("_n")
        ).cast("long"),
    )
    paa = d2.groupBy("entity", "_b", "_n", "_s", "_s2").agg(
        F.sum("_c").alias("_bs"), F.count(F.lit(1)).alias("_bn")
    )
    mean = F.col("_s").cast("double") / (F.col("_n").cast("double") * 100.0)
    var = (
        F.col("_s2").cast("double")
        / (F.col("_n").cast("double") * 10000.0)
        - mean * mean
    )
    z = (
        (F.col("_bs").cast("double") / (F.col("_bn").cast("double") * 100.0))
        - mean
    ) / F.sqrt(var)
    sym = F.lit(letters[alphabet - 1])
    for i in range(alphabet - 2, -1, -1):
        sym = F.when(z < F.lit(bps[i]), F.lit(letters[i])).otherwise(sym)
    syms = paa.filter(F.col("_s2") * F.col("_n") != F.col("_s") * F.col("_s")
                      ).withColumn("_sym", sym)
    return (
        syms.groupBy("entity")
        .agg(
            F.max("_n").alias("n_points"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(named_struct('b', _b, 's', _sym))), "
                "x -> x.s), '')"
            ).alias("sax"),
        )
    )


_LTTB_SCHEMA = None  # built lazily to keep module import Spark-free


def _lttb_schema():
    global _LTTB_SCHEMA
    if _LTTB_SCHEMA is None:
        from pyspark.sql import types as T

        _LTTB_SCHEMA = T.StructType(
            [
                T.StructField("entity", T.LongType()),
                T.StructField("sec", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
    return _LTTB_SCHEMA


def _lttb_kernel(pdf, n_out: int):
    import math

    import pandas as pd

    pdf = pdf.sort_values(["sec", "seq"]).reset_index(drop=True)
    n = len(pdf)
    xs = pdf["sec"].astype("int64").tolist()
    vals = pdf["value"].astype("float64").tolist()
    # cents quantization (round-half-away, exact int) so the triangle
    # areas are pure-integer and the DuckDB replay matches bit-for-bit
    ys = [
        int(math.copysign(math.floor(abs(v) * 100.0 + 0.5), v))
        for v in vals
    ]
    if n <= n_out:
        kept = list(range(n))
    else:
        B = n_out - 2
        buckets: dict[int, list[int]] = {}
        for k in range(1, n - 1):
            buckets.setdefault((k - 1) * B // (n - 2), []).append(k)
        kept = [0]
        prev = 0
        for b in range(B):
            # anchor "centroid" of the NEXT bucket, scaled by its size L
            # (L*area is an exact integer; scaling is monotone within a
            # bucket so the argmax is the textbook LTTB choice)
            if b + 1 < B:
                nxt = buckets[b + 1]
                L = len(nxt)
                sx = sum(xs[k] for k in nxt)
                sy = sum(ys[k] for k in nxt)
            else:
                L, sx, sy = 1, xs[-1], ys[-1]
            ax, ay = xs[prev], ys[prev]
            best = None
            for k in buckets[b]:
                area = abs(
                    (L * ax - sx) * (ys[k] - ay)
                    - (ax - xs[k]) * (sy - L * ay)
                )
                key = (area, -k)
                if best is None or key > best[0]:
                    best = (key, k)
            kept.append(best[1])
            prev = best[1]
        kept.append(n - 1)
    out = pdf.iloc[kept]
    return pd.DataFrame(
        {
            "entity": out["entity"].astype("int64"),
            "sec": out["sec"].astype("int64"),
            "seq": out["seq"].astype("int64"),
            "value": out["value"].astype("float64"),
        }
    )


def lttb_downsample(
    events: DataFrame,
    n_out: int = 12,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the standard visual-fidelity series downsampler): keep first and
    last points; split the middle into ``n_out − 2`` index buckets; in
    each bucket keep the point forming the largest triangle with the
    PREVIOUSLY KEPT point and the next bucket's centroid (the last
    point for the final bucket). Ties break to the earliest point.

    The per-entity selection is inherently sequential (each choice
    conditions the next), so it runs in one grouped Arrow kernel after
    a single ids+values shuffle. Values are quantized to integer cents
    and the triangle area is scaled by the next bucket's size L, making
    every compared quantity an exact integer — the DuckDB oracle
    replays the walk with a recursive CTE whose per-step argmax is an
    ``arg_max`` over a packed HUGEINT (area, earliest-index tiebreak)
    key, bit-identical to the kernel's tuple compare. Entities with
    ≤ n_out points pass through unchanged."""
    from pyspark.sql import functions as F

    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    base = events.select(
        F.col(entity_col).cast("long").alias("entity"),
        F.col(sec_col).cast("long").alias("sec"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.groupBy("entity").applyInPandas(
        lambda pdf: _lttb_kernel(pdf, n_out), _lttb_schema()
    )


def interval_union(
    intervals: DataFrame,
    entity_col: str = "uid",
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Per-entity interval union — merge overlapping-or-touching
    intervals and summarize coverage (the uptime/SLA/sensor-coverage
    analytic; the interval-algebra complement of the point-event
    session windows): islands form wherever an interval starts at or
    before the running maximum end of everything earlier.

    Classic gaps-and-islands: ONE running-max window in (start, end)
    order marks island starts, a running sum numbers them, one
    aggregate per island and one per entity. Everything integer-exact
    (whole seconds); zero/negative-length intervals participate like
    points. Returns (entity, n_islands, covered_s, longest_s)."""
    w = Window.partitionBy(entity_col).orderBy(start_col, end_col)
    prevmax = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = intervals.withColumn(
        "_new",
        F.when(
            prevmax.isNull() | (F.col(start_col) > prevmax), 1
        ).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = marked.groupBy(
        F.col(entity_col).alias("entity"), F.col("_isl")
    ).agg(
        F.min(start_col).alias("_st"),
        F.max(end_col).alias("_en"),
    )
    return islands.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("_en") - F.col("_st")).alias("covered_s"),
        F.max(F.col("_en") - F.col("_st")).alias("longest_s"),
    )


def cusum_alarms(
    events: DataFrame,
    target_cents: int,
    threshold_cents: int,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """One-sided non-resetting CUSUM drift detector per entity (Page
    1954 — the standard sequential changepoint statistic for "has this
    gauge drifted above target"): S_t = max(0, S_{t-1} + (x_t − k)),
    alarm while S_t > h.

    The sequential recursion is NOT run sequentially: with P_t the
    prefix sum of (x − k), the classic identity
    ``S_t = P_t − min(0, min_{j≤t} P_j)`` turns it into one running
    sum + one running min — two windows over a single ascending sort,
    pure Catalyst, no kernel. Values quantize to integer cents so
    every S_t is an exact BIGINT.

    Returns per entity: n_obs, n_alarms (observations with S_t > h),
    max_s (peak statistic, cents), first_alarm_sec (earliest second
    with S above threshold; null when never)."""
    w = Window.partitionBy(entity_col).orderBy(sec_col, seq_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    d = events.withColumn("_d", cents - F.lit(int(target_cents)))
    p = d.withColumn("_p", F.sum("_d").over(run)).withColumn(
        "_s",
        F.col("_p")
        - F.least(F.lit(0), F.min("_p").over(run)),
    )
    return p.groupBy(F.col(entity_col).alias("entity")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(
            (F.col("_s") > F.lit(int(threshold_cents))).cast("long")
        ).alias("n_alarms"),
        F.max("_s").alias("max_s"),
        F.min(
            F.when(
                F.col("_s") > F.lit(int(threshold_cents)),
                F.col(sec_col),
            )
        ).alias("first_alarm_sec"),
    )


def acf(
    events: DataFrame,
    lags: list[int],
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-entity sample autocorrelation at the given positive lags —
    the seasonality/memory diagnostic every forecasting pipeline runs
    first. Standard estimator over the event-ORDER sequence (lag k
    pairs the t-th with the (t−k)-th observation by (sec, seq) order):
    r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)².

    Exactness: values quantize to integer cents and both sums multiply
    through by n² — u_t = n·x_t − S is an exact integer, so numerator
    Σ u_t·u_{t−k} and denominator Σ u_t² accumulate in DECIMAL(38,0)
    (≡ DuckDB HUGEINT) and the single float division is round(6)'d on
    both engines. Constant series (den = 0) are omitted.

    Plan shape: one per-entity total aggregate, one hash join back on
    the entity key, ONE ordered window producing every lag column in
    the same pass, one final moment aggregate; the lag explode is over
    len(lags) metadata rows per entity. Returns (entity, lag, n, acf_r).
    """
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    x = events.select(
        F.col(entity_col).alias("_e"),
        F.col(sec_col).alias("_sec"),
        F.col(seq_col).alias("_seq"),
        cents.alias("_c"),
    )
    tot = x.groupBy("_e").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_c").alias("_s")
    )
    dec = "decimal(38,0)"
    u = (
        x.join(tot, "_e")
        .withColumn(
            "_u",
            (
                F.col("_n").cast("decimal(19,0)") * F.col("_c")
                - F.col("_s")
            ).cast("decimal(19,0)"),
        )
    )
    w = Window.partitionBy("_e").orderBy("_sec", "_seq")
    for k in lags:
        u = u.withColumn(f"_ul{k}", F.lag("_u", k).over(w))
    aggs = [
        F.max("_n").alias("_nn"),
        F.sum(F.col("_u") * F.col("_u")).alias("_den"),
    ]
    for k in lags:
        aggs.append(
            F.sum(F.col("_u") * F.col(f"_ul{k}")).alias(f"_num{k}")
        )
    m = u.groupBy("_e").agg(*aggs).filter(F.col("_den") > 0)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(
                    F.coalesce(F.col(f"_num{k}"), F.lit(0).cast(dec))
                    .cast("double")
                    / F.col("_den").cast("double"),
                    6,
                ).alias("acf_r"),
            )
            for k in lags
        ]
    )
    return (
        m.select(
            F.col("_e").alias("entity"),
            F.col("_nn").alias("n"),
            F.explode(pairs).alias("p"),
        )
        .select("entity", F.col("p.lag").alias("lag"), "n", "p.acf_r")
    )


def seasonal_indexes(
    events: DataFrame,
    period: int = 7,
    half_window: int = 3,
    entity_col: str = "event_type",
    sec_col: str = "sec",
) -> DataFrame:
    """Classical additive seasonal decomposition, seasonal-index half:
    per entity, the daily event-count series (dense — empty days count
    0) is detrended by a centered (2·half_window+1)-day moving average
    and the detrended values are averaged by day-of-period (phase =
    epoch-day % period). The canonical 'is Monday structurally above
    trend?' statistic.

    Exactness: counts are integers and the detrended term multiplies
    through by the window length L = 2·half_window+1 — detr = L·cnt −
    Σ_window cnt is an exact BIGINT wherever the window is full (edge
    days are excluded by an integer day-range test, not a float rule);
    only the final mean divides, round(6) both engines.

    Plan shape: one count aggregate, a per-entity dense-calendar
    explode from the GLOBAL day span (two scalar subqueries, broadcast
    — the grid is calendar-bounded, independent of event volume), one
    rows-window over the ordered grid, one final (entity, phase)
    aggregate. Returns (entity, phase, n_terms, seasonal)."""
    day = F.floor(F.col(sec_col) / 86400).cast("long")
    per_day = (
        events.select(F.col(entity_col).alias("_e"), day.alias("_d"))
        .groupBy("_e", "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    span = per_day.select(
        F.min("_d").alias("_d0"), F.max("_d").alias("_d1")
    )
    grid = (
        per_day.select("_e")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "_e",
            F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("_d"),
            "_d0",
            "_d1",
        )
    )
    dense = grid.join(per_day, ["_e", "_d"], "left").withColumn(
        "_c", F.coalesce(F.col("_c"), F.lit(0))
    )
    L = 2 * half_window + 1
    w = (
        Window.partitionBy("_e")
        .orderBy("_d")
        .rowsBetween(-half_window, half_window)
    )
    detr = (
        dense.withColumn("_ts", F.sum("_c").over(w))
        .filter(
            (F.col("_d") >= F.col("_d0") + half_window)
            & (F.col("_d") <= F.col("_d1") - half_window)
        )
        .withColumn("_detr", F.lit(L) * F.col("_c") - F.col("_ts"))
    )
    return (
        detr.withColumn("_ph", F.pmod(F.col("_d"), F.lit(period)))
        .groupBy(
            F.col("_e").alias(entity_col), F.col("_ph").alias("phase")
        )
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                F.sum("_detr").cast("double")
                / (F.lit(float(L)) * F.count(F.lit(1)).cast("double")),
                6,
            ).alias("seasonal"),
        )
        .select(entity_col, "phase", "n_terms", "seasonal")
    )


def hampel_outliers(
    events: DataFrame,
    half_window: int = 3,
    k_num: int = 3,
    k_den: int = 1,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Hampel filter — THE robust spike detector for sensor streams:
    flag an observation when it deviates from its rolling-window median
    by more than (k_num/k_den)·MAD (median absolute deviation). Unlike
    z-scores, one spike cannot mask itself by inflating the std.

    Exactness end to end: values quantize to integer cents; the
    centered window of L = 2·half_window+1 values is collected,
    sorted, and indexed — median and MAD are exact integer picks
    (L odd), and the flag test k_den·|x−med| > k_num·MAD is pure
    integer. Only FULL windows judge (edges pass unflagged, the
    textbook convention); the whole thing is one ordered window + one
    codegen array projection — no UDF, no join.

    Returns the flagged rows: (entity, sec, seq, value_c, med_c,
    mad_c)."""
    L = 2 * half_window + 1
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    w = (
        Window.partitionBy("entity")
        .orderBy("sec", "seq")
        .rowsBetween(-half_window, half_window)
    )
    d = (
        events.select(
            F.col(entity_col).alias("entity"),
            F.col(sec_col).alias("sec"),
            F.col(seq_col).alias("seq"),
            cents.alias("_c"),
        )
        .withColumn("_arr", F.collect_list("_c").over(w))
        .filter(F.size("_arr") == L)
        .withColumn("_srt", F.sort_array("_arr"))
        .withColumn("med_c", F.element_at("_srt", half_window + 1))
        .withColumn(
            "mad_c",
            F.element_at(
                F.array_sort(
                    F.transform(
                        F.col("_arr"),
                        lambda x: F.abs(x - F.col("med_c")),
                    )
                ),
                half_window + 1,
            ),
        )
    )
    return d.filter(
        F.lit(int(k_den)) * F.abs(F.col("_c") - F.col("med_c"))
        > F.lit(int(k_num)) * F.col("mad_c")
    ).select(
        "entity", "sec", "seq",
        F.col("_c").alias("value_c"), "med_c", "mad_c",
    )


def rolling_active_users(
    events: DataFrame,
    windows=(1, 7, 28),
    entity_col: str = "user_id",
    sec_col: str = "sec",
) -> DataFrame:
    """Rolling distinct-active-user counts per day — DAU/WAU/MAU and
    the DAU/WAU stickiness ratio, the growth-analytics staple that a
    naive window can't express (COUNT(DISTINCT) OVER a range frame is
    unsupported in both engines).

    Shape: collapse to distinct (user, day) once, then each user-day
    fans out to the max(windows) trailing days it keeps the user
    active in (literal sequence explode, bounded fan-out), and ONE
    aggregate per day computes all three filtered distinct counts
    (Catalyst Expand — still a single shuffle). Only days within the
    observed span are reported; counts are exact, stickiness is one
    rounded division. Returns (day, dau, wau, mau, stickiness)."""
    w1, w7, w28 = windows
    wmax = max(windows)
    day = F.floor(F.col(sec_col) / 86400).cast("long")
    ud = (
        events.select(F.col(entity_col).alias("_u"), day.alias("_d"))
        .distinct()
    )
    span = ud.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    contrib = ud.select(
        "_u",
        F.col("_d").alias("_src"),
        F.explode(
            F.sequence(F.col("_d"), F.col("_d") + F.lit(wmax - 1))
        ).alias("_day"),
    )
    diff = F.col("_day") - F.col("_src")

    def cd(w):
        return F.countDistinct(F.when(diff < w, F.col("_u")))

    agg = contrib.groupBy("_day").agg(
        cd(w1).alias("dau"), cd(w7).alias("wau"), cd(w28).alias("mau")
    )
    return (
        agg.crossJoin(F.broadcast(span))
        .filter(
            (F.col("_day") >= F.col("_d0"))
            & (F.col("_day") <= F.col("_d1"))
        )
        .select(
            F.col("_day").alias("day"),
            "dau",
            "wau",
            "mau",
            F.when(
                F.col("wau") > 0,
                F.round(
                    F.col("dau").cast("double")
                    / F.col("wau").cast("double"),
                    6,
                ),
            ).alias("stickiness"),
        )
    )


def ccf_lags(
    events: DataFrame,
    type_a,
    type_b,
    max_lag: int = 3,
    type_col: str = "event_type",
    sec_col: str = "sec",
) -> DataFrame:
    """Cross-correlation function between two entities' DAILY count
    series on the dense shared calendar — the lead/lag diagnostic
    ('do purchases follow clicks by k days?'): r(l) = corr(x_t,
    y_{t+l}) for l in [−max_lag, max_lag], zero-filled days included.

    Exactness (the acf recipe): with n calendar days and S_x/S_y the
    totals, u_t = n·x_t − S_x and v_t = n·y_t − S_y are exact
    integers; every lagged product sums in DECIMAL(38,0) and ONE
    division + sqrt closes each lag, round(6). Pairs only over the
    overlap (|valid terms| = n − |l|); degenerate (constant) series
    yield null.

    Plan: one (type, day) aggregate, a dense-calendar broadcast-span
    explode, one pivot join to (day, x, y), ONE ordered window
    computing every lead/lag column, one final aggregate. Returns
    (lag, n_days, ccf)."""
    day = F.floor(F.col(sec_col) / 86400).cast("long")
    pd_ = (
        events.filter(F.col(type_col).isin([type_a, type_b]))
        .select(
            (F.col(type_col) == F.lit(type_a)).alias("_isa"),
            day.alias("_d"),
        )
        .groupBy("_d")
        .agg(
            F.sum(F.when(F.col("_isa"), 1).otherwise(0)).alias("_x"),
            F.sum(F.when(~F.col("_isa"), 1).otherwise(0)).alias("_y"),
        )
    )
    span = pd_.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    grid = span.select(
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("_d")
    )
    dense = (
        grid.join(pd_, "_d", "left")
        .select(
            "_d",
            F.coalesce("_x", F.lit(0)).alias("_x"),
            F.coalesce("_y", F.lit(0)).alias("_y"),
        )
    )
    tot = dense.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
    )
    dec = "decimal(38,0)"
    u = dense.crossJoin(F.broadcast(tot)).select(
        "_d",
        (F.col("_n").cast("decimal(19,0)") * F.col("_x")
         - F.col("_sx")).cast("decimal(19,0)").alias("_u"),
        (F.col("_n").cast("decimal(19,0)") * F.col("_y")
         - F.col("_sy")).cast("decimal(19,0)").alias("_v"),
        "_n",
    )
    w = Window.orderBy("_d")
    lags = list(range(-max_lag, max_lag + 1))
    for l in lags:
        u = u.withColumn(
            f"_vl{l + max_lag}",
            F.lead("_v", l).over(w) if l >= 0
            else F.lag("_v", -l).over(w),
        )
    aggs = [
        F.max("_n").alias("_nn"),
        F.sum(F.col("_u") * F.col("_u")).alias("_du"),
        F.sum(F.col("_v") * F.col("_v")).alias("_dv"),
    ]
    for l in lags:
        aggs.append(
            F.sum(F.col("_u") * F.col(f"_vl{l + max_lag}"))
            .alias(f"_c{l + max_lag}")
        )
    m = u.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(l).alias("lag"),
                F.when(
                    (F.col("_du") > 0) & (F.col("_dv") > 0),
                    F.round(
                        F.coalesce(
                            F.col(f"_c{l + max_lag}"),
                            F.lit(0).cast(dec),
                        ).cast("double")
                        / (
                            F.sqrt(F.col("_du").cast("double"))
                            * F.sqrt(F.col("_dv").cast("double"))
                        ),
                        6,
                    ),
                ).alias("ccf"),
            )
            for l in lags
        ]
    )
    return (
        m.select(F.col("_nn").alias("n_days"), F.explode(pairs).alias("p"))
        .select(F.col("p.lag").alias("lag"), "n_days", "p.ccf")
    )


def binary_segmentation(
    events: DataFrame,
    entity_col: str = "uid",
    sec_col: str = "sec",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Depth-2 binary-segmentation changepoint detection — the classic
    offline mean-shift localizer (CUSUM statistic + recursive
    splitting): level 1 splits each entity's value sequence at the
    index maximizing the CUSUM gap; level 2 splits each half again
    (up to 3 changepoints per entity).

    Exact-integer contract: with prefix sums P over integer cents and
    a segment [l, r] (m points, sum T_s), the maximized statistic is
    D(k) = |m·(P_k − P_{l−1}) − (k−l+1)·T_s| — an exact integer equal
    to m·j·|mean_left − mean_segment|, argmax-equivalent to the
    standard unnormalized CUSUM (the m factor is constant per
    segment); ties break to the SMALLEST k via max(struct(D, −k)).
    Splits are reported with their raw D (callers threshold; D = 0
    means the segment is flat). Segments shorter than 2 points emit
    nothing.

    Plan: one ordered window pass (index + prefix sums + per-entity
    totals), one argmax aggregate per level, one broadcast-join of
    level-1 winners — no Python, no recursion at runtime. Returns
    (entity, level, seg, split_i, d_stat)."""
    cents = F.round(F.col(value_col) * 100.0, 0).cast("long")
    w = Window.partitionBy("_e").orderBy("_sec", "_seq")
    we = Window.partitionBy("_e")
    base = (
        events.select(
            F.col(entity_col).alias("_e"),
            F.col(sec_col).alias("_sec"),
            F.col(seq_col).alias("_seq"),
            cents.alias("_c"),
        )
        .withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_p",
            F.sum("_c").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(we))
        .withColumn("_t", F.sum("_c").over(we))
    )
    dec = "decimal(38,0)"

    def dstat(p_k, p_l1, m, j, t_s):
        return F.abs(
            (m.cast(dec) * (p_k - p_l1) - j.cast(dec) * t_s)
        )

    l1c = base.filter(F.col("_i") < F.col("_n")).withColumn(
        "_d",
        dstat(F.col("_p"), F.lit(0), F.col("_n"), F.col("_i"),
              F.col("_t")),
    )
    l1 = l1c.groupBy("_e").agg(
        F.max(
            F.struct(
                F.col("_d"), (-F.col("_i")).alias("_ni"),
                F.col("_i"), F.col("_p"),
            )
        ).alias("_m")
    ).select(
        "_e",
        F.col("_m._i").alias("_k1"),
        F.col("_m._p").alias("_pk1"),
        F.col("_m._d").alias("_d1"),
    )
    out1 = l1.select(
        F.col("_e").alias("entity"),
        F.lit(1).alias("level"),
        F.lit(0).alias("seg"),
        F.col("_k1").alias("split_i"),
        F.col("_d1").cast("long").alias("d_stat"),
    )
    j2 = base.join(l1, "_e")
    left = j2.filter(
        (F.col("_i") < F.col("_k1")) & (F.col("_k1") >= 2)
    ).withColumn(
        "_d",
        dstat(F.col("_p"), F.lit(0), F.col("_k1"), F.col("_i"),
              F.col("_pk1")),
    ).withColumn("_seg", F.lit(0))
    right = j2.filter(
        (F.col("_i") > F.col("_k1")) & (F.col("_i") < F.col("_n"))
        & (F.col("_n") - F.col("_k1") >= 2)
    ).withColumn(
        "_d",
        dstat(
            F.col("_p"), F.col("_pk1"),
            F.col("_n") - F.col("_k1"),
            F.col("_i") - F.col("_k1"),
            F.col("_t") - F.col("_pk1"),
        ),
    ).withColumn("_seg", F.lit(1))
    l2 = (
        left.unionByName(right)
        .groupBy("_e", "_seg")
        .agg(
            F.max(
                F.struct(
                    F.col("_d"), (-F.col("_i")).alias("_ni"),
                    F.col("_i"),
                )
            ).alias("_m")
        )
        .select(
            F.col("_e").alias("entity"),
            F.lit(2).alias("level"),
            F.col("_seg").alias("seg"),
            F.col("_m._i").alias("split_i"),
            F.col("_m._d").cast("long").alias("d_stat"),
        )
    )
    return out1.unionByName(l2)
