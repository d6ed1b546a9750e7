"""Distributed embedding statistics: integer-exact covariance and PCA.

Covariance (the O(n·d²) heavy pass) is layout-invariant by
construction: each embedding is quantized to fixed-point int64
(``sign(x)·floor(|x|·scale + 0.5)`` — half away from zero, the exact
rule the DuckDB oracle applies), so every partial sum is an exact
integer and the grand totals do not depend on partition count or
summation order. Per Arrow batch, numpy produces the sufficient
statistics (n, Σq, Σqqᵀ — one int64 GEMM) as ONE combined flat array;
a map-side partial aggregate then reduces the posexploded positions,
so the only shuffle is O(#batches · (d²+d+1)) rows regardless of n.
The float covariance is derived per (i, j) with an IEEE expression
written term-for-term identically in the oracle (``+ 0.0`` normalizes
the sign of zero on both sides).

PCA runs power iteration on the COLLECTED covariance — d² doubles,
metadata-sized, never row data — with strict sequential folds and
per-iteration 6-decimal quantization so the DuckDB recursive-CTE
oracle replays the whole trajectory bit-for-bit (the same technique as
ops/clustering.kmeans_train and ops/classifier: determinism through
quantized updates, not through float-sum luck).

At 10^12 rows the covariance pass is a single narrow mapInPandas over
the embedding column (no shuffle of row data at all); d stays the
model dimension, so the collect and the iteration are O(d²) driver
work independent of corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

_TOTALS_SCHEMA = StructType(
    [StructField("pos", LongType()), StructField("tot", LongType())]
)


def _q6(x: float) -> float:
    """Quantize to 6 decimals, half away from zero (= SQL round())."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _dot_seq(a: list[float], b: list[float]) -> float:
    """Strict left fold over the elementwise products — the exact
    operation order of DuckDB's list_reduce(list_transform(list_zip))
    so both engines walk the same IEEE trajectory."""
    acc = a[0] * b[0]
    for i in range(1, len(a)):
        acc += a[i] * b[i]
    return acc


def second_moment_totals(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64,
    scale: int = 10**6,
) -> DataFrame:
    """Exact int64 sufficient statistics of the quantized embeddings as
    (pos, tot) rows: pos 0 = n, pos 1..d = Σq_i, pos d+1.. = Σ q_i·q_j
    row-major. One narrow Arrow pass + one tiny positional shuffle."""

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            q = (np.sign(x) * np.floor(np.abs(x) * scale + 0.5)).astype(
                np.int64
            )
            combined = np.concatenate(
                ([len(q)], q.sum(axis=0), (q.T @ q).ravel())
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "pos": np.arange(combined.size, dtype=np.int64),
                    "tot": combined,
                }
            )

    parts = df.select(vec_col).mapInPandas(_partials, schema=_TOTALS_SCHEMA)
    return parts.groupBy("pos").agg(F.sum("tot").alias("tot"))


def covariance_df(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64,
    scale: int = 10**6,
) -> DataFrame:
    """Distributed (i, j, cov) covariance rows: cov = S_ij/(n·scale²)
    − (M_i/(n·scale))·(M_j/(n·scale)), rounded to 6 decimals, zero-sign
    normalized — the arithmetic is written with the same association as
    the oracle so the doubles agree bitwise. All joins broadcast
    (d- and 1-row sides)."""
    tot = second_moment_totals(df, vec_col, dim, scale)
    n_df = tot.filter(F.col("pos") == 0).select(F.col("tot").alias("n"))
    m_df = tot.filter((F.col("pos") >= 1) & (F.col("pos") <= dim)).select(
        (F.col("pos") - 1).alias("mi_idx"), F.col("tot").alias("m")
    )
    s_df = tot.filter(F.col("pos") > dim).select(
        F.expr(f"(pos - 1 - {dim}) DIV {dim}").alias("i"),
        F.expr(f"(pos - 1 - {dim}) % {dim}").alias("j"),
        F.col("tot").alias("s"),
    )
    sc2 = float(scale) * float(scale)
    return (
        s_df.join(
            F.broadcast(m_df.withColumnRenamed("m", "m_i")),
            s_df.i == F.col("mi_idx"),
        )
        .drop("mi_idx")
        .join(
            F.broadcast(
                m_df.withColumnRenamed("m", "m_j").withColumnRenamed(
                    "mi_idx", "mj_idx"
                )
            ),
            F.col("j") == F.col("mj_idx"),
        )
        .drop("mj_idx")
        .crossJoin(F.broadcast(n_df))
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("s").cast("double") / F.col("n") / F.lit(sc2)
                    - (F.col("m_i").cast("double") / F.col("n") / F.lit(float(scale)))
                    * (F.col("m_j").cast("double") / F.col("n") / F.lit(float(scale))),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def collect_covariance(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64,
    scale: int = 10**6,
) -> list[list[float]]:
    """The d×d quantized covariance as a driver-side matrix (d² doubles
    of metadata, never row data)."""
    mat = [[0.0] * dim for _ in range(dim)]
    for r in covariance_df(df, vec_col, dim, scale).collect():
        mat[r["i"]][r["j"]] = float(r["cov"])
    return mat


def power_iteration(
    cov: list[list[float]], iters: int = 12
) -> tuple[list[float], float]:
    """Top eigenvector by fixed-step power iteration with 6-decimal
    per-iteration quantization (convergence is NOT assumed — both
    engines replay the same finite trajectory, so the result is
    deterministic whatever the spectrum). Returns (loadings, eigval =
    vᵀCv of the final iterate)."""
    d = len(cov)
    v = [1.0] + [0.0] * (d - 1)
    for _ in range(iters):
        w = [_dot_seq(row, v) for row in cov]
        nrm = math.sqrt(_dot_seq(w, w))
        if nrm == 0.0:
            return v, 0.0
        v = [_q6(w[i] / nrm) + 0.0 for i in range(d)]
    cv = [_dot_seq(row, v) for row in cov]
    return v, _q6(_dot_seq(v, cv)) + 0.0


def weighted_quantile(
    df,
    group_col: str,
    value_col,
    weight_col,
    num: int = 1,
    den: int = 2,
):
    """Exact weighted quantile per group (weighted median by default) —
    the smallest value whose cumulative weight reaches ``num/den`` of
    the group's total (the weighted ``percentile_disc`` rule; weighted
    medians are the robust aggregate sales/latency dashboards want
    when rows carry volumes).

    Exactness: values and weights must already be integers (quantize
    at the call site); the pick condition ``den·cumw ≥ num·W`` is pure
    integer arithmetic — no float rank, no interpolation. Ties collapse
    FIRST (one aggregate per distinct (group, value)) so the running
    sum is over deterministic distinct-value order.

    Plan shape: one partial+final aggregate onto (group, value) —
    map-side combine eats duplicate values — one running window over
    the collapsed (small) per-group value list, a broadcastable total
    join, one min_by aggregate. Returns
    (group, wq_value, total_weight)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per_val = df.groupBy(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).agg(F.sum(weight_col).alias("_w"))
    w = Window.partitionBy("_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_val.withColumn("_cw", F.sum("_w").over(w))
    tot = per_val.groupBy("_g").agg(F.sum("_w").alias("_tw"))
    j = cum.join(F.broadcast(tot), "_g").filter(
        F.lit(int(den)) * F.col("_cw") >= F.lit(int(num)) * F.col("_tw")
    )
    return j.groupBy(F.col("_g").alias(group_col)).agg(
        F.min("_v").alias("wq_value"),
        F.max("_tw").alias("total_weight"),
    )


def ols_trend(
    df,
    group_col: str,
    x_col: str,
    y_col: str,
):
    """Per-group simple linear regression (`regr_slope`/`regr_intercept`
    analog) — THE dashboard trendline: fit y = a·x + b per group by
    ordinary least squares and report slope, intercept and r².

    Exactness contract (the spearman_corr recipe): x and y must already
    be integers (quantize at the call site — seconds, cents); all five
    moments accumulate into DECIMAL(38,0) ≡ DuckDB HUGEINT, so the
    closed-form numerators/denominators are exact integers on both
    engines; only the final divisions are float, written term-for-term
    identically in the oracle and rounded to 6 decimals. Groups with
    zero x-variance yield null slope/intercept/r².

    Plan shape: ONE partial+final moment aggregate — map-side combine
    does the heavy lifting, the shuffle is one row per group. At 10^12
    rows this is the minimal-communication form of the fit.
    Returns (group, n, slope, intercept, r2)."""
    from pyspark.sql import functions as F

    dec = "decimal(38,0)"
    m = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x_col).alias("_sx"),
        F.sum(y_col).alias("_sy"),
        F.sum((F.col(x_col).cast(dec) * F.col(x_col))).alias("_sxx"),
        F.sum((F.col(y_col).cast(dec) * F.col(y_col))).alias("_syy"),
        F.sum((F.col(x_col).cast(dec) * F.col(y_col))).alias("_sxy"),
    )
    nD = F.col("_n").cast(dec)
    sxD, syD = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    num = (nD * F.col("_sxy") - sxD * syD).cast("double")
    vx = (nD * F.col("_sxx") - sxD * sxD).cast("double")
    vy = (nD * F.col("_syy") - syD * syD).cast("double")
    slope = num / vx
    return m.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        F.when(vx > 0, F.round(slope, 6)).alias("slope"),
        F.when(
            vx > 0,
            F.round(
                (F.col("_sy").cast("double")
                 - slope * F.col("_sx").cast("double"))
                / F.col("_n").cast("double"),
                6,
            ),
        ).alias("intercept"),
        F.when(
            (vx > 0) & (vy > 0), F.round(num * num / (vx * vy), 6)
        ).alias("r2"),
    )


def spearman_corr(
    df,
    group_col: str,
    x_col: str,
    y_col: str,
):
    """Spearman rank correlation per group — the robust monotone-
    association statistic (quality-signal validation: does metric A
    order documents like metric B?). Pearson over average ranks;
    fractional tie ranks stay exact by DOUBLING them (avg rank =
    (min_rank + max_rank)/2, so 2·rank = min + max, an integer).

    All five moments accumulate over integer doubled ranks into
    DECIMAL(38,0) (≡ DuckDB HUGEINT — the std_ellipse recipe), so the
    closed form consumes identical exact integers on both engines; the
    final sqrt/division is float, round(6). Constant columns (zero
    rank variance) yield null.

    Plan shape: two rank windows over the group key (one sort each) +
    ONE moment aggregate; no joins. Returns (group, n, rho)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wx = Window.partitionBy(group_col).orderBy(x_col)
    wy = Window.partitionBy(group_col).orderBy(y_col)
    # 2·avg_rank = rank + (rank + count_of_ties − 1)
    #            = 2·rank + cnt − 1 over the tie group
    r = (
        df.withColumn("_rx", F.rank().over(wx))
        .withColumn(
            "_cx", F.count(F.lit(1)).over(
                Window.partitionBy(group_col, x_col)
            )
        )
        .withColumn("_ry", F.rank().over(wy))
        .withColumn(
            "_cy", F.count(F.lit(1)).over(
                Window.partitionBy(group_col, y_col)
            )
        )
        .select(
            F.col(group_col).alias("_g"),
            (2 * F.col("_rx") + F.col("_cx") - 1).alias("_dx"),
            (2 * F.col("_ry") + F.col("_cy") - 1).alias("_dy"),
        )
    )
    dec = "decimal(38,0)"
    # cast ONE OPERAND to decimal BEFORE the multiply (the
    # gini_inequality/ols_trend pattern): doubled ranks reach 2n, so an
    # int64 product would silently wrap (ANSI off) past ~1.5e9-row
    # groups before an after-the-fact cast could see it; likewise the
    # plain rank sums (Σ ≤ 2n²) overflow int64 past ~2.1e9 rows
    m = r.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_dx").cast(dec)).alias("_sx"),
        F.sum(F.col("_dy").cast(dec)).alias("_sy"),
        F.sum(F.col("_dx").cast(dec) * F.col("_dx")).alias("_sxx"),
        F.sum(F.col("_dy").cast(dec) * F.col("_dy")).alias("_syy"),
        F.sum(F.col("_dx").cast(dec) * F.col("_dy")).alias("_sxy"),
    )
    nD = F.col("_n").cast(dec)
    sxD, syD = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    num = (nD * F.col("_sxy") - sxD * syD).cast("double")
    vx = (nD * F.col("_sxx") - sxD * sxD).cast("double")
    vy = (nD * F.col("_syy") - syD * syD).cast("double")
    return m.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).alias("rho"),
    )


def ztest_vs_control(
    df,
    arm_col: str,
    success_col,
    control_value,
):
    """Two-proportion z-test of every experiment arm against the
    control arm — the A/B-test readout: per arm (n, conversions, rate)
    plus the pooled-variance z-score against control.

    Counts are exact integers from ONE partial+final aggregate; the
    z closed form (p1−p0)/√(p̂(1−p̂)(1/n0+1/n1)) is evaluated with one
    fixed association, round(6) both engines; the control row is a
    broadcast 1-row join. Arms with zero pooled variance (p̂ ∈ {0,1})
    yield null z. Returns (arm, n, conv, rate, z) — the control's z
    is 0 by construction and reported as such."""
    from pyspark.sql import functions as F

    agg = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(success_col), 1).otherwise(0)).alias("conv"),
    )
    ctl = agg.filter(F.col("arm") == F.lit(control_value)).select(
        F.col("n").alias("_n0"), F.col("conv").alias("_c0")
    )
    j = agg.crossJoin(F.broadcast(ctl))
    p1 = F.col("conv").cast("double") / F.col("n").cast("double")
    p0 = F.col("_c0").cast("double") / F.col("_n0").cast("double")
    pp = (F.col("conv") + F.col("_c0")).cast("double") / (
        F.col("n") + F.col("_n0")
    ).cast("double")
    var = pp * (F.lit(1.0) - pp) * (
        F.lit(1.0) / F.col("n").cast("double")
        + F.lit(1.0) / F.col("_n0").cast("double")
    )
    return j.select(
        "arm",
        "n",
        "conv",
        F.round(p1, 6).alias("rate"),
        F.when(var > 0, F.round((p1 - p0) / F.sqrt(var), 6))
        .otherwise(
            F.when(F.col("arm") == F.lit(control_value), F.lit(0.0))
        )
        .alias("z"),
    )


def trimmed_mean(
    df,
    group_col: str,
    value_col: str,
    trim_num: int = 1,
    trim_den: int = 10,
):
    """Per-group trimmed mean — the robust location estimate
    dashboards want when tails are garbage: drop the k lowest and k
    highest values, k = floor(n·trim_num/trim_den), and average the
    rest. Values must already be integers (quantize at the call
    site), so the kept-sum is exact and only the final division is
    float (round 6). Duplicate values at the cut are interchangeable —
    any k lowest have the same multiset sum — so a bare value
    row_number is deterministic for the SUM even with ties.

    Plan: one rank window over the group sort + one broadcast-joined
    per-group count + one final aggregate. Returns
    (group, n, kept_n, trimmed_mean)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = F.floor(
        F.col("_n") * F.lit(int(trim_num)) / F.lit(int(trim_den))
    )
    d = (
        df.select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("_g").orderBy("_v")))
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy("_g")))
        .filter(
            (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
        )
    )
    return d.groupBy(F.col("_g").alias(group_col)).agg(
        F.max("_n").alias("n"),
        F.count(F.lit(1)).alias("kept_n"),
        F.round(
            F.sum("_v").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("trimmed_mean"),
    )


def quartiles_exact(
    df,
    group_col: str,
    value_col: str,
):
    """Exact per-group quartiles by the percentile_disc rule (the
    smallest value whose rank reaches q·n — no interpolation, so the
    result is a value that actually occurs and is integer-exact): one
    rank window over the group sort, three integer pick conditions,
    one aggregate. Returns (group, n, q1, q2, q3)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = (
        df.select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("_g").orderBy("_v")))
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy("_g")))
    )
    picks = []
    for name, num, den in (("q1", 1, 4), ("q2", 1, 2), ("q3", 3, 4)):
        picks.append(
            F.min(
                F.when(
                    F.col("_rn") * den >= F.col("_n") * num, F.col("_v")
                )
            ).alias(name)
        )
    return d.groupBy(F.col("_g").alias(group_col)).agg(
        F.max("_n").alias("n"), *picks
    )


def diversity_profile(
    df,
    entity_col: str,
    category_col: str,
):
    """Per-entity categorical diversity WITHOUT logarithms: Gini–
    Simpson impurity 1 − Σpᵢ² and the inverse-Simpson effective
    category count n²/Σnᵢ² — the diversity metrics that stay exact-
    rational (entropy's ln is not correctly rounded everywhere; these
    are one division of exact integers each, the engine's standard
    cross-engine float contract).

    Plan: two nested partial+final aggregates ((entity, category) →
    entity), both map-side combinable. Returns
    (entity, n, n_categories, gini, inv_simpson)."""
    from pyspark.sql import functions as F

    per_cat = df.groupBy(
        F.col(entity_col).alias("_e"), F.col(category_col).alias("_c")
    ).agg(F.count(F.lit(1)).alias("_n"))
    agg = per_cat.groupBy("_e").agg(
        F.sum("_n").alias("_tot"),
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"),
    )
    n_d = F.col("_tot").cast("double")
    s2_d = F.col("_s2").cast("double")
    return agg.select(
        F.col("_e").alias(entity_col),
        F.col("_tot").alias("n"),
        F.col("_k").alias("n_categories"),
        F.round(F.lit(1.0) - s2_d / (n_d * n_d), 6).alias("gini"),
        F.round(n_d * n_d / s2_d, 6).alias("inv_simpson"),
    )


def calibration_bins(
    df,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
):
    """Classifier reliability/calibration table — the ML-ops readout
    behind every calibration curve: bucket predictions into equal-width
    score bins and report count, mean predicted score, and observed
    positive rate per bin (plus each bin's |confidence − accuracy| gap,
    whose weighted sum is ECE).

    Exactness: scores quantize to integer per-myriad (1e-4) units, the
    bin index is an integer floor division (score 1.0 clamps into the
    top bin), sums are exact, and the three closing divisions are
    round(6) with fixed association. Plan: one partial+final
    aggregate. Returns (bin, n, mean_score, pos_rate, gap)."""
    from pyspark.sql import functions as F

    width = 10000 // int(n_bins)
    sc = F.round(F.col(score_col) * 10000.0, 0).cast("long")
    # non-negative integer division (double-div + trunc == floor here;
    # quotients this size are exact doubles)
    b = F.least(
        (sc / F.lit(width)).cast("long"), F.lit(int(n_bins) - 1)
    )
    d = df.select(
        b.alias("bin"),
        sc.alias("_s"),
        F.when(F.col(label_col), 1).otherwise(0).alias("_y"),
    )
    agg = d.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s").alias("_ss"),
        F.sum("_y").alias("_sy"),
    )
    ms = F.col("_ss").cast("double") / (
        F.col("n").cast("double") * F.lit(10000.0)
    )
    pr = F.col("_sy").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        F.round(ms, 6).alias("mean_score"),
        F.round(pr, 6).alias("pos_rate"),
        F.round(F.abs(ms - pr), 6).alias("gap"),
    )


def rank_normalize(
    df,
    group_col: str,
    value_col: str,
):
    """Percentile-rank normalization per group — the score-mixing
    transform data-curation pipelines use to put heterogeneous quality
    signals on one scale: pct = avg_rank / (n+1) ∈ (0, 1), with
    average ranks for ties (doubled-rank trick, so every term before
    the one division is an exact integer: 2·avg_rank = 2·rank + ties
    − 1, pct = that / (2·(n+1))).

    Plan: one rank window + one tie-count window over the same group
    sort + a count window — no joins. Returns the input keyed rows
    with (group, value, pct) rounded 6."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wr = Window.partitionBy("_g").orderBy("_v")
    wt = Window.partitionBy("_g", "_v")
    wn = Window.partitionBy("_g")
    d = (
        df.select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .withColumn("_r2", 2 * F.rank().over(wr)
                    + F.count(F.lit(1)).over(wt) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    return d.select(
        F.col("_g").alias(group_col),
        F.col("_v").alias(value_col),
        F.round(
            F.col("_r2").cast("double")
            / (F.lit(2.0) * (F.col("_n") + F.lit(1)).cast("double")),
            6,
        ).alias("pct"),
    )


def dispersion_index(
    df,
    entity_col: str,
    sec_col: str = "sec",
):
    """Index of dispersion (variance-to-mean ratio / Fano factor) of
    each entity's DAILY event counts over the dense global calendar —
    the burstiness diagnostic (Poisson ≈ 1, bursty ≫ 1, regular ≪ 1).
    Zero days enter the variance via the closed form without any grid
    explode: with N calendar days, S total events and Σc² over present
    days, D = (N·Σc² − S²)/(N·S) and mean = S/N — every term exact
    int64, two rounded divisions. Plan: one (entity, day) aggregate,
    one entity aggregate, one broadcast 1-row span join. Returns
    (entity, n_days, mean_per_day, dispersion)."""
    from pyspark.sql import functions as F

    day = F.floor(F.col(sec_col) / 86400).cast("long")
    pd_ = df.select(
        F.col(entity_col).alias("_e"), day.alias("_d")
    ).groupBy("_e", "_d").agg(F.count(F.lit(1)).alias("_c"))
    span = pd_.agg(
        (F.max("_d") - F.min("_d") + 1).alias("_nd")
    )
    agg = pd_.groupBy("_e").agg(
        F.sum("_c").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
    )
    j = agg.crossJoin(F.broadcast(span))
    nd = F.col("_nd").cast("double")
    s = F.col("_s").cast("double")
    return j.select(
        F.col("_e").alias(entity_col),
        F.col("_nd").alias("n_days"),
        F.round(s / nd, 6).alias("mean_per_day"),
        F.round(
            (F.col("_nd") * F.col("_s2")
             - F.col("_s") * F.col("_s")).cast("double")
            / (F.col("_nd") * F.col("_s")).cast("double"),
            6,
        ).alias("dispersion"),
    )


def ks_2sample(
    df,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
):
    """Two-sample Kolmogorov–Smirnov statistic — the log-free
    distribution-drift test (data-quality monitoring: 'did source B's
    length distribution shift from source A's?'): D = sup_x |F_A(x) −
    F_B(x)| over the pooled values.

    Exact-rational formulation: with cumulative counts c_A, c_B at
    each pooled distinct value, D = max |n_B·c_A − n_A·c_B| / (n_A·n_B)
    — the numerator is an exact integer maximized under a total
    (|num| DESC, value ASC) order, so the reported argmax location is
    deterministic; one final division, round(6).

    Plan: one (value) collapse aggregate + running windows over ONE
    pooled sort + broadcast 1-row totals + one argmax aggregate.
    Returns one row (n_a, n_b, ks_d, at_value)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == F.lit(group_a)).alias("_isa"),
        F.col(value_col).alias("_v"),
    )
    per_v = d.groupBy("_v").agg(
        F.sum(F.when(F.col("_isa"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(~F.col("_isa"), 1).otherwise(0)).alias("_cb"),
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.withColumn(
        "_cuma", F.sum("_ca").over(w)
    ).withColumn("_cumb", F.sum("_cb").over(w))
    tot = per_v.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    j = cum.crossJoin(F.broadcast(tot)).withColumn(
        "_num",
        F.abs(
            F.col("_nb") * F.col("_cuma")
            - F.col("_na") * F.col("_cumb")
        ),
    )
    best = j.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max(F.struct(F.col("_num"), (-F.col("_v")).alias("_nv")))
        .alias("_m"),
    )
    return best.select(
        "n_a",
        "n_b",
        F.round(
            F.col("_m._num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("ks_d"),
        (-F.col("_m._nv")).alias("at_value"),
    )


def gini_inequality(
    df,
    group_col: str,
    value_col: str,
):
    """Gini coefficient of inequality per group (Lorenz-curve area —
    'how concentrated is spend/length/attention'; distinct from the
    Gini-SIMPSON diversity impurity): for sorted non-negative values
    x₍₁₎…x₍ₙ₎, G = Σ(2i − n − 1)·x₍ᵢ₎ / (n·Σx).

    Exactness: integer values (quantize at the call site), one rank
    window over the group sort, every term of numerator and
    denominator an exact integer (ties: any order of equal values
    yields the same sum — the coefficient of x across its tie run is
    symmetric), one final division, round(6). Zero-total groups yield
    null. Returns (group, n, total, gini)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("_g").orderBy("_v")
    d = (
        df.select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .withColumn("_i", F.row_number().over(w))
    )
    dec = "decimal(38,0)"
    agg = d.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_s"),
        F.sum(
            ((2 * F.col("_i")).cast(dec) * F.col("_v"))
        ).alias("_num2"),
    )
    num = (
        F.col("_num2")
        - (F.col("_n") + 1).cast(dec) * F.col("_s")
    ).cast("double")
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        F.col("_s").alias("total"),
        F.when(
            F.col("_s") > 0,
            F.round(
                num
                / (F.col("_n").cast(dec) * F.col("_s"))
                .cast("double"),
                6,
            ),
        ).alias("gini"),
    )


def mannwhitney_u(
    df,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
):
    """Mann–Whitney U (Wilcoxon rank-sum) two-sample test — KS's
    rank-based companion (sensitive to location shift where KS is
    sup-sensitive): U_A = R_A − n_A(n_A+1)/2 with average ranks over
    the pooled sample.

    Exactness: doubled average ranks (2·rank + ties − 1) keep every
    rank term an exact integer (the spearman recipe), so 2·U_A is an
    exact integer; the normal-approximation z uses the tie-corrected
    variance with one fixed association and round(6). Plan: one
    pooled rank window + tie-count window + one aggregate + broadcast
    tie totals. Returns one row (n_a, n_b, u_a, z) — u_a reported as
    the exact double U_A (an integer or .5)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == F.lit(group_a)).alias("_isa"),
        F.col(value_col).alias("_v"),
    )
    wr = Window.orderBy("_v")
    wt = Window.partitionBy("_v")
    r = d.withColumn(
        "_r2", 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
    )
    dec = "decimal(38,0)"
    agg = r.agg(
        F.sum(F.when(F.col("_isa"), 1).otherwise(0)).alias("_na"),
        F.sum(F.when(~F.col("_isa"), 1).otherwise(0)).alias("_nb"),
        # decimal accumulator: doubled ranks reach 2n, so the int64
        # rank-sum would wrap past ~2.1e9 rows (same fix as spearman)
        F.sum(F.when(F.col("_isa"), F.col("_r2").cast(dec))).alias("_ra2"),
    )
    ties = (
        d.groupBy("_v").agg(F.count(F.lit(1)).alias("_t"))
        .agg(
            F.sum(
                (F.col("_t").cast(dec) * F.col("_t") * F.col("_t")
                 - F.col("_t"))
            ).alias("_t3t")
        )
    )
    j = agg.crossJoin(F.broadcast(ties))
    # 2·U_A = ΣR_A·2 − n_A(n_A+1) = _ra2 − 2·n_A·... careful: _ra2 is
    # Σ(2·avg_rank) = 2·R_A, so 2·U_A = _ra2 − n_A·(n_A+1)
    u2 = F.col("_ra2") - F.col("_na") * (F.col("_na") + 1)
    n = F.col("_na") + F.col("_nb")
    mean2 = (F.col("_na") * F.col("_nb")).cast("double")  # 2·mean(U)
    var = (
        (F.col("_na") * F.col("_nb")).cast("double") / 12.0
        * (
            (n + 1).cast("double")
            - F.col("_t3t").cast("double")
            / (n.cast(dec) * (n - 1)).cast("double")
        )
    )
    return j.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        (u2.cast("double") / 2.0).alias("u_a"),
        F.when(
            var > 0,
            F.round(
                (u2.cast("double") / 2.0 - mean2 / 2.0)
                / F.sqrt(var),
                6,
            ),
        ).alias("z"),
    )
