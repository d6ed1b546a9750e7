"""HMM (Viterbi) map matching: per-entity GPS fix sequences → the most
likely segment path over a segment table.

The classic Newson–Krumm shape with a constant switch penalty: emission
cost of (fix, segment) = the snap distance in integer MILLIMETERS (from
`spatial_join.segment_snap_candidates`), transition cost = 0 when the
segment is unchanged, else ``switch_cost_mm`` — so the matched path
trades snap error against route stability ("sticky snapping"). Costs
are exact int64 arithmetic end to end, which makes the whole operator
engine-reproducible: no float sums, no order sensitivity.

Per-fix output WITHOUT backtracking: with forward costs f(i,s) =
emm(i,s) + min_p(f(i-1,p) + trans(p,s)) and backward costs b(i,s)
defined symmetrically, total(i,s) = f + b - emm is the cost of the best
full path constrained through state s at fix i; min_s total(i,s) equals
the global optimum G at EVERY fix (every layer is crossed by an optimal
path), and the deterministic pick per fix is the lowest-sid state among
{s : total(i,s) = G}. This forward/backward form needs no argmin
tie-break inside the DP itself (only values propagate) and replays
exactly in SQL via two recursive CTEs with min() in the recursive term.

Scale shape (100 TB): candidates come from the PBSM cell-cover stage
(pure codegen); a (entity, fix) window prunes to the ``n_cand`` best
candidates per fix BEFORE the entity shuffle, so the per-entity DP task
holds ≤ n_cand × trajectory_length rows no matter how dense the
segment table is around one fix; the DP itself is one
groupBy(entity).applyInPandas with O(T · n_cand²) numpy work per
entity — the per-entity-sequential part of map matching is inherent
(each fix depends on the previous), everything cross-entity is
embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spatial_join import segment_snap_candidates

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ord_key", T.LongType()),
        T.StructField("sid", T.LongType()),
        T.StructField("dist_m", T.DoubleType()),
        T.StructField("path_cost_mm", T.LongType()),
    ]
)

_OUT_COLS = ["entity", "seq", "ord_key", "sid", "dist_m", "path_cost_mm"]


def _empty_match() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=object) for c in _OUT_COLS})


def hmm_map_match(
    fixes: DataFrame,
    segments: DataFrame,
    d_meters: float,
    switch_cost_mm: int = 20_000_000,
    n_cand: int = 4,
    zoom: int = 6,
    lat_max: float = 70.0,
    n_salts: int = 1,
    entity_col: str = "entity",
    order_col: str = "ord_key",
    sid_col: str = "sid",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    ax_col: str = "ax7",
    ay_col: str = "ay7",
    bx_col: str = "bx7",
    by_col: str = "by7",
) -> DataFrame:
    """Match each entity's fix sequence to segments under the integer
    Viterbi model above.

    ``fixes`` carries (entity_col:int64, order_col:int64 — the per-
    entity temporal order key, lon7, lat7); ``segments`` the fixed-point
    endpoint rows. Fixes with NO candidate within ``d_meters`` drop out
    and the surviving fixes of an entity re-index densely (``seq`` —
    the standard skip-unmatchable-fix rule), so the DP always chains
    consecutive SURVIVING fixes. Output: entity, seq, ord_key, sid,
    dist_m (the matched state's mm-exact snap distance), path_cost_mm
    (the entity's optimal total — identical on every row of the
    entity)."""
    P = int(switch_cost_mm)
    C = int(n_cand)
    if P < 0 or C < 1:
        raise ValueError("switch_cost_mm must be >= 0 and n_cand >= 1")

    cand = segment_snap_candidates(
        fixes.select(entity_col, order_col, lon7_col, lat7_col),
        segments,
        d_meters,
        zoom,
        lat_max,
        n_salts,
        sid_col=sid_col,
        lon7_col=lon7_col,
        lat7_col=lat7_col,
        ax_col=ax_col,
        ay_col=ay_col,
        bx_col=bx_col,
        by_col=by_col,
    ).select(
        F.col(entity_col).cast("long").alias("_ent"),
        F.col(order_col).cast("long").alias("_ord"),
        F.col(sid_col).cast("long").alias("_sid"),
        "_mm",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_ent", "_ord").orderBy("_mm", "_sid")
    pruned = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= C)
        .drop("_rn")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty_match()
        ent = int(pdf["_ent"].iloc[0])
        pdf = pdf.sort_values(["_ord", "_mm", "_sid"], kind="mergesort")
        layers = []
        for ordv, g in pdf.groupby("_ord", sort=True):
            g = g.head(C)  # idempotent with the pre-shuffle prune
            layers.append(
                (
                    int(ordv),
                    g["_sid"].to_numpy(np.int64),
                    g["_mm"].to_numpy(np.int64),
                )
            )
        n = len(layers)
        f: list = [None] * n
        b: list = [None] * n
        f[0] = layers[0][2].copy()
        for i in range(1, n):
            sp = layers[i - 1][1]
            sc, ec = layers[i][1], layers[i][2]
            trans = np.where(sp[:, None] == sc[None, :], 0, P)
            f[i] = ec + (f[i - 1][:, None] + trans).min(axis=0)
        b[n - 1] = layers[n - 1][2].copy()
        for i in range(n - 2, -1, -1):
            sn = layers[i + 1][1]
            sc, ec = layers[i][1], layers[i][2]
            trans = np.where(sc[:, None] == sn[None, :], 0, P)
            b[i] = ec + (b[i + 1][None, :] + trans).min(axis=1)
        G = int(f[n - 1].min())
        rows = []
        for i, (ordv, sids, emm) in enumerate(layers):
            tot = f[i] + b[i] - emm
            m = int(tot.min())
            assert m == G, "layer optimum != global optimum (DP bug)"
            js = np.nonzero(tot == m)[0]
            j = int(js[np.argmin(sids[js])])
            rows.append(
                (ent, i, ordv, int(sids[j]), float(emm[j]) / 1000.0, m)
            )
        return pd.DataFrame(rows, columns=_OUT_COLS)

    return pruned.groupBy("_ent").applyInPandas(kernel, MATCH_SCHEMA)
