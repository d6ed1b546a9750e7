"""Distributed k-means (Lloyd's) over embedding columns (array<float>).

The training loop a large-scale training-data pipeline needs
(cluster-based dedup / diversity sampling, SemDeDup-style grouping) and
the real coarse quantizer behind IVF ANN (similarity.ivf_ann's labeled
centroid stub).

Scale posture per iteration:
- centroids are a k×dim broadcast literal baked into the plan (no join);
- assignment is a map-side Catalyst argmin over the centroid array
  (aggregate/zip_with higher-order functions, no Python, no shuffle);
- the update is a partial+final hash aggregate producing k rows of
  (count, dim element sums) — the only shuffle is k groups wide.
The driver holds k×dim floats between iterations — the irreducible
synchronization point of Lloyd's — never row data.

Determinism contract (what the DuckDB oracle replays): init = first k
vectors ordered by id; ties in the argmin go to the lowest centroid
index; empty clusters keep their previous centroid; centroids are
quantized to 6 decimals (half-away-from-zero) after every update so
Spark's and the oracle's float-summation orders cannot drift apart
across iterations.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _vec_lit(vec) -> str:
    return "array(" + ", ".join(f"cast({float(x)} as double)" for x in vec) + ")"


def _l2_argmin_expr(vec_sql: str, cents: list[list[float]]) -> str:
    """Index of the nearest centroid by squared L2; strict-less fold keeps
    the LOWEST index on exact ties (matches the oracle's ORDER BY d, c)."""
    terms = []
    for ci, c in enumerate(cents):
        d = (
            f"aggregate(zip_with({vec_sql}, {_vec_lit(c)},"
            f" (x, y) -> (x - y) * (x - y)), cast(0 as double), (a, x) -> a + x)"
        )
        terms.append(f"named_struct('c', {ci}, 'd', {d})")
    arr = "array(" + ", ".join(terms) + ")"
    return (
        f"aggregate({arr},"
        f" named_struct('c', -1, 'd', cast('Infinity' as double)),"
        f" (acc, x) -> CASE WHEN x.d < acc.d THEN x ELSE acc END).c"
    )


def _q6(x: float) -> float:
    """Quantize to 6 decimals, half away from zero (= SQL round())."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[int]]:
    """Lloyd's k-means; returns (centroids, last-iteration cluster sizes).

    Sizes are the assignment counts of the FINAL iteration's argmin (the
    one that produced the returned centroids), so callers get consistent
    (centroid, population) pairs without an extra pass.
    """
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in init_rows]
    if not cents:
        return [], []
    dim = len(cents[0])
    v = f"cast({vec_col} as array<double>)"
    sizes = [0] * len(cents)
    for _ in range(n_iter):
        assigned = df.withColumn("_cl", F.expr(_l2_argmin_expr(v, cents)))
        agg = assigned.groupBy("_cl").agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(F.expr(f"{v}[{i}]")).alias(f"_s{i}") for i in range(dim)],
        )
        stats = {int(r["_cl"]): r for r in agg.collect()}
        sizes = [int(stats[c]["_n"]) if c in stats else 0
                 for c in range(len(cents))]
        cents = [
            [_q6(stats[c][f"_s{i}"] / sizes[c]) for i in range(dim)]
            if sizes[c]
            else cents[c]  # empty cluster keeps its previous centroid
            for c in range(len(cents))
        ]
    return cents, sizes


# Above this many centroids the unrolled Catalyst argmin expression is
# replaced by an Arrow-batched matrix argmin: the expression tree grows
# O(k·dim) and would blow past plan/codegen limits around k≈10^3
# (SemDeDup-style k≈√n at corpus scale is 10^4-10^5), while the numpy
# path is a (batch × k) GEMM whose centroid matrix ships once per task
# in the closure. The Catalyst path is kept for small k because it is
# pure codegen (no Python worker) and bit-reproduces the DuckDB oracle's
# sequential-fold distances; the matrix path sums in pairwise order, so
# exact distance TIES could in principle break differently in the last
# ulp — fine for assignment quality, which is why the oracle-checked
# queries (k=8) stay on the expression path.
_EXPR_ARGMIN_MAX_K = 64


def kmeans_assign(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Map-side nearest-centroid assignment (no shuffle). Small k compiles
    to a whole-stage-codegen argmin expression; large k (>64) runs a
    vectorized pandas-UDF matrix argmin (see _EXPR_ARGMIN_MAX_K)."""
    if len(cents) <= _EXPR_ARGMIN_MAX_K:
        v = f"cast({vec_col} as array<double>)"
        return df.withColumn(out, F.expr(_l2_argmin_expr(v, cents)))

    C = np.asarray(cents, dtype=np.float64)  # k × dim
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def _assign(s: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in s])
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per row,
        # so argmin over (-2x·c + ||c||²) suffices — np.argmin takes the
        # FIRST minimal index (the lowest-centroid tie rule)
        d = -2.0 * (X @ C.T) + c2[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn(out, _assign(F.col(vec_col)))
