"""Mergeable quantile sketch: t-digest (Dunning & Ertl, public algorithm).

The reference's estimatedMedian/estimatedQuantile reducers fold samples
into a t-digest whose partials merge associatively across cells/threads
(oshdb-api/.../TDigestReducer.java:21-41). This module implements the
MERGING t-digest variant from scratch (numpy) and maps it onto Spark's
two-phase aggregation:

    mapInPandas   — one digest per (group, arrow-batch): the map-side
                    partial (no shuffle of raw values!)
    applyInPandas — merge the partial digests per group, read quantiles

The shuffle therefore carries O(delta) centroids per group per batch
instead of the raw value stream — the property that makes the reference's
reducer scale, reproduced Spark-natively. Centroids ride as two parallel
double arrays (Arrow-safe).

Accuracy: with the k1 scale function bound 4·n·q·(1-q)/δ the relative
quantile error is O(1/δ) in the tails; tests assert against exact
percentiles on the driver testdata.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Merge sorted (mean, weight) centroid streams into ≤ ~δ clusters
    using the k1-style size bound 4·n·q·(1-q)/δ."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    acc = 0.0  # weight before the current cluster
    for m, w in zip(means[1:], weights[1:]):
        q = (acc + cur_w / 2.0) / total
        limit = max(4.0 * total * q * (1.0 - q) / delta, 1.0)
        if cur_w + w <= limit:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            acc += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def digest_of(values: np.ndarray, delta: int = 1000):
    """Build a digest from raw values."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    return _compress(v, np.ones(len(v)), delta)


def merge_digests(parts: list[tuple[np.ndarray, np.ndarray]], delta: int = 1000):
    """Associatively merge partial digests (the reducer's combine step)."""
    if not parts:
        return np.empty(0), np.empty(0)
    means = np.concatenate([p[0] for p in parts])
    weights = np.concatenate([p[1] for p in parts])
    return _compress(means, weights, delta)


def digest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Quantile estimate: interpolate between adjacent centroid means at
    the target cumulative weight (standard t-digest readout)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


_PARTIAL = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    by: str | None = None,
    delta: int = 1000,
) -> DataFrame:
    """Estimated quantiles per group via mergeable t-digests
    (estimatedQuantile parity, TDigestReducer.java:21-41; the default
    delta=1000 matches the reference's compression=1000).

    Output: (grp, q, value) — grp is the stringified group key ('' when
    ungrouped)."""
    cols = [F.col(by).cast("string").alias("grp")] if by else [
        F.lit("").alias("grp")
    ]
    src = df.select(*cols, F.col(value_col).cast("double").alias("val"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for grp, sub in pdf.groupby("grp", sort=False):
                m, w = digest_of(sub["val"].to_numpy(), delta)
                rows.append((grp, m.tolist(), w.tolist()))
            yield pd.DataFrame(rows, columns=["grp", "means", "weights"])

    partials = src.mapInPandas(partial, schema=_PARTIAL)

    out_schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("q", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def finish(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            (np.asarray(m, dtype=np.float64), np.asarray(w, dtype=np.float64))
            for m, w in zip(pdf["means"], pdf["weights"])
        ]
        means, weights = merge_digests(parts, delta)
        return pd.DataFrame(
            {
                "grp": key[0],
                "q": list(qs),
                "value": [digest_quantile(means, weights, q) for q in qs],
            }
        )

    return partials.groupBy("grp").applyInPandas(finish, schema=out_schema)


_CELL_DIGEST = T.StructType(
    [
        T.StructField("cell", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


def tdigest_tile_pyramid(
    df: DataFrame,
    value_col: str,
    lon7_col: str,
    lat7_col: str,
    zooms=(4, 2),
    qs=(0.5,),
    delta: int = 1000,
) -> DataFrame:
    """Per-tile quantile estimates at EVERY requested zoom from ONE scan
    of the rows — the mergeable-sketch datacube rollup. Leaf tiles (the
    finest zoom) build t-digests from rows (map-side partial digests,
    per-cell merge); every coarser zoom merges its children's DIGESTS
    through the exact power-of-two parent mapping (geo/cells.tile_pyramid
    cascade) without re-reading any row, so level z costs
    O(|tiles(z_prev)|) — the property that makes sketch cubes viable at
    100 TB (counts, HLL and t-digests roll up; exact percentiles don't).

    Returns (zoom, cell, q, n, value): n is the exact row count per tile
    (weights are preserved by merging, so it doubles as a cascade
    check); out-of-range points keep cell -1 at every zoom."""
    from ..geo.cells import xy_id_col

    zs = sorted({int(z) for z in zooms}, reverse=True)
    z0 = zs[0]
    src = df.select(
        xy_id_col(lon7_col, lat7_col, z0).alias("cell"),
        F.col(value_col).cast("double").alias("val"),
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cell, sub in pdf.groupby("cell", sort=False):
                m, w = digest_of(sub["val"].to_numpy(), delta)
                rows.append((int(cell), len(sub), m.tolist(), w.tolist()))
            yield pd.DataFrame(
                rows, columns=["cell", "n", "means", "weights"]
            )

    def merge_cell(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            (np.asarray(m, dtype=np.float64), np.asarray(w, dtype=np.float64))
            for m, w in zip(pdf["means"], pdf["weights"])
        ]
        means, weights = merge_digests(parts, delta)
        return pd.DataFrame(
            [
                {
                    "cell": key[0],
                    "n": int(pdf["n"].sum()),
                    "means": means.tolist(),
                    "weights": weights.tolist(),
                }
            ]
        )

    level = (
        src.mapInPandas(partial, schema=_CELL_DIGEST)
        .groupBy("cell")
        .applyInPandas(merge_cell, schema=_CELL_DIGEST)
    )

    out_schema = T.StructType(
        [
            T.StructField("zoom", T.IntegerType()),
            T.StructField("cell", T.LongType()),
            T.StructField("q", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def evaluate(zoom: int):
        def rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for _, r in pdf.iterrows():
                    m = np.asarray(r["means"], dtype=np.float64)
                    w = np.asarray(r["weights"], dtype=np.float64)
                    for q in qs:
                        out.append(
                            (zoom, int(r["cell"]), float(q), int(r["n"]),
                             digest_quantile(m, w, q))
                        )
                yield pd.DataFrame(
                    out, columns=["zoom", "cell", "q", "n", "value"]
                )

        return rows

    outs = [level.mapInPandas(evaluate(z0), schema=out_schema)]
    prev_z = z0
    for z in zs[1:]:
        dz = prev_z - z
        x = F.pmod(F.col("cell"), F.lit(1 << prev_z))
        y = (F.col("cell") - x) / F.lit(1 << prev_z)
        parent = (
            F.floor(y / (1 << dz)) * (1 << z) + F.floor(x / (1 << dz))
        ).cast("long")
        level = (
            level.withColumn(
                "cell",
                F.when(F.col("cell") < 0, F.lit(-1)).otherwise(parent),
            )
            .groupBy("cell")
            .applyInPandas(merge_cell, schema=_CELL_DIGEST)
        )
        outs.append(level.mapInPandas(evaluate(z), schema=out_schema))
        prev_z = z
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def hll_tile_pyramid(
    df: DataFrame,
    item_col: str,
    lon7_col: str,
    lat7_col: str,
    zooms=(4, 2),
    lgk: int = 12,
) -> DataFrame:
    """Distinct-count tile pyramid via DataSketches HLL — the
    pure-Catalyst sibling of `tdigest_tile_pyramid` (zero Python
    anywhere, whole-stage codegen): leaf tiles aggregate
    hll_sketch_agg(item), every coarser zoom hll_union_agg's its
    CHILDREN'S SKETCHES through the exact power-of-two parent cascade —
    one scan of the rows, level z costs O(|tiles(z+1)|) fixed-size
    sketches. The estimate is exact below the sketch's sparse-mode
    threshold and ~1.04/sqrt(2^lgk) relative error beyond it.

    Returns (zoom, cell, uniq_est)."""
    from ..geo.cells import xy_id_col

    zs = sorted({int(z) for z in zooms}, reverse=True)
    z0 = zs[0]
    level = (
        df.select(
            xy_id_col(lon7_col, lat7_col, z0).alias("cell"),
            F.col(item_col).alias("_it"),
        )
        .groupBy("cell")
        .agg(F.hll_sketch_agg("_it", F.lit(lgk)).alias("sk"))
    )

    def emit(lv: DataFrame, z: int) -> DataFrame:
        return lv.select(
            F.lit(z).cast("int").alias("zoom"),
            "cell",
            F.hll_sketch_estimate("sk").alias("uniq_est"),
        )

    outs = [emit(level, z0)]
    prev_z = z0
    for z in zs[1:]:
        dz = prev_z - z
        x = F.pmod(F.col("cell"), F.lit(1 << prev_z))
        y = (F.col("cell") - x) / F.lit(1 << prev_z)
        parent = (
            F.floor(y / (1 << dz)) * (1 << z) + F.floor(x / (1 << dz))
        ).cast("long")
        level = (
            level.withColumn(
                "cell",
                F.when(F.col("cell") < 0, F.lit(-1)).otherwise(parent),
            )
            .groupBy("cell")
            .agg(F.hll_union_agg("sk").alias("sk"))
        )
        outs.append(emit(level, z))
        prev_z = z
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters — the third mergeable sketch next to the
# t-digest (quantiles) and HLL++ (countUniq): approximate top-k items
# with a deterministic error guarantee.
# ---------------------------------------------------------------------------

def mg_summarize(items: np.ndarray, counts: np.ndarray, k: int):
    """Compress an exact (item, count) histogram into ≤ k Misra–Gries
    counters: if more than k distinct items, subtract the (k+1)-th
    largest count from all and keep the positive ones. Each kept counter
    underestimates its true count by at most the returned decrement."""
    if len(items) <= k:
        return items, counts, 0
    order = np.argsort(-counts, kind="stable")
    dec = int(counts[order[k]])
    kept = order[:k]
    newc = counts[kept] - dec
    pos = newc > 0
    return items[kept][pos], newc[pos], dec


def mg_merge(parts, k: int):
    """Merge MG summaries (item-wise counter sums, decrements add), then
    re-compress. The error bound adds across merge levels — still
    ≤ n/(k+1) overall for partials over n rows."""
    import collections

    acc: dict = collections.defaultdict(int)
    dec_total = 0
    for items, counts, dec in parts:
        dec_total += int(dec)
        for i, c in zip(items, counts):
            acc[i] += int(c)
    items = np.array(list(acc.keys()), dtype=object)
    counts = np.array(list(acc.values()), dtype=np.int64)
    items, counts, dec = mg_summarize(items, counts, k)
    return items, counts, dec_total + dec


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 16,
    capacity: int | None = None,
) -> DataFrame:
    """Approximate top-k items (Misra–Gries): per-partition exact
    histograms compress to ``capacity`` counters (default 8k — slack
    tightens the bound), ONE metadata-sized merge over
    ≤ capacity × partitions counter rows, re-compressed and cut to k.

    Output: (item, est_count, max_err), sorted (est desc, item), with the
    deterministic guarantee true_count ∈ [est_count, est_count+max_err].
    Scale shape: the full column reduces map-side to counters; only
    counters shuffle (a single tiny group)."""
    cap = capacity or 8 * k
    src = df.select(F.col(item_col).cast("string").alias("item"))

    part_schema = T.StructType(
        [
            T.StructField("pid", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("dec", T.LongType()),
        ]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        parts = []
        for pdf in batches:
            vc = pdf["item"].value_counts()
            parts.append((vc.index.to_numpy(), vc.to_numpy(np.int64), 0))
        if not parts:
            return
        items, counts, dec = mg_merge(parts, cap)
        pid = TaskContext.get().partitionId()  # partial identity only
        yield pd.DataFrame(
            {
                "pid": pid,
                "item": items,
                "cnt": counts.tolist(),
                "dec": int(dec),
            }
        )

    partials = src.mapInPandas(partial, part_schema)

    out_schema = T.StructType(
        [
            T.StructField("item", T.StringType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("max_err", T.LongType()),
        ]
    )

    def merge_all(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # terminal merge: item-wise counter sums under-count by at most
        # the summed partial decrements; cutting to the top k here is a
        # plain truncation (no future items to absorb), so NO further
        # compression — capacity ≥ distinct items yields exact counts
        grp = pdf.groupby("item", sort=False)["cnt"].sum()
        decs = int(pdf.drop_duplicates(subset=["pid"])["dec"].sum())
        items = grp.index.to_numpy()
        counts = grp.to_numpy(np.int64)
        order = np.lexsort((items.astype(str), -counts))[:k]
        return pd.DataFrame(
            {
                "item": items[order],
                "est_count": counts[order].tolist(),
                "max_err": decs,
            }
        )

    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(
        merge_all, schema=out_schema
    )


def cms_table(
    df,
    key_col: str,
    m: int = 256,
    k: int = 3,
) -> "DataFrame":
    """Count-Min sketch of a key column as a (row, pos, cnt) table —
    k·m mergeable counters regardless of corpus size (the frequency
    sibling of the HLL/t-digest sketches here; sketches of two corpora
    ADD cell-wise). Positions use the same Kirsch-Mitzenmacher double
    hashing as ops/bloom.py: pos_j(key) = (h1 + j·h2) mod m with 48-bit
    md5 halves — a pure function of the key, so DuckDB replays the
    whole sketch. Build shape: map-side k-row fan-out per key + ONE
    k·m-row hash aggregate."""
    from pyspark.sql import functions as F

    key_sql = f"cast({key_col} as string)"
    h1 = (
        f"cast(conv(substr(md5(concat({key_sql}, ':c1')), 1, 12), 16, 10)"
        f" as bigint)"
    )
    h2 = (
        f"cast(conv(substr(md5(concat({key_sql}, ':c2')), 1, 12), 16, 10)"
        f" as bigint)"
    )
    rows = df.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {k - 1}),"
                f" j -> named_struct('row', j,"
                f" 'pos', pmod({h1} + j * {h2}, {m})))"
            )
        ).alias("_rp")
    )
    return (
        rows.select(F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys,
    sketch,
    key_col: str,
    m: int = 256,
    k: int = 3,
    out: str = "est",
) -> "DataFrame":
    """Frequency estimate per key row: min over the k counters at the
    key's positions (CMS guarantee: est ≥ true count; overshoot bounded
    by collisions). The probe joins k rows per key against the k·m-row
    sketch — broadcast-sized by construction."""
    from pyspark.sql import functions as F

    key_sql = f"cast({key_col} as string)"
    h1 = (
        f"cast(conv(substr(md5(concat({key_sql}, ':c1')), 1, 12), 16, 10)"
        f" as bigint)"
    )
    h2 = (
        f"cast(conv(substr(md5(concat({key_sql}, ':c2')), 1, 12), 16, 10)"
        f" as bigint)"
    )
    probes = keys.select(
        key_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {k - 1}),"
                f" j -> named_struct('row', j,"
                f" 'pos', pmod({h1} + j * {h2}, {m})))"
            )
        ).alias("_rp"),
    ).select(
        key_col,
        F.col("_rp.row").alias("row"),
        F.col("_rp.pos").alias("pos"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "pos"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias(out)
    )
