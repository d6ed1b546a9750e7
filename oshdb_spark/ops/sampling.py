"""Deterministic sampling for training-data pipelines.

A 10^12-doc corpus cannot be sampled with RNG state: resumed/retried
tasks would re-draw, two engines would disagree, and an audit could
never re-derive the keep set. The standard fix (what every serious data
pipeline ships) is HASH-based Bernoulli sampling: a row is kept iff a
cryptographic hash of its id falls under a threshold. Properties:

- deterministic and engine-portable — md5 hex is bit-identical in
  Spark, DuckDB, and Python, so the keep set is re-derivable anywhere
  (this is what makes the driver oracle possible);
- map-side only: no shuffle, no RNG seed plumbing, no skew — the plan
  is a single whole-stage-codegen filter;
- stratified: per-group rates (e.g. downsample English, keep all
  low-resource languages) compile to one CASE expression;
- stable under resharding: membership depends only on the id, never on
  partition layout or row order.

The threshold trick avoids hex→int conversion entirely: md5 produces a
uniform 32-char lowercase hex string, so `md5(id) < T` with T the
32-char hex threshold for rate r keeps an r-fraction — plain string
comparison, identical semantics in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_threshold(rate: float) -> str:
    """32-char lowercase hex threshold T such that a uniform 32-hex-char
    string s satisfies s < T with probability `rate` (quantized to
    1/16^8 ≈ 2.3e-10, exact at 0 and 1)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        return "g" * 32  # above every hex string
    return format(int(rate * 16**8), "08x") + "0" * 24


def sample_pred(
    id_col: str, rate: float, salt: str = ""
) -> Column:
    """Keep-predicate for deterministic Bernoulli sampling. `salt`
    derives an independent sample from the same ids (e.g. train/eval
    splits: disjoint salts give independent draws)."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return F.md5(key) < F.lit(rate_threshold(rate))


def deterministic_sample(
    df: DataFrame,
    rate: float | None = None,
    id_col: str = "doc_id",
    by: str | None = None,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Hash-based Bernoulli sample; uniform (`rate`) or stratified
    (`by` column + per-value `rates`, `default_rate` for the rest)."""
    if (rate is None) == (by is None):
        raise ValueError("pass exactly one of `rate` or (`by`, `rates`)")
    if rate is not None:
        return df.filter(sample_pred(id_col, rate, salt))
    thr = F.lit(rate_threshold(default_rate))
    for value, r in sorted((rates or {}).items()):
        thr = F.when(F.col(by) == value, F.lit(rate_threshold(r))).otherwise(thr)
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return df.filter(F.md5(key) < thr)


def split_assign(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/val/test assignment: the md5 of
    the GROUP key (not the row id) picks the split, so every row of a
    group — all pages of a domain, all chunks of a document — lands in
    the SAME split. Splitting near-duplicate-rich corpora by row id
    leaks train content into eval; group-keyed hashing is the standard
    fix (and the reason canonical domains exist upstream).

    `fractions` maps split name → fraction in listed order (must sum to
    ~1); assignment compares the hex md5 against cumulative
    `rate_threshold` cut points — reproducible, reshard-stable, no RNG
    state, exactly the membership discipline of deterministic_sample.
    Adds a `split` column; pure codegen (one md5 + a CASE)."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    key = F.md5(F.concat(F.col(group_col).cast("string"), F.lit(salt)))
    names = list(fractions)
    expr = F.lit(names[-1])
    cum = 0.0
    cuts = []
    for name in names[:-1]:
        cum += fractions[name]
        cuts.append((name, rate_threshold(cum)))
    for name, t in reversed(cuts):
        expr = F.when(key < F.lit(t), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
    key_out: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k by
    Efraimidis–Spirakis A-ES priority): row i is kept iff u_i^(1/w_i)
    is among the k largest, with u_i a hash-derived uniform — the
    standard way to take "k docs, probability ∝ quality weight" from a
    corpus with zero RNG state (same determinism contract as
    `deterministic_sample`: membership depends only on (id, salt, w)).

    u is the first 12 md5 hex chars as a 48-bit integer (exact in a
    double, exactly re-derivable in DuckDB digit-by-digit), mapped to
    (0, 1]. The priority is compared as ln(u)/w — a strictly monotone
    transform of u^(1/w), so the SAME top-k, without pow(). Weights
    must be > 0 (rows with w <= 0 or NULL are never sampled).

    Plan shape: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition partial top-k then a k-row merge on the driver; no
    global sort, no full shuffle. Ties broken by id (never in practice:
    48-bit priorities)."""
    hex12 = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12
    )
    u = (F.conv(hex12, 16, 10).cast("double") + 1.0) / F.lit(float(16**12))
    pri = F.log(u) / F.col(weight_col).cast("double")
    out = df.filter(F.col(weight_col) > 0).withColumn(
        key_out or "_aes_key", pri
    )
    out = out.orderBy(F.col(key_out or "_aes_key").desc(), F.col(id_col)).limit(k)
    return out if key_out else out.drop("_aes_key")


def diversity_sample(
    df: DataFrame,
    cents: list[list[float]],
    quota: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: at most `quota` rows per
    k-means cluster, chosen by deterministic md5 rank — the standard
    counter to head-heavy corpora (dominant clusters are capped, rare
    clusters survive whole). Same determinism contract as the Bernoulli
    sampler: membership depends only on (id, salt, centroids), never on
    partition layout, so the draw is reproducible and oracle-checkable.

    Plan — winners-then-broadcast-join, the skew-safe shape:
    1. project a NARROW (id, cluster, rank-key) frame (vectors and
       payload never enter any shuffle);
    2. per-(input-partition, cluster) top-quota window — the shuffle key
       includes the physical partition id, so a 90%-dominant cluster
       spreads over partitions×1 tasks instead of landing in one;
    3. global top-quota window over the surviving ≤ quota×partitions
       rows per cluster (tiny);
    4. BROADCAST the ≤ k×quota winner ids back onto the full frame.
    The global top-quota under a total order is a subset of every
    per-partition top-quota under the same order, so the output is
    row-identical to the naive single-window form and stays
    layout-independent. Returns the sampled rows plus their `cluster`
    column."""
    from pyspark.sql import Window

    from .clustering import kmeans_assign

    a = kmeans_assign(df, cents, vec_col=vec_col, out="cluster")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    narrow = a.select(
        F.col(id_col), F.col("cluster"), key.alias("_dkey"),
        F.spark_partition_id().alias("_pid"),
    )
    w_local = Window.partitionBy("_pid", "cluster").orderBy(
        F.col("_dkey"), F.col(id_col)
    )
    w_global = Window.partitionBy("cluster").orderBy(
        F.col("_dkey"), F.col(id_col)
    )
    winners = (
        narrow.withColumn("_rk", F.row_number().over(w_local))
        .filter(F.col("_rk") <= quota)
        .withColumn("_rk", F.row_number().over(w_global))
        .filter(F.col("_rk") <= quota)
        .select(id_col, "cluster")
    )
    return df.join(F.broadcast(winners), id_col)
