"""Distributed temporal joins: as-of (point-in-time) and interval overlap.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and a naive
`a.join(b, a.ts >= b.ts)` compiles to BroadcastNestedLoop/cartesian —
unusable at 10^12 rows. Both operators here reduce to ONE hash shuffle
and stay inside whole-stage codegen:

- `asof_join`: union-tag + running `last(ignorenulls)` window. Both
  sides are tagged and unioned, sorted within each key by (ts, side)
  so every probe row sees exactly the latest build row at-or-before its
  timestamp from the running window. One shuffle on the key, a single
  sort pass, NO range explosion, NO per-row search: the classic
  log-merge shape (what pandas.merge_asof does per-group, made
  distributed). Works at any key cardinality; a single hot key
  serializes into one task's sort — pre-aggregate the build side per
  (key, ts) to bound it (the driver query does).

- `interval_overlap_join`: PBSM in time. Each interval [s, e) explodes
  to its covered fixed-width bins, the two sides equi-join on
  (keys..., bin), and a pair is emitted ONLY in the bin containing the
  later of the two starts — every overlapping pair has exactly one
  such bin, so no `distinct()` de-dup shuffle is needed (same
  report-at-reference-point trick as the spatial PBSM join in
  geo/spatial_join.py). Replication factor = ceil(len/width): pick the
  bin width near the median interval length.

Reference anchor: OSHDB answers "entity state at time t" inside its
CellIterator (oshdb-util CellIterator.java queryTs grouping) — these
operators expose the same at-or-before / validity-window semantics as
general table-to-table joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_prefix: str = "r_",
    skew: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row picks the single `right` row
    with the same key and the greatest `right_ts` <= `left_ts`
    (direction="backward", inclusive; "forward" = least right_ts >=
    left_ts). Unmatched probes keep NULLs (left-join semantics); with
    `tolerance`, a match further than `tolerance` time units away is
    nulled out (NOT replaced by the next candidate — DuckDB/pandas
    semantics).

    Right non-key columns come back prefixed with `right_prefix`.
    Right rows with a NULL key or NULL timestamp never match (standard
    join NULL semantics). If the right side has duplicate (key, ts)
    rows the winner among them is unspecified — pre-aggregate to unique
    (key, ts) for a deterministic result.

    `skew=False` (default): one hash shuffle on the key + a running
    window — a single mega-hot key serializes into one task's sort.
    `skew=True`: range-partition the union on (keys..., ts) so a hot
    key SPANS partitions, compute the running match per (partition,
    key) slice, then stitch slices with a per-key carry-in prefix scan
    over the tiny (partition, key) summary frame — the distributed
    prefix-scan shape (same trick as textstats.chunk_plan). Costs ~3
    extra small shuffles + an eager localCheckpoint (partition ids must
    be frozen, like chunk_plan), so use it only when one key dominates.
    Identical output to the default path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    pay_cols = [c for c in right.columns if c not in keys]
    clash = set(keys) & {left_ts} | {c for c in left.columns if c.startswith("_asof_")}
    if clash:
        raise ValueError(f"reserved/ambiguous columns: {sorted(clash)}")

    r = (
        right.filter(
            F.col(right_ts).isNotNull()
            & F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys))
        )
        .select(
            *keys,
            F.col(right_ts).alias("_asof_t"),
            F.lit(0).alias("_asof_side"),
            F.struct(*[F.col(c) for c in pay_cols]).alias("_asof_p"),
        )
    )
    pay_type = r.schema["_asof_p"].dataType
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(pay_type).alias("_asof_p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    order = (
        [F.col("_asof_t").asc(), F.col("_asof_side").asc()]
        if direction == "backward"
        else [F.col("_asof_t").desc(), F.col("_asof_side").asc()]
    )
    if skew:
        out = _asof_scan_skew(u, keys, order, direction, num_partitions)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_asof_p", ignorenulls=True).over(w)
        out = u.withColumn("_asof_m", matched)
    out = out.filter(F.col("_asof_side") == 1).withColumn(
        # a NULL left timestamp matches nothing (it still sorts somewhere
        # in the scan, so the running window could hand it a build row)
        "_asof_m",
        F.when(F.col("_asof_t").isNotNull(), F.col("_asof_m")),
    )

    if tolerance is not None:
        lag = (
            F.col("_asof_t") - F.col("_asof_m")[right_ts]
            if direction == "backward"
            else F.col("_asof_m")[right_ts] - F.col("_asof_t")
        )
        out = out.withColumn(
            "_asof_m",
            F.when(lag <= F.lit(tolerance), F.col("_asof_m")),
        )
    return out.select(
        *left.columns,
        *[
            F.col("_asof_m")[c].alias(f"{right_prefix}{c}")
            for c in pay_cols
        ],
    )


def _asof_scan_skew(
    u: DataFrame,
    keys: list[str],
    order: list[Column],
    direction: str,
    num_partitions: int | None,
) -> DataFrame:
    """Hot-key-proof running match over the tagged union `u`: slice the
    global (keys, ts, side) order into range partitions, running-match
    within each (partition, key) slice (bounded by partition size, not
    key frequency), carry the last build of each slice forward via a
    per-key prefix scan over the small (partition, key) summary."""
    spark = u.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    u2 = (
        u.repartitionByRange(p, *[F.col(k) for k in keys], *order)
        .withColumn("_asof_pid", F.spark_partition_id())
        # pids are only meaningful for the exact layout all the branches
        # below share — freeze them (chunk_plan's rule)
        .localCheckpoint(eager=True)
    )
    wrun = (
        Window.partitionBy("_asof_pid", *keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = u2.withColumn("_asof_loc", F.last("_asof_p", ignorenulls=True).over(wrun))

    builds = u2.filter(F.col("_asof_side") == 0)
    edge = F.max if direction == "backward" else F.min
    bm = builds.groupBy("_asof_pid", *keys).agg(edge("_asof_t").alias("_asof_bt"))
    co = (
        builds.join(bm, ["_asof_pid", *keys])
        .filter(F.col("_asof_t") == F.col("_asof_bt"))
        .dropDuplicates(["_asof_pid", *keys])
        .select("_asof_pid", *keys, F.col("_asof_p").alias("_asof_co"))
    )
    # one row per (partition, key) slice; hot keys contribute <= p rows
    grps = u2.select("_asof_pid", *keys).distinct()
    wpre = (
        Window.partitionBy(*keys)
        .orderBy("_asof_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cin = (
        grps.join(co, ["_asof_pid", *keys], "left")
        .withColumn("_asof_cin", F.last("_asof_co", ignorenulls=True).over(wpre))
        .select("_asof_pid", *keys, "_asof_cin")
    )
    return (
        loc.join(cin, ["_asof_pid", *keys], "left")
        .withColumn("_asof_m", F.coalesce("_asof_loc", "_asof_cin"))
        .drop("_asof_pid", "_asof_loc", "_asof_cin")
    )


def _bin_col(col: str, width: int) -> Column:
    # non-negative timestamps assumed: integer DIV == floor division,
    # identical to DuckDB's `//` on the oracle side.
    return F.expr(f"CAST(`{col}` DIV {int(width)} AS BIGINT)")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
    on: str | list[str] | None = None,
) -> DataFrame:
    """All pairs (a, b) whose half-open intervals [start, end) overlap
    (and share the `on` key columns, if given). Timestamps must be
    non-negative integers (epoch seconds/millis). Column names outside
    `on` must be disjoint between the two sides.

    Plan shape: explode each interval to its covered `bin_width` bins
    (sequence + explode, codegen), hash equi-join on (keys..., bin),
    then keep a pair only in the bin of `greatest(a_start, b_start)` —
    the unique bin both sequences contain for an overlapping pair, so
    the output needs no distinct(). Never a nested-loop join.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    shared = (set(a.columns) & set(b.columns)) - set(keys)
    if shared:
        raise ValueError(f"non-key columns present on both sides: {sorted(shared)}")

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        good = df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) > F.col(s))
        )
        bins = F.sequence(
            _bin_col(s, bin_width),
            F.expr(f"CAST((`{e}` - 1) DIV {int(bin_width)} AS BIGINT)"),
        )
        return good.withColumn("_bin", F.explode(bins))

    aa = binned(a, a_start, a_end)
    bb = binned(b, b_start, b_end).withColumnRenamed("_bin", "_bin_b")
    # rename b-side keys so every post-join name is unique — immune to
    # Spark's same-lineage self-join attribute ambiguity
    for k in keys:
        bb = bb.withColumnRenamed(k, f"_ioj_{k}")
    cond = F.col("_bin") == F.col("_bin_b")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_ioj_{k}"))
    ref_bin = F.expr(
        f"CAST(greatest(`{a_start}`, `{b_start}`) DIV {int(bin_width)} AS BIGINT)"
    )
    return (
        aa.join(bb, cond)
        .filter(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
            & (F.col("_bin") == ref_bin)
        )
        .drop("_bin", "_bin_b", *[f"_ioj_{k}" for k in keys])
    )
