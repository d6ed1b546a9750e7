"""Incremental (Structured Streaming) processing of entity histories.

The reference is batch-only (`stream()` is just a lazy cursor,
MapReducer.java:1422-1431). This module adds the incremental layer a live
deployment needs, mapping the engine's semantics onto Structured
Streaming:

- windowed_event_counts: event-time windowed aggregation with a watermark
  (late-data policy) — the streaming analog of aggregateByTimestamp.
- contribution_tracker: a CUSTOM STATEFUL OPERATOR via
  applyInPandasWithState: per entity, carries (last_visible,
  last_tag_state, last_geom_epoch) across micro-batches and emits
  cumulative CREATION / DELETION / TAG_CHANGE / GEOMETRY_CHANGE counts —
  the contribution kernel's lag rules, incrementalized. Feed it
  time-ordered micro-batches (source files partitioned by time, as any
  log ingestion produces).

Scale posture: state is O(1) per entity (4 scalars); shuffle key is the
entity id; watermark bounds state for the windowed aggregation.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

TRACKER_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("creations", T.LongType()),
        T.StructField("deletions", T.LongType()),
        T.StructField("tag_changes", T.LongType()),
        T.StructField("geom_changes", T.LongType()),
        T.StructField("n_versions", T.LongType()),
    ]
)

TRACKER_STATE = T.StructType(
    [
        T.StructField("last_visible", T.BooleanType()),
        T.StructField("last_etype", T.StringType()),
        T.StructField("last_g", T.LongType()),
        T.StructField("n_versions", T.LongType()),
        T.StructField("creations", T.LongType()),
        T.StructField("deletions", T.LongType()),
        T.StructField("tag_changes", T.LongType()),
        T.StructField("geom_changes", T.LongType()),
        T.StructField("last_sec", T.LongType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream (one micro-batch per arriving file)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def windowed_event_counts(
    stream: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Event-time windowed counts per event_type with late-data watermark
    (streaming aggregateByTimestamp)."""
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _track(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-entity incremental contribution counting (the vectorized
    kernel's lag rules, one entity at a time, state carried across
    micro-batches). Batch-kernel parity requires the same (user_id, sec)
    dedup as model/history.versions_from_events: rows sort by (sec,
    event_id), same-second collisions keep the MIN event_id, and last_sec
    carries across micro-batches so cross-batch collisions dedup too."""
    if state.exists:
        (lv, le, lg, nv, cr, de, tc, gc, ls) = state.get
    else:
        lv, le, lg, nv, cr, de, tc, gc, ls = (False, "", -1, 0, 0, 0, 0, 0, -1)
    for pdf in pdfs:
        pdf = pdf.sort_values(["sec", "event_id"])
        pdf = pdf[~pdf["sec"].duplicated(keep="first") & (pdf["sec"] > ls)]
        if len(pdf):
            ls = int(pdf["sec"].iloc[-1])
        for etype in pdf["event_type"]:
            g = nv // 3  # geometry epoch of THIS version (version = nv+1)
            vis = etype != "error"
            # lag rules over ALL versions ≙ the batch kernel's state
            # classification (kernels/contribution._nodes_contrib_vec)
            if vis and not lv:
                cr += 1
            elif not vis and lv:
                de += 1
            elif vis and lv:
                if etype != le:
                    tc += 1
                if g != lg:
                    gc += 1
            lv, le, lg = vis, etype, g
            nv += 1
    state.update((lv, le, lg, nv, cr, de, tc, gc, ls))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "creations": cr,
                "deletions": de,
                "tag_changes": tc,
                "geom_changes": gc,
                "n_versions": nv,
            }
        ]
    )


def contribution_tracker(stream: DataFrame) -> DataFrame:
    """Cumulative per-entity contribution-type counts, updated every
    micro-batch (outputMode=update)."""
    ev = stream.withColumn("sec", F.unix_timestamp("ts").cast("long"))
    return (
        ev.select("user_id", "event_type", "sec", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=TRACKER_OUTPUT,
            stateStructType=TRACKER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("keep_id", T.LongType()),
    ]
)

DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_first(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the min-id document the FIRST time a content fingerprint is
    seen; every later duplicate (same or later micro-batch) is dropped."""
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is None:
        return
    state.update((True,))
    yield pd.DataFrame([{"fingerprint": key[0], "keep_id": best}])


def streaming_exact_dedup(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-micro-batch exact deduplication: the streaming counterpart of
    ``ops.dedup.exact_dedup`` — one surviving (fingerprint, keep_id) row
    per distinct content over the WHOLE stream, emitted in the micro-batch
    where the content first appears (outputMode=append).

    Scale posture: the shuffle key is the content hash (uniform), state is
    ONE boolean per distinct content, and duplicate payloads die at their
    first shuffle — downstream operators never see them."""
    fp = stream.select(
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _dedup_first,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_asof_enrich(
    stream: DataFrame,
    builds: DataFrame,
    on: str | list[str],
    stream_ts: str,
    build_ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-static point-in-time enrichment — the streaming counterpart
    of ``ops.joins.asof_join`` (backward, inclusive): every stream row
    picks the STATIC build row with the greatest build_ts at-or-before
    its own timestamp.

    A window over an unbounded stream can't express "latest earlier row",
    so the asof is re-shaped to fit stream-static joins: the static side
    is interval-ized once per key (valid_to = lead(build_ts), open for
    the newest row) and broadcast; the stream equi-joins on the key with
    the validity range as an extra join predicate. Validity intervals
    partition time per key, so each stream row matches EXACTLY one build
    row (or none) — append-mode safe, no row explosion, no state.

    Scale posture: BroadcastHashJoin on the key (the range test rides the
    join as a residual predicate); builds must be broadcast-sized —
    pre-aggregate per (key, ts) like any asof build side. Left-join
    semantics: unmatched stream rows keep NULLs."""
    keys = [on] if isinstance(on, str) else list(on)
    pay = [c for c in builds.columns if c not in keys]
    iv = builds.withColumn(
        "_vt", F.lead(build_ts).over(Window.partitionBy(*keys).orderBy(build_ts))
    )
    for c in keys + pay:
        iv = iv.withColumnRenamed(c, f"_b_{c}")
    cond = (F.col(stream_ts) >= F.col(f"_b_{build_ts}")) & (
        F.col("_vt").isNull() | (F.col(stream_ts) < F.col("_vt"))
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_b_{k}"))
    out = stream.join(F.broadcast(iv), cond, "left")
    for c in pay:
        out = out.withColumnRenamed(f"_b_{c}", f"{right_prefix}{c}")
    return out.drop("_vt", *[f"_b_{k}" for k in keys])


def windowed_cell_counts(
    stream: DataFrame,
    zoom: int = 4,
    window: str = "7 days",
    watermark: str = "2 days",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
) -> DataFrame:
    """Event-time windowed per-tile counts — the live tile-heat rollup
    (streaming analog of cells.tile_pyramid's finest level). Cell
    assignment is the codegen XYGrid id (cells.xy_id_col, reference
    border semantics); streaming state is one counter per
    (window, cell), bounded by the watermark. Out-of-range points
    (cell -1) are dropped like the batch rollup drops them."""
    from ..geo.cells import xy_id_col

    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withColumn("cell", xy_id_col(lon7_col, lat7_col, zoom))
        .filter(F.col("cell") >= 0)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cell", "cnt")
    )


def geofence_tracker(
    stream: DataFrame,
    fences: dict[str, tuple[int, int, int, int]],
    id_col: str = "user_id",
    sec_col: str = "sec",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming geofence enter/exit alerts — the incremental sibling of
    geo.trajectory.geofence_transitions (identical rows, emitted as the
    micro-batches arrive; parity pinned in tests/test_streaming.py).

    State per entity: one int8 per fence (-1 never observed, 0 last
    outside, 1 last inside), carried across micro-batches so a crossing
    that straddles a batch boundary still emits exactly one transition.
    Requires per-entity event-time monotone micro-batches (the replay
    harness guarantees it; a production feed would sort-within-watermark
    first). Inside-ness is the same INCLUSIVE int64 bbox compare as the
    batch operator — integer-exact, no float boundary."""
    import numpy as np

    names = sorted(fences)
    bounds = np.array([fences[k] for k in names], dtype=np.int64)

    def track(key, pdfs, state: GroupState):
        if state.exists:
            (last, last_sec) = state.get
            last = np.asarray(list(last), dtype=np.int8)
        else:
            last = np.full(len(names), -1, dtype=np.int8)
            last_sec = -1
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([sec_col, order_col])
            lon = pdf[lon7_col].to_numpy(dtype=np.int64)
            lat = pdf[lat7_col].to_numpy(dtype=np.int64)
            secs = pdf[sec_col].to_numpy(dtype=np.int64)
            for fi, name in enumerate(names):
                w, s, e, n = bounds[fi]
                ins = (
                    (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)
                ).astype(np.int8)
                prevs = np.concatenate(([last[fi]], ins[:-1]))
                for i in np.nonzero(
                    ((ins == 1) & (prevs != 1))
                    | ((ins == 0) & (prevs == 1))
                )[0]:
                    out_rows.append(
                        {
                            id_col: key[0],
                            "fence": name,
                            "kind": "enter" if ins[i] else "exit",
                            sec_col: int(secs[i]),
                        }
                    )
                if len(ins):
                    last[fi] = ins[-1]
            if len(secs):
                last_sec = int(secs[-1])
        state.update(([int(v) for v in last], last_sec))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[id_col, "fence", "kind", sec_col]
            )

    out_schema = (
        f"{id_col} long, fence string, kind string, {sec_col} long"
    )
    state_schema = "ins array<int>, last_sec long"
    return stream.groupBy(id_col).applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_colocation(
    stream: DataFrame,
    d_meters: float,
    t_seconds: int,
    watermark: str = "1 hour",
    id_col: str = "uid",
    lon7_col: str = "lon7",
    lat7_col: str = "lat7",
    ts_col: str = "ts",
    sec_col: str = "sec",
    lat_max: float = 70.0,
    dist_col: str = "dist_m",
    oracle_replay: bool = False,
) -> DataFrame:
    """Streaming co-location alerts — the live counterpart of
    ``geo.spatial_join.colocation_join``: emits one append-mode row per
    (left, right) fix pair within ``d_meters`` AND ``t_seconds``, as the
    fixes arrive. The one streaming feature nothing else in this layer
    exercises: a STREAM-STREAM self-join, whose buffered state Spark
    bounds with the watermark + event-time range condition.

    Shape: both sides watermark ``ts_col``; the probe side keeps its
    single grid cell (``radius_grid`` — one cell spans ≥ d even at
    lat_max), the build side replicates into its 3×3 cell neighborhood,
    so every qualifying pair meets on EXACTLY ONE cell key (no dedup,
    same argument as the batch join). The join condition carries the
    cell equality plus a LOOSE ±(t+1)s event-time range — that range is
    what lets the state store evict expired fixes — while the EXACT
    predicates (|Δsec| ≤ t on floor-epoch seconds, term-for-term with
    the batch operator, and the equirectangular distance ≤ d) refine as
    post-join filters.

    Correctness vs completeness is the caller's watermark choice: the
    PRODUCTION default is a real disorder bound (``watermark``, default
    1 hour) — state stays bounded by the disorder window and pairs later
    than it are dropped (the standard streaming trade). With time-ordered
    micro-batches whose disorder is within the bound, the result is
    still batch-complete (asserted by
    ``test_stream_colocation_matches_batch_join`` and the bounded-state
    twin). ``oracle_replay=True`` switches to a span-covering watermark
    (10 years — nothing is ever evicted), replaying the batch operator
    exactly regardless of arrival order; that is a REPLAY/VERIFICATION
    mode whose per-batch cost grows with total stream span — never the
    production posture.

    Scale posture: state per cell key holds only the watermark window of
    fixes; the 9× build replication ships ids+coords; the join is the
    streaming symmetric hash join keyed on the cell — no distinct, no
    Python, append-safe (no aggregation inside the stream)."""
    from ..geo.cells import _LAT_MAX, _LON_MAX
    from ..geo.spatial_join import equirect_distance_col, radius_grid

    if t_seconds <= 0:
        raise ValueError("t_seconds must be positive")
    if oracle_replay:
        watermark = "3650 days"  # span-covering: evict nothing, replay batch
    w, ncols, nrows, lat7_cap = radius_grid(d_meters, lat_max)
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    base = (
        stream.filter(
            (F.col(lat7_col) >= -lat7_cap) & (F.col(lat7_col) <= lat7_cap)
        )
        .withColumn(sec_col, F.unix_timestamp(ts_col).cast("long"))
        .withColumn("_x", F.floor((F.col(lon7_col) + _LON_MAX) / w))
        .withColumn("_y", F.floor((F.col(lat7_col) + _LAT_MAX) / w))
        .withWatermark(ts_col, watermark)
    )
    left = base.withColumn(
        "_cell", F.col("_y") * ncols + F.col("_x")
    ).drop("_x", "_y")
    rmap = {
        c: f"_r_{c}" for c in (id_col, lon7_col, lat7_col, ts_col, sec_col)
    }
    right = base
    for c, rc in rmap.items():
        right = right.withColumnRenamed(c, rc)
    right = (
        right.withColumn(
            "_rcell",
            F.explode(
                F.expr(
                    f"filter(flatten(transform(sequence(-1, 1), "
                    f"dy -> transform(sequence(-1, 1), "
                    f"dx -> named_struct('x', _x + dx, 'y', _y + dy)))), "
                    f"c -> c.x >= 0 AND c.x < {ncols} "
                    f"AND c.y >= 0 AND c.y < {nrows})"
                )
            ),
        )
        .withColumn("_rcell", F.col("_rcell.y") * ncols + F.col("_rcell.x"))
        .drop("_x", "_y")
    )
    slack = int(t_seconds) + 1
    cond = (
        (F.col("_cell") == F.col("_rcell"))
        & (
            F.col(rmap[ts_col])
            >= F.expr(f"{ts_col} - INTERVAL {slack} SECOND")
        )
        & (
            F.col(rmap[ts_col])
            <= F.expr(f"{ts_col} + INTERVAL {slack} SECOND")
        )
    )
    dist = equirect_distance_col(
        F.col(lat7_col) * 1e-7,
        F.col(lon7_col) * 1e-7,
        F.col(rmap[lat7_col]) * 1e-7,
        F.col(rmap[lon7_col]) * 1e-7,
    )
    return (
        left.join(right, cond)
        .filter(
            F.abs(F.col(sec_col) - F.col(rmap[sec_col]))
            <= F.lit(int(t_seconds))
        )
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= d_meters)
        .drop("_cell", "_rcell")
    )


def session_aggregate(
    stream: DataFrame,
    gap: str = "30 minutes",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    sec_col: str = "sec",
) -> DataFrame:
    """Stateful session windows on a stream — Spark's native
    ``session_window`` (merging event-time windows carried in the state
    store across micro-batches), the streaming counterpart of the batch
    gaps-and-islands sessionization. Boundary parity (empirically pinned
    in tests/test_streaming.py): an event exactly ``gap`` after the
    previous one MERGES — i.e. a new session starts only when the gap is
    STRICTLY exceeded, the same ``sec - prev > gap`` rule as the batch
    query and its oracle.

    Emits one row per (entity, session): event count, first/last epoch
    second. Complete output mode replays every session of a bounded
    stream batch-exactly; production use switches to append + a real
    watermark and receives sessions as they finalize."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withColumn(
            sec_col, F.unix_timestamp(ts_col).cast("long")
        )
        .withWatermark(ts_col, "1 second")
        .groupBy(
            F.col(entity_col),
            F.session_window(ts_col, gap).alias("_sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(sec_col).alias("first_sec"),
            F.max(sec_col).alias("last_sec"),
        )
        .drop("_sw")
    )
