"""Temporal joins: asof_join and interval_overlap_join vs brute force,
weighted_sample vs a pandas A-ES replication."""

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oshdb_spark.ops.joins import asof_join, interval_overlap_join
from oshdb_spark.ops.sampling import weighted_sample


def _probe_rows():
    # (pid, key, ts) — includes equal-ts probe, pre-first-build probe,
    # null-key probe, and a key absent from the build side
    return [
        (1, "a", 100),
        (2, "a", 150),
        (3, "a", 50),
        (4, "b", 100),
        (5, None, 100),
        (6, "c", 100),
        (7, "a", None),  # null ts: matches nothing in either direction
    ]


def _build_rows():
    # (key, ts, val) — unique (key, ts); includes a null-ts and null-key row
    return [
        ("a", 100, 10.0),
        ("a", 120, 11.0),
        ("b", 90, 20.0),
        ("b", None, 21.0),
        (None, 100, 30.0),
    ]


@pytest.fixture()
def frames(spark):
    probes = spark.createDataFrame(_probe_rows(), "pid long, k string, ts long")
    builds = spark.createDataFrame(_build_rows(), "k string, ts long, val double")
    return probes, builds


def _brute_asof(direction="backward", tolerance=None):
    out = {}
    builds = [
        (k, t, v) for k, t, v in _build_rows() if k is not None and t is not None
    ]
    for pid, k, ts in _probe_rows():
        cands = [
            (t, v)
            for bk, t, v in builds
            if ts is not None
            and bk == k
            and (t <= ts if direction == "backward" else t >= ts)
        ]
        if not cands:
            out[pid] = (None, None)
            continue
        t, v = max(cands) if direction == "backward" else min(cands)
        lag = ts - t if direction == "backward" else t - ts
        out[pid] = (None, None) if tolerance is not None and lag > tolerance else (t, v)
    return out


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 20])
def test_asof_join_matches_brute_force(frames, direction, tolerance, skew):
    probes, builds = frames
    got = {
        r["pid"]: (r["r_ts"], r["r_val"])
        for r in asof_join(
            probes, builds, on="k", left_ts="ts", right_ts="ts",
            direction=direction, tolerance=tolerance,
            skew=skew, num_partitions=3,
        ).collect()
    }
    assert got == _brute_asof(direction, tolerance)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_skew_parity_hot_key(spark, direction):
    # 90% of probes AND builds on one key, forced across 8 range slices:
    # the skew path must agree with the default single-window path
    import numpy as np

    rng = np.random.default_rng(11)
    probes = [
        (i, "hot" if i % 10 else f"cold{i}", int(rng.integers(0, 10_000)))
        for i in range(2_000)
    ]
    builds = {}
    for _ in range(500):
        k = "hot" if rng.random() < 0.9 else f"cold{int(rng.integers(0, 200))}0"
        builds[(k, int(rng.integers(0, 10_000)))] = float(rng.integers(0, 10**6))
    p = spark.createDataFrame(probes, "pid long, k string, ts long")
    b = spark.createDataFrame(
        [(k, t, v) for (k, t), v in builds.items()], "k string, ts long, val double"
    )
    base = {
        r["pid"]: (r["r_ts"], r["r_val"])
        for r in asof_join(
            p, b, on="k", left_ts="ts", right_ts="ts", direction=direction
        ).collect()
    }
    skewed = {
        r["pid"]: (r["r_ts"], r["r_val"])
        for r in asof_join(
            p, b, on="k", left_ts="ts", right_ts="ts", direction=direction,
            skew=True, num_partitions=8,
        ).collect()
    }
    assert skewed == base


def test_asof_join_keeps_all_left_rows(frames):
    probes, builds = frames
    j = asof_join(probes, builds, on="k", left_ts="ts", right_ts="ts")
    assert j.count() == probes.count()
    assert [c for c in j.columns] == ["pid", "k", "ts", "r_ts", "r_val"]


def test_asof_join_multi_key(spark):
    probes = spark.createDataFrame(
        [(1, "a", 1, 100), (2, "a", 2, 100)], "pid long, k string, k2 int, ts long"
    )
    builds = spark.createDataFrame(
        [("a", 1, 90, 1.0), ("a", 2, 95, 2.0)], "k string, k2 int, ts long, v double"
    )
    got = {
        r["pid"]: r["r_v"]
        for r in asof_join(
            probes, builds, on=["k", "k2"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert got == {1: 1.0, 2: 2.0}


def _intervals_a():
    # (aid, key, s, e) half-open
    return [
        (1, "x", 0, 10),
        (2, "x", 10, 20),   # touches 1 at 10: NOT an overlap (half-open)
        (3, "x", 5, 105),   # long interval spanning many bins
        (4, "y", 0, 10),
        (5, "x", 30, 30),   # empty: never matches
    ]


def _intervals_b():
    return [
        (10, "x", 9, 11),    # overlaps 1, 2, 3
        (11, "x", 100, 200), # overlaps 3 only
        (12, "y", 9, 10),    # overlaps 4 (same bin as its start)
        (13, "x", 20, 25),   # overlaps 3 only (1-bin interval)
        (14, "z", 0, 5),     # key with no a-side rows
    ]


def _brute_pairs():
    pairs = set()
    for aid, ka, s1, e1 in _intervals_a():
        for bid, kb, s2, e2 in _intervals_b():
            if ka == kb and s1 < e2 and s2 < e1 and e1 > s1 and e2 > s2:
                pairs.add((aid, bid))
    return pairs


@pytest.mark.parametrize("width", [1, 7, 64, 1000])
def test_interval_overlap_join_matches_brute_force(spark, width):
    a = spark.createDataFrame(_intervals_a(), "aid long, k string, a_s long, a_e long")
    b = spark.createDataFrame(_intervals_b(), "bid long, k string, b_s long, b_e long")
    j = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bin_width=width, on="k"
    )
    got = {(r["aid"], r["bid"]) for r in j.collect()}
    assert got == _brute_pairs()
    # exactly-once emission: no duplicate pairs at any bin width
    assert j.count() == len(_brute_pairs())


def test_interval_overlap_join_no_keys(spark):
    a = spark.createDataFrame([(1, 0, 10)], "aid long, a_s long, a_e long")
    b = spark.createDataFrame([(2, 5, 6), (3, 10, 12)], "bid long, b_s long, b_e long")
    j = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width=4)
    assert {(r["aid"], r["bid"]) for r in j.collect()} == {(1, 2)}


def test_interval_overlap_join_rejects_shared_columns(spark):
    a = spark.createDataFrame([(1, 0, 10)], "x long, s long, e long")
    with pytest.raises(ValueError):
        interval_overlap_join(a, a, "s", "e", "s", "e", bin_width=4)


@pytest.mark.parametrize("seed", [7, 23])
def test_asof_join_randomized_differential(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    n_keys = 12
    probes = [
        (i, int(rng.integers(0, n_keys)), int(rng.integers(0, 1000)))
        for i in range(300)
    ]
    builds = {}
    for _ in range(200):  # unique (key, ts) by construction
        builds[(int(rng.integers(0, n_keys)), int(rng.integers(0, 1000)))] = float(
            rng.integers(0, 10**6)
        )
    build_rows = [(k, t, v) for (k, t), v in builds.items()]
    p = spark.createDataFrame(probes, "pid long, k long, ts long")
    b = spark.createDataFrame(build_rows, "k long, ts long, val double")
    for direction, tol in [("backward", None), ("forward", 100)]:
        got = {
            r["pid"]: (r["r_ts"], r["r_val"])
            for r in asof_join(
                p, b, on="k", left_ts="ts", right_ts="ts",
                direction=direction, tolerance=tol,
            ).collect()
        }
        for pid, k, ts in probes:
            cands = [
                (t, v)
                for (bk, t), v in builds.items()
                if bk == k and (t <= ts if direction == "backward" else t >= ts)
            ]
            if not cands:
                want = (None, None)
            else:
                t, v = max(cands) if direction == "backward" else min(cands)
                lag = abs(ts - t)
                want = (None, None) if tol is not None and lag > tol else (t, v)
            assert got[pid] == want, (pid, direction, tol)


@pytest.mark.parametrize("seed", [3, 41])
def test_interval_overlap_join_randomized_differential(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)

    def mk(n, id0):
        rows = []
        for i in range(n):
            s = int(rng.integers(0, 500))
            # mix of empty, tiny, medium, and span-many-bins intervals
            e = s + int(rng.choice([0, 1, 2, 13, 64, 300]))
            rows.append((id0 + i, int(rng.integers(0, 4)), s, e))
        return rows

    ra, rb = mk(150, 1000), mk(150, 2000)
    a = spark.createDataFrame(ra, "aid long, k long, a_s long, a_e long")
    b = spark.createDataFrame(rb, "bid long, k long, b_s long, b_e long")
    want = {
        (aid, bid)
        for aid, ka, s1, e1 in ra
        for bid, kb, s2, e2 in rb
        if ka == kb and s1 < e2 and s2 < e1 and e1 > s1 and e2 > s2
    }
    for width in (13, 256):
        j = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bin_width=width, on="k"
        )
        rows = j.collect()
        assert {(r["aid"], r["bid"]) for r in rows} == want
        assert len(rows) == len(want)  # exactly-once at every width


def _aes_priority(doc_id: str, w: int, salt: str = "") -> float:
    h = hashlib.md5((doc_id + salt).encode()).hexdigest()[:12]
    u = (int(h, 16) + 1.0) / 16**12
    return math.log(u) / w


def test_weighted_sample_matches_pandas_replication(spark):
    rows = [(f"d{i}", (i % 37) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, w int")
    got = {r["doc_id"] for r in weighted_sample(df, 20, "w").collect()}
    want = set(
        pd.DataFrame(rows, columns=["doc_id", "w"])
        .assign(p=lambda d: [_aes_priority(i, w) for i, w in zip(d.doc_id, d.w)])
        .nlargest(20, "p")["doc_id"]
    )
    assert got == want


def test_weighted_sample_skips_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 0), ("c", -1), ("d", 3)], "doc_id string, w int"
    )
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    assert got == {"a", "d"}


def test_weighted_sample_heavy_weight_dominates(spark):
    # one row with overwhelming weight is essentially always kept
    rows = [("big", 1_000_000)] + [(f"s{i}", 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, w int")
    got = {r["doc_id"] for r in weighted_sample(df, 5, "w").collect()}
    assert "big" in got and len(got) == 5
