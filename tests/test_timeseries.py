"""Differentials for the irregular time-series rollups: LOCF
time-weighted average and OHLC bars vs direct per-entity replays,
including equal-timestamp tie-breaks and zero-span omission."""

import random

from pyspark.sql import functions as F


def _rows(seed=17, n_ent=6):
    random.seed(seed)
    rows = []
    seq = 0
    for ent in range(n_ent):
        t = 1_000_000
        for _ in range(random.randint(2, 30)):
            rows.append(
                (ent, t, seq, round(random.uniform(0, 200), 2))
            )
            seq += 1
            if random.random() < 0.2:
                # equal-timestamp pair: seq must break the tie
                rows.append(
                    (ent, t, seq, round(random.uniform(0, 200), 2))
                )
                seq += 1
            t += random.randint(1, 5_000)
    rows.append((90, 7_777, 9_000, 42.0))  # single event: zero span
    rows.append((91, 8_888, 9_001, 10.0))  # two events, same second
    rows.append((91, 8_888, 9_002, 20.0))
    return rows


def test_time_weighted_avg_matches_replay(spark):
    from oshdb_spark.ops.timeseries import time_weighted_avg

    rows = _rows()
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {
        r["entity"]: (r["span_s"], r["twa"])
        for r in time_weighted_avg(df).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    for ent, evs in by_ent.items():
        evs.sort()
        num = 0
        span = 0
        for (s0, _, v0), (s1, _, _) in zip(evs[:-1], evs[1:]):
            cents = int(abs(v0) * 100 + 0.5)
            num += cents * (s1 - s0)
            span += s1 - s0
        if span == 0:
            assert ent not in got  # zero-span entities omitted
            continue
        g = got[ent]
        assert g[0] == span, ent
        assert abs(g[1] - round(num / (span * 100.0), 6)) < 1e-9, ent
    assert 90 not in got and 91 not in got


def test_ohlc_matches_replay(spark):
    from oshdb_spark.ops.timeseries import ohlc

    rows = _rows(seed=23)
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    ).withColumn("wk", F.floor(F.col("sec") / 3600).cast("long"))
    got = {
        (r["entity"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"]
        )
        for r in ohlc(df, bucket_col="wk").collect()
    }
    by_key = {}
    for uid, sec, seq, val in rows:
        by_key.setdefault((uid, sec // 3600), []).append((sec, seq, val))
    assert len(got) == len(by_key)
    for key, evs in by_key.items():
        evs.sort()  # (sec, seq) order == packed-key order
        vals = [v for _, _, v in evs]
        exp = (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))
        assert got[key] == exp, key


def test_gapfill_locf_matches_replay(spark):
    from oshdb_spark.ops.timeseries import gapfill_locf

    rows = _rows(seed=41)
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    W = 1000
    got = {
        (r["entity"], r["bucket"]): (r["value"], r["is_filled"])
        for r in gapfill_locf(df, W).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    exp = {}
    n_filled = 0
    for ent, evs in by_ent.items():
        evs.sort()
        per_bucket = {}
        for sec, seq, val in evs:  # sorted => last wins == max packed key
            per_bucket[sec // W] = val
        mn, mx = min(per_bucket), max(per_bucket)
        cur = None
        for b in range(mn, mx + 1):
            if b in per_bucket:
                cur = per_bucket[b]
                exp[(ent, b)] = (cur, False)
            else:
                exp[(ent, b)] = (cur, True)
                n_filled += 1
    assert got == exp
    assert n_filled > 10  # gaps actually exist and were filled


def test_counter_rate_matches_replay(spark):
    from oshdb_spark.ops.timeseries import counter_rate

    rows = _rows(seed=43)
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {
        r["entity"]: (r["span_s"], r["increase"], r["rate_per_s"])
        for r in counter_rate(df).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    n_resets = 0
    for ent, evs in by_ent.items():
        evs.sort()
        span = evs[-1][0] - evs[0][0]
        if span == 0 or len(evs) < 2:
            assert ent not in got
            continue
        inc = 0
        prev = None
        for _, _, v in evs:
            c = int(v * 100 + 0.5)
            if prev is not None:
                if c >= prev:
                    inc += c - prev
                else:
                    inc += c  # reset: counter restarted at c
                    n_resets += 1
            prev = c
        g = got[ent]
        assert g[0] == span
        assert abs(g[1] - round(inc / 100.0, 6)) < 1e-9
        assert abs(g[2] - round(inc / (span * 100.0), 6)) < 1e-9
    assert n_resets > 5  # the random gauge exercises the reset branch


def test_sax_symbols_matches_replay(spark):
    import math

    from oshdb_spark.ops.timeseries import sax_symbols

    rows = _rows(seed=59)
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    # a constant-value entity must be omitted (zero variance)
    flat = [(80, 1000 + i, 9500 + i, 5.0) for i in range(10)]
    df = df.union(spark.createDataFrame(
        flat, "uid long, sec long, seq long, value double"
    ))
    B, bps = 8, [-0.6745, 0.0, 0.6745]
    got = {
        r["entity"]: (r["n_points"], r["sax"])
        for r in sax_symbols(df, n_buckets=B, alphabet=4).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows + flat:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    for ent, evs in by_ent.items():
        evs.sort()
        c = [int(v * 100 + 0.5) for _, _, v in evs]
        n = len(c)
        s, s2 = sum(c), sum(x * x for x in c)
        if s2 * n == s * s:
            assert ent not in got
            continue
        mean = s / (n * 100.0)
        std = math.sqrt(s2 / (n * 10000.0) - mean * mean)
        buckets = {}
        for k, x in enumerate(c):
            buckets.setdefault(math.floor(k * B / n), []).append(x)
        sax = ""
        for b in sorted(buckets):
            paa = sum(buckets[b]) / (len(buckets[b]) * 100.0)
            z = (paa - mean) / std
            sax += ("a" if z < bps[0] else "b" if z < bps[1]
                    else "c" if z < bps[2] else "d")
        assert got[ent] == (n, sax), ent
    assert 80 not in got
    # non-degenerate alphabet usage across the corpus
    assert len({ch for _, sx in got.values() for ch in sx}) >= 3


def _lttb_reference(points, n_out):
    """Textbook LTTB (Steinarsson 2013) over cents-quantized values,
    computed with exact Fractions — an INDEPENDENT implementation: the
    unscaled centroid average and plain tuple argmax, no L-scaling or
    key packing like the engine kernel."""
    import math
    from fractions import Fraction

    pts = sorted(points)  # (sec, seq, value)
    n = len(pts)
    if n <= n_out:
        return pts
    ys = [
        int(math.copysign(math.floor(abs(v) * 100 + 0.5), v))
        for _, _, v in pts
    ]
    xs = [s for s, _, _ in pts]
    B = n_out - 2
    buckets = {}
    for k in range(1, n - 1):
        buckets.setdefault((k - 1) * B // (n - 2), []).append(k)
    kept = [0]
    prev = 0
    for b in range(B):
        if b + 1 < B:
            nxt = buckets[b + 1]
            cx = Fraction(sum(xs[k] for k in nxt), len(nxt))
            cy = Fraction(sum(ys[k] for k in nxt), len(nxt))
        else:
            cx, cy = Fraction(xs[-1]), Fraction(ys[-1])
        ax, ay = Fraction(xs[prev]), Fraction(ys[prev])
        best = max(
            buckets[b],
            key=lambda k: (
                abs((ax - cx) * (ys[k] - ay) - (ax - xs[k]) * (cy - ay)),
                -k,
            ),
        )
        kept.append(best)
        prev = best
    kept.append(n - 1)
    return [pts[k] for k in kept]


def test_lttb_matches_fraction_reference(spark):
    from oshdb_spark.ops.timeseries import lttb_downsample

    random.seed(23)
    rows = []
    seq = 0
    # group sizes straddle the passthrough boundary (n <= 12) and
    # include equal-timestamp ties broken by seq
    for ent, n in enumerate([1, 2, 3, 11, 12, 13, 14, 25, 60, 200, 500]):
        t = 1_700_000_000
        for _ in range(n):
            rows.append(
                (ent, t, seq, round(random.uniform(-50, 400), 2))
            )
            seq += 1
            t += random.choice([0, 1, 60, 3600, 86_400])
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {}
    for r in lttb_downsample(df, n_out=12).collect():
        got.setdefault(r["entity"], []).append(
            (r["sec"], r["seq"], r["value"])
        )
    by_ent = {}
    for uid, sec, s, val in rows:
        by_ent.setdefault(uid, []).append((sec, s, val))
    for ent, pts in by_ent.items():
        want = _lttb_reference(pts, 12)
        have = sorted(got[ent])
        assert len(have) == min(len(pts), 12), ent
        # endpoints always kept
        assert have[0] == min(pts) and have[-1] == max(pts), ent
        assert have == sorted(want), ent


def test_lttb_rejects_tiny_n_out(spark):
    import pytest

    from oshdb_spark.ops.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [(1, 1, 1, 1.0)], "uid long, sec long, seq long, value double"
    )
    with pytest.raises(ValueError):
        lttb_downsample(df, n_out=2)


def test_gapfill_interpolate_matches_replay(spark):
    from oshdb_spark.ops.timeseries import gapfill_interpolate

    rows = _rows(seed=41)
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    B = 1000
    got = {
        (r["entity"], r["bucket"]): (r["value"], r["is_filled"])
        for r in gapfill_interpolate(df, B).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    n_out = 0
    for ent, evs in by_ent.items():
        # representative per bucket: last by (sec, seq); keep its sec
        rep = {}
        for sec, seq, val in sorted(evs):
            rep[sec // B] = (int(abs(val) * 100 + 0.5), sec)
        mn, mx = min(rep), max(rep)
        obs = sorted(rep)
        for bk in range(mn, mx + 1):
            n_out += 1
            v, filled = got[(ent, bk)]
            if bk in rep:
                assert not filled
                assert v == round(rep[bk][0] / 100.0, 6), (ent, bk)
            else:
                assert filled
                import bisect

                i = bisect.bisect_left(obs, bk)
                b0, b1 = obs[i - 1], obs[i]
                v0, t0 = rep[b0]
                v1, t1 = rep[b1]
                t = bk * B
                assert t0 < t < t1, (ent, bk)
                want = (v0 * (t1 - t) + v1 * (t - t0)) / ((t1 - t0) * 100.0)
                assert v == round(want, 6), (ent, bk)
    assert n_out == len(got)


def test_interval_union_matches_replay(spark):
    """Interval union vs a direct merge loop: overlapping, touching
    (merge), point (zero-length), nested, and disjoint intervals,
    plus an entity whose intervals arrive out of order."""
    cases = [
        (1, [(0, 10), (5, 20), (20, 30), (40, 50)]),   # overlap+touch
        (2, [(100, 100), (100, 105), (103, 104)]),     # point + nested
        (3, [(7, 9)]),
        (4, [(50, 60), (0, 10), (55, 70), (9, 12)]),   # out of order
    ]
    rows = [(e, s, en) for e, ivs in cases for s, en in ivs]
    df = spark.createDataFrame(rows, "uid long, start_s long, end_s long")
    got = {
        r.entity: (r.n_islands, r.covered_s, r.longest_s)
        for r in __import__(
            "oshdb_spark.ops.timeseries", fromlist=["interval_union"]
        ).interval_union(df).collect()
    }
    for e, ivs in cases:
        merged = []
        for s, en in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], en))
            else:
                merged.append((s, en))
        lens = [en - s for s, en in merged]
        assert got[e] == (len(merged), sum(lens), max(lens)), e
    assert got[1] == (2, 40, 30)
    assert got[2] == (1, 5, 5)


def test_cusum_alarms_matches_sequential_replay(spark):
    """The prefix-sum − running-min formulation vs the literal
    sequential recursion S_t = max(0, S_{t-1} + (x_t − k)), including
    clamp-at-zero stretches, an immediate alarm, and never-alarming
    entities."""
    from oshdb_spark.ops.timeseries import cusum_alarms

    rows = _rows(seed=99)
    # an entity that spikes immediately
    rows += [(77, 1000, 9100, 400.0), (77, 1001, 9101, 390.0)]
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    K, H = 20_000, 8_000
    got = {
        r.entity: (r.n_obs, r.n_alarms, r.max_s, r.first_alarm_sec)
        for r in cusum_alarms(df, K, H).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    for ent, evs in by_ent.items():
        s = 0
        n_alarm, max_s, first = 0, 0, None
        for sec, _, val in sorted(evs):
            c = int(abs(val) * 100 + 0.5)
            s = max(0, s + (c - K))
            max_s = max(max_s, s)
            if s > H:
                n_alarm += 1
                if first is None:
                    first = sec
        assert got[ent] == (len(evs), n_alarm, max_s, first), ent
    assert got[77][1] == 2 and got[77][3] == 1000  # immediate alarm


def test_acf_matches_numpy_replay(spark):
    """acf vs a float replay of the standard estimator (global mean);
    integer-cents quantization applied identically."""
    from oshdb_spark.ops.timeseries import acf

    rows = _rows(seed=31)
    rows += [(88, 5000 + i, 9200 + i, 50.0) for i in range(5)]  # constant
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {
        (r.entity, r.lag): (r.n, r.acf_r)
        for r in acf(df, [1, 2, 3]).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        by_ent.setdefault(uid, []).append((sec, seq, val))
    import math

    for ent, evs in by_ent.items():
        xs = [int(abs(v) * 100 + 0.5) * (1 if v >= 0 else -1)
              for _, _, v in sorted(evs)]
        n, s = len(xs), sum(xs)
        u = [n * x - s for x in xs]
        den = sum(t * t for t in u)
        if den == 0:
            for k in (1, 2, 3):
                assert (ent, k) not in got
            continue
        for k in (1, 2, 3):
            num = sum(u[i] * u[i - k] for i in range(k, n))
            want = round(num / den, 6)
            assert got[(ent, k)][0] == n
            assert math.isclose(got[(ent, k)][1], want, abs_tol=1e-9), (
                ent, k, got[(ent, k)], want)
    assert all((88, k) not in got for k in (1, 2, 3))  # constant series


def test_seasonal_indexes_matches_replay(spark):
    """seasonal_indexes vs a per-day pandas replay: dense global grid,
    centered MA, integer detrend, phase averages."""
    import random as _r

    from oshdb_spark.ops.timeseries import seasonal_indexes

    _r.seed(7)
    rows = []
    for d in range(100, 160):
        for e in ("a", "b"):
            for _ in range(_r.randint(0, 5) if not (e == "b" and d % 7 == 3)
                           else 9):  # entity b spikes on phase 3
                rows.append((e, d * 86400 + _r.randint(0, 86399)))
    # entity c is sparse: many empty days on the global grid
    rows += [("c", d * 86400) for d in (105, 120, 150)]
    df = spark.createDataFrame(rows, "event_type string, sec long")
    got = {
        (r.event_type, r.phase): (r.n_terms, r.seasonal)
        for r in seasonal_indexes(df, period=7, half_window=3).collect()
    }
    days = [s // 86400 for _, s in rows]
    d0, d1 = min(days), max(days)
    import collections
    import math

    cnt = collections.Counter((e, s // 86400) for e, s in rows)
    acc = collections.defaultdict(list)
    for e in {r[0] for r in rows}:
        series = [cnt.get((e, d), 0) for d in range(d0, d1 + 1)]
        for i in range(3, len(series) - 3):
            detr = 7 * series[i] - sum(series[i - 3:i + 4])
            acc[(e, (d0 + i) % 7)].append(detr)
    for key, terms in acc.items():
        want = round(sum(terms) / (7.0 * len(terms)), 6)
        assert got[key][0] == len(terms)
        assert math.isclose(got[key][1], want, abs_tol=1e-9), (key,)
    assert set(got) == set(acc)
    # the spiked phase really reads high
    assert got[("b", 3)][1] > 1.0


def test_hampel_outliers_matches_replay(spark):
    """hampel_outliers vs a python rolling median/MAD replay incl. tie
    values, flat stretches (MAD 0 flags any deviation), and edges."""
    from oshdb_spark.ops.timeseries import hampel_outliers

    rows = _rows(seed=47)
    rows += [(70, 100 + i, 9300 + i, 50.0) for i in range(10)]
    rows[-4] = (70, 106, 9306, 51.0)  # tiny spike on a flat line
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {
        (r.entity, r.sec, r.seq): (r.value_c, r.med_c, r.mad_c)
        for r in hampel_outliers(df, 3, 3, 1).collect()
    }
    by_ent = {}
    for uid, sec, seq, val in rows:
        c = int(abs(val) * 100 + 0.5) * (1 if val >= 0 else -1)
        by_ent.setdefault(uid, []).append((sec, seq, c))
    want = {}
    for ent, evs in by_ent.items():
        evs.sort()
        for i in range(3, len(evs) - 3):
            wvals = [c for _, _, c in evs[i - 3:i + 4]]
            med = sorted(wvals)[3]
            mad = sorted(abs(x - med) for x in wvals)[3]
            c = evs[i][2]
            if abs(c - med) > 3 * mad:
                want[(ent, evs[i][0], evs[i][1])] = (c, med, mad)
    assert got == want
    assert any(k[0] == 70 for k in got)  # flat-line spike caught


def test_ccf_lags_matches_numpy_replay(spark):
    """ccf_lags vs a python dense-grid replay: a y-series that copies
    x shifted by +2 days peaks at lag +2 with ccf 1."""
    import math

    from oshdb_spark.ops.timeseries import ccf_lags

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7]
    rows = []
    for d, c in enumerate(xs):
        rows += [("a", (100 + d) * 86400 + i) for i in range(c)]
        rows += [("b", (102 + d) * 86400 + 40000 + i) for i in range(c)]
    rows.append(("zzz", 100 * 86400))  # filtered out
    df = spark.createDataFrame(rows, "event_type string, sec long")
    got = {r.lag: (r.n_days, r.ccf)
           for r in ccf_lags(df, "a", "b", max_lag=3).collect()}

    d0, d1 = 100, 102 + len(xs) - 1
    n = d1 - d0 + 1
    import collections

    cx = collections.Counter(
        s // 86400 for t, s in rows if t == "a")
    cy = collections.Counter(
        s // 86400 for t, s in rows if t == "b")
    X = [cx.get(d, 0) for d in range(d0, d1 + 1)]
    Y = [cy.get(d, 0) for d in range(d0, d1 + 1)]
    sx, sy = sum(X), sum(Y)
    U = [n * x - sx for x in X]
    V = [n * y - sy for y in Y]
    du = sum(t * t for t in U)
    dv = sum(t * t for t in V)
    for l in range(-3, 4):
        num = sum(
            U[i] * V[i + l]
            for i in range(n) if 0 <= i + l < n
        )
        want = round(num / (math.sqrt(du) * math.sqrt(dv)), 6)
        assert got[l][0] == n
        assert math.isclose(got[l][1], want, abs_tol=1e-9), l
    # the +2 shift dominates (edge zero-days and overlap loss keep the
    # full-series-normalized peak below 1)
    assert got[2][1] == max(v for _, v in got.values())
    assert got[2][1] > 0.5


def test_binary_segmentation_matches_replay(spark):
    """binary_segmentation vs a python replay on planted mean shifts:
    level 1 finds the dominant shift, level 2 the secondary ones;
    flat series split with D = 0."""
    from oshdb_spark.ops.timeseries import binary_segmentation

    series = {
        1: [10] * 8 + [50] * 8 + [10] * 4,   # dominant shift at 8
        2: [5] * 6,                           # flat
        3: [1, 1, 9, 9, 9, 9, 1, 1, 1],
        4: [7, 8],                            # minimal
    }
    rows = [
        (e, 100 + i, 1000 * e + i, float(v))
        for e, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "uid long, sec long, seq long, value double"
    )
    got = {
        (r.entity, r.level, r.seg): (r.split_i, r.d_stat)
        for r in binary_segmentation(df).collect()
    }

    def best(vals, l, r):
        # 1-based inclusive segment [l, r]; returns (k, D)
        m = r - l + 1
        pre = [0]
        for v in vals:
            pre.append(pre[-1] + v)
        ts = pre[r] - pre[l - 1]
        out = None
        for k in range(l, r):
            j = k - l + 1
            d = abs(m * (pre[k] - pre[l - 1]) - j * ts)
            if out is None or d > out[1]:
                out = (k, d)
        return out

    for e, vs in series.items():
        c = [int(v * 100) for v in vs]
        n = len(c)
        k1, d1 = best(c, 1, n)
        assert got[(e, 1, 0)] == (k1, d1), e
        if k1 >= 2:
            assert got[(e, 2, 0)] == best(c, 1, k1), e
        else:
            assert (e, 2, 0) not in got
        if n - k1 >= 2:
            assert got[(e, 2, 1)] == best(c, k1 + 1, n), e
        else:
            assert (e, 2, 1) not in got
    assert got[(1, 1, 0)][0] == 8      # the planted dominant shift
    assert got[(2, 1, 0)][1] == 0      # flat: D = 0
