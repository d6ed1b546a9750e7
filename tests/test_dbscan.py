"""Differential test for distributed DBSCAN (ops/clustering.dbscan_points)
against an exact in-memory reference: brute-force ε-pairs with the same
equirectangular metric, union-find components over the core-core graph
labeled by the component-minimum core id, min-label border attachment.
"""

import numpy as np


def _brute_dbscan(lon7, lat7, eps_m, min_pts):
    R = 6_371_000.0
    la = lat7 * 1e-7
    lo = lon7 * 1e-7
    keep = np.abs(la) <= 70.0
    n = len(lon7)
    nbrs = {i: set() for i in range(n) if keep[i]}
    idx = np.nonzero(keep)[0]
    for ii, i in enumerate(idx):
        j = idx[ii + 1:]
        dlat = np.radians(la[j] - la[i])
        dlng = np.radians(lo[j] - lo[i]) * np.cos(
            np.radians((la[j] + la[i]) / 2.0)
        )
        dist = R * np.sqrt(dlat * dlat + dlng * dlng)
        for k in j[dist <= eps_m]:
            nbrs[i].add(int(k))
            nbrs[int(k)].add(i)
    core = {i for i, s in nbrs.items() if len(s) >= min_pts - 1}
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    labels = {}
    for i in core:
        labels[i] = (find(i), 1)
    for i, s in nbrs.items():
        if i in core:
            continue
        cn = [labels[j][0] for j in s if j in core]
        if cn:
            labels[i] = (min(cn), 0)
    return labels


def test_dbscan_matches_brute_force(spark):
    from oshdb_spark.ops.clustering import dbscan_points

    rng = np.random.default_rng(47)
    n = 500
    # clustered walks (dense cores) + uniform scatter (noise/borders)
    base_lon = rng.integers(-1_500_000_000, 1_500_000_000, n // 5)
    base_lat = rng.integers(-680_000_000, 680_000_000, n // 5)
    lon7 = np.concatenate(
        [base_lon + rng.integers(-8_000_000, 8_000_000, n // 5)
         for _ in range(4)]
        + [rng.integers(-1_800_000_000, 1_800_000_000, n // 5)]
    )
    lat7 = np.concatenate(
        [base_lat + rng.integers(-8_000_000, 8_000_000, n // 5)
         for _ in range(4)]
        + [rng.integers(-850_000_000, 850_000_000, n // 5)]
    )
    pts = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(zip(lon7, lat7))],
        "pid long, lon7 long, lat7 long",
    )
    eps, mp = 120_000.0, 4
    got = {
        r["pid"]: (r["cluster"], r["is_core"])
        for r in dbscan_points(pts, eps, mp).collect()
    }
    exp = _brute_dbscan(lon7, lat7, eps, mp)
    assert got == exp
    # non-vacuous: clusters, cores, borders, and noise all present
    n_clusters = len({c for c, _ in exp.values()})
    n_core = sum(1 for _, ic in exp.values() if ic == 1)
    n_border = sum(1 for _, ic in exp.values() if ic == 0)
    assert n_clusters >= 3
    assert n_core > 0 and n_border > 0
    assert len(exp) < n  # some noise points were dropped
