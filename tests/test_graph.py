"""Connected components (ops/graph.py) — structure cases with known
answers, randomized differential against a python union-find, layout
independence, and the keep-canonical dedup resolution."""

import random

import pytest

from oshdb_spark.ops.graph import connected_components, keep_canonical


def _uf_components(n_edges, nodes=None):
    """Ground truth: plain union-find over the edge list."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    for x in nodes or []:
        find(x)
    # min-id per component
    return {x: find(x) for x in parent}


def _run(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = connected_components(edges)
    return {r["node"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_single_edge(self, spark):
        assert _run(spark, [(2, 9)]) == {2: 2, 9: 2}

    def test_chain_forces_multiple_rounds(self, spark):
        # a 200-node path: naive label propagation needs ~200 rounds;
        # large-star/small-star must close it in O(log n)
        edges = [(i, i + 1) for i in range(200)]
        got = _run(spark, edges)
        assert got == {i: 0 for i in range(201)}

    def test_descending_chain_and_cycle(self, spark):
        edges = [(i + 1, i) for i in range(50)]  # reversed orientation
        edges += [(100, 101), (101, 102), (102, 100)]  # a cycle
        got = _run(spark, edges)
        assert all(got[i] == 0 for i in range(51))
        assert all(got[i] == 100 for i in (100, 101, 102))

    def test_star_and_self_loops(self, spark):
        edges = [(7, v) for v in (8, 9, 10, 11)] + [(7, 7), (9, 9)]
        got = _run(spark, edges)
        assert got == {v: 7 for v in (7, 8, 9, 10, 11)}

    def test_duplicate_and_bidirectional_edges(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (3, 4)]
        got = _run(spark, edges)
        assert got == {1: 1, 2: 1, 3: 3, 4: 3}

    @pytest.mark.parametrize("seed", [7, 23])
    def test_random_differential(self, spark, seed):
        rng = random.Random(seed)
        n = 400
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(300)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _run(spark, edges)
        want = _uf_components(edges)
        assert got == want

    def test_check_every_is_result_invariant(self, spark):
        """The batched convergence check (default check_every=2) must
        return exactly the per-round check's labels — the fixpoint is
        absorbing, so the signature gap only delays detection, never
        changes the answer. A deep chain maximizes round count."""
        edges = [(i, i + 1) for i in range(150)] + [(500, 501), (502, 501)]
        df = spark.createDataFrame(edges, "src long, dst long")
        by_every = {}
        for ce in (1, 2, 3):
            by_every[ce] = {
                r["node"]: r["component"]
                for r in connected_components(df, check_every=ce).collect()
            }
        assert by_every[1] == by_every[2] == by_every[3]
        assert by_every[2][150] == 0 and by_every[2][502] == 500

    def test_layout_independent(self, spark):
        rng = random.Random(99)
        edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(200)]
        edges = [(a, b) for a, b in edges if a != b]
        df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
        df16 = spark.createDataFrame(
            list(reversed(edges)), "src long, dst long"
        ).repartition(16)
        out1 = {
            r["node"]: r["component"]
            for r in connected_components(df1).collect()
        }
        out16 = {
            r["node"]: r["component"]
            for r in connected_components(df16).collect()
        }
        assert out1 == out16


class TestKeepCanonical:
    def test_keeps_min_per_component_and_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
        )
        # components {0,1,2}, {5,6}; 3,4,7,8,9 isolated
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
        )
        kept = sorted(
            r["doc_id"] for r in keep_canonical(docs, pairs).collect()
        )
        assert kept == [0, 3, 4, 5, 7, 8, 9]


class TestPagerank:
    def test_matches_reference_iteration(self, spark):
        """3-node cycle + a dangling sink: replicate the quantized update
        by hand and check the distributed result exactly."""
        import math

        from oshdb_spark.ops.graph import pagerank

        # 0→1, 0→2, 1→2, 2→3 ; 3 dangling
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 2), (2, 3)], "src long, dst long"
        )
        out = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=3).collect()}

        def q6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        n = 4
        deg = {0: 2, 1: 1, 2: 1}
        r = {v: q6(1.0 / n) for v in range(4)}
        base = (1.0 - 0.85) / n
        for _ in range(3):
            s = {v: 0.0 for v in range(4)}
            for (u, v) in [(0, 1), (0, 2), (1, 2), (2, 3)]:
                s[v] += r[u] / deg[u]
            r = {v: q6(base + 0.85 * s[v]) for v in range(4)}
        assert out == r
        # sink accumulates, sources decay toward teleport
        assert out[3] > out[2] > out[1] > out[0]
        assert out[0] == q6(base)

    def test_layout_invariant(self, spark):
        from oshdb_spark.ops.graph import pagerank

        edges = spark.createDataFrame(
            [(i % 37, (i * 7919) % 37) for i in range(500)],
            "src long, dst long",
        )
        a = {r["node"]: r["rank"]
             for r in pagerank(edges.repartition(1), n_iter=2).collect()}
        b = {r["node"]: r["rank"]
             for r in pagerank(edges.repartition(13), n_iter=2).collect()}
        assert a == b


def test_sssp_matches_dijkstra(spark):
    """Bounded-hop Bellman-Ford vs a pure-python Dijkstra on a random
    weighted digraph (n_iter >= hop diameter => exact everywhere)."""
    import heapq

    import numpy as np

    rng = np.random.default_rng(113)
    n, m = 60, 400
    es = [
        (int(rng.integers(0, n)), int(rng.integers(0, n)),
         int(rng.integers(1, 1000)))
        for _ in range(m)
    ]
    edges = spark.createDataFrame(es, "src long, dst long, w long")
    sources = [0, 7]
    from oshdb_spark.ops.graph import sssp

    got = {r["node"]: r["dist"] for r in
           sssp(edges, sources, n_iter=n).collect()}

    adj: dict = {}
    for s, d, ww in es:
        adj.setdefault(s, {})
        adj[s][d] = min(adj[s].get(d, 1 << 60), ww)
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    heapq.heapify(pq)
    seen = set()
    while pq:
        du, u = heapq.heappop(pq)
        if u in seen:
            continue
        seen.add(u)
        for v, ww in adj.get(u, {}).items():
            nd = du + ww
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got == dist
    assert len(got) > 10


def test_sssp_hop_bound_and_early_stop(spark):
    """A strict hop bound truncates distant nodes; the wave also stops
    early on a settled chain (frontier empties)."""
    from oshdb_spark.ops.graph import sssp

    chain = spark.createDataFrame(
        [(i, i + 1, 5) for i in range(6)], "src long, dst long, w long"
    )
    two = {r["node"]: r["dist"] for r in
           sssp(chain, [0], n_iter=2).collect()}
    assert two == {0: 0, 1: 5, 2: 10}
    full = {r["node"]: r["dist"] for r in
            sssp(chain, [0], n_iter=50).collect()}
    assert full == {i: 5 * i for i in range(7)}


def test_triangle_count_vs_brute_force(spark):
    """Degree-oriented triangle counting vs itertools brute force on a
    graph mixing a clique (many triangles), a star (none — and the
    skew case orientation defends against), a cycle, duplicate and
    reversed edges, and a self-loop."""
    import itertools
    import random

    from oshdb_spark.ops.graph import triangle_count

    random.seed(5)
    edges = []
    for a, b in itertools.combinations(range(6), 2):   # K6 clique
        edges.append((a, b))
    for leaf in range(20, 40):                         # star at 10
        edges.append((10, leaf))
    for i in range(40, 50):                            # 10-cycle
        edges.append((i, 40 + (i - 39) % 10))
    edges += [(1, 0), (2, 1), (3, 3)]                  # rev dup + loop
    for _ in range(60):                                # random clutter
        edges.append((random.randint(0, 55), random.randint(0, 55)))

    canon = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    want_tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    want_wedges = sum(
        len(vs) * (len(vs) - 1) // 2 for vs in adj.values()
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(canon)
    assert row.n_wedges == want_wedges
    assert row.n_triangles == want_tri
    assert want_tri >= 20  # K6 alone has 20
    assert row.clustering == round(3.0 * want_tri / want_wedges, 6)


def test_assortativity_vs_pearson_reference(spark):
    """Newman r vs a direct float Pearson over directed stubs, on a
    star (strongly disassortative), a clique+pendant mix, and a
    degree-regular cycle (zero variance -> null)."""
    import itertools

    import numpy as np

    from oshdb_spark.ops.graph import assortativity

    def ref(canon):
        adj = {}
        for a, b in canon:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {n: len(vs) for n, vs in adj.items()}
        xs, ys = [], []
        for a, b in canon:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        xs, ys = np.array(xs, float), np.array(ys, float)
        vx = xs.var()
        if vx == 0:
            return None
        return ((xs * ys).mean() - xs.mean() * ys.mean()) / vx

    star = [(0, i) for i in range(1, 12)]
    mix = list(itertools.combinations(range(5), 2)) + [
        (0, 90), (1, 91), (2, 92), (90, 93)
    ]
    cycle = [(i, (i + 1) % 8) for i in range(8)]
    for name, edges in [("star", star), ("mix", mix), ("cycle", cycle)]:
        df = spark.createDataFrame(edges, "src long, dst long")
        row = assortativity(df).collect()[0]
        want = ref({(min(a, b), max(a, b)) for a, b in edges})
        if want is None:
            assert row.assortativity is None, name
        else:
            assert row.assortativity == pytest.approx(
                round(want, 6), abs=2e-6
            ), name
    # the star must be maximally disassortative
    srow = assortativity(
        spark.createDataFrame(star, "src long, dst long")
    ).collect()[0]
    assert srow.assortativity == -1.0


def test_kcore_peel_matches_bounded_replay(spark):
    """kcore_peel vs a direct synchronous peel loop: a K5 clique
    survives k=3, trees vanish, and a long tail demonstrates the
    BOUNDED contract — with rounds=3 only three tail nodes peel
    (k=2), diverging from the true 2-core exactly as the replay says."""
    from oshdb_spark.ops.graph import kcore_peel

    def replay(canon, k, rounds):
        edges = set(canon)
        for _ in range(rounds):
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            edges = {(a, b) for a, b in edges if a in keep and b in keep}
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return {n: d for n, d in deg.items() if d >= k}

    import itertools

    k5 = list(itertools.combinations(range(5), 2))
    tree = [(10, 11), (10, 12), (11, 13), (11, 14), (12, 15)]
    # cycle with a 12-node tail hanging off node 20
    cyc = [(20 + i, 20 + (i + 1) % 6) for i in range(6)]
    tail = [(25 + i, 25 + i + 1) for i in range(1, 13)]
    edges = k5 + tree + cyc + tail

    df = spark.createDataFrame(edges, "src long, dst long")
    for k, rounds in [(3, 8), (2, 3), (2, 8)]:
        got = {
            r.node: r.degree
            for r in kcore_peel(df, k=k, rounds=rounds).collect()
        }
        want = replay(
            {(min(a, b), max(a, b)) for a, b in edges}, k, rounds
        )
        assert got == want, (k, rounds)
    # k=3: exactly the K5, every vertex at degree 4
    got3 = {
        r.node: r.degree for r in kcore_peel(df, k=3, rounds=8).collect()
    }
    assert got3 == {n: 4 for n in range(5)}
    # bounded 2-core at rounds=3 still contains tail remnants the true
    # 2-core (rounds=8) has peeled
    n_bounded = len(kcore_peel(df, k=2, rounds=3).collect())
    n_full = len(kcore_peel(df, k=2, rounds=8).collect())
    assert n_bounded > n_full


def test_label_propagation_matches_sync_replay(spark):
    """label_propagation vs a python synchronous replay with the same
    (count DESC, label ASC) tie order, on a two-clique bridge graph and
    a random graph; bounded rounds semantics."""
    import random as _r

    from oshdb_spark.ops.graph import label_propagation

    def replay(edge_set, rounds):
        adj = {}
        for a, b in edge_set:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lbl = {n: n for n in adj}
        for _ in range(rounds):
            nxt = {}
            for n, nbrs in adj.items():
                cnt = {}
                for m in nbrs:
                    cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
                nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
            lbl = nxt
        return lbl

    # two 4-cliques joined by one bridge edge
    cl = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl += [(a + 10, b + 10) for a, b in cl]
    cl.append((3, 10))
    _r.seed(21)
    rnd = {(
        _r.randint(0, 30), _r.randint(0, 30)) for _ in range(120)}
    rnd = {(min(a, b), max(a, b)) for a, b in rnd if a != b}
    for edges in (cl, sorted(rnd)):
        df = spark.createDataFrame(edges, "src long, dst long")
        for rounds in (1, 4):
            got = {
                r.node: r.label
                for r in label_propagation(df, rounds=rounds).collect()
            }
            want = replay({(min(a, b), max(a, b)) for a, b in edges},
                          rounds)
            assert got == want, (rounds, len(edges))
    # the clique graph settles into exactly two communities
    got = {
        r.node: r.label
        for r in label_propagation(
            spark.createDataFrame(cl, "src long, dst long"), rounds=4
        ).collect()
    }
    assert len(set(got.values())) == 2
