"""stages/graph.py — PageRank vs a direct pure-Python oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.graph import pagerank


def _py_pagerank(edges, iterations, scale=10**9, d=85):
    """Direct dict-based reference: edges = [(src, dst, w), ...]."""
    deg: dict = {}
    nodes = set()
    for s, t, w in edges:
        deg[s] = deg.get(s, 0) + w
        nodes.update((s, t))
    base = (100 - d) * scale // 100
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        share = {v: (rank[v] // deg[v] if deg.get(v) else 0) for v in nodes}
        c = {v: 0 for v in nodes}
        for s, t, w in edges:
            c[t] += w * share[s]
        rank = {
            v: base + d * (c[v] // 100) + (d * (c[v] % 100)) // 100 for v in nodes
        }
    return rank


EDGES = [
    ("a", "b", 1),
    ("a", "c", 3),
    ("b", "c", 2),
    ("c", "a", 1),
    ("a", "b", 1),  # multigraph duplicate — must count as extra weight
    ("d", "a", 5),  # d is dangling-in only via c? no: d has out-edge
    ("b", "e", 1),  # e has NO out-edges: dangling, keeps base term
]


def _edges_ds(edges):
    pdf = pd.DataFrame(edges, columns=["src", "dst", "w"])
    return rd.from_pandas(pdf).repartition(3)


def test_pagerank_matches_python_oracle():
    for iters in (1, 2, 4):
        got = pagerank(
            _edges_ds(EDGES),
            src_col="src",
            dst_col="dst",
            weight_col="w",
            iterations=iters,
        )
        want = _py_pagerank(EDGES, iters)
        got_map = dict(zip(got["node"], got["pagerank"]))
        assert got_map == want
        assert got["pagerank"].dtype == np.int64


def test_pagerank_unweighted_counts_duplicate_rows():
    """weight_col=None → every row weighs 1 (multigraph semantics)."""
    got = pagerank(
        _edges_ds(EDGES), src_col="src", dst_col="dst", iterations=2
    )
    want = _py_pagerank([(s, t, 1) for s, t, _ in EDGES], 2)
    assert dict(zip(got["node"], got["pagerank"])) == want


def test_pagerank_dangling_node_keeps_base_term():
    got = pagerank(
        _edges_ds(EDGES), src_col="src", dst_col="dst", weight_col="w",
        iterations=3,
    )
    got_map = dict(zip(got["node"], got["pagerank"]))
    # e never propagates but still receives from b and keeps the base
    assert got_map["e"] > 150_000_000
    # d receives nothing (no in-edges): exactly the base term
    assert got_map["d"] == 150_000_000


def test_pagerank_mass_is_int64_safe_at_scale_formula():
    """The split damping formula equals (85*c)//100 exactly."""
    rng = np.random.default_rng(3)
    for c in [0, 1, 99, 100, 101, 10**14, int(rng.integers(0, 2**62))]:
        assert 85 * (c // 100) + (85 * (c % 100)) // 100 == (85 * c) // 100


def test_pagerank_empty_edges():
    got = pagerank(
        _edges_ds([]).filter(lambda r: False),
        src_col="src",
        dst_col="dst",
        iterations=2,
    )
    assert len(got) == 0


# ---------------------------------------------------------------------------
# shortest_hops
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import shortest_hops  # noqa: E402

LINE = [  # a→b→c→d→e plus isolated island x→y
    ("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1),
    ("x", "y", 1),
]


def test_shortest_hops_line_graph():
    got = shortest_hops(
        _edges_ds(LINE), src_col="src", dst_col="dst", sources=["a"],
        max_hops=10,
    )
    assert dict(zip(got["node"], got["hops"])) == {
        "a": 0, "b": 1, "c": 2, "d": 3, "e": 4,
    }  # x, y unreachable → absent


def test_shortest_hops_max_hops_cutoff():
    got = shortest_hops(
        _edges_ds(LINE), src_col="src", dst_col="dst", sources=["a"],
        max_hops=2,
    )
    assert dict(zip(got["node"], got["hops"])) == {"a": 0, "b": 1, "c": 2}


def test_shortest_hops_multi_source_takes_min():
    got = shortest_hops(
        _edges_ds(LINE), src_col="src", dst_col="dst", sources=["a", "d"],
        max_hops=10,
    )
    m = dict(zip(got["node"], got["hops"]))
    assert m["e"] == 1 and m["b"] == 1 and m["c"] == 2 and m["d"] == 0


def test_shortest_hops_empty_frontier_terminates():
    got = shortest_hops(
        _edges_ds(LINE), src_col="src", dst_col="dst", sources=["e"],
        max_hops=99,
    )
    assert dict(zip(got["node"], got["hops"])) == {"e": 0}


# ---------------------------------------------------------------------------
# pagerank_exchange (no-broadcast scale path)
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import pagerank_exchange  # noqa: E402


def test_pagerank_exchange_bit_identical_to_broadcast():
    for iters, wcol in [(1, "w"), (3, "w"), (2, None)]:
        want = pagerank(
            _edges_ds(EDGES), src_col="src", dst_col="dst",
            weight_col=wcol, iterations=iters,
        )
        got = (
            pagerank_exchange(
                _edges_ds(EDGES), src_col="src", dst_col="dst",
                weight_col=wcol, iterations=iters, num_partitions=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want.sort_values("node").reset_index(drop=True)
        )


def test_pagerank_personalized_teleport():
    """Teleport mass pinned to 'a': nodes unreachable from a get rank 0;
    the source keeps the base term; Python-oracle parity."""
    got = pagerank(
        _edges_ds(LINE), src_col="src", dst_col="dst", weight_col="w",
        iterations=3, teleport_nodes=["a"],
    )
    m = dict(zip(got["node"], got["pagerank"]))
    assert m["x"] == 0 and m["y"] == 0  # island never receives mass
    assert m["a"] >= 150_000_000
    # the initial pulse propagates down the line: every reached node > 0
    assert m["b"] > 0 and m["c"] > 0 and m["d"] > 0 and m["e"] == 0

    # parity with a direct dict-based PPR
    def py_ppr(edges, iters, S, scale=10**9, d=85):
        deg, nodes = {}, set()
        for s, t, w in edges:
            deg[s] = deg.get(s, 0) + w
            nodes.update((s, t))
        base = (100 - d) * scale // 100
        rank = {v: (scale if v in S else 0) for v in nodes}
        for _ in range(iters):
            share = {v: (rank[v] // deg[v] if deg.get(v) else 0) for v in nodes}
            c = {v: 0 for v in nodes}
            for s, t, w in edges:
                c[t] += w * share[s]
            rank = {
                v: (base if v in S else 0)
                + d * (c[v] // 100) + (d * (c[v] % 100)) // 100
                for v in nodes
            }
        return rank

    assert m == py_ppr(LINE, 3, {"a"})


def test_triangle_count_matches_bruteforce_on_random_graphs():
    from itertools import combinations

    from arlas_proc_ray.stages.graph import triangle_count

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 30
        p = [0.1, 0.25, 0.5][trial]
        edges = [
            (a, b)
            for a, b in combinations(range(n), 2)
            if rng.random() < p
        ]
        adj = {frozenset(e) for e in edges}
        want = sum(
            1
            for a, b, c in combinations(range(n), 3)
            if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))}
            <= adj
        )
        # feed duplicated + reversed + self-loop rows: all must be cleaned
        rows = edges + [(b, a) for a, b in edges[::2]] + [(5, 5)]
        df = pd.DataFrame(rows, columns=["x", "y"])
        for mode in ("bitset", "wedge"):  # both regimes, same answer
            out = triangle_count(
                rd.from_pandas(df).repartition(4), src_col="x", dst_col="y",
                num_partitions=3, mode=mode,
            )
            assert int(out["n_triangles"].iloc[0]) == want, mode
            assert int(out["n_edges"].iloc[0]) == len(edges), mode


def test_triangle_count_empty_and_triangle_free():
    from arlas_proc_ray.stages.graph import triangle_count

    out = triangle_count(
        rd.from_pandas(pd.DataFrame({"x": [1, 1], "y": [1, 1]})),
        src_col="x", dst_col="y", num_partitions=2,
    )  # only self-loops → empty graph
    assert int(out["n_triangles"].iloc[0]) == 0
    assert int(out["n_edges"].iloc[0]) == 0

    # a 4-cycle has wedges but zero triangles (closure must reject all)
    cyc = pd.DataFrame({"x": [0, 1, 2, 3], "y": [1, 2, 3, 0]})
    out = triangle_count(
        rd.from_pandas(cyc).repartition(2), src_col="x", dst_col="y",
        num_partitions=2,
    )
    assert int(out["n_triangles"].iloc[0]) == 0
    assert int(out["n_edges"].iloc[0]) == 4


def test_clustering_coefficients_matches_bruteforce():
    from itertools import combinations

    from arlas_proc_ray.stages.graph import clustering_coefficients

    rng = np.random.default_rng(31)
    n = 25
    edges = [
        (a, b) for a, b in combinations(range(n), 2) if rng.random() < 0.3
    ]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = clustering_coefficients(
        rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"])).repartition(3),
        src_col="x", dst_col="y", num_partitions=2,
    ).set_index("node")
    for v in out.index:
        tri = sum(
            1 for a, b in combinations(sorted(adj[v]), 2) if b in adj[a]
        )
        d = len(adj[v])
        assert int(out.loc[v, "degree"]) == d
        assert int(out.loc[v, "triangles"]) == tri
        want = (2 * tri) / (d * (d - 1)) if d > 1 else 0.0
        assert out.loc[v, "clustering"] == want


def test_bellman_ford_matches_dict_oracle_and_horizon():
    from arlas_proc_ray.stages.graph import bellman_ford_dists

    W = [  # directed, weighted; shortest a→d is via c (1+1+1) not direct (9)
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("a", "d", 9),
        ("d", "e", 2), ("x", "y", 4),
    ]
    ds = _edges_ds(W)
    got = bellman_ford_dists(
        ds, src_col="src", dst_col="dst", weight_col="w", sources=["a"],
        rounds=10,
    )
    m = dict(zip(got["node"], got["dist"]))
    assert m == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 5}
    # horizon semantics: 1 round = direct edges only
    got1 = bellman_ford_dists(
        ds, src_col="src", dst_col="dst", weight_col="w", sources=["a"],
        rounds=1,
    )
    assert dict(zip(got1["node"], got1["dist"])) == {"a": 0, "b": 1, "d": 9}
    # multi-source takes the min over sources
    got2 = bellman_ford_dists(
        ds, src_col="src", dst_col="dst", weight_col="w",
        sources=["a", "x"], rounds=10,
    )
    assert dict(zip(got2["node"], got2["dist"]))["y"] == 4


def test_k_core_matches_python_peel():
    from itertools import combinations

    from arlas_proc_ray.stages.graph import k_core

    rng = np.random.default_rng(17)
    n = 40
    edges = [
        (a, b) for a, b in combinations(range(n), 2) if rng.random() < 0.12
    ]

    def peel(edges, k):
        es = set(edges)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            bad = {v for v, d in deg.items() if d < k}
            if not bad:
                return deg
            es = {(a, b) for a, b in es if a not in bad and b not in bad}

    for k in (2, 3, 4):
        got = k_core(
            rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"])).repartition(3),
            src_col="x", dst_col="y", k=k, num_partitions=2,
        )
        want = peel(edges, k)
        assert dict(zip(got["node"], got["core_degree"])) == want, k


# ---------------------------------------------------------------- NUL keys
def test_nul_byte_node_ids_stay_distinct():
    """ADVICE r4: per-block combiners and driver merges in graph.py used
    plain pandas groupby/unique on node ids, which NUL-merge object
    strings ('x' vs 'x\\x00') — violating the repo-wide byte-exact
    contract (keyed.py). Pin pagerank (both modes), BFS hops,
    Bellman-Ford, and degree tables on a graph whose topology changes if
    the two ids merge."""
    from arlas_proc_ray.stages.graph import bellman_ford_dists

    a, a0 = "x", "x\x00"
    # a -> b -> a0 ; a0 -> c   (merging a/a0 would create a 2-cycle)
    edges = [(a, "b", 1), ("b", a0, 2), (a0, "c", 3)]

    pr = pagerank(
        _edges_ds(edges), src_col="src", dst_col="dst", weight_col="w",
        iterations=3,
    )
    want_pr = _py_pagerank(edges, 3)
    assert dict(zip(pr["node"], pr["pagerank"])) == want_pr
    assert len(pr) == 4  # a, a0, b, c all distinct

    prx = pagerank_exchange(
        _edges_ds(edges), src_col="src", dst_col="dst", weight_col="w",
        iterations=3, num_partitions=4,
    ).to_pandas()
    assert dict(zip(prx["node"], prx["pagerank"])) == want_pr

    hops = shortest_hops(
        _edges_ds(edges), src_col="src", dst_col="dst", sources=[a],
        max_hops=5,
    )
    assert dict(zip(hops["node"], hops["hops"])) == {
        a: 0, "b": 1, a0: 2, "c": 3,
    }

    bf = bellman_ford_dists(
        _edges_ds(edges), src_col="src", dst_col="dst", weight_col="w",
        sources=[a], rounds=5,
    )
    assert dict(zip(bf["node"], bf["dist"])) == {a: 0, "b": 1, a0: 3, "c": 6}


def test_clustering_wedge_path_parity_and_big_graph():
    """VERDICT r4 #1: per-node triangle counts must work past the bitset
    broadcast budget. (a) wedge and bitset paths are bit-identical on
    shared random fixtures; (b) a >8192-node sparse graph runs on the
    auto-selected wedge path and matches a brute-force adjacency-set
    oracle; (c) mode='bitset' past the budget still fails loudly."""
    import pytest

    from arlas_proc_ray.stages.graph import clustering_coefficients

    # (a) parity on shared fixtures, several densities
    for seed, n, p in ((7, 60, 0.15), (8, 120, 0.05), (9, 40, 0.4)):
        rng = np.random.default_rng(seed)
        edges = [
            (f"n{a}", f"n{b}")
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        ds = rd.from_pandas(
            pd.DataFrame(edges, columns=["x", "y"])
        ).repartition(3)
        kw = dict(src_col="x", dst_col="y", num_partitions=4)
        a = clustering_coefficients(ds, mode="bitset", **kw)
        b = clustering_coefficients(ds, mode="wedge", **kw)
        pd.testing.assert_frame_equal(a, b)

    # (b) >8192 nodes: ring + random chords; auto → wedge
    n = 9000
    rng = np.random.default_rng(12)
    ring = [(i, (i + 1) % n) for i in range(n)]
    chords = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(4500, 2))
        if a != b
    ]
    tri_closers = [(i, (i + 2) % n) for i in range(0, n, 3)]
    edges = ring + chords + tri_closers
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = clustering_coefficients(
        rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"])).repartition(8),
        src_col="x", dst_col="y", num_partitions=8,
    ).set_index("node")
    assert len(out) == n
    check = rng.choice(n, size=200, replace=False)
    for v in [int(x) for x in check]:
        nb = sorted(adj[v])
        tri = sum(
            1
            for i in range(len(nb))
            for j in range(i + 1, len(nb))
            if nb[j] in adj[nb[i]]
        )
        d = len(nb)
        assert int(out.loc[v, "degree"]) == d
        assert int(out.loc[v, "triangles"]) == tri, v
        want = (2 * tri) / (d * (d - 1)) if d > 1 else 0.0
        assert out.loc[v, "clustering"] == want
    # total triangles agree with the wedge-mode count op
    from arlas_proc_ray.stages.graph import triangle_count

    tc = triangle_count(
        rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"])).repartition(8),
        src_col="x", dst_col="y", num_partitions=8, mode="wedge",
    )
    assert int(tc["n_triangles"].iloc[0]) * 3 == int(out["triangles"].sum())

    # (c) explicit bitset past the budget keeps the loud contract
    with pytest.raises(ValueError, match="broadcast budget"):
        clustering_coefficients(
            rd.from_pandas(pd.DataFrame(ring, columns=["x", "y"])),
            src_col="x", dst_col="y", mode="bitset",
        )


def test_exchange_mode_frontiers_bit_parity():
    """VERDICT r4 #2: Dataset-resident distance state (no driver node
    state) must be bit-identical to the broadcast Pregel paths —
    random weighted digraphs, multi-source, horizon cutoffs, NUL-byte
    ids, and early fixpoint exit."""
    from arlas_proc_ray.stages.graph import (
        bellman_ford_dists,
        bellman_ford_exchange,
        shortest_hops_exchange,
    )

    rng = np.random.default_rng(44)
    nodes = [f"v{i}" for i in range(40)] + ["x", "x\x00"]
    edges = []
    for _ in range(160):
        a, b = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(a)], nodes[int(b)], int(rng.integers(1, 9))))
    edges += [("x", "x\x00", 1), ("x\x00", "v0", 1)]
    ds = _edges_ds(edges)

    for srcs, rounds in ((["v0"], 3), (["v1", "x"], 6), (["v5"], 50)):
        want = bellman_ford_dists(
            ds, src_col="src", dst_col="dst", weight_col="w",
            sources=srcs, rounds=rounds,
        ).sort_values("node").reset_index(drop=True)
        got = (
            bellman_ford_exchange(
                ds, src_col="src", dst_col="dst", weight_col="w",
                sources=srcs, rounds=rounds, num_partitions=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    for srcs, hops in ((["v0"], 2), (["v3", "v7"], 4), (["x"], 10)):
        want = shortest_hops(
            ds, src_col="src", dst_col="dst", sources=srcs, max_hops=hops,
        ).sort_values("node").reset_index(drop=True)
        got = (
            shortest_hops_exchange(
                ds, src_col="src", dst_col="dst", sources=srcs,
                max_hops=hops, num_partitions=4,
            )
            .to_pandas()
            .rename(columns={"hops": "hops"})
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, want, check_dtype=True
        )

    # unweighted BF (weight_col=None) == hop counts
    a = bellman_ford_exchange(
        ds, src_col="src", dst_col="dst", weight_col=None,
        sources=["v0"], rounds=4, num_partitions=4,
    ).to_pandas().sort_values("node").reset_index(drop=True)
    b = shortest_hops(
        ds, src_col="src", dst_col="dst", sources=["v0"], max_hops=4,
    ).rename(columns={"hops": "dist"}).sort_values("node").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b)


def test_k_core_exchange_parity():
    """Third exchange-mode family member: Dataset-resident survivor set
    (degree exchange + two semi-join peels per round) must match the
    broadcast k_core exactly — random graphs, several k, NUL ids."""
    from arlas_proc_ray.stages.graph import k_core, k_core_exchange

    rng = np.random.default_rng(9)
    nodes = [f"n{i}" for i in range(30)] + ["x", "x\x00"]
    edges = []
    for _ in range(120):
        a, b = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(a)], nodes[int(b)]))
    edges += [("x", "x\x00"), ("x\x00", "n0"), ("x", "n0")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["x", "y"])).repartition(3)

    for k in (2, 3, 4, 6):
        want = k_core(ds, src_col="x", dst_col="y", k=k, num_partitions=4)
        got = k_core_exchange(
            ds, src_col="x", dst_col="y", k=k, num_partitions=4
        ).to_pandas()
        if len(want) == 0:
            # Ray drops columns on a 0-row to_pandas — row-count parity
            # is the whole check for an empty core
            assert len(got) == 0, k
            continue
        want = want.sort_values("node").reset_index(drop=True)
        got = got.sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert (got["core_degree"] >= k).all()


def test_label_propagation_matches_python_oracle():
    """Deterministic LPA: per round each node takes the most frequent
    in-neighbor label (multigraph counts), smallest label on ties —
    pinned against a dict-based Python oracle on random digraphs
    (mirrored and directed), including NUL-byte ids."""
    from arlas_proc_ray.stages.graph import label_propagation

    def py_lpa(edges, rounds):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        lab = {v: v for v in nodes}
        for _ in range(rounds):
            cnt = {}
            for a, b in edges:
                c = cnt.setdefault(b, {})
                c[lab[a]] = c.get(lab[a], 0) + 1
            new = dict(lab)
            for v, c in cnt.items():
                m = max(c.values())
                new[v] = min(x for x, n in c.items() if n == m)
            lab = new
        return lab

    rng = np.random.default_rng(23)
    nodes = [f"n{i}" for i in range(24)] + ["x", "x\x00"]
    base = [
        (nodes[int(a)], nodes[int(b)])
        for a, b in rng.integers(0, len(nodes), size=(90, 2))
        if a != b
    ] + [("x", "x\x00"), ("x\x00", "n1")]
    for mirror in (False, True):
        edges = base + [(b, a) for a, b in base] if mirror else base
        ds = rd.from_pandas(
            pd.DataFrame(edges, columns=["s", "t"])
        ).repartition(3)
        for rounds in (1, 2, 3):
            got = label_propagation(
                ds, src_col="s", dst_col="t", rounds=rounds,
                num_partitions=4,
            )
            want = py_lpa(edges, rounds)
            assert dict(zip(got["node"], got["label"])) == want, (
                mirror, rounds,
            )


def test_pagerank_exchange_teleport_parity():
    """Personalized teleport on the exchange path: bit-identical to the
    broadcast teleport variant (incl. a NUL-id teleport member)."""
    edges = EDGES + [("x\x00", "a", 2), ("a", "x\x00", 1)]
    for srcs in (["a"], ["a", "x\x00"], ["d"]):
        want = pagerank(
            _edges_ds(edges), src_col="src", dst_col="dst", weight_col="w",
            iterations=3, teleport_nodes=srcs,
        ).sort_values("node").reset_index(drop=True)
        got = (
            pagerank_exchange(
                _edges_ds(edges), src_col="src", dst_col="dst",
                weight_col="w", iterations=3, num_partitions=4,
                teleport_nodes=srcs,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# round 5: katz / harmonic / assortativity
# ---------------------------------------------------------------------------


def _py_katz(edges, rounds=3, alpha_den=4):
    """Brute attenuated walk counting (exact ints): s = Σ 4^{K-k} w_k."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    w = {v: 1 for v in nodes}
    s = {v: 0 for v in nodes}
    for _ in range(rounds):
        nw = {v: 0 for v in nodes}
        for u, v in edges:
            nw[v] += w[u]
        w = nw
        s = {v: alpha_den * s[v] + w[v] for v in nodes}
    return s


def test_katz_exchange_matches_python_oracle():
    from arlas_proc_ray.stages.graph import katz_centrality_exchange

    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(40)]
    pairs = {
        (nodes[a], nodes[b])
        for a, b in zip(rng.integers(0, 40, 220), rng.integers(0, 40, 220))
        if a != b
    }
    edges = sorted(pairs) + sorted(pairs)  # mirrored: both directions
    edges = sorted({(u, v) for u, v in edges} | {(v, u) for u, v in pairs})
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    out = katz_centrality_exchange(
        rd.from_pandas(pdf).repartition(5), src_col="src", dst_col="dst",
        rounds=3, alpha_den=4, num_partitions=4,
    ).to_pandas()
    want = _py_katz(edges)
    assert dict(zip(out["node"], out["katz"])) == want
    assert out["katz"].dtype == np.int64


def test_katz_exchange_multigraph_weights_walks_by_multiplicity():
    from arlas_proc_ray.stages.graph import katz_centrality_exchange

    edges = [("a", "b"), ("a", "b"), ("b", "c")]  # duplicate a->b
    out = katz_centrality_exchange(
        _edges_ds([(u, v, 1) for u, v in edges]),
        src_col="src", dst_col="dst", rounds=3, alpha_den=4,
        num_partitions=2,
    ).to_pandas()
    assert dict(zip(out["node"], out["katz"])) == _py_katz(edges)


def test_katz_exchange_nul_ids_and_empty():
    from arlas_proc_ray.stages.graph import katz_centrality_exchange

    a, a0 = "x", "x\x00"
    edges = [(a, "b"), ("b", a0), (a0, "c")]
    out = katz_centrality_exchange(
        _edges_ds([(u, v, 1) for u, v in edges]),
        src_col="src", dst_col="dst", rounds=3, num_partitions=3,
    ).to_pandas()
    assert len(out) == 4
    assert dict(zip(out["node"], out["katz"])) == _py_katz(edges)

    empty = katz_centrality_exchange(
        rd.from_pandas(pd.DataFrame({"src": [], "dst": []})),
        src_col="src", dst_col="dst", rounds=2,
    ).to_pandas()
    assert len(empty) == 0


def _py_harmonic(pairs, max_hops=3, L=6):
    """Brute per-source BFS over the undirected deduped pair set."""
    from collections import deque

    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for s in adj:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if dist[x] >= max_hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        out[s] = sum(L // d for d in dist.values() if d > 0)
    return out


def test_harmonic_centrality_matches_bruteforce():
    from arlas_proc_ray.stages.graph import harmonic_centrality

    rng = np.random.default_rng(11)
    nodes = [f"h{i}" for i in range(60)]
    pairs = {
        tuple(sorted((nodes[a], nodes[b])))
        for a, b in zip(rng.integers(0, 60, 150), rng.integers(0, 60, 150))
        if a != b
    }
    # feed duplicated + mirrored rows: dedup is the operator's job
    rows = [(u, v, 1) for u, v in pairs] + [(v, u, 1) for u, v in pairs]
    out = harmonic_centrality(
        _edges_ds(rows), src_col="src", dst_col="dst", max_hops=3,
        num_partitions=4,
    )
    want = _py_harmonic(pairs)
    assert dict(zip(out["node"], out["harmonic"])) == want
    degs = {
        n: len({v for u, v in pairs if u == n} | {u for u, v in pairs if v == n})
        for n in want
    }
    assert dict(zip(out["node"], out["degree"])) == degs


def test_harmonic_centrality_budget_and_empty():
    import pytest

    from arlas_proc_ray.stages.graph import harmonic_centrality

    with pytest.raises(ValueError, match="bitset broadcast budget"):
        harmonic_centrality(
            _edges_ds([(f"a{i}", f"b{i}", 1) for i in range(6)]),
            src_col="src", dst_col="dst", max_bitset_nodes=4,
        )
    out = harmonic_centrality(
        rd.from_pandas(pd.DataFrame({"src": [], "dst": []})),
        src_col="src", dst_col="dst",
    )
    assert len(out) == 0 and list(out.columns) == ["node", "degree", "harmonic"]


def test_harmonic_centrality_fixpoint_early_exit_exact():
    """Two disjoint edges: everything reachable is at distance 1; rounds
    2-3 add nothing and the loop exits at the fixpoint with exact
    scores (6 per neighbor)."""
    from arlas_proc_ray.stages.graph import harmonic_centrality

    out = harmonic_centrality(
        _edges_ds([("a", "b", 1), ("c", "d", 1)]),
        src_col="src", dst_col="dst", max_hops=3,
    )
    assert dict(zip(out["node"], out["harmonic"])) == {
        "a": 6, "b": 6, "c": 6, "d": 6,
    }


def test_degree_assortativity_matches_numpy_and_exact_moments():
    from arlas_proc_ray.stages.graph import degree_assortativity

    rng = np.random.default_rng(13)
    nodes = [f"d{i}" for i in range(30)]
    pairs = {
        tuple(sorted((nodes[a], nodes[b])))
        for a, b in zip(rng.integers(0, 30, 90), rng.integers(0, 30, 90))
        if a != b
    }
    rows = [(u, v, 1) for u, v in pairs]
    out = degree_assortativity(
        _edges_ds(rows), src_col="src", dst_col="dst", num_partitions=4,
    )
    deg: dict = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [deg[u] for u, v in pairs] + [deg[v] for u, v in pairs]
    ys = [deg[v] for u, v in pairs] + [deg[u] for u, v in pairs]
    assert int(out["n_pairs"].iloc[0]) == len(xs)
    assert int(out["sum_deg"].iloc[0]) == sum(xs)
    assert int(out["sum_prod"].iloc[0]) == sum(
        x * y for x, y in zip(xs, ys)
    )
    want_r = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    assert abs(float(out["assortativity"].iloc[0]) - want_r) < 1e-12


def _py_stress(edges, source, max_hops=3):
    """Brute single-source stress: forward sigma by level, backward
    DAG-suffix path counts, stress = sigma * phi (0 at the source)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    dist = {source: 0}
    sigma = {source: 1}
    frontier = [source]
    for d in range(1, max_hops + 1):
        inc: dict = defaultdict(int)
        for u in frontier:
            for w in adj[u]:
                if w not in dist or dist[w] == d:
                    inc[w] += sigma[u]
        frontier = [w for w in inc if w not in dist]
        for w in frontier:
            dist[w] = d
            sigma[w] = inc[w]
    phi = {v: 0 for v in dist}
    for d in range(max_hops - 1, -1, -1):
        for v in dist:
            if dist[v] != d:
                continue
            phi[v] = sum(
                1 + phi[w] for w in adj[v]
                if w in dist and dist[w] == d + 1
            )
    return {
        v: (dist[v], sigma[v], 0 if v == source else sigma[v] * phi[v])
        for v in dist
    }


def test_stress_exchange_matches_python_oracle():
    from arlas_proc_ray.stages.graph import stress_centrality_exchange

    rng = np.random.default_rng(41)
    names = [f"s{i}" for i in range(36)]
    pairs = {
        (names[a], names[b])
        for a, b in zip(rng.integers(0, 36, 160), rng.integers(0, 36, 160))
        if a != b
    }
    edges = sorted(pairs | {(v, u) for u, v in pairs})
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    out = stress_centrality_exchange(
        rd.from_pandas(pdf).repartition(4), src_col="src", dst_col="dst",
        source="s0", max_hops=3, num_partitions=4,
    ).to_pandas()
    want = _py_stress(edges, "s0")
    got = {
        r.node: (r.dist, r.sigma, r.stress)
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_stress_exchange_diamond_and_nul_ids():
    from arlas_proc_ray.stages.graph import stress_centrality_exchange

    # diamond: s -> a,b -> t  (2 shortest paths; stress(a)=stress(b)=1,
    # sigma(t)=2) plus a NUL twin of a that must stay distinct
    a, a0 = "a", "a\x00"
    edges = [("s", a), ("s", "b"), ("s", a0),
             (a, "t"), ("b", "t"), (a0, "t"), ("t", "z")]
    out = stress_centrality_exchange(
        _edges_ds([(u, v, 1) for u, v in edges]),
        src_col="src", dst_col="dst", source="s", max_hops=3,
        num_partitions=3,
    ).to_pandas()
    want = _py_stress(edges, "s")
    got = {
        r.node: (r.dist, r.sigma, r.stress)
        for r in out.itertuples(index=False)
    }
    assert got == want
    assert got["t"] == (2, 3, 3)  # 3 paths reach t, all continue to z
    assert got[a] == (1, 1, 2) and got[a0] == (1, 1, 2)


def test_stress_exchange_empty_edges():
    from arlas_proc_ray.stages.graph import stress_centrality_exchange

    out = stress_centrality_exchange(
        rd.from_pandas(pd.DataFrame({"src": [], "dst": []})),
        src_col="src", dst_col="dst", source="s",
    ).to_pandas()
    assert len(out) == 0


def test_common_neighbor_features_matches_bruteforce():
    from arlas_proc_ray.stages.graph import common_neighbor_features

    rng = np.random.default_rng(17)
    names = [f"c{i}" for i in range(40)]
    pairs = {
        tuple(sorted((names[a], names[b])))
        for a, b in zip(rng.integers(0, 40, 140), rng.integers(0, 40, 140))
        if a != b
    }
    rows = [(u, v, 1) for u, v in pairs] + [(v, u, 1) for u, v in pairs]
    out = (
        common_neighbor_features(
            _edges_ds(rows), src_col="src", dst_col="dst",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    assert len(out) == len(pairs)
    for r in out.itertuples(index=False):
        cn = len(adj[r.u] & adj[r.v])
        assert (r.common, r.deg_u, r.deg_v, r.union_n) == (
            cn, len(adj[r.u]), len(adj[r.v]),
            len(adj[r.u]) + len(adj[r.v]) - cn,
        )
