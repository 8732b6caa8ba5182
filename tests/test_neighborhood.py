"""stages/neighborhood.py — neighborhood function N(h), exact vs a
pure-Python BFS oracle, HLL mode vs exact with an error bound."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.stages.neighborhood import neighborhood_function


def _py_nh(edges, max_hops):
    """Reference: per-source BFS over the directed edge list; pairs(h) =
    #{(s, v) : dist(s, v) <= h}, self at hop 0."""
    adj: dict = {}
    nodes = set()
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        nodes.update((s, t))
    counts = [0] * (max_hops + 1)
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for h in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        for h in range(max_hops + 1):
            counts[h] += sum(1 for d in dist.values() if d <= h)
    return counts


def _edges_ds(edges):
    return rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))


def test_neighborhood_exact_matches_bfs_oracle(ray_session):
    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(60)] + ["x", "x\x00"]  # NUL-distinct ids
    edges = []
    for _ in range(220):
        a, b = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(a)], nodes[int(b)]))
    edges += [("x", "x\x00"), ("x\x00", "n0"), ("x", "x")]  # self-loop too
    got = neighborhood_function(
        _edges_ds(edges), src_col="src", dst_col="dst", max_hops=4,
        mode="exact", num_partitions=4,
    )
    want = _py_nh(edges, 4)
    assert got["hops"].tolist() == [0, 1, 2, 3, 4]
    assert got["pairs"].tolist() == want


def test_neighborhood_exact_closure_padding(ray_session):
    # a 4-node directed line closes at hop 3; hops 4..6 must repeat it
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = neighborhood_function(
        _edges_ds(edges), src_col="src", dst_col="dst", max_hops=6,
        mode="exact", num_partitions=3,
    )
    want = _py_nh(edges, 6)
    assert got["pairs"].tolist() == want
    assert got["pairs"].iloc[3] == got["pairs"].iloc[6]


def test_neighborhood_hll_error_bound(ray_session):
    rng = np.random.default_rng(11)
    nodes = [f"v{i}" for i in range(250)]
    edges = []
    for _ in range(900):
        a, b = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(a)], nodes[int(b)]))
    ds = _edges_ds(edges)
    exact = neighborhood_function(
        ds, src_col="src", dst_col="dst", max_hops=3, mode="exact",
        num_partitions=4,
    )["pairs"].to_numpy()
    est = neighborhood_function(
        ds, src_col="src", dst_col="dst", max_hops=3, mode="hll",
        log2m=6, num_partitions=4,
    )["pairs"].to_numpy()
    rel = np.abs(est - exact) / exact
    # 64 registers: ~13% per-node stderr, partially cancelling across the
    # 250-node sum; deterministic hashes make this bound stable
    assert rel.max() < 0.15, rel


def test_neighborhood_exact_budget_contract(ray_session):
    edges = [(f"a{i}", f"a{(i + 1) % 20}") for i in range(20)]
    with pytest.raises(ValueError, match="budget"):
        neighborhood_function(
            _edges_ds(edges), src_col="src", dst_col="dst", max_hops=2,
            mode="exact", max_exact_nodes=16,
        )


def test_neighborhood_empty_edges(ray_session):
    ds = _edges_ds([("a", "b")]).filter(lambda r: False)
    out = neighborhood_function(
        ds, src_col="src", dst_col="dst", max_hops=2, mode="exact",
    )
    assert len(out) == 0
    assert list(out.columns) == ["hops", "pairs"]
