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


# ---------------------------------------------------------------------------
# min_label_exchange (fixed-depth components on the same Pregel kit)
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import min_label_exchange  # noqa: E402


def _py_min_label(edges, rounds):
    """Reference: exactly `rounds` synchronous min-propagation steps."""
    nodes = sorted({v for e in edges for v in e})
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        new = dict(lab)
        for s, t in edges:
            if lab[s] < new[t]:
                new[t] = lab[s]
        lab = new
    return lab


def test_min_label_exchange_matches_fixed_depth_oracle(ray_session):
    rng = np.random.default_rng(3)
    nodes = [f"m{i}" for i in range(50)] + ["z", "z\x00"]
    base = []
    for _ in range(60):
        a, b = rng.choice(len(nodes), size=2, replace=False)
        base.append((nodes[int(a)], nodes[int(b)]))
    base += [("z", "z\x00")]
    mirrored = base + [(t, s) for s, t in base]
    for rounds in (1, 2, 8):  # under- and over-converged depths
        got = (
            min_label_exchange(
                _edges_ds(mirrored), src_col="src", dst_col="dst",
                rounds=rounds, num_partitions=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        lab = _py_min_label(mirrored, rounds)
        want = pd.DataFrame(
            sorted(lab.items()), columns=["node", "label"]
        )
        pd.testing.assert_frame_equal(got, want)


def test_min_label_exchange_components(ray_session):
    # two separate components + a singleton via self-loop
    base = [("a", "b"), ("b", "c"), ("p", "q"), ("s", "s")]
    mirrored = base + [(t, s) for s, t in base]
    got = (
        min_label_exchange(
            _edges_ds(mirrored), src_col="src", dst_col="dst", rounds=6,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("p", "p"), ("q", "p"),
         ("s", "s")],
        columns=["node", "label"],
    )
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# hits_exchange (hubs/authorities on the same Pregel kit)
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import hits_exchange  # noqa: E402


def _py_hits(edges, iterations, scale=10**9):
    nodes = sorted({v for e in edges for v in e})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}

    def rescale(d):
        mx = max(d.values()) if d else 0
        return {v: (x * scale // mx if mx > 0 else x) for v, x in d.items()}

    for _ in range(iterations):
        a = {v: sum(h[s] for s, t in edges if t == v) for v in nodes}
        a = rescale(a)
        h = {u: sum(a[t] for s, t in edges if s == u) for u in nodes}
        h = rescale(h)
    return h, a


def test_hits_exchange_matches_python_oracle(ray_session):
    rng = np.random.default_rng(5)
    nodes = [f"h{i}" for i in range(40)] + ["q", "q\x00"]
    edges = []
    for _ in range(150):
        x, y = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(x)], nodes[int(y)]))
    edges += [("q", "q\x00"), ("q", "q\x00")]  # multigraph duplicate
    for iters in (1, 3):
        got = (
            hits_exchange(
                _edges_ds(edges), src_col="src", dst_col="dst",
                iterations=iters, num_partitions=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        h, a = _py_hits(edges, iters)
        want = pd.DataFrame(
            {
                "node": sorted(h),
                "hub": pd.Series([h[v] for v in sorted(h)], dtype="int64"),
                "authority": pd.Series(
                    [a[v] for v in sorted(h)], dtype="int64"
                ),
            }
        )
        pd.testing.assert_frame_equal(got, want)


def test_hits_exchange_sinks_and_sources(ray_session):
    # 'root' only points out (authority 0), 'leaf' only receives (hub 0)
    edges = [("root", "mid"), ("mid", "leaf"), ("root", "leaf")]
    got = (
        hits_exchange(
            _edges_ds(edges), src_col="src", dst_col="dst", iterations=2,
            num_partitions=2,
        )
        .to_pandas()
        .set_index("node")
    )
    assert got.loc["root", "authority"] == 0
    assert got.loc["leaf", "hub"] == 0
    assert got.loc["root", "hub"] > 0 and got.loc["leaf", "authority"] > 0


# ---------------------------------------------------------------------------
# label_propagation_exchange (fourth exchange-mode twin)
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import (  # noqa: E402
    label_propagation,
    label_propagation_exchange,
)


def test_label_propagation_exchange_bit_parity(ray_session):
    rng = np.random.default_rng(9)
    nodes = [f"c{i}" for i in range(45)] + ["y", "y\x00"]
    edges = []
    for _ in range(180):
        s, t = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(s)], nodes[int(t)]))
    edges += [("y", "y\x00"), ("y", "y\x00"), ("y\x00", "c0")]
    ds = _edges_ds(edges)
    for rounds in (1, 3):
        want = label_propagation(
            ds, src_col="src", dst_col="dst", rounds=rounds,
            num_partitions=4,
        ).reset_index(drop=True)
        got = (
            label_propagation_exchange(
                ds, src_col="src", dst_col="dst", rounds=rounds,
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("node", kind="mergesort")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# deterministic_walks (counter-based walk corpus on the same kit)
# ---------------------------------------------------------------------------

from arlas_proc_ray.cdc.events import _splitmix64  # noqa: E402
from arlas_proc_ray.stages.graph import deterministic_walks  # noqa: E402


def _py_walks(edges, starts, length, K=1_000_003):
    adj: dict = {}
    for s, t in set(edges):
        adj.setdefault(s, set()).add(t)
    adj = {k: sorted(v) for k, v in adj.items()}
    rows = []
    for wk, node in starts:
        cur = node
        rows.append((wk, 0, cur))
        for i in range(1, length + 1):
            nbs = adj.get(cur)
            if not nbs:
                break
            h = int(_splitmix64(np.array([wk * K + i], dtype=np.uint64))[0])
            cur = nbs[h % len(nbs)]
            rows.append((wk, i, cur))
    return pd.DataFrame(rows, columns=["walk", "step", "node"])


def test_deterministic_walks_match_python_oracle(ray_session):
    rng = np.random.default_rng(21)
    nodes = [f"w{i}" for i in range(30)] + ["k", "k\x00"]
    edges = []
    for _ in range(120):
        s, t = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(s)], nodes[int(t)]))
    edges += [("k", "k\x00"), ("k", "k\x00"), ("k\x00", "w0")]  # dup rows
    starts = pd.DataFrame(
        {"walk": np.arange(6, dtype=np.int64),
         "node": ["w0", "w5", "k", "k\x00", "w7", "w7"]}
    )
    got = (
        deterministic_walks(
            _edges_ds(edges), src_col="src", dst_col="dst", starts=starts,
            length=5, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )
    want = _py_walks(
        edges, list(zip(starts["walk"], starts["node"])), 5
    ).sort_values(["walk", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_deterministic_walks_dead_end(ray_session):
    # 'end' has no out-edges: the walk stops after reaching it
    edges = [("a", "end")]
    starts = pd.DataFrame({"walk": np.array([7], dtype=np.int64),
                           "node": ["a"]})
    got = (
        deterministic_walks(
            _edges_ds(edges), src_col="src", dst_col="dst", starts=starts,
            length=4, num_partitions=2,
        )
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert got["node"].tolist() == ["a", "end"]
    assert got["step"].tolist() == [0, 1]


# ---------------------------------------------------------------------------
# earliest_arrival_exchange (temporal reachability on the same kit)
# ---------------------------------------------------------------------------

from arlas_proc_ray.stages.graph import earliest_arrival_exchange  # noqa: E402


def _py_earliest(edges, sources, start_ts, rounds):
    """Reference: exactly `rounds` synchronous min-arrival steps."""
    arr = {s: start_ts for s in sources}
    for _ in range(rounds):
        new = dict(arr)
        for s, t, ts in edges:
            if s in arr and ts >= arr[s]:
                if t not in new or ts < new[t]:
                    new[t] = ts
        arr = new
    return arr


def test_earliest_arrival_matches_fixed_depth_oracle(ray_session):
    rng = np.random.default_rng(17)
    nodes = [f"e{i}" for i in range(40)] + ["n", "n\x00"]
    edges = []
    for _ in range(200):
        s, t = rng.choice(len(nodes), size=2, replace=False)
        edges.append((nodes[int(s)], nodes[int(t)], int(rng.integers(1, 100))))
    edges += [("n", "n\x00", 5), ("n\x00", "e0", 3)]  # 3 < 5: NOT traversable
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst", "ts"]))
    for srcs, rounds in ((["e0"], 1), (["e1", "n"], 3), (["e5"], 8)):
        got = (
            earliest_arrival_exchange(
                ds, src_col="src", dst_col="dst", ts_col="ts",
                sources=srcs, start_ts=0, rounds=rounds, num_partitions=4,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        arr = _py_earliest(edges, srcs, 0, rounds)
        want = pd.DataFrame(
            sorted(arr.items()), columns=["node", "arrival"]
        )
        want["arrival"] = want["arrival"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


def test_earliest_arrival_time_respecting(ray_session):
    # a->b at t=10, b->c at t=5: c unreachable (5 < 10); b->d at 20 ok
    edges = [("a", "b", 10), ("b", "c", 5), ("b", "d", 20)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst", "ts"]))
    got = (
        earliest_arrival_exchange(
            ds, src_col="src", dst_col="dst", ts_col="ts", sources=["a"],
            start_ts=0, rounds=5, num_partitions=2,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got.set_index("node")["arrival"].to_dict() == {
        "a": 0, "b": 10, "d": 20
    }


def test_harmonic_sketch_exact_bit_parity_with_driver_bitset():
    from arlas_proc_ray.stages.graph import harmonic_centrality
    from arlas_proc_ray.stages.neighborhood import harmonic_centrality_sketch

    rng = np.random.default_rng(23)
    names = [f"p{i}" for i in range(50)]
    pairs = {
        tuple(sorted((names[a], names[b])))
        for a, b in zip(rng.integers(0, 50, 130), rng.integers(0, 50, 130))
        if a != b
    }
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"])).repartition(4)

    want = harmonic_centrality(
        ds, src_col="src", dst_col="dst", max_hops=3, num_partitions=4
    )
    got = (
        harmonic_centrality_sketch(
            ds, src_col="src", dst_col="dst", max_hops=3, mode="exact",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = want.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_harmonic_sketch_hll_error_bound_and_budget():
    import pytest

    from arlas_proc_ray.stages.graph import harmonic_centrality
    from arlas_proc_ray.stages.neighborhood import harmonic_centrality_sketch

    rng = np.random.default_rng(31)
    names = [f"q{i}" for i in range(80)]
    pairs = {
        tuple(sorted((names[a], names[b])))
        for a, b in zip(rng.integers(0, 80, 240), rng.integers(0, 80, 240))
        if a != b
    }
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst"])).repartition(3)

    exact = harmonic_centrality(
        ds, src_col="src", dst_col="dst", max_hops=3, num_partitions=4
    )
    est = harmonic_centrality_sketch(
        ds, src_col="src", dst_col="dst", max_hops=3, mode="hll",
        log2m=6, num_partitions=4,
    ).to_pandas()
    m = exact.merge(est, on="node", suffixes=("_x", "_e"))
    assert len(m) == len(exact)
    tot_x = m["harmonic_x"].sum()
    tot_e = m["harmonic_e"].sum()
    # aggregate estimate within the HyperANF band (1.04/sqrt(64) ≈ 13%
    # per node, partial cancellation in the sum)
    assert abs(tot_e - tot_x) / tot_x < 0.15

    with pytest.raises(ValueError, match="exceeds the 8-node budget"):
        harmonic_centrality_sketch(
            ds, src_col="src", dst_col="dst", mode="exact",
            max_exact_nodes=8,
        )
