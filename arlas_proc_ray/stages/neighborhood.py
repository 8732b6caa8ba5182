"""Neighborhood function N(h) — how many (source, node) pairs lie
within h hops — over a distributed edge list.

N(h) is the classic graph distance-distribution primitive (effective
diameter, hop-plot exponent, closeness bounds). Exact computation needs
per-node reachable SETS, which is what makes it hard at scale — the
published answer is ANF (Palmer/Gibbons/Faloutsos, KDD 2002) and
HyperANF (Boldi/Rosa/Vigna, WWW 2011): replace each node's reachable
set with a mergeable cardinality sketch and iterate
``sketch(v) ∪= sketch(u) for (v,u) ∈ E`` h times. Beyond-reference
surface — the reference (gisaia/ARLAS-proc) has no graph ops.

Scale shape: both modes run on the resident-edge Pregel kit
(stages/graph.py ``_stage_edge_partitions`` + ``_pregel_loop``) —
edges hash-stage ONCE into P object-store partitions, per-node sketch
state lives co-partitioned (never the driver, never broadcast), and
each hop is 2·P raw tasks moving only node-sized sketch rows. Edges
stage keyed on DST: the propagation ``v ∪= sketch(u)`` consumes u's
sketch where the edge lives, so partition p holds the edges whose u
co-locates with its sketch, the local join is on u, and the emitted
``(v, merged-sketch)`` candidates hash toward v's home partition. The
driver sees one float per partition per hop (the N(h) partial).

Two sketch kinds:

- ``mode="exact"`` — the sketch is a REAL bitset over a driver-built
  node index (n bits per node, n²/8 bytes across the cluster — the
  stated budget, enforced against ``max_exact_nodes``). N(h) is an
  exact popcount sum, bit-reproducible by a bounded recursive-CTE SQL
  oracle.
- ``mode="hll"`` — the sketch is an HLL register array (``2**log2m``
  uint8 registers, value-stable node hashes; union = elementwise max).
  Memory is n·m bytes TOTAL regardless of graph size — the 100-TB
  path. The estimate uses the standard HLL estimator with the
  linear-counting small-range correction; deterministic given node ids
  (no RNG state), ~1.04/√m per-node error with partial cancellation
  across the sum (error-bound pinned in tests vs exact).

Determinism: exact mode is integer/bit arithmetic end to end; hll mode
is deterministic-hash + max/float ops evaluated in one fixed order per
node (numpy reductions over the register axis), identical across runs
and cluster resizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from arlas_proc_ray.stages.graph import (
    _POP8,
    _bx_groupagg,
    _pregel_loop,
    _split_state_refs,
    _stage_edge_partitions,
    _tree_collect,
)
from arlas_proc_ray.stages.keyed import byte_exact_group_cols


def _sketch_rows(pdf: pd.DataFrame, sk_col: str) -> np.ndarray:
    """(n, R) uint8 matrix from a bytes column (one row per node)."""
    if len(pdf) == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    return np.frombuffer(
        b"".join(pdf[sk_col].tolist()), dtype=np.uint8
    ).reshape(len(pdf), -1)


def _group_or_max(pdf, node_col: str, sk_col: str, *, how: str):
    """Per-node elementwise OR (exact bitsets) or MAX (HLL registers) of
    sketch rows — one grouped numpy reduce per node, no per-byte Python."""
    g = _bx_groupagg(
        pdf.assign(_i=np.arange(len(pdf), dtype=np.int64)),
        node_col,
        {"_i": list},
    )
    mat = _sketch_rows(pdf, sk_col)
    op = np.bitwise_or if how == "or" else np.maximum
    g[sk_col] = [
        op.reduce(mat[np.asarray(idx, dtype=np.int64)], axis=0).tobytes()
        for idx in g["_i"]
    ]
    return g[[node_col, sk_col]]


def _hll_params(log2m: int):
    m = 1 << log2m
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return m, alpha


def _hll_estimates(mat: np.ndarray, log2m: int) -> np.ndarray:
    """Standard HLL estimate per sketch row, with the linear-counting
    small-range correction (the only regime correction that matters at
    graph-neighborhood cardinalities)."""
    m, alpha = _hll_params(log2m)
    est = alpha * m * m / np.power(2.0, -mat.astype(np.float64)).sum(axis=1)
    zeros = (mat == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lc, est)


def _hll_init(values, log2m: int) -> list[bytes]:
    """Initial sketch per node: its own id observed once. The hash is
    pandas' fixed-key siphash of the VALUE (byte-exact, process-stable —
    the same routing-grade hash the exchanges use)."""
    m, _ = _hll_params(log2m)
    h = pd.util.hash_array(
        np.asarray(values, dtype=object), categorize=False
    ).astype(np.uint64)
    reg = (h & np.uint64(m - 1)).astype(np.int64)
    rest = (h >> np.uint64(log2m)).astype(object)  # int.bit_length below
    width = 64 - log2m
    out = []
    for i in range(len(h)):
        r = int(rest[i])
        rank = width if r == 0 else width - r.bit_length() + 1
        sk = np.zeros(m, dtype=np.uint8)
        sk[reg[i]] = rank
        out.append(sk.tobytes())
    return out


def neighborhood_function(
    edges_ds,
    *,
    src_col: str,
    dst_col: str,
    max_hops: int,
    mode: str = "exact",
    max_exact_nodes: int = 65_536,
    log2m: int = 6,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-hop reachable-pair counts over a directed edge list.

    Returns ``(hops, pairs)`` for h = 0..max_hops — ``pairs`` is the
    number of (source, node) pairs at hop distance ≤ h (h=0 counts
    every node reaching itself). Exact int64 in ``mode="exact"``;
    HLL-estimated (rounded to int64) in ``mode="hll"``. Exact mode
    early-exits once a hop adds no pair (transitive closure) and pads
    the remaining hops with the closure count.

    Follows edge direction; pass a mirrored edge list for undirected
    semantics. Duplicate edges are harmless (set/max union is
    idempotent — no DISTINCT exchange needed).
    """
    if mode not in ("exact", "hll"):
        raise ValueError(f"unknown mode: {mode!r}")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    P = num_partitions
    edge_refs = _stage_edge_partitions(
        edges_ds, key_col=dst_col, cols=[src_col, dst_col], num_partitions=P
    )
    if edge_refs is None:
        return pd.DataFrame(
            {
                "hops": pd.Series([], dtype="int64"),
                "pairs": pd.Series([], dtype="int64"),
            }
        )

    # node universe: byte-exact distinct over both endpoints (node-sized
    # by the module contract — same bound as the sketch state itself)
    def uni_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {
                "node": np.concatenate(
                    [pdf[src_col].to_numpy(), pdf[dst_col].to_numpy()]
                ),
                "_one": np.int64(1),
            }
        )
        return _bx_groupagg(both, "node", {"_one": "max"})

    nodes_pdf = _tree_collect(
        edges_ds.map_batches(
            uni_partial, batch_format="pandas", batch_size=None
        ),
        lambda pdf: _bx_groupagg(pdf, "node", {"_one": "max"}),
    )
    nodes = sorted(nodes_pdf["node"].tolist())
    n = len(nodes)

    if mode == "exact":
        if n > max_exact_nodes:
            raise ValueError(
                f"exact mode needs n²/8 sketch bytes; {n} nodes exceeds "
                f"the {max_exact_nodes}-node budget — use mode='hll'"
            )
        nbytes = (n + 7) // 8
        init_sk = []
        for i in range(n):
            sk = np.zeros(nbytes, dtype=np.uint8)
            sk[i >> 3] |= 1 << (i & 7)
            init_sk.append(sk.tobytes())
        how = "or"

        def readout(mat: np.ndarray) -> float:
            return float(_POP8[mat].sum())

    else:
        init_sk = _hll_init(nodes, log2m)
        how = "max"

        def readout(mat: np.ndarray) -> float:
            return float(_hll_estimates(mat, log2m).sum())

    init = pd.DataFrame({"node": nodes, "_sk": init_sk})
    state_refs = _split_state_refs(init, "node", P)

    @ray.remote
    def part_count(state: pa.Table) -> float:
        pdf = state.to_pandas()
        if pdf.empty:
            return 0.0
        return readout(_sketch_rows(pdf, "_sk"))

    def relax_fn(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {
                "node": pd.Series([], dtype=object),
                "_sk": pd.Series([], dtype=object),
            }
        )
        if edges_pdf.empty or state_pdf.empty:
            return empty
        st = byte_exact_group_cols(
            pd.DataFrame(
                {dst_col: state_pdf["node"], "_sk": state_pdf["_sk"]}
            ),
            [dst_col],
        )
        ed = byte_exact_group_cols(edges_pdf[[src_col, dst_col]], [dst_col])
        m = ed.merge(st, on=dst_col, how="inner")
        if m.empty:
            return empty
        cand = pd.DataFrame(
            {"node": m[src_col].to_numpy(), "_sk": m["_sk"].to_numpy()}
        )
        return _group_or_max(cand, "node", "_sk", how=how)

    def fold_fn(state_pdf: pd.DataFrame, cand_pdf):
        if cand_pdf is None or cand_pdf.empty:
            return state_pdf[["node", "_sk"]], 0
        both = pd.concat(
            [state_pdf[["node", "_sk"]], cand_pdf[["node", "_sk"]]],
            ignore_index=True,
        )
        g = _group_or_max(both, "node", "_sk", how=how)
        prior = dict(zip(state_pdf["node"], state_pdf["_sk"]))
        changed = sum(
            1 for v, sk in zip(g["node"], g["_sk"]) if prior.get(v) != sk
        )
        return g, changed

    counts = [sum(ray.get([part_count.remote(r) for r in state_refs]))]
    for _ in range(max_hops):
        state_refs = _pregel_loop(
            edge_refs,
            state_refs,
            node_col="node",
            relax_fn=relax_fn,
            fold_fn=fold_fn,
            rounds=1,
            num_partitions=P,
        )
        c = sum(ray.get([part_count.remote(r) for r in state_refs]))
        if mode == "exact" and c == counts[-1]:
            # transitive closure: every remaining hop repeats the count
            counts.extend([c] * (max_hops + 1 - len(counts)))
            break
        counts.append(c)
    counts = counts[: max_hops + 1]
    return pd.DataFrame(
        {
            "hops": np.arange(len(counts), dtype=np.int64),
            "pairs": np.asarray(np.rint(counts), dtype=np.int64),
        }
    )


def harmonic_centrality_sketch(
    edges_ds,
    *,
    src_col: str,
    dst_col: str,
    max_hops: int = 3,
    mode: str = "exact",
    max_exact_nodes: int = 65_536,
    log2m: int = 6,
    num_partitions: int = 16,
):
    """Per-node bounded-horizon harmonic centrality on the resident-
    sketch Pregel kit — the SCALE path past
    :func:`arlas_proc_ray.stages.graph.harmonic_centrality`'s
    driver-bitset budget.

    ``H(v) = Σ_{d=1..max_hops} (L // d) · (|N_d(v)| − |N_{d−1}(v)|)``
    with ``L = lcm(1..max_hops)`` — per-hop NEWLY-reached counts read
    off the same resident reachability sketches
    :func:`neighborhood_function` iterates: edges hash-stage once
    (keyed on ``dst`` — propagation consumes the successor's sketch
    where the edge lives), per-node sketch state lives co-partitioned
    in the object store (never the driver, never broadcast), each hop
    is one :func:`_pregel_loop` step. The harmonic accumulator and the
    degree (= the hop-1 newly count) fold in-place next to the sketch.

    - ``mode="exact"`` — real bitsets over the node index: n²/8 bytes
      ACROSS THE CLUSTER (enforced against ``max_exact_nodes``), int64
      scores **bit-identical to the driver-bitset path** (parity-pinned
      in tests) and to the chained frontier-CTE SQL oracle.
    - ``mode="hll"`` — HyperANF-style (Boldi/Rosa/Vigna WWW 2011)
      register sketches: n·2^log2m bytes total, unbounded node counts;
      scores and degrees are rounded estimates (~1.04/√m per-hop error
      with partial cancellation across the sum; clamped monotone —
      regime switches in the estimator can dip, newly counts floor at
      0). Deterministic across runs and resizes (value-stable hashes).

    Directed semantics follow edge direction (pass a mirrored list for
    undirected); duplicate edges are harmless (union is idempotent).
    Returns a Dataset of ``(node, degree, harmonic)`` int64.
    """
    import math

    import ray.data as rd

    if mode not in ("exact", "hll"):
        raise ValueError(f"unknown mode: {mode!r}")
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    P = num_partitions
    L = math.lcm(*range(1, max_hops + 1))
    empty_out = pd.DataFrame(
        {
            "node": pd.Series([], dtype=object),
            "degree": pd.Series([], dtype="int64"),
            "harmonic": pd.Series([], dtype="int64"),
        }
    )
    edge_refs = _stage_edge_partitions(
        edges_ds, key_col=dst_col, cols=[src_col, dst_col], num_partitions=P
    )
    if edge_refs is None:
        return rd.from_pandas(empty_out)

    def uni_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {
                "node": np.concatenate(
                    [pdf[src_col].to_numpy(), pdf[dst_col].to_numpy()]
                ),
                "_one": np.int64(1),
            }
        )
        return _bx_groupagg(both, "node", {"_one": "max"})

    nodes_pdf = _tree_collect(
        edges_ds.map_batches(
            uni_partial, batch_format="pandas", batch_size=None
        ),
        lambda pdf: _bx_groupagg(pdf, "node", {"_one": "max"}),
    )
    nodes = sorted(nodes_pdf["node"].tolist())
    n = len(nodes)

    if mode == "exact":
        if n > max_exact_nodes:
            raise ValueError(
                f"exact mode needs n²/8 sketch bytes; {n} nodes exceeds "
                f"the {max_exact_nodes}-node budget — use mode='hll'"
            )
        nbytes = (n + 7) // 8
        init_sk = []
        for i in range(n):
            sk = np.zeros(nbytes, dtype=np.uint8)
            sk[i >> 3] |= 1 << (i & 7)
            init_sk.append(sk.tobytes())
        how = "or"

        def cards(mat: np.ndarray) -> np.ndarray:
            return _POP8[mat].sum(axis=1).astype(np.float64)

    else:
        init_sk = _hll_init(nodes, log2m)
        how = "max"

        def cards(mat: np.ndarray) -> np.ndarray:
            return _hll_estimates(mat, log2m)

    init = pd.DataFrame({"node": nodes, "_sk": init_sk})
    init["_c"] = 1.0  # |N_0(v)| = self
    init["_h"] = 0.0
    init["_deg"] = 0.0
    state_refs = _split_state_refs(init, "node", P)

    def relax_fn(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {
                "node": pd.Series([], dtype=object),
                "_sk": pd.Series([], dtype=object),
            }
        )
        if edges_pdf.empty or state_pdf.empty:
            return empty
        st = byte_exact_group_cols(
            pd.DataFrame(
                {dst_col: state_pdf["node"], "_sk": state_pdf["_sk"]}
            ),
            [dst_col],
        )
        ed = byte_exact_group_cols(edges_pdf[[src_col, dst_col]], [dst_col])
        m = ed.merge(st, on=dst_col, how="inner")
        if m.empty:
            return empty
        cand = pd.DataFrame(
            {"node": m[src_col].to_numpy(), "_sk": m["_sk"].to_numpy()}
        )
        return _group_or_max(cand, "node", "_sk", how=how)

    for d in range(1, max_hops + 1):
        coeff = float(L // d)
        is_first = d == 1

        def fold_fn(state_pdf: pd.DataFrame, cand_pdf,
                    _coeff=coeff, _first=is_first):
            out = state_pdf[["node", "_sk", "_c", "_h", "_deg"]].copy()
            if cand_pdf is not None and not cand_pdf.empty:
                both = pd.concat(
                    [state_pdf[["node", "_sk"]], cand_pdf[["node", "_sk"]]],
                    ignore_index=True,
                )
                g = _group_or_max(both, "node", "_sk", how=how)
                merged = dict(zip(g["node"], g["_sk"]))
                out["_sk"] = [merged[v] for v in out["node"]]
            new_c = cards(_sketch_rows(out, "_sk"))
            newly = np.maximum(new_c - out["_c"].to_numpy(np.float64), 0.0)
            out["_h"] = out["_h"].to_numpy(np.float64) + _coeff * newly
            if _first:
                out["_deg"] = newly
            out["_c"] = new_c
            changed = int((newly > 0).sum())
            return out, changed

        state_refs = _pregel_loop(
            edge_refs,
            state_refs,
            node_col="node",
            relax_fn=relax_fn,
            fold_fn=fold_fn,
            rounds=1,
            num_partitions=P,
        )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [
                t.column("node"),
                pc.cast(pc.round(t.column("_deg")), pa.int64()),
                pc.cast(pc.round(t.column("_h")), pa.int64()),
            ],
            names=["node", "degree", "harmonic"],
        )

    return rd.from_arrow_refs(state_refs).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )
