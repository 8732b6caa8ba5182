"""Mergeable sketches — HyperLogLog count-distinct, count-min frequency.

The canonical 100-TB primitive the reference lacks entirely (ARLAS-proc
has no approximate aggregation; its only distinct-ish op is the exact
dedup at tools/DataFrameFormatter.scala:48): per-group distinct counts
where the exact answer would shuffle every value. Published algorithm
(Flajolet et al. 2007, with the standard small-range linear-counting
correction from Heule et al. 2013's presentation of the original).

Scale shape: the VALUES never shuffle. Each batch collapses to at most
``groups × m`` (group, bucket, register) partial rows inside
``map_batches`` (the combiner), and only those partials take the one
keyed exchange, where per-partition ``max`` merges them — register max
is associative/commutative/idempotent, so at-least-once task retries
are harmless. A register table is also the resume/merge currency: two
epochs' registers merge by ``max`` (pinned in tests).

SQL parity: the row hash is the repo-wide deterministic-assignment
kernel ``sha256-prefix-int`` (functions/hashing.py:70 — 15 hex chars =
60 bits), so DuckDB reproduces registers EXACTLY:
``hv // 2^(60-p)`` is the bucket and
``CASE WHEN rem = 0 THEN 60-p+1 ELSE 60-p+1 - length(bin(rem)) END``
the rank (bit length via ``bin()`` is exact integer math on both
sides; numpy uses ``frexp``, exact for ints < 2^53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from arlas_proc_ray.functions.hashing import sha256_prefix_int
from arlas_proc_ray.stages.keyed import keyed_partition_map

HASH_BITS = 60  # sha256-prefix-int yields 15 hex chars


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_partial_fn(group_col: str, value_col: str, p: int):
    """Per-batch combiner: (group, bucket, register) sparse partial maxima."""
    rem_bits = HASH_BITS - p
    rem_mask = np.int64((1 << rem_bits) - 1)
    rho_base = rem_bits + 1

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        hv = sha256_prefix_int(pc.cast(vals, pa.string()))
        keep = hv >= 0  # nulls hash to -1: a null value is no observation
        hv = hv[keep]
        bucket = hv >> np.int64(rem_bits)
        rem = hv & rem_mask
        # exact bit length: frexp exponent (ints < 2^53 are float-exact)
        rho = rho_base - np.frexp(rem.astype(np.float64))[1]
        gcol = batch.column(group_col).combine_chunks()
        if keep.sum() != len(keep):
            gcol = gcol.filter(pa.array(keep))
        enc = pc.dictionary_encode(gcol)
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # max per (group, bucket): sort by composite code w/ rho secondary,
        # last of each run is the max (no Python loop)
        ckey = gcodes << np.int64(p) | bucket
        order = np.lexsort((rho, ckey))
        ck_sorted = ckey[order]
        last = (
            np.append(ck_sorted[1:] != ck_sorted[:-1], True)
            if len(ck_sorted)
            else np.zeros(0, bool)
        )
        sel = order[last]
        return pa.table(
            {
                group_col: enc.dictionary.take(pa.array(gcodes[sel])),
                "bucket": pa.array(bucket[sel], type=pa.int64()),
                "register": pa.array(rho[sel].astype(np.int64)),
            }
        )

    return partial


def hll_registers(
    ds, *, group_col: str, value_col: str, p: int = 12, num_partitions: int = 16
):
    """Sparse HLL register table per group: one row per observed
    (group, bucket) with the max rank — the mergeable sketch state
    (merge = per-(group,bucket) ``max``; SQL-exact, see module doc)."""

    partials = ds.map_batches(
        hll_partial_fn(group_col, value_col, p),
        batch_format="pyarrow",
        batch_size=None,
    )

    def reduce_max(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby([group_col, "bucket"], sort=False)["register"]
            .max()
            .reset_index()
        )

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="bucket",
        fn=reduce_max,
        num_partitions=num_partitions,
    )


def estimate_from_registers(
    registers: pd.DataFrame, group_col: str, p: int
) -> pd.DataFrame:
    """Finalize per-group estimates from a (possibly sparse) register
    frame — raw HLL with the standard linear-counting small-range
    correction. Pure pandas/numpy; also the test-side merge oracle."""
    m = 1 << p
    alpha = _alpha(m)
    regs = (
        registers.groupby([group_col, "bucket"], sort=False)["register"]
        .max()
        .reset_index()
    )
    out = []
    for g, sub in regs.groupby(group_col, sort=False):
        r = sub["register"].to_numpy()
        zeros = m - len(r)
        power_sum = np.ldexp(1.0, -r).sum() + zeros
        est = alpha * m * m / power_sum
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        out.append((g, float(est)))
    return pd.DataFrame(out, columns=[group_col, "distinct_est"])


def cms_partial_fn(value_col: str, depth: int, width: int):
    """Per-batch combiner: sparse (depth_row, cell, cnt) partial counts.

    Each of the ``depth`` rows uses an independent hash — the shared
    sha256-prefix kernel over the salted string ``"{d}:{value}"`` — so
    DuckDB reproduces every cell exactly (module doc). A batch of any
    size collapses to at most ``depth × width`` partial rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch.column(value_col), pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        n = len(vals)
        counts = np.zeros(depth * width, dtype=np.int64)
        for d in range(depth):
            salted = pc.binary_join_element_wise(
                pa.array([str(d)] * n, pa.string()), vals, ":"
            )
            hv = sha256_prefix_int(salted)
            hv = hv[hv >= 0]  # null values are no observation
            np.add.at(counts, d * width + hv % width, 1)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "depth_row": pa.array(nz // width, type=pa.int64()),
                "cell": pa.array(nz % width, type=pa.int64()),
                "cnt": pa.array(counts[nz]),
            }
        )

    return partial


def cms_counters(ds, *, value_col: str, depth: int = 4, width: int = 1024):
    """Count-min sketch counter table for ``value_col``: one row per
    non-empty (depth_row, cell) with the total count. Values never
    shuffle — batches collapse to ≤ depth×width partials in the
    combiner and one keyed exchange sums them. Merge = per-cell ``+``
    (associative/commutative; Ray block lineage dedups retries, and two
    epochs' counter tables merge by summing — pinned in tests)."""

    partials = ds.map_batches(
        cms_partial_fn(value_col, depth, width),
        batch_format="pyarrow",
        batch_size=None,
    )

    def reduce_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby(["depth_row", "cell"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )

    return keyed_partition_map(
        partials,
        keys=["depth_row"],
        order_col="cell",
        fn=reduce_sum,
        num_partitions=depth,
    )


def cms_estimate(
    counters: pd.DataFrame, items: "list[str]", *, depth: int, width: int
) -> pd.DataFrame:
    """Point-frequency estimates for ``items`` from a counter frame:
    min over depth rows of the hashed cell's count (the count-min
    estimator — an overestimate by ≤ e/width·N w.p. 1-e^-depth).
    Driver-side finalize over the tiny counter table."""
    dense = np.zeros((depth, width), dtype=np.int64)
    dense[counters["depth_row"].to_numpy(), counters["cell"].to_numpy()] = (
        counters["cnt"].to_numpy()
    )
    ests = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    arr = pa.array([str(x) for x in items], pa.string())
    for d in range(depth):
        salted = pc.binary_join_element_wise(
            pa.array([str(d)] * len(items), pa.string()), arr, ":"
        )
        cells = sha256_prefix_int(salted) % width
        ests = np.minimum(ests, dense[d, cells])
    return pd.DataFrame({"item": items, "freq_est": ests})


def histogram_quantiles(
    ds,
    *,
    group_col: str,
    value_col: str,
    qs: "list[float]" = (0.5, 0.95, 0.99),
    bins: int = 1024,
    num_partitions: int = 16,
):
    """Per-group approximate quantiles via a two-pass fixed histogram.

    Pass 1: one streaming scan for global [lo, hi]. Pass 2: per-batch
    (group, bin) count partials (each batch collapses to ≤ groups×bins
    rows), one tiny keyed exchange summing them, then a per-group
    cumulative scan picks the first bin whose cumulative count reaches
    ``ceil(q·n)`` — quantile_disc semantics on bins. The estimate is the
    bin's LEFT edge, so the error is at most one bin width
    ``(hi-lo)/bins``; raw values never shuffle and the counts merge by
    ``+`` across epochs. Every arithmetic step (bin assignment, ceil
    target, edge reconstruction) is IEEE-double-identical to the SQL
    oracle.
    """
    import ray.data.aggregate as agg

    qs = list(qs)
    mm = ds.aggregate(agg.Min(value_col), agg.Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    if hi == lo:
        groups = ds.select_columns([group_col]).unique(group_col)
        return pd.DataFrame(
            [(g, q, lo) for g in groups for q in qs],
            columns=[group_col, "q", "est"],
        )
    nb = np.float64(bins)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        # same op order as the SQL: ((v - lo) * bins) / (hi - lo)
        b = np.minimum(
            np.floor((v[keep] - lo) * nb / (hi - lo)), bins - 1
        ).astype(np.int64)
        gcol = batch.column(group_col).combine_chunks()
        if not keep.all():
            gcol = gcol.filter(pa.array(keep))
        enc = pc.dictionary_encode(gcol)
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        code = gcodes * np.int64(bins) + b
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {
                group_col: enc.dictionary.take(pa.array(uniq // bins)),
                "bin": pa.array(uniq % bins, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = (
            pdf.groupby([group_col, "bin"], sort=False)["cnt"].sum().reset_index()
        )
        out = []
        for g, sub in counts.groupby(group_col, sort=False):
            sub = sub.sort_values("bin")
            cum = sub["cnt"].cumsum().to_numpy()
            n = cum[-1]
            b_arr = sub["bin"].to_numpy()
            for q in qs:
                target = np.ceil(np.float64(q) * n)
                b = b_arr[int(np.searchsorted(cum, target))]
                out.append((g, q, lo + b * (hi - lo) / nb))
        return pd.DataFrame(out, columns=[group_col, "q", "est"])

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="bin",
        fn=finalize,
        num_partitions=num_partitions,
    )


def hll_count_distinct(
    ds, *, group_col: str, value_col: str, p: int = 12, num_partitions: int = 16
):
    """Per-group approximate distinct count of ``value_col`` (relative
    error ~1.04/sqrt(2^p); p=12 → ~1.6% σ). One keyed exchange carrying
    only register partials; values never shuffle."""

    partials = ds.map_batches(
        hll_partial_fn(group_col, value_col, p),
        batch_format="pyarrow",
        batch_size=None,
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        return estimate_from_registers(pdf, group_col, p)

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="bucket",
        fn=finalize,
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries-compressed partials + exact verification pass)
# ---------------------------------------------------------------------------


class HeavyHitterGuaranteeError(RuntimeError):
    """The sketch bound could not prove the candidate set covers the true
    top-k (raised only when ``on_miss="raise"``)."""


def _mg_compress(vc: pd.Series, counters: int):
    """Keep the ``counters`` largest counts (ties → lexically smaller
    term); the bound is the largest DROPPED count — every absent term's
    true block count is ≤ bound (Misra-Gries summary semantics, Misra &
    Gries 1982; SpaceSaving merge, Metwally et al. 2005)."""
    if len(vc) <= counters:
        return vc, 0
    df = vc.reset_index()
    df.columns = ["term", "n"]
    df = df.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    bound = int(df["n"].iloc[counters])
    kept = df.head(counters)
    return pd.Series(kept["n"].to_numpy(), index=kept["term"]), bound


def heavy_hitters_topk(
    ds,
    *,
    text_col: str = "text",
    k: int = 20,
    counters: int = 256,
    slack: int | None = None,
    pattern: str = "[a-z]+",
    on_miss: str = "exact",
) -> pd.DataFrame:
    """Exact top-``k`` term frequencies via a bounded-memory sketch.

    The 100-TB shape ``vocab_top_terms`` (functions/text.py:128) can't
    give: that operator shuffles one partial row per DISTINCT term per
    block — fine for a bounded vocabulary, unbounded pain for open-ended
    token spaces (URLs, n-grams, ids). Here every block compresses to
    ≤ ``counters`` Misra-Gries rows regardless of its vocabulary, the
    merged candidates form a driver-side frame of ≤ counters × blocks
    rows (the documented tiny-result exception), and a SECOND streaming
    pass recounts only the broadcast candidate set exactly.

    The output is PROVABLY the exact top-k (count DESC, term ASC
    tie-break) whenever the sketch bound allows: a term absent from
    every block summary has true count ≤ B = Σ per-block dropped-count
    bounds, and a non-candidate present in some summaries has true count
    ≤ its merged partial count + B ≤ LB(k+slack-th) + B; if the exact
    k-th candidate count exceeds that ceiling, no outside term can reach
    the top-k. When the proof fails, ``on_miss="exact"`` (default)
    escalates to the exact full-vocabulary path (correctness never
    degrades silently); ``on_miss="raise"`` raises
    :class:`HeavyHitterGuaranteeError`.

    Reference parity: none (the reference has no approximate
    aggregation); published-algorithm port.
    """
    import ray

    if on_miss not in ("exact", "raise"):
        raise ValueError(f"unknown on_miss: {on_miss!r}")
    slack = k if slack is None else slack

    def partial_counts(batch: pa.Table) -> pd.DataFrame:
        text = pc.utf8_lower(batch.column(text_col))
        s = text.to_pandas().fillna("")
        words = s.str.findall(pattern).explode().dropna()
        vc = words.value_counts()
        kept, bound = _mg_compress(vc, counters)
        out = pd.DataFrame(
            {
                "term": kept.index.to_numpy(object),
                "n": kept.to_numpy(np.int64),
                "bound": np.int64(0),
            }
        )
        if len(out):  # block bound rides on the first row only
            out.iloc[0, out.columns.get_loc("bound")] = bound
        return out

    # ≤ counters rows per block: a tiny frame even at thousands of blocks
    partials = ds.map_batches(
        partial_counts, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=object),
             "freq": pd.Series([], dtype=np.int64)}
        )

    total_bound = int(partials["bound"].sum())
    merged = partials.groupby("term", sort=False)["n"].sum().reset_index()
    merged = merged.sort_values(
        ["n", "term"], ascending=[False, True], kind="mergesort"
    )
    cand = merged.head(k + slack)
    best_outside_lb = (
        int(merged["n"].iloc[k + slack]) if len(merged) > k + slack else 0
    )

    # pass 2: exact recount of the candidate set only (broadcast once)
    cand_ref = ray.put(frozenset(cand["term"]))

    def exact_counts(batch: pa.Table) -> pd.DataFrame:
        cand_set = ray.get(cand_ref)
        text = pc.utf8_lower(batch.column(text_col))
        s = text.to_pandas().fillna("")
        words = s.str.findall(pattern).explode().dropna()
        words = words[words.isin(cand_set)]
        vc = words.value_counts()
        return pd.DataFrame(
            {"term": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    exact = (
        ds.map_batches(exact_counts, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # ≤ (k+slack) rows per block
        .groupby("term", sort=False)["n"].sum().reset_index()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    )
    top = exact.head(k).reset_index(drop=True)

    # certification: any non-candidate's true count ≤ merged-LB of the
    # best term outside the candidate cut + the total dropped-count bound
    kth = int(top["n"].iloc[-1]) if len(top) else 0
    ceiling = best_outside_lb + total_bound
    # < k candidates is only safe when nothing was ever dropped (the
    # merged frame then IS the complete vocabulary)
    uncertified = (
        (len(top) < k and total_bound > 0)
        or (len(top) == k and kth <= ceiling)
    )
    if uncertified:
        if on_miss == "raise":
            raise HeavyHitterGuaranteeError(
                f"k-th exact count {kth} ≤ outside ceiling {ceiling}; "
                f"raise counters (={counters}) or slack (={slack})"
            )
        from arlas_proc_ray.functions.text import top_terms

        out = top_terms(ds, text_col=text_col, k=k, pattern=pattern)
        out = out.rename(columns={"n": "freq"})
        return out[["term", "freq"]]

    return top.rename(columns={"n": "freq"})[["term", "freq"]]


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch
# ---------------------------------------------------------------------------


def kmv_partial_fn(group_col: str, value_col: str, k: int):
    """Per-batch combiner: the ``k`` smallest DISTINCT hash values per
    group — the bottom-k (KMV / theta) sketch partial (Bar-Yossef et al.
    2002; Beyer et al. 2007 for the unbiased (k−1)/h_k estimator).

    Same hash kernel as the HLL family (``sha256_prefix_int``, 60 bits),
    so DuckDB reproduces the retained set bit-for-bit. Merge is
    union-then-bottom-k — associative/commutative/idempotent, so task
    retries are harmless and two epochs' sketches merge exactly like
    two blocks' partials.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        from arlas_proc_ray.stages.keyed import (
            byte_exact_group_cols,
            restore_object_cols,
        )

        vals = batch.column(value_col)
        hv = sha256_prefix_int(pc.cast(vals, pa.string()))
        keep = hv >= 0  # nulls hash to -1: a null value is no observation
        hv = hv[keep]
        gcol = batch.column(group_col).combine_chunks()
        if keep.sum() != len(keep):
            gcol = gcol.filter(pa.array(keep))
        pdf = byte_exact_group_cols(
            pd.DataFrame({group_col: gcol.to_pandas(), "hv": hv}),
            [group_col],
        ).drop_duplicates()
        # bottom-k per group without a Python loop: sort once, cumcount
        pdf = pdf.sort_values([group_col, "hv"], kind="mergesort")
        rank = pdf.groupby(group_col, sort=False).cumcount()
        return restore_object_cols(
            pdf[rank < k].reset_index(drop=True), [group_col]
        )

    return partial


def kmv_distinct(
    ds, *, group_col: str, value_col: str, k: int = 64, num_partitions: int = 16
):
    """Per-group distinct-count estimate from a bottom-k (KMV) sketch.

    Scale shape (same contract as :func:`hll_registers`): values never
    shuffle — each block collapses to ≤ ``groups × k`` (group, hash)
    partial rows inside ``map_batches``, one keyed exchange merges them
    (union → distinct → bottom-k), and the estimate is derived per
    group in the same partition task.

    Output per group: ``n_kmv`` (retained hashes, = min(k, true
    distinct)), ``kth_hash`` (max retained hash), and ``distinct_est`` —
    EXACT when the group has < k distinct values, else the unbiased
    ``(k−1)·2^60 // kth_hash`` (integer math; the product is evaluated
    in Python ints / SQL HUGEINT, the quotient is ≤ ~k/kth·2^60 which
    for any kth reached by k distinct draws fits int64).
    """
    partials = ds.map_batches(
        kmv_partial_fn(group_col, value_col, k),
        batch_format="pyarrow",
        batch_size=None,
    )
    domain = 1 << HASH_BITS

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates().sort_values(
            [group_col, "hv"], kind="mergesort"
        )
        rank = pdf.groupby(group_col, sort=False).cumcount()
        pdf = pdf[rank < k]
        agg = pdf.groupby(group_col, sort=False)["hv"].agg(["size", "max"])
        ests = [
            int(n) if n < k else ((k - 1) * domain) // int(kth)
            for n, kth in zip(agg["size"], agg["max"])
        ]
        return pd.DataFrame(
            {
                group_col: agg.index.to_numpy(object),
                "n_kmv": agg["size"].to_numpy(np.int64),
                "kth_hash": agg["max"].to_numpy(np.int64),
                "distinct_est": np.array(ests, dtype=np.int64),
            }
        )

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="hv",
        fn=merge,
        num_partitions=num_partitions,
    )


def kmv_state(
    ds, *, group_col: str, value_col: str, k: int = 64, num_partitions: int = 16
):
    """The raw bottom-k sketch STATE per group: one (group, hv) row per
    retained hash — the merge/set-operation currency (union two states
    and re-cut at k to merge; see :func:`kmv_intersect_estimate`). Same
    partial/merge topology as :func:`kmv_distinct`."""
    partials = ds.map_batches(
        kmv_partial_fn(group_col, value_col, k),
        batch_format="pyarrow",
        batch_size=None,
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates().sort_values(
            [group_col, "hv"], kind="mergesort"
        )
        rank = pdf.groupby(group_col, sort=False).cumcount()
        return pdf[rank < k].reset_index(drop=True)

    return keyed_partition_map(
        partials,
        keys=[group_col],
        order_col="hv",
        fn=merge,
        num_partitions=num_partitions,
    )


def kmv_intersect_estimate(
    state: pd.DataFrame, group_a, group_b, *, group_col: str, k: int
) -> pd.DataFrame:
    """Theta-sketch set estimates from two groups' bottom-k states
    (Dasgupta et al. 2016's theta framing of KMV): ``theta`` = the
    smaller of the two sketches' k-th values (a sketch with < k retained
    hashes is EXACT and contributes theta = the full 2^60 domain); only
    hashes strictly below theta count, scaled by domain/theta — all
    integer math, exact whenever both groups are below k.

    Driver-side finalize over sketch-sized input (≤ 2k rows) — the
    distributed work happened in :func:`kmv_state`.
    """
    domain = 1 << HASH_BITS
    sa = state.loc[state[group_col] == group_a, "hv"]
    sb = state.loc[state[group_col] == group_b, "hv"]
    theta_a = int(sa.max()) if len(sa) >= k else domain
    theta_b = int(sb.max()) if len(sb) >= k else domain
    theta = min(theta_a, theta_b)
    below_a = set(int(h) for h in sa if h < theta)
    below_b = set(int(h) for h in sb if h < theta)
    c_inter = len(below_a & below_b)
    c_union = len(below_a | below_b)
    inter_est = (c_inter * domain) // theta
    union_est = (c_union * domain) // theta
    return pd.DataFrame(
        {
            "type_a": [group_a],
            "type_b": [group_b],
            "inter_est": np.array([inter_est], dtype=np.int64),
            "union_est": np.array([union_est], dtype=np.int64),
            "jaccard_est": [c_inter / c_union] if c_union else [0.0],
        }
    )
