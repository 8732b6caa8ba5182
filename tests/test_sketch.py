"""HyperLogLog sketch (stages/sketch.py): accuracy, mergeability, kernel
parity with pure-Python bit_length, and null handling."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.stages.sketch import (
    estimate_from_registers,
    hll_count_distinct,
    hll_partial_fn,
    hll_registers,
)

P = 12
M = 1 << P


def _frame(card_by_group: dict, rows_per_val: int = 3) -> pd.DataFrame:
    rows = []
    for g, card in card_by_group.items():
        for v in range(card):
            rows.extend((g, f"{g}:{v}") for _ in range(rows_per_val))
    rng = np.random.default_rng(5)
    df = pd.DataFrame(rows, columns=["g", "v"])
    return df.iloc[rng.permutation(len(df))].reset_index(drop=True)


def test_rho_kernel_matches_bit_length():
    import pyarrow as pa

    vals = [str(i * 7919) for i in range(500)]
    t = pa.table({"g": ["x"] * 500, "v": vals})
    out = hll_partial_fn("g", "v", P)(t).to_pandas()
    # independent oracle: per (bucket) max of 49 - bit_length(rem)
    expect = {}
    for v in vals:
        hv = int(hashlib.sha256(v.encode()).hexdigest()[:15], 16)
        b, rem = hv >> 48, hv & ((1 << 48) - 1)
        rho = 49 - rem.bit_length()
        expect[b] = max(expect.get(b, 0), rho)
    got = dict(zip(out["bucket"], out["register"]))
    assert got == expect


def test_estimate_accuracy():
    cards = {"tiny": 17, "mid": 1200, "big": 20000}
    ds = rd.from_pandas(_frame(cards)).repartition(8)
    est = (
        hll_count_distinct(ds, group_col="g", value_col="v", p=P, num_partitions=4)
        .to_pandas()
        .set_index("g")["distinct_est"]
    )
    for g, card in cards.items():
        rel = abs(est[g] - card) / card
        assert rel < 0.05, (g, est[g], card, rel)
    # linear-counting regime is near-exact for tiny cardinalities
    assert abs(est["tiny"] - 17) <= 1


def test_registers_merge_by_max():
    df = _frame({"a": 5000, "b": 300})
    half = len(df) // 2
    full = hll_registers(
        rd.from_pandas(df), group_col="g", value_col="v", p=P, num_partitions=4
    ).to_pandas()
    r1 = hll_registers(
        rd.from_pandas(df.iloc[:half]), group_col="g", value_col="v", p=P,
        num_partitions=4,
    ).to_pandas()
    r2 = hll_registers(
        rd.from_pandas(df.iloc[half:]), group_col="g", value_col="v", p=P,
        num_partitions=4,
    ).to_pandas()
    merged = (
        pd.concat([r1, r2])
        .groupby(["g", "bucket"], sort=False)["register"]
        .max()
        .reset_index()
    )

    def canon(x):
        return (
            x.sort_values(["g", "bucket"]).reset_index(drop=True)[
                ["g", "bucket", "register"]
            ].astype({"bucket": "int64", "register": "int64"})
        )

    pd.testing.assert_frame_equal(canon(merged), canon(full))
    # and the merged estimate equals the single-pass estimate exactly
    e_m = estimate_from_registers(merged, "g", P)
    e_f = estimate_from_registers(full, "g", P)
    pd.testing.assert_frame_equal(
        e_m.sort_values("g").reset_index(drop=True),
        e_f.sort_values("g").reset_index(drop=True),
    )


def test_null_values_are_not_observations():
    df = pd.DataFrame({"g": ["a"] * 6, "v": ["x", "y", None, "x", None, "z"]})
    est = hll_count_distinct(
        rd.from_pandas(df), group_col="g", value_col="v", p=P, num_partitions=2
    ).to_pandas()
    assert abs(est.loc[0, "distinct_est"] - 3) < 0.5


# ---------------------------------------------------------------- count-min


def test_cms_kernel_matches_pure_python():
    import pyarrow as pa

    from arlas_proc_ray.stages.sketch import cms_partial_fn

    depth, width = 3, 64
    vals = [str(i % 37) for i in range(400)]
    t = pa.table({"v": vals})
    out = cms_partial_fn("v", depth, width)(t).to_pandas()
    expect = {}
    for v in vals:
        for d in range(depth):
            hv = int(hashlib.sha256(f"{d}:{v}".encode()).hexdigest()[:15], 16)
            key = (d, hv % width)
            expect[key] = expect.get(key, 0) + 1
    got = {
        (r, c): n
        for r, c, n in zip(out["depth_row"], out["cell"], out["cnt"])
    }
    assert got == expect


def test_cms_overestimates_and_is_accurate():
    from arlas_proc_ray.stages.sketch import cms_counters, cms_estimate

    depth, width = 4, 1024
    rng = np.random.default_rng(11)
    # zipf-ish: item i appears ~ 3000/(i+1) times
    items = [f"item{i}" for i in range(200)]
    true = {it: max(1, 3000 // (i + 1)) for i, it in enumerate(items)}
    vals = [it for it, n in true.items() for _ in range(n)]
    df = pd.DataFrame({"v": np.array(vals)[rng.permutation(len(vals))]})
    counters = (
        cms_counters(
            rd.from_pandas(df).repartition(6),
            value_col="v",
            depth=depth,
            width=width,
        )
        .to_pandas()
    )
    est = cms_estimate(counters, items, depth=depth, width=width)
    n_total = len(vals)
    eps_n = np.e / width * n_total
    for it, e in zip(est["item"], est["freq_est"]):
        assert e >= true[it], (it, e, true[it])
        assert e - true[it] <= eps_n, (it, e, true[it], eps_n)
    # heavy hitters rank correctly at the head
    top = est.sort_values("freq_est", ascending=False)["item"].head(3).tolist()
    assert top[0] == "item0" and set(top) == {"item0", "item1", "item2"}


def test_cms_merges_by_sum():
    from arlas_proc_ray.stages.sketch import cms_counters

    depth, width = 4, 256
    df = pd.DataFrame({"v": [str(i % 50) for i in range(2000)]})
    half = len(df) // 2

    def run(frame):
        return (
            cms_counters(
                rd.from_pandas(frame), value_col="v", depth=depth, width=width
            )
            .to_pandas()
        )

    full = run(df)
    merged = (
        pd.concat([run(df.iloc[:half]), run(df.iloc[half:])])
        .groupby(["depth_row", "cell"], sort=False)["cnt"]
        .sum()
        .reset_index()
    )

    def canon(x):
        return (
            x.sort_values(["depth_row", "cell"]).reset_index(drop=True)[
                ["depth_row", "cell", "cnt"]
            ].astype("int64")
        )

    pd.testing.assert_frame_equal(canon(merged), canon(full))


# ---------------------------------------------------- histogram quantiles


def test_hist_quantiles_bounded_error_and_exact_vs_numpy_bins():
    from arlas_proc_ray.stages.sketch import histogram_quantiles

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 5000),
            "v": np.concatenate(
                [rng.normal(10, 2, 5000), rng.exponential(5, 5000)]
            ),
        }
    )
    bins = 2048
    out = (
        histogram_quantiles(
            rd.from_pandas(df).repartition(6),
            group_col="g",
            value_col="v",
            qs=[0.5, 0.95, 0.99],
            bins=bins,
            num_partitions=4,
        )
        .to_pandas()
    )
    lo, hi = df["v"].min(), df["v"].max()
    width = (hi - lo) / bins
    for _, r in out.iterrows():
        sub = np.sort(df.loc[df["g"] == r["g"], "v"].to_numpy())
        exact = sub[int(np.ceil(r["q"] * len(sub))) - 1]  # quantile_disc
        assert abs(r["est"] - exact) <= width + 1e-12, (r, exact, width)


def test_hist_quantiles_constant_column():
    from arlas_proc_ray.stages.sketch import histogram_quantiles

    df = pd.DataFrame({"g": ["x"] * 50, "v": [3.25] * 50})
    out = histogram_quantiles(
        rd.from_pandas(df), group_col="g", value_col="v", qs=[0.5],
        num_partitions=2,
    )
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert out["est"].tolist() == [3.25]


# ---------------------------------------------------------------------------
# heavy hitters
# ---------------------------------------------------------------------------


def _exact_topk(texts, k, pattern="[a-z]+"):
    import re

    rx = re.compile(pattern)
    vc = pd.Series(
        [w for t in texts for w in rx.findall((t or "").lower())]
    ).value_counts()
    df = vc.reset_index()
    df.columns = ["term", "freq"]
    return (
        df.sort_values(["freq", "term"], ascending=[False, True],
                       kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def test_heavy_hitters_exact_on_documents():
    from arlas_proc_ray.stages.sketch import heavy_hitters_topk

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    got = heavy_hitters_topk(
        rd.from_pandas(docs).repartition(6), text_col="text", k=15,
        counters=64,
    )
    exp = _exact_topk(docs["text"].tolist(), 15)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_heavy_hitters_adversarial_blocks_still_exact():
    """Each block is dominated by a different decoy; the true global
    heavy hitter is never a block-local top-1. With enough counters the
    certificate holds and the output is exact; escalation keeps it exact
    even when counters are starved."""
    from arlas_proc_ray.stages.sketch import (
        HeavyHitterGuaranteeError,
        heavy_hitters_topk,
    )

    rows = []
    for blk in range(8):
        rows += [f"decoy{blk} " * 30] * 20          # block-local flood
        rows += [f"hot common tail{blk}"] * 25      # global heavy pair
    df = pd.DataFrame({"text": rows})
    ds = rd.from_pandas(df).repartition(8)
    exp = _exact_topk(df["text"].tolist(), 5)

    got = heavy_hitters_topk(ds, text_col="text", k=5, counters=64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)

    # starved sketch: certificate fails -> on_miss='exact' escalates and
    # stays exact; on_miss='raise' surfaces the failure
    got2 = heavy_hitters_topk(ds, text_col="text", k=5, counters=2, slack=0)
    pd.testing.assert_frame_equal(
        got2.reset_index(drop=True).astype({"freq": "int64"}), exp
    )
    try:
        heavy_hitters_topk(
            ds, text_col="text", k=5, counters=2, slack=0, on_miss="raise"
        )
        raised = False
    except HeavyHitterGuaranteeError:
        raised = True
    assert raised


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch
# ---------------------------------------------------------------------------


def _kmv_hash(v: str) -> int:
    return int(hashlib.sha256(v.encode()).hexdigest()[:15], 16)


def test_kmv_exact_below_k():
    from arlas_proc_ray.stages.sketch import kmv_distinct

    df = _frame({"a": 10, "b": 63})
    ds = rd.from_pandas(df).repartition(6)
    out = kmv_distinct(
        ds, group_col="g", value_col="v", k=64, num_partitions=4
    ).to_pandas().set_index("g")
    assert int(out.loc["a", "distinct_est"]) == 10
    assert int(out.loc["b", "distinct_est"]) == 63
    assert int(out.loc["a", "n_kmv"]) == 10
    # retained set is the bottom-k of the true hash set
    hs = sorted(_kmv_hash(f"a:{i}") for i in range(10))
    assert int(out.loc["a", "kth_hash"]) == hs[-1]


def test_kmv_estimator_and_partial_merge():
    from arlas_proc_ray.stages.sketch import kmv_distinct, kmv_partial_fn

    k = 64
    card = 5000
    df = _frame({"big": card}, rows_per_val=2)
    out = (
        kmv_distinct(
            rd.from_pandas(df).repartition(8),
            group_col="g", value_col="v", k=k, num_partitions=4,
        )
        .to_pandas()
        .set_index("g")
    )
    # exact estimator formula on the true bottom-k hash set
    hs = sorted(_kmv_hash(f"big:{i}") for i in range(card))
    kth = hs[k - 1]
    assert int(out.loc["big", "kth_hash"]) == kth
    assert int(out.loc["big", "distinct_est"]) == ((k - 1) << 60) // kth
    # ±3σ-ish sanity: KMV relative error ~ 1/sqrt(k-2)
    est = int(out.loc["big", "distinct_est"])
    assert abs(est - card) / card < 3.5 / np.sqrt(k - 2)
    # mergeability: partials from two disjoint halves merge to the same
    # sketch as one pass (union-then-bottom-k is associative)
    import pyarrow as pa

    half1, half2 = df.iloc[: len(df) // 2], df.iloc[len(df) // 2:]
    pf = kmv_partial_fn("g", "v", k)
    merged = pd.concat(
        [pf(pa.Table.from_pandas(h)) for h in (half1, half2)]
    ).drop_duplicates().sort_values("hv")
    assert list(merged["hv"].head(k)) == hs[:k]


def test_kmv_null_values_ignored():
    from arlas_proc_ray.stages.sketch import kmv_distinct

    df = pd.DataFrame(
        {"g": ["x"] * 6, "v": ["1", None, "2", None, "1", "3"]}
    )
    out = kmv_distinct(
        rd.from_pandas(df), group_col="g", value_col="v", k=8,
        num_partitions=2,
    ).to_pandas()
    assert int(out["distinct_est"].iloc[0]) == 3


def test_kmv_intersection_exact_below_k_and_estimator():
    from arlas_proc_ray.stages.sketch import (
        kmv_intersect_estimate,
        kmv_state,
    )

    # exact regime: both groups < k distinct; A = 0..29, B = 20..49
    rows = [("A", f"v{i}") for i in range(30)] + [
        ("B", f"v{i}") for i in range(20, 50)
    ]
    df = pd.DataFrame(rows, columns=["g", "v"])
    state = kmv_state(
        rd.from_pandas(df).repartition(4), group_col="g", value_col="v",
        k=64, num_partitions=3,
    ).to_pandas()
    out = kmv_intersect_estimate(state, "A", "B", group_col="g", k=64)
    assert int(out["inter_est"].iloc[0]) == 10
    assert int(out["union_est"].iloc[0]) == 50
    assert out["jaccard_est"].iloc[0] == 10 / 50

    # estimator regime: > k distinct per group — formula parity with a
    # brute-force theta computation on the true hash sets
    k = 32
    a = {f"a{i}" for i in range(800)} | {f"s{i}" for i in range(400)}
    b = {f"b{i}" for i in range(700)} | {f"s{i}" for i in range(400)}
    rows = [("A", v) for v in sorted(a)] + [("B", v) for v in sorted(b)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    state = kmv_state(
        rd.from_pandas(df).repartition(6), group_col="g", value_col="v",
        k=k, num_partitions=4,
    ).to_pandas()
    out = kmv_intersect_estimate(state, "A", "B", group_col="g", k=k)
    ha = sorted(_kmv_hash(v) for v in a)
    hb = sorted(_kmv_hash(v) for v in b)
    theta = min(ha[k - 1], hb[k - 1])
    sa = {h for h in ha[:k] if h < theta}
    sb = {h for h in hb[:k] if h < theta}
    dom = 1 << 60
    assert int(out["inter_est"].iloc[0]) == (len(sa & sb) * dom) // theta
    assert int(out["union_est"].iloc[0]) == (len(sa | sb) * dom) // theta
    # sanity: estimates in the right ballpark of truth (400 / 1900)
    assert 100 <= int(out["inter_est"].iloc[0]) <= 900
    assert 1100 <= int(out["union_est"].iloc[0]) <= 2900


def test_kmv_nul_byte_groups_stay_distinct():
    """Groups differing only by NUL bytes must not merge (the pandas
    StringHashTable pitfall byte_exact_group_cols exists for)."""
    from arlas_proc_ray.stages.sketch import kmv_distinct

    df = pd.DataFrame(
        {
            "g": ["", "\x00", "", "\x00", "\x00\x00"],
            "v": ["a", "b", "c", "d", "e"],
        }
    )
    out = kmv_distinct(
        rd.from_pandas(df), group_col="g", value_col="v", k=8,
        num_partitions=2,
    ).to_pandas()
    got = {g: int(n) for g, n in zip(out["g"], out["distinct_est"])}
    assert got == {"": 2, "\x00": 2, "\x00\x00": 1}
