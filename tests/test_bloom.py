"""Bloom-filter join prefilter (stages/bloom.py): no false negatives,
bounded false positives, merge-by-OR, exact semi-join end-to-end, and
bit-kernel parity with pure-Python hashing."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from arlas_proc_ray.stages.bloom import (
    bloom_build,
    bloom_filter_probe,
    bloom_partial_fn,
    bloom_semi_join,
)

M = 1 << 14
K = 3


def _py_positions(key: str) -> list[int]:
    hv = int(hashlib.sha256(key.encode()).hexdigest()[:15], 16)
    h1, h2 = hv % M, (hv // M) % M | 1
    return [(h1 + i * h2) % M for i in range(K)]


def test_partial_bitmap_matches_pure_python():
    keys = [str(i * 31) for i in range(200)]
    t = pa.table({"k": keys})
    bm = np.frombuffer(
        bloom_partial_fn("k", M, K)(t).column("bitmap")[0].as_py(),
        dtype=np.uint8,
    )
    expect = np.zeros(M // 8, dtype=np.uint8)
    for key in keys:
        for p in _py_positions(key):
            expect[p >> 3] |= np.uint8(1) << (p & 7)
    assert np.array_equal(bm, expect)


def test_no_false_negatives_and_bounded_false_positives():
    build_keys = [f"b{i}" for i in range(500)]
    probe_keys = build_keys + [f"x{i}" for i in range(5000)]
    build = rd.from_pandas(pd.DataFrame({"k": build_keys})).repartition(4)
    probe = rd.from_pandas(pd.DataFrame({"k": probe_keys})).repartition(4)
    bm = bloom_build(build, key_col="k", num_bits=M, num_hashes=K)
    out = set(
        bloom_filter_probe(probe, bm, key_col="k", num_bits=M, num_hashes=K)
        .to_pandas()["k"]
    )
    assert set(build_keys) <= out  # never drops a true match
    fp = len(out) - len(build_keys)
    # expected fp rate (1 - e^{-kn/m})^k ~ 0.06% here; allow 10x slack
    assert fp <= 5000 * 0.006, fp


def test_null_keys_never_pass():
    build = rd.from_items([{"k": "a"}, {"k": "b"}])
    probe = rd.from_arrow(
        pa.table({"k": pa.array(["a", None, "zzz"], pa.string())})
    )
    bm = bloom_build(build, key_col="k", num_bits=M, num_hashes=K)
    got = (
        bloom_filter_probe(probe, bm, key_col="k", num_bits=M, num_hashes=K)
        .to_pandas()["k"]
        .tolist()
    )
    assert "a" in got and None not in got


def test_bitmaps_merge_by_or():
    keys = [f"m{i}" for i in range(300)]
    half = len(keys) // 2

    def build(ks):
        return bloom_build(
            rd.from_pandas(pd.DataFrame({"k": ks})),
            key_col="k",
            num_bits=M,
            num_hashes=K,
        )

    assert np.array_equal(
        build(keys), build(keys[:half]) | build(keys[half:])
    )


def test_exact_semi_join_equals_set_semantics():
    build = pd.DataFrame({"bk": [f"k{i}" for i in range(0, 100, 2)]})
    big = pd.DataFrame(
        {"k": [f"k{i}" for i in range(100)], "v": np.arange(100)}
    )
    out = (
        bloom_semi_join(
            rd.from_pandas(big).repartition(3),
            rd.from_pandas(build),
            big_key="k",
            build_key="bk",
            num_bits=1 << 10,  # deliberately small: forces false positives
            num_hashes=2,
            exact=True,
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    expect = big[big["k"].isin(set(build["bk"]))].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, expect)
