"""dedup/editdist.py — exact lev-1 join vs a brute-force oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.dedup.editdist import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(terms):
    out = set()
    for i in range(len(terms)):
        for j in range(i + 1, len(terms)):
            if terms[i] != terms[j] and _lev(terms[i], terms[j]) == 1:
                out.add((i, j))
    return out


def _run(terms, **kw):
    ds = rd.from_pandas(
        pd.DataFrame({"id": np.arange(len(terms), dtype=np.int64), "term": terms})
    ).repartition(3)
    got = edit_distance_pairs(ds, id_col="id", term_col="term", **kw).to_pandas()
    return got


def test_editdist_families():
    terms = [
        "cat",   # 0
        "cut",   # 1  sub of 0
        "cats",  # 2  insert of 0
        "at",    # 3  delete of 0
        "cat",   # 4  EQUAL to 0 — excluded
        "dog",   # 5  unrelated
        "",      # 6  lev1 to any 1-char
        "a",     # 7  lev1 to "" and "at"
    ]
    got = _run(terms)
    pairs = set(zip(got["id_a"], got["id_b"]))
    want = _brute(terms)
    # equal-term ids pair with everything their twin pairs with
    want |= {(min(a, 4), max(a, 4)) for (a, b) in want if b == 0}
    want |= {(min(4, b), max(4, b)) for (a, b) in want if a == 0}
    assert pairs == want
    # terms ride along correctly
    row = got[(got.id_a == 0) & (got.id_b == 1)].iloc[0]
    assert {row["term_a"], row["term_b"]} == {"cat", "cut"}


def test_editdist_no_duplicate_pairs_random():
    """Uniqueness claim: each qualifying pair appears EXACTLY once,
    even with repeated characters (several delete positions giving the
    same variant) and small alphabets."""
    rng = np.random.default_rng(42)
    terms = [
        "".join(rng.choice(list("ab"), size=rng.integers(0, 5)))
        for _ in range(60)
    ]
    got = _run(terms, num_partitions=4)
    keyed = list(zip(got["id_a"], got["id_b"]))
    assert len(keyed) == len(set(keyed)), "duplicate pair emitted"
    want = _brute(terms)
    got_terms = {
        (a, b)
        for (a, b) in keyed
        if terms[a] != terms[b]  # brute excludes equal terms
    }
    assert got_terms == {
        (a, b) for (a, b) in want
    } | {
        (a, b) for (a, b) in keyed if _lev(terms[a], terms[b]) == 1
    } - {(a, b) for (a, b) in keyed if terms[a] == terms[b]}
    # and every emitted pair is genuinely lev 1
    for a, b in keyed:
        assert _lev(terms[a], terms[b]) == 1


def test_editdist_bucket_cap_sound_and_uncapped_complete():
    # 30 single-char strings: every pair collides in the s|0|"" bucket
    # (and the d-rows in the "" variant bucket). A cap of 10 drops both
    # over-full buckets — output shrinks (to empty here) but anything
    # emitted must still be a true lev-1 pair; uncapped finds all pairs.
    terms = [c for c in "abcdefghijklmnopqrstuvwxyz1234"]
    got = _run(terms, max_bucket=10)
    if len(got):  # empty Dataset → to_pandas() has no columns
        for a, b in zip(got["id_a"], got["id_b"]):
            assert _lev(terms[a], terms[b]) == 1
    full = _run(terms)
    assert set(zip(full["id_a"], full["id_b"])) == _brute(terms)


def test_editdist_hypothesis_bucketing_parity():
    """Property: for ANY term multiset over a tiny alphabet, the
    emit→bucket→pair logic (driven locally, simulating the exchange as
    one sorted partition) equals the brute-force lev-1 pair set, with
    zero duplicate emissions."""
    from hypothesis import given, settings, strategies as st

    from arlas_proc_ray.dedup.editdist import _emit_rows, _pairs_from_rows

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.text(alphabet="ab", max_size=4), min_size=2, max_size=14))
    def run(terms):
        ids = np.arange(len(terms), dtype=np.int64)
        rows = _emit_rows(ids, terms, "id").to_pandas()
        part = rows.sort_values(["bucket", "id"], kind="mergesort")
        got = _pairs_from_rows(part, "id", 2_000)
        keyed = list(zip(got["id_a"], got["id_b"]))
        assert len(keyed) == len(set(keyed)), "duplicate pair"
        want = _brute(terms)
        assert set(keyed) == want

    run()
