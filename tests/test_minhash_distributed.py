"""Distributed MinHash verify: parity with broadcast mode and with an
independent exact all-pairs Jaccard oracle (round-1 verdict item 1)."""

import numpy as np
import pandas as pd
import ray.data as rd

from arlas_proc_ray.dedup.minhash import (
    _shingle_hashes,
    jaccard_ngrams,
    minhash_near_duplicates,
)

SF = "/root/testdata/sf0.001/documents.parquet"
THRESH = 0.5
NGRAM = 5


def _pairs_df(ds) -> pd.DataFrame:
    pdf = ds.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    return (
        pdf[["doc_a", "doc_b", "jaccard"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def exact_all_pairs_oracle(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent oracle: exact char-n-gram Jaccard over ALL pairs,
    computed with the plain-Python set kernel (jaccard_ngrams), no minhash,
    no Ray."""
    rows = []
    ids = docs["doc_id"].tolist()
    texts = docs["text"].tolist()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sim = jaccard_ngrams(texts[i] or "", texts[j] or "", NGRAM)
            if sim >= THRESH:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, sim))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_distributed_matches_broadcast_and_oracle():
    docs = pd.read_parquet(SF, columns=["doc_id", "text"])
    oracle = exact_all_pairs_oracle(docs)
    assert len(oracle) > 0, "fixture must contain near-dups"

    dist = _pairs_df(
        minhash_near_duplicates(
            rd.read_parquet(SF, columns=["doc_id", "text"]),
            jaccard_threshold=THRESH,
            ngram=NGRAM,
            verify_mode="distributed",
        )
    )
    bcast = _pairs_df(
        minhash_near_duplicates(
            rd.read_parquet(SF, columns=["doc_id", "text"]),
            jaccard_threshold=THRESH,
            ngram=NGRAM,
            verify_mode="broadcast",
        )
    )
    # the two verify paths must agree exactly (same candidates, same kernel)
    pd.testing.assert_frame_equal(dist, bcast)

    # vs the exact oracle: every reported pair is truly >= threshold with
    # the exact jaccard, and LSH recall on this corpus is high
    merged = dist.merge(oracle, on=["doc_a", "doc_b"], how="left",
                        suffixes=("", "_exact"))
    assert merged["jaccard_exact"].notna().all(), "reported pair not in oracle"
    np.testing.assert_allclose(merged["jaccard"], merged["jaccard_exact"],
                               rtol=0, atol=1e-12)
    recall = len(dist) / len(oracle)
    assert recall >= 0.9, f"LSH recall too low: {recall:.2f}"


def test_shingle_kernel_equals_set_kernel():
    """The numpy rolling-hash shingle set must define the same Jaccard as
    the plain set-of-substrings kernel (hash is injective in practice on
    these sizes; equality of SIZES of intersect/union is what matters)."""
    a = "the quick brown fox jumps over the lazy dog" * 3
    b = "the quick brown fox jumped over the lazy dogs" * 3
    sa, sb = _shingle_hashes(a, NGRAM), _shingle_hashes(b, NGRAM)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    assert abs(inter / union - jaccard_ngrams(a, b, NGRAM)) < 1e-12
