"""MinHash-LSH / SimHash / n-gram-Jaccard near-duplicate detection.

Pipeline shape (the scale path — only band buckets shuffle):

  docs ─map_batches(MinHasher actor: shingle→minhash→bands)─▶
       flat rows (band_id, band_hash, doc_id)
       ─groupby(band_id, band_hash)─▶ candidate pairs (per tiny bucket)
       ─map_batches(Jaccard verify against broadcast texts*)─▶ dup pairs

(*) at test scale texts are broadcast; at corpus scale verification joins
the pair list back to content by doc-id hash partition instead.

MinHash signatures use the standard (a·x + b) mod p universal hash family
with fixed seeds — deterministic everywhere. Shingles are character
n-grams of the lowercased text (robust to tokenization).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """64-bit hashes of all char n-grams (via blake2b of each shingle)."""
    t = text.lower()
    if len(t) < n:
        t = t.ljust(n)
    out = np.empty(len(t) - n + 1, dtype=np.uint64)
    for i in range(len(t) - n + 1):
        h = hashlib.blake2b(t[i : i + n].encode("utf-8"), digest_size=8).digest()
        out[i] = np.frombuffer(h, dtype=np.uint64)[0]
    return np.unique(out)


class MinHasher:
    """Actor-pool stage: text → minhash signature → LSH band rows.

    Coefficients generated once per actor in ``__init__`` from a fixed
    seed (the load-state-once pattern, model/MLModel.scala:30-35).
    Emits one row per (doc, band): (band_id, band_hash, doc_id).
    """

    def __init__(
        self,
        num_perm: int = 128,
        ngram: int = 5,
        bands: int = 32,
        seed: int = 1337,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.ngram)
        with np.errstate(over="ignore"):
            # (a * x + b) mod Mersenne61, broadcast perm × shingle
            prod = self.a[:, None] * sh[None, :] + self.b[:, None]
            hashed = (prod & _MERSENNE) + (prod >> np.uint64(61))
            hashed = np.where(hashed >= _MERSENNE, hashed - _MERSENNE, hashed)
        return hashed.min(axis=1)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        view = sig.reshape(self.bands, self.rows_per_band)
        out = np.empty(self.bands, dtype=np.uint64)
        for b in range(self.bands):
            digest = hashlib.blake2b(view[b].tobytes(), digest_size=8).digest()
            out[b] = np.frombuffer(digest, dtype=np.uint64)[0]
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            if not text:
                continue
            bh = self.band_hashes(self.signature(text))
            ids.extend([doc_id] * self.bands)
            band_ids.extend(range(self.bands))
            band_hashes.extend(bh.tolist())
        return pd.DataFrame(
            {
                "band_id": np.array(band_ids, dtype=np.int32),
                "band_hash": np.array(band_hashes, dtype=np.uint64),
                "doc_id": np.array(ids, dtype=np.int64),
            }
        )


def jaccard_ngrams(a: str, b: str, n: int = 5) -> float:
    """Exact character-n-gram Jaccard similarity (the verify kernel)."""
    sa, sb = set(), set()
    a, b = a.lower(), b.lower()
    for i in range(max(1, len(a) - n + 1)):
        sa.add(a[i : i + n])
    for i in range(max(1, len(b) - n + 1)):
        sb.add(b[i : i + n])
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_near_duplicates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    ngram: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency: int = 2,
    max_bucket_size: int = 64,
):
    """Near-duplicate pairs (doc_a < doc_b, verified Jaccard ≥ threshold).

    Returns a Dataset of (doc_a, doc_b, jaccard). Verification broadcasts
    the (id → text) map via ``ray.put`` — suitable while the doc set fits
    the object store; the band-bucket candidate generation is the part that
    scales to corpus size.

    ``max_bucket_size`` guards against degenerate buckets (highly templated
    corpora can put hundreds of docs in one band bucket → O(n²) pair
    blow-up). An oversized bucket keeps only its first ``max_bucket_size``
    doc ids (sorted — deterministic); true near-dups dropped here are still
    caught by the other bands with overwhelming probability.
    """
    import ray

    texts = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        texts.update(zip(b[id_col], b[text_col]))
    texts_ref = ray.put(texts)

    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "ngram": ngram,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one LSH bucket: all docs sharing (band_id, band_hash)
        ids = np.unique(pdf["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64)}
            )
        if len(ids) > max_bucket_size:  # degenerate-bucket guard
            ids = ids[:max_bucket_size]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    from arlas_proc_ray.stages.keyed import keyed_partition_map

    raw_pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # dedup (doc_a, doc_b) across bands: vectorized per hash partition —
    # NEVER one Python call per pair
    candidates = keyed_partition_map(
        raw_pairs,
        keys=["doc_a", "doc_b"],
        order_col="doc_b",
        fn=lambda pdf: pdf.drop_duplicates(subset=["doc_a", "doc_b"]),
        num_partitions=16,
    )

    # Verify is a STATELESS task (not a second actor pool): two pools in one
    # streaming pipeline reserve CPUs simultaneously and can starve the
    # shuffle between them on small machines. ray.get of the broadcast map
    # is a cheap local object-store read per task.
    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        texts_map = ray.get(texts_ref)
        sims = [
            jaccard_ngrams(texts_map[a], texts_map[b], ngram)
            for a, b in zip(batch["doc_a"], batch["doc_b"])
        ]
        batch["jaccard"] = sims
        return batch[batch["jaccard"] >= jaccard_threshold]

    return candidates.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str, ngram: int = 4) -> int:
    """64-bit SimHash over char n-gram features (deterministic)."""
    sh = _shingle_hashes(text, ngram)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_column(ds, *, text_col: str = "text", target: str = "simhash",
                   ngram: int = 4, concurrency: int = 2):
    class SimHasher:
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch[target] = np.array(
                [simhash64(t or "", ngram) for t in batch[text_col]], dtype=np.uint64
            )
            return batch

    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=concurrency)
