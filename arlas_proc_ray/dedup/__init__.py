"""Deduplication family for training-data curation at corpus scale.

- ``exact``: sha256(content) hash-partition + per-group keep-first — the
  CDC dedup primitive reused on documents.
- ``minhash``: shingle → minhash → LSH banding → band-bucket groupby →
  candidate pairs → Jaccard verify. Sketches are mergeable; the only
  shuffle is on (band_id, band_hash) buckets.
- ``simhash``: 64-bit simhash signature; near-dups = small Hamming
  distance within bucket.
- ``ngram_jaccard``: exact n-gram Jaccard verification kernel.
"""

from arlas_proc_ray.dedup.exact import exact_dedup, with_text_sha256
from arlas_proc_ray.dedup.minhash import (
    MinHasher,
    jaccard_ngrams,
    minhash_near_duplicates,
    simhash64,
    simhash_column,
)

__all__ = [
    "exact_dedup",
    "with_text_sha256",
    "MinHasher",
    "minhash_near_duplicates",
    "jaccard_ngrams",
    "simhash64",
    "simhash_column",
]
