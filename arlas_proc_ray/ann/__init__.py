from arlas_proc_ray.ann.search import brute_force_topk, lsh_bucketed_topk
from arlas_proc_ray.ann.ivf import ivf_topk, train_centroids
from arlas_proc_ray.ann.pq import (
    ivfpq_build,
    ivfpq_encode,
    ivfpq_topk,
    pq_encode,
    pq_topk,
    train_pq,
)

__all__ = [
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
    "train_centroids",
    "train_pq",
    "pq_encode",
    "pq_topk",
    "ivfpq_build",
    "ivfpq_encode",
    "ivfpq_topk",
]
