from arlas_proc_ray.ann.search import brute_force_topk, lsh_bucketed_topk

__all__ = ["brute_force_topk", "lsh_bucketed_topk"]
