import pandas as pd
import ray.data as rd

from arlas_proc_ray.dedup.pipeline import dedup_documents


def test_dedup_documents_end_to_end():
    base = (
        "def compute(x):\n    return x * 2\n\n"
        "def main():\n    for i in range(100):\n        print(compute(i))\n"
    ) * 4
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                base,                        # representative
                base,                        # exact duplicate of 1
                base + "# trailing comment", # near-dup of 1
                "completely different text about data pipelines and arrow",
                "another unrelated document discussing benchmarks only",
                base.replace("compute", "compute2"),  # near-dup of 1
            ],
        }
    )
    survivors, stats = dedup_documents(
        rd.from_pandas(docs), jaccard_threshold=0.7, num_partitions=2
    )
    out = survivors.to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert stats["input_docs"] == 6
    assert stats["after_exact"] == 5  # doc 2 dropped (byte-identical)
    assert stats["near_dup_losers"] >= 2  # docs 3 and 6 fold into 1
    ids = set(out["doc_id"])
    assert 1 in ids and 4 in ids and 5 in ids
    assert 2 not in ids and 3 not in ids and 6 not in ids
    # the representative carries its cluster id; singletons carry null
    rep = out[out.doc_id.eq(1)].iloc[0]
    assert rep["dup_cluster_id"] == 1
    assert pd.isna(out[out.doc_id.eq(4)].iloc[0]["dup_cluster_id"])


def test_dedup_documents_on_real_corpus():
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    survivors, stats = dedup_documents(ds, jaccard_threshold=0.5, num_partitions=4)
    n = survivors.count()
    assert 0 < n <= stats["after_exact"] <= stats["input_docs"] == 500
    assert n == stats["after_exact"] - stats["near_dup_losers"]


def test_curation_pipeline_end_to_end():
    """Full curation chain on the real corpus: stage counts are monotone,
    survivors are unique, drops are attributable to a stage, and the
    token budget equals the survivors' token sum."""
    import ray.data as rd

    from arlas_proc_ray.pipelines.curation import CurationConfig, curate_documents

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    survivors, stats = curate_documents(
        ds,
        CurationConfig(
            min_tokens=5, max_punct_ratio=0.3, min_mean_token_len=2.0,
            languages=("en", "fr", "de", "es", "unknown"),
            jaccard_threshold=0.5, num_partitions=4,
        ),
    )
    pdf = survivors.to_pandas()
    assert stats["input_docs"] == 500
    assert (
        stats["input_docs"]
        >= stats["after_quality"]
        >= stats["after_language"]
        >= stats["after_exact_dedup"]
        >= stats["surviving_docs"]
        > 0
    )
    assert stats["surviving_docs"] == len(pdf)
    assert pdf["doc_id"].is_unique
    assert stats["surviving_tokens"] == int(pdf["n_tokens"].sum())
    assert stats["surviving_docs"] == stats["after_exact_dedup"] - stats["near_dup_losers"]
    # survivors carry the full per-doc annotation set
    for col in ("n_tokens", "punct_ratio", "lang_pred", "dup_cluster_id"):
        assert col in pdf.columns


def test_curation_with_perplexity_gate():
    """max_perplexity: a self-trained LM gate sits between language and
    dedup; its stage count is monotone and survivors all pass it."""
    import ray.data as rd

    from arlas_proc_ray.functions.lm import perplexity_scores, train_bigram_lm
    from arlas_proc_ray.pipelines.curation import CurationConfig, curate_documents

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    cfg = CurationConfig(
        min_tokens=5, max_punct_ratio=0.3, min_mean_token_len=2.0,
        jaccard_threshold=0.5, num_partitions=4,
        max_perplexity=5_000.0, lm_vocab_size=5_000,
    )
    survivors, stats = curate_documents(ds, cfg)
    assert (
        stats["after_language"]
        >= stats["after_perplexity"]
        >= stats["surviving_docs"]
        > 0
    )
    # every survivor passes the gate under a freshly trained equivalent
    # model? (the model is stream-dependent; assert via the recorded
    # stage count rather than re-deriving it)
    assert stats["after_perplexity"] <= stats["after_language"]
    assert survivors.count() == stats["surviving_docs"]


def test_curation_with_mixture_stage():
    """mixture_weights: a token-weighted domain-mixture resample runs
    LAST (over dedup survivors); the result is a deterministic subset of
    the unmixed survivors with the target mixture's token shares."""
    import ray.data as rd

    from arlas_proc_ray.pipelines.curation import (
        CurationConfig,
        curate_documents,
    )

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    base_cfg = dict(
        min_tokens=5, max_punct_ratio=0.3, min_mean_token_len=2.0,
        languages=("en", "fr", "unknown"),
        jaccard_threshold=0.5, num_partitions=4,
    )
    plain, _ = curate_documents(ds, CurationConfig(**base_cfg))
    mixed, stats = curate_documents(
        ds,
        CurationConfig(**base_cfg,
                       mixture_weights={"en": 70, "unknown": 30}),
    )
    p = plain.to_pandas()
    m = mixed.to_pandas()
    assert set(m["doc_id"]) <= set(p["doc_id"])  # subset of survivors
    assert set(m["lang_pred"]) <= {"en", "unknown"}  # unweighted drop
    assert stats["mixture_docs"] == len(m)
    assert stats["mixture_tokens"] == int(m["n_tokens"].sum())
    assert stats["mixture_tokens"] <= stats["surviving_tokens"]
    # token shares near 70/30 (hash-binomial acceptance)
    shares = m.groupby("lang_pred")["n_tokens"].sum() / m["n_tokens"].sum()
    assert abs(shares.get("en", 0) - 0.7) < 0.2
    assert abs(shares.get("unknown", 0) - 0.3) < 0.2
