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
