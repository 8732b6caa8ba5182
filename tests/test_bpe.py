"""BPE training/encoding (functions/bpe.py) vs reference implementations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from arlas_proc_ray.functions.bpe import (
    EOW,
    BpeEncoder,
    bpe_token_count_column,
    train_bpe,
    with_bpe_token_count,
    word_frequencies,
)


def _naive_train(word_freqs: pd.DataFrame, num_merges: int):
    """Reference trainer: recount every pair from scratch each round."""
    words = [list(w) + [EOW] for w in word_freqs["word"].astype(str)]
    freqs = list(word_freqs["freq"])
    merges = []
    for _ in range(num_merges):
        counts = {}
        for seq, f in zip(words, freqs):
            for p in zip(seq, seq[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for wi, seq in enumerate(words):
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[wi] = out
    return merges


def test_sennrich_classic_example():
    """The canonical low/lower/newest/widest fixture: 'es' then 'est'
    are among the first merges (newest+widest share them at freq 9)."""
    wf = pd.DataFrame(
        {
            "word": ["low", "lower", "newest", "widest"],
            "freq": [5, 2, 6, 3],
        }
    )
    merges = train_bpe(wf, num_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    enc = BpeEncoder(merges)
    toks = enc.encode_word("newest")
    assert "".join(toks) == "newest" + EOW  # tokens tile the word


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1, max_size=12, unique=True,
    ),
    freqs=st.data(),
    n=st.integers(0, 12),
)
def test_incremental_trainer_matches_naive(words, freqs, n):
    f = [freqs.draw(st.integers(1, 9)) for _ in words]
    wf = pd.DataFrame({"word": words, "freq": f})
    assert train_bpe(wf, num_merges=n) == _naive_train(wf, n)


def test_encoder_tiles_and_caches():
    wf = pd.DataFrame({"word": ["banana", "bandana"], "freq": [3, 2]})
    merges = train_bpe(wf, num_merges=6)
    enc = BpeEncoder(merges)
    for w in ["banana", "bandana", "ban", "x"]:
        toks = enc.encode_word(w)
        assert "".join(toks) == w + EOW
    assert "banana" in enc._cache  # memoized


def test_distributed_word_frequencies(ray_session):
    docs = ["the cat the hat", "the bat", "cat cat"]
    ds = rd.from_items([{"text": t} for t in docs]).repartition(3)
    wf = word_frequencies(ds, max_words=10)
    want = {"the": 3, "cat": 3, "hat": 1, "bat": 1}
    assert dict(zip(wf["word"], wf["freq"])) == want
    # truncation keeps the most frequent; ties break lexicographically
    wf2 = word_frequencies(ds, max_words=2)
    assert list(wf2["word"]) == ["cat", "the"]


def test_token_count_column_matches_direct_encode(ray_session):
    docs = [
        "banana bandana ban",
        "",
        "banana banana",
    ]
    wf = pd.DataFrame({"word": ["banana", "bandana"], "freq": [3, 2]})
    merges = train_bpe(wf, num_merges=5)
    enc = BpeEncoder(merges)
    got = bpe_token_count_column(pd.Series(docs), BpeEncoder(merges))
    want = [len(enc.encode_text(t)) for t in docs]
    assert got.tolist() == want

    out = (
        with_bpe_token_count(
            rd.from_items(
                [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
            ),
            merges,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["bpe_tokens"].tolist() == want


def test_end_to_end_train_then_count(ray_session):
    """Train on the documents table, count tokens: monotone sanity —
    more merges never increase any document's token count."""
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    wf = word_frequencies(ds, max_words=2000)
    m_small = train_bpe(wf, num_merges=50)
    m_big = train_bpe(wf, num_merges=300)
    assert m_big[:50] == m_small  # merge list is a prefix chain
    a = (
        with_bpe_token_count(ds, m_small).to_pandas().sort_values("doc_id")
    )["bpe_tokens"].to_numpy()
    b = (
        with_bpe_token_count(ds, m_big).to_pandas().sort_values("doc_id")
    )["bpe_tokens"].to_numpy()
    assert (b <= a).all() and b.sum() < a.sum()
