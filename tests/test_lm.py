"""Bigram-LM perplexity scoring (functions/lm.py) vs an exact oracle."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from arlas_proc_ray.functions.lm import (
    WORD_RE,
    BigramLM,
    perplexity_filter,
    perplexity_scores,
    train_bigram_lm,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog",
    "a cat a dog a mat",
    "the the the the",
]


def _oracle_model(texts, vocab_size, k):
    """Exact reference: pure-Python counting."""
    import re
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = re.findall(WORD_RE, t.lower())
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    top = [w for w, _ in sorted(uni.items(), key=lambda x: (-x[1], x[0]))[:vocab_size]]
    # note: train_bigram_lm breaks count ties by first-seen order via
    # nlargest; align by using counts only in assertions, not identity
    return uni, bi, top


def _oracle_ppl(text, model: BigramLM):
    import re

    vocab, uni, bi, k, V = model.logprob_params()
    toks = [w for w in re.findall(WORD_RE, text.lower())]
    ids = [vocab.get(t, V) for t in toks]
    if not ids:
        return float("nan")
    if len(ids) == 1:
        total = float(uni.sum())
        p = (uni[ids[0]] + k) / (total + k * (V + 1))
        return math.exp(-math.log(p))
    h = 0.0
    for a, b in zip(ids, ids[1:]):
        c12 = bi.get((a << 32) | b, 0)
        p = (c12 + k) / (uni[a] + k * (V + 1))
        h += -math.log(p)
    return math.exp(h / (len(ids) - 1))


def test_train_counts_match_reference(ray_session):
    ds = rd.from_items([{"text": t} for t in CORPUS]).repartition(3)
    m = train_bigram_lm(ds, vocab_size=100, k=0.5)
    uni, bi, _ = _oracle_model(CORPUS, 100, 0.5)
    # every token kept (vocab_size > distinct): counts must match exactly
    assert sum(m.uni[: m.V]) == sum(uni.values())
    for tok, c in uni.items():
        assert m.uni[m.vocab[tok]] == c
    for (a, b), c in bi.items():
        key = (m.vocab[a] << 32) | m.vocab[b]
        assert m.bi[key] == c
    assert m.uni[m.V] == 0  # no OOV mass when vocab covers everything


def test_scores_match_exact_oracle(ray_session):
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    m = train_bigram_lm(ds, vocab_size=100, k=0.5)
    scored = (
        perplexity_scores(ds, m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(CORPUS):
        assert scored.loc[i, "perplexity"] == pytest_approx(_oracle_ppl(t, m))


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12)


def test_oov_and_degenerate_docs(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": t} for t in CORPUS])
    m = train_bigram_lm(ds, vocab_size=3, k=0.5)  # tiny vocab → real OOV
    assert m.uni[m.V] > 0
    probe = ["zebra quux unseen words", "the", "", "the cat"]
    scored = perplexity_scores(
        rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(probe)])
    , m).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(probe):
        o = _oracle_ppl(t, m)
        g = scored.loc[i, "perplexity"]
        if math.isnan(o):
            assert math.isnan(g)
        else:
            assert g == pytest_approx(o)
    # (no plausibility ranking here: with a 3-token vocab the OOV
    # bucket soaks most mass and OOV→OOV is legitimately likely —
    # test_filter_keeps_plausible covers ranking with a real vocab)


def test_filter_keeps_plausible(ray_session):
    train = rd.from_items([{"text": t} for t in CORPUS * 10])
    m = train_bigram_lm(train, vocab_size=100, k=0.1)
    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},    # in-dist
        {"doc_id": 1, "text": "zzz qqq www xxx yyy vvv"},   # gibberish
    ]
    ds = rd.from_items(docs)
    both = perplexity_scores(ds, m).to_pandas().sort_values("doc_id")
    cut = float(both["perplexity"].mean())
    kept = perplexity_filter(ds, m, max_perplexity=cut).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_vocab_truncation_is_bounded(ray_session):
    """Model size is vocab_size-bounded however large the corpus."""
    ds = rd.from_items(
        [{"text": f"tok{i} tok{i + 1} tok{i + 2}"} for i in range(500)]
    )
    m = train_bigram_lm(ds, vocab_size=50, k=0.5)
    assert m.V == 50 and len(m.uni) == 51
    assert m.uni[m.V] > 0  # truncated tokens landed in OOV


def test_catalog_query_matches_python_oracle(ray_session):
    """The rows-only catalog entry's oracle: q_lm_perplexity at sf0.001
    equals training + scoring recomputed exactly in pure Python."""
    import pyarrow.parquet as pq

    from arlas_proc_ray.pipelines.queries import q_lm_perplexity

    sf = "/root/testdata/sf0.001"
    got = (
        q_lm_perplexity(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    ds = rd.from_pandas(docs)
    m = train_bigram_lm(ds, vocab_size=5000, k=0.5)
    assert len(got) == len(docs)
    for i in range(0, len(docs), 37):  # strided spot-exact (500-doc table)
        o = _oracle_ppl(docs.loc[i, "text"], m)
        g = got.loc[i, "perplexity"]
        assert g == pytest_approx(o)
