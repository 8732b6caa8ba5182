"""N-gram language-model perplexity scoring — model-free quality filter.

The standard curation signal a 100-TB text pipeline needs that the rest
of the quality stack (length/punct/stopword ratios, repetition, lang-ID)
doesn't give: "how much does this document look like the reference
corpus?" — KenLM-style, but implemented from scratch on public math
(bigram LM, add-k smoothing; Chen & Goodman 1996 is the survey) with no
external model artifacts.

Two stages, both Ray-Data-first:

- **train_bigram_lm**: distributed token/bigram counting — per-batch
  pandas ``findall → explode → value_counts`` partials (the same
  vectorized shape as ``text.py:top_terms``), pre-aggregated BEFORE
  anything moves, folded on the driver into a bounded model: the top
  ``vocab_size`` unigrams keep identity, everything else collapses into
  one OOV bucket (so model size is a CONFIG constant, not a function of
  corpus size — at 100 TB the partials still fold because each batch
  contributes ≤ its distinct-token count, and the final model is a few
  MB broadcast once).
- **perplexity_scores / perplexity_filter**: ``ray.put`` the model once;
  each batch maps tokens → ids (one C-level dict ``Series.map``), looks
  bigram counts up via a single int64-packed key map, and computes
  cross-entropy / perplexity per document fully vectorized.

Smoothing: add-k over the (vocab_size+1)-way next-token distribution —
``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·(V+1))``. Documents score as
``ppl = exp(mean(-ln P))`` over their bigram transitions (empty/1-token
docs score the unigram distribution so they never divide by zero).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WORD_RE = r"[A-Za-z0-9_]+"


def _tokens_series(texts: pd.Series) -> pd.Series:
    """Lowercased word tokens per row (vectorized findall)."""
    return texts.astype(object).fillna("").str.lower().str.findall(WORD_RE)


def _partial_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch unigram and bigram partial counts (pre-aggregated)."""
    toks = _tokens_series(batch.column(text_col).to_pandas())
    flat = toks.explode().dropna()
    uni = flat.value_counts()
    # bigrams: adjacent pairs within each doc — shift the exploded frame
    # and keep pairs whose neighbour belongs to the same row index
    idx = flat.index.to_numpy()
    vals = flat.to_numpy(object)
    same = np.zeros(len(vals), dtype=bool)
    if len(vals) > 1:
        same[:-1] = idx[:-1] == idx[1:]
    w1 = vals[:-1][same[:-1]] if len(vals) else np.array([], object)
    w2 = vals[1:][same[:-1]] if len(vals) else np.array([], object)
    bi = pd.Series(1, index=pd.MultiIndex.from_arrays([w1, w2])).groupby(
        level=[0, 1]
    ).sum() if len(w1) else pd.Series(dtype=np.int64)

    out = {
        "w1": pa.array(
            list(uni.index) + [a for a, _ in bi.index], pa.string()
        ),
        "w2": pa.array(
            [None] * len(uni) + [b for _, b in bi.index], pa.string()
        ),
        "n": pa.array(
            list(uni.to_numpy(np.int64)) + list(bi.to_numpy(np.int64)),
            pa.int64(),
        ),
    }
    return pa.table(out)


class BigramLM:
    """Frozen model: vocab (top-K + OOV), unigram counts, packed bigrams."""

    def __init__(self, vocab: dict, uni: np.ndarray, bi: dict, k: float):
        self.vocab = vocab          # token -> id (0..V-1); OOV id = V
        self.uni = uni              # shape (V+1,) counts incl. OOV bucket
        self.bi = bi                # (id1 << 32 | id2) -> count
        self.k = float(k)
        self.V = len(vocab)

    def logprob_params(self):
        return self.vocab, self.uni, self.bi, self.k, self.V


def train_bigram_lm(
    ds,
    *,
    text_col: str = "text",
    vocab_size: int = 30_000,
    k: float = 0.5,
) -> BigramLM:
    """Count distributed, fold bounded, return the frozen model."""
    parts = ds.select_columns([text_col]).map_batches(
        lambda t: _partial_counts(t, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    # fold partials: unigram rows (w2 null) and bigram rows separately.
    # Driver holds ≤ Σ batch-distinct rows — pre-aggregation per batch
    # bounds it; the FINAL model is vocab_size-bounded regardless.
    frames = [b for b in parts.iter_batches(batch_size=None, batch_format="pandas")]
    cat = pd.concat(frames, ignore_index=True)
    uni_rows = cat[cat["w2"].isna()]
    uni = uni_rows.groupby("w1", sort=False)["n"].sum()
    top = uni.nlargest(vocab_size)
    vocab = {t: i for i, t in enumerate(top.index)}
    V = len(vocab)

    uni_counts = np.zeros(V + 1, dtype=np.int64)
    uni_counts[:V] = top.to_numpy(np.int64)
    uni_counts[V] = int(uni.sum() - top.sum())  # OOV bucket mass

    bi_rows = cat[cat["w2"].notna()]
    if len(bi_rows):
        g = bi_rows.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        i1 = g["w1"].map(vocab).fillna(V).astype(np.int64)
        i2 = g["w2"].map(vocab).fillna(V).astype(np.int64)
        packed = (i1.to_numpy() << np.int64(32)) | i2.to_numpy()
        folded = pd.Series(g["n"].to_numpy(np.int64)).groupby(packed).sum()
        bi = dict(zip(folded.index.astype(np.int64), folded.to_numpy(np.int64)))
    else:
        bi = {}
    return BigramLM(vocab, uni_counts, bi, k)


def _score_frame(
    texts: pd.Series, model: BigramLM
) -> np.ndarray:
    """Per-document perplexity, fully vectorized."""
    vocab, uni, bi, k, V = model.logprob_params()
    toks = _tokens_series(texts)
    flat = toks.explode().dropna()
    n_docs = len(texts)
    if not len(flat):
        return np.full(n_docs, np.nan)
    ids = flat.map(vocab).fillna(V).astype(np.int64)
    row = flat.index.to_numpy()
    idv = ids.to_numpy()
    same = np.zeros(len(idv), dtype=bool)
    if len(idv) > 1:
        same[:-1] = row[:-1] == row[1:]
    i1 = idv[:-1][same[:-1]] if len(idv) else np.array([], np.int64)
    i2 = idv[1:][same[:-1]] if len(idv) else np.array([], np.int64)
    pair_rows = row[:-1][same[:-1]] if len(idv) else np.array([], np.int64)

    denom_all = uni.astype(np.float64) + k * (V + 1)
    total = float(uni.sum())

    if len(i1):
        packed = (i1 << np.int64(32)) | i2
        c12 = pd.Series(packed).map(bi).fillna(0.0).to_numpy(np.float64)
        logp = np.log((c12 + k) / denom_all[i1])
        neg = -logp
        sums = np.zeros(n_docs, dtype=np.float64)
        cnts = np.zeros(n_docs, dtype=np.int64)
        np.add.at(sums, pair_rows, neg)
        np.add.at(cnts, pair_rows, 1)
    else:
        sums = np.zeros(n_docs, dtype=np.float64)
        cnts = np.zeros(n_docs, dtype=np.int64)

    # docs with <2 tokens: unigram cross-entropy (never NaN for 1 token)
    lone = cnts == 0
    if lone.any():
        uni_lp = np.log((uni.astype(np.float64) + k) / (total + k * (V + 1)))
        first_tok = np.full(n_docs, -1, dtype=np.int64)
        # first token id per doc (reverse put keeps the FIRST occurrence)
        first_tok[row[::-1]] = idv[::-1]
        has_tok = first_tok >= 0
        use = lone & has_tok
        sums[use] = -uni_lp[first_tok[use]]
        cnts[use] = 1
    out = np.exp(np.divide(sums, cnts, out=np.full(n_docs, np.nan), where=cnts > 0))
    return out


def perplexity_scores(
    ds,
    model: BigramLM,
    *,
    text_col: str = "text",
    target: str = "perplexity",
):
    """Append per-document perplexity under the broadcast model."""
    import ray

    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)  # plasma-local after first batch per worker
        ppl = _score_frame(batch.column(text_col).to_pandas(), m)
        return batch.append_column(target, pa.array(ppl, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def perplexity_filter(
    ds,
    model: BigramLM,
    *,
    text_col: str = "text",
    max_perplexity: float,
    target: str = "perplexity",
):
    """Keep documents the model finds plausible (ppl ≤ threshold)."""
    import pyarrow.compute as pc

    scored = perplexity_scores(ds, model, text_col=text_col, target=target)

    def keep(batch: pa.Table) -> pa.Table:
        col = batch.column(target)
        mask = pc.and_kleene(
            pc.is_valid(col), pc.less_equal(col, pa.scalar(max_perplexity))
        )
        return batch.filter(pc.fill_null(mask, False))

    return scored.map_batches(keep, batch_format="pyarrow", batch_size=None)
