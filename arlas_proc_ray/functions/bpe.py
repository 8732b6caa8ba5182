"""BPE tokenizer training + encoding as pipeline operators.

The real thing, not the regex approximation (`text.py:regex_token_count`
pre-tokenizes GPT-2-style but counts words): byte-pair-encoding merges
learned from the corpus (Sennrich, Haddow & Birch 2016 — the public
algorithm every modern tokenizer descends from) and an encoder that
applies them.

Scale shape — the insight that makes BPE trainable at 100 TB is that
training NEVER touches documents after one pass: it runs on the WORD
FREQUENCY table.

- **word_frequencies**: one distributed counting pass (per-batch
  ``findall → explode → value_counts`` partials, pre-aggregated before
  anything moves), folded and truncated to ``max_words`` — a few
  hundred thousand rows however big the corpus.
- **train_bpe**: the merge loop runs on that compact table on the
  driver (the standard implementation shape): count adjacent symbol
  pairs weighted by word frequency, merge the most frequent pair
  (deterministic lexicographic tie-break), repeat. Incremental pair-
  count maintenance — only words CONTAINING the merged pair are
  re-counted per round — keeps ``num_merges`` rounds near-linear.
- **BpeEncoder / bpe_token_count_column**: encoding state (merge ranks
  + a per-distinct-word memo cache) builds once per actor/worker; the
  per-word merge loop is the classic lowest-rank-pair reduction, and
  the cache means each DISTINCT word pays it once per worker.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

WORD_RE = r"[A-Za-z0-9_]+"
EOW = "▁"  # end-of-word sentinel (SentencePiece's ▁, public convention)


def word_frequencies(
    ds, *, text_col: str = "text", max_words: int = 100_000
) -> pd.DataFrame:
    """Distributed word-frequency table (word, freq), truncated to the
    ``max_words`` most frequent (ties broken lexicographically)."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().astype(object).fillna("")
        words = s.str.lower().str.findall(WORD_RE).explode().dropna()
        vc = words.value_counts()
        return pa.table(
            {
                "word": pa.array(list(vc.index), pa.string()),
                "freq": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    frames = list(parts.iter_batches(batch_size=None, batch_format="pandas"))
    cat = pd.concat(frames, ignore_index=True)
    folded = cat.groupby("word", sort=False)["freq"].sum().reset_index()
    folded = folded.sort_values(
        ["freq", "word"], ascending=[False, True], kind="mergesort"
    ).head(max_words)
    return folded.reset_index(drop=True)


def train_bpe(
    word_freqs: pd.DataFrame, *, num_merges: int = 1000
) -> list[tuple[str, str]]:
    """Learn merge rules from a (word, freq) table — pure, deterministic.

    Returns the ordered merge list; rank = position. Incremental: pair
    counts update only for words containing the merged pair.
    """
    words: list[list[str]] = [
        list(w) + [EOW] for w in word_freqs["word"].astype(str)
    ]
    freqs = word_freqs["freq"].to_numpy(np.int64)

    # pair -> total freq, and pair -> set of word indexes containing it
    pair_count: dict = {}
    pair_words: dict = {}

    def add_word_pairs(wi: int, sign: int):
        seq = words[wi]
        f = int(freqs[wi]) * sign
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_count[p] = pair_count.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = {p: c for p, c in pair_count.items() if c > 0}
        if not live:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        for wi in sorted(pair_words.get(best, ())):
            seq = words[wi]
            if best not in zip(seq, seq[1:]):
                continue
            add_word_pairs(wi, -1)  # retract old pairs
            out = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[wi] = out
            add_word_pairs(wi, +1)  # assert new pairs
        pair_count.pop(best, None)
        pair_words.pop(best, None)
    return merges


class BpeEncoder:
    """Apply learned merges; per-distinct-word memo cache."""

    def __init__(self, merges: Sequence[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict = {}

    def encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        seq = list(word) + [EOW]
        ranks = self.ranks
        while len(seq) > 1:
            # classic reduction: merge the lowest-rank adjacent pair
            best_rank = None
            best_i = -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
        self._cache[word] = seq
        return seq

    def encode_text(self, text: str) -> list[str]:
        import re

        out: list[str] = []
        for w in re.findall(WORD_RE, text.lower()):
            out.extend(self.encode_word(w))
        return out


def bpe_token_count_column(
    texts: pd.Series, encoder: BpeEncoder
) -> np.ndarray:
    """Per-document BPE token counts — findall once, then one cached
    ``len(encode_word)`` per distinct word via a map built from the
    batch's OWN vocabulary (never a per-token Python call)."""
    words = texts.astype(object).fillna("").str.lower().str.findall(WORD_RE)
    flat = words.explode().dropna()
    if not len(flat):
        return np.zeros(len(texts), dtype=np.int64)
    distinct = pd.unique(flat)
    lens = {w: len(encoder.encode_word(w)) for w in distinct}
    tok_lens = flat.map(lens).to_numpy(np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    np.add.at(out, flat.index.to_numpy(), tok_lens)
    return out


def with_bpe_token_count(
    ds,
    merges: Sequence[tuple[str, str]],
    *,
    text_col: str = "text",
    target: str = "bpe_tokens",
):
    """Append per-document BPE token counts; encoder state (ranks +
    word cache) builds once per worker process, not once per batch."""
    merges = [tuple(m) for m in merges]
    holder: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        enc = holder.get("enc")
        if enc is None:
            enc = holder["enc"] = BpeEncoder(merges)
        counts = bpe_token_count_column(
            batch.column(text_col).to_pandas(), enc
        )
        return batch.append_column(target, pa.array(counts, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
