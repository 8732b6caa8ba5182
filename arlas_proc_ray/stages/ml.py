"""Stateful model-scoring stages: HMM Viterbi state decoding.

Mirror of the reference's HMM surface
(/root/reference/src/main/scala/io/arlas/data/transform/ml/HmmProcessor.scala:46-160,
ml/WithMovingState.scala:39-76, ml/WithTempo.scala:40-67): a model JSON
(states, bin_edges, initial/emission/transition probabilities — format as in
/root/reference/src/test/resources/hmm_stillmove_model.json) is loaded ONCE
(MLModelLocal, model/MLModel.scala:30-35); per-key observation sequences are
chunked into windows of ``window_size``=5000 (HmmProcessor.scala:46) and
decoded with Viterbi; predictions re-align positionally (we avoid the
reference's synthetic-unique-id re-join, HmmProcessor.scala:143-146, because
decoding happens inside the per-key group where alignment is free).

Ray mapping: the model is parsed in the callable's ``__init__`` (once per
actor) and the stage runs as a ``keyed_partition_map`` so each partition
decodes all of its keys; the observation→bin quantization is vectorized,
only the Viterbi recursion is per-window (tiny S×S numpy ops per step).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


class HmmModel:
    """Parsed HMM: discrete emissions over value bins."""

    def __init__(self, spec: dict):
        self.states: list[str] = list(spec["states"])
        self.bin_edges = np.asarray(spec["bin_edges"], dtype=np.float64)
        self.log_init = np.log(np.asarray(spec["initial"], dtype=np.float64) + 1e-300)
        self.log_trans = np.log(
            np.asarray(spec["transition"], dtype=np.float64) + 1e-300
        )
        self.log_emit = np.log(np.asarray(spec["emission"], dtype=np.float64) + 1e-300)

    @classmethod
    def from_json(cls, path_or_str: str) -> "HmmModel":
        if path_or_str.lstrip().startswith("{"):
            return cls(json.loads(path_or_str))
        with open(path_or_str) as f:
            return cls(json.load(f))

    def quantize(self, obs: np.ndarray) -> np.ndarray:
        """Observation values → emission-bin indices (vectorized)."""
        idx = np.searchsorted(self.bin_edges, obs, side="right") - 1
        return np.clip(idx, 0, self.log_emit.shape[1] - 1)

    def viterbi(self, bins: np.ndarray) -> np.ndarray:
        """Most likely state sequence for one window of bin indices."""
        T = len(bins)
        S = len(self.states)
        delta = self.log_init + self.log_emit[:, bins[0]]
        back = np.empty((T, S), dtype=np.int8)
        for t in range(1, T):
            cand = delta[:, None] + self.log_trans  # (S_prev, S_next)
            back[t] = np.argmax(cand, axis=0)
            delta = cand[back[t], np.arange(S)] + self.log_emit[:, bins[t]]
        path = np.empty(T, dtype=np.int8)
        path[-1] = int(np.argmax(delta))
        for t in range(T - 1, 0, -1):
            path[t - 1] = back[t, path[t]]
        return path


def hmm_decode_fn(
    keys: list[str],
    obs_col: str,
    model_json: str,
    target: str,
    window_size: int = 5000,
    explode_arrays: bool = False,
):
    """Partition fn: decode every key's sequence, windowed at 5000 rows.

    The 5000-row window cap is kept for parity with the reference
    (HmmProcessor.scala:46) — it bounds per-window memory, and windows of
    one key decode independently exactly as there.

    ``explode_arrays=True`` is the reference's array-source mode
    (HmmProcessor.scala:134-140): each row's DoubleType-array elements are
    exploded into the window's observation sequence in row order, decoded
    as one Viterbi run, and the row's state is the MAJORITY VOTE of its
    elements' predictions. Ties elect the lowest state index
    (deterministic; the reference's row_number-over-count tie-break is
    arbitrary). Rows with empty/null arrays get a null state (they vanish
    in the reference's explode and come back null through its left join).
    Scalar mode fills null observations with 0.0 (HmmProcessor.scala:118).
    """
    model = HmmModel.from_json(model_json)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        # contiguous key runs (pdf sorted by keys+order)
        key_codes = pd.factorize(
            pd.Series(list(zip(*(pdf[k] for k in keys))), index=pdf.index),
            use_na_sentinel=False,
        )[0] if len(keys) > 1 else pd.factorize(pdf[keys[0]], use_na_sentinel=False)[0]
        boundaries = np.flatnonzero(np.diff(key_codes)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [n]])
        states = np.asarray(model.states, dtype=object)

        if not explode_arrays:
            bins_all = model.quantize(
                pdf[obs_col].fillna(0.0).to_numpy(dtype=np.float64)
            )
            preds = np.empty(n, dtype=np.int8)
            for s, e in zip(starts, ends):
                for w in range(s, e, window_size):
                    we = min(w + window_size, e)
                    preds[w:we] = model.viterbi(bins_all[w:we])
            pdf[target] = states[preds]
            return pdf

        vals = pdf[obs_col].to_numpy()
        lens = np.fromiter(
            (0 if v is None else len(v) for v in vals), np.int64, count=n
        )
        flat = (
            np.concatenate(
                [np.asarray(v, np.float64) for v in vals if v is not None and len(v)]
            )
            if int(lens.sum())
            else np.empty(0, np.float64)
        )
        bins_flat = model.quantize(np.nan_to_num(flat))
        flat_starts = np.concatenate([[0], np.cumsum(lens)])
        S = len(model.states)
        out = np.full(n, None, dtype=object)
        for s, e in zip(starts, ends):
            for w in range(s, e, window_size):
                we = min(w + window_size, e)
                fs, fe = int(flat_starts[w]), int(flat_starts[we])
                if fe == fs:
                    continue  # all-empty rows stay null
                path = model.viterbi(bins_flat[fs:fe])
                ridx = np.repeat(np.arange(w, we), lens[w:we]) - w
                counts = np.zeros((we - w, S), np.int64)
                np.add.at(counts, (ridx, path), 1)
                vote = counts.argmax(axis=1)
                nonempty = lens[w:we] > 0
                idx = np.arange(w, we)[nonempty]
                out[idx] = states[vote[nonempty]]
        pdf[target] = out
        return pdf

    return fn


def with_hmm_states(
    ds,
    *,
    keys,
    order_col,
    obs_col,
    model_json: str,
    target: str = "hmm_state",
    window_size: int = 5000,
    num_partitions: int = 64,
    explode_arrays: bool = False,
):
    """WithMovingState / WithTempo analogue over any numeric observation.

    ``explode_arrays=True`` scores a list<double> observation column via
    the reference's explode + majority-vote mode (HmmProcessor.scala:134-140).
    """
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=hmm_decode_fn(
            keys, obs_col, model_json, target, window_size, explode_arrays
        ),
        num_partitions=num_partitions,
    )


# A small still/move-style model over the events `value` column, analogous
# to the reference's fixture /root/reference/src/test/resources/
# hmm_stillmove_model.json (states, bin edges, init/emission/transition).
STILLMOVE_MODEL_JSON = json.dumps(
    {
        "states": ["STILL", "MOVE"],
        "bin_edges": [0.0, 10.0, 30.0, 80.0, 1e9],
        "initial": [0.6, 0.4],
        "transition": [[0.8, 0.2], [0.2, 0.8]],
        "emission": [
            [0.55, 0.30, 0.10, 0.05],
            [0.05, 0.15, 0.35, 0.45],
        ],
    }
)


# Tempo-style model over inter-observation DURATION (seconds), analogous to
# the reference fixture /root/reference/src/test/resources/hmm_tempo_model.json
# used by WithTempo (ml/WithTempo.scala:40-67).
TEMPO_MODEL_JSON = json.dumps(
    {
        "states": ["tempo_fast", "tempo_medium", "tempo_slow"],
        "bin_edges": [0.0, 3600.0, 43200.0, 1e18],
        "initial": [0.34, 0.33, 0.33],
        "transition": [
            [0.8, 0.15, 0.05],
            [0.15, 0.7, 0.15],
            [0.05, 0.15, 0.8],
        ],
        "emission": [
            [0.8, 0.15, 0.05],
            [0.1, 0.8, 0.1],
            [0.05, 0.15, 0.8],
        ],
    }
)


def with_tempo(
    ds,
    *,
    keys,
    order_col,
    ts_col,
    model_json: str = TEMPO_MODEL_JSON,
    target: str = "tempo",
    irregular_label: str = "tempo_irregular",
    num_partitions: int = 64,
    window_size: int = 5000,
):
    """WithTempo analogue (ml/WithTempo.scala:40-67): HMM over per-key
    inter-observation durations; rows with NO duration (each key's first
    observation) get the ``irregular`` label — the reference's null →
    irregular fill (`WithTempo.scala:60-64`)."""
    keys = list(keys)
    model = HmmModel.from_json(model_json)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        delta = pdf[ts_col] - g[ts_col].shift(1)
        dur = (
            delta.dt.total_seconds()
            if hasattr(delta, "dt") and hasattr(delta.dt, "total_seconds")
            else delta
        )
        first = dur.isna()
        bins = model.quantize(dur.fillna(0.0).to_numpy(np.float64))
        preds = np.empty(len(pdf), dtype=np.int8)
        # composite keys: boundaries on the FULL key tuple, not keys[0] —
        # else the HMM decodes across distinct entities sharing keys[0]
        codes = (
            pd.factorize(
                pd.Series(list(zip(*(pdf[k] for k in keys))), index=pdf.index),
                use_na_sentinel=False,
            )[0]
            if len(keys) > 1
            else pd.factorize(pdf[keys[0]], use_na_sentinel=False)[0]
        )
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pdf)]])
        # 5000-row window cap per key for parity with the reference
        # (HmmProcessor.scala:46) — bounds per-key decode memory
        for s, e in zip(starts, ends):
            for w in range(s, e, window_size):
                we = min(w + window_size, e)
                preds[w:we] = model.viterbi(bins[w:we])
        labels = np.asarray(model.states)[preds].astype(object)
        labels[first.to_numpy()] = irregular_label
        pdf[target] = labels
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )
