"""Conditional group-collapse — the hardest reference semantics (§2.5).

``FragmentSummaryTransformer`` collapses, within each group, only the rows
matching a predicate into ONE summary row while passing the rest through
unchanged. The reference needs a placeholder-row/flatMap/window trick for
this (documented at fragments/FragmentSummaryTransformer.scala:45-55,
:240-259, :291-309) because SQL windows can't emit "one row per group plus
the originals". ``map_groups`` does it naturally — no placeholder rows.

Implementation is partition-grouped and vectorized: ONE hash shuffle on the
entity key, then a pandas groupby-aggregate over all matching rows of the
partition at once, concatenated with the pass-through rows.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from arlas_proc_ray.stages.keyed import keyed_partition_map


def run_collapse_fn(
    keys: list[str],
    order_col: str,
    group_col: str,
    condition: Callable[[pd.DataFrame], pd.Series],
    agg: dict[str, tuple[str, str]],
    passthrough: bool = True,
):
    """Build a partition_fn collapsing condition-matching rows per group_col.

    ``agg``: {output_col: (source_col, how)} with how ∈ pandas agg names
    ('sum', 'min', 'max', 'mean', 'first', 'last', 'count').
    Weighted means (the reference's duration-weighted averages,
    FragmentSummaryTransformer.scala:262-271) are expressed by pre-computing
    a product column in an upstream map_batches and summing here.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        mask = condition(pdf).to_numpy(dtype=bool)
        matching = pdf[mask]
        rest = pdf[~mask] if passthrough else pdf.iloc[0:0]
        if len(matching) == 0:
            return rest

        gb = matching.groupby(group_col, sort=False)
        pieces = {}
        for out_col, spec in agg.items():
            src, how = spec[0], spec[1]
            if how == "wmean":
                # weighted average — the reference's duration-weighted
                # aggregates (FragmentSummaryTransformer.scala:262-271):
                # sum(src·w) / sum(w) per group
                weight_col = spec[2]
                num = (matching[src] * matching[weight_col]).groupby(
                    matching[group_col], sort=False
                ).sum()
                den = gb[weight_col].sum()
                pieces[out_col] = num / den.replace(0, np.nan)
            else:
                pieces[out_col] = gb[src].agg(how)
        summary = pd.DataFrame(pieces).reset_index()

        # propagate key columns (constant within a group) like the
        # reference's propagated columns (FragmentSummaryTransformer.scala:96-110)
        for k in keys:
            if k not in summary.columns:
                summary[k] = gb[k].first().values

        out = pd.concat([rest, summary], ignore_index=True, sort=False)
        sort_cols = [c for c in (*keys, order_col) if c in out.columns]
        return out.sort_values(sort_cols, kind="mergesort")

    return fn


def conditional_collapse(
    ds,
    *,
    keys: Sequence[str],
    order_col: str,
    group_col: str,
    condition: Callable[[pd.DataFrame], pd.Series],
    agg: dict[str, tuple[str, str]],
    passthrough: bool = True,
    num_partitions: int = 64,
):
    """Dataset-level conditional group-collapse (StopPauseSummary analogue).

    Reference instantiations of this abstract shape:
    - StopPauseSummaryTransformer: group=arlas_motion_id, cond=STILL
      (fragments/StopPauseSummaryTransformer.scala:42-111)
    - MovingFragmentSampleSummarizer: group=sample_id, cond=MOVE
      (features/MovingFragmentSampleSummarizer.scala:44-108)
    - CourseExtractorTransformer: group=course_id, cond=!STOP
      (fragments/CourseExtractorTransformer.scala:43-248)
    """
    keys = list(keys)
    return keyed_partition_map(
        ds,
        keys=keys,
        order_col=order_col,
        fn=run_collapse_fn(keys, order_col, group_col, condition, agg, passthrough),
        num_partitions=num_partitions,
    )


def elect_main_tempo(
    pdf: pd.DataFrame,
    proportion_map: dict[str, str],
    *,
    irregular_tempo: str = "tempo_irregular",
    target: str = "main_tempo",
    is_multi_col: str | None = "tempo_is_multi",
    significant: float = 0.1,
) -> pd.DataFrame:
    """Main-tempo election over (weight-averaged) proportion columns.

    Reference: FragmentSummaryTransformer.getMainTempo
    (fragments/FragmentSummaryTransformer.scala:343-364): the main tempo is
    the first (in map order) REGULAR tempo whose proportion equals the
    greatest regular proportion; all-zero regular proportions elect the
    irregular tempo. ``is_multi`` counts tempos with a significant (>0.1)
    proportion (:370-381) — multiple significant tempos ⇒ True.

    Vectorized: one numpy row-max + one equality scan per tempo column.
    NaN proportions (zero total weight) elect irregular (NaN == x is
    false for every column).
    """
    regular = {c: v for c, v in proportion_map.items() if v != irregular_tempo}
    n = len(pdf)
    main = np.full(n, irregular_tempo, dtype=object)
    if regular and n:
        mat = pdf[list(regular)].to_numpy(dtype=float)
        greatest = mat.max(axis=1)
        assigned = np.zeros(n, dtype=bool)
        for j, (col, value) in enumerate(regular.items()):
            hit = (~assigned) & (greatest != 0) & (mat[:, j] == greatest)
            main[hit] = value
            assigned |= hit
        # all-NaN rows: greatest is NaN, no column compares equal → irregular
    pdf[target] = main
    if is_multi_col is not None:
        count = np.zeros(n, dtype=np.int64)
        for col in proportion_map:
            count += (pdf[col].to_numpy(dtype=float) > significant).astype(
                np.int64
            )
        pdf[is_multi_col] = count > 1
    return pdf
