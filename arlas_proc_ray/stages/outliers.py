"""Outlier family (SURVEY.md §2.2/2.4 filter/* operators).

- ``with_rolling_median_outlier`` (Hampel detection) lives in keyed.py;
- ``without_identified_outliers``: drop flagged rows, then drop the flag
  column (filter/WithoutIdentifiedOutliers.scala:31-40);
- ``with_outlier_propagated``: smooth the outlier mask with lag/lead ±k —
  rows BETWEEN two outliers within the window are filled in, and isolated
  "return points" are detected (filter/WithOutlierPropagated.scala:40-87);
- ``outliers_to_store``: keep ONLY outliers, each with a 3-point
  (prev, cur, next) trail for audit storage
  (filter/WithOutliersToStore.scala:38-97);
- ``with_geo_distance_m``: geodesic distance to the previous point per key
  (features/WithGeoDistanceMeters.scala:38-74) — lag + the vectorized
  haversine kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from arlas_proc_ray.functions.geo import haversine_m, wkt_linestring
from arlas_proc_ray.stages.keyed import keyed_partition_map


def without_identified_outliers(ds, flag_col: str = "is_outlier"):
    """Keep non-outliers; drop the flag column."""

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.equal(t.column(flag_col), pa.scalar(False)), True)
        return t.filter(mask).drop_columns([flag_col])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def outlier_propagate_fn(keys: list[str], flag_col: str, reach: int = 3,
                         target: str = "is_outlier_smoothed"):
    """Fill the gap between two outliers ≤ 2·reach rows apart (per key)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        flags = pdf[flag_col].fillna(False).astype(bool)
        # forward/backward proximity to an outlier within ``reach`` rows
        fwd = flags.groupby([pdf[k] for k in keys], sort=False).transform(
            lambda s: s.rolling(reach + 1, min_periods=1).max()
        )
        bwd = flags.groupby([pdf[k] for k in keys], sort=False).transform(
            lambda s: s[::-1].rolling(reach + 1, min_periods=1).max()[::-1]
        )
        pdf[target] = (fwd.astype(bool) & bwd.astype(bool)) | flags
        return pdf

    return fn


def with_outlier_propagated(ds, *, keys, order_col, flag_col="is_outlier",
                            reach=3, num_partitions=64):
    keys = list(keys)
    return keyed_partition_map(
        ds, keys=keys, order_col=order_col,
        fn=outlier_propagate_fn(keys, flag_col, reach),
        num_partitions=num_partitions,
    )


def outliers_to_store_fn(keys: list[str], flag_col: str,
                         lat_col: str | None = None, lon_col: str | None = None,
                         value_col: str | None = None):
    """Keep only outliers; attach a (prev, cur, next) context trail.

    With lat/lon columns the trail is a WKT 3-point LINESTRING (reference
    behavior); without them, numeric context columns prev/next of
    ``value_col`` are attached instead.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        flags = pdf[flag_col].fillna(False).astype(bool)
        if lat_col and lon_col:
            pla, plo = g[lat_col].shift(1), g[lon_col].shift(1)
            nla, nlo = g[lat_col].shift(-1), g[lon_col].shift(-1)
            out = pdf[flags.values].copy()
            trails = []
            for i in out.index:
                la = [x for x in (pla[i], pdf[lat_col][i], nla[i]) if pd.notna(x)]
                lo = [x for x in (plo[i], pdf[lon_col][i], nlo[i]) if pd.notna(x)]
                trails.append(wkt_linestring(la, lo))
            out["trail"] = trails
            return out
        assert value_col is not None
        prev_v, next_v = g[value_col].shift(1), g[value_col].shift(-1)
        out = pdf[flags.values].copy()
        out["prev_value"] = prev_v[flags.values].values
        out["next_value"] = next_v[flags.values].values
        return out

    return fn


def with_geo_distance_m(ds, *, keys, order_col, lat_col, lon_col,
                        target="distance_m", num_partitions=64):
    """Geodesic distance to the previous observation of the same key."""
    keys = list(keys)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(keys, sort=False)
        pla, plo = g[lat_col].shift(1), g[lon_col].shift(1)
        d = haversine_m(
            pla.to_numpy(np.float64),
            plo.to_numpy(np.float64),
            pdf[lat_col].to_numpy(np.float64),
            pdf[lon_col].to_numpy(np.float64),
        )
        d[pla.isna().to_numpy()] = np.nan
        pdf[target] = d
        return pdf

    return keyed_partition_map(
        ds, keys=keys, order_col=order_col, fn=fn, num_partitions=num_partitions
    )
