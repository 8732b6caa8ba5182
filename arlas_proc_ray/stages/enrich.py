"""External-service enrichment stages (actor pools with injectable clients).

Reference surface: WithGeoData (reverse geocoding,
features/WithGeoData.scala:46-138) and WithRoutingData (route refinement,
features/WithRoutingData.scala:45-112) — REST clients held lazily per
executor, conditional application, and a documented failure policy
(utils/RestTool.scala): connection-level failures (unknown host / timeout)
ABORT the job, any other per-record failure yields null and the pipeline
continues (RestTool.scala:39-45, 61-73).

Ray mapping: a callable class → actor pool; the client is built ONCE per
actor in ``__init__`` from a picklable factory; batches fan out over a
small ``batch_size`` (each row may be a network call). This environment has
no network, so the default client is ``DeterministicFakeClient`` — the
actor/batch/failure plumbing is real and tested; a requests/httpx-backed
client plugs into the same factory seam.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import pandas as pd


class EnrichmentAbort(RuntimeError):
    """Connection-level failure — aborts the job (RestTool.scala:61-73)."""


class DeterministicFakeClient:
    """Offline stand-in for a geocoding-style REST service.

    Deterministic: the response is derived from the request key's hash.
    ``fail_connection_for`` / ``fail_record_for`` let tests exercise both
    failure policies.
    """

    CITIES = ["alphaville", "betatown", "gammaburg", "deltaport"]
    COUNTRIES = ["AA", "BB", "CC"]

    def __init__(self, fail_connection_for=None, fail_record_for=None):
        self.fail_connection_for = fail_connection_for
        self.fail_record_for = fail_record_for

    def lookup(self, key: str) -> dict:
        if self.fail_connection_for is not None and self.fail_connection_for(key):
            raise ConnectionError(f"unreachable service for {key!r}")
        if self.fail_record_for is not None and self.fail_record_for(key):
            raise ValueError(f"bad record {key!r}")
        # sha256 (not blake2b) so the response is reproducible by the
        # DuckDB oracle: h = first 15 hex chars as an int (60 bits)
        h = int(hashlib.sha256(str(key).encode()).hexdigest()[:15], 16)
        return {
            "city": self.CITIES[h % len(self.CITIES)],
            "country": self.COUNTRIES[(h >> 8) % len(self.COUNTRIES)],
        }


class RestEnricher:
    """Actor-pool stage: per-row service lookup with the reference's
    failure policy and optional conditional application.

    ``client_factory`` runs once per actor (the @transient-lazy analogue,
    WithGeoData.scala:55). ``condition(batch) -> bool mask`` limits which
    rows are enriched (the reference's conditional columns,
    WithGeoData.scala:105-125); others get nulls.
    """

    def __init__(
        self,
        key_col: str,
        client_factory: Callable[[], object] | None = None,
        condition: Callable[[pd.DataFrame], pd.Series] | None = None,
        out_fields: tuple[str, ...] = ("city", "country"),
        prefix: str = "geo_",
    ):
        self.client = (client_factory or DeterministicFakeClient)()
        self.key_col = key_col
        self.condition = condition
        self.out_fields = out_fields
        self.prefix = prefix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = (
            self.condition(batch).to_numpy(dtype=bool)
            if self.condition is not None
            else None
        )
        results: dict[str, list] = {f: [] for f in self.out_fields}
        for i, key in enumerate(batch[self.key_col]):
            if mask is not None and not mask[i]:
                for f in self.out_fields:
                    results[f].append(None)
                continue
            try:
                resp = self.client.lookup(key)
                for f in self.out_fields:
                    results[f].append(resp.get(f))
            except (ConnectionError, TimeoutError) as ex:
                # connection-level failure aborts the job
                raise EnrichmentAbort(str(ex)) from ex
            except Exception:
                # per-record failure -> nulls, pipeline continues
                for f in self.out_fields:
                    results[f].append(None)
        for f in self.out_fields:
            batch[self.prefix + f] = results[f]
        return batch


def with_enrichment(
    ds,
    *,
    key_col: str,
    client_factory=None,
    condition=None,
    out_fields=("city", "country"),
    prefix: str = "geo_",
    batch_size: int = 256,
    concurrency: int = 2,
):
    """Enrich via an actor pool (small batches — each row may be an RPC)."""
    return ds.map_batches(
        RestEnricher,
        fn_constructor_kwargs={
            "key_col": key_col,
            "client_factory": client_factory,
            "condition": condition,
            "out_fields": tuple(out_fields),
            "prefix": prefix,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def with_support_values(
    ds,
    *,
    value_col: str,
    duration_col: str,
    max_points: int = 5,
    step_s: float = 1800.0,
    target: str = "support_values",
):
    """Duplicate a value into ≤``max_points`` support points for long gaps.

    Reference: WithSupportValues (ml/WithSupportValues.scala:36-70) — a
    row→row map producing an array column sized by the gap duration.
    Vectorized: the list lengths come from numpy; only the ragged assembly
    is per row.
    """
    import numpy as np
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        dur = np.nan_to_num(
            batch.column(duration_col).to_numpy(zero_copy_only=False), nan=0.0
        )
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        counts = np.clip((dur // step_s).astype(np.int64) + 1, 1, max_points)
        flat = np.repeat(vals, counts)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
        return batch.append_column(target, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
