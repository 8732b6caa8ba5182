"""ScyllaDB/Cassandra source (readFromScyllaDB parity, session-injected).

Reference (sql/DataFrameReader.scala:48-55): ``readFromScyllaDB(spark,
"keyspace.table")`` via the spark-cassandra connector, whose scale design
is token-range parallelism — each Spark partition scans one slice of the
token ring.

Ray mapping: a custom ``Datasource`` whose ``get_read_tasks`` splits the
token ring into ``parallelism`` contiguous ranges; every ``ReadTask``
opens its OWN session (once per task, from a picklable factory) and pages
``WHERE token(pk) > lo AND token(pk) <= hi`` — the same shape a
cassandra-driver-backed session would use against a live cluster. The
sandbox has no services, so ``FakeScyllaSession`` implements the session
interface over an injected in-memory table with a deterministic 64-bit
token function; a real driver session plugs into the same factory seam.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_MIN, TOKEN_MAX = -(2**63), 2**63 - 1


def murmur_like_token(values: Iterable) -> np.ndarray:
    """Deterministic signed-64 token per partition key (splitmix mix —
    stands in for Murmur3Partitioner; any stable hash works for the fake)."""
    import hashlib

    # materialize once — sizing via len(list(values)) would exhaust a
    # generator and the enumerate below would silently produce an
    # UNINITIALIZED token array (round-2 ADVICE)
    if not hasattr(values, "__len__"):
        values = list(values)
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(h, "big", signed=True)
    return out


class FakeScyllaSession:
    """Deterministic in-memory session implementing token-range scans."""

    def __init__(self, tables: dict[str, pd.DataFrame], pk_col: dict[str, str]):
        self.tables = tables
        self.pk_col = pk_col

    def token_range_scan(
        self, keyspace_table: str, lo: int, hi: int, page_size: int = 5000
    ) -> Iterable[pd.DataFrame]:
        df = self.tables[keyspace_table]
        tok = murmur_like_token(df[self.pk_col[keyspace_table]].tolist())
        sel = df[(tok > lo) & (tok <= hi)]
        for start in range(0, len(sel), page_size):
            yield sel.iloc[start : start + page_size]


def fake_session_factory(tables: dict[str, pd.DataFrame], pk_col: dict[str, str]):
    """Picklable factory capturing the fake cluster's contents."""

    def factory():
        return FakeScyllaSession(tables, pk_col)

    return factory


class ScyllaDatasource:
    """Ray Datasource over token-range scans (one read task per range)."""

    def __init__(
        self,
        source: str,  # "keyspace.table", as in the reference
        session_factory: Callable[[], object],
        *,
        estimated_size: int | None = None,
    ):
        if "." not in source:
            raise ValueError("source must be 'keyspace.table'")
        self.source = source
        self.session_factory = session_factory
        self._estimated = estimated_size

    def get_name(self) -> str:
        return f"Scylla({self.source})"

    def estimate_inmemory_data_size(self):
        return self._estimated

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        parallelism = max(1, parallelism)
        span = TOKEN_MAX - TOKEN_MIN  # exact int math: 2^64 overflows floats
        bounds = [
            TOKEN_MIN + (span * i) // parallelism for i in range(parallelism)
        ] + [TOKEN_MAX]
        tasks = []
        source, factory = self.source, self.session_factory
        for i in range(parallelism):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            if i == 0:
                # ranges are (lo, hi]; make the first range inclusive of
                # TOKEN_MIN — blake2b can emit exactly -2^63 (unlike
                # Cassandra's Murmur3, which remaps Long.MIN_VALUE), and
                # that key would otherwise be read by NO task
                lo = TOKEN_MIN - 1

            def read_fn(lo=lo, hi=hi):
                session = factory()  # one session per task
                for page in session.token_range_scan(source, lo, hi):
                    yield pa.Table.from_pandas(page, preserve_index=False)

            meta = BlockMetadata(
                num_rows=None, size_bytes=None, input_files=None,
                exec_stats=None,
            )
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_from_scylla(
    source: str,
    *,
    session_factory: Callable[[], object],
    parallelism: int = 16,
):
    """``readFromScyllaDB`` analogue returning a Ray Dataset."""
    import ray.data as rd
    from ray.data.datasource import Datasource

    class _DS(ScyllaDatasource, Datasource):
        pass

    ds = _DS(source, session_factory)
    return rd.read_datasource(ds, override_num_blocks=parallelism)
