"""ES bulk sink + Scylla token-range source (transport/session-injected)."""

import pandas as pd
import pytest
import ray
import ray.data as rd

from arlas_proc_ray.sources.elastic import (
    ActorTransport,
    EsWriteAbort,
    MockElasticsearch,
    write_to_elasticsearch,
)
from arlas_proc_ray.sources.scylla import (
    FakeScyllaSession,
    fake_session_factory,
    murmur_like_token,
    read_from_scylla,
)


def _frame():
    return pd.DataFrame(
        {
            "id": ["v1", "v1", "v2"],
            "arlas_timestamp": [100, 200, 100],
            "month": ["202401", "202402", "202401"],
            "speed": [1.5, 2.5, 3.5],
            "secret": ["x", "y", "z"],
        }
    )


def test_es_bulk_sink_roundtrip():
    es = MockElasticsearch.remote()
    out = write_to_elasticsearch(
        rd.from_pandas(_frame()),
        "tracks",
        id_col="id",
        ts_col="arlas_timestamp",
        transport_factory=lambda: ActorTransport(es),
        chunk_rows=2,
    )
    assert out == {"indexed": 3, "rejected": 0}
    docs = {d["_id"]: d for d in ray.get(es.search_all.remote())}
    # es.mapping.id = id#timestamp (WritableDataFrame.scala:84-86)
    assert set(docs) == {"v1#100", "v1#200", "v2#100"}
    assert docs["v1#100"]["_index"] == "tracks"
    assert docs["v1#100"]["_source"]["speed"] == 1.5
    # duplicate-id re-index overwrites (idempotent task retries)
    write_to_elasticsearch(
        rd.from_pandas(_frame()), "tracks", id_col="id",
        ts_col="arlas_timestamp",
        transport_factory=lambda: ActorTransport(es),
    )
    assert ray.get(es.stats.remote())["docs"] == 3


def test_es_dynamic_index_and_exclusions():
    es = MockElasticsearch.remote()
    out = write_to_elasticsearch(
        rd.from_pandas(_frame()),
        "tracks_{}",
        id_col="id",
        ts_col="arlas_timestamp",
        dynamic_index_col="month",
        mapping_excluded=("secret",),
        transport_factory=lambda: ActorTransport(es),
    )
    assert out["indexed"] == 3
    docs = ray.get(es.search_all.remote())
    # per-row index resolution (WritableDataFrame.scala:89-107)
    assert sorted({d["_index"] for d in docs}) == ["tracks_202401", "tracks_202402"]
    for d in docs:
        assert "secret" not in d["_source"]
        assert "month" not in d["_source"]  # dynamicIndex column excluded too


def test_es_failure_policies():
    # per-record rejection: counted, pipeline continues (RestTool.scala:39-45)
    es = MockElasticsearch.remote(reject_id_prefix="v2")
    out = write_to_elasticsearch(
        rd.from_pandas(_frame()), "tracks", id_col="id",
        ts_col="arlas_timestamp",
        transport_factory=lambda: ActorTransport(es),
    )
    assert out == {"indexed": 2, "rejected": 1}

    # connection-level failure: aborts the job (RestTool.scala:61-73)
    class DeadTransport:
        def bulk(self, body):
            raise ConnectionError("no route to host")

    with pytest.raises(Exception) as ei:
        write_to_elasticsearch(
            rd.from_pandas(_frame()), "tracks", id_col="id",
            ts_col="arlas_timestamp",
            transport_factory=lambda: DeadTransport(),
        )
    assert "EsWriteAbort" in str(ei.getrepr()) or isinstance(
        ei.value, EsWriteAbort
    )


def test_scylla_token_range_source():
    table = pd.DataFrame(
        {
            "pk": [f"key{i}" for i in range(500)],
            "v": range(500),
        }
    )
    factory = fake_session_factory({"ks.tbl": table}, {"ks.tbl": "pk"})
    ds = read_from_scylla("ks.tbl", session_factory=factory, parallelism=8)
    got = ds.to_pandas().sort_values("v").reset_index(drop=True)
    # every row exactly once across all token ranges (no gap, no overlap)
    pd.testing.assert_frame_equal(got, table)

    # ranges partition the ring: each row's token falls in exactly one task
    toks = murmur_like_token(table["pk"].tolist())
    assert len(set(toks)) == len(toks)  # collision-free on this fixture

    # session interface itself pages deterministically
    session = FakeScyllaSession({"ks.tbl": table}, {"ks.tbl": "pk"})
    pages = list(session.token_range_scan("ks.tbl", -(2**63), 2**63 - 1, page_size=100))
    assert sum(len(p) for p in pages) == 500 and len(pages) == 5

    with pytest.raises(ValueError):
        read_from_scylla("no_dot", session_factory=factory)


def test_full_publish_flow_scylla_to_elasticsearch():
    """The reference's end-to-end shape: read from Scylla → keyed
    transform → asArlasEsData projection → indexed write — all through
    the injectable connectors."""
    import numpy as np
    import pyarrow as pa

    from arlas_proc_ray.stages.keyed import keyed_partition_map
    from arlas_proc_ray.stages.rowwise import as_es_data

    rng = np.random.RandomState(5)
    table = pd.DataFrame(
        {
            "pk": [f"obj{i%20}#{i}" for i in range(400)],
            "obj": [f"obj{i%20}" for i in range(400)],
            "seq": list(range(400)),
            "lat": rng.uniform(-60, 60, 400).round(4),
            "lon": rng.uniform(-180, 180, 400).round(4),
            "arlas_timestamp": 1_700_000_000 + np.arange(400) * 60,
        }
    )
    factory = fake_session_factory({"ks.tracks": table}, {"ks.tracks": "pk"})
    ds = read_from_scylla("ks.tracks", session_factory=factory, parallelism=4)

    def with_speedish(pdf):
        pdf["dt"] = pdf.groupby("obj", sort=False)["arlas_timestamp"].diff()
        return pdf

    transformed = keyed_partition_map(
        ds, keys=["obj"], order_col="seq", fn=with_speedish, num_partitions=4
    ).map_batches(
        lambda t: as_es_data(
            t, lat_col="lat", lon_col="lon", id_col="obj",
            ts_col="arlas_timestamp",
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    es = MockElasticsearch.remote()
    out = write_to_elasticsearch(
        transformed,
        "arlas_tracks",
        id_col="arlas_id",
        transport_factory=lambda: ActorTransport(es),
    )
    assert out == {"indexed": 400, "rejected": 0}
    docs = ray.get(es.search_all.remote())
    assert len(docs) == 400
    sample = docs[0]["_source"]
    assert "arlas_geo_point" in sample and "," in sample["arlas_geo_point"]
    assert "#" in docs[0]["_id"]


def test_scylla_first_token_range_includes_token_min():
    """Ranges are (lo, hi]; the first range must still cover a key whose
    token is exactly TOKEN_MIN (round-2 ADVICE: blake2b can emit -2^63,
    which Cassandra's Murmur3 remaps but our stand-in does not)."""
    from arlas_proc_ray.sources.scylla import (
        TOKEN_MIN,
        ScyllaDatasource,
    )

    seen = []

    class RecordingSession:
        def token_range_scan(self, source, lo, hi, page_size=5000):
            seen.append((lo, hi))
            return iter(())

    src = ScyllaDatasource("ks.t", RecordingSession)
    for task in src.get_read_tasks(4):
        list(task.read_fn())
    los = sorted(lo for lo, _ in seen)
    assert los[0] < TOKEN_MIN  # first range strictly below → TOKEN_MIN included
    # and ranges tile the space without overlap
    his = sorted(hi for _, hi in seen)
    assert los[1:] == his[:-1]


def test_murmur_like_token_accepts_generator():
    from arlas_proc_ray.sources.scylla import murmur_like_token

    as_list = murmur_like_token(["a", "b", "c"])
    as_gen = murmur_like_token(x for x in ["a", "b", "c"])
    assert (as_list == as_gen).all()
