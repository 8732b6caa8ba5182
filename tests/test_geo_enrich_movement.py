import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from arlas_proc_ray.functions import geo


def test_haversine_known_distance():
    # Paris -> London ≈ 344 km
    d = geo.haversine_m(48.8566, 2.3522, 51.5074, -0.1278)
    assert 340_000 < float(d) < 350_000
    assert float(geo.haversine_m(0, 0, 0, 0)) == 0.0


def test_bearing():
    assert abs(float(geo.bearing_deg(0, 0, 10, 0)) - 0.0) < 1e-6  # due north
    assert abs(float(geo.bearing_deg(0, 0, 0, 10)) - 90.0) < 1e-6  # due east
    b = geo.bearing_deg(np.array([0.0]), np.array([0.0]), np.array([-10.0]), np.array([0.0]))
    assert abs(b[0] - 180.0) < 1e-6


def test_geohash_known_values():
    # well-known test vector: (57.64911, 10.40744) -> u4pruydqqvj
    gh = geo.geohash([57.64911], [10.40744], precision=11)
    assert gh[0] == "u4pruydqqvj"
    gh2 = geo.geohash([0.0], [0.0], precision=5)
    assert gh2[0] == "s0000"


def test_simplify_polyline():
    pts = np.array([[0, 0], [0.001, 1], [0, 2], [5, 3]])
    out = geo.simplify_polyline(pts, tolerance=0.1)
    # middle points on the near-line are dropped; the sharp corner stays
    assert len(out) == 3
    assert (out[0] == [0, 0]).all() and (out[-1] == [5, 3]).all()


def test_antimeridian_split():
    segs = geo.split_antimeridian([0.0, 0.0], [179.0, -179.0])
    assert len(segs) == 2
    (la1, lo1), (la2, lo2) = segs
    assert lo1[-1] == 180.0 and lo2[0] == -180.0
    assert la1[-1] == la2[0]  # interpolated crossing latitude shared


def test_wkt_roundtrip_and_dedup():
    w = geo.wkt_linestring([1.0, 1.0, 2.0], [3.0, 3.0, 4.0])
    assert w.startswith("LINESTRING")
    pts = geo.parse_wkt_linestring(w)
    assert len(pts) == 2  # consecutive duplicate removed
    p = geo.wkt_linestring([1.0], [2.0])
    assert p == "POINT (2.0 1.0)"
    ring = geo.stddev_ellipse(10.0, 20.0, 1.0, 2.0, n_points=8)
    assert ring.shape == (9, 2) and (ring[0] == ring[-1]).all()


# ---------------------------------------------------------------------------


def test_enrichment_fake_client_and_conditional():
    from arlas_proc_ray.stages.enrich import with_enrichment

    df = pd.DataFrame({"k": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]})
    out = (
        with_enrichment(
            rd.from_pandas(df),
            key_col="k",
            condition=lambda b: b["v"] > 2,
            batch_size=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.loc[0, "geo_city"] is None  # v=1: condition false
    assert out.loc[2, "geo_city"] is not None  # v=3: enriched
    # deterministic: same key → same value
    from arlas_proc_ray.stages.enrich import DeterministicFakeClient

    assert out.loc[2, "geo_city"] == DeterministicFakeClient().lookup("c")["city"]


def test_enrichment_failure_policy():
    from arlas_proc_ray.stages.enrich import (
        DeterministicFakeClient,
        EnrichmentAbort,
        RestEnricher,
    )

    df = pd.DataFrame({"k": ["ok", "bad", "down"]})
    # per-record failure -> null, continue
    e = RestEnricher(
        "k",
        client_factory=lambda: DeterministicFakeClient(
            fail_record_for=lambda k: k == "bad"
        ),
    )
    out = e(df.copy())
    assert out.loc[1, "geo_city"] is None and out.loc[0, "geo_city"] is not None
    # connection failure -> abort
    e2 = RestEnricher(
        "k",
        client_factory=lambda: DeterministicFakeClient(
            fail_connection_for=lambda k: k == "down"
        ),
    )
    with pytest.raises(EnrichmentAbort):
        e2(df.copy())


def test_with_support_values():
    from arlas_proc_ray.stages.enrich import with_support_values

    df = pd.DataFrame({"v": [1.0, 2.0, 3.0], "dur": [0.0, 3600.0, 100000.0]})
    out = (
        with_support_values(
            rd.from_pandas(df), value_col="v", duration_col="dur",
            max_points=4, step_s=1800.0,
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert list(out["support_values"][0]) == [1.0]
    assert list(out["support_values"][1]) == [2.0, 2.0, 2.0]  # 3600/1800+1
    assert list(out["support_values"][2]) == [3.0] * 4  # capped at max


# ---------------------------------------------------------------------------


def test_movement_pipeline_end_to_end():
    from arlas_proc_ray.pipelines.movement import movement_courses

    out = movement_courses("/root/testdata/sf0.001", num_partitions=4).to_pandas()
    assert len(out) > 0
    assert {"course_id", "mission_id", "departure_ts", "arrival_ts",
            "duration_s", "n_events", "user_id"} <= set(out.columns)
    # course ids unique; every course belongs to a mission of the same user
    assert out["course_id"].is_unique
    assert (
        out["mission_id"].str.split("#").str[0]
        == out["course_id"].str.split("#").str[0]
    ).all()
    # a course with a departure_ts got it from an adjacent STOP that ended
    # before (or when) the course started
    has_dep = out["departure_ts"].notna()
    assert has_dep.any()
    assert (out.loc[has_dep, "departure_ts"] <= out.loc[has_dep, "t_start"]).all()


def test_trail_composition_helpers():
    from arlas_proc_ray.functions.geo import (
        linestrings_to_multilinestring,
        straight_line_distance_from_trails,
        trail_data_from_trails_and_coords,
        wkt_linestring,
    )

    t1 = wkt_linestring([0.0, 0.0], [0.0, 1.0])
    t2 = wkt_linestring([0.0, 1.0], [2.0, 2.0])

    # straight line: first coord of t1 -> last coord of t2
    d = straight_line_distance_from_trails([t1, None, t2])
    from arlas_proc_ray.functions.geo import haversine_m

    assert abs(d - float(haversine_m(0.0, 0.0, 1.0, 2.0))) < 1e-9
    assert straight_line_distance_from_trails([None]) == 0.0
    assert straight_line_distance_from_trails(["POINT (3 4)"]) == 0.0

    # multilinestring stitch
    m = linestrings_to_multilinestring([t1, t2])
    assert m == "MULTILINESTRING ((0.0 0.0, 1.0 0.0), (2.0 0.0, 2.0 1.0))"
    assert linestrings_to_multilinestring([]) is None

    # trail data: moving fragment keeps trail, paused one collapses to point
    td = trail_data_from_trails_and_coords(
        trails=[t1, None], lats=[None, 5.0], lons=[None, 6.0],
        use_trail=[True, False],
    )
    assert td["trail"] == "LINESTRING (0.0 0.0, 1.0 0.0, 6.0 5.0)"
    assert (td["departure_lat"], td["departure_lon"]) == (0.0, 0.0)
    assert (td["arrival_lat"], td["arrival_lon"]) == (5.0, 6.0)
    # single point after dedup -> POINT
    td2 = trail_data_from_trails_and_coords(
        trails=[None], lats=[1.0], lons=[2.0], use_trail=[False]
    )
    assert td2["trail"] == "POINT (2.0 1.0)"
    # length mismatch -> None
    assert trail_data_from_trails_and_coords([None], [1.0], [2.0], []) is None


def test_with_geohash_trail_cells():
    """WithGeohash analogue: distinct geohash cells of a trail's points
    (features/WithGeohash.scala:35-48), null trail -> null."""
    import pandas as pd
    import ray.data as rd

    from arlas_proc_ray.functions import geo

    trail = "LINESTRING (10.40744 57.64911, 10.40744 57.64911, 0.0 0.0)"
    df = pd.DataFrame({"id": [1, 2], "trail": [trail, None]})
    out = (
        geo.with_geohash(rd.from_pandas(df), trail_col="trail", precision=5)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    cells = out.loc[0, "geohashes"]
    # first two points share a cell -> dedup keeps 2 distinct cells
    assert list(cells) == [
        geo.geohash([57.64911], [10.40744], precision=5)[0],
        geo.geohash([0.0], [0.0], precision=5)[0],
    ]
    assert out.loc[1, "geohashes"] is None
