"""Vincenty inverse + geodesic ST_DWithin-style join: published GDA94
golden, ring-join completeness vs brute force, coincident points,
antipodal fail-loud."""
import numpy as np
import pytest

from geotrellis_contrib_spark.grid import vincenty_distance
from geotrellis_contrib_spark.operators import spatial_join as sj


def test_vincenty_gda94_golden():
    # Flinders Peak -> Buninyong (GDA technical manual, GRS80):
    # s = 54,972.271 m, to the mm at these coordinate roundings
    s = vincenty_distance(
        np.array([144.0 + 25.0 / 60 + 29.52440 / 3600]),
        np.array([-(37.0 + 57.0 / 60 + 3.72030 / 3600)]),
        np.array([143.0 + 55.0 / 60 + 35.38390 / 3600]),
        np.array([-(37.0 + 39.0 / 60 + 10.15610 / 3600)]),
        a=6378137.0, f=1 / 298.257222101)[0]
    assert abs(s - 54972.271) < 2e-3


def test_vincenty_coincident_and_antipodal():
    assert vincenty_distance([10.0], [50.0], [10.0], [50.0])[0] == 0.0
    with pytest.raises(ValueError, match="antipodal"):
        vincenty_distance([0.0], [0.0], [179.9], [0.0])


def test_geodesic_pairs_complete_vs_brute(spark):
    # 60-point cluster: ring join must find EXACTLY the brute-force set
    rng = np.arange(60)
    lon = -74.25 + ((rng * 9973 + 12345) % 100000) / 100000.0 * 0.5
    lat = 40.45 + ((rng * 7919 + 54321) % 100000) / 100000.0 * 0.5
    pts = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in rng],
        "pid long, lon double, lat double")
    got = {(r.a_id, r.b_id): r.dist_q
           for r in sj.geodesic_pairs(pts, radius_m=5000.0,
                                      max_abs_lat=41.0).collect()}
    exp = {}
    for i in range(60):
        for j in range(i + 1, 60):
            s = vincenty_distance([lon[i]], [lat[i]],
                                  [lon[j]], [lat[j]])[0]
            q = int(np.floor(s * 1000.0 + 0.5))
            if q <= 5000000:
                exp[(i, j)] = q
    assert got == exp and len(exp) > 5
