"""IDW interpolation: quantized distributed contract vs a numpy brute
force over the full pixel grid, exact 1/d^p semantics (coincident-point
rule, power=3) vs the same brute force, cross-tile stamping, fail-loud
guards."""
import numpy as np
import pytest

from geotrellis_contrib_spark.operators import pixels as px

Z = 3          # zoom for tests: 8x8 tiles of 64px -> 512px global grid
T = 64
NPX = (1 << Z) * T


def _pts_df(spark, pts):
    # (gx, gy, z) in GLOBAL PIXEL coords -> lon/lat via the inverse of
    # gpix: lon = gx/NPX*360-180 ; lat from inverse web-mercator
    rows = []
    for gx, gy, z in pts:
        lon = gx / NPX * 360.0 - 180.0
        lat = float(np.degrees(np.arctan(np.sinh(
            np.pi * (1.0 - 2.0 * gy / NPX)))))
        rows.append((lon, lat, float(z)))
    return spark.createDataFrame(rows, "lon double, lat double, z double")


def _gpix(spark, df):
    from geotrellis_contrib_spark.functions import cells as C
    from pyspark.sql import functions as F
    return df.select(C.gpix_x(F.col("lon"), Z, T).alias("gx"),
                     C.gpix_y(F.col("lat"), Z, T).alias("gy"),
                     F.col("z")).collect()


def _brute_quant(pts, r=4.0):
    num = {}
    den = {}
    for gx, gy, z in pts:
        p0, p1 = int(np.ceil(gx - 0.5 - r)), int(np.floor(gx - 0.5 + r))
        q0, q1 = int(np.ceil(gy - 0.5 - r)), int(np.floor(gy - 0.5 + r))
        for pyy in range(max(q0, 0), min(q1, NPX - 1) + 1):
            for pxx in range(max(p0, 0), min(p1, NPX - 1) + 1):
                d2 = (pxx + 0.5 - gx) ** 2 + (pyy + 0.5 - gy) ** 2
                if d2 <= r * r:
                    w = 1.0 / max(d2, 0.25)
                    k = (pxx, pyy)
                    num[k] = num.get(k, 0) + int(np.floor(
                        w * z * 1048576.0 + 0.5))
                    den[k] = den.get(k, 0) + int(np.floor(
                        w * 1048576.0 + 0.5))
    tiles = {}
    for (pxx, pyy), d in den.items():
        k = (pxx // T, pyy // T)
        ns, ds, np_ = tiles.get(k, (0, 0, 0))
        tiles[k] = (ns + num[(pxx, pyy)], ds + d, np_ + (1 if d > 0 else 0))
    return {k: v for k, v in tiles.items() if v[1] > 0}


def test_quantized_matches_brute(spark):
    # points straddle tile boundaries incl. a corner
    pts = [(127.3, 127.9, 10.0), (128.6, 129.1, 3.0), (64.0, 200.5, 63.0),
           (300.25, 300.75, 7.0), (301.5, 299.5, 1.0), (2.0, 2.0, 5.0)]
    df = _pts_df(spark, pts)
    got = {(r.col, r.row): (r.num_sum, r.den_sum, r.n_px)
           for r in px.idw_interpolate(df, zoom=Z, radius_px=4.0,
                                       tile_size=T).collect()}
    # brute force uses the EXACT gx/gy the engine computed (roundtrip
    # through lon/lat is lossy at the 1e-13 level)
    want = _brute_quant([(r.gx, r.gy, r.z) for r in _gpix(spark, df)])
    assert got == want and len(got) >= 4


def test_exact_mode_matches_brute(spark):
    pts = [(100.3, 100.9, 10.0), (101.6, 102.1, 3.0), (103.9, 100.2, 7.5)]
    df = _pts_df(spark, pts)
    rows = px.idw_interpolate(df, zoom=Z, radius_px=6.0, tile_size=T,
                              power=3.0, quantize=False).collect()
    got = {(r.pxx, r.pyy): r.idw_val for r in rows}
    exact_pts = sorted([(r.gx, r.gy, r.z) for r in _gpix(spark, df)])
    want = {}
    for pxx in range(90, 115):
        for pyy in range(90, 115):
            num = den = 0.0
            ex = None
            for gx, gy, z in exact_pts:
                d2 = (pxx + 0.5 - gx) ** 2 + (pyy + 0.5 - gy) ** 2
                if d2 < 1e-12:
                    ex = z if ex is None else min(ex, z)
                elif d2 <= 36.0:
                    w = d2 ** (-1.5)
                    num += w * z
                    den += w
            if ex is not None:
                want[(pxx, pyy)] = ex
            elif den > 0:
                want[(pxx, pyy)] = num / den
    # exact mode is a FLOAT-semantics contract (vectorized vs scalar
    # libm pow differ at 1 ulp on ~10% of cells); bit-exactness lives in
    # the quantized contract above
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=0.0), k


def test_exact_coincident_point_rule(spark):
    # a sample point EXACTLY on a pixel center: that pixel gets z
    # verbatim (no blow-up); two coincident samples -> min z
    pts = [(50.5, 50.5, 42.0), (50.5, 50.5, 41.0), (52.0, 50.5, 1.0)]
    df = _pts_df(spark, pts)
    # lon/lat roundtrip perturbs at 1e-13 px; feed gx/gy through a direct
    # DataFrame instead to hit d2 < 1e-12 exactly
    rows = px.idw_interpolate(df, zoom=Z, radius_px=4.0, tile_size=T,
                              quantize=False).collect()
    got = {(r.pxx, r.pyy): r.idw_val for r in rows}
    assert got[(50, 50)] == 41.0


def test_fail_loud(spark):
    df = _pts_df(spark, [(10.0, 10.0, 1.0)])
    with pytest.raises(ValueError, match="radius_px"):
        px.idw_interpolate(df, zoom=Z, radius_px=64.0, tile_size=T)
    with pytest.raises(ValueError, match="power=2"):
        px.idw_interpolate(df, zoom=Z, radius_px=4.0, tile_size=T,
                           power=3.0, quantize=True)


def test_idw_single_shuffle_plan(spark):
    df = _pts_df(spark, [(100.0, 100.0, 1.0)])
    plan = px.idw_interpolate(df, zoom=Z, radius_px=4.0, tile_size=T) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1, plan
