"""Ordinary kriging: the pinned adjugate inverse vs numpy.linalg, the
interpolated surface vs an independent per-pixel linalg.solve brute
force, exact interpolation at sample locations, unit weight sums, both
variogram branches, and fail-louds."""
import math

import numpy as np
import pytest

from geotrellis_contrib_spark.operators import kriging as KG

SAMPLES = [(1200.5, 1580.5, 10.0), (1250.5, 1650.5, 24.0),
           (1310.5, 1610.5, 17.0)]
C0, C1, A = 0.0, 1.0, 250.0


def _sys_matrix(pts):
    k = len(pts)
    M = np.zeros((k + 1, k + 1))
    for i in range(k):
        for j in range(k):
            h = math.hypot(pts[i][0] - pts[j][0], pts[i][1] - pts[j][1])
            M[i, j] = KG.gamma_spherical(h, C0, C1, A)
        M[i, k] = M[k, i] = 1.0
    return M


def test_adjugate_inverse_matches_numpy():
    pts = sorted(SAMPLES)
    inv = KG.kriging_system_inverse(pts, C0, C1, A)
    M = _sys_matrix(pts)
    assert np.allclose(np.array(inv), np.linalg.inv(M),
                       rtol=1e-10, atol=1e-10)


def test_surface_matches_linalg_solve_and_samples(spark):
    pts = sorted(SAMPLES)
    df = spark.createDataFrame(SAMPLES, "gx double, gy double, z double")
    out = {(r.col, r.row): (r.ksum, r.n_px)
           for r in KG.kriging_interpolate(
               df, zoom=6, cols=(18, 21), rows=(24, 27),
               c0=C0, c1=C1, a=A).collect()}
    assert len(out) == 16 and all(n == 4096 for _, n in out.values())
    M = _sys_matrix(pts)
    z = np.array([p[2] for p in pts])

    def ref_val(px, py):
        b = np.ones(len(pts) + 1)
        for j, (sx, sy, _) in enumerate(pts):
            b[j] = KG.gamma_spherical(math.hypot(px - sx, py - sy),
                                      C0, C1, A)
        w = np.linalg.solve(M, b)
        assert abs(w[:len(pts)].sum() - 1.0) < 1e-9  # unbiasedness
        return float(w[:len(pts)] @ z)

    # per-tile quantized sums vs the brute force on two tiles, plus
    # exact interpolation at the sample pixel centers
    for col, row in ((18, 24), (20, 25)):
        qs = 0
        for cy in range(64):
            for cx in range(64):
                v = ref_val(col * 64 + cx + 0.5, row * 64 + cy + 0.5)
                qs += math.floor(v * 1048576.0 + 0.5)
        assert abs(out[(col, row)][0] - qs) <= 64 * 64  # <=1 ulp/px grid
    for sx, sy, zz in pts:
        assert abs(ref_val(sx, sy) - zz) < 1e-9
    # both variogram branches exercised in the window: the far corner
    # is beyond range a from the first sample
    assert math.hypot(21 * 64 + 63.5 - pts[0][0],
                      27 * 64 + 63.5 - pts[0][1]) > A


def test_variogram_branches_and_fail_louds(spark):
    assert KG.gamma_spherical(0.0, C0, C1, A) == 0.0
    assert KG.gamma_spherical(A + 1.0, C0, C1, A) == C0 + C1
    u = 0.5
    assert KG.gamma_spherical(A * u, C0, C1, A) \
        == C0 + C1 * (1.5 * u - 0.5 * u * u * u)
    df = spark.createDataFrame(SAMPLES, "gx double, gy double, z double")
    with pytest.raises(ValueError, match="at least 2"):
        KG.kriging_interpolate(df.limit(1), 6, (18, 18), (24, 24))
    with pytest.raises(ValueError, match="max_samples|O\\(K\\^3\\)"):
        KG.kriging_interpolate(df, 6, (18, 18), (24, 24), max_samples=2)
    dup = spark.createDataFrame([(1.5, 1.5, 3.0), (1.5, 1.5, 4.0)],
                                "gx double, gy double, z double")
    with pytest.raises(ValueError, match="singular"):
        KG.kriging_interpolate(dup, 6, (18, 18), (24, 24)).collect()
