"""LAEA (EPSG:3035) and Albers (EPSG:5070) — property-based validation.

Instead of transcribed goldens, these tests check the DEFINING properties
of the projections, which a wrong formula cannot fake:
  - exact inverse round trips (sub-1e-12 deg);
  - the EQUAL-AREA property: planar area of any projected quad equals its
    authalic-sphere area  dlam * Rq^2 * (sin beta2 - sin beta1);
  - Albers: unit scale along BOTH standard parallels, and only there;
  - LAEA: the central meridian maps to x = FE (azimuthal symmetry).
"""

import numpy as np

from geotrellis_contrib_spark import grid


def _shoelace(xs, ys):
    return 0.5 * abs(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def _authalic_quad_area(lon0, lon1, lat0, lat1):
    b0 = np.arcsin(np.clip(grid._q_authalic(np.radians(lat0)) / grid._QP, -1, 1))
    b1 = np.arcsin(np.clip(grid._q_authalic(np.radians(lat1)) / grid._QP, -1, 1))
    return np.radians(lon1 - lon0) * grid._RQ ** 2 * (np.sin(b1) - np.sin(b0))


def _projected_quad_area(fwd, lon0, lon1, lat0, lat1, n=64):
    # boundary densely sampled: projected edges curve
    t = np.linspace(0.0, 1.0, n, endpoint=False)
    lons = np.concatenate([lon0 + (lon1 - lon0) * t, np.full(n, lon1),
                           lon1 - (lon1 - lon0) * t, np.full(n, lon0)])
    lats = np.concatenate([np.full(n, lat0), lat0 + (lat1 - lat0) * t,
                           np.full(n, lat1), lat1 - (lat1 - lat0) * t])
    x, y = fwd(lons, lats)
    return _shoelace(np.asarray(x), np.asarray(y))


def test_roundtrip_exact():
    rng = np.random.RandomState(7)
    lons = rng.uniform(-25, 45, 500)
    lats = rng.uniform(28, 72, 500)
    for epsg in (3035, 5070):
        fwd, inv = grid.EQUAL_AREA_CRS[epsg]
        if epsg == 5070:
            lons2, lats2 = rng.uniform(-125, -67, 500), rng.uniform(24, 50, 500)
        else:
            lons2, lats2 = lons, lats
        x, y = fwd(lons2, lats2)
        blo, bla = inv(x, y)
        assert np.max(np.abs(blo - lons2)) < 1e-12
        assert np.max(np.abs(bla - lats2)) < 1e-12


def test_equal_area_property():
    rng = np.random.RandomState(3)
    for epsg, (lo_rng, la_rng) in ((3035, ((-20, 40), (32, 70))),
                                   (5070, ((-120, -70), (25, 48)))):
        fwd, _ = grid.EQUAL_AREA_CRS[epsg]
        for _ in range(25):
            lo = rng.uniform(*lo_rng)
            la = rng.uniform(*la_rng)
            dlo = rng.uniform(0.05, 0.5)
            dla = rng.uniform(0.05, 0.5)
            a_proj = _projected_quad_area(fwd, lo, lo + dlo, la, la + dla)
            a_auth = _authalic_quad_area(lo, lo + dlo, la, la + dla)
            assert abs(a_proj / a_auth - 1.0) < 1e-5, (epsg, lo, la, dlo, dla)


def test_albers_unit_scale_on_standard_parallels():
    fwd, _ = grid.EQUAL_AREA_CRS[5070]
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    for lat_sp in (29.5, 45.5):
        lam = np.radians(0.001)
        x0, y0 = fwd(-96.0, lat_sp)
        x1, y1 = fwd(-96.0 + 0.001, lat_sp)
        proj_d = float(np.hypot(x1 - x0, y1 - y0))
        s = np.sin(np.radians(lat_sp))
        arc = a * np.cos(np.radians(lat_sp)) / np.sqrt(1 - e2 * s * s) * lam
        assert abs(proj_d / arc - 1.0) < 1e-7, lat_sp
    # and NOT unit scale away from them (sanity that the test can fail)
    x0, y0 = fwd(-96.0, 37.0)
    x1, y1 = fwd(-96.0 + 0.001, 37.0)
    s = np.sin(np.radians(37.0))
    arc = a * np.cos(np.radians(37.0)) / np.sqrt(1 - e2 * s * s) * np.radians(0.001)
    assert abs(float(np.hypot(x1 - x0, y1 - y0)) / arc - 1.0) > 1e-5


def test_laea_center_and_axis():
    fwd, _ = grid.EQUAL_AREA_CRS[3035]
    x, y = fwd(10.0, 52.0)
    assert abs(float(x) - 4321000.0) < 1e-6
    assert abs(float(y) - 3210000.0) < 1e-6
    # central meridian maps onto x = FE, increasing north
    xs, ys = fwd(np.full(5, 10.0), np.array([40.0, 46, 52, 58, 64]))
    assert np.max(np.abs(np.asarray(xs) - 4321000.0)) < 1e-6
    assert np.all(np.diff(np.asarray(ys)) > 0)


def test_phi_from_q_poles():
    assert abs(float(grid._phi_from_q(grid._QP)) - np.pi / 2) < 1e-12
    assert abs(float(grid._phi_from_q(-grid._QP)) + np.pi / 2) < 1e-12


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (EPSG:2154 Lambert-93): conformality IS the
# property oracle — isotropic local scale (h == k), right angles preserved
# — plus unit scale on both standard parallels and exact round trips.
# ---------------------------------------------------------------------------

def _local_jacobian(fwd, lon, lat, d=1e-6):
    x0, y0 = fwd(lon, lat)
    xe, ye = fwd(lon + d, lat)
    xn, yn = fwd(lon, lat + d)
    return (np.array([float(xe - x0), float(ye - y0)]) / d,
            np.array([float(xn - x0), float(yn - y0)]) / d)


def test_lcc_roundtrip_exact():
    rng = np.random.RandomState(9)
    fwd, inv = grid.NAMED_CRS[2154]
    lons = rng.uniform(-5, 10, 400)
    lats = rng.uniform(41, 51, 400)
    x, y = fwd(lons, lats)
    blo, bla = inv(x, y)
    assert np.max(np.abs(blo - lons)) < 1e-12
    assert np.max(np.abs(bla - lats)) < 1e-12


def test_lcc_conformality():
    """A conformal map's Jacobian is a scaled rotation: the projected east
    and north tangent vectors stay orthogonal and (after dividing by the
    ellipsoidal metric) equal in length."""
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    fwd, _ = grid.NAMED_CRS[2154]
    rng = np.random.RandomState(4)
    for _ in range(20):
        lon = rng.uniform(-4, 9)
        lat = rng.uniform(41.5, 50.5)
        ve, vn = _local_jacobian(fwd, lon, lat)
        s = np.sin(np.radians(lat))
        w = np.sqrt(1 - e2 * s * s)
        # meters on the ellipsoid per degree of lon / lat
        me = np.radians(1.0) * a * np.cos(np.radians(lat)) / w
        mn = np.radians(1.0) * a * (1 - e2) / w ** 3
        k = np.linalg.norm(ve) / me   # parallel scale
        h = np.linalg.norm(vn) / mn   # meridian scale
        assert abs(k / h - 1.0) < 1e-6, (lon, lat, k, h)
        cosang = ve @ vn / (np.linalg.norm(ve) * np.linalg.norm(vn))
        assert abs(cosang) < 1e-6, (lon, lat, cosang)


def test_lcc_unit_scale_on_standard_parallels():
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    fwd, _ = grid.NAMED_CRS[2154]
    for lat_sp, expect_unit in ((44.0, True), (49.0, True), (46.5, False)):
        ve, _vn = _local_jacobian(fwd, 3.0, lat_sp)
        s = np.sin(np.radians(lat_sp))
        me = np.radians(1.0) * a * np.cos(np.radians(lat_sp)) / np.sqrt(1 - e2 * s * s)
        k = np.linalg.norm(ve) / me
        if expect_unit:
            assert abs(k - 1.0) < 1e-7, (lat_sp, k)
        else:
            assert abs(k - 1.0) > 1e-5  # the test CAN fail between parallels


def test_lcc_center_golden():
    fwd, _ = grid.NAMED_CRS[2154]
    x, y = fwd(3.0, 46.5)
    assert abs(float(x) - 700000.0) < 1e-6
    assert abs(float(y) - 6600000.0) < 1e-6
