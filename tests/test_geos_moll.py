"""Geostationary (+proj=geos) and Mollweide (+proj=moll) kernels.

geos goldens: the GOES-R PUG volume 3 worked example (scan angles ->
geodetic), an INDEPENDENT numeric line-ellipsoid intersection oracle (a
different formulation than the closed-form kernel — brute-force bisection
along the view ray), exact sub-satellite anchor, limb invisibility.
moll goldens: exact pole/edge anchors on the closed forms, the equal-area
Jacobian property, exact round trips.

Reference parity: arbitrary CRS objects accepted at
GeoTiffReprojectRasterSource.scala:39 — these are the two big raster CRS
families (geostationary weather satellites; world equal-area) the registry
lacked.
"""
import numpy as np
import pytest

from geotrellis_contrib_spark import grid as G

H = 35786023.0
A = 6378137.0
GOES_EAST = ("+proj=geos +h=35786023.0 +lon_0=-75.0 +sweep=x "
             "+ellps=GRS80 +units=m +no_defs")


def test_geos_pug_worked_example():
    # GOES-R PUG vol. 3 §5.1.2.8 example: fixed-grid angles
    # x=-0.024052, y=0.095340 rad -> lat 33.846162 N, lon 84.690932 W
    fwd, inv = G.parse_proj4(GOES_EAST)
    lon, lat = inv(-0.024052 * H, 0.095340 * H)
    assert abs(float(lon) - (-84.690932)) < 2e-5
    assert abs(float(lat) - 33.846162) < 2e-5
    # and the forward reproduces the scan angles
    x, y = fwd(lon, lat)
    assert abs(float(x) / H - (-0.024052)) < 1e-9
    assert abs(float(y) / H - 0.095340) < 1e-9


def test_geos_independent_ray_oracle():
    # independent check: march the view ray numerically (bisection on the
    # implicit ellipsoid function) instead of solving the quadratic
    fwd, inv = G.parse_proj4(GOES_EAST)
    rp2 = 1.0 - G._E2
    rg = (A + H) / A
    for xa, ya in [(-0.02, 0.09), (0.05, 0.06), (0.0, 0.11), (0.08, 0.0)]:
        # unit-free direction of the scan ray (sweep=x convention)
        vz = np.tan(ya)
        vy = np.tan(xa) * np.sqrt(1.0 + vz * vz)
        d = np.array([-1.0, vy, vz])  # from satellite at (rg, 0, 0)

        def f(t):
            p = np.array([rg, 0.0, 0.0]) + t * d
            return p[0] ** 2 + p[1] ** 2 + p[2] ** 2 / rp2 - 1.0

        lo, hi = 0.0, rg
        assert f(lo) > 0 > f(hi)
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if f(mid) > 0:
                lo = mid
            else:
                hi = mid
        p = np.array([rg, 0.0, 0.0]) + 0.5 * (lo + hi) * d
        lam = np.arctan2(p[1], p[0])
        phi_c = np.arctan(p[2] / np.hypot(p[0], p[1]))
        phi = np.arctan(np.tan(phi_c) / rp2)
        want_lon = -75.0 + np.degrees(lam)
        want_lat = np.degrees(phi)
        lon, lat = inv(xa * H, ya * H)
        assert abs(float(lon) - want_lon) < 1e-9
        assert abs(float(lat) - want_lat) < 1e-9


def test_geos_anchors_and_limb():
    fwd, inv = G.parse_proj4(GOES_EAST)
    # sub-satellite point maps to the origin exactly
    x, y = fwd(-75.0, 0.0)
    assert float(x) == 0.0 and float(y) == 0.0
    # the far side of the Earth is not visible -> NaN
    x, y = fwd(105.0, 0.0)
    assert np.isnan(x) and np.isnan(y)
    # a point just inside the limb IS visible (~81 deg from nadir works)
    x, y = fwd(-75.0 + 80.0, 0.0)
    assert np.isfinite(x) and np.isfinite(y)
    # round trip over the footprint is exact to 1e-12 deg
    lons = np.linspace(-78.75, -45.0, 25)
    lats = np.linspace(21.9, 40.8, 25)
    lo, la = np.meshgrid(lons, lats)
    x, y = fwd(lo.ravel(), la.ravel())
    lo2, la2 = inv(x, y)
    assert np.abs(lo2 - lo.ravel()).max() < 1e-11
    assert np.abs(la2 - la.ravel()).max() < 1e-11


def test_geos_sweep_y_and_sphere():
    # on the equator the two sweep conventions agree in x/y up to the
    # axis-ordering of the tangent scaling; check both round-trip and that
    # they differ off-axis (the classic GOES-vs-Meteosat pitfall)
    fy, iy = G.parse_proj4("+proj=geos +h=35786023.0 +lon_0=-75.0 "
                           "+sweep=y +ellps=GRS80 +units=m +no_defs")
    fx, ix = G.parse_proj4(GOES_EAST)
    lon2, lat2 = iy(*fy(-60.0, 30.0))
    assert abs(float(lon2) - (-60.0)) < 1e-11
    assert abs(float(lat2) - 30.0) < 1e-11
    xx, _ = fx(-60.0, 30.0)
    xy, _ = fy(-60.0, 30.0)
    assert abs(float(xx) - float(xy)) > 10.0  # sweeps genuinely differ
    # spherical geos (lone +a): same kernel with rp2 = 1
    fs, is_ = G.parse_proj4("+proj=geos +h=35786023.0 +lon_0=-75.0 "
                            "+sweep=x +a=6378137.0 +units=m +no_defs")
    lon3, lat3 = is_(*fs(-60.0, 30.0))
    assert abs(float(lon3) - (-60.0)) < 1e-11
    assert abs(float(lat3) - 30.0) < 1e-11


def test_geos_fail_loud():
    with pytest.raises(ValueError, match="requires \\+h"):
        G.parse_proj4("+proj=geos +lon_0=-75 +ellps=GRS80 +units=m")
    with pytest.raises(ValueError, match="sweep must be x or y"):
        G.parse_proj4("+proj=geos +h=35786023 +sweep=z +units=m")
    with pytest.raises(ValueError, match="lat_0"):
        G.parse_proj4("+proj=geos +h=35786023 +lat_0=10 +units=m")
    with pytest.raises(ValueError, match="geos parameters"):
        G.parse_proj4("+proj=tmerc +lon_0=0 +h=100 +units=m")
    with pytest.raises(ValueError, match="geos parameters"):
        G.parse_proj4("+proj=merc +sweep=x +units=m")
    with pytest.raises(ValueError, match="must be positive"):
        G.parse_proj4("+proj=geos +h=-5 +units=m")


MOLL = "+proj=moll +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"


def test_moll_exact_anchors():
    fwd, inv = G.parse_proj4(MOLL)
    # origin
    x, y = fwd(0.0, 0.0)
    assert float(x) == 0.0 and float(y) == 0.0
    # poles: y = +-sqrt(2)*a exactly (the pinned Newton converges to
    # theta = pi/2 and the pole guard holds it there)
    _, y = fwd(0.0, 90.0)
    assert abs(float(y) - np.sqrt(2.0) * A) < 1e-6
    _, y = fwd(0.0, -90.0)
    assert abs(float(y) + np.sqrt(2.0) * A) < 1e-6
    # equator edge: |x| = 2*sqrt(2)*a at the antimeridian
    x, _ = fwd(179.999999, 0.0)
    assert abs(abs(float(x)) - 2.0 * np.sqrt(2.0) * A) < 1.0


def test_moll_equal_area_jacobian():
    fwd, _ = G.parse_proj4(MOLL)
    d = 1e-6
    for lat in (0.0, 23.5, 41.0, 62.0):
        x0, y0 = (float(v) for v in fwd(10.0, lat))
        x1, y1 = (float(v) for v in fwd(10.0 + d, lat))
        x2, y2 = (float(v) for v in fwd(10.0, lat + d))
        jac = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) \
            / (np.radians(d) ** 2)
        assert abs(jac / (A * A * np.cos(np.radians(lat))) - 1.0) < 1e-6


def test_moll_roundtrip_and_shifted_center():
    fwd, inv = G.parse_proj4("+proj=moll +lon_0=-100 +x_0=250000 "
                             "+y_0=-50000 +ellps=WGS84 +units=m +no_defs")
    lons = np.linspace(-170.0, -30.0, 29)
    lats = np.linspace(-80.0, 80.0, 33)
    lo, la = np.meshgrid(lons, lats)
    x, y = fwd(lo.ravel(), la.ravel())
    lo2, la2 = inv(x, y)
    assert np.abs(lo2 - lo.ravel()).max() < 1e-9
    assert np.abs(la2 - la.ravel()).max() < 1e-9


def test_moll_fail_loud():
    with pytest.raises(ValueError, match="k_0"):
        G.parse_proj4("+proj=moll +k_0=0.9 +units=m")
    with pytest.raises(ValueError, match="lat_0"):
        G.parse_proj4("+proj=moll +lat_0=45 +units=m")
    with pytest.raises(ValueError, match="lat_ts"):
        G.parse_proj4("+proj=moll +lat_ts=30 +units=m")
    with pytest.raises(ValueError, match="datum shift"):
        G.parse_proj4("+proj=moll +towgs84=1,2,3 +units=m")
