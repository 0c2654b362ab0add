"""Sinusoidal (MODIS grid) + cylindrical equal-area (EASE-Grid 2.0) +
equirectangular kernels and their parse_proj4 dispatch.

Goldens are PUBLISHED grid constants (independent of the engine):
- MODIS land grid: extent +-20015109.354 m, tile size 1111950.5196666666 m,
  y extent +-10007554.677 m (sphere R=6371007.181).
- EASE-Grid 2.0 (EPSG:6933): x extent +-17367530.445161 m and the M-grid
  edge y(85.0445664 deg) = 7314540.83 m (WGS84, lat_ts=30).

Reference parity: the reference accepts arbitrary CRS objects at
vlm/src/main/scala/geotrellis/contrib/vlm/geotiff/GeoTiffReprojectRasterSource.scala:39.
"""
import numpy as np
import pytest

from geotrellis_contrib_spark import grid as gr

RNG = np.random.default_rng(20260817)
LON = RNG.uniform(-170.0, 170.0, 500)
LAT = RNG.uniform(-85.0, 85.0, 500)


def _roundtrip(fwd, inv, lon, lat, tol=1e-9):
    l2, p2 = inv(*fwd(lon, lat))
    np.testing.assert_allclose(l2, lon, rtol=0, atol=tol)
    np.testing.assert_allclose(p2, lat, rtol=0, atol=tol)


# ---------------------------------------------------------------------------
# sinusoidal
# ---------------------------------------------------------------------------

def test_sinu_modis_grid_constants():
    fwd, inv = gr.parse_proj4(
        "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181 +units=m +no_defs")
    x, _ = fwd(np.array([-180.0]), np.array([0.0]))
    # published MODIS grid x extent and the 18-per-hemisphere tile size
    assert abs(abs(x[0]) - 20015109.354) < 2e-3
    assert abs(abs(x[0]) / 18.0 - 1111950.5196666666) < 1.2e-4
    _, y = fwd(np.array([0.0]), np.array([90.0]))
    assert abs(y[0] - 10007554.677) < 1e-3
    _roundtrip(fwd, inv, LON, LAT)


def test_sinu_ellipsoidal_roundtrip_and_sphere_limit():
    fwd, inv = gr.parse_proj4("+proj=sinu +ellps=WGS84 +lon_0=-100")
    _roundtrip(fwd, inv, LON, LAT, tol=1e-9)
    # e -> 0 limit: the ellipsoidal kernel on a sphere-like ellipsoid
    # converges to the spherical closed form
    a = 6371007.181
    xs, ys = gr.lonlat_to_sinu_sph(LON, LAT, 0.0, radius=a)
    xe, ye = gr.lonlat_to_sinu(LON, LAT, 0.0, ell_a=a, e2=1e-14)
    np.testing.assert_allclose(xe, xs, rtol=0, atol=1e-3)
    np.testing.assert_allclose(ye, ys, rtol=0, atol=1e-3)


def test_sinu_equal_area_jacobian():
    # equal-area property: the forward Jacobian equals the ellipsoidal
    # area element a^2 (1-e2) cos(phi) / (1 - e2 sin^2 phi)^2 per
    # (radian lon x radian lat) — finite-difference check
    a, e2 = gr._WGS84_A, gr._E2
    lon = np.array([12.0, -60.0, 140.0])
    lat = np.array([-47.0, 23.0, 66.0])
    h = 1e-6
    x0, y0 = gr.lonlat_to_sinu(lon, lat, 0.0, ell_a=a, e2=e2)
    xl, yl = gr.lonlat_to_sinu(lon + h, lat, 0.0, ell_a=a, e2=e2)
    xp, yp = gr.lonlat_to_sinu(lon, lat + h, 0.0, ell_a=a, e2=e2)
    hr = np.radians(h)
    jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (hr * hr)
    s = np.sin(np.radians(lat))
    want = a * a * (1.0 - e2) * np.cos(np.radians(lat)) / (1.0 - e2 * s * s) ** 2
    np.testing.assert_allclose(jac, want, rtol=1e-4)


def test_sinu_fail_loud():
    with pytest.raises(ValueError, match="k_0"):
        gr.parse_proj4("+proj=sinu +R=6371007.181 +k_0=0.9")
    with pytest.raises(ValueError, match="lat_0"):
        gr.parse_proj4("+proj=sinu +R=6371007.181 +lat_0=10")
    with pytest.raises(ValueError, match="lat_ts"):
        gr.parse_proj4("+proj=sinu +R=6371007.181 +lat_ts=30")


# ---------------------------------------------------------------------------
# cylindrical equal-area
# ---------------------------------------------------------------------------

def test_cea_ease_grid2_constants():
    fwd, inv = gr.parse_proj4(
        "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 "
        "+units=m +no_defs")
    x, _ = fwd(np.array([-180.0]), np.array([0.0]))
    assert abs(abs(x[0]) - 17367530.445161) < 1e-3
    _, y = fwd(np.array([0.0]), np.array([85.0445664]))
    assert abs(y[0] - 7314540.83) < 1e-3  # EASE2 M-grid edge latitude
    _roundtrip(fwd, inv, LON, LAT, tol=1e-7)


def test_cea_equal_area_jacobian():
    a, e2 = gr._WGS84_A, gr._E2
    k0 = gr.cea_k0(30.0)
    lon = np.array([12.0, -60.0, 140.0])
    lat = np.array([-47.0, 23.0, 66.0])
    h = 1e-6
    x0, y0 = gr.lonlat_to_cea(lon, lat, 0.0, k0)
    xl, _ = gr.lonlat_to_cea(lon + h, lat, 0.0, k0)
    _, yp = gr.lonlat_to_cea(lon, lat + h, 0.0, k0)
    hr = np.radians(h)
    jac = (xl - x0) * (yp - y0) / (hr * hr)  # diagonal Jacobian (cylindrical)
    s = np.sin(np.radians(lat))
    want = a * a * (1.0 - e2) * np.cos(np.radians(lat)) / (1.0 - e2 * s * s) ** 2
    np.testing.assert_allclose(jac, want, rtol=1e-4)


def test_cea_spherical_and_k0_paths():
    # Behrmann (spherical, lat_ts=30): x = R cos(30) lam exactly
    fwd, inv = gr.parse_proj4("+proj=cea +lat_ts=30 +R=6371000")
    x, y = fwd(np.array([90.0]), np.array([0.0]))
    k30 = float(np.cos(np.radians(np.float64(30.0))))
    assert x[0] == 6371000.0 * k30 * np.radians(np.float64(90.0))
    _roundtrip(fwd, inv, LON, LAT)
    # +k_0 spelling (Lambert cylindrical when k_0=1)
    fwd1, inv1 = gr.parse_proj4("+proj=cea +ellps=WGS84 +lon_0=10")
    _roundtrip(fwd1, inv1, LON, LAT, tol=1e-7)


def test_cea_fail_loud():
    with pytest.raises(ValueError, match="lat_ts"):
        gr.parse_proj4("+proj=cea +ellps=WGS84 +lat_ts=30 +k_0=0.9")
    with pytest.raises(ValueError, match="lat_0"):
        gr.parse_proj4("+proj=cea +ellps=WGS84 +lat_0=10")


# ---------------------------------------------------------------------------
# equirectangular (plate carree)
# ---------------------------------------------------------------------------

def test_eqc_plate_carree():
    # proj4 eqc = spherical formulas on the semi-major axis, even with
    # +ellps; +lat_ts scales x by cos(ts), +lat_0 offsets y
    fwd, inv = gr.parse_proj4("+proj=eqc +ellps=WGS84")
    x, y = fwd(np.array([90.0]), np.array([45.0]))
    assert x[0] == gr._WGS84_A * np.radians(np.float64(90.0))
    assert y[0] == gr._WGS84_A * np.radians(np.float64(45.0))
    _roundtrip(fwd, inv, LON, LAT)
    fwd2, _ = gr.parse_proj4("+proj=eqc +ellps=WGS84 +lat_ts=45 +lat_0=10")
    _, y2 = fwd2(np.array([0.0]), np.array([10.0]))
    assert y2[0] == 0.0  # y vanishes at +lat_0
    with pytest.raises(ValueError, match="k_0"):
        gr.parse_proj4("+proj=eqc +ellps=WGS84 +k_0=0.9")
    with pytest.raises(ValueError, match="datum"):
        gr.parse_proj4("+proj=eqc +ellps=WGS84 +towgs84=100,50,20")


def test_sinu_cea_false_origins_and_datum():
    # false origins thread through; ellipsoidal sinu/cea accept +towgs84
    fwd, inv = gr.parse_proj4(
        "+proj=sinu +ellps=bessel +lon_0=10 +x_0=500000 +y_0=-200000 "
        "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    lon = RNG.uniform(-10, 30, 200)
    lat = RNG.uniform(35, 70, 200)
    _roundtrip(fwd, inv, lon, lat, tol=1e-7)
    fwd2, inv2 = gr.parse_proj4(
        "+proj=cea +lat_ts=30 +ellps=intl +x_0=100000 +y_0=7000 "
        "+towgs84=-87,-98,-121")
    _roundtrip(fwd2, inv2, lon, lat, tol=1e-7)
    # and differ measurably from the WGS84 no-shift kernels
    x1, _ = fwd(lon, lat)
    x0, _ = gr.lonlat_to_sinu(lon, lat, 10.0, 500000.0, -200000.0)
    assert np.max(np.abs(x1 - x0)) > 50.0
