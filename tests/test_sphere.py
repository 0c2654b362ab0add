"""Spherical projection forms (Snyder closed forms) — tmerc/laea/aea/lcc.

Three independent checks per projection:
  1. Snyder PP 1395 worked examples (R=1 / R=3 unit-sphere goldens).
  2. Round-trip identity fwd->inv over a spread of points.
  3. e->0 limit: the spherical closed form must agree with the ellipsoidal
     kernel evaluated at f=1e-12 to sub-mm — the two code paths implement
     the same projection family.
Plus parse_proj4 dispatch (+R / +a=+b / +ellps=sphere select the spherical
forms; +k_0 fail-loud where the kernel would ignore it).

Reference parity: arbitrary proj4 CRS objects accepted at
/root/reference/vlm/src/main/scala/geotrellis/contrib/vlm/geotiff/
GeoTiffReprojectRasterSource.scala:39.
"""

import numpy as np
import pytest

from geotrellis_contrib_spark import grid as GR

LONS = np.array([-75.0, -40.0, -62.0, -78.9, -45.5])
LATS = np.array([35.0, 41.0, 32.0, 40.9, 33.3])


# --- Snyder worked examples (USGS PP 1395, Appendix A) ----------------------

def test_lcc_sphere_snyder_example():
    # phi1=33, phi2=45, phi0=23, lam0=-96, point (35N, 75W), R=1
    n, rf, rho0 = GR.lcc_sph_constants(23.0, 33.0, 45.0, 1.0)
    assert n == pytest.approx(0.6304777, abs=1e-7)
    assert rf == pytest.approx(1.9550002, abs=1e-7)
    assert rho0 == pytest.approx(1.5071429, abs=1e-7)
    x, y = GR.lonlat_to_lcc_sph(-75.0, 35.0, -96.0, 23.0, 33.0, 45.0,
                                0.0, 0.0, 1.0)
    assert float(x) == pytest.approx(0.2966785, abs=1e-7)
    assert float(y) == pytest.approx(0.2462112, abs=1e-7)


def test_albers_sphere_snyder_example():
    # phi1=29.5, phi2=45.5, phi0=23, lam0=-96, point (35N, 75W), R=1
    n, _, rho0 = GR.albers_sph_constants(23.0, 29.5, 45.5, 1.0)
    assert n == pytest.approx(0.6028370, abs=1e-7)
    assert rho0 == pytest.approx(1.5562263, abs=1e-7)
    x, y = GR.lonlat_to_albers_sph(-75.0, 35.0, -96.0, 23.0, 29.5, 45.5,
                                   0.0, 0.0, 1.0)
    assert float(x) == pytest.approx(0.2952720, abs=1e-7)
    assert float(y) == pytest.approx(0.2416774, abs=1e-7)


# --- round trips -------------------------------------------------------------

@pytest.mark.parametrize("fwd,inv,args", [
    (GR.lonlat_to_tmerc_sph, GR.tmerc_sph_to_lonlat,
     (-62.0, 0.9996, 1e5, -2e5, 30.0, 6370997.0)),
    (GR.lonlat_to_laea_sph, GR.laea_sph_to_lonlat,
     (-62.0, 35.0, 1e5, -2e5, 6370997.0)),
])
def test_roundtrip_azimuthal_family(fwd, inv, args):
    x, y = fwd(LONS, LATS, *args)
    lon, lat = inv(x, y, *args)
    np.testing.assert_allclose(lon, LONS, atol=1e-9)
    np.testing.assert_allclose(lat, LATS, atol=1e-9)


@pytest.mark.parametrize("fwd,inv", [
    (GR.lonlat_to_albers_sph, GR.albers_sph_to_lonlat),
    (GR.lonlat_to_lcc_sph, GR.lcc_sph_to_lonlat),
])
def test_roundtrip_conic_family(fwd, inv):
    args = (-62.0, 23.0, 33.0, 45.0, 1e5, -2e5, 6370997.0)
    x, y = fwd(LONS, LATS, *args)
    lon, lat = inv(x, y, *args)
    np.testing.assert_allclose(lon, LONS, atol=1e-9)
    np.testing.assert_allclose(lat, LATS, atol=1e-9)


def test_laea_center_is_origin_exact():
    x, y = GR.lonlat_to_laea_sph(-62.0, 35.0, -62.0, 35.0, 0.0, 0.0)
    assert float(x) == 0.0 and float(y) == 0.0
    lon, lat = GR.laea_sph_to_lonlat(0.0, 0.0, -62.0, 35.0, 0.0, 0.0)
    assert float(lon) == -62.0 and float(lat) == 35.0


def test_lcc_1sp_degenerates_to_sin_phi1():
    n, _, _ = GR.lcc_sph_constants(33.0, 33.0, 33.0, 1.0)
    assert n == pytest.approx(np.sin(np.radians(33.0)), abs=1e-15)


# --- e->0 limit vs the ellipsoidal kernels ----------------------------------

_F = 1e-12
_A = 6370997.0
_E2 = _F * (2.0 - _F)


@pytest.mark.parametrize("name,sph,ell,tol_m", [
    ("tmerc",
     lambda: GR.lonlat_to_tmerc_sph(LONS, LATS, -62.0, 0.9996, 1e5, -2e5,
                                    30.0, _A),
     lambda: GR.lonlat_to_tmerc(LONS, LATS, -62.0, 0.9996, 1e5, -2e5,
                                30.0, _A, _F), 1e-4),
    ("laea",
     lambda: GR.lonlat_to_laea_sph(LONS, LATS, -62.0, 35.0, 1e5, -2e5, _A),
     lambda: GR.lonlat_to_laea(LONS, LATS, -62.0, 35.0, 1e5, -2e5,
                               _A, _E2), 1e-3),
    ("aea",
     lambda: GR.lonlat_to_albers_sph(LONS, LATS, -62.0, 23.0, 33.0, 45.0,
                                     1e5, -2e5, _A),
     lambda: GR.lonlat_to_albers(LONS, LATS, -62.0, 23.0, 33.0, 45.0,
                                 1e5, -2e5, _A, _E2), 1e-3),
    ("lcc",
     lambda: GR.lonlat_to_lcc_sph(LONS, LATS, -62.0, 23.0, 33.0, 45.0,
                                  1e5, -2e5, _A),
     lambda: GR.lonlat_to_lcc(LONS, LATS, -62.0, 23.0, 33.0, 45.0,
                              1e5, -2e5, _A, _E2), 1e-4),
])
def test_sphere_is_e0_limit_of_ellipsoidal(name, sph, ell, tol_m):
    xs, ys = sph()
    xe, ye = ell()
    assert np.max(np.abs(xs - xe)) < tol_m, name
    assert np.max(np.abs(ys - ye)) < tol_m, name


# --- parse_proj4 dispatch ----------------------------------------------------

@pytest.mark.parametrize("crs", [
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 +x_0=500000 "
    "+y_0=-300000 +R=6370997 +units=m +no_defs",
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-62 +a=6370997 "
    "+b=6370997 +units=m +no_defs",
    "+proj=laea +lat_0=35 +lon_0=-62 +x_0=10000 +ellps=sphere +units=m",
    "+proj=tmerc +lat_0=30 +lon_0=-62 +k_0=0.9996 +x_0=100000 "
    "+y_0=-200000 +R=6370997 +units=m +no_defs",
])
def test_parse_proj4_spherical_roundtrip(crs):
    fwd, inv = GR.parse_proj4(crs)
    x, y = fwd(LONS, LATS)
    lon, lat = inv(x, y)
    np.testing.assert_allclose(lon, LONS, atol=1e-9)
    np.testing.assert_allclose(lat, LATS, atol=1e-9)


def test_parse_proj4_spherical_lcc_matches_kernel_bitwise():
    fwd, _ = GR.parse_proj4(
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 +x_0=500000 "
        "+y_0=-300000 +R=6370997 +units=m +no_defs")
    x1, y1 = fwd(LONS, LATS)
    x2, y2 = GR.lonlat_to_lcc_sph(LONS, LATS, -62.0, 23.0, 33.0, 45.0,
                                  500000.0, -300000.0, 6370997.0, 1.0)
    assert np.array_equal(x1, x2) and np.array_equal(y1, y2)


@pytest.mark.parametrize("crs", [
    # k_0 on projections whose kernels would silently ignore it
    "+proj=laea +lat_0=35 +lon_0=-62 +k_0=0.9 +R=6370997",
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-62 +k_0=0.9 "
    "+R=6370997",
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 +k_0=0.9 "
    "+ellps=WGS84",
    # datum shift on a sphere is meaningless
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 +R=6370997 "
    "+towgs84=1,2,3",
])
def test_parse_proj4_fail_loud(crs):
    with pytest.raises(ValueError):
        GR.parse_proj4(crs)


def test_parse_proj4_ellipsoidal_paths_unchanged():
    # the spherical dispatch must not perturb the ellipsoidal branch:
    # named-registry LCC (EPSG:2154 constants) still bit-equal via proj4
    fwd, _ = GR.parse_proj4(
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 "
        "+y_0=6600000 +ellps=GRS80 +units=m +no_defs")
    x1, y1 = fwd(LONS, LATS)
    x2, y2 = GR.lonlat_to_lcc(LONS, LATS, 3.0, 46.5, 49.0, 44.0,
                              700000.0, 6600000.0)
    assert np.array_equal(x1, x2) and np.array_equal(y1, y2)


# --- stereographic (Snyder ch. 21) -------------------------------------------

def test_stere_polar_snyder_example():
    # Snyder PP1395 polar stereographic example: International ellipsoid,
    # SOUTH aspect, lat_ts=-71, lon0=-100, point (75S, 150E):
    # x = -1,540,033.6  y = -560,526.4
    a, f, e2 = GR.ellipsoid_params("intl")
    rf = GR.stere_polar_rf(lat_ts=-71.0, ell_a=a, e2=e2)
    x, y = GR.lonlat_to_stere_polar(150.0, -75.0, -100.0, rf,
                                    0.0, 0.0, north=False, e2=e2)
    assert float(x) == pytest.approx(-1540033.6, abs=0.1)
    assert float(y) == pytest.approx(-560526.4, abs=0.1)
    lon, lat = GR.stere_polar_to_lonlat(x, y, -100.0, rf,
                                        0.0, 0.0, north=False, e2=e2)
    assert float(lon) == pytest.approx(150.0, abs=1e-9)
    assert float(lat) == pytest.approx(-75.0, abs=1e-9)


@pytest.mark.parametrize("crs", [
    # EPSG:3413 (NSIDC north) and EPSG:5041 (UPS north, k_0 scaling)
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=2000000 "
    "+y_0=-3000000 +ellps=WGS84 +units=m +no_defs",
    "+proj=stere +lat_0=90 +k_0=0.994 +lon_0=0 +x_0=2000000 "
    "+y_0=2000000 +ellps=WGS84 +units=m +no_defs",
    # EPSG:3031-style south
    "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84 +units=m",
    # oblique spherical
    "+proj=stere +lat_0=40 +lon_0=-62 +R=6370997 +k_0=0.9",
])
def test_parse_proj4_stere_roundtrip(crs):
    fwd, inv = GR.parse_proj4(crs)
    lats = -LATS if "lat_0=-90" in crs else LATS
    x, y = fwd(LONS, lats)
    lon, lat = inv(x, y)
    np.testing.assert_allclose(lon, LONS, atol=1e-9)
    np.testing.assert_allclose(lat, lats, atol=1e-9)


@pytest.mark.parametrize("crs", [
    # oblique ellipsoidal stere = the double-stereographic family: raise
    "+proj=stere +lat_0=52.15 +lon_0=5.38 +k_0=0.9999 +ellps=bessel",
    # lat_ts + k_0 together is ambiguous
    "+proj=stere +lat_0=90 +lat_ts=70 +k_0=0.994 +ellps=WGS84",
    # lat_ts on a sphere
    "+proj=stere +lat_0=90 +lat_ts=70 +R=6370997",
])
def test_parse_proj4_stere_fail_loud(crs):
    with pytest.raises(ValueError):
        GR.parse_proj4(crs)
