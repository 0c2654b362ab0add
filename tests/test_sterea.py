"""EPSG oblique (double) stereographic (+proj=sterea, the RD New /
EPSG:28992 method) and the +proj=utm shorthand.

Golden: the PUBLISHED EPSG Guidance Note 7-2 worked example for
Amersfoort / RD New — phi 53N, lam 6E on Bessel -> E 196105.283,
N 557057.739 (k0=0.9999079, FE=155000, FN=463000).

Reference parity: arbitrary CRS objects at
vlm/src/main/scala/geotrellis/contrib/vlm/geotiff/GeoTiffReprojectRasterSource.scala:39.
"""
import numpy as np
import pytest

from geotrellis_contrib_spark import grid as gr

RD_A = 6377397.155
RD_F = 1.0 / 299.15281
RD_E2 = RD_F * (2.0 - RD_F)
RD_LAT0 = 52.0 + 9.0 / 60.0 + 22.178 / 3600.0
RD_LON0 = 5.0 + 23.0 / 60.0 + 15.500 / 3600.0
RD_K0, RD_FE, RD_FN = 0.9999079, 155000.0, 463000.0

RNG = np.random.default_rng(28992)


def test_sterea_epsg_worked_example():
    x, y = gr.lonlat_to_sterea(np.array([6.0]), np.array([53.0]),
                               RD_LON0, RD_LAT0, RD_K0, RD_FE, RD_FN,
                               RD_A, RD_E2)
    assert abs(x[0] - 196105.283) < 1e-3
    assert abs(y[0] - 557057.739) < 1e-3
    # the origin maps to the false origin exactly
    x0, y0 = gr.lonlat_to_sterea(np.array([RD_LON0]), np.array([RD_LAT0]),
                                 RD_LON0, RD_LAT0, RD_K0, RD_FE, RD_FN,
                                 RD_A, RD_E2)
    assert x0[0] == RD_FE and y0[0] == RD_FN


def test_sterea_roundtrip_and_parse():
    crs = (f"+proj=sterea +lat_0={RD_LAT0!r} +lon_0={RD_LON0!r} "
           f"+k_0=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel "
           f"+units=m +no_defs")
    fwd, inv = gr.parse_proj4(crs)
    lon = RNG.uniform(3.0, 7.5, 500)
    lat = RNG.uniform(50.5, 53.7, 500)
    l2, p2 = inv(*fwd(lon, lat))
    np.testing.assert_allclose(l2, lon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(p2, lat, rtol=0, atol=1e-9)
    # parse dispatch reproduces the kernel bitwise (registry bessel params:
    # rf=299.1528128, the PROJ value — the worked-example golden above uses
    # GN7-2's rounded 299.15281, 1e-9 relative apart, both sub-mm)
    ra, _, re2 = gr.ellipsoid_params("bessel")
    xk, yk = gr.lonlat_to_sterea(lon, lat, RD_LON0, RD_LAT0, RD_K0,
                                 RD_FE, RD_FN, ra, re2)
    xp, yp = fwd(lon, lat)
    assert np.array_equal(xp, xk) and np.array_equal(yp, yk)
    # far-field round trip (the gate's relocated footprint geometry)
    lonf = RNG.uniform(-78.0, -45.0, 300)
    latf = RNG.uniform(22.0, 41.0, 300)
    fwd2, inv2 = gr.parse_proj4(
        "+proj=sterea +lat_0=32 +lon_0=-62 +k_0=0.9999079 +x_0=155000 "
        "+y_0=463000 +ellps=bessel +units=m +no_defs")
    l3, p3 = inv2(*fwd2(lonf, latf))
    np.testing.assert_allclose(l3, lonf, rtol=0, atol=1e-9)
    np.testing.assert_allclose(p3, latf, rtol=0, atol=1e-9)


def test_sterea_conformality():
    # conformal: local scale isotropic, right angles preserved (finite diff)
    fwd, _ = gr.parse_proj4(
        "+proj=sterea +lat_0=52 +lon_0=5 +ellps=bessel")
    lon = np.array([4.0, 6.5]); lat = np.array([51.0, 53.0])
    h = 1e-6
    x0, y0 = fwd(lon, lat)
    xl, yl = fwd(lon + h, lat)
    xp, yp = fwd(lon, lat + h)
    du = np.array([xl - x0, yl - y0]) / np.cos(np.radians(lat))
    dv = np.array([xp - x0, yp - y0])
    # equal magnitudes (isotropy, to the ellipsoid's M/N ratio ~ 1 + O(e2))
    ru = np.hypot(*du); rv = np.hypot(*dv)
    np.testing.assert_allclose(ru / rv, 1.0, atol=4e-3)
    # orthogonality
    dot = du[0] * dv[0] + du[1] * dv[1]
    assert np.all(np.abs(dot / (ru * rv)) < 1e-4)


def test_sterea_sphere_reduces_to_stere():
    # on a sphere the conformal-sphere chain is the identity -> the
    # spherical oblique stere kernel, bitwise (parse dispatches there)
    fwd, _ = gr.parse_proj4("+proj=sterea +lat_0=40 +lon_0=-60 +R=6371000")
    xs, ys = gr.lonlat_to_stere_sph(LON_S, LAT_S, -60.0, 40.0,
                                    0.0, 0.0, 6371000.0, 1.0)
    xp, yp = fwd(LON_S, LAT_S)
    assert np.array_equal(xp, xs) and np.array_equal(yp, ys)


LON_S = RNG.uniform(-170.0, 170.0, 200)
LAT_S = RNG.uniform(-80.0, 80.0, 200)


# ---------------------------------------------------------------------------
# +proj=utm shorthand
# ---------------------------------------------------------------------------

def test_proj4_utm_alias_matches_utm_kernel():
    fwd, inv = gr.parse_proj4("+proj=utm +zone=33 +ellps=WGS84")
    lon = RNG.uniform(12.0, 18.0, 300)
    lat = RNG.uniform(-80.0, 84.0, 300)
    e1, n1 = fwd(lon, lat)
    e2, n2 = gr.lonlat_to_utm(lon, lat, 33)
    assert np.array_equal(e1, e2) and np.array_equal(n1, n2)
    b = inv(e1, n1)
    b2 = gr.utm_to_lonlat(e1, n1, 33)
    assert np.array_equal(b[0], b2[0]) and np.array_equal(b[1], b2[1])
    # +south adds the 10,000,000 m false northing
    fs, _ = gr.parse_proj4("+proj=utm +zone=33 +south +ellps=WGS84")
    es, ns = fs(lon, lat)
    np.testing.assert_array_equal(ns, n1 + 10000000.0)
    np.testing.assert_array_equal(es, e1)


def test_proj4_utm_fail_loud():
    with pytest.raises(ValueError, match="zone"):
        gr.parse_proj4("+proj=utm +ellps=WGS84")          # missing zone
    with pytest.raises(ValueError, match="1..60"):
        gr.parse_proj4("+proj=utm +zone=61 +ellps=WGS84")
    with pytest.raises(ValueError, match="1..60"):
        gr.parse_proj4("+proj=utm +zone=12.5 +ellps=WGS84")
    with pytest.raises(ValueError, match="conflicts"):
        gr.parse_proj4("+proj=utm +zone=33 +k_0=1.0")
    with pytest.raises(ValueError, match="sphere"):
        gr.parse_proj4("+proj=utm +zone=33 +R=6371000")
    with pytest.raises(ValueError, match="zone/\\+south"):
        gr.parse_proj4("+proj=tmerc +zone=33 +ellps=WGS84")
