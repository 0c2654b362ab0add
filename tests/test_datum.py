"""Datum shifts & non-WGS84 ellipsoids: 7-parameter Helmert
(position-vector, exact matrix inverse), geodetic<->geocentric, and the
EPSG:27700 OSGB national-grid chain (tmerc on Airy + towgs84) through
grid.parse_proj4 — reference parity with accepting arbitrary proj4 CRS
objects (/root/reference/vlm/.../GeoTiffReprojectRasterSource.scala:39).

Goldens are public: the Ordnance Survey "A guide to coordinate systems in
Great Britain" worked example (OSGB36 geodetic -> National Grid), the Airy
ellipsoid defining constants, and the ~102 m Greenwich meridian offset."""

import numpy as np
import pytest

from geotrellis_contrib_spark import grid as gr

RNG = np.random.default_rng(271828)

OSGB_TOWGS84 = (446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489)
EPSG_27700 = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
              "+y_0=-100000 +ellps=airy "
              "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 "
              "+units=m +no_defs")


def test_airy_defining_constants():
    # OSGB36: a = 6377563.396, b = 6356256.909 (published to the mm)
    a, f, e2 = gr.ellipsoid_params("airy")
    assert a == 6377563.396
    assert abs(a * (1.0 - f) - 6356256.909) < 5e-4
    # clrk66 is defined by (a, b) = (6378206.4, 6356583.8)
    ca, cf, _ = gr.ellipsoid_params("clrk66")
    assert abs(ca * (1.0 - cf) - 6356583.8) < 5e-4


def test_os_worked_example_tmerc_airy():
    """OS guide worked example: OSGB36 geodetic 52d39'27.2531\"N,
    1d43'4.5177\"E -> E 651409.903, N 313177.270 (national grid constants
    lat_0=49 lon_0=-2 k=0.9996012717 x_0=400000 y_0=-100000). Krueger n^6
    vs the OS Redfearn series agree sub-mm."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    a, f, _ = gr.ellipsoid_params("airy")
    e, n = gr.lonlat_to_tmerc(np.array([lon]), np.array([lat]), -2.0,
                              k0=0.9996012717, x0=400000.0, y0=-100000.0,
                              lat0=49.0, ell_a=a, ell_f=f)
    assert abs(e[0] - 651409.903) < 0.005
    assert abs(n[0] - 313177.270) < 0.005


def test_geocentric_roundtrip_all_ellipsoids():
    lon = RNG.uniform(-180, 180, 400)
    lat = RNG.uniform(-89, 89, 400)
    for name in gr.ELLIPSOIDS:
        a, f, e2 = gr.ellipsoid_params(name)
        x, y, z = gr.geodetic_to_geocentric(lon, lat, a, e2)
        lon2, lat2 = gr.geocentric_to_geodetic(x, y, z, a, e2)
        np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-9, err_msg=name)
        np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-9, err_msg=name)


def test_helmert_identity_and_translation():
    a, f, e2 = gr.ellipsoid_params("WGS84")
    # zero shift => identity matrix and zero translation
    mat, inv, t = gr.helmert_matrices(0.0, 0.0, 0.0)
    assert np.array_equal(mat, np.eye(3)) and np.array_equal(inv, np.eye(3))
    assert np.array_equal(t, np.zeros(3))
    # translation-only: geocentric coordinates move by exactly (dx, dy, dz)
    x, y, z = gr.geodetic_to_geocentric(np.array([12.0]), np.array([47.0]))
    mat, _, t = gr.helmert_matrices(100.0, -200.0, 50.0)
    x2, y2, z2 = gr.helmert_apply(x, y, z, mat, t)
    assert x2[0] - x[0] == 100.0 and y2[0] - y[0] == -200.0 and z2[0] - z[0] == 50.0


def test_helmert_exact_inverse():
    # the true 3x3 inverse (not the negate-the-parameters approximation):
    # forward o inverse == identity to machine precision even with the
    # full 7-parameter OSGB shift
    mat, inv, t = gr.helmert_matrices(*OSGB_TOWGS84)
    assert np.max(np.abs(inv @ mat - np.eye(3))) < 1e-15
    lon = RNG.uniform(-10, 5, 200)
    lat = RNG.uniform(48, 62, 200)
    a, f, e2 = gr.ellipsoid_params("airy")
    dlon, dlat = gr.wgs84_to_datum(lon, lat, OSGB_TOWGS84, a, e2)
    lon2, lat2 = gr.datum_to_wgs84(dlon, dlat, OSGB_TOWGS84, a, e2)
    # 2D convention drops ellipsoidal height between the legs: the ~100 m
    # induced height re-enters through the slightly different normal
    # directions -> mm-scale (1e-8 deg) roundtrip floor, inherent to every
    # 2D Helmert implementation, not an iteration-count artifact
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-7)


def test_greenwich_meridian_offset():
    """The OSGB36 zero meridian (Airy transit circle) lies ~102 m east of
    the WGS84 zero meridian: a WGS84 lon-0 point near Greenwich gets an
    OSGB36 longitude of ~ +5.5 arcsec (the 7-parameter Helmert reproduces
    the published offset to the accuracy of the national 7-param set)."""
    a, f, e2 = gr.ellipsoid_params("airy")
    dlon, dlat = gr.wgs84_to_datum(np.array([0.0]), np.array([51.4778]),
                                   OSGB_TOWGS84, a, e2)
    assert 0.0012 < dlon[0] < 0.0020       # 4.3" .. 7.2" east
    assert abs(dlat[0] - 51.4778) < 0.001  # latitude moves < ~110 m


def test_epsg_27700_roundtrip_and_observatory():
    fwd, inv = gr.parse_proj4(EPSG_27700)
    lon = RNG.uniform(-8, 2, 300)
    lat = RNG.uniform(49.5, 61, 300)
    e, n = fwd(lon, lat)
    lon2, lat2 = inv(e, n)
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-7)
    # Royal Observatory Greenwich: WGS84 (-0.0015, 51.4778) sits at national
    # grid ~ TQ 3888 7732 (E 538880..538895, N 177300..177360)
    e, n = fwd(np.array([-0.0015]), np.array([51.4778]))
    assert 538850.0 < e[0] < 538950.0
    assert 177250.0 < n[0] < 177400.0


def test_datum_name_resolution():
    # +datum=OSGB36 == +ellps=airy +towgs84=<OS params>
    s_datum = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
               "+y_0=-100000 +datum=OSGB36 +units=m +no_defs")
    f1, i1 = gr.parse_proj4(s_datum)
    f2, i2 = gr.parse_proj4(EPSG_27700)
    lon = RNG.uniform(-6, 2, 100)
    lat = RNG.uniform(50, 59, 100)
    assert all(np.array_equal(u, v) for u, v in zip(f1(lon, lat), f2(lon, lat)))


def test_bessel_lcc_roundtrip():
    # a second non-WGS84 ellipsoid through the conformal conic kernel
    s = ("+proj=lcc +lat_0=47 +lat_1=46 +lat_2=49 +lon_0=13.33 "
         "+x_0=400000 +y_0=400000 +ellps=bessel "
         "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232 "
         "+units=m +no_defs")
    fwd, inv = gr.parse_proj4(s)
    lon = RNG.uniform(9, 18, 200)
    lat = RNG.uniform(46, 49.5, 200)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-7)


def test_merc_sphere_semantics():
    # ADVICE r4: lone +a is a SPHERE of radius a (proj4 semantics), not a
    # silent WGS84 ellipsoid projection
    fwd, _ = gr.parse_proj4("+proj=merc +a=6371000")
    x, y = fwd(np.array([90.0]), np.array([0.0]))
    assert abs(x[0] - np.pi / 2.0 * 6371000.0) < 1e-6 and y[0] == 0.0
    # +a=+b compares NUMERICALLY ('+b=6378137.0' == '+a=6378137')
    f2, _ = gr.parse_proj4("+proj=merc +a=6378137 +b=6378137.0")
    xs, ys = f2(np.array([10.0]), np.array([40.0]))
    xr, yr = gr.lonlat_to_mercator(np.array([10.0]), np.array([40.0]))
    np.testing.assert_allclose(xs, xr, rtol=1e-15)
    np.testing.assert_allclose(ys, yr, rtol=1e-12)
    # +b without +a is malformed
    with pytest.raises(ValueError, match=r"\+b without \+a"):
        gr.parse_proj4("+proj=merc +b=6371000")
    # unequal a/b: true ellipsoidal mercator on THAT ellipsoid (Airy here
    # differs from WGS84 by ~400 m of y at lat 45 — the smaller a and the
    # smaller e^2 partially cancel)
    f3, i3 = gr.parse_proj4("+proj=merc +a=6377563.396 +b=6356256.909")
    fw, _ = gr.parse_proj4("+proj=merc +ellps=WGS84")
    ya = f3(np.array([0.0]), np.array([45.0]))[1]
    yw = fw(np.array([0.0]), np.array([45.0]))[1]
    assert abs(ya[0] - yw[0]) > 100.0
    lon = RNG.uniform(-170, 170, 100)
    lat = RNG.uniform(-80, 80, 100)
    l2 = i3(*f3(lon, lat))
    np.testing.assert_allclose(l2[0], lon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(l2[1], lat, rtol=0, atol=1e-9)


def test_datum_fail_loud():
    for bad in [
        "+proj=tmerc +lat_0=49 +lon_0=-2 +datum=NAD27",   # grid-file datum
        "+proj=tmerc +lon_0=0 +ellps=hough",              # unknown ellipsoid
        "+proj=merc +R=6371000 +towgs84=100,0,0",         # shift on a sphere
        "+proj=tmerc +lon_0=0 +towgs84=1,2",              # malformed towgs84
    ]:
        with pytest.raises(ValueError):
            gr.parse_proj4(bad)
