"""Swiss oblique Mercator (+proj=somerc) — the CH1903/LV03 (EPSG:21781)
and CH1903+/LV95 (EPSG:2056) national-grid method.

Goldens: the projection CENTRE maps to the false origin exactly (the
defining property — Bern old observatory = 600000/200000 in LV03); scale
at the centre equals k_0 and the projection is conformal (finite-
difference checks against the Bessel metric); on a sphere the Gauss chain
collapses to the identity and the kernel must equal an INDEPENDENTLY
coded rotated-sphere Mercator; exact round trips.

Reference parity: arbitrary CRS objects at
GeoTiffReprojectRasterSource.scala:39."""
import numpy as np
import pytest

from geotrellis_contrib_spark import grid as G

LV03 = ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel +units=m +no_defs")


def test_somerc_centre_is_false_origin():
    fwd, inv = G.parse_proj4(LV03)
    x, y = fwd(7.439583333333333, 46.95240555555556)
    assert abs(float(x) - 600000.0) < 1e-5
    assert abs(float(y) - 200000.0) < 1e-5
    # LV95 variant: same method, shifted false origin
    f95, _ = G.parse_proj4(LV03.replace("+x_0=600000", "+x_0=2600000")
                           .replace("+y_0=200000", "+y_0=1200000"))
    x, y = f95(7.439583333333333, 46.95240555555556)
    assert abs(float(x) - 2600000.0) < 1e-5
    assert abs(float(y) - 1200000.0) < 1e-5


def test_somerc_scale_and_conformality():
    fwd, _ = G.parse_proj4(LV03)
    a, _, e2 = G.ellipsoid_params("bessel")
    d = 1e-7
    for lon, lat, k_tol in [(7.439583333333333, 46.95240555555556, 1e-6),
                            (8.2, 47.1, None), (6.5, 46.2, None)]:
        x0, y0 = (float(v) for v in fwd(lon, lat))
        xe, ye = (float(v) for v in fwd(lon + d, lat))
        xn, yn = (float(v) for v in fwd(lon, lat + d))
        s = np.sin(np.radians(lat))
        nrad = a / np.sqrt(1.0 - e2 * s * s)
        mrad = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        ke = np.hypot(xe - x0, ye - y0) \
            / (np.radians(d) * nrad * np.cos(np.radians(lat)))
        kn = np.hypot(xn - x0, yn - y0) / (np.radians(d) * mrad)
        # conformal: the two principal scales agree
        assert abs(ke / kn - 1.0) < 1e-5
        # and meridian/parallel images are orthogonal
        dot = ((xe - x0) * (xn - x0) + (ye - y0) * (yn - y0)) \
            / (np.hypot(xe - x0, ye - y0) * np.hypot(xn - x0, yn - y0))
        assert abs(dot) < 1e-5
        if k_tol is not None:  # scale at the centre == k_0 = 1
            assert abs(ke - 1.0) < k_tol and abs(kn - 1.0) < k_tol


def test_somerc_k0_scales_lengths():
    f1, _ = G.parse_proj4(LV03)
    f2, i2 = G.parse_proj4(LV03.replace("+k_0=1", "+k_0=0.5"))
    x1, y1 = f1(8.0, 47.0)
    x2, y2 = f2(8.0, 47.0)
    assert abs((float(x2) - 600000.0) - 0.5 * (float(x1) - 600000.0)) < 1e-6
    assert abs((float(y2) - 200000.0) - 0.5 * (float(y1) - 200000.0)) < 1e-6
    lon, lat = i2(x2, y2)
    assert abs(float(lon) - 8.0) < 1e-12 and abs(float(lat) - 47.0) < 1e-12


def test_somerc_sphere_equals_independent_rotated_mercator():
    fs, _ = G.parse_proj4("+proj=somerc +lat_0=45 +lon_0=10 +R=6370000 "
                          "+units=m")
    radius, b0 = 6370000.0, np.radians(45.0)

    def indep(lon, lat):
        lam = np.radians(lon - 10.0)
        phi = np.radians(lat)
        bb = np.arcsin(np.cos(b0) * np.sin(phi)
                       - np.sin(b0) * np.cos(phi) * np.cos(lam))
        ll = np.arctan2(np.cos(phi) * np.sin(lam),
                        np.cos(b0) * np.cos(phi) * np.cos(lam)
                        + np.sin(b0) * np.sin(phi))
        return radius * ll, radius * np.arctanh(np.sin(bb))

    for lon, lat in [(12.0, 46.5), (7.5, 43.0), (10.0, 45.0), (14.0, 49.0)]:
        x, y = fs(lon, lat)
        xi, yi = indep(lon, lat)
        assert abs(float(x) - xi) < 1e-6
        assert abs(float(y) - yi) < 1e-6


def test_somerc_roundtrip():
    fwd, inv = G.parse_proj4(LV03)
    lons = np.linspace(5.5, 11.0, 23)
    lats = np.linspace(45.5, 48.0, 19)
    lo, la = np.meshgrid(lons, lats)
    x, y = fwd(lo.ravel(), la.ravel())
    lo2, la2 = inv(x, y)
    assert np.abs(lo2 - lo.ravel()).max() < 1e-11
    assert np.abs(la2 - la.ravel()).max() < 1e-11


def test_somerc_fail_loud_on_stray_params():
    with pytest.raises(ValueError, match="lat_ts"):
        G.parse_proj4("+proj=somerc +lat_0=46 +lat_ts=30 +units=m")
    with pytest.raises(ValueError, match="zone"):
        G.parse_proj4("+proj=somerc +lat_0=46 +zone=5 +units=m")
