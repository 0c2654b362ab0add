"""Hotine oblique Mercator (+proj=omerc, azimuth form) — EPSG methods
9812 (variant A) / 9815 (variant B): the Timbalai 1948 / RSO Borneo,
Malaysia GDM2000 RSO and Alaska zone 1 family.

Goldens: the EPSG Guidance Note 7-2 variant-B worked example (Timbalai
1948 / RSO Borneo (m), EPSG:29873, Everest 1830 1967-definition
ellipsoid) — published E/N to the cm AND the published intermediate
constants (B, A, H, gamma0, lambda0, u_c); conformality by finite
difference; scale k_0 along the initial line at the centre; variant A
(+no_off) differs from variant B by the constant rectified u_c shift;
exact round trips; fail-loud on the unsupported two-point/+no_rot/
sphere forms.

Reference parity: arbitrary CRS objects at
GeoTiffReprojectRasterSource.scala:39."""
import numpy as np
import pytest

from geotrellis_contrib_spark import grid as G

# Timbalai 1948 / RSO Borneo (m) — EPSG:29873 (GN7-2 variant B example)
RSO = ("+proj=omerc +lat_0=4 +lonc=115 "
       "+alpha=53.31582047222222 +gamma=53.13010236111111 "
       "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 "
       "+ellps=evrstSS +units=m +no_defs")

# GN7-2 test point: 5°23'14.1129"N, 115°48'19.8196"E
T_LON = 115.0 + 48.0 / 60.0 + 19.8196 / 3600.0
T_LAT = 5.0 + 23.0 / 60.0 + 14.1129 / 3600.0


def test_omerc_epsg_worked_example():
    fwd, inv = G.parse_proj4(RSO)
    x, y = fwd(T_LON, T_LAT)
    # published to the cm: E = 679245.73, N = 596562.78
    assert abs(float(x) - 679245.73) < 0.01
    assert abs(float(y) - 596562.78) < 0.01
    lo, la = inv(x, y)
    assert abs(float(lo) - T_LON) < 1e-10
    assert abs(float(la) - T_LAT) < 1e-10


def test_omerc_published_constants():
    a, _, e2 = G.ellipsoid_params("evrstSS")
    big_b, big_a, big_h, g0, l0off, uc = G._omerc_params(
        4.0, 53.31582047222222, 0.99984, a, e2)
    # GN7-2 publishes B, A, H(=E·t0^B form), gamma0, lambda0, u_c
    assert abs(big_b - 1.003303209) < 1e-9
    assert abs(big_a - 6376278.686) < 1e-3
    assert abs(big_h - 1.000002991) < 1e-9
    assert abs(np.degrees(g0) - 53.13010234) < 1e-7
    assert abs((115.0 - np.degrees(l0off)) - 109.685521) < 1e-5
    assert abs(uc - 738096.09) < 0.01


def test_omerc_conformality_and_scale():
    """Finite-difference Jacobian: conformal (equal scale along meridian/
    parallel, orthogonal axes) everywhere; scale == k_0 at the centre
    (the initial line touches the centre by construction)."""
    fwd, _ = G.parse_proj4(RSO)
    a, _, e2 = G.ellipsoid_params("evrstSS")
    d = 1e-7
    for lon, lat, k_want in [(115.0, 4.0, 0.99984),
                             (116.5, 5.5, None), (113.8, 3.1, None)]:
        x0, y0 = fwd(lon, lat)
        xe, ye = fwd(lon + d, lat)
        xn, yn = fwd(lon, lat + d)
        s = np.sin(np.radians(lat))
        w = 1.0 - e2 * s * s
        m_lat = a * (1.0 - e2) / w ** 1.5 * np.radians(d)
        m_lon = a * np.cos(np.radians(lat)) / np.sqrt(w) * np.radians(d)
        k_e = float(np.hypot(xe - x0, ye - y0)) / m_lon
        k_n = float(np.hypot(xn - x0, yn - y0)) / m_lat
        assert abs(k_e / k_n - 1.0) < 1e-5          # conformal
        dot = float((xe - x0) * (xn - x0) + (ye - y0) * (yn - y0))
        assert abs(dot) / (m_lon * m_lat) < 1e-5    # orthogonal
        if k_want is not None:
            assert abs(k_e - k_want) < 1e-6


def test_omerc_variant_a_is_constant_offset():
    """+no_off (EPSG 9812 variant A) keeps u unshifted: the two variants
    differ by EXACTLY the rectified (u_c·sin γc, u_c·cos γc) vector at
    every point."""
    fwd_b, _ = G.parse_proj4(RSO)
    fwd_a, inv_a = G.parse_proj4(RSO + " +no_off")
    a, _, e2 = G.ellipsoid_params("evrstSS")
    _, _, _, _, _, uc = G._omerc_params(4.0, 53.31582047222222, 0.99984,
                                        a, e2)
    gc = np.radians(53.13010236111111)
    lons = np.array([114.2, 115.0, T_LON, 116.9])
    lats = np.array([3.4, 4.0, T_LAT, 6.2])
    xb, yb = fwd_b(lons, lats)
    xa, ya = fwd_a(lons, lats)
    assert np.allclose(xa - xb, uc * np.sin(gc), rtol=0, atol=1e-6)
    assert np.allclose(ya - yb, uc * np.cos(gc), rtol=0, atol=1e-6)
    lo, la = inv_a(xa, ya)
    assert np.allclose(lo, lons, atol=1e-10)
    assert np.allclose(la, lats, atol=1e-10)


def test_omerc_roundtrip_grid():
    fwd, inv = G.parse_proj4(RSO)
    lons, lats = np.meshgrid(np.linspace(112.0, 119.0, 9),
                             np.linspace(0.5, 7.5, 9))
    x, y = fwd(lons.ravel(), lats.ravel())
    lo, la = inv(x, y)
    assert np.allclose(lo, lons.ravel(), atol=1e-9)
    assert np.allclose(la, lats.ravel(), atol=1e-9)


def test_omerc_fail_loud():
    with pytest.raises(ValueError):   # two-point form unsupported
        G.parse_proj4("+proj=omerc +lat_0=4 +lonc=115 +k_0=1 "
                      "+ellps=evrstSS +units=m")
    with pytest.raises(ValueError):   # +no_rot unsupported
        G.parse_proj4(RSO + " +no_rot")
    with pytest.raises(ValueError):   # +lon_0 is not the omerc key
        G.parse_proj4(RSO.replace("+lonc=115", "+lonc=115 +lon_0=115"))
    with pytest.raises(ValueError):   # sphere unsupported
        G.parse_proj4(RSO.replace("+ellps=evrstSS", "+R=6371000"))
    with pytest.raises(ValueError):   # degenerate alpha
        G.parse_proj4(RSO.replace("+alpha=53.31582047222222", "+alpha=90"))
    with pytest.raises(ValueError):   # omerc keys on other projections
        G.parse_proj4("+proj=merc +lonc=10 +units=m")
