"""proj4-string CRS dispatch: arbitrary parallels/centers onto the Snyder/
Krueger kernels (grid.parse_proj4), plus bit-identity of the UTM->tmerc
refactor and parity with the named EPSG registry."""

import numpy as np
import pytest

from geotrellis_contrib_spark import grid as gr

RNG = np.random.default_rng(42)
LON = RNG.uniform(-170, 170, 500)
LAT = RNG.uniform(-80, 80, 500)


def _roundtrip(fwd, inv, lon, lat, tol=1e-12):
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=tol)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=tol)


def test_proj4_nonregistry_roundtrips():
    # three parameterizations that exist in NO EPSG registry entry of the
    # engine: shifted LAEA, custom-parallel Albers, custom tmerc with
    # non-unit scale and false origin at a nonzero lat_0
    cases = [
        ("+proj=laea +lat_0=48 +lon_0=8 +x_0=4000000 +y_0=2800000 "
         "+ellps=WGS84 +units=m +no_defs",
         LON, LAT),
        ("+proj=aea +lat_0=10 +lon_0=25 +lat_1=15 +lat_2=55 "
         "+x_0=100000 +y_0=-50000 +ellps=GRS80 +units=m +no_defs",
         np.clip(LON, -60, 110), LAT),
        ("+proj=tmerc +lat_0=40 +lon_0=-3 +k_0=0.9998 +x_0=350000 "
         "+y_0=650000 +ellps=WGS84 +units=m +no_defs",
         RNG.uniform(-8, 2, 300), RNG.uniform(20, 70, 300)),
        ("+proj=lcc +lat_0=35 +lat_1=33 +lat_2=45 +lon_0=-120 "
         "+x_0=0 +y_0=-4000000 +ellps=WGS84 +units=m +no_defs",
         RNG.uniform(-130, -110, 300), RNG.uniform(20, 60, 300)),
    ]
    for s, lon, lat in cases:
        fwd, inv = gr.parse_proj4(s)
        _roundtrip(fwd, inv, lon, lat, tol=1e-9)


def test_proj4_matches_named_registry():
    # the published proj4 definitions of the registry EPSG codes must
    # dispatch to BIT-IDENTICAL transforms
    defs = {
        3035: "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
              "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs",
        5070: "+proj=aea +lat_0=23 +lat_1=29.5 +lat_2=45.5 +lon_0=-96 "
              "+x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 "
              "+units=m +no_defs",
        2154: "+proj=lcc +lat_0=46.5 +lat_1=49 +lat_2=44 +lon_0=3 "
              "+x_0=700000 +y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 "
              "+units=m +no_defs",
    }
    lon = np.clip(LON, -30, 60)
    for epsg, s in defs.items():
        fwd_p, inv_p = gr.parse_proj4(s)
        fwd_n, inv_n = gr.NAMED_CRS[epsg]
        xp, yp = fwd_p(lon, LAT)
        xn, yn = fwd_n(lon, LAT)
        assert np.array_equal(xp, xn) and np.array_equal(yp, yn), epsg
        lp = inv_p(xn, yn)
        ln = inv_n(xn, yn)
        assert np.array_equal(lp[0], ln[0]) and np.array_equal(lp[1], ln[1]), epsg


def test_proj4_tmerc_matches_utm():
    # +proj=tmerc with the UTM zone-33 constants == the engine's UTM kernel
    # bit for bit (the refactor delegated UTM onto the generalized tmerc)
    s = ("+proj=tmerc +lat_0=0 +lon_0=15 +k_0=0.9996 +x_0=500000 +y_0=0 "
         "+ellps=WGS84 +units=m +no_defs")
    fwd, inv = gr.parse_proj4(s)
    lon = RNG.uniform(12, 18, 400)
    lat = RNG.uniform(-75, 75, 400)
    e1, n1 = fwd(lon, lat)
    e2, n2 = gr.lonlat_to_utm(lon, lat, 33)
    assert np.array_equal(e1, e2) and np.array_equal(n1, n2)
    b1 = inv(e1, n1)
    b2 = gr.utm_to_lonlat(e1, n1, 33)
    assert np.array_equal(b1[0], b2[0]) and np.array_equal(b1[1], b2[1])


def test_proj4_merc_spherical_matches_3857():
    # the CANONICAL EPSG:3857 proj4 string (incl. +lat_ts=0, which is the
    # exact unit scale — lat_ts support landed r5 session 2; a NONZERO
    # lat_ts on merc scales by cos(ts)/m(ts), tested below)
    s_ok = ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
            "+y_0=0 +k=1 +units=m +no_defs")
    fwd, inv = gr.parse_proj4(s_ok)
    # nonzero standard parallel: spherical scale is exactly cos(ts)
    fts, _ = gr.parse_proj4("+proj=merc +R=6378137 +lat_ts=30")
    f1, _ = gr.parse_proj4("+proj=merc +R=6378137")
    xts, _ = fts(np.array([10.0]), np.array([0.0]))
    x1, _ = f1(np.array([10.0]), np.array([0.0]))
    # bitwise: the engine's (k0*R)*lam association, k0 = cos(ts)
    k30 = float(np.cos(np.radians(np.float64(30.0))))
    assert xts[0] == k30 * 6378137.0 * np.radians(np.float64(10.0))
    np.testing.assert_allclose(xts[0], x1[0] * k30, rtol=1e-15)
    # +lat_ts stays fail-loud on projections that have no such parameter
    with pytest.raises(ValueError, match="lat_ts"):
        gr.parse_proj4("+proj=laea +lat_0=52 +lon_0=10 +lat_ts=45 +ellps=WGS84")
    with pytest.raises(ValueError, match="lat_ts"):
        gr.parse_proj4("+proj=merc +R=6378137 +lat_ts=30 +k_0=0.9")
    lon = np.clip(LON, -179, 179)
    lat = np.clip(LAT, -80, 80)
    x, y = fwd(lon, lat)
    xr, yr = gr.lonlat_to_mercator(lon, lat)
    np.testing.assert_allclose(x, xr, rtol=1e-15)
    np.testing.assert_allclose(y, yr, rtol=1e-12)
    _roundtrip(fwd, inv, lon, lat, tol=1e-9)


def test_proj4_fail_loud():
    for bad in [
        "+proj=laea +lat_0=52 +units=ft",                  # non-meter units
        "+proj=omerc +lat_0=45",                           # unsupported proj
        "+proj=stere +lat_0=45 +ellps=WGS84",              # oblique ell. stere
        "+proj=stere +lat_0=90 +lat_ts=70 +k_0=0.994",     # both scalings
        "+proj=aea +lat_0=10",                             # missing parallels
        "proj=laea",                                       # malformed token
    ]:
        with pytest.raises(ValueError):
            gr.parse_proj4(bad)


def test_proj4_laea_aea_other_ellipsoids():
    # r5: the authalic machinery is ellipsoid-parameterized — LAEA/Albers
    # on Bessel (with the DHDN Helmert) round-trip, and differ measurably
    # from the WGS84 kernels
    s_laea = ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
              "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
              "+units=m +no_defs")
    fwd, inv = gr.parse_proj4(s_laea)
    lon = RNG.uniform(-10, 30, 300)
    lat = RNG.uniform(35, 70, 300)
    x, y = fwd(lon, lat)
    l2 = inv(x, y)
    np.testing.assert_allclose(l2[0], lon, rtol=0, atol=1e-7)
    np.testing.assert_allclose(l2[1], lat, rtol=0, atol=1e-7)
    xw, yw = gr.NAMED_CRS[3035][0](lon, lat)
    assert np.max(np.abs(x - xw)) > 50.0  # datum+ellipsoid move it
    s_aea = ("+proj=aea +lat_0=23 +lat_1=29.5 +lat_2=45.5 +lon_0=-96 "
             "+ellps=intl +units=m +no_defs")
    f2, i2 = gr.parse_proj4(s_aea)
    lon = RNG.uniform(-120, -70, 300)
    lat = RNG.uniform(25, 50, 300)
    l3 = i2(*f2(lon, lat))
    np.testing.assert_allclose(l3[0], lon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(l3[1], lat, rtol=0, atol=1e-9)


def test_proj4_longlat_identity():
    fwd, inv = gr.parse_proj4("+proj=longlat +ellps=WGS84 +no_defs")
    x, y = fwd(LON, LAT)
    assert np.array_equal(x, LON) and np.array_equal(y, LAT)
    x2, y2 = inv(LON, LAT)
    assert np.array_equal(x2, LON) and np.array_equal(y2, LAT)


def test_proj4_merc_ellipsoidal():
    # ellipsoidal mercator (no +R, no +a=+b): conformal-latitude form;
    # EPSG:3395 "World Mercator" parameterization
    fwd, inv = gr.parse_proj4(
        "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs")
    lon = np.clip(LON, -179, 179)
    lat = np.clip(LAT, -80, 80)
    _roundtrip(fwd, inv, lon, lat, tol=1e-9)
    # public golden (the EPSG:3395 worked example): (lon=2, lat=49) ->
    # E 222638.98, N 6242595.9999
    x, y = fwd(np.array([2.0]), np.array([49.0]))
    assert abs(x[0] - 222638.9816) < 0.01
    assert abs(y[0] - 6242595.9999) < 0.01
    # differs from the spherical form by the ellipsoidal correction (~0.3%)
    ys = gr.lonlat_to_mercator(np.array([2.0]), np.array([49.0]))[1]
    assert abs(ys[0] - y[0]) > 10000


def test_aeqd_sphere_roundtrip_and_distance_true():
    """Spherical azimuthal equidistant: roundtrip exact, and rho from
    the center equals the great-circle (haversine) distance BIT-EXACTLY
    on sample points (the defining property of the projection)."""
    import numpy as np

    from geotrellis_contrib_spark import grid as GR

    fwd, inv = GR.parse_proj4(
        "+proj=aeqd +lat_0=32 +lon_0=-60 +x_0=0 +y_0=0 +R=6371000")
    lon = np.linspace(-78.0, -40.0, 13)
    lat = np.linspace(22.5, 40.5, 13)
    LO, LA = np.meshgrid(lon, lat)
    x, y = fwd(LO.ravel(), LA.ravel())
    lo2, la2 = inv(x, y)
    assert np.abs(lo2 - LO.ravel()).max() < 1e-12
    assert np.abs(la2 - LA.ravel()).max() < 1e-12
    # center maps to the false origin exactly
    xc, yc = fwd(np.array([-60.0]), np.array([32.0]))
    assert xc[0] == 0.0 and yc[0] == 0.0
    # distance-true: rho == great-circle distance
    R = 6371000.0
    for plon, plat in ((-70.0, 38.0), (-45.0, 25.0), (-60.0, 22.0)):
        xp, yp = fwd(np.array([plon]), np.array([plat]))
        rho = float(np.hypot(xp, yp)[0])
        la1, lo1 = np.radians(32.0), np.radians(-60.0)
        la2_, lo2_ = np.radians(plat), np.radians(plon)
        d = float(2 * R * np.arcsin(np.sqrt(
            np.sin((la2_ - la1) / 2) ** 2
            + np.cos(la1) * np.cos(la2_)
            * np.sin((lo2_ - lo1) / 2) ** 2)))
        assert abs(rho - d) < 1e-6


def test_aeqd_fail_loud():
    """Ellipsoidal aeqd is supported since r6 (Vincenty geodesics,
    tests/test_aeqd_ell.py); the remaining guards are parameter ones."""
    import pytest as _pytest

    from geotrellis_contrib_spark import grid as GR

    fwd, inv = GR.parse_proj4("+proj=aeqd +lat_0=32 +lon_0=-60 "
                              "+ellps=WGS84")
    lo, la = inv(*fwd(-59.0, 33.0))
    assert abs(float(lo) + 59.0) < 1e-11 and abs(float(la) - 33.0) < 1e-11
    with _pytest.raises(ValueError, match="k_0"):
        GR.parse_proj4("+proj=aeqd +lat_0=32 +lon_0=-60 +R=6371000 "
                       "+k_0=0.9")


def test_krovak_epsg_worked_example():
    """EPSG GN7-2 method 9819 (Krovak, S-JTSK): the published worked
    example (phi 50d12'32.442\"N, lam 16d50'59.179\"E Greenwich ->
    southing 1050538.64, westing 568991.0) reproduced sub-meter on the
    real parameter set; +czech flips to EPSG:2065 positive axes;
    roundtrip exact; EPSG:5514 (with the 589/76/480 Helmert) puts
    Prague at the known ~(-743km, -1043km)."""
    import numpy as np

    from geotrellis_contrib_spark import grid as GR

    a, _, e2 = GR.ellipsoid_params("bessel")
    args = dict(lon0=24.0 + 50.0 / 60.0, lat0=49.5,
                alpha_c=30.28813972222222, lat_p=78.5, k_p=0.9999,
                a=a, e2=e2)
    phi = 50 + 12 / 60 + 32.442 / 3600
    lam = 16 + 50 / 60 + 59.179 / 3600
    Xs, Yw = GR.lonlat_to_krovak(np.array([lam]), np.array([phi]),
                                 czech=True, **args)
    assert abs(Xs[0] - 1050538.64) < 1.0
    assert abs(Yw[0] - 568991.0) < 1.0
    lo, la = GR.krovak_to_lonlat(Xs, Yw, czech=True, **args)
    assert abs(lo[0] - lam) < 1e-12 and abs(la[0] - phi) < 1e-12

    # EPSG:5514 axes = negated (westing, southing)
    x5, y5 = GR.lonlat_to_krovak(np.array([lam]), np.array([phi]), **args)
    assert x5[0] == -Yw[0] and y5[0] == -Xs[0]

    # full 5514 chain through parse_proj4 incl. the Helmert
    fwd, inv = GR.parse_proj4(
        "+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 "
        "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel "
        "+towgs84=589,76,480,0,0,0,0 +units=m +no_defs")
    x, y = fwd(np.array([14.42076]), np.array([50.08804]))
    assert abs(x[0] - (-742842.0)) < 200.0 and abs(y[0] - (-1042952.0)) < 200.0
    lo2, la2 = inv(x, y)
    assert abs(lo2[0] - 14.42076) < 1e-8 and abs(la2[0] - 50.08804) < 1e-8


def test_krovak_conformal_and_design_scale():
    """Conformality by finite difference (scale along the rotated
    meridian direction), and the design scale 0.9999 at the projection
    centre latitude."""
    import math

    import numpy as np

    from geotrellis_contrib_spark import grid as GR

    f2, _ = GR.parse_proj4("+proj=krovak +ellps=bessel")
    lon = np.array([14.42076])
    lat = np.array([50.08804])
    d = 1e-7
    xc, yc = f2(lon, lat)
    xdy, ydy = f2(lon, lat + d)
    xdx, ydx = f2(lon + d, lat)
    a, _, e2 = GR.ellipsoid_params("bessel")
    s = math.sin(math.radians(lat[0]))
    M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    N = a / math.sqrt(1 - e2 * s * s)
    # scale along the meridian == scale along the parallel (conformal)
    km = math.hypot((xdy - xc)[0], (ydy - yc)[0]) / (math.radians(d) * M) * d / d
    km = math.hypot((xdy - xc)[0], (ydy - yc)[0]) / (math.radians(1) * d * M / 1)
    kp = math.hypot((xdx - xc)[0], (ydx - yc)[0]) / (
        math.radians(1) * d * N * math.cos(math.radians(lat[0])))
    assert abs(km - kp) < 1e-5
    assert 0.99985 < km < 1.00005  # Krovak in-country distortion band


def test_krovak_fail_loud():
    import pytest as _pytest

    from geotrellis_contrib_spark import grid as GR

    with _pytest.raises(ValueError, match="ellipsoid"):
        GR.parse_proj4("+proj=krovak +R=6371000")
    with _pytest.raises(ValueError, match="czech"):
        GR.parse_proj4("+proj=tmerc +lon_0=0 +ellps=WGS84 +czech")
