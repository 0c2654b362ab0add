"""NTv2 grid-shift datum: .gsb codec, bilinear application, proj4 wiring.

Reference parity: arbitrary proj4 CRS objects (incl. grid-file datums) at
/root/reference/vlm/src/main/scala/geotrellis/contrib/vlm/geotiff/
GeoTiffReprojectRasterSource.scala:39. The binary layout is the public
NTv2 spec (Geodetic Survey of Canada; the format PROJ consumes).
"""

import os

import numpy as np
import pytest

from geotrellis_contrib_spark import corpus, grid as GR
from geotrellis_contrib_spark import gridshift as GS


def make_grid(tmp_path):
    """The canonical fixture grid (corpus.synth_nadgrid — the same file the
    reproject_nadgrid gate writes), plus the expected node arrays."""
    path = corpus.synth_nadgrid(os.path.join(tmp_path, "synth.gsb"))
    lat_shift, lon_shift = corpus.synth_nadgrid_field(47, 85)
    return path, lat_shift, lon_shift


def test_codec_roundtrip(tmp_path):
    path, lat_shift, lon_shift = make_grid(str(tmp_path))
    g = GS.read_ntv2(path)
    assert g.nrows == 47 and g.ncols == 85
    assert g.s_lat == 20.0 * 3600.0 and g.w_long == 80.0 * 3600.0
    np.testing.assert_array_equal(g.lat_shift, lat_shift)
    np.testing.assert_array_equal(g.lon_shift, lon_shift)


def test_bilinear_at_nodes_and_midpoints(tmp_path):
    path, lat_shift, lon_shift = make_grid(str(tmp_path))
    g = GS.read_ntv2(path)
    # node (i=4, j=10): lat = 20 + 4*0.5 = 22, lon_east = -(38 + 10*0.5) = -43
    dlat, dlon = GS._bilinear(g, np.array([-43.0]), np.array([22.0]))
    assert dlat[0] == float(lat_shift[4, 10])
    assert dlon[0] == float(lon_shift[4, 10])
    # midpoint between 4 nodes = average of the corners
    dlat, dlon = GS._bilinear(g, np.array([-43.25]), np.array([22.25]))
    assert dlat[0] == pytest.approx(
        float(lat_shift[4:6, 10:12].astype(np.float64).mean()), abs=1e-9)
    assert dlon[0] == pytest.approx(
        float(lon_shift[4:6, 10:12].astype(np.float64).mean()), abs=1e-9)


def test_forward_inverse_roundtrip(tmp_path):
    path, _, _ = make_grid(str(tmp_path))
    g = GS.read_ntv2(path)
    rng = np.random.default_rng(7)
    lon = rng.uniform(-78.0, -40.0, 500)
    lat = rng.uniform(22.0, 41.0, 500)
    flon, flat = GS.shift_forward(lon, lat, g)
    # shifts are ~0.07-0.21 degrees by construction — they must bite
    assert np.min(np.abs(flat - lat)) > 0.05
    blon, blat = GS.shift_inverse(flon, flat, g)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)


def test_outside_grid_raises(tmp_path):
    path, _, _ = make_grid(str(tmp_path))
    g = GS.read_ntv2(path)
    with pytest.raises(ValueError, match="outside the NTv2 grid"):
        GS.shift_forward(np.array([-100.0]), np.array([30.0]), g)
    with pytest.raises(ValueError, match="outside the NTv2 grid"):
        GS.shift_forward(np.array([-50.0]), np.array([55.0]), g)


def test_parse_proj4_nadgrids_roundtrip(tmp_path):
    path, _, _ = make_grid(str(tmp_path))
    crs = (f"+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 "
           f"+x_0=500000 +y_0=-300000 +ellps=clrk66 +nadgrids={path} "
           f"+units=m +no_defs")
    fwd, inv = GR.parse_proj4(crs)
    lon = np.array([-75.0, -62.0, -45.5])
    lat = np.array([35.0, 32.0, 33.3])
    x, y = fwd(lon, lat)
    rlon, rlat = inv(x, y)
    np.testing.assert_allclose(rlon, lon, atol=1e-8)
    np.testing.assert_allclose(rlat, lat, atol=1e-8)
    # the grid must actually bite: same projection WITHOUT the shift
    fwd0, _ = GR.parse_proj4(
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 "
        "+x_0=500000 +y_0=-300000 +ellps=clrk66 +units=m +no_defs")
    x0, y0 = fwd0(lon, lat)
    assert np.min(np.abs(y - y0)) > 1000.0  # ~0.1 deg of shift in meters


def test_parse_proj4_nadgrids_fail_loud(tmp_path):
    path, _, _ = make_grid(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        GR.parse_proj4("+proj=longlat +ellps=clrk66 +nadgrids=/nope.gsb")
    with pytest.raises(ValueError, match="ambiguous"):
        GR.parse_proj4(f"+proj=longlat +ellps=clrk66 +nadgrids={path} "
                       f"+towgs84=1,2,3")
    with pytest.raises(ValueError, match="sphere"):
        GR.parse_proj4(f"+proj=lcc +lat_1=33 +lat_0=23 +lon_0=-62 "
                       f"+R=6370997 +nadgrids={path}")
    # @null marker = no shift at all
    fwd, _ = GR.parse_proj4("+proj=longlat +ellps=clrk66 +nadgrids=@null")
    x, y = fwd(np.array([-62.0]), np.array([33.0]))
    assert x[0] == -62.0 and y[0] == 33.0


def _multi_fixture(tmp_path):
    """Parent grid (1-deg cells, lon -80..-38 / lat 20..43) + a FINER child
    (0.25-deg cells, lon -60..-50 / lat 25..32) with a DIFFERENT shift
    field — the NAD83-style nesting (state grid inside the national one)."""
    ps_lat, pn_lat = 20.0 * 3600, 43.0 * 3600
    pe, pw = 38.0 * 3600, 80.0 * 3600
    pinc = 3600.0
    pr = round((pn_lat - ps_lat) / pinc) + 1
    pc = round((pw - pe) / pinc) + 1
    ii, jj = np.meshgrid(np.arange(pr), np.arange(pc), indexing="ij")
    p_lat = (100.0 + 3.0 * ii + 2.0 * jj).astype(np.float32)
    p_lon = (50.0 + 2.0 * ii - 1.0 * jj).astype(np.float32)
    cs_lat, cn_lat = 25.0 * 3600, 32.0 * 3600
    ce, cw = 50.0 * 3600, 60.0 * 3600
    cinc = 900.0
    cr = round((cn_lat - cs_lat) / cinc) + 1
    cc = round((cw - ce) / cinc) + 1
    ii, jj = np.meshgrid(np.arange(cr), np.arange(cc), indexing="ij")
    c_lat = (400.0 + 1.0 * ii + 0.5 * jj).astype(np.float32)
    c_lon = (-200.0 + 0.5 * ii + 1.0 * jj).astype(np.float32)
    path = os.path.join(str(tmp_path), "multi.gsb")
    GS.write_ntv2_multi(path, [
        dict(sub_name="NATION", parent="NONE", s_lat=ps_lat, n_lat=pn_lat,
             e_long=pe, w_long=pw, lat_inc=pinc, lon_inc=pinc,
             lat_shift=p_lat, lon_shift=p_lon),
        dict(sub_name="STATE", parent="NATION", s_lat=cs_lat, n_lat=cn_lat,
             e_long=ce, w_long=cw, lat_inc=cinc, lon_inc=cinc,
             lat_shift=c_lat, lon_shift=c_lon),
    ])
    return path


def test_multi_subgrid_refinement(tmp_path):
    path = _multi_fixture(tmp_path)
    m = GS.read_ntv2(path)
    assert isinstance(m, GS.NTv2MultiGrid)
    assert m.names == ("NATION", "STATE") and m.parents == ("NONE", "NATION")
    # a point inside the child uses the CHILD field (finest wins) — check
    # against the child's own single-grid bilinear
    in_child = (np.array([-55.5]), np.array([28.25]))
    got = GS._bilinear(m, *in_child)
    want = GS._bilinear(m.grids[1], *in_child)
    assert got[0][0] == want[0][0] and got[1][0] == want[1][0]
    # ...and differs from what the parent alone would give
    par = GS._bilinear(m.grids[0], *in_child)
    assert got[0][0] != par[0][0]
    # a point in the parent only falls back to the parent field
    out_child = (np.array([-70.0]), np.array([40.5]))
    got2 = GS._bilinear(m, *out_child)
    want2 = GS._bilinear(m.grids[0], *out_child)
    assert got2[0][0] == want2[0][0] and got2[1][0] == want2[1][0]
    # outside every sub-grid still raises
    with pytest.raises(ValueError, match="outside every NTv2 sub-grid"):
        GS.shift_forward(np.array([-100.0]), np.array([30.0]), m)


def test_multi_subgrid_roundtrip_across_boundary(tmp_path):
    path = _multi_fixture(tmp_path)
    m = GS.read_ntv2(path)
    rng = np.random.default_rng(11)
    # sample points straddling the child boundary
    lon = np.concatenate([rng.uniform(-59.5, -50.5, 200),
                          rng.uniform(-78.0, -62.0, 200)])
    lat = np.concatenate([rng.uniform(25.5, 31.5, 200),
                          rng.uniform(21.0, 42.0, 200)])
    flon, flat = GS.shift_forward(lon, lat, m)
    blon, blat = GS.shift_inverse(flon, flat, m)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)


def test_multi_subgrid_through_proj4(tmp_path):
    path = _multi_fixture(tmp_path)
    crs = (f"+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-62 "
           f"+x_0=500000 +y_0=-300000 +ellps=clrk66 +nadgrids={path} "
           f"+units=m +no_defs")
    fwd, inv = GR.parse_proj4(crs)
    lon = np.array([-55.0, -70.0])   # one in the child, one parent-only
    lat = np.array([28.0, 40.0])
    rlon, rlat = inv(*fwd(lon, lat))
    np.testing.assert_allclose(rlon, lon, atol=1e-8)
    np.testing.assert_allclose(rlat, lat, atol=1e-8)


def test_truncated_file_rejected(tmp_path):
    path, _, _ = make_grid(str(tmp_path))
    data = bytearray(open(path, "rb").read())
    # patch NUM_FILE to 2 without appending a second sub-grid
    import struct
    off = 2 * 16 + 8
    data[off:off + 4] = struct.pack("<i", 2)
    p2 = os.path.join(str(tmp_path), "lying.gsb")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        GS.read_ntv2(p2)


def test_read_big_endian_ntv2(tmp_path):
    """r5 ADVICE: real-world .gsb files (NRCan NTv2_0.gsb, OSTN15) are
    big-endian; read_ntv2 must detect byte order from NUM_OREC instead of
    assuming the writer's little-endian layout. Craft a BE file with the
    same records and assert node/bound parity with the LE read."""
    import struct

    path_le, lat_shift, lon_shift = make_grid(str(tmp_path))
    g_le = GS.read_ntv2(path_le)

    name = lambda s: s.ljust(8)[:8].encode("ascii")  # noqa: E731
    srec = lambda k, v: struct.pack(">8s8s", name(k), name(v))  # noqa: E731
    irec = lambda k, v: struct.pack(">8si4x", name(k), v)  # noqa: E731
    drec = lambda k, v: struct.pack(">8sd", name(k), v)  # noqa: E731
    nrows, ncols = lat_shift.shape
    out = [
        irec("NUM_OREC", 11), irec("NUM_SREC", 11), irec("NUM_FILE", 1),
        srec("GS_TYPE", "SECONDS"), srec("VERSION", "NTv2.0"),
        srec("SYSTEM_F", "NAD27"), srec("SYSTEM_T", "NAD83"),
        drec("MAJOR_F", 6378206.4), drec("MINOR_F", 6356583.8),
        drec("MAJOR_T", 6378137.0), drec("MINOR_T", 6356752.314),
        srec("SUB_NAME", "SYNTH"), srec("PARENT", "NONE"),
        srec("CREATED", "20260817"), srec("UPDATED", "20260817"),
        drec("S_LAT", g_le.s_lat), drec("N_LAT", g_le.n_lat),
        drec("E_LONG", g_le.e_long), drec("W_LONG", g_le.w_long),
        drec("LAT_INC", g_le.lat_inc), drec("LONG_INC", g_le.lon_inc),
        irec("GS_COUNT", nrows * ncols),
    ]
    for i in range(nrows):
        for j in range(ncols):
            out.append(struct.pack(">4f", float(lat_shift[i, j]),
                                   float(lon_shift[i, j]), 0.0, 0.0))
    out.append(struct.pack(">8s8s", b"END     ", b"\x00" * 8))
    path_be = str(tmp_path / "synth_be.gsb")
    with open(path_be, "wb") as f:
        f.write(b"".join(out))

    g_be = GS.read_ntv2(path_be)
    assert g_be.s_lat == g_le.s_lat and g_be.w_long == g_le.w_long
    assert g_be.lat_inc == g_le.lat_inc and g_be.lon_inc == g_le.lon_inc
    np.testing.assert_array_equal(g_be.lat_shift, g_le.lat_shift)
    np.testing.assert_array_equal(g_be.lon_shift, g_le.lon_shift)
