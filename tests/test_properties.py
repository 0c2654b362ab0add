"""Property-based tests (hypothesis) for the pure kernels — randomized
coverage the reference's test suite lacks (SURVEY.md §5 'no property-based
randomization in-repo')."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotrellis_contrib_spark import geom, grid

lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_s = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
zoom_s = st.integers(min_value=0, max_value=20)
coord_s = st.floats(min_value=-1e7, max_value=1e7, allow_nan=False,
                    allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lon_s, lat_s, zoom_s)
def test_tile_contains_its_point(lon, lat, zoom):
    c, r = grid.lonlat_to_tile(np.array([lon]), np.array([lat]), zoom)
    n = 1 << zoom
    assert 0 <= c[0] < n and 0 <= r[0] < n
    xmin, ymin, xmax, ymax = grid.tile_extent(zoom, c, r)
    # the encoded tile's extent contains the point (within clamp + edge rule)
    assert xmin[0] - 1e-9 <= lon <= xmax[0] + 1e-9
    if -85.0 < lat < 85.0:
        assert ymin[0] - 1e-9 <= lat <= ymax[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(zoom_s, st.integers(min_value=0), st.integers(min_value=0))
def test_cell_pack_bijective(zoom, col, row):
    n = 1 << zoom
    col, row = col % n, row % n
    cell = grid.pack_cell(zoom, col, row)
    z2, c2, r2 = grid.unpack_cell(cell)
    assert (int(z2), int(c2), int(r2)) == (zoom, col, row)
    assert int(cell) >= 0
    if zoom > 0:
        kids = grid.cell_children(grid.cell_parent(cell))
        assert int(cell) in [int(k) for k in np.asarray(kids).ravel()]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord_s, coord_s), min_size=3, max_size=12),
       st.booleans(), st.integers(min_value=0, max_value=999999))
def test_wkb_roundtrip_polygons(pts, big_endian, srid):
    ring = pts + [pts[0]]
    enc = geom.wkb_encode(geom.WKB_POLYGON, [ring], srid=srid, big_endian=big_endian)
    dec = geom.wkb_decode(enc)
    assert dec["srid"] == srid
    assert dec["coords"][0] == ring  # bit-exact float round trip
    # hex form round-trips through the sniffing reader too
    assert geom.read_wkt_or_wkb(enc.hex())["coords"][0] == ring


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord_s, coord_s), min_size=2, max_size=10))
def test_wkb_roundtrip_linestring(pts):
    enc = geom.wkb_encode(geom.WKB_LINESTRING, pts, srid=4326)
    assert geom.wkb_decode(enc)["coords"] == pts


@settings(max_examples=100, deadline=None)
@given(coord_s, coord_s, st.floats(min_value=1e-6, max_value=1e6, allow_nan=False))
def test_pip_box_membership(cx, cy, d):
    ring = geom.bbox_buffer(cx, cy, d)
    # center strictly inside; far point strictly outside
    inside = geom.point_in_ring(np.array([cx]), np.array([cy]), ring)
    outside = geom.point_in_ring(np.array([cx + 3 * d]), np.array([cy]), ring)
    assert bool(inside[0]) is True
    assert bool(outside[0]) is False


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=0.1, max_value=1000.0),
       st.floats(min_value=0.1, max_value=1000.0),
       st.integers(min_value=1, max_value=500),
       st.integers(min_value=1, max_value=500))
def test_grid_extent_bounds_roundtrip(cw, ch, cols, rows):
    ge = grid.GridExtent(0.0, 0.0, cw * cols, ch * rows, cw, ch)
    assert (ge.cols, ge.rows) == (cols, rows)
    b = ge.grid_bounds
    ext = ge.bounds_to_extent(*b)
    # full-grid bounds -> original extent (floating math tolerance)
    np.testing.assert_allclose(ext, (0.0, 0.0, cw * cols, ch * rows), rtol=1e-9)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
                min_size=4, max_size=64))
def test_merge_first_idempotent_and_ordered(vals):
    n = len(vals) // 2
    a = np.array(vals[:n]).reshape(1, -1)
    b = np.array(vals[n:2 * (n // 1)][:n]).reshape(1, -1) if n else a
    nd = -99999.0
    from geotrellis_contrib_spark.operators import pixels as px
    m1 = px.k_merge([a, b], [nd, nd])
    # left bias: where a is valid, result == a
    valid_a = ~np.isclose(a, nd)
    assert np.array_equal(m1[valid_a], a[valid_a])
    # idempotence: merging the merge with itself changes nothing
    m2 = px.k_merge([m1, m1], [nd, nd])
    assert np.array_equal(m1, m2)
