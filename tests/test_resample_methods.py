"""ResampleMethod family beyond nearest/bilinear — cubic convolution /
cubic B-spline / lanczos (separable, edge-clamped) and the aggregate
downsamplers (average/mode/median/max/min/sum, NoData-excluding).

Reference parity: the reference accepts the full GeoTrellis
ResampleMethod enum wherever a resample method is a parameter
(RasterSourceF.scala:45, GDALRasterSource resampleMethod); the engine's
kernels follow the public formulas (Keys 1981 cubic a=-0.5; GDAL's
cubicspline B-spline basis; Lanczos a=3 normalized)."""

import numpy as np
import pytest

from geotrellis_contrib_spark.operators import pixels as px


def _ramp(rows=64, cols=64):
    r = np.arange(rows).reshape(-1, 1)
    c = np.arange(cols).reshape(1, -1)
    return 3.0 + 0.5 * r + 0.25 * c


def test_cubic_reproduces_affine_ramp():
    """Keys cubic convolution is an interpolating kernel with exact
    quadratic precision — an affine field resamples to the affine field
    evaluated at the target centers (away from clamped edges)."""
    a = _ramp()
    out = px.RESAMPLE_KERNELS["cubic"](a, 48, 48)
    fr = (np.arange(48) + 0.5) * 64 / 48 - 0.5
    expect = 3.0 + 0.5 * fr.reshape(-1, 1) + 0.25 * fr.reshape(1, -1)
    np.testing.assert_allclose(out[2:-2, 2:-2], expect[2:-2, 2:-2],
                               rtol=0, atol=1e-9)


def test_cubic_factor2_is_halfpel_filter():
    """At an exact 2x downscale every target center sits at frac 0.5, so
    the cubic taps collapse to the classic half-pel filter
    [-1, 9, 9, -1]/16 — verified against a direct evaluation."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(64, 64)) * 100
    out = px.RESAMPLE_KERNELS["cubic"](a, 32, 32)
    w = np.array([-1.0, 9.0, 9.0, -1.0]) / 16.0
    i = np.arange(32)
    ridx = np.clip(2 * i[:, None] + np.arange(-1, 3)[None, :], 0, 63)
    tmp = np.einsum("t,rtc->rc", w, a[ridx, :])
    ref = np.einsum("t,rct->rc", w, tmp[:, ridx])
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-9)


def test_identity_size_kernels():
    """out_size == in_size puts every target center on a source center
    (frac 0): interpolating kernels (cubic, lanczos) return the source
    bit-for-bit; the approximating B-spline does NOT (it smooths)."""
    rng = np.random.default_rng(4)
    a = rng.normal(size=(32, 32))
    np.testing.assert_array_equal(
        px.RESAMPLE_KERNELS["cubic"](a, 32, 32), a)
    np.testing.assert_allclose(
        px.RESAMPLE_KERNELS["lanczos"](a, 32, 32), a, atol=1e-12)
    assert not np.allclose(
        px.RESAMPLE_KERNELS["cubicspline"](a, 32, 32), a)


def test_constant_preserved_all_kernels():
    """All three convolution kernels have unit DC gain: a constant field
    stays exactly constant (B-spline partition of unity; lanczos taps
    normalized per the GDAL convention)."""
    a = np.full((64, 64), 7.25)
    for k in ("cubic", "cubicspline", "lanczos"):
        out = px.RESAMPLE_KERNELS[k](a, 48, 48)
        np.testing.assert_allclose(out, 7.25, rtol=0, atol=1e-9)


def test_aggregate_against_loops():
    """Aggregate downsamplers vs a scalar per-block loop, NoData holes
    excluded, empty blocks -> NaN."""
    rng = np.random.default_rng(5)
    a = rng.integers(-50, 50, (64, 64)).astype(np.float64)
    a[10:14, 20:24] = -9999.0         # one fully-NoData 2x2-block region
    a[0, 0] = -9999.0                 # partial block
    for kind in ("average", "median", "max", "min", "sum"):
        out = px.RESAMPLE_AGG_KERNELS[kind](a, 32, 32, nodata=-9999.0)
        fn = {"average": np.mean, "median": np.median, "max": np.max,
              "min": np.min, "sum": np.sum}[kind]
        for i in range(32):
            for j in range(32):
                blk = a[2 * i:2 * i + 2, 2 * j:2 * j + 2]
                v = blk[blk != -9999.0]
                if v.size == 0:
                    assert np.isnan(out[i, j]), (kind, i, j)
                else:
                    assert out[i, j] == pytest.approx(fn(v), abs=1e-12)


def test_aggregate_mode_tie_breaks_smallest():
    a = np.array([[1.0, 2.0], [2.0, 1.0]])
    out = px.RESAMPLE_AGG_KERNELS["mode"](a, 1, 1)
    assert out[0, 0] == 1.0  # 2-2 tie -> smallest value
    b = np.array([[3.0, 3.0], [1.0, 2.0]])
    assert px.RESAMPLE_AGG_KERNELS["mode"](b, 1, 1)[0, 0] == 3.0


def test_aggregate_fail_loud_non_integer_factor():
    a = np.zeros((64, 64))
    with pytest.raises(ValueError, match="integer downscale"):
        px.RESAMPLE_AGG_KERNELS["average"](a, 48, 48)
    with pytest.raises(ValueError, match="integer downscale"):
        px.RESAMPLE_AGG_KERNELS["sum"](a, 128, 128)


def test_resample_dataframe_dispatch(spark):
    """DataFrame-level resample dispatches aggregate methods (nodata
    becomes NaN) and convolution methods (float64 out) on the fixture."""
    from geotrellis_contrib_spark import corpus

    tiles = corpus.synth_px_tiles(spark, tile_size=64)
    one = tiles.filter("source_idx = 0 AND band = 0 AND col = 18 "
                       "AND row = 24")
    src = np.frombuffer(one.first().px, np.float64).reshape(64, 64)
    got = px.resample(one, 32, tile_size=64, method="average").first()
    arr = np.frombuffer(got.px, np.float64).reshape(32, 32)
    expect = px.RESAMPLE_AGG_KERNELS["average"](src, 32, 32,
                                                nodata=-9999.0)
    np.testing.assert_array_equal(np.isnan(arr), np.isnan(expect))
    np.testing.assert_allclose(arr, expect, equal_nan=True)
    assert np.isnan(got.nodata)
    got_c = px.resample(one, 32, tile_size=64, method="cubic").first()
    arr_c = np.frombuffer(got_c.px, np.float64).reshape(32, 32)
    np.testing.assert_array_equal(
        arr_c, px.RESAMPLE_KERNELS["cubic"](src, 32, 32))
