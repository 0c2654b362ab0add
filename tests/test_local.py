"""Local (per-pixel) map algebra: unary no-shuffle ops, cross-band
combiners, and the gated NDVI+reclassify pipeline vs a numpy brute force
recomputed straight from the fixture closed form.

Reference parity: GeoTrellis Tile.combine / local-op / reclassify
families fed by the reference's RasterSources (multiband band-subset
reads in RasterSourceSpec, vlm/src/test/resources)."""
import numpy as np

from geotrellis_contrib_spark import corpus
from geotrellis_contrib_spark.operators import local as LO
from geotrellis_contrib_spark.operators.pixels import unpack

T = 64
BREAKS = (500.0, 1500.0, 2250.0)


def _band(s: int, band: int, col: int, row: int) -> np.ndarray:
    r = np.arange(T).reshape(-1, 1)
    c = np.arange(T).reshape(1, -1)
    val = (s * 1000.0 + band * 100.0 + col * 7.0 + row * 3.0
           + r * 0.5 + c * 0.25 + ((r * 31 + c * 17) % 13)).astype(np.float64)
    h0 = (s * 11) % (T - 16)
    val[h0:h0 + 16, h0:h0 + 16] = np.nan
    return val


def test_ndvi_reclass_matches_fixture_bruteforce(spark):
    tiles = corpus.synth_px_tiles(spark, tile_size=T)
    got = {(r["source_id"], r["col"], r["row"]):
           (r["ndvi_sum"], r["ndvi_count"], r["class_sum"], r["class_count"])
           for r in LO.ndvi_reclass_stats(tiles, breaks=BREAKS).collect()}
    assert len(got) == 3 * 16
    for s in range(3):
        for tc in range(4):
            for tr in range(4):
                col, row = 18 + s + tc, 24 + tr
                a = _band(s, 0, col, row)
                b = _band(s, 1, col, row)
                ok = ~np.isnan(a + b)
                with np.errstate(invalid="ignore"):
                    nd = (a - b) / (a + b)
                cls = (1 + (a >= BREAKS[0]).astype(np.int64)
                       + (a >= BREAKS[1]).astype(np.int64)
                       + (a >= BREAKS[2]).astype(np.int64))
                want = (int(np.floor(nd[ok] * LO._Q + 0.5)
                            .astype(np.int64).sum()), int(ok.sum()),
                        int(cls[ok].sum()), int(ok.sum()))
                assert got[(f"scene-{s}", col, row)] == want, (s, col, row)
    # the breaks bite: all four classes occur across the corpus
    all_cls = set()
    for s in range(3):
        a = _band(s, 0, 18 + s, 24)
        a2 = _band(s, 0, 21 + s, 27)
        for arr in (a, a2):
            m = ~np.isnan(arr)
            cls = (1 + (arr >= BREAKS[0]).astype(np.int64)
                   + (arr >= BREAKS[1]).astype(np.int64)
                   + (arr >= BREAKS[2]).astype(np.int64))
            all_cls.update(np.unique(cls[m]).tolist())
    assert all_cls == {1, 2, 3, 4}


def test_local_map_no_shuffle(spark):
    tiles = corpus.synth_px_tiles(spark, tile_size=T)
    out = LO.local_map(tiles, lambda a: a * 2.0 + 1.0, tile_size=T)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    row = out.filter("source_id = 'scene-1' AND band = 0 AND col = 20 "
                     "AND row = 25").collect()[0]
    arr = unpack(row["px"], row["dtype"], T)
    src = _band(1, 0, 20, 25)
    m = ~np.isnan(src)
    assert np.array_equal(arr[m], src[m] * 2.0 + 1.0)
    # NoData round-trips through the declared nodata value
    assert np.all(arr[~m] == row["nodata"])


def test_band_combine_generic(spark):
    tiles = corpus.synth_px_tiles(spark, tile_size=T)
    out = LO.band_combine(tiles, lambda bands: bands[1] - bands[0],
                          tile_size=T)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1, plan
    row = out.filter("source_id = 'scene-2' AND col = 22 AND row = 26") \
        .collect()[0]
    arr = unpack(row["px"], row["dtype"], T)
    src = _band(2, 1, 22, 26) - _band(2, 0, 22, 26)
    m = ~np.isnan(src)
    # b1 - b0 == 100 everywhere valid (the fixture's band term)
    assert np.array_equal(arr[m], src[m])
    assert np.all(src[m] == 100.0)


def test_ndvi_single_shuffle_plan(spark):
    tiles = corpus.synth_px_tiles(spark, tile_size=T)
    plan = LO.ndvi_reclass_stats(tiles, breaks=BREAKS) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1, plan


def test_crosstab_hand_and_replay(spark):
    import numpy as np
    from geotrellis_contrib_spark import corpus as corpus_mod
    from geotrellis_contrib_spark.operators.local import crosstab
    tiles = corpus_mod.synth_px_tiles(spark, tile_size=64)
    got = {(r.source_id, r.c0, r.c1): r.n_pixels
           for r in crosstab(tiles, class_width=64.0).collect()}
    # numpy replay over the scene mosaics
    exp = {}
    for s in range(3):
        moz = corpus_mod.synth_scene_mosaic(s)
        a = np.where(moz[0] == -9999.0, np.nan, moz[0])
        b = np.where(moz[1] == -9999.0, np.nan, moz[1])
        both = ~np.isnan(a) & ~np.isnan(b)
        ca = np.floor(a[both] / 64.0).astype(np.int64)
        cb = np.floor(b[both] / 64.0).astype(np.int64)
        for p, c in zip(*np.unique(np.stack([ca, cb], 1), axis=0,
                                   return_counts=True)):
            exp[(f"scene-{s}", int(p[0]), int(p[1]))] = int(c)
    assert got == exp
    # counts conserve: total pairs == total both-valid pixels
    for s in range(3):
        moz = corpus_mod.synth_scene_mosaic(s)
        nv = int((~np.isnan(np.where(moz[0] == -9999.0, np.nan,
                                     moz[0]))).sum())
        assert sum(v for (sid, _, _), v in got.items()
                   if sid == f"scene-{s}") == nv
