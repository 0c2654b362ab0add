"""Histogram matching: independent numpy replay (unique counts +
searchsorted on cumulative ref counts) over the scene fixture, the
src==ref identity property, and monotonicity of the mapping."""
import numpy as np

from geotrellis_contrib_spark import corpus as corpus_mod
from geotrellis_contrib_spark.operators import render as RD


def _np_mapping(src_vals, ref_vals):
    sv, sc = np.unique(src_vals, return_counts=True)
    rv, rc = np.unique(ref_vals, return_counts=True)
    rank_a = np.cumsum(sc)
    cum_b = np.cumsum(rc)
    na, nb = rank_a[-1], cum_b[-1]
    rank_b = (rank_a * nb + na - 1) // na
    idx = np.searchsorted(cum_b, rank_b, side="left")
    return {int(np.floor(v * 4.0 + 0.5)):
            (int(ra), int(rb), int(np.floor(rv[i] * 4.0 + 0.5)))
            for v, ra, rb, i in zip(sv, rank_a, rank_b, idx)}


def _valid(moz, b):
    z = moz[b]
    return z[z != -9999.0]


def test_numpy_replay(spark):
    tiles = corpus_mod.synth_px_tiles(spark, tile_size=64)
    got = {}
    for r in RD.histogram_match(tiles, "scene-0", "scene-1",
                                tile_size=64).collect():
        got[(r.band, r.v4)] = (r.rank_a, r.rank_b, r.m4)
    m0, m1 = (corpus_mod.synth_scene_mosaic(s) for s in (0, 1))
    n_rows = 0
    for b in range(2):
        exp = _np_mapping(_valid(m0, b), _valid(m1, b))
        n_rows += len(exp)
        for v4, trip in exp.items():
            assert got[(b, v4)] == trip
    assert len(got) == n_rows
    # mapping is monotone nondecreasing in v within each band
    for b in range(2):
        pairs = sorted((v4, m4) for (bb, v4), (_, _, m4) in got.items()
                       if bb == b)
        assert all(a[1] <= c[1] for a, c in zip(pairs, pairs[1:]))


def test_identity_when_ref_is_src(spark):
    tiles = corpus_mod.synth_px_tiles(spark, tile_size=64)
    rows = RD.histogram_match(tiles, "scene-2", "scene-2",
                              tile_size=64).collect()
    assert rows and all(r.v4 == r.m4 and r.rank_a == r.rank_b
                        for r in rows)
