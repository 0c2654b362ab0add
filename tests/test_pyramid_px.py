"""Pixel-level overview build: engine map-side-downsample + quadrant
assembly vs an untiled numpy brute force (average incl. NoData-partial
blocks, nearest, max), missing-quadrant handling."""
import numpy as np

import pytest

from geotrellis_contrib_spark import corpus
from geotrellis_contrib_spark.operators import pixels as px

T = 64


def _mosaic(s, band):
    big = np.full((4 * T, 4 * T), np.nan)
    h0 = (s * 11) % (T - 16)
    for tc in range(4):
        for tr in range(4):
            col, row = 18 + s + tc, 24 + tr
            r = np.arange(T).reshape(-1, 1)
            c = np.arange(T).reshape(1, -1)
            val = (s * 1000.0 + band * 100.0 + col * 7.0 + row * 3.0
                   + r * 0.5 + c * 0.25 + ((r * 31 + c * 17) % 13))
            a = val.astype(np.float64)
            a[h0:h0 + 16, h0:h0 + 16] = np.nan
            big[tr * T:(tr + 1) * T, tc * T:(tc + 1) * T] = a
    return big


@pytest.mark.parametrize("method", ["average", "nearest", "max"])
def test_overview_matches_untiled(spark, method):
    s, band = 1, 0
    tiles = corpus.synth_px_tiles(spark, tile_size=T)
    rows = [r for r in px.build_overview_px(
        tiles, method=method, tile_size=T).collect()
        if r["source_id"] == f"scene-{s}" and r["band"] == band]
    assert all(r["zoom"] == 5 for r in rows)
    big = _mosaic(s, band)
    # child cols 19..22 -> parents 9,10,11; rows 24..27 -> 12,13
    assert {(r["col"], r["row"]) for r in rows} \
        == {(c, r) for c in (9, 10, 11) for r in (12, 13)}
    for r in rows:
        got = np.frombuffer(r["px"], dtype=np.float64).reshape(T, T)
        want = np.full((T, T), -9999.0)
        for rr in range(T):
            for cc in range(T):
                # parent pixel -> child 2x2 block in GLOBAL child coords
                gr0 = (r["row"] * T + rr) * 2
                gc0 = (r["col"] * T + cc) * 2
                # into mosaic-local child coords
                i0, j0 = gr0 - 24 * T, gc0 - (18 + s) * T
                block = []
                for di in (0, 1):
                    for dj in (0, 1):
                        i, j = i0 + di, j0 + dj
                        if 0 <= i < 4 * T and 0 <= j < 4 * T \
                                and not np.isnan(big[i, j]):
                            block.append(((di, dj), big[i, j]))
                if not block:
                    continue
                vals = dict(block)
                if method == "nearest":
                    want[rr, cc] = vals.get((0, 0), -9999.0) \
                        if (0, 0) in vals else -9999.0
                elif method == "max":
                    want[rr, cc] = max(v for v in vals.values())
                else:
                    num = 0.0
                    for k in ((0, 0), (0, 1), (1, 0), (1, 1)):
                        num = num + vals.get(k, 0.0)
                    want[rr, cc] = num / len(vals)
        assert np.array_equal(got, want), (r["col"], r["row"])
