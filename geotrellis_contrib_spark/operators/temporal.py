"""Per-pixel TEMPORAL statistics over a scene stack — the raster
time-series family (GeoTrellis models it as SpaceTimeKey layers; the
reference's contrib tier feeds those through the same RasterSource
machinery this engine's tile tables mirror, e.g. the layer reads in
/root/reference/vlm/src/main/scala/geotrellis/contrib/vlm/LayoutTileSource.scala:31-52
— one scene per instant, co-registered grids). Semantics: for every
pixel of every (zoom, col, row, band) key, reduce ACROSS the time axis
(`source_idx` ascending), excluding NoData/NaN cells per scene:

    count  = number of scenes with a valid observation
    mean   = (Σ valid values, accumulated in ascending source order) / count
    range  = max(valid) − min(valid)

Spark shape: ONE shuffle — groupBy the spatial key, then a vectorized
Arrow task stacks that key's scenes (a 100 TB archive holds thousands
of instants per key, but each key's stack is tile_size²·T — the natural
partition unit for temporal reduction; partial aggregation across
time-sliced files composes because count/sum/min/max are semigroups).
Output is the engine's standard per-tile quantized checksum row so the
SQL oracle replays the whole chain closed-form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geotrellis_contrib_spark.operators.pixels import unpack

_OUT = ("zoom int, col bigint, row bigint, band int, n_px bigint, "
        "cnt_sum bigint, q_mean_sum bigint, q_range_sum bigint")


def temporal_stats(tiles: DataFrame, tile_size: int = 64,
                   q_mean: float = 1048576.0,
                   q_range: float = 4.0) -> DataFrame:
    """Temporal count/mean/range per pixel, reduced to per-tile checksums:
    n_px = pixels observed at least once, cnt_sum = Σ count,
    q_mean_sum = Σ floor(mean·q_mean + 0.5), q_range_sum =
    Σ floor((max−min)·q_range + 0.5) — integer sums, order-free."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx", kind="mergesort")
        acc = np.zeros((tile_size, tile_size), dtype=np.float64)
        cnt = np.zeros((tile_size, tile_size), dtype=np.int64)
        tmax = np.full((tile_size, tile_size), -np.inf)
        tmin = np.full((tile_size, tile_size), np.inf)
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            valid = ~np.isnan(arr) & (arr != row_t.nodata)
            acc = np.where(valid, acc + arr, acc)
            cnt += valid
            tmax = np.where(valid, np.maximum(tmax, arr), tmax)
            tmin = np.where(valid, np.minimum(tmin, arr), tmin)
        seen = cnt > 0
        mean = np.where(seen, acc / np.maximum(cnt, 1), 0.0)
        rng = np.where(seen, tmax - tmin, 0.0)
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px": [int(seen.sum())],
            "cnt_sum": [int(cnt.sum())],
            "q_mean_sum": [int(np.floor(mean * q_mean + 0.5)[seen]
                               .astype(np.int64).sum())],
            "q_range_sum": [int(np.floor(rng * q_range + 0.5)[seen]
                                .astype(np.int64).sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _OUT)


def calibrate_stack(tiles: DataFrame, gains: dict, offsets: dict,
                    tile_size: int = 64) -> DataFrame:
    """Per-scene radiometric calibration v' = gain[s]·v + offset[s]
    (the localMultiply/localAdd-per-scene recipe every optical archive
    applies before temporal analysis — gains/offsets keyed by
    source_idx). NoData/NaN cells pass through untouched so validity
    masks survive. Zero shuffle — a mapInPandas over whatever
    partitioning the stack already has. Exactness: quarter-grid values
    × integer gains + integer offsets stay exactly representable."""
    from geotrellis_contrib_spark.operators.pixels import pack

    b_gains, b_offsets = dict(gains), dict(offsets)

    def run(batches):
        for pdf in batches:
            out_px = []
            for row_t in pdf.itertuples():
                arr = unpack(row_t.px, row_t.dtype, tile_size)
                s = int(row_t.source_idx)
                valid = ~np.isnan(arr) & (arr != row_t.nodata)
                arr = np.where(valid,
                               arr * b_gains[s] + b_offsets[s], arr)
                out_px.append(pack(arr))
            pdf = pdf.copy()
            pdf["px"] = out_px
            yield pdf

    return tiles.mapInPandas(run, tiles.schema)


_CP_OUT = ("zoom int, col bigint, row bigint, band int, "
           "n_px bigint, q_best_sum bigint, src_sum bigint")


def temporal_composite(tiles: DataFrame, tile_size: int = 64,
                       q_best: float = 4.0) -> DataFrame:
    """Per-pixel BEST-PIXEL COMPOSITE (the max-value compositing rule —
    THE Landsat/Sentinel mosaicking op: per pixel, keep the observation
    maximizing a quality metric across the scene stack; max-NDVI
    compositing is this with the metric = the band value. GeoTrellis
    ships it as the local max over a SpaceTimeKey layer stack; the
    contrib tier feeds those stacks through LayoutTileSource, e.g.
    /root/reference/vlm/src/main/scala/geotrellis/contrib/vlm/LayoutTileSource.scala:31-52).

    Tie rule: EARLIEST scene wins (strict `>` against the running best,
    scenes visited in ascending source_idx) — the deterministic
    convention real compositors use so reruns are stable. Selection
    only, no arithmetic: the winning value is one of the inputs, so
    per-tile checksums stay exact under the quarter-grid fixture.

    Spark shape: same ONE-shuffle stack-reduce as temporal_stats —
    groupBy the spatial key, vectorized plane sweep; (value, source)
    argmax is a semigroup so partial aggregation across time-sliced
    files composes. Output per tile: n_px = pixels observed ≥ once,
    q_best_sum = Σ floor(best·q + 0.5), src_sum = Σ winning source."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx", kind="mergesort")
        best = np.full((tile_size, tile_size), -np.inf)
        bsrc = np.full((tile_size, tile_size), -1, dtype=np.int64)
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            take = (~np.isnan(arr) & (arr != row_t.nodata)
                    & (arr > best))
            best = np.where(take, arr, best)
            bsrc = np.where(take, int(row_t.source_idx), bsrc)
        seen = bsrc >= 0
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px": [int(seen.sum())],
            "q_best_sum": [int(np.floor(best * q_best + 0.5)[seen]
                               .astype(np.int64).sum())],
            "src_sum": [int(bsrc[seen].sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _CP_OUT)


_MK_OUT = ("zoom int, col bigint, row bigint, band int, "
           "n_px_pairs bigint, p_sum bigint, s_sum bigint")


def temporal_mann_kendall(tiles: DataFrame,
                          tile_size: int = 64) -> DataFrame:
    """Per-pixel MANN-KENDALL trend test (Mann 1945 / Kendall 1975 —
    THE standard nonparametric raster-time-series trend detector):
    S = Σ_{i<j} sign(v_j − v_i) over valid observation pairs,
    INTEGER arithmetic end-to-end (sign of exact differences). Same
    one-shuffle stack-reduce shape; pairwise loop is O(T²) per key
    over vectorized planes (T = instants per key, the stack depth).
    Output per tile: n_px_pairs = pixels with ≥ 1 pair, p_sum = Σ
    pair counts, s_sum = Σ S."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx", kind="mergesort")
        planes, valids = [], []
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            planes.append(arr)
            valids.append(~np.isnan(arr) & (arr != row_t.nodata))
        shape = (tile_size, tile_size)
        s_stat = np.zeros(shape, dtype=np.int64)
        pairs = np.zeros(shape, dtype=np.int64)
        for j in range(len(planes)):
            for i in range(j):
                both = valids[i] & valids[j]
                d = planes[j] - planes[i]
                s_stat += np.where(both, np.sign(d), 0.0).astype(np.int64)
                pairs += both
        seen = pairs >= 1
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px_pairs": [int(seen.sum())],
            "p_sum": [int(pairs.sum())],
            "s_sum": [int(s_stat[seen].sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _MK_OUT)


_TS_OUT = ("zoom int, col bigint, row bigint, band int, "
           "n_px1 bigint, q_ts_sum bigint")


def temporal_theil_sen(tiles: DataFrame, tile_size: int = 64,
                       q_slope: float = 1048576.0) -> DataFrame:
    """Per-pixel THEIL-SEN slope (Theil 1950/Sen 1968 — the robust
    median-of-pairwise-slopes sibling of temporal_trend's least
    squares): median over valid pairs of (v_j − v_i)/(t_j − t_i),
    t = source_idx. Median = mean of the two middle order statistics
    ((a+a)/2 for odd counts — exact), each slope an exact difference
    divided by an integer gap (ONE IEEE division per slope), so the
    SQL oracle replays it bit-for-bit. Output per tile: n_px1 =
    pixels with ≥ 1 slope, q_ts_sum = Σ floor(median·q + 0.5)."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx", kind="mergesort")
        planes, valids, ts = [], [], []
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            planes.append(arr)
            valids.append(~np.isnan(arr) & (arr != row_t.nodata))
            ts.append(int(row_t.source_idx))
        slopes = []
        for j in range(len(planes)):
            for i in range(j):
                both = valids[i] & valids[j]
                sl = (planes[j] - planes[i]) / float(ts[j] - ts[i])
                slopes.append(np.where(both, sl, np.nan))
        shape = (tile_size, tile_size)
        if not slopes:
            m = np.zeros(shape, dtype=np.int64)
            med = np.zeros(shape)
        else:
            stack = np.stack(slopes)  # NaN sorts last along axis 0
            m = (~np.isnan(stack)).sum(axis=0)
            srt = np.sort(stack, axis=0)
            lo = np.clip((m - 1) // 2, 0, len(slopes) - 1)
            hi = np.clip(m // 2, 0, len(slopes) - 1)
            a = np.take_along_axis(srt, lo[None], axis=0)[0]
            b = np.take_along_axis(srt, hi[None], axis=0)[0]
            med = np.where(m >= 1, (a + b) / 2.0, 0.0)
        seen = m >= 1
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px1": [int(seen.sum())],
            "q_ts_sum": [int(np.floor(med * q_slope + 0.5)[seen]
                             .astype(np.int64).sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _TS_OUT)


_MED_OUT = ("zoom int, col bigint, row bigint, band int, "
            "n_px bigint, q_med_sum bigint")


def temporal_median(tiles: DataFrame, tile_size: int = 64,
                    q_med: float = 4.0) -> DataFrame:
    """Per-pixel MEDIAN COMPOSITE across the scene stack — the robust
    compositing rule next to :func:`temporal_composite`'s max-value
    (median compositing is THE cloud-robust Landsat mosaic recipe):
    per pixel, the median of the valid observations. Median = mean of
    the two middle order statistics; for odd counts that is (a+a)/2 = a
    (pure selection), for even counts ONE exact dyadic mean of quarter-
    grid values — so the per-tile checksum stays exact. Same
    ONE-shuffle stack-reduce shape. Output per tile: n_px = pixels
    observed ≥ once, q_med_sum = Σ floor(median·q + 0.5)."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        planes = []
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            planes.append(np.where(
                ~np.isnan(arr) & (arr != row_t.nodata), arr, np.nan))
        stack = np.stack(planes)           # NaN sorts last along axis 0
        m = (~np.isnan(stack)).sum(axis=0)
        srt = np.sort(stack, axis=0)
        lo = np.clip((m - 1) // 2, 0, len(planes) - 1)
        hi = np.clip(m // 2, 0, len(planes) - 1)
        a = np.take_along_axis(srt, lo[None], axis=0)[0]
        b = np.take_along_axis(srt, hi[None], axis=0)[0]
        med = np.where(m >= 1, (a + b) / 2.0, 0.0)
        seen = m >= 1
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px": [int(seen.sum())],
            "q_med_sum": [int(np.floor(med * q_med + 0.5)[seen]
                              .astype(np.int64).sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _MED_OUT)


_TREND_OUT = ("zoom int, col bigint, row bigint, band int, "
              "n_px2 bigint, q_slope_sum bigint")


def temporal_trend(tiles: DataFrame, tile_size: int = 64,
                   q_slope: float = 1048576.0) -> DataFrame:
    """Per-pixel least-squares TREND across the time axis (the change-
    detection sibling of :func:`temporal_stats` — NDVI trend maps are
    the canonical raster-time-series product): for pixels observed in
    >= 2 instants,

        slope = (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²)

    with t = source_idx. Every accumulator is a sum of exactly-
    representable values (integer t, fixture-grid v), the numerator/
    denominator subtractions stay exact, and ONE IEEE division ends the
    chain — so the SQL oracle replays it bit-for-bit. Same one-shuffle
    stack-reduce shape as temporal_stats. Output per tile: n_px2 =
    pixels with >= 2 observations, q_slope_sum = Σ floor(slope·q + 0.5)
    over those pixels."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx", kind="mergesort")
        shape = (tile_size, tile_size)
        n = np.zeros(shape, dtype=np.int64)
        st = np.zeros(shape, dtype=np.int64)
        st2 = np.zeros(shape, dtype=np.int64)
        sv = np.zeros(shape, dtype=np.float64)
        stv = np.zeros(shape, dtype=np.float64)
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            t = int(row_t.source_idx)
            valid = ~np.isnan(arr) & (arr != row_t.nodata)
            n += valid
            st += np.where(valid, t, 0)
            st2 += np.where(valid, t * t, 0)
            sv = np.where(valid, sv + arr, sv)
            stv = np.where(valid, stv + t * arr, stv)
        fit = n >= 2
        nf = n.astype(np.float64)
        stf = st.astype(np.float64)
        st2f = st2.astype(np.float64)
        denom = np.where(fit, nf * st2f - stf * stf, 1.0)
        slope = np.where(fit, (nf * stv - stf * sv) / denom, 0.0)
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_px2": [int(fit.sum())],
            "q_slope_sum": [int(np.floor(slope * q_slope + 0.5)[fit]
                                .astype(np.int64).sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _TREND_OUT)


_FILL_OUT = ("zoom int, col bigint, row bigint, band int, "
             "n_gaps bigint, n_filled bigint, q_fill_sum bigint")


def temporal_fill(tiles: DataFrame, tile_size: int = 64,
                  q_fill: float = 8.0) -> DataFrame:
    """Per-pixel temporal GAP FILLING across the scene stack — the
    Landsat-7 SLC-off / cloud-gap interpolation recipe (fill a missing
    observation by LINEAR interpolation between its nearest valid
    neighbors in time; edge gaps stay unfilled — no extrapolation):

        gap     a plane row exists for the tile but the pixel is
                NoData there (absent planes are NOT gaps — the stack
                cannot see scenes that never covered the tile)
        fill    v_j + (v_k - v_j) * ((t_i - t_j) / (t_k - t_j))
                with j/k the nearest valid planes before/after —
                integer time deltas divided ONCE, then one multiply
                and one add (the identical chain the oracle runs)

    Same ONE-shuffle stack-reduce shape as temporal_stats (tiles
    group on their key; planes ordered by source_idx = t); forward and
    backward (value, t) sweeps are vectorized over the whole tile.
    Output per tile: n_gaps, n_filled, q_fill_sum = Σ floor(fill·q +
    0.5) over filled slots."""

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source_idx")
        planes, ts = [], []
        for row_t in pdf.itertuples():
            arr = unpack(row_t.px, row_t.dtype, tile_size)
            planes.append(np.where(
                ~np.isnan(arr) & (arr != row_t.nodata), arr, np.nan))
            ts.append(int(row_t.source_idx))
        stack = np.stack(planes)
        n = len(planes)
        shp = stack.shape[1:]
        prev_v = np.full_like(stack, np.nan)
        prev_t = np.full(stack.shape, -1, dtype=np.int64)
        cur_v, cur_t = np.full(shp, np.nan), np.full(shp, -1, np.int64)
        for i in range(n):
            prev_v[i], prev_t[i] = cur_v, cur_t
            m = ~np.isnan(stack[i])
            cur_v = np.where(m, stack[i], cur_v)
            cur_t = np.where(m, ts[i], cur_t)
        next_v = np.full_like(stack, np.nan)
        next_t = np.full(stack.shape, -1, dtype=np.int64)
        cur_v, cur_t = np.full(shp, np.nan), np.full(shp, -1, np.int64)
        for i in range(n - 1, -1, -1):
            next_v[i], next_t[i] = cur_v, cur_t
            m = ~np.isnan(stack[i])
            cur_v = np.where(m, stack[i], cur_v)
            cur_t = np.where(m, ts[i], cur_t)
        gaps = np.isnan(stack)
        # a malformed stack with duplicate times would make dk == 0
        # (0/0 -> NaN -> silent garbage after astype): not fillable
        fillable = gaps & ~np.isnan(prev_v) & ~np.isnan(next_v) \
            & (next_t > prev_t)
        ti = np.asarray(ts, dtype=np.int64).reshape(-1, 1, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            di = (ti - prev_t).astype(np.float64)
            dk = (next_t - prev_t).astype(np.float64)
            fill = prev_v + (next_v - prev_v) * (di / dk)
        return pd.DataFrame({
            "zoom": [int(key[0])], "col": [int(key[1])],
            "row": [int(key[2])], "band": [int(key[3])],
            "n_gaps": [int(gaps.sum())],
            "n_filled": [int(fillable.sum())],
            "q_fill_sum": [int(np.floor(fill * q_fill + 0.5)[fillable]
                               .astype(np.int64).sum())]})

    return tiles.groupBy("zoom", "col", "row", "band") \
                .applyInPandas(solve, _FILL_OUT)
