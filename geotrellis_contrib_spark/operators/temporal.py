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
