"""Local (per-pixel) map algebra over the distributed tile table — unary
ops on one band (no shuffle) and cross-band combiners (one co-partitioned
shuffle on the tile key).

Reference parity: the reference's RasterSources feed GeoTrellis local map
algebra (Tile.combine / localAdd / reclassify families); the contrib tier
owns exactly this band/tile plumbing (RasterSourceSpec reads multiband
fixtures and band-subsets them — vlm/src/test/resources).

Spark-first plan (scale posture):
  * ``local_map`` is embarrassingly parallel — ``mapInPandas`` over the
    existing partitioning, zero shuffles; Catalyst prunes untouched
    columns around it.
  * ``band_combine`` groups the band rows of each tile:
    ``groupBy(source_id, col, row).applyInPandas`` — ONE co-partitioned
    shuffle of the raster bytes. At 100 TB a band-interleaved layout (all
    bands of a tile in one row) would make this shuffle-free; with the
    band-per-row layout, bucketing or Z-order on (col, row) makes it
    near-local. NoData in ANY input band -> NoData out (the GeoTrellis
    local-op convention).

Determinism contract (mirrored by the ``local_algebra`` SQL oracle in
``__spark_entry__.py`` — change one only with the other): the NDVI ratio
is one subtraction, one addition, one division per pixel; reclassify is
pure comparisons (exact); checksums quantize FIRST (floor(v*2^20+0.5) as
int64) then sum integers, so they are order-independent.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geotrellis_contrib_spark.operators.pixels import DTYPES, pack

_Q = 1048576.0  # 2^20, the shared checksum quantization


def local_map(tiles: DataFrame, fn: Callable[[np.ndarray], np.ndarray],
              tile_size: int = 64) -> DataFrame:
    """Unary local op: apply ``fn`` (vectorized numpy, NaN marks NoData)
    per tile — NO shuffle, the map runs on the existing partitioning.
    Returns the same schema with ``px`` replaced (dtype float64, NoData
    round-tripped through the tile's declared nodata value)."""
    t = int(tile_size)
    schema = tiles.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row_t in pdf.itertuples(index=False):
                arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                        .reshape(t, t).astype(np.float64)
                arr = np.where(arr == row_t.nodata, np.nan, arr)
                res = fn(arr)
                res = np.where(np.isnan(res), row_t.nodata, res)
                d = row_t._asdict()
                d["px"] = pack(np.ascontiguousarray(res))
                d["dtype"] = "float64"
                out.append(d)
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return tiles.mapInPandas(run, schema)


def band_combine(tiles: DataFrame,
                 combiner: Callable[[dict], np.ndarray],
                 tile_size: int = 64) -> DataFrame:
    """Cross-band local combiner: one co-partitioned shuffle on
    ``(source_id, col, row)`` assembles each tile's band stack, then
    ``combiner({band: float64 NaN-masked array}) -> float64 array`` runs
    vectorized per tile. Output: single-band float64 tiles (band = 0,
    NoData = NaN encoded as the group's nodata value)."""
    t = int(tile_size)

    def combine(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        source_id, col, row = key
        bands = {}
        nodatas = {}
        for row_t in pdf.itertuples(index=False):
            arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                    .reshape(t, t).astype(np.float64)
            bands[int(row_t.band)] = np.where(arr == row_t.nodata,
                                              np.nan, arr)
            nodatas[int(row_t.band)] = float(row_t.nodata)
        # deterministic output nodata: the MINIMUM band's declaration —
        # last-row-wins depended on pandas group order (r5 ADVICE)
        nodata = nodatas[min(nodatas)]
        res = combiner(bands)
        res = np.where(np.isnan(res), nodata, res)
        return pd.DataFrame([{
            "source_id": source_id, "col": int(col), "row": int(row),
            "band": 0, "dtype": "float64", "nodata": nodata,
            "px": pack(np.ascontiguousarray(res)),
        }])

    return tiles.groupBy("source_id", "col", "row").applyInPandas(
        combine, "source_id string, col bigint, row bigint, band int, "
                 "dtype string, nodata double, px binary")


def ndvi_reclass_stats(tiles: DataFrame, breaks: tuple = (500.0, 1500.0, 2500.0),
                       tile_size: int = 64) -> DataFrame:
    """The gated local-algebra pipeline: per pixel,
    ``ndvi = (b0 - b1) / (b0 + b1)`` (NoData in either band -> excluded)
    and ``cls = 1 + sum(b0 >= break_i)`` (reclassify by fixed breaks,
    exact comparisons), in ONE co-partitioned shuffle. Returns per-tile
    order-independent checksums ``(source_id, col, row, ndvi_sum,
    ndvi_count, class_sum, class_count)`` with ndvi quantized first
    (floor(v*2^20+0.5) as int64). The ``local_algebra`` SQL oracle mirrors
    the arithmetic term-for-term — change one only with the other."""
    t = int(tile_size)
    b1, b2, b3 = (float(b) for b in breaks)

    def kern(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        source_id, col, row = key
        cols = ["source_id", "col", "row", "ndvi_sum", "ndvi_count",
                "class_sum", "class_count"]
        bands = {}
        for row_t in pdf.itertuples(index=False):
            arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                    .reshape(t, t).astype(np.float64)
            bands[int(row_t.band)] = np.where(arr == row_t.nodata,
                                              np.nan, arr)
        if 0 not in bands or 1 not in bands:
            return pd.DataFrame(columns=cols)
        a, b = bands[0], bands[1]
        ok = ~np.isnan(a + b)
        with np.errstate(invalid="ignore"):
            nd = (a - b) / (a + b)
        ok0 = ~np.isnan(a)
        cls = np.where(ok0,
                       1 + (a >= b1).astype(np.int64)
                       + (a >= b2).astype(np.int64)
                       + (a >= b3).astype(np.int64), 0)
        qn = np.floor(nd[ok] * _Q + 0.5).astype(np.int64)
        return pd.DataFrame([{
            "source_id": source_id, "col": int(col), "row": int(row),
            "ndvi_sum": int(qn.sum()), "ndvi_count": int(ok.sum()),
            "class_sum": int(cls[ok0].sum()), "class_count": int(ok0.sum()),
        }])

    return tiles.groupBy("source_id", "col", "row").applyInPandas(
        kern, "source_id string, col bigint, row bigint, "
              "ndvi_sum bigint, ndvi_count bigint, "
              "class_sum bigint, class_count bigint")


_BIN_OPS = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "min": np.minimum,
    "max": np.maximum,
}


def local_binary(a: DataFrame, b: DataFrame, op: str = "subtract",
                 tile_size: int = 64) -> DataFrame:
    """Two-raster local op (GeoTrellis localAdd / localSubtract /
    localMultiply / localMin / localMax between CO-REGISTERED rasters —
    image differencing is the classic change-detection use): inner join
    on the tile key (zoom, col, row, band), then a vectorized per-tile
    kernel; NoData in EITHER input -> NoData out (the GeoTrellis
    local-op convention). ONE co-partitioned shuffle of the raster
    bytes — with both tables bucketed/Z-ordered on the tile key this
    becomes near-local at 100 TB. Output keeps ``a``'s identity columns
    (source_id, nodata), dtype float64."""
    if op not in _BIN_OPS:
        raise ValueError(f"local_binary: unknown op {op!r}; "
                         f"one of {sorted(_BIN_OPS)}")
    fn = _BIN_OPS[op]
    t = int(tile_size)
    keys = ["zoom", "col", "row", "band"]
    from pyspark.sql import functions as F
    bb = b.select(*keys, F.col("dtype").alias("b_dtype"),
                  F.col("nodata").alias("b_nodata"),
                  F.col("px").alias("b_px"))
    j = a.join(bb, keys)
    out_cols = [f.name for f in a.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row_t in pdf.itertuples(index=False):
                va = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                       .reshape(t, t).astype(np.float64)
                vb = np.frombuffer(row_t.b_px,
                                   dtype=DTYPES[row_t.b_dtype]) \
                    .reshape(t, t).astype(np.float64)
                va = np.where(va == row_t.nodata, np.nan, va)
                vb = np.where(vb == row_t.b_nodata, np.nan, vb)
                res = fn(va, vb)
                res = np.where(np.isnan(va) | np.isnan(vb), np.nan, res)
                d = {k: getattr(row_t, k) for k in out_cols}
                d["px"] = pack(np.ascontiguousarray(
                    np.where(np.isnan(res), row_t.nodata, res)))
                d["dtype"] = "float64"
                out.append(d)
            yield pd.DataFrame(out, columns=out_cols)

    return j.mapInPandas(run, a.schema)


def tile_checksums(tiles: DataFrame, q: float = _Q,
                   tile_size: int = 64) -> DataFrame:
    """Per-tile order-independent checksum rollup: (source_id, zoom,
    col, row, band, n_valid, q_sum = Σ floor(v·q + 0.5) over valid
    cells). Zero shuffle — runs on the existing partitioning."""
    t = int(tile_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row_t in pdf.itertuples(index=False):
                arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                        .reshape(t, t).astype(np.float64)
                valid = ~np.isnan(arr) & (arr != row_t.nodata)
                out.append({
                    "source_id": row_t.source_id,
                    "zoom": int(row_t.zoom), "col": int(row_t.col),
                    "row": int(row_t.row), "band": int(row_t.band),
                    "n_valid": int(valid.sum()),
                    "q_sum": int(np.floor(arr * q + 0.5)[valid]
                                 .astype(np.int64).sum())})
            yield pd.DataFrame(out, columns=[
                "source_id", "zoom", "col", "row", "band",
                "n_valid", "q_sum"])

    return tiles.mapInPandas(
        run, "source_id string, zoom int, col bigint, row bigint, "
             "band int, n_valid bigint, q_sum bigint")


def crosstab(tiles: DataFrame, class_width: float = 500.0,
             tile_size: int = 64) -> DataFrame:
    """Two-band CONTINGENCY TABLE (ArcGIS Tabulate Area / GRASS r.cross
    — the change-detection matrix between two classified epochs): per
    scene, pixel counts for every (class(band0), class(band1)) pair
    where BOTH bands are valid; class(v) = floor(v / class_width)
    (floor of ONE IEEE division — identical both sides). Returns
    (source_id, c0, c1, n_pixels).

    Plan shape: one zero-shuffle Arrow pass pairs each tile's two band
    rows (grouped on the tile key) and emits per-tile (c0, c1) counts
    — at most classes^2 rows per tile, usually far fewer — then ONE
    map-side-combined rollup. The pixel bytes never shuffle."""
    t = int(tile_size)
    cols = ["source_id", "c0", "c1", "n_pixels"]

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        source_id = key[0]
        by_band = {}
        for row_t in pdf.itertuples(index=False):
            arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                    .reshape(t, t).astype(np.float64)
            by_band[int(row_t.band)] = np.where(
                arr == row_t.nodata, np.nan, arr)
        if 0 not in by_band or 1 not in by_band:
            return pd.DataFrame(columns=cols)
        a, b = by_band[0], by_band[1]
        both = ~np.isnan(a) & ~np.isnan(b)
        if not both.any():
            return pd.DataFrame(columns=cols)
        ca = np.floor(a[both] / class_width).astype(np.int64)
        cb = np.floor(b[both] / class_width).astype(np.int64)
        pairs, cnts = np.unique(np.stack([ca, cb], axis=1), axis=0,
                                return_counts=True)
        return pd.DataFrame(
            [{"source_id": source_id, "c0": int(p[0]), "c1": int(p[1]),
              "n_pixels": int(c)} for p, c in zip(pairs, cnts)],
            columns=cols)

    from pyspark.sql import functions as F
    part = tiles.groupBy("source_id", "zoom", "col", "row").applyInPandas(
        run, "source_id string, c0 bigint, c1 bigint, n_pixels bigint")
    return part.groupBy("source_id", "c0", "c1").agg(
        F.sum("n_pixels").alias("n_pixels"))
