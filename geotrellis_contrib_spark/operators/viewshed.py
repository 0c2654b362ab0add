"""Viewshed (line-of-sight visibility) over the distributed tile table —
the GeoTrellis ``raster.viewshed`` R3 algorithm re-expressed for Spark:
for one observer per (source_id, band), a cell is visible iff its
elevation angle from the observer is >= the maximum angle of the
DDA-sampled cells along the sight line.

Viewshed has GLOBAL data dependency (any cell can occlude any ray), so
the honest Spark plan makes the (source, band) scene the parallel unit:
ONE ``groupBy(source_id, band).applyInPandas`` assembles the scene
mosaic and runs a fully vectorized R3 sweep (k-step loop over numpy
arrays of all targets at once — no per-target Python loop). At 100 TB
the corpus is many scenes; each task holds one scene raster (bounded by
``max_radius`` cropping for larger-than-memory scenes, fail-loud here).

R3 sampling contract (mirrored by the ``viewshed`` SQL oracle — change
one only with the other):
  * n = max(|dgr|, |dgc|) steps; sample k in 1..n-1 at
    rr = floor(or + (k*dgr)/n + 0.5), cc = floor(oc + (k*dgc)/n + 0.5);
  * slope_k = (z[rr,cc] - zbase)/k with zbase = z[observer] + height —
    the common ray-length factor cancels, so per-step index k IS the
    distance denominator;
  * NoData samples are TRANSPARENT (skipped); NoData targets are not
    counted; n <= 1 targets (observer + 8-neighbors) are visible;
  * visible iff slope_target >= max_k slope_k (an occluder exactly on
    the sight line does not block).
Output: per-tile (source_id, band, col, row, n_visible, n_valid)."""

from __future__ import annotations

from typing import Callable, Iterator  # noqa: F401

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geotrellis_contrib_spark.operators.pixels import DTYPES


def viewshed(tiles: DataFrame, observer_fn, height: float = 2.0,
             tile_size: int = 64, max_px: int = 1 << 12,
             block_rows: int = 256) -> DataFrame:
    """``observer_fn(source_id, band) -> (gr, gc)`` global observer cell
    per scene/band (must be a valid cell). ``max_px`` bounds the
    assembled scene edge (fail-loud — the guard that a scene fits the
    task); with the target-row-blocked sweep the per-task footprint is
    the z mosaic (8 bytes/px — 128 MB at the 4096 default) plus ~12
    ``block_rows``*W float64 temporaries, so the guard sizes the ARRAY,
    not the sweep. The remaining scale axis is compute: R3 is
    O(N*sqrt(N)) per scene — beyond max_px crop by max_radius (the
    GeoTrellis deployment shape) rather than raising the guard."""
    t = int(tile_size)

    def sweep(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        source_id, band = key[0], int(key[1])
        cols = pdf["col"].to_numpy()
        rows = pdf["row"].to_numpy()
        c0, r0 = int(cols.min()), int(rows.min())
        nc, nr = int(cols.max()) - c0 + 1, int(rows.max()) - r0 + 1
        if nc * t > max_px or nr * t > max_px:
            raise ValueError(
                f"scene {source_id} exceeds max_px={max_px}; crop by "
                "max_radius before viewshed")
        z = np.full((nr * t, nc * t), np.nan)
        for row_t in pdf.itertuples(index=False):
            arr = np.frombuffer(row_t.px, dtype=DTYPES[row_t.dtype]) \
                    .reshape(t, t).astype(np.float64)
            arr = np.where(arr == row_t.nodata, np.nan, arr)
            z[(int(row_t.row) - r0) * t:(int(row_t.row) - r0 + 1) * t,
              (int(row_t.col) - c0) * t:(int(row_t.col) - c0 + 1) * t] \
                = arr
        ogr, ogc = observer_fn(source_id, band)
        oy, ox = int(ogr) - r0 * t, int(ogc) - c0 * t
        if not (0 <= oy < z.shape[0] and 0 <= ox < z.shape[1]) \
                or np.isnan(z[oy, ox]):
            raise ValueError(f"observer ({ogr},{ogc}) invalid for "
                             f"{source_id}/{band}")
        zbase = z[oy, ox] + float(height)

        # Target-row BLOCKS bound peak memory to z + O(block*W): the
        # whole-grid sweep holds ~12 H*W float64 temporaries (3.2 GB at
        # max_px=4096), the blocked one z (one H*W array) + the same
        # dozen at block*W — so the scene guard is the z array, not the
        # sweep. Arithmetic per target is ELEMENTWISE identical to the
        # whole-grid form (broadcasting changes layout, not values), so
        # the SQL oracle and the block-size parity pytest both hold
        # bit-for-bit.
        valid = ~np.isnan(z)
        visible = np.empty(z.shape, dtype=bool)
        yy_all = np.arange(z.shape[0], dtype=np.float64)
        dgc_row = (np.arange(z.shape[1], dtype=np.float64) - ox)[None, :]
        blk = max(1, int(block_rows))
        for y0 in range(0, z.shape[0], blk):
            y1 = min(y0 + blk, z.shape[0])
            dgr = (yy_all[y0:y1, None] - oy) + np.zeros_like(dgc_row)
            dgc = dgc_row + np.zeros((y1 - y0, 1))
            n = np.maximum(np.abs(dgr), np.abs(dgc))
            n_safe = np.maximum(n, 1.0)
            ms = np.full(n.shape, -np.inf)
            for k in range(1, int(n.max()) if n.size else 1):
                act = n > k  # targets with an intermediate sample at k
                if not act.any():
                    break
                kk = float(k)
                # floor in GLOBAL coordinates (exactly the oracle's
                # expression — a local-offset base could round a .5 tie
                # differently), then shift back by the integer origin
                rr = (np.floor(float(ogr) + (kk * dgr) / n_safe + 0.5)
                      .astype(np.int64) - r0 * t)
                cc = (np.floor(float(ogc) + (kk * dgc) / n_safe + 0.5)
                      .astype(np.int64) - c0 * t)
                # indices are only meaningful where act (k < n); clamp
                # the rest so the gather stays in bounds (masked below)
                zk = z[np.clip(rr, 0, z.shape[0] - 1),
                       np.clip(cc, 0, z.shape[1] - 1)]
                slope = (zk - zbase) / kk
                upd = act & ~np.isnan(zk)
                np.copyto(ms, np.maximum(ms, slope), where=upd)
            slope_t = (z[y0:y1] - zbase) / n_safe
            visible[y0:y1] = valid[y0:y1] & ((n <= 1.0) | (slope_t >= ms))

        out = []
        for row_t in pdf.itertuples(index=False):
            ty = (int(row_t.row) - r0) * t
            tx = (int(row_t.col) - c0) * t
            v = visible[ty:ty + t, tx:tx + t]
            va = valid[ty:ty + t, tx:tx + t]
            out.append({"source_id": source_id, "band": band,
                        "col": int(row_t.col), "row": int(row_t.row),
                        "n_visible": int(v.sum()),
                        "n_valid": int(va.sum())})
        return pd.DataFrame(out, columns=["source_id", "band", "col",
                                          "row", "n_visible", "n_valid"])

    return tiles.groupBy("source_id", "band").applyInPandas(
        sweep, "source_id string, band int, col bigint, row bigint, "
               "n_visible bigint, n_valid bigint")
