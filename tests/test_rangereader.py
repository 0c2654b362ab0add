"""Range-reader transport: exact ranged-GET semantics, the COG
one-GET header promise, coalesced data-plane fetches, and the
end-to-end proof that the tile catalog read over HTTP is bit-identical
to the local read while issuing ONLY ranged requests — the hermetic
re-expression of the reference's HTTP/S3 COG subscene IT
(gdal/src/it/.../SubsceneReadingIT.scala:36-38)."""
import os

import numpy as np
import pytest

from geotrellis_contrib_spark import corpus
from geotrellis_contrib_spark.sources import geotiff as GT
from geotrellis_contrib_spark.sources import rangereader as RR


@pytest.fixture()
def served(tmp_path):
    srv, base = RR.serve_directory(str(tmp_path))
    yield srv, base, tmp_path
    srv.shutdown()


def _write_blob(tmp_path, name="blob.bin", n=100_000):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    (tmp_path / name).write_bytes(data)
    return data


def test_http_reader_exact_slices(served):
    srv, base, tmp_path = served
    data = _write_blob(tmp_path)
    r = RR.HttpRangeReader(f"{base}/blob.bin")
    assert r.read(0, 10) == data[:10]
    assert r.read(99_990, 10) == data[99_990:]
    assert r.read(99_990, 50) == data[99_990:]      # clamped at EOF
    assert r.read(200_000, 10) == b""               # 416 past EOF
    assert r.size() == len(data)
    assert all(e["ranged"] for e in srv.request_log
               if e["method"] == "GET")


def test_block_cached_file_scattered_seeks_one_get(served):
    """Hundreds of tiny header-style reads inside one block = ONE GET."""
    srv, base, tmp_path = served
    data = _write_blob(tmp_path)
    f = RR.BlockCachedFile(RR.HttpRangeReader(f"{base}/blob.bin"))
    for off in range(0, 4000, 7):
        f.seek(off)
        assert f.read(12) == data[off:off + 12]
    gets = [e for e in srv.request_log if e["method"] == "GET"]
    assert len(gets) == 1 and gets[0]["ranged"]
    # cross-block read and an end-of-file read still return exact bytes
    f.seek(RR.DEFAULT_BLOCK - 5)
    assert f.read(10) == data[RR.DEFAULT_BLOCK - 5:RR.DEFAULT_BLOCK + 5]
    f.seek(len(data) - 3)
    assert f.read(10) == data[-3:]
    f.seek(len(data) + 50)
    assert f.read(4) == b""


def test_fetch_ranges_coalesces_and_dedups():
    class CountingReader:
        def __init__(self, data):
            self.data, self.requests = data, []

        def read(self, off, n):
            self.requests.append((off, n))
            return self.data[off:off + n]

    data = bytes(range(256)) * 100
    r = CountingReader(data)
    ranges = [(0, 100), (100, 50), (160, 40),       # one run (gap 10)
              (10_000, 64), (10_000, 64),           # duplicate
              (20_000, 32)]
    got = RR.fetch_ranges(r, ranges, gap=64)
    assert len(r.requests) == 3                     # 3 merged runs
    for off, n in set(ranges):
        assert got[(off, n)] == data[off:off + n]


def test_fetch_ranges_fails_loud_on_short_read():
    class ShortReader:
        def read(self, off, n):
            return b"\x00" * (n - 1)

    with pytest.raises(ValueError, match="short ranged read"):
        RR.fetch_ranges(ShortReader(), [(0, 10)])


def test_cog_header_parse_is_one_ranged_get(served):
    """The COG promise end-to-end: header + full IFD chain (incl.
    overview segment tables) over HTTP = exactly ONE small ranged GET,
    and the parse equals the local one field-for-field."""
    srv, base, tmp_path = served
    arr = corpus.synth_scene_mosaic(0, tile_size=64)
    p = str(tmp_path / "cog.tif")
    GT.write_geotiff(p, arr, (0, 0, 4, 4), cog=True, overviews=1,
                     nodata=-9999.0)
    local = GT.read_geotiff_info(p)
    srv.request_log.clear()
    remote = GT.read_geotiff_info(f"{base}/cog.tif")
    gets = [e for e in srv.request_log if e["method"] == "GET"]
    assert len(gets) == 1 and gets[0]["ranged"]
    assert gets[0]["end"] - gets[0]["start"] + 1 <= RR.DEFAULT_BLOCK
    assert remote == local


def test_classic_layout_header_parse_few_ranged_gets(served):
    """Non-COG layout (IFDs after pixel data): still ranged-only, a
    handful of block GETs, identical parse."""
    srv, base, tmp_path = served
    arr = corpus.synth_scene_mosaic(1, tile_size=64)
    p = str(tmp_path / "classic.tif")
    GT.write_geotiff(p, arr, (0, 0, 4, 4), byteorder=">", overviews=1)
    local = GT.read_geotiff_info(p)
    srv.request_log.clear()
    remote = GT.read_geotiff_info(f"{base}/classic.tif")
    gets = [e for e in srv.request_log if e["method"] == "GET"]
    assert 1 <= len(gets) <= 4 and all(e["ranged"] for e in gets)
    assert remote == local


def test_catalog_read_over_http_bit_identical(served, spark):
    """The money test: the distributed catalog read pointed at
    http:// URIs decodes bit-identical tiles to the local-path read,
    issues ONLY ranged GETs, fetches no byte twice, and coalescing
    keeps the data-plane GET count at or below the per-(path,task)
    run plan (each scene's segments are contiguous, so far fewer GETs
    than segments)."""
    srv, base, tmp_path = served
    specs = corpus.synth_geotiff_scenes(str(tmp_path))
    local_rows = GT.per_tile_checksum(GT.read_catalog_tiles(
        GT.geotiff_tile_catalog(spark, specs))).collect()
    http_specs = [dict(s, path=f"{base}/{os.path.basename(s['path'])}")
                  for s in specs]
    srv.request_log.clear()
    cat = GT.geotiff_tile_catalog(spark, http_specs)
    header_gets = len([e for e in srv.request_log
                       if e["method"] == "GET"])
    assert 3 <= header_gets <= 9  # block-cached header parse per scene
    http_rows = GT.per_tile_checksum(GT.read_catalog_tiles(cat)).collect()
    key = lambda r: (r.source_id, r.band, r.col, r.row)  # noqa: E731
    assert {key(r): (r.px_qsum, r.px_count) for r in http_rows} \
        == {key(r): (r.px_qsum, r.px_count) for r in local_rows}
    gets = [e for e in srv.request_log if e["method"] == "GET"]
    assert all(e["ranged"] for e in gets)
    data_gets = len(gets) - header_gets
    n_segments = GT.geotiff_tile_catalog(spark, specs) \
        .select("path", "offset").distinct().count()
    assert 0 < data_gets <= n_segments
    # no byte fetched twice per path within the data plane
    spans: dict[str, list[tuple[int, int]]] = {}
    for e in gets[header_gets:]:
        spans.setdefault(e["path"], []).append((e["start"], e["end"]))
    for path, ss in spans.items():
        ss.sort()
        for (s0, e0), (s1, e1) in zip(ss, ss[1:]):
            assert s1 > e0, f"overlapping data GETs on {path}"


def test_catalog_windowed_prune_over_http_fetches_less(served, spark):
    """Catalog pruning reaches the transport: a 1-tile window over
    HTTP fetches a strict subset of the full read's data bytes."""
    from pyspark.sql import functions as F

    srv, base, tmp_path = served
    specs = corpus.synth_geotiff_scenes(str(tmp_path))
    http_specs = [dict(s, path=f"{base}/{os.path.basename(s['path'])}")
                  for s in specs]
    cat = GT.geotiff_tile_catalog(spark, http_specs)
    srv.request_log.clear()
    window = cat.filter((F.col("col") == 19) & (F.col("row") == 25))
    rows = GT.per_tile_checksum(GT.read_catalog_tiles(window)).collect()
    assert len(rows) > 0
    win_bytes = sum(e["end"] - e["start"] + 1
                    for e in srv.request_log if e["method"] == "GET")
    srv.request_log.clear()
    GT.read_catalog_tiles(cat).count()
    full_bytes = sum(e["end"] - e["start"] + 1
                     for e in srv.request_log if e["method"] == "GET")
    assert win_bytes < full_bytes / 4
