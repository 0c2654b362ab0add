"""attributesForBand: per-band tag maps project to rows; untagged sources
contribute nothing (mosaic empty-attributes semantics)."""

from pyspark.sql import functions as F

from geotrellis_contrib_spark.operators import raster as raster_ops


def test_band_attributes(spark):
    tiles = spark.createDataFrame(
        [("s0", 0, {"units": "dn", "wavelength": "red"}),
         ("s0", 0, {"units": "dn", "wavelength": "red"}),  # dup tile, same tags
         ("s0", 1, {"units": "dn", "wavelength": "nir"}),
         ("s1", 0, None)],
        "source_id string, band int, band_meta map<string,string>")
    got = {(r.source_id, r.band, r.key): r.value
           for r in raster_ops.band_attributes(tiles).collect()}
    assert got[("s0", 0, "wavelength")] == "red"
    assert got[("s0", 1, "wavelength")] == "nir"
    assert got[("s0", 0, "units")] == "dn"
    assert not any(k[0] == "s1" for k in got)  # untagged -> empty
    assert len(got) == 4  # duplicates collapsed
