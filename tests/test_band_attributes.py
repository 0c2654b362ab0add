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


def test_reproject_coords_utm_columns_match_numpy(spark):
    """The pure-Column UTM forward (Krueger series via Spark sinh/cosh/atanh)
    matches the numpy kernel to float64 noise, north and south."""
    import numpy as np
    from geotrellis_contrib_spark import grid
    from geotrellis_contrib_spark.operators.raster import reproject_coords

    rows = [(i, -78.0 + (i % 60) * 0.1, -50.0 + i * 0.97) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, lon double, lat double")
    north = reproject_coords(df, 4326, 32618).orderBy("id").collect()
    lons = np.array([r[1] for r in rows]); lats = np.array([r[2] for r in rows])
    e, n = grid.lonlat_to_utm(lons, lats, 18)
    n = n + grid.utm_false_northing(lats) * 0  # EPSG:32618 = northern: no FN
    got_e = np.array([r.lon for r in north]); got_n = np.array([r.lat for r in north])
    np.testing.assert_allclose(got_e, e, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_n, n, rtol=0, atol=1e-6)
    south = reproject_coords(df, 4326, 32718).orderBy("id").collect()
    got_ns = np.array([r.lat for r in south])
    np.testing.assert_allclose(got_ns, n + 10000000.0, rtol=0, atol=1e-6)


def test_reproject_coords_utm_round_trip_columns(spark):
    """4326 -> 32618 -> 4326 entirely in JVM Columns round-trips to 1e-9 deg
    (forward + inverse Krueger series as whole-stage-codegen expressions)."""
    import numpy as np
    from geotrellis_contrib_spark.operators.raster import reproject_coords

    rows = [(i, -77.9 + (i % 55) * 0.1, 2.0 + i * 0.8) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, lon double, lat double")
    back = reproject_coords(reproject_coords(df, 4326, 32618), 32618, 4326) \
        .orderBy("id").collect()
    lons = np.array([r[1] for r in rows]); lats = np.array([r[2] for r in rows])
    np.testing.assert_allclose(np.array([r.lon for r in back]), lons, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.array([r.lat for r in back]), lats, rtol=0, atol=1e-9)
