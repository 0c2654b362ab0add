"""geotrellis_contrib_spark — a from-scratch, PySpark-native spatial-join +
tiling engine with the query/data-processing capabilities of
geotrellis/geotrellis-contrib (reference at /root/reference, read-only).

Architecture (see SURVEY.md):
  - ``grid``       pure-numpy layout & cell kernels (WebMercator, SpatialKey,
                   quadkey cells, GridExtent/GridBounds math)
  - ``geom``       pure-numpy geometry kernels (WKB codec, PIP, distance,
                   centroid, length, GeoJSON)
  - ``functions``  Spark Column builders (JVM-side, codegen'd) and the few
                   Arrow/pandas UDFs needed for array payloads
  - ``operators``  DataFrame-first operators: spatial joins, kNN, tiling,
                   raster merge / zonal stats / rasterize, dedup, similarity
  - ``sources``    parquet/Iceberg-style table layout + metadata tables
  - ``plans``      checkpoint/resume (per-partition watermarks + lineage)
  - ``corpus``     deterministic synthetic interleaved text+media corpus
  - ``derive``     deterministic spatial columns derived from the shared
                   testdata tables (the dual-execution oracle contract)

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo's observable behavior, and published map-tile math.
"""

__version__ = "0.1.0"
