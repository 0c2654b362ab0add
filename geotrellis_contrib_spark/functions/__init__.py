from geotrellis_contrib_spark.functions import cells, geometry, text  # noqa: F401
