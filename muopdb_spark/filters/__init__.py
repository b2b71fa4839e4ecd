from muopdb_spark.filters.compiler import compile_filter  # noqa: F401
