from muopdb_spark.index.ivf import IvfIndex, build_ivf, ivf_search  # noqa: F401
