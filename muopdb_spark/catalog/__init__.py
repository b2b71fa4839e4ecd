from muopdb_spark.catalog.collection import Collection, CollectionConfig  # noqa: F401
