from muopdb_spark.sources.packed import decode_packed_vectors, pack_vectors  # noqa: F401
