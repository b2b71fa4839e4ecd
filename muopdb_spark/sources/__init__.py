from muopdb_spark.sources.packed import decode_packed_vectors, pack_vectors  # noqa: F401
from muopdb_spark.sources.jsonl import (  # noqa: F401
    quarantine_split,
    read_jsonl,
    write_jsonl,
)
