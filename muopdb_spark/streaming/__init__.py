from muopdb_spark.streaming.ingest import (  # noqa: F401
    stream_insert,
    streaming_dedup,
    windowed_event_counts,
)
from muopdb_spark.streaming.serving import stream_ann_search  # noqa: F401
