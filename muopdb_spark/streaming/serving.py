"""Continuous ANN serving: score a STREAM of query vectors against the
durable IVF index — the online half of the reference's Search RPC
(muopdb.proto:20, index_server.rs Search) re-expressed as Structured
Streaming over the same batch plan.

Each micro-batch of queries runs through `ivf_search_batch` (one job
per micro-batch regardless of how many queries it holds) and appends
(query_id, id, score, batch_id) result rows to a parquet sink — the
request/response queue pattern for offline serving at pipeline scale.

Scale notes (100 TB corpus, high-QPS query stream):
  - The corpus-side work per micro-batch is the batch plan's: probed
    centroid partitions only, postings never shuffle. Micro-batch size
    (trigger interval / maxFilesPerTrigger) is the latency/throughput
    knob — group commit for queries, exactly like the WAL ingest side
    groups writes.
  - The index handle is reopened from the durable artifact (ivf_load)
    once per driver, not per batch; postings stay persisted across
    batches.
  - Results append with the batch id, so a replayed micro-batch
    (at-least-once foreachBatch) is idempotently deduplicable
    downstream by (batch_id, query_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.index.ivf import IvfIndex, ivf_search_batch


def stream_ann_search(
    index: IvfIndex,
    query_stream: DataFrame,
    result_path: str,
    checkpoint_path: str,
    k: int,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    num_probes: int | None = None,
    centroid_distance_ratio: float | None = 0.1,
    trigger_available_now: bool = False,
    processing_time: str = "1 second",
):
    """Start the continuous-search query; returns the StreamingQuery.

    `query_stream` is any streaming DataFrame with (query_id_col,
    query_vec_col). Results land at `result_path` as parquet rows
    (query_id, id, score, batch_id), appended per micro-batch.
    """

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = ivf_search_batch(
            index, batch_df, k,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            num_probes=num_probes,
            centroid_distance_ratio=centroid_distance_ratio,
        ).withColumn("batch_id", F.lit(batch_id))
        out.write.mode("append").parquet(result_path)

    writer = (
        query_stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
