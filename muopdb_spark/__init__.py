"""muopdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector database
(hicder/muopdb), re-expressed Spark-first.

Everything is a DataFrame over Parquet: documents are rows, indexes are
derived tables produced by batch jobs, queries are compiled DataFrame
pipelines. See SURVEY.md for the capability map (reference file:line
citations live in each module's docstrings).

Layout:
    functions/  distance & hashing Column expressions, text tokenizing
    filters/    DocumentFilter JSON tree -> boolean Column compiler
    operators/  knn (exact top-k), dedup suite, text analytics, top-k merge
    index/      IVF/SPANN-style centroid index build + two-phase ANN, PQ
    catalog/    collection DDL, manifest/TOC versioning, insert/remove/flush
    streaming/  WAL-semantics ingest via Structured Streaming
"""

__version__ = "0.1.0"
