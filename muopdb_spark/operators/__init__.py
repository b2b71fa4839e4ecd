from muopdb_spark.operators.knn import knn, knn_batch  # noqa: F401
from muopdb_spark.operators.sampling import (  # noqa: F401
    deterministic_reservoir,
    hash_sample,
    stratified_hash_sample,
)
from muopdb_spark.operators.temporal import asof_join, range_count_join  # noqa: F401
