from muopdb_spark.operators.knn import knn, knn_batch  # noqa: F401
from muopdb_spark.operators.sampling import (  # noqa: F401
    deterministic_reservoir,
    hash_sample,
    stratified_hash_sample,
)
from muopdb_spark.operators.temporal import asof_join, range_count_join  # noqa: F401
from muopdb_spark.operators.contamination import (  # noqa: F401
    benchmark_grams,
    contamination_report,
    contamination_report_split,
)
from muopdb_spark.operators.graph import connected_components, dup_clusters  # noqa: F401
from muopdb_spark.operators.packing import (  # noqa: F401
    pack_sequences,
    pack_sequences_greedy,
    sequence_stats,
)
from muopdb_spark.operators.pii import PII_PATTERNS, scrub_pii  # noqa: F401
from muopdb_spark.operators.quality import repetition_stats  # noqa: F401
from muopdb_spark.operators.relevance import bm25_scores, rrf_fuse  # noqa: F401
from muopdb_spark.operators.lm import (  # noqa: F401
    lm_bits_per_token,
    score_bits_per_token,
    train_bigram_lm,
)
from muopdb_spark.operators.export import shard_assignment, write_shards  # noqa: F401
from muopdb_spark.operators.semdedup import semdedup  # noqa: F401
from muopdb_spark.operators.image import (  # noqa: F401
    decode_png,
    encode_png,
    hash64_near_dup,
    image_features,
    image_near_dup,
)
from muopdb_spark.operators.audio import (  # noqa: F401
    audio_features,
    audio_near_dup,
    decode_wav,
    encode_wav,
)
from muopdb_spark.operators.jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from muopdb_spark.operators.quality_model import (  # noqa: F401
    classifier_quality_scores,
    score_quality,
    train_quality_classifier,
)
