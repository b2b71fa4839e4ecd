from muopdb_spark.functions.distance import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_squared,
    neg_dot_distance,
    score_expr,
)
from muopdb_spark.functions.text import (  # noqa: F401
    simple_tokens,
    stem_tokens_udf,
    term_key,
    whitespace_tokens,
)
