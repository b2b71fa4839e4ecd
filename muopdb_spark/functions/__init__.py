from muopdb_spark.functions.distance import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_squared,
    neg_dot_distance,
    score_expr,
)
from muopdb_spark.functions.snowball import (  # noqa: F401
    danish_stem,
    dutch_stem,
    french_stem,
    german_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    spanish_stem,
    swedish_stem,
)
from muopdb_spark.functions.text import (  # noqa: F401
    porter_stem,
    simple_tokens,
    stem_tokens_udf,
    stem_word,
    stemmed_tokens,
    stemmed_tokens_by_lang,
    term_key,
    whitespace_tokens,
)
