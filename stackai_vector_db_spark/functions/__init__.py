from stackai_vector_db_spark.functions.vector import (  # noqa: F401
    cosine_distance,
    euclidean_distance,
    fake_embedding,
    squared_euclidean,
)
from stackai_vector_db_spark.functions.text import (  # noqa: F401
    char_sum,
    quality_score,
    rolling_fingerprint,
    token_count_regex,
    token_count_ws,
)
