from elastic_stream_spark.functions.textfns import (
    bow_fingerprint,
    shingles,
    tokens,
)
from elastic_stream_spark.functions.vectorfns import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "shingles",
    "bow_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
