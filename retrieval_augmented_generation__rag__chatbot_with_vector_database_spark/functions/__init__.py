from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    normalize,
    similarity_expr,
    dim_check,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    chunk_id,
    truncate_ellipsis,
    format_context_line,
    rewrite_with_history,
    token_count,
    quality_features,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "l2_norm",
    "normalize",
    "similarity_expr",
    "dim_check",
    "chunk_id",
    "truncate_ellipsis",
    "format_context_line",
    "rewrite_with_history",
    "token_count",
    "quality_features",
]
