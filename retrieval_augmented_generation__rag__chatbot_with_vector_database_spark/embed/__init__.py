from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
    EmbeddingProvider,
    HashEmbedder,
    embed_text_column,
    MODEL_DIMENSIONS,
)

__all__ = [
    "EmbeddingProvider",
    "HashEmbedder",
    "embed_text_column",
    "MODEL_DIMENSIONS",
]
