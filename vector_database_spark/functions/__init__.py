from vector_database_spark.functions.vector import (
    dot,
    l2_norm,
    l2_dist,
    cosine,
    round6,
)
from vector_database_spark.functions.hashing import portable_hash, seeded_hash
from vector_database_spark.functions.text import tokenize_ws, bigrams, char_shingles

__all__ = [
    "dot",
    "l2_norm",
    "l2_dist",
    "cosine",
    "round6",
    "portable_hash",
    "seeded_hash",
    "tokenize_ws",
    "bigrams",
    "char_shingles",
]
