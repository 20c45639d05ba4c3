from golang_mapreduce_spark.functions.text import (
    LETTER_SPLIT_RE,
    letter_words,
    ws_words,
)
from golang_mapreduce_spark.functions.hashing import (
    MINHASH_PRIME,
    hash32,
    hash60,
    minhash_seeds,
)
from golang_mapreduce_spark.functions.vectors import cosine_similarity, l2_norm

__all__ = [
    "LETTER_SPLIT_RE",
    "letter_words",
    "ws_words",
    "MINHASH_PRIME",
    "hash32",
    "hash60",
    "minhash_seeds",
    "cosine_similarity",
    "l2_norm",
]
