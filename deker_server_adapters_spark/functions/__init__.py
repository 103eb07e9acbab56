from deker_server_adapters_spark.functions.hashing import h32, h64
from deker_server_adapters_spark.functions.vectors import cosine_similarity, dot, l2_norm
from deker_server_adapters_spark.functions.textfns import char_shingles, word_tokens

__all__ = [
    "h32",
    "h64",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "char_shingles",
    "word_tokens",
]
