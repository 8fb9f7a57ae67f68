from prefect_flow_arc_indexer_spark.functions.hashing import (
    HASH_PRIME,
    MINHASH_COEFFS,
    dd_stable_hash,
    minhash_perm,
    stable_hash,
)
from prefect_flow_arc_indexer_spark.functions.textfns import (
    TOKEN_REGEX,
    dd_tokens,
    tokens,
    word_ngrams,
)
from prefect_flow_arc_indexer_spark.functions.vectors import (
    cosine_similarity,
    dd_cosine_similarity,
)

__all__ = [
    "HASH_PRIME",
    "MINHASH_COEFFS",
    "stable_hash",
    "dd_stable_hash",
    "minhash_perm",
    "TOKEN_REGEX",
    "tokens",
    "dd_tokens",
    "word_ngrams",
    "cosine_similarity",
    "dd_cosine_similarity",
]
