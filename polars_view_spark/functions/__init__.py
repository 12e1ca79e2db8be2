from polars_view_spark.functions.texthash import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    hex64_expr,
    shingles_expr,
    tokens_expr,
)
from polars_view_spark.functions.vectors import cosine_expr, dot_expr

__all__ = [
    "MINHASH_COEFFS",
    "MINHASH_PRIME",
    "cosine_expr",
    "dot_expr",
    "hex64_expr",
    "shingles_expr",
    "tokens_expr",
]
