"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
expressions (JVM-side ``zip_with``/``aggregate`` folds), no Python UDFs.

Determinism contract with the DuckDB oracle: elements are cast to DOUBLE
before multiplying, and sums fold sequentially in list order, so both
engines execute the identical IEEE-754 operation sequence → bit-identical
doubles (probed).  Scores surfaced to users are still rounded as a belt.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_sql(a: str, b: str) -> str:
    """Sequential-fold dot product of two array columns."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def dot_expr(a: str, b: str) -> Column:
    return F.expr(dot_sql(a, b))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    """Cosine similarity; null-safe-ish (0-norm vectors → NULL via
    division, which both engines map to NULL/inf consistently guarded by
    callers filtering zero norms)."""
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def cosine_expr(a: str, b: str) -> Column:
    return F.expr(cosine_sql(a, b))


def duck_dot_sql(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dot_sql`."""
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def duck_cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


def quantized_projection_sql(emb: str, j: int, dim: int, scale: int = 1000) -> str:
    """Integer-quantized random-hyperplane projection for sign-LSH.

    Hyperplane weights are derived arithmetically (``((17*j + 31*d) % 7) - 3``)
    so both engines build the identical plane with no RNG; embedding values
    are quantized to integers (``round(x*scale)``) so the projection is
    integer arithmetic — bit-exact across engines, no float-sign flakes.
    """
    terms = " + ".join(
        f"CAST(round(CAST({emb}[{d}] AS DOUBLE) * {scale}) AS BIGINT) * {((17 * j + 31 * d) % 7) - 3}"
        for d in range(dim)
    )
    return f"({terms})"


def duck_quantized_projection_sql(emb: str, j: int, dim: int, scale: int = 1000) -> str:
    """DuckDB mirror (1-based list indexing)."""
    terms = " + ".join(
        f"CAST(round({emb}[{d + 1}]::DOUBLE * {scale}) AS BIGINT) * {((17 * j + 31 * d) % 7) - 3}"
        for d in range(dim)
    )
    return f"({terms})"


def lsh_bucket_sql(emb: str, n_bits: int, dim: int, duck: bool = False) -> str:
    """Sign-LSH bucket id: ``sum_j 2^j * (projection_j >= 0)``."""
    proj = duck_quantized_projection_sql if duck else quantized_projection_sql
    bits = " + ".join(
        f"(CASE WHEN {proj(emb, j, dim)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits)
    )
    return f"({bits})"
