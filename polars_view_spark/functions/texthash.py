"""Deterministic cross-engine text hashing building blocks.

Everything here has an exact DuckDB-SQL mirror (generated from the SAME
constants and templates, see the ``duck_*`` functions), so dedup and
fingerprint operators can be oracle-verified value-for-value:

- ``hex64``: first 15 hex chars of md5 → BIGINT (non-negative, < 2^60).
  Spark ``conv(substr(md5(s),1,15),16,10)`` ≡ DuckDB
  ``('0x'||substr(md5(s),1,15))::BIGINT`` (parity probed).
- word tokens: ``split(lower(trim(text)), '\\s+')``.
- word 3-shingles: distinct sliding 3-gram windows joined with spaces.
- MinHash: ``min((a_i * (hex64 % P) + b_i) % P)`` per hash function; the
  31-bit prime keeps every product < 2^52, safely inside BIGINT on both
  engines.

All expressions are pure Spark SQL (JVM-side, codegen'd) — no Python UDFs
in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^31 - 1 (Mersenne prime). a*h31+b < 2^20 * 2^31 + 2^31 < 2^52 — no
#: BIGINT overflow in either engine.
MINHASH_PRIME = 2_147_483_647

#: 8 fixed (a, b) pairs → 8 minhash values → 4 bands of 2 rows
#: (LSH threshold ≈ (1/4)^(1/2) = 0.5 Jaccard; the corpus separates
#: cleanly at 0.9-vs-0.1 so band recall is ~1).
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (387_421, 12_345),
    (552_581, 98_765),
    (684_421, 55_555),
    (772_361, 31_337),
    (831_517, 74_207),
    (914_623, 20_011),
    (104_729, 63_073),
    (130_363, 41_999),
)

MINHASH_BAND_ROWS = 2  # → 4 bands of 2 minhashes each

SHINGLE_WIDTH = 3

#: BPE-ish token regex: letter runs, digit runs, single punctuation marks.
#: Identical semantics under Java regex (Spark) and RE2 (DuckDB) — probed.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def hex64_sql(s: str) -> str:
    """Spark SQL text for the 60-bit md5-prefix hash of expression ``s``."""
    return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"


def duck_hex64_sql(s: str) -> str:
    """DuckDB mirror of :func:`hex64_sql` (same value, probed)."""
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


def hex64_expr(col: str) -> Column:
    return F.expr(hex64_sql(col))


def minhash_sql(h31: str, a: int, b: int) -> str:
    """One MinHash aggregate term — identical text works on both engines
    (operands non-negative, so ``%`` agrees)."""
    return f"MIN(({a} * {h31} + {b}) % {MINHASH_PRIME})"


#: Whitespace class spelled EXPLICITLY instead of \s: Java regex \s is
#: [ \t\n\x0B\f\r] but RE2's \s omits \x0B (vertical tab), so the shorthand
#: tokenizes '\x9a\x0b' differently per engine — found by the classifier
#: trajectory fuzz (one v-tab doc corrupts every gradient).  Both engines
#: get the identical set below.
_WS_SPARK = "[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+"  # SQL literal -> regex [ \t\n\x0B\f\r]+
_WS_DUCK = "[ \\t\\n\\x0B\\f\\r]+"  # RE2 parses the escapes itself
_WS_JAVA = "[ \\t\\n\\x0B\\f\\r]+"  # passed straight to Java regex


def tokens_sql(col: str) -> str:
    return f"split(lower(trim({col})), '{_WS_SPARK}')"


def duck_tokens_sql(col: str) -> str:
    # trim(x, ' '): DuckDB's 1-arg trim strips UNICODE whitespace (NBSP,
    # ideographic space) while Spark's strips only ASCII space — found by
    # the classifier trajectory fuzz on '\xa0Ý'
    return f"regexp_split_to_array(lower(trim({col}, ' ')), '{_WS_DUCK}')"


def tokens_expr(col: str) -> Column:
    """Lowercased whitespace-split word tokens."""
    return F.split(F.lower(F.trim(F.col(col))), _WS_JAVA)


def shingles_from_tokens_sql(tok_col: str, width: int = SHINGLE_WIDTH) -> str:
    """Spark SQL for distinct word ``width``-shingles over an ALREADY
    MATERIALIZED token-array column.

    Keeping the tokens in their own column matters for throughput: inlining
    the ``split()`` into every lambda element access makes Spark re-split
    the text once per shingle element (measured 3-4× slowdown on the
    signature stage); a column reference is evaluated once per row.

    Spark arrays are 0-based: windows start at 0 .. size-width.  Documents
    shorter than ``width`` words yield an empty array (guarded — ``sequence``
    with a negative end would error).
    """
    parts = ", ' ', ".join(f"{tok_col}[i + {k}]" for k in range(width))
    return (
        f"CASE WHEN size({tok_col}) >= {width} THEN "
        f"array_distinct(transform(sequence(0, size({tok_col}) - {width}), "
        f"i -> concat({parts}))) ELSE array() END"
    )


def ngrams_from_tokens_sql(tok_col: str, width: int = 2) -> str:
    """Word ``width``-grams WITH MULTIPLICITY over a materialized token-array
    column — the LM-counting sibling of :func:`shingles_from_tokens_sql`
    (which dedups for set-similarity).  Same guard: short docs yield an
    empty array (an unguarded ``sequence(0, -1)`` would DESCEND)."""
    parts = ", ' ', ".join(f"{tok_col}[i + {k}]" for k in range(width))
    return (
        f"CASE WHEN size({tok_col}) >= {width} THEN "
        f"transform(sequence(0, size({tok_col}) - {width}), "
        f"i -> concat({parts})) ELSE array() END"
    )


def duck_ngrams_sql(tok_col: str, width: int = 2) -> str:
    """DuckDB mirror of :func:`ngrams_from_tokens_sql` (1-based lists;
    ``range(a, b)`` is end-exclusive and empty when b <= a, so short docs
    need no guard)."""
    parts = " || ' ' || ".join(f"{tok_col}[i + {k}]" for k in range(width))
    return (
        f"list_transform(range(1, len({tok_col}) - {width} + 2), "
        f"i -> {parts})"
    )


def shingles_sql(col: str, width: int = SHINGLE_WIDTH) -> str:
    """One-expression form (re-splits per element — prefer the two-step
    tokens → :func:`shingles_from_tokens_sql` in hot paths)."""
    return shingles_from_tokens_sql(tokens_sql(col), width)


def shingles_expr(col: str, width: int = SHINGLE_WIDTH) -> Column:
    return F.expr(shingles_sql(col, width))


def duck_shingles_sql(col: str, width: int = SHINGLE_WIDTH) -> str:
    """DuckDB mirror (1-based lists; ``range`` is end-exclusive, so
    ``range(1, len-width+2)`` covers the same windows)."""
    toks = duck_tokens_sql(col)
    parts = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(width))
    return (
        f"CASE WHEN len({toks}) >= {width} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {width} + 2), "
        f"i -> {parts})) ELSE [] END"
    )
