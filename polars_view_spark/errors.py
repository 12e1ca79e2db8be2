"""Exception hierarchy.

Mirrors the reference's user-visible error taxonomy
(reference: src/error.rs:23-103) — the regex *format* vs regex *syntax*
distinction and the dtype-mismatch error are test-asserted behavior there,
so they are distinct types here too.
"""

from __future__ import annotations


class PolarsViewSparkError(Exception):
    """Base class for all engine errors."""


class InvalidRegexFormatError(PolarsViewSparkError):
    """Pattern is neither ``*`` nor anchored ``^…$``.

    reference: src/error.rs:74-78, src/args.rs:187-214.
    """

    def __init__(self, pattern: str) -> None:
        super().__init__(
            f"Invalid regex format: {pattern!r} (must be '*' or start with '^' and end with '$')"
        )
        self.pattern = pattern


class InvalidRegexSyntaxError(PolarsViewSparkError):
    """Pattern has correct format but fails to compile.

    reference: src/error.rs:79-83.
    """

    def __init__(self, pattern: str, cause: str) -> None:
        super().__init__(f"Invalid regex syntax: {pattern!r}: {cause}")
        self.pattern = pattern


class InvalidDataTypeForRegexError(PolarsViewSparkError):
    """Normalize pattern matched a non-string column — an error, not a skip.

    reference: src/polars/normalize.rs:100-107.
    """

    def __init__(self, column: str, dtype: str) -> None:
        super().__init__(
            f"Column {column!r} matched the normalize pattern but has type {dtype} "
            "(only string columns can be normalized)"
        )
        self.column = column
        self.dtype = dtype


class ColumnNameConflictError(PolarsViewSparkError):
    """Row-index column name could not be made unique after 1000 attempts.

    reference: src/polars/add.rs + src/data_filter.rs:1195-1229.
    """


class UnsupportedFormatError(PolarsViewSparkError):
    """File extension not one of csv/json/ndjson/parquet.

    reference: src/file_extension.rs:6-36.
    """


class SaveFormatMismatchError(PolarsViewSparkError):
    """Save-in-place target extension differs from the loaded format.

    reference: src/file_dialog.rs:86-127.
    """


class SqlDialectError(PolarsViewSparkError):
    """The dialect shim could not rewrite a SELECT-modifier construct."""
