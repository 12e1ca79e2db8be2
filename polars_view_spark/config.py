"""Configuration dataclasses.

``LoadConfig`` ≈ the reference's ``DataFilter`` (reference:
src/data_filter.rs:57-106) — everything that modulates *what is loaded and
computed*.  ``ViewConfig`` ≈ ``DataFormat`` (reference:
src/data_format.rs:61-91) — display-only knobs, deliberately kept out of the
data plane.  ``SortBy`` ≈ src/sort.rs:10-17.

Defaults replicate the reference's: delimiter ``;``
(src/data_filter.rs:28), null markers ``""`` and ``<N/D>``
(src/data_filter.rs:24), 200 inference rows (src/data_filter.rs:42), table
name ``AllData`` (src/args.rs:169), row-index name "Row Number" offset 1
(src/data_filter.rs:31,40).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from enum import Enum

from polars_view_spark.errors import InvalidRegexFormatError, InvalidRegexSyntaxError

DEFAULT_CSV_DELIMITER = ";"
DEFAULT_NULL_VALUES = ('""', "<N/D>")
DEFAULT_INFER_SCHEMA_ROWS = 200
DEFAULT_TABLE_NAME = "AllData"
DEFAULT_ROW_INDEX_NAME = "Row Number"
DEFAULT_ROW_INDEX_OFFSET = 1
DEFAULT_QUERY = "SELECT * FROM AllData;"
MAX_NAME_ATTEMPTS = 1000  # reference: src/data_filter.rs:45


def validate_pattern(pattern: str) -> str:
    """Validate the shared regex-argument contract: ``*`` or ``^…$``.

    Distinct errors for bad format vs bad syntax (both are tested behavior
    in the reference — src/args.rs:187-214, src/polars/drop.rs:27-49).
    Returns the pattern unchanged when valid.
    """
    if pattern == "*":
        return pattern
    if not (pattern.startswith("^") and pattern.endswith("$")):
        raise InvalidRegexFormatError(pattern)
    try:
        re.compile(pattern)
    except re.error as exc:
        raise InvalidRegexSyntaxError(pattern, str(exc)) from exc
    return pattern


def parse_null_markers(raw: str) -> list[str]:
    """Parse a comma-separated null-marker list, stripping surrounding quotes.

    reference: src/data_filter.rs:613-630 — each item is trimmed and a
    surrounding ``"..."`` or ``'...'`` pair is removed, so ``'""'`` denotes
    the empty string.
    """
    markers: list[str] = []
    for item in raw.split(","):
        item = item.strip()
        if len(item) >= 2 and item[0] == item[-1] and item[0] in {'"', "'"}:
            item = item[1:-1]
        markers.append(item)
    return markers


@dataclass(frozen=True)
class LoadConfig:
    """What to load and compute (reference DataFilter parity)."""

    path: str = ""
    table_name: str = DEFAULT_TABLE_NAME
    csv_delimiter: str = DEFAULT_CSV_DELIMITER
    infer_schema_rows: int = DEFAULT_INFER_SCHEMA_ROWS
    null_values: tuple[str, ...] = DEFAULT_NULL_VALUES
    force_string_patterns: str | None = None
    exclude_null_cols: bool = False
    apply_sql: bool = False
    query: str = DEFAULT_QUERY
    add_row_index: bool = False
    row_index_name: str = DEFAULT_ROW_INDEX_NAME
    row_index_offset: int = DEFAULT_ROW_INDEX_OFFSET
    normalize: bool = False
    normalize_regex: str | None = None
    drop: bool = False
    drop_regex: str | None = None
    # When False a re-query reuses the cached post-ingest frame instead of
    # re-reading the file (reference fast path, src/data_container.rs:122-129).
    read_data_from_file: bool = True

    def __post_init__(self) -> None:
        for pat in (self.force_string_patterns, self.normalize_regex, self.drop_regex):
            if pat is not None:
                validate_pattern(pat)

    def with_(self, **kwargs) -> LoadConfig:
        return replace(self, **kwargs)

    @property
    def null_marker_list(self) -> list[str]:
        return parse_null_markers(",".join(self.null_values))


class Alignment(Enum):
    LEFT = "left"
    CENTER = "center"
    RIGHT = "right"


#: De-facto type inventory of the reference display layer
#: (src/data_format.rs:15-46): numbers right-aligned, temporals centered,
#: everything else left.
DEFAULT_ALIGNMENTS: dict[str, Alignment] = {
    "byte": Alignment.RIGHT,
    "short": Alignment.RIGHT,
    "integer": Alignment.RIGHT,
    "long": Alignment.RIGHT,
    "float": Alignment.RIGHT,
    "double": Alignment.RIGHT,
    "decimal": Alignment.RIGHT,
    "date": Alignment.CENTER,
    "timestamp": Alignment.CENTER,
    "timestamp_ntz": Alignment.CENTER,
    "interval": Alignment.CENTER,
    "boolean": Alignment.CENTER,
    "string": Alignment.LEFT,
    "binary": Alignment.LEFT,
}


@dataclass(frozen=True)
class ViewConfig:
    """Display-only knobs (reference DataFormat parity). Never touches the
    data plane — formatting happens on already-collected rows."""

    float_decimals: int = 2  # reference: src/data_format.rs:103
    auto_col_width: bool = False
    alignments: dict[str, Alignment] = field(default_factory=lambda: dict(DEFAULT_ALIGNMENTS))


class SortState(Enum):
    """5-state header-click cycle (reference: src/sort.rs:39-61)."""

    NOT_SORTED = 0
    DESC_NULLS_FIRST = 1
    ASC_NULLS_FIRST = 2
    DESC_NULLS_LAST = 3
    ASC_NULLS_LAST = 4

    def next_state(self) -> SortState:
        return SortState((self.value + 1) % 5)


@dataclass(frozen=True)
class SortBy:
    """One sort criterion; a view sorts by a list of these in order.

    reference: src/sort.rs:10-17.
    """

    column_name: str
    ascending: bool = True
    nulls_last: bool = False

    @property
    def state(self) -> SortState:
        if self.ascending:
            return SortState.ASC_NULLS_LAST if self.nulls_last else SortState.ASC_NULLS_FIRST
        return SortState.DESC_NULLS_LAST if self.nulls_last else SortState.DESC_NULLS_FIRST

    @staticmethod
    def from_state(column_name: str, state: SortState) -> SortBy | None:
        if state == SortState.NOT_SORTED:
            return None
        return SortBy(
            column_name,
            ascending=state in (SortState.ASC_NULLS_FIRST, SortState.ASC_NULLS_LAST),
            nulls_last=state in (SortState.DESC_NULLS_LAST, SortState.ASC_NULLS_LAST),
        )
