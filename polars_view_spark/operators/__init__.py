from polars_view_spark.operators.rowindex import add_row_index, resolve_unique_name
from polars_view_spark.operators.sort import apply_sort
from polars_view_spark.operators.transforms import (
    build_pipeline,
    drop_columns_by_regex,
    normalize_float_strings_by_regex,
    remove_null_columns,
    replace_values_with_null,
    round_float_columns,
    run_sql,
)

__all__ = [
    "add_row_index",
    "apply_sort",
    "build_pipeline",
    "drop_columns_by_regex",
    "normalize_float_strings_by_regex",
    "remove_null_columns",
    "replace_values_with_null",
    "resolve_unique_name",
    "round_float_columns",
    "run_sql",
]
