from polars_view_spark.meta.display import format_page, format_value

__all__ = ["format_page", "format_value"]
