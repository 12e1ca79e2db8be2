from polars_view_spark.plans.dialect import rewrite_query, translate_strftime_pattern

__all__ = ["rewrite_query", "translate_strftime_pattern"]
