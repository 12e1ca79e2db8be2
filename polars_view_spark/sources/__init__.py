from polars_view_spark.sources.readers import FileFormat, detect_format, read_any
from polars_view_spark.sources.sniff import sniff_delimiter
from polars_view_spark.sources.writers import save, save_as

__all__ = ["FileFormat", "detect_format", "read_any", "save", "save_as", "sniff_delimiter"]
