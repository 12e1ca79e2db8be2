from polars_view_spark.sources.readers import (
    FileFormat,
    detect_format,
    read_any,
    read_binary_dir,
    read_fixed_width,
    read_xml,
)
from polars_view_spark.sources.sniff import sniff_delimiter
from polars_view_spark.sources.synthetic import SynthEventsDataSource, read_synth_events
from polars_view_spark.sources.writers import save, save_as, write_dataset

__all__ = [
    "FileFormat",
    "detect_format",
    "read_any",
    "read_binary_dir",
    "read_fixed_width",
    "read_xml",
    "SynthEventsDataSource",
    "read_synth_events",
    "save",
    "save_as",
    "sniff_delimiter",
    "write_dataset",
]
