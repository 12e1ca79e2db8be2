"""CLI contract tests (reference: src/args.rs:234-388) + executed SQL
example generator tests — every generated example must actually run."""

import pytest

from polars_view_spark.cli import build_parser, config_from_args
from polars_view_spark.errors import InvalidRegexFormatError


class TestCliContract:
    def test_defaults(self):
        ns = build_parser().parse_args(["data.csv"])
        cfg = config_from_args(ns)
        assert cfg.csv_delimiter == ";"
        assert cfg.table_name == "AllData"
        assert cfg.null_values == ('""', "<N/D>")
        assert not cfg.apply_sql and not cfg.normalize and not cfg.drop

    def test_all_flags_short(self):
        ns = build_parser().parse_args(
            [
                "f.csv",
                "-d", ",",
                "-e",
                "-f", "^id$",
                "-n", "NA, null",
                "-q", "SELECT 1",
                "-r", "^v$",
                "-t", "T",
            ]
        )
        cfg = config_from_args(ns)
        assert cfg.csv_delimiter == ","
        assert cfg.exclude_null_cols
        assert cfg.force_string_patterns == "^id$"
        assert cfg.null_values == ("NA", "null")
        assert cfg.apply_sql and cfg.query == "SELECT 1"
        assert cfg.normalize and cfg.normalize_regex == "^v$"
        assert cfg.table_name == "T"

    def test_bad_regex_rejected(self):
        ns = build_parser().parse_args(["f.csv", "-f", "no_anchor"])
        with pytest.raises(InvalidRegexFormatError):
            config_from_args(ns)


class TestExamples:
    def test_all_examples_execute(self, spark):
        """Port of the reference's intent: the generator's output IS the
        dialect spec, so every example must parse and run through the shim
        (reference never executes them in CI; we do better)."""
        from polars_view_spark.plans.dialect import rewrite_query
        from polars_view_spark.plans.examples import generate_sql_examples

        df = spark.createDataFrame(
            [("x", 5, 123.4, "2024-01-01"), ("y z", 6, 0.5, "2024-06-30")],
            "name string, qty int, price double, d string",
        ).selectExpr("name", "qty", "price", "CAST(d AS DATE) AS d")
        df.createOrReplaceTempView("AllData")
        examples = generate_sql_examples(df.schema, "AllData")
        assert len(examples) >= 18
        for ex in examples:
            spark.sql(rewrite_query(ex, spark)).collect()  # must not raise

    def test_generated_names_filtered(self, spark):
        from polars_view_spark.plans.examples import _nth_by_type

        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("Row Number", T.LongType()),
                T.StructField("real_col", T.LongType()),
            ]
        )
        assert _nth_by_type(schema, 0, lambda dt: True) == "real_col"

    def test_empty_schema(self):
        from pyspark.sql import types as T

        from polars_view_spark.plans.examples import generate_sql_examples

        out = generate_sql_examples(T.StructType([]), "AllData")
        assert len(out) >= 2  # default + LIMIT always present
