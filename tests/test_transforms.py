"""Golden tests for the six pipeline transforms — ported from the
reference's inline suites (SURVEY.md §5.2; reference:
src/polars/{drop,normalize,replace,remove,add}.rs tests)."""

import pytest

from polars_view_spark.errors import (
    ColumnNameConflictError,
    InvalidDataTypeForRegexError,
    InvalidRegexFormatError,
    InvalidRegexSyntaxError,
)
from polars_view_spark.operators.rowindex import add_row_index, resolve_unique_name
from polars_view_spark.operators.transforms import (
    drop_columns_by_regex,
    normalize_float_strings_by_regex,
    remove_null_columns,
    replace_values_with_null,
    round_float_columns,
)


@pytest.fixture(scope="module")
def drop_df(spark):
    # reference fixture: src/polars/drop.rs:118-127 (FIXTURES.md F4)
    return spark.createDataFrame(
        [(1, "a", "x", 1.5, True), (2, "b", None, 2.5, False)],
        "ID int, Value_A string, `Description B` string, Value_C double, IgnoreMe boolean",
    )


class TestDrop:
    def test_single_column(self, drop_df):
        out = drop_columns_by_regex(drop_df, "^Description B$")
        assert out.columns == ["ID", "Value_A", "Value_C", "IgnoreMe"]

    def test_regex_multi(self, drop_df):
        out = drop_columns_by_regex(drop_df, "^Value_.*$")
        assert out.columns == ["ID", "Description B", "IgnoreMe"]

    def test_wildcard_is_0x0(self, drop_df):
        # reference: '*' drops ALL columns AND rows (src/polars/drop.rs:77-82)
        out = drop_columns_by_regex(drop_df, "*")
        assert out.columns == []
        assert out.count() == 0

    def test_no_match_unchanged(self, drop_df):
        out = drop_columns_by_regex(drop_df, "^NonExistent$")
        assert out.columns == drop_df.columns

    def test_partial_name_no_match(self, drop_df):
        # full-name match only: ^Value$ matches nothing
        out = drop_columns_by_regex(drop_df, "^Value$")
        assert out.columns == drop_df.columns

    def test_invalid_format(self, drop_df):
        with pytest.raises(InvalidRegexFormatError):
            drop_columns_by_regex(drop_df, "Value_.*")

    def test_invalid_syntax(self, drop_df):
        with pytest.raises(InvalidRegexSyntaxError):
            drop_columns_by_regex(drop_df, "^Value_(*$")


class TestNormalize:
    # reference matrix: src/polars/normalize.rs:160-216 (FIXTURES.md F2)
    CASES = [
        ("1.234,56", 1234.56),
        ("78,90", 78.90),
        ("1.000", 1000.0),
        ("-10,0", -10.0),
        ("500,", 500.0),
        ("0,1", 0.1),
        ("10", 10.0),
        ("1.2.3,4.5", None),  # dots stripped -> "123,45"? no: "123,45" wait
        ("Invalid", None),
        (".", None),
        ("", None),
        (None, None),
    ]

    def test_matrix(self, spark):
        rows = [(i, v) for i, (v, _) in enumerate(self.CASES)]
        df = spark.createDataFrame(rows, "id int, Value_PT string")
        out = normalize_float_strings_by_regex(df, "^Value_PT$").orderBy("id").collect()
        for (src, want), got in zip(self.CASES, out):
            if src == "1.2.3,4.5":
                # dots (thousands) stripped first -> "123,45" -> 123.45
                assert got["Value_PT"] == pytest.approx(123.45), src
            elif want is None:
                assert got["Value_PT"] is None, src
            else:
                assert got["Value_PT"] == pytest.approx(want), src

    def test_error_on_non_string(self, spark):
        df = spark.createDataFrame([(1, 1.5)], "id int, Already_F64 double")
        with pytest.raises(InvalidDataTypeForRegexError):
            normalize_float_strings_by_regex(df, "^Already_F64$")

    def test_wildcard_mixed_types_errors(self, spark):
        # '*' matches the int column too -> error, not skip
        df = spark.createDataFrame([("1,5", 2)], "a string, b int")
        with pytest.raises(InvalidDataTypeForRegexError):
            normalize_float_strings_by_regex(df, "*")

    def test_no_match_noop(self, spark):
        df = spark.createDataFrame([("x", 1)], "a string, b int")
        out = normalize_float_strings_by_regex(df, "^zzz$")
        assert out.collect() == df.collect()


class TestReplaceNulls:
    # reference: src/polars/replace.rs:149-180 + trim corpus 412-489
    def test_string_mode_trim(self, spark):
        df = spark.createDataFrame(
            [("Keep",), (" N/A ",), ("<N/D>",), ("  ",), (None,), ("999",)],
            "col_str string",
        )
        out = replace_values_with_null(df, ["", "<N/D>", "N/A", "999"]).collect()
        assert [r["col_str"] for r in out] == ["Keep", None, None, None, None, None]

    def test_string_mode_leaves_numerics(self, spark):
        df = spark.createDataFrame([("999", 999, 999.0)], "s string, i int, f double")
        row = replace_values_with_null(df, ["999"]).first()
        assert row["s"] is None and row["i"] == 999 and row["f"] == 999.0

    def test_universal_mode_casts(self, spark):
        # "999" nulls int 999 but NOT double 999.0 (cast -> "999.0"),
        # pinning the distinction from src/polars/replace.rs:346-352
        df = spark.createDataFrame(
            [(999, 999.0, 3.45, False)], "i int, f double, f2 double, b boolean"
        )
        row = replace_values_with_null(df, ["999", "3.45", "false"], all_columns=True).first()
        assert row["i"] is None
        assert row["f"] == 999.0
        assert row["f2"] is None
        assert row["b"] is None

    def test_empty_markers_noop(self, spark):
        df = spark.createDataFrame([("x",)], "s string")
        assert replace_values_with_null(df, []).collect() == df.collect()


class TestRemoveNullColumns:
    def test_mixed(self, spark):
        # FIXTURES.md F5
        df = spark.createDataFrame(
            [(1, None, "a", None, 1.0), (None, None, None, None, None)],
            "col_a int, col_b int, col_c string, col_d string, col_e double",
        )
        out = remove_null_columns(df)
        assert out.columns == ["col_a", "col_c", "col_e"]

    def test_zero_rows_drops_all(self, spark):
        # reference edge: src/polars/remove.rs:157-180
        df = spark.createDataFrame([], "a int, b string")
        out = remove_null_columns(df)
        assert out.columns == []

    def test_all_populated_unchanged(self, spark):
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        assert remove_null_columns(df) is df


class TestRowIndex:
    def test_default(self, spark):
        df = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
        out = add_row_index(df, "Row Number", 1)
        assert out.columns[0] == "Row Number"
        assert [r["Row Number"] for r in out.collect()] == [1, 2, 3]

    def test_custom_offset(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "v string")
        out = add_row_index(df, "idx", 100)
        assert [r["idx"] for r in out.collect()] == [100, 101]

    def test_name_conflict_suffix(self, spark):
        df = spark.createDataFrame([(1, 2)], "`Row Number` int, `Row Number_1` int")
        out = add_row_index(df, "Row Number", 1)
        assert out.columns[0] == "Row Number_2"

    def test_conflict_exhaustion(self):
        existing = ["x"] + [f"x_{i}" for i in range(1, 1001)]
        with pytest.raises(ColumnNameConflictError):
            resolve_unique_name("x", existing)

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "v string")
        out = add_row_index(df, "idx", 1)
        assert out.columns == ["idx", "v"]
        assert out.count() == 0

    def test_distributed_contiguity(self, spark):
        # many partitions -> index must still be contiguous 1..n
        df = spark.range(0, 10000, 1, 16).toDF("v")
        out = add_row_index(df, "idx", 1)
        got = sorted(r["idx"] for r in out.collect())
        assert got == list(range(1, 10001))


class TestRound:
    def test_half_away_from_zero(self, spark):
        df = spark.createDataFrame(
            [(2.675, -2.675, 1)], "a double, b double, c int"
        )
        row = round_float_columns(df, 2).first()
        # Spark HALF_UP on the binary value: 2.675 stored as 2.67499…,
        # rounds to 2.67 (same as the reference's decimal-aware rounding of
        # the stored double)
        assert row["c"] == 1  # non-floats untouched
        assert abs(row["a"]) == abs(row["b"])  # symmetric away-from-zero

    def test_nulls_kept(self, spark):
        df = spark.createDataFrame([(None,)], "a double")
        assert round_float_columns(df, 2).first()["a"] is None


class TestRowIndexPerturbation:
    def test_perturbed_upstream_contiguity(self, spark):
        """Shuffled + filtered upstream (AQE-subject exchange): the index
        must stay contiguous, and re-materializing the SAME frame must not
        shift it — the persisted tag pins one evaluation of
        monotonically_increasing_id across the count and index jobs."""
        df = (
            spark.range(0, 5000, 1, 8)
            .toDF("v")
            .repartition(13, "v")
            .filter("v % 3 != 0")
        )
        n = df.count()
        out = add_row_index(df, "idx", 1)
        got = sorted(r["idx"] for r in out.collect())
        assert got == list(range(1, n + 1))
        got2 = sorted(r["idx"] for r in out.collect())
        assert got2 == got


class TestSentenceUdtf:
    def test_unicode_whitespace_is_not_a_boundary(self, spark):
        """The boundary's whitespace class is explicit ASCII, NOT ``\\s``:
        Python's ``\\s`` is Unicode-aware while DuckDB's RE2 is ASCII-only,
        so an NBSP after a terminator must NOT split on the Spark side
        either — pinned here so a regex 'simplification' back to ``\\s``
        breaks a test before it breaks the value-hash oracle."""
        from polars_view_spark.operators.udtfs import sentence_table

        docs = spark.createDataFrame(
            [(1, "End. Next part. Tail")], "doc_id long, text string"
        )
        out = sentence_table(docs).orderBy("sentence_idx").collect()
        assert [r["sentence"] for r in out] == ["End. Next part", "Tail"]

    def test_non_identifier_columns_rejected(self, spark):
        """Column names are spliced into the lateral-join SQL — anything
        outside plain identifier shape must fail loudly up front, not as
        a ParseException (or silent mis-resolution) inside the generated
        statement."""
        import pytest

        from polars_view_spark.operators.udtfs import sentence_table

        docs = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
        with pytest.raises(ValueError, match="plain SQL identifier"):
            sentence_table(docs, id_col="doc id")
        with pytest.raises(ValueError, match="plain SQL identifier"):
            sentence_table(docs, text_col="text`; DROP")
