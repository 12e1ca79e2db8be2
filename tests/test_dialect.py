"""Dialect shim unit tests: strftime translation, dquote identifiers,
comment stripping, star-modifier expansion (SURVEY.md §2C flags)."""

import pytest

from polars_view_spark.errors import SqlDialectError
from polars_view_spark.plans.dialect import (
    double_quotes_to_backticks,
    rewrite_query,
    strip_comments,
    translate_strftime_pattern,
)


class TestStrftime:
    @pytest.mark.parametrize(
        "src,want",
        [
            ("%d/%m/%Y", "dd/MM/yyyy"),
            ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
            ("%Y-%m", "yyyy-MM"),
            ("%H:%M", "HH:mm"),
            ("%d %B %Y", "dd MMMM yyyy"),
            ("%F", "yyyy-MM-dd"),
            ("%%", "%"),
        ],
    )
    def test_tokens(self, src, want):
        assert translate_strftime_pattern(src) == want

    def test_literal_letters_quoted(self):
        # alphabetic literals must be quoted for the JVM formatter
        assert translate_strftime_pattern("%Yyr") == "yyyy'yr'"

    def test_unknown_token_errors(self):
        with pytest.raises(SqlDialectError):
            translate_strftime_pattern("%Q")


class TestDquote:
    def test_identifier(self):
        assert double_quotes_to_backticks('SELECT "a b" FROM t') == "SELECT `a b` FROM t"

    def test_single_quoted_untouched(self):
        q = "SELECT 'say \"hi\"' FROM t"
        assert double_quotes_to_backticks(q) == q

    def test_escaped_dquote(self):
        assert double_quotes_to_backticks('SELECT "a""b" FROM t') == 'SELECT `a"b` FROM t'


class TestComments:
    def test_line_and_block(self):
        q = "SELECT a, -- comment\n b /* block */ FROM t"
        s = strip_comments(q)
        assert "comment" not in s and "block" not in s
        assert "SELECT a," in s and "FROM t" in s

    def test_comment_chars_in_string(self):
        q = "SELECT '--not a comment' FROM t"
        assert strip_comments(q) == q


class TestStarModifiers:
    @pytest.fixture(scope="class", autouse=True)
    def table(self, spark):
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, val double"
        ).createOrReplaceTempView("AllData")

    def test_rename(self, spark):
        df = spark.sql(rewrite_query("SELECT * RENAME (val AS v2) FROM AllData", spark))
        assert df.columns == ["id", "name", "v2"]

    def test_replace(self, spark):
        df = spark.sql(
            rewrite_query("SELECT * REPLACE (val * 2 AS val) FROM AllData", spark)
        )
        assert sorted(r["val"] for r in df.collect()) == [3.0, 5.0]

    def test_combined_order(self, spark):
        # EXCEPT applies first, then REPLACE, then RENAME — reference
        # example shape (src/sqls.rs:192-217)
        q = """SELECT *
        EXCEPT (id)
        REPLACE (upper(name) AS name)
        RENAME (name AS loud_name)
        FROM AllData ORDER BY loud_name"""
        df = spark.sql(rewrite_query(q, spark))
        assert df.columns == ["loud_name", "val"]
        assert [r["loud_name"] for r in df.collect()] == ["A", "B"]

    def test_cte_with_modifiers_and_where(self, spark):
        # the full testes-sqls.txt:63-104 shape: CTE + EXCEPT + REPLACE +
        # RENAME + WHERE on a CTE column + ORDER BY the renamed column
        q = """
        WITH extended AS (
          SELECT *, id * 10 AS big FROM AllData
        )
        SELECT *
        EXCEPT ("val")
        REPLACE (SubStr("name", 1, 1) AS "name")
        RENAME ("name" AS "initial")
        FROM extended
        WHERE big >= 10
        ORDER BY "initial" DESC
        """
        df = spark.sql(rewrite_query(q, spark))
        assert df.columns == ["id", "initial", "big"]
        assert [r["initial"] for r in df.collect()] == ["b", "a"]

    def test_replace_unknown_target_errors(self, spark):
        with pytest.raises(SqlDialectError):
            rewrite_query("SELECT * REPLACE (1 AS nope) FROM AllData", spark)

    def test_strftime_in_query(self, spark):
        spark.sql("SELECT timestamp'2024-03-05 01:02:03' AS ts").createOrReplaceTempView(
            "T1"
        )
        df = spark.sql(
            rewrite_query("SELECT STRFTIME(ts, '%d/%m/%Y') AS d FROM T1", spark)
        )
        assert df.first()["d"] == "05/03/2024"

    def test_setop_except_untouched(self, spark):
        # EXCEPT as a set operation must NOT be treated as the star modifier
        q = (
            "SELECT id FROM AllData EXCEPT SELECT id FROM AllData WHERE id = 1"
        )
        out = spark.sql(rewrite_query(q, spark))
        assert [r["id"] for r in out.collect()] == [2]

    def test_trailing_semicolon(self, spark):
        df = spark.sql(rewrite_query("SELECT * FROM AllData;", spark))
        assert df.count() == 2


class TestStarVsMultiplication:
    """The star-modifier parser must only fire on select-list stars — a
    ``*`` used as multiplication followed by the REPLACE string *function*
    is valid SQL and must pass through untouched (regression)."""

    @pytest.fixture(scope="class", autouse=True)
    def table(self, spark):
        spark.createDataFrame(
            [(2, "NA"), (3, "aN")], "qty int, flag string"
        ).createOrReplaceTempView("MulData")

    def test_multiplication_then_replace_function(self, spark):
        q = "SELECT qty * LENGTH(REPLACE(flag, 'N', 'XX')) AS v FROM MulData ORDER BY v"
        df = spark.sql(rewrite_query(q, spark))
        assert [r["v"] for r in df.collect()] == [6, 9]

    def test_multiplication_then_rename_like_call(self, spark):
        # no RENAME function exists; the point is the rewriter must not
        # consume it after an arithmetic star and corrupt the query text
        q = "SELECT qty * 2 AS v FROM MulData ORDER BY v"
        df = spark.sql(rewrite_query(q, spark))
        assert [r["v"] for r in df.collect()] == [4, 6]

    def test_count_star_untouched(self, spark):
        q = "SELECT COUNT(*) AS n FROM MulData"
        assert spark.sql(rewrite_query(q, spark)).collect()[0]["n"] == 2

    def test_qualified_star_modifier_still_fires(self, spark):
        q = "SELECT m.* RENAME (flag AS f) FROM MulData m"
        df = spark.sql(rewrite_query(q, spark))
        assert df.columns == ["qty", "f"]


class TestStarAfterHint:
    def test_hint_then_star_modifier(self, spark):
        """A /*+ hint */ between SELECT and * must not demote the star to
        multiplication — the RENAME modifier still expands."""
        from polars_view_spark.plans.dialect import rewrite_query

        df = spark.createDataFrame([(1, "x")], ["a", "b"])
        df.createOrReplaceTempView("HintData")
        q = rewrite_query(
            'SELECT /*+ REPARTITION(2) */ * RENAME (a AS k) FROM HintData', spark
        )
        out = spark.sql(q)
        assert out.columns == ["k", "b"], out.columns


class TestQualify:
    def test_alias_predicate_with_tail(self, spark):
        from polars_view_spark.plans.dialect import rewrite_query

        spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView("nation")
        q = ("SELECT n_name, n_regionkey, ROW_NUMBER() OVER "
             "(PARTITION BY n_regionkey ORDER BY n_name) AS r "
             "FROM nation QUALIFY r <= 2 ORDER BY n_regionkey, r LIMIT 4")
        rows = spark.sql(rewrite_query(q, spark)).collect()
        assert [r["r"] for r in rows] == [1, 2, 1, 2]

    def test_raw_window_predicate(self, spark):
        from polars_view_spark.plans.dialect import rewrite_query

        spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView("nation")
        q = ("SELECT n_name, n_regionkey FROM nation QUALIFY "
             "ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1")
        rows = spark.sql(rewrite_query(q, spark)).collect()
        # one winner per region, no helper column in the output
        assert len(rows) == len({r["n_regionkey"] for r in rows})
        assert sorted(rows[0].asDict()) == ["n_name", "n_regionkey"]

    def test_string_literal_untouched(self, spark):
        from polars_view_spark.plans.dialect import rewrite_qualify

        q = "SELECT 'no QUALIFY here' AS s FROM t"
        assert rewrite_qualify(q) == q

    def test_empty_predicate_raises(self):
        import pytest as _pytest

        from polars_view_spark.plans.dialect import SqlDialectError, rewrite_qualify

        with _pytest.raises(SqlDialectError):
            rewrite_qualify("SELECT a FROM t QUALIFY ")

    def test_set_op_after_qualify_refused(self):
        """A top-level set op after the predicate would be swallowed into
        the predicate and emit malformed SQL — must refuse, not rewrite
        (ADVICE r03)."""
        import pytest as _pytest

        from polars_view_spark.plans.dialect import SqlDialectError, rewrite_qualify

        for op in ("UNION ALL", "UNION", "INTERSECT", "EXCEPT", "MINUS"):
            with _pytest.raises(SqlDialectError, match="set operation"):
                rewrite_qualify(
                    "SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rk FROM t "
                    f"QUALIFY rk = 1 {op} SELECT b, 1 FROM u"
                )

    def test_set_op_inside_subquery_still_rewrites(self):
        """EXCEPT/UNION inside parens (e.g. an IN-subquery in the
        predicate) is not a top-level set op and must not trip the guard."""
        from polars_view_spark.plans.dialect import rewrite_qualify

        q = (
            "SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rk FROM t "
            "QUALIFY rk IN (SELECT x FROM u EXCEPT SELECT y FROM v)"
        )
        out = rewrite_qualify(q)
        assert "__pvs_qualify__" in out

    def test_select_distinct_qualify_refused(self):
        """DuckDB/Snowflake evaluate QUALIFY BEFORE DISTINCT; the wrap
        would evaluate it after — refuse rather than silently diverge
        (ADVICE r03)."""
        import pytest as _pytest

        from polars_view_spark.plans.dialect import SqlDialectError, rewrite_qualify

        with _pytest.raises(SqlDialectError, match="DISTINCT"):
            rewrite_qualify(
                "SELECT DISTINCT a FROM t "
                "QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"
            )
