"""Executed port of the reference's real-world SQL corpus
(reference: testes-sqls.txt:1-231 — Brazilian tax-credit queries).

The reference ships these as documentation; here every one actually runs
through the dialect shim against a synthetic fixture with the same shape
(accented + spaced column names, string periods, euro-adjacent values), and
the interesting ones assert their results.  This corpus is the best spec of
intended SQL usage: double-quoted AND backticked identifiers, star-EXCEPT /
RENAME / REPLACE, CTEs, SubStr filters, ILIKE, BETWEEN, modulo-hiding.
"""

import pytest

from polars_view_spark.plans.dialect import rewrite_query


@pytest.fixture(scope="module")
def tax_table(spark):
    """Synthetic fixture shaped like the corpus schema (FIXTURES.md F6-ish)."""
    rows = [
        # (cnpj, ano, trimestre, mes, periodo, tipo, natureza, operacao, cst, base, aliq, vtc, vcdt)
        ("11111", 2024, 4, "dez/2024", "PERIODO-APUR 2019", "1-Crédito Básico",
         "Saldo de mês anterior", "1-Entrada", 56, 1234.56, 1.65, 100.0, 90.0),
        ("22222", 2024, 4, "dez/2024", "PERIODO-APUR 2019", "2-Presumido",
         "Aquisição no mercado interno", "2-Saída", 50, 890.12, None, 200.0, 180.0),
        ("33333", 2024, 1, "jan/2024", "PERIODO-APUR 2020", "1-Crédito Básico",
         None, "1-Entrada", 66, 555.0, 0.65, 300.0, 270.0),
        (None, 2023, 4, "dez/2023", "PERIODO-APUR 2021", "3-Importação",
         "Saldo credor", "3-Entrada/Saída", 70, 42.0, 7.6, 400.0, 360.0),
        ("55555", 2024, 4, None, "PERIODO-APUR 2019", "1-Crédito Básico",
         "Saldo de período", "1-Entrada", 52, 777.0, 1.65, 500.0, 450.0),
    ]
    df = spark.createDataFrame(
        rows,
        schema=(
            "`CNPJ Base` string, `Ano do Período de Apuração` int, "
            "`Trimestre do Período de Apuração` int, `Mês do Período de Apuração` string, "
            "`Período Apuração Crédito` string, `Tipo Crédito` string, "
            "`Natureza da Base de Cálculo dos Créditos` string, `Tipo de Operação` string, "
            "`Código de Situação Tributária (CST)` int, "
            "`Valor da Base de Cálculo das Contribuições` double, "
            "`Alíquota de PIS/PASEP (em percentual)` double, "
            "`Valor Total Crédito` double, `Valor Crédito Data Transmissão` double"
        ),
    )
    df.createOrReplaceTempView("AllData")
    return df


def run(spark, q):
    return spark.sql(rewrite_query(q, spark))


def test_q1_select_all(spark, tax_table):
    assert run(spark, "SELECT * FROM AllData;").count() == 5


def test_q2_dquote_columns_like(spark, tax_table):
    q = """
    SELECT "Ano do Período de Apuração", "Tipo Crédito",
           "Valor da Base de Cálculo das Contribuições"
    FROM AllData
    Where "Ano do Período de Apuração" = 2024
    And "Mês do Período de Apuração" Like 'dez%'
    """
    out = run(spark, q)
    assert out.count() == 2
    assert out.columns[0] == "Ano do Período de Apuração"


def test_q3_except_with_filters(spark, tax_table):
    q = """
    SELECT * Except("Valor Total Crédito", "Mês do Período de Apuração")
    FROM AllData
    Where "Ano do Período de Apuração" = 2024
    And "Trimestre do Período de Apuração" = 4
    And "Mês do Período de Apuração" Like '%dez%'
    """
    out = run(spark, q)
    assert "Valor Total Crédito" not in out.columns
    assert "Mês do Período de Apuração" not in out.columns
    assert out.count() == 2  # WHERE still sees the excluded column


def test_q4_qualified_star_substr(spark, tax_table):
    q = """
    SELECT AllData.*, SubStr("Período Apuração Crédito", 14, 4) AS Ano
    FROM AllData
    WHERE SubStr("Período Apuração Crédito", 14, 4) = '2019';
    """
    out = run(spark, q)
    assert out.count() == 3
    assert set(r["Ano"] for r in out.collect()) == {"2019"}


def test_q5_ilike_between_order(spark, tax_table):
    q = """
    SELECT * FROM AllData
    Where "Natureza da Base de Cálculo dos Créditos" is not null
    And "Tipo de Operação" ILike '%entrada%'
    And "Código de Situação Tributária (CST)" Between 50 And 66
    ORDER BY "Código de Situação Tributária (CST)"
    """
    out = run(spark, q)
    assert [r["Código de Situação Tributária (CST)"] for r in out.collect()] == [52, 56]


def test_q6_full_cte_except_replace_rename(spark, tax_table):
    # the flagship corpus query (testes-sqls.txt:63-104)
    q = """
    WITH DadosComAno AS (
      SELECT *,
        CAST(SubStr("Período Apuração Crédito", 14, 4) AS INTEGER) AS Ano
      FROM AllData
    )
    SELECT *
        EXCEPT (
            "Valor Total Crédito",
            "Valor Crédito Data Transmissão"
        )
        REPLACE (
            SubStr("Período Apuração Crédito", 1, 12)
            AS "Período Apuração Crédito"
        )
        RENAME (
            "Tipo Crédito" AS "Pedido de Ressarcimento (PER)"
        )
    FROM DadosComAno
    WHERE Ano >= 2019
    ORDER BY
      Ano ASC,
      "Período Apuração Crédito" ASC,
      "Pedido de Ressarcimento (PER)" DESC;
    """
    out = run(spark, q)
    assert "Valor Total Crédito" not in out.columns
    assert "Pedido de Ressarcimento (PER)" in out.columns
    rows = out.collect()
    assert len(rows) == 5
    # REPLACE truncated the period to 12 chars and ORDER BY saw the new value
    assert all(len(r["Período Apuração Crédito"]) <= 12 for r in rows)
    assert [r["Ano"] for r in rows] == sorted(r["Ano"] for r in rows)


def test_ex9_frequency_group(spark, tax_table):
    q = """
    SELECT `Ano do Período de Apuração`, `Mês do Período de Apuração`,
           COUNT(*) AS Frequency
    FROM AllData
    GROUP BY `Ano do Período de Apuração`, `Mês do Período de Apuração`
    ORDER BY Frequency DESC
    """
    out = run(spark, q)
    assert out.first()["Frequency"] == 2  # (2024, dez/2024)


def test_ex11_substr_modulo_null_or_empty(spark, tax_table):
    q = """
    SELECT
        `Ano do Período de Apuração`,
        SubStr(`Natureza da Base de Cálculo dos Créditos`,1,16) AS nat16,
        `Valor da Base de Cálculo das Contribuições` % 117 AS hidden
    FROM AllData
    WHERE `Natureza da Base de Cálculo dos Créditos` LIKE '%Saldo%'
    AND ( `Mês do Período de Apuração` = '' OR `Mês do Período de Apuração` IS NULL )
    """
    out = run(spark, q)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["nat16"] == "Saldo de período"
    assert rows[0]["hidden"] == pytest.approx(777.0 % 117)


def test_ex12_except_ilike(spark, tax_table):
    q = """
    SELECT * EXCEPT( `Mês do Período de Apuração`, `Valor Total Crédito` )
    FROM AllData
    WHERE `Ano do Período de Apuração` = 2024
    AND `Trimestre do Período de Apuração` = 4
    AND `Mês do Período de Apuração` ILIKE '%DEZ%'
    """
    out = run(spark, q)
    assert out.count() == 2


def test_ex2_rename_preserves_order(spark, tax_table):
    q = 'SELECT * RENAME("Trimestre do Período de Apuração" AS "New Name") FROM AllData'
    out = run(spark, q)
    assert out.columns[2] == "New Name"
    assert out.columns[0] == "CNPJ Base"


def test_groups_frame_emulation_semantics(spark):
    """q_window_groups_frame's DENSE_RANK+RANGE rewrite must equal true
    ANSI GROUPS semantics — pinned on a hand-computed case with ties
    (neither Spark nor DuckDB parses GROUPS, so the oracle can't)."""
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 4, 40), ("a", 4, 50)],
        "p string, k int, x int",
    )
    df.createOrReplaceTempView("gf")
    got = {
        (r["k"], r["x"]): (r["n"], r["s"])
        for r in spark.sql(
            """
            WITH d AS (
              SELECT *, DENSE_RANK() OVER (PARTITION BY p ORDER BY k) AS dr
              FROM gf
            )
            SELECT k, x,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(x) OVER w AS BIGINT) AS s
            FROM d
            WINDOW w AS (PARTITION BY p ORDER BY dr
                         RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
            """
        ).collect()
    }
    # GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW over ORDER BY k:
    #  k=1 rows: frame = {k=1 peers}            -> n=2, s=30
    #  k=2 row:  frame = {k=1, k=2}             -> n=3, s=60
    #  k=4 rows: frame = {k=2, k=4 peers}       -> n=3, s=120
    #  (k=4 is ONE group back from k=2 — GROUPS counts peer groups, not
    #   key distance, which is exactly what RANGE over dense_rank gives)
    assert got == {
        (1, 10): (2, 30),
        (1, 20): (2, 30),
        (2, 30): (3, 60),
        (4, 40): (3, 120),
        (4, 50): (3, 120),
    }
