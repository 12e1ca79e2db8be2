"""Spark 4 Python user-defined TABLE functions — the third face of the
Python extension surface beside the Data Source API (sources/synthetic.py)
and pandas UDFs: custom logic that returns a TABLE per input row, invoked
from SQL through ``LATERAL``, with the planner aware of its schema.

The shipped UDTF is a deterministic sentence splitter, chosen (like the
synthetic data source) so the surface carries a full value-hash oracle:
every regex/trim/filter step is re-stated verbatim in DuckDB SQL.  The
real-world occupants of this slot are the functions SQL can't express —
a real sentence segmenter, a model-backed tagger, a parser emitting one
row per AST node.

Scale notes: a Python UDTF evaluates per ROW on the Python side — it is
the slow path, same as any non-pandas UDF.  The ``useArrow=True``
optimization batches the TRANSFER (Arrow blocks instead of pickled rows)
but not the per-row eval loop, so the guidance mirrors the data source's:
use UDTFs for logic gaps, keep hot-scan analytics in codegen expressions
(the repo's own chunker, x_chunk_documents, stays a ``sequence``/
``explode`` projection for exactly that reason).  The lateral join
parallelizes over the input's partitions — no shuffle is introduced; the
plan is scan → BatchEvalPythonUDTF (or ArrowEvalPythonUDTF) → project.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: sentence boundary: one-or-more terminators followed by whitespace —
#: deliberately simple enough to parse identically under Python re and
#: DuckDB's RE2 (no lookaround, no backreferences).  The whitespace class
#: is EXPLICIT, not ``\s``: Python's ``\s`` is Unicode-aware (NBSP,
#: ideographic space, …) while RE2's is ASCII-only, so ``\s`` would split
#: differently on Unicode whitespace and break the value-hash oracle.
#: catalog_ext interpolates this constant into the DuckDB SQL verbatim.
SENTENCE_BOUNDARY = r"[.!?]+[ \t\n\r\f\v]+"

#: characters stripped from each sentence on BOTH engines (DuckDB's bare
#: trim() strips spaces only, so the set is explicit everywhere)
STRIP_CHARS = " \t\n\r"

# column names are spliced into the lateral-join SQL and the temp-view
# name — validate with the package's one identifier contract so a name
# with spaces, backticks or hyphens fails loudly here instead of
# mis-resolving or throwing a ParseException inside the generated SQL
from polars_view_spark.operators.expectations import _checked_ident  # noqa: E402


class SentenceSplit:
    """UDTF body: ``eval`` is called once per input row and yields one
    tuple per sentence.  Kept stateless so evaluation order and
    partitioning cannot affect results (UDTF instances are per-partition;
    any cross-row state would break the exactly-reproducible contract the
    oracle enforces)."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for part in re.split(SENTENCE_BOUNDARY, text):
            part = part.strip(STRIP_CHARS)
            if part:
                yield idx, part, len(part)
                idx += 1


SENTENCE_SCHEMA = "sentence_idx int, sentence string, n_chars int"


def register_sentence_udtf(spark: SparkSession, use_arrow: bool = True) -> None:
    """Register ``sentence_split`` (idempotent).  ``use_arrow`` requests
    Arrow-batched transfer; if this Spark build rejects the flag the
    registration falls back to the pickled path — results are identical
    either way, only the transfer encoding differs."""
    from pyspark.sql.functions import udtf

    try:
        wrapped = udtf(SentenceSplit, returnType=SENTENCE_SCHEMA, useArrow=use_arrow)
    except TypeError:  # older signature without useArrow
        wrapped = udtf(SentenceSplit, returnType=SENTENCE_SCHEMA)
    spark.udtf.register("sentence_split", wrapped)


def sentence_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, sentence) via the UDTF lateral join:
    ``(id, sentence_idx, sentence, n_chars)``."""
    id_col = _checked_ident(id_col, "sentence_table id_col")
    text_col = _checked_ident(text_col, "sentence_table text_col")
    spark = df.sparkSession
    register_sentence_udtf(spark)
    view = f"__pvs_sentence_src_{id_col}_{text_col}"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.{id_col} AS id, t.sentence_idx, t.sentence, t.n_chars "
        f"FROM {view} d, LATERAL sentence_split(d.{text_col}) t"
    )
