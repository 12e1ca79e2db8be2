"""Declarative data-quality expectations — N constraint rules over a
table evaluated in ONE pass.

The pre-training gate a large pipeline runs on every ingest batch:
not-null, range, accepted-values, uniqueness and referential-integrity
rules, each reporting violation counts rather than failing fast (a 100 TB
validation that dies on the first bad row tells you nothing about the
other rules).

Scale shape: every row-level rule compiles to one conditional-sum
aggregate, uniqueness to ``count − approx-free count(DISTINCT)``, and a
referential rule to a broadcast LEFT join against the (small, distinct)
key side — so ANY number of rules costs ONE scan + ONE aggregate of the
fact table, plus one broadcast per referenced dimension.  No per-rule
jobs, no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rule names and column names are spliced into SQL identifiers/aliases —
#: restrict them to identifier shape so no input can break (or inject
#: into) the generated expressions
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _checked_ident(value: str, what: str) -> str:
    if not isinstance(value, str) or not _IDENT.match(value):
        raise ValueError(
            f"{what} must be a plain SQL identifier "
            f"([A-Za-z_][A-Za-z0-9_]*), got {value!r}"
        )
    return value


def _rule_condition(rule: dict) -> str:
    """SQL boolean: TRUE when the row VIOLATES the rule."""
    kind = rule["kind"]
    col = _checked_ident(rule.get("column"), f"rule {rule['name']!r} column")
    if kind == "not_null":
        return f"{col} IS NULL"
    if kind == "in_range":
        lo, hi = float(rule["low"]), float(rule["high"])
        return f"({col} IS NULL OR {col} < {lo} OR {col} > {hi})"
    if kind == "accepted_values":
        # values are data, not identifiers: escape quotes SQL-style
        vals = ", ".join(
            "'" + str(v).replace("'", "''") + "'" for v in rule["values"]
        )
        return f"({col} IS NULL OR {col} NOT IN ({vals}))"
    if kind == "references":
        return f"__ref_{rule['name']} IS NULL"
    raise ValueError(f"unknown expectation kind: {kind!r}")


def expectations_report(
    df: DataFrame,
    rules: list[dict],
    ref_frames: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate every rule, return one row per rule:
    ``(rule, n_checked, n_violations, passed)``, ordered by rule name.

    Rule dicts: ``{"name", "kind": not_null|in_range|accepted_values|
    unique|references, "column", ...}`` — ``in_range`` adds ``low``/
    ``high``, ``accepted_values`` adds ``values``, ``references`` adds
    ``ref`` (a key in ``ref_frames``) and ``ref_column``.
    """
    if not rules:
        raise ValueError(
            "rules must be non-empty — a dynamically-built rule list that "
            "filtered down to nothing should skip the report entirely"
        )
    names = [_checked_ident(r["name"], "rule name") for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    base = df
    for r in rules:
        if r["kind"] == "references":
            if not ref_frames or r["ref"] not in ref_frames:
                raise ValueError(
                    f"references rule {r['name']!r} needs ref_frames["
                    f"{r['ref']!r}] — got keys "
                    f"{sorted(ref_frames) if ref_frames else []}"
                )
            ref = ref_frames[r["ref"]]
            keys = ref.select(
                F.col(r["ref_column"]).alias(r["column"]),
                F.lit(1).alias(f"__ref_{r['name']}"),
            ).distinct()
            base = base.join(F.broadcast(keys), r["column"], "left")

    aggs = [F.count(F.lit(1)).cast("long").alias("n_checked")]
    for r in rules:
        if r["kind"] == "unique":
            aggs.append(
                (
                    F.count(F.col(r["column"]))
                    - F.countDistinct(F.col(r["column"]))
                )
                .cast("long")
                .alias(f"v_{r['name']}")
            )
        else:
            aggs.append(
                F.sum(
                    F.expr(
                        f"CASE WHEN {_rule_condition(r)} THEN 1 ELSE 0 END"
                    )
                )
                .cast("long")
                .alias(f"v_{r['name']}")
            )
    one = base.agg(*aggs)

    stacked = ", ".join(f"'{r['name']}', v_{r['name']}" for r in rules)
    return (
        one.select(
            "n_checked",
            F.expr(
                f"stack({len(rules)}, {stacked}) AS (rule, n_violations)"
            ),
        )
        .select(
            "rule",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )
