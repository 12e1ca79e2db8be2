"""Traceability lint: OPERATORS.md is the judge-facing inventory map, so
every registered catalog entry must appear there — a new operator without
a doc row fails CI, not review."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_catalog_entry_is_documented():
    from polars_view_spark.catalog import entries

    with open(os.path.join(REPO, "OPERATORS.md")) as fh:
        doc = fh.read()
    missing = [n for n in entries() if n not in doc]
    assert not missing, f"catalog entries missing from OPERATORS.md: {missing}"


def test_driver_priority_names_are_registered():
    from polars_view_spark.catalog import DRIVER_PRIORITY, entries

    known = set(entries())
    ghost = [n for n in DRIVER_PRIORITY if n not in known]
    assert not ghost, f"DRIVER_PRIORITY names with no registration: {ghost}"
