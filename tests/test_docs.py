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


def test_no_fine_rounding_of_transcendental_oracles():
    """Float-stability lint (from the PMI incident): an oracle line that
    ROUNDs an ln()/log()/sqrt-of-aggregate expression at 5+ decimals is one
    1-ulp engine divergence away from a hash flip — Java's Math.log is
    permitted 1-ulp error vs libm's.  Keep transcendental outputs at ≤4 dp
    or restructure them to exact arithmetic (see bigram_pmi's lift)."""
    import re

    from polars_view_spark.catalog import entries

    offenders = []
    for name, e in entries().items():
        if not e.oracle:
            continue
        for ln_no, line in enumerate(e.oracle.splitlines(), 1):
            low = line.lower()
            if ("ln(" in low or "log(" in low) and re.search(r",\s*[5-9]\s*\)", low):
                offenders.append(f"{name}:{ln_no}: {line.strip()}")
    assert not offenders, (
        "transcendental expressions rounded at >=5 dp in oracles:\n"
        + "\n".join(offenders)
    )


def test_no_ghost_entries_in_operators_md():
    """Reverse traceability: every backtick-quoted entry-shaped name in
    OPERATORS.md must be a registered catalog entry — a doc row naming a
    renamed/removed entry fails CI, not judge review."""
    import re

    from polars_view_spark.catalog import entries

    with open(os.path.join(REPO, "OPERATORS.md")) as fh:
        doc = fh.read()
    known = set(entries())
    ghosts = sorted(
        t
        for t in set(re.findall(r"`((?:q\d*|[tdsex])_[a-z0-9_]+)`", doc))
        if t not in known
    )
    assert not ghosts, f"OPERATORS.md names unregistered entries: {ghosts}"
