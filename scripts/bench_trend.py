"""Regenerate BENCH_trend.csv from the recorded per-round bench artifacts
(VERDICT r07 task 8): one row per (round, query) with the Spark median and,
where a detail sidecar exists, the DuckDB oracle time — so a per-query
regression (like the round-6 d_minhash_incremental flag) shows up as a
TREND across rounds instead of a single-round delta someone has to spot.

Idempotent by design: it derives everything from BENCH_r{N}.json (driver
stamps) and BENCH_detail_r{N}.json / BENCH_local.json (full detail written
by bench.py), so re-running after every local bench run just refreshes the
same file.  Run directly (``python scripts/bench_trend.py``) or let
bench.py call :func:`write_trend` at the end of each run.
"""

from __future__ import annotations

import csv
import glob
import json
import os
import re


def _load(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _rounds(repo: str) -> dict[int, dict]:
    """round -> merged record: driver stamp wins for spark medians, the
    detail sidecar fills in duckdb per-query times."""
    out: dict[int, dict] = {}
    for pattern, kind in (
        ("BENCH_r[0-9]*.json", "stamp"),
        ("BENCH_detail_r[0-9]*.json", "detail"),
    ):
        for p in sorted(glob.glob(os.path.join(repo, pattern))):
            m = re.search(r"_r(\d+)\.json$", p)
            if not m:
                continue
            rec = _load(p)
            if not isinstance(rec, dict):
                continue
            # driver stamps wrap the bench line: {"n":..., "parsed": {...}}
            if kind == "stamp" and isinstance(rec.get("parsed"), dict):
                inner = dict(rec["parsed"])
                inner.setdefault("sf", rec.get("sf", ""))
                rec = inner
            n = int(m.group(1))
            slot = out.setdefault(n, {})
            slot[kind] = rec
    return out


def write_trend(repo: str, out_name: str = "BENCH_trend.csv") -> str:
    rows: list[tuple] = []
    for n, rec in sorted(_rounds(repo).items()):
        stamp = rec.get("stamp") or {}
        detail = rec.get("detail") or {}
        queries = stamp.get("queries") or detail.get("queries") or {}
        duck = detail.get("duckdb_queries") or {}
        sf = stamp.get("sf", detail.get("sf", ""))
        for q in sorted(queries):
            rows.append((n, sf, q, queries[q], duck.get(q, "")))
        total = stamp.get("value", detail.get("value", ""))
        if total != "":
            rows.append(
                (
                    n,
                    sf,
                    "__total__",
                    total,
                    stamp.get("duckdb_total", detail.get("duckdb_total", "")),
                )
            )
    path = os.path.join(repo, out_name)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["round", "sf", "query", "spark_sec", "duckdb_sec"])
        w.writerows(rows)
    return path


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(write_trend(repo))
