"""File writers: CSV / JSON (single array) / NDJSON / Parquet / ORC, plus
the save-in-place extension guard.

Parity targets (reference: src/file_dialog.rs:59-278).  Two modes:

- ``save`` / ``save_as`` — *single-file* semantics like the reference (a
  desktop viewer saves one file).  Implemented as a distributed write to a
  temp directory followed by a driver-side rename of the single part file
  when the plan has one partition, else ``coalesce(1)``.  This is the
  human-scale path; it is NOT the 100 TB path and says so.
- ``write_dataset`` — the scale path: plain partitioned directory writes,
  optionally bucketed/partitioned, no coalesce.  At 100 TB you always want
  this one.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from polars_view_spark.config import LoadConfig
from polars_view_spark.errors import SaveFormatMismatchError, UnsupportedFormatError
from polars_view_spark.sources.readers import XML_ROW_TAG, FileFormat, detect_format


#: characters that can never appear in an XML element name (ASCII subset;
#: Unicode letters stay allowed), plus the leading chars a name can't start
#: with.  Conservative on purpose: flag only what is definitely illegal.
#: ':' is included — the StAX writer treats it as an unbound namespace
#: prefix and dies; C0 controls are caught by the ord() check below.
_XML_NAME_BAD_CHARS = set(" !\"#$%&'()*+,/:;<=>?@[\\]^`{|}~")


def _bad_xml_name(name: str) -> bool:
    return (
        not name
        or name[0].isdigit()
        or name[0] in ".-"
        or any(ch in _XML_NAME_BAD_CHARS or ord(ch) < 32 for ch in name)
    )


def _check_xml_element_names(df: DataFrame, exclude: set[str] | None = None) -> None:
    """Field names become XML element names — validate them driver-side.

    Spark's StAX writer does reject an illegal name, but only at task
    runtime as an opaque ``TASK_WRITE_FAILED`` executor stack trace; a
    viewer user converting a CSV whose headers carry spaces deserves the
    repo's typed-error treatment instead (same discipline as the
    save-in-place guard), with every offending column listed up front.

    Recurses into struct/array schemas — nested field names are written
    as elements too.  ``exclude`` skips hive partition columns, which
    land in directory names, never in file content.  (Map KEYS also
    become element tags but are data, not schema — those stay a runtime
    error by nature.)"""
    from pyspark.sql import types as T

    bad: list[str] = []

    def walk(dtype, path: str) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                child = f"{path}.{f.name}" if path else f.name
                if _bad_xml_name(f.name):
                    bad.append(child)
                walk(f.dataType, child)
        elif isinstance(dtype, T.ArrayType):
            walk(dtype.elementType, path)
        elif isinstance(dtype, T.MapType):
            walk(dtype.valueType, path)

    for f in df.schema.fields:
        if exclude and f.name in exclude:
            continue
        if _bad_xml_name(f.name):
            bad.append(f.name)
        walk(f.dataType, f.name)
    if bad:
        raise UnsupportedFormatError(
            f"column names {bad!r} are not valid XML element names; rename "
            "them (e.g. SELECT * RENAME) before writing XML"
        )


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = FileFormat.PARQUET,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    cluster_partitions: int | None = None,
    csv_delimiter: str = ";",
) -> None:
    """Distributed directory write — the 100 TB path.

    ``partition_by`` produces hive-style partition dirs, which later reads
    prune automatically (partition pruning).  ``cluster_by`` range-
    repartitions and sorts within partitions on the given keys before
    writing, so each output file covers a narrow key range — parquet
    row-group/file min-max statistics then let later point/range filters
    skip most files entirely (data skipping, the poor man's Z-order; for
    multi-key use the leading key's selectivity dominates).
    """
    if cluster_by:
        cols = [df[c] for c in cluster_by]
        # default: let AQE size the range partitions (the at-scale choice);
        # cluster_partitions pins the count for deterministic file layouts
        df = (
            df.repartitionByRange(cluster_partitions, *cols)
            if cluster_partitions
            else df.repartitionByRange(*cols)
        ).sortWithinPartitions(*cols)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == FileFormat.PARQUET:
        writer.parquet(path)
    elif fmt == FileFormat.ORC:
        writer.orc(path)
    elif fmt == FileFormat.CSV:
        writer.option("sep", csv_delimiter).option("header", "true").csv(path)
    elif fmt == FileFormat.NDJSON:
        writer.json(path)
    elif fmt == FileFormat.XML:
        _check_xml_element_names(df, exclude=set(partition_by or ()))
        writer.option("rowTag", XML_ROW_TAG).xml(path)
    elif fmt == FileFormat.JSON:
        raise UnsupportedFormatError(
            "single-document JSON has no distributed writer; use save_as() "
            "(driver-side) or NDJSON for datasets"
        )
    else:
        raise UnsupportedFormatError(f"unknown format {fmt!r}")


def _single_file_write(df: DataFrame, target: str, fmt: str, csv_delimiter: str) -> None:
    """Write ``df`` as ONE file at ``target`` (viewer save semantics).

    Coalesces to one partition — documented driver-adjacent bottleneck,
    acceptable because a viewer save is human-scale output.  Large outputs
    should use ``write_dataset``.
    """
    from polars_view_spark.sources.readers import split_compression

    _, codec = split_compression(target)
    tmpdir = tempfile.mkdtemp(prefix="pvs_write_")
    try:
        out = os.path.join(tmpdir, "out")
        one = df.coalesce(1)
        if fmt == FileFormat.CSV:
            w = one.write.option("sep", csv_delimiter).option("header", "true")
            if codec:
                w = w.option("compression", codec)
            w.mode("overwrite").csv(out)
            part = glob.glob(os.path.join(out, "part-*"))[0]
        elif fmt == FileFormat.NDJSON:
            w = one.write
            if codec:
                w = w.option("compression", codec)
            w.mode("overwrite").json(out)
            part = glob.glob(os.path.join(out, "part-*"))[0]
        elif fmt == FileFormat.PARQUET:
            one.write.mode("overwrite").parquet(out)
            part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        elif fmt == FileFormat.ORC:
            one.write.mode("overwrite").orc(out)
            part = glob.glob(os.path.join(out, "part-*.orc"))[0]
        elif fmt == FileFormat.XML:
            _check_xml_element_names(df)
            w = one.write.option("rowTag", XML_ROW_TAG)
            if codec:
                w = w.option("compression", codec)
            w.mode("overwrite").xml(out)
            part = glob.glob(os.path.join(out, "part-*"))[0]
        elif fmt == FileFormat.JSON:
            # Single JSON array document (reference: src/file_dialog.rs:216-225).
            # No distributed writer exists for this layout; the reference's
            # output is human-scale, so a driver-side collect is the
            # documented cost (SURVEY.md §7.4 item 5).
            rows = [row.asDict(recursive=True) for row in df.collect()]
            if codec == "gzip":
                import gzip

                opener = lambda: gzip.open(target, "wt", encoding="utf-8")  # noqa: E731
            elif codec == "bzip2":
                import bz2

                opener = lambda: bz2.open(target, "wt", encoding="utf-8")  # noqa: E731
            else:
                opener = lambda: open(target, "w", encoding="utf-8")  # noqa: E731
            with opener() as fh:
                json.dump(rows, fh, ensure_ascii=False, default=str)
            return
        else:
            raise UnsupportedFormatError(f"unknown format {fmt!r}")
        shutil.move(part, target)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def save(df: DataFrame, cfg: LoadConfig, loaded_format: str) -> None:
    """Save-in-place: refuses when the target extension maps to a different
    format than the one loaded (reference: src/file_dialog.rs:86-127)."""
    target_fmt = detect_format(cfg.path)
    if target_fmt != loaded_format:
        raise SaveFormatMismatchError(
            f"refusing to save {loaded_format} data to a .{target_fmt} path "
            f"({cfg.path!r}); use save_as() to convert"
        )
    _single_file_write(df, cfg.path, target_fmt, cfg.csv_delimiter)


def save_as(df: DataFrame, path: str, csv_delimiter: str = ";") -> str:
    """Save-as: format chosen by the new extension, any conversion allowed
    (reference: src/file_dialog.rs:162-278). Returns the format written."""
    fmt = detect_format(path)
    _single_file_write(df, path, fmt, csv_delimiter)
    return fmt


def compact_dataset(
    spark,
    src_path: str,
    dest_path: str,
    fmt: str = FileFormat.PARQUET,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — rewrite a dataset with right-sized files.

    The operational scale problem this solves: streaming sinks, frequent
    incremental MERGEs, and over-parallel writers leave datasets as
    thousands of KB-sized files, and at 100 TB the scan cost becomes
    dominated by per-file open/footer overhead and driver-side listing,
    not data.  Compaction reads the dataset once and writes it back with
    file count ≈ on-disk bytes / ``target_file_bytes``.

    Mechanics: the on-disk size comes from the source listing (not a
    collect).  Unpartitioned: ``coalesce(n_out)`` — merging files needs no
    shuffle, only fewer write tasks.  Hive-partitioned: a global coalesce
    would leave every task holding rows of EVERY partition value, so
    ``partitionBy`` would emit a file per (task, value) — up to
    n_out × n_values small files, the very problem being fixed.  Instead
    the rewrite hash-repartitions on (partition cols, deterministic salt)
    sized to per-DIRECTORY bytes (derived from the source listing's
    directory structure), so each output directory gets ≈ its own bytes /
    ``target_file_bytes`` files.  One shuffle, but a compaction pass is a
    rewrite anyway — the shuffle cost is the same order as the write.
    Writes to ``dest_path`` (never in place: a failed in-place rewrite
    loses data — callers swap directories after validating, same
    discipline as the save-in-place guard).  Returns ``{"files_before",
    "files_after", "bytes"}`` for the caller's audit log.
    """
    import os

    from pyspark.sql import functions as F

    from polars_view_spark.sources.readers import read_dataset_files

    if fmt not in (FileFormat.PARQUET, FileFormat.ORC):
        raise UnsupportedFormatError(
            f"compact_dataset supports parquet/orc datasets, not {fmt!r} — "
            "text formats have no footer stats to preserve; rewrite via "
            "write_dataset directly"
        )
    files = read_dataset_files(src_path, fmt)
    if not files:
        raise UnsupportedFormatError(
            f"compact_dataset: no {fmt} data files under {src_path!r} — "
            "nothing to compact (wrong path, or the dataset was never "
            "written)"
        )
    total_bytes = sum(sz for _, sz in files)
    df = (
        spark.read.parquet(src_path)
        if fmt == FileFormat.PARQUET
        else spark.read.orc(src_path)
    )
    if partition_by:
        # per-directory sizing: bytes of the largest partition directory
        # drive the per-directory file count (uniform salt width keeps the
        # layout deterministic; skew just means smaller files in small dirs)
        dir_bytes: dict[str, int] = {}
        for p, sz in files:
            d = os.path.dirname(p)
            dir_bytes[d] = dir_bytes.get(d, 0) + sz
        per_dir = max(1, round(max(dir_bytes.values()) / target_file_bytes))
        salt = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(per_dir)
        )
        shaped = df.repartition(
            max(per_dir * len(dir_bytes), 1),
            *[F.col(c) for c in partition_by],
            salt,
        )
    else:
        shaped = df.coalesce(max(1, round(total_bytes / target_file_bytes)))
    write_dataset(shaped, dest_path, fmt, partition_by=partition_by)
    after = read_dataset_files(dest_path, fmt)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total_bytes,
    }
