"""Reader/writer tests ported from the reference's end-to-end temp-file
suites (reference: src/data_filter.rs:1273-1439, src/file_dialog.rs)."""

import os

import pytest

from polars_view_spark.config import LoadConfig, parse_null_markers
from polars_view_spark.errors import SaveFormatMismatchError, UnsupportedFormatError
from polars_view_spark.sources.readers import detect_format, force_string_schema, read_any, read_csv
from polars_view_spark.sources.sniff import sniff_delimiter
from polars_view_spark.sources.writers import save, save_as, write_dataset


class TestSniffer:
    def make(self, tmp_path, text, name="f.csv"):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    def test_semicolon(self, tmp_path):
        p = self.make(tmp_path, "a;b;c\n1;2;3\n")
        assert sniff_delimiter(p, ",") == ";"

    def test_configured_first(self, tmp_path):
        # both ',' and ';' would parse; the configured one wins
        p = self.make(tmp_path, "a,b;c\n1,2;3\n")
        assert sniff_delimiter(p, ",") == ","
        assert sniff_delimiter(p, ";") == ";"

    def test_tab_and_pipe(self, tmp_path):
        assert sniff_delimiter(self.make(tmp_path, "a\tb\n1\t2\n")) == "\t"
        assert sniff_delimiter(self.make(tmp_path, "a|b\n1|2\n")) == "|"

    def test_single_column_falls_back(self, tmp_path):
        p = self.make(tmp_path, "lonely\n1\n2\n")
        assert sniff_delimiter(p, ";") == ";"


class TestForceString:
    def test_positive(self, spark, tmp_path):
        # reference F1 fixture: 44-digit IDs must stay strings under the
        # override (src/data_filter.rs:1309-1326)
        p = tmp_path / "ids.csv"
        big = "9" * 44
        p.write_text(f"long_id;value\n{big};1.5\n{big[:30]};2.5\n")
        cfg = LoadConfig(path=str(p), force_string_patterns="^long_id$")
        df, fmt, cfg2 = read_any(spark, cfg)
        assert dict(df.dtypes)["long_id"] == "string"
        assert df.orderBy("value").first()["long_id"] == big

    def test_negative_control(self, spark, tmp_path):
        # without the override, inference must NOT produce usable values
        # (the reference's negative control: all-null Int64)
        p = tmp_path / "ids.csv"
        big = "9" * 44
        p.write_text(f"long_id;value\n{big};1.5\n")
        df, _, _ = read_any(spark, LoadConfig(path=str(p)))
        assert dict(df.dtypes)["long_id"] != "string" or df.first()["long_id"] == big

    def test_schema_rewrite(self, spark):
        from pyspark.sql import types as T

        s = T.StructType(
            [T.StructField("a_id", T.LongType()), T.StructField("b", T.DoubleType())]
        )
        out = force_string_schema(s, "^.*_id$")
        assert out["a_id"].dataType == T.StringType()
        assert out["b"].dataType == T.DoubleType()
        out_all = force_string_schema(s, "*")
        assert all(f.dataType == T.StringType() for f in out_all.fields)


class TestFormats:
    def test_detect(self):
        assert detect_format("x.CSV") == "csv"
        assert detect_format("x.jsonl") == "ndjson"
        assert detect_format("x.parquet") == "parquet"
        assert detect_format("x.xml") == "xml"
        with pytest.raises(UnsupportedFormatError):
            detect_format("x.xlsx")
        with pytest.raises(UnsupportedFormatError):
            detect_format("noext")

    def test_null_markers(self):
        assert parse_null_markers('"", <N/D>') == ["", "<N/D>"]
        assert parse_null_markers("'x', y") == ["x", "y"]


class TestRoundTrips:
    @pytest.fixture()
    def df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", None)], "id int, name string, val double"
        )

    def test_csv_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.csv")
        save_as(df, target, csv_delimiter=";")
        assert os.path.isfile(target)
        back, _, _ = read_any(spark, LoadConfig(path=target))
        assert back.count() == 2
        assert [r["name"] for r in back.orderBy("id").collect()] == ["a", "b"]

    def test_ndjson_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.ndjson")
        save_as(df, target)
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "ndjson"
        assert back.count() == 2

    def test_parquet_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.parquet")
        save_as(df, target)
        back, _, _ = read_any(spark, LoadConfig(path=target))
        assert sorted(back.columns) == ["id", "name", "val"]

    def test_orc_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.orc")
        fmt = save_as(df, target)
        assert fmt == "orc" and os.path.isfile(target)
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "orc"
        got = back.orderBy("id").collect()
        assert [(r["id"], r["name"], r["val"]) for r in got] == [
            (1, "a", 1.5),
            (2, "b", None),
        ]

    def test_xml_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.xml")
        fmt = save_as(df, target)
        assert fmt == "xml" and os.path.isfile(target)
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "xml"
        got = back.orderBy("id").collect()
        assert [(r["id"], r["name"], r["val"]) for r in got] == [
            (1, "a", 1.5),
            (2, "b", None),
        ]

    def test_xml_gz_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.xml.gz")
        fmt = save_as(df, target)
        assert fmt == "xml" and os.path.isfile(target)
        import gzip

        with gzip.open(target, "rb") as fh:
            assert b"<row>" in fh.read()
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "xml"
        got = back.orderBy("id").collect()
        assert [(r["id"], r["name"], r["val"]) for r in got] == [
            (1, "a", 1.5),
            (2, "b", None),
        ]

    def test_xml_rejects_invalid_element_names(self, spark, tmp_path):
        # field names become element names; a space-bearing CSV header
        # must fail loudly driver-side, not as an executor stack trace
        bad = spark.createDataFrame([(1, "x")], ["id", "Col D"])
        with pytest.raises(UnsupportedFormatError, match="Col D"):
            save_as(bad, str(tmp_path / "bad.xml"))
        with pytest.raises(UnsupportedFormatError, match="9lives"):
            write_dataset(
                spark.createDataFrame([(1,)], ["9lives"]),
                str(tmp_path / "bad2"),
                fmt="xml",
            )
        # ':' reads as an unbound namespace prefix in the StAX writer
        with pytest.raises(UnsupportedFormatError, match="time:stamp"):
            save_as(
                spark.createDataFrame([(1,)], ["time:stamp"]),
                str(tmp_path / "bad3.xml"),
            )
        # nested struct fields are written as elements too
        nested = spark.sql("SELECT 1 AS id, named_struct('bad name', 2) AS s")
        with pytest.raises(UnsupportedFormatError, match="bad name"):
            save_as(nested, str(tmp_path / "bad4.xml"))

    def test_xml_partition_columns_exempt_from_name_guard(self, spark, tmp_path):
        # hive partition columns land in directory names, never in file
        # content — a space-bearing partition key must NOT be rejected
        df = spark.createDataFrame([(1, "x", "a b")], ["id", "name", "the key"])
        out = str(tmp_path / "part_xml")
        write_dataset(df, out, fmt="xml", partition_by=["the key"])
        back = (
            spark.read.option("rowTag", "row")
            .xml(out + "/*/part-*")
        )
        assert [(r["id"], r["name"]) for r in back.collect()] == [(1, "x")]

    def test_xml_escapes_markup_text(self, spark, tmp_path):
        # text containing XML metacharacters must survive the trip through
        # entity escaping byte-for-byte
        df = spark.createDataFrame(
            [(1, "a <b> & 'c' \"d\""), (2, "plain")], "id int, txt string"
        )
        target = str(tmp_path / "esc.xml")
        save_as(df, target)
        back, _, _ = read_any(spark, LoadConfig(path=target))
        got = {(r["id"], r["txt"]) for r in back.collect()}
        assert got == {(1, "a <b> & 'c' \"d\""), (2, "plain")}

    def test_json_single_doc(self, spark, df, tmp_path):
        import json

        target = str(tmp_path / "out.json")
        save_as(df, target)
        doc = json.load(open(target))
        assert isinstance(doc, list) and len(doc) == 2
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "json" and back.count() == 2

    def test_save_guard(self, df, tmp_path):
        with pytest.raises(SaveFormatMismatchError):
            save(df, LoadConfig(path=str(tmp_path / "out.parquet")), "csv")

    def test_write_dataset_partitioned(self, spark, df, tmp_path):
        out = str(tmp_path / "ds")
        write_dataset(df, out, partition_by=["name"])
        assert os.path.isdir(os.path.join(out, "name=a"))
        back = spark.read.parquet(out)
        # partition pruning: the filter must land in PartitionFilters (the
        # scan lists only matching directories — planning-time pruning, not
        # scan-and-discard)
        plan = back.filter(back.name == "a")._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "name" in m.group(1), plan
        assert back.filter(back.name == "a").count() == 1


class TestBoundedInference:
    """The CSV schema probe must infer from ≤ infer_schema_rows sampled
    lines, never from the whole file (a full inferSchema pass at 100 TB is
    a second full read)."""

    def test_inference_ignores_rows_past_sample(self, spark, tmp_path):
        # 200 clean integer rows inside the sample window, a poison string
        # row far past it: bounded inference must type the column int (the
        # poison row then nulls out under PERMISSIVE), full-file inference
        # would have typed it string.
        p = str(tmp_path / "big.csv")
        with open(p, "w") as f:
            f.write("a;b\n")
            for i in range(400):
                f.write(f"{i};{i * 2}\n")
            f.write("poison;not_an_int\n")
        df, delim = read_csv(spark, LoadConfig(path=p, infer_schema_rows=200))
        assert delim == ";"
        assert dict(df.dtypes)["a"] == "int"
        rows = df.count()
        assert rows == 401  # poison row present (as nulls), not dropped

    def test_remote_uri_sniff_falls_back(self):
        from polars_view_spark.sources.sniff import is_remote_path, sniff_delimiter

        assert is_remote_path("s3://bucket/key.csv")
        assert is_remote_path("hdfs://nn/path.csv")
        assert is_remote_path("dbfs:/mnt/x.csv")
        assert not is_remote_path("/local/path.csv")
        assert not is_remote_path("relative/path.csv")
        # no spark session passed → no probe possible → configured wins,
        # and crucially no builtin open() crash
        assert sniff_delimiter("s3://bucket/key.csv", ";") == ";"
        assert sniff_delimiter("s3://bucket/key.csv") == ","


class TestStorageLayout:
    def test_cluster_by_gives_disjoint_file_ranges(self, spark, tmp_path):
        """cluster_by must produce files whose min/max key ranges are
        (near-)disjoint — the parquet-footer property that lets a filtered
        scan skip files.  Verified against the real footers via pyarrow."""
        import glob as g

        import pyarrow.parquet as pq

        from pyspark.sql import functions as F

        df = spark.range(0, 10_000).withColumn(
            "k", (F.col("id") * 7919) % 10_000  # shuffled key
        )
        out = str(tmp_path / "clustered")
        write_dataset(df, out, cluster_by=["k"], cluster_partitions=8)
        files = sorted(g.glob(f"{out}/part-*.parquet"))
        assert len(files) > 1, "need multiple files to demonstrate skipping"
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "k"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
        # and the data survives intact
        back = spark.read.parquet(out)
        assert back.count() == 10_000

    def test_schema_evolution_merge(self, spark, tmp_path):
        """Appending a batch with an extra column must be readable as one
        dataset via mergeSchema — old rows surface NULL for the new column
        (the 100 TB reality: datasets evolve; readers must not break)."""
        out = str(tmp_path / "evolving")
        v1 = spark.createDataFrame([(1, "a")], "id long, name string")
        v2 = spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        )
        write_dataset(v1, out, mode="overwrite")
        write_dataset(v2, out, mode="append")
        back = spark.read.option("mergeSchema", "true").parquet(out)
        assert sorted(back.columns) == ["id", "name", "score"]
        rows = {r["id"]: r for r in back.collect()}
        assert rows[1]["score"] is None and rows[2]["score"] == 9.5


class TestCompressedText:
    """Transparent .gz/.bz2 text handling (beyond-reference: the reference's
    FileExtension treats .gz as Unknown).  Spark decompresses on read via
    Hadoop codecs; the repo side covers format dispatch, the driver-side
    head probe, and the single-file writers."""

    @pytest.fixture()
    def df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", None), (3, "c;s", 2.0)],
            "id int, name string, val double",
        )

    def test_detect_format_through_codec(self):
        from polars_view_spark.sources.readers import detect_format

        assert detect_format("x/data.csv.gz") == "csv"
        assert detect_format("x/data.ndjson.bz2") == "ndjson"
        assert detect_format("x/data.jsonl.gz") == "ndjson"
        assert detect_format("x/data.json.gz") == "json"
        assert detect_format("x/data.xml.gz") == "xml"

    def test_internal_formats_reject_outer_codec(self):
        from polars_view_spark.errors import UnsupportedFormatError
        from polars_view_spark.sources.readers import detect_format

        with pytest.raises(UnsupportedFormatError):
            detect_format("x/data.parquet.gz")
        with pytest.raises(UnsupportedFormatError):
            detect_format("x/data.orc.bz2")
        with pytest.raises(UnsupportedFormatError):
            detect_format("x/data.gz")

    def test_csv_gz_roundtrip_with_sniffing(self, spark, df, tmp_path):
        """Write ;-separated gzipped CSV, read it back with a WRONG
        configured delimiter — the head probe must decompress and sniff."""
        target = str(tmp_path / "out.csv.gz")
        fmt = save_as(df, target, csv_delimiter=";")
        assert fmt == "csv" and os.path.isfile(target)
        with open(target, "rb") as fh:
            assert fh.read(2) == b"\x1f\x8b", "file is not actually gzipped"
        back, fmt2, cfg = read_any(
            spark, LoadConfig(path=target, csv_delimiter=",")
        )
        assert fmt2 == "csv" and cfg.csv_delimiter == ";"
        rows = back.orderBy("id").collect()
        assert [r["name"] for r in rows] == ["a", "b", "c;s"]
        assert rows[0]["val"] == 1.5 and rows[1]["val"] is None

    def test_ndjson_bz2_roundtrip(self, spark, df, tmp_path):
        target = str(tmp_path / "out.ndjson.bz2")
        save_as(df, target)
        with open(target, "rb") as fh:
            assert fh.read(3) == b"BZh", "file is not actually bzip2"
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "ndjson"
        assert back.count() == 3

    def test_json_gz_single_doc_roundtrip(self, spark, df, tmp_path):
        import gzip
        import json as _json

        target = str(tmp_path / "out.json.gz")
        save_as(df, target)
        with gzip.open(target, "rt", encoding="utf-8") as fh:
            doc = _json.load(fh)
        assert isinstance(doc, list) and len(doc) == 3
        back, fmt, _ = read_any(spark, LoadConfig(path=target))
        assert fmt == "json"
        assert back.count() == 3

    def test_save_in_place_guard_sees_through_codec(self, spark, df, tmp_path):
        """A csv-loaded frame may save in place to .csv.gz (same format,
        new codec) but not to .parquet."""
        from polars_view_spark.sources.writers import save

        target = str(tmp_path / "out.csv.gz")
        save(df, LoadConfig(path=target), "csv")
        assert os.path.isfile(target)
        with pytest.raises(SaveFormatMismatchError):
            save(df, LoadConfig(path=str(tmp_path / "o.parquet")), "csv")


class TestSnifferFuzz:
    """Property fuzz for the delimiter sniffer — the highest-traffic
    ingestion heuristic.  Generated CSVs with a random candidate delimiter,
    random quoting, and cells drawn to include the OTHER candidates as
    content must still sniff to the writing delimiter."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _CELLS = st.text(
        alphabet="abcXYZ 0123456789.,;|:\t",
        min_size=0,
        max_size=12,
    )

    @staticmethod
    def _render(rows, delim):
        import csv as _csv
        import io

        buf = io.StringIO()
        w = _csv.writer(buf, delimiter=delim, quoting=_csv.QUOTE_MINIMAL)
        w.writerows(rows)
        return buf.getvalue()

    @given(
        delim=st.sampled_from([",", ";", "|", "\t", ":"]),
        n_cols=st.integers(min_value=2, max_value=6),
        n_rows=st.integers(min_value=1, max_value=30),
        data=st.data(),
    )
    @settings(max_examples=120, deadline=None)
    def test_sniffs_writing_delimiter(self, delim, n_cols, n_rows, data):
        from polars_view_spark.sources.sniff import sniff_delimiter_from_lines

        rows = [
            [
                data.draw(self._CELLS, label=f"cell{r}x{c}")
                for c in range(n_cols)
            ]
            for r in range(n_rows + 1)  # +1 header-ish row
        ]
        text = self._render(rows, delim)
        lines = text.splitlines()
        got = sniff_delimiter_from_lines(lines, configured=None)
        # The sniffer picks the first candidate with a CONSISTENT width > 1
        # column.  The writing delimiter always parses consistently; an
        # earlier candidate may legitimately win only if the generated
        # cells happen to form a consistent multi-column table under it —
        # verify the winner actually parses consistently rather than
        # demanding the exact delimiter back.
        import csv as _csv
        import io

        widths = {
            len(row)
            for row in _csv.reader(io.StringIO("\n".join(lines)), delimiter=got)
            if row
        }
        assert len(widths) == 1, (delim, got, widths)
        assert widths.pop() > 1 or got == delim

    @given(
        delim=st.sampled_from([",", ";", "|"]),
        junk=st.text(alphabet="abc123", min_size=1, max_size=40),
    )
    @settings(max_examples=40, deadline=None)
    def test_single_column_falls_back_to_configured(self, delim, junk):
        """A file with NO delimiter anywhere must fall back to the
        configured delimiter, never crash or invent one."""
        from polars_view_spark.sources.sniff import sniff_delimiter_from_lines

        got = sniff_delimiter_from_lines([junk, junk], configured=delim)
        assert got == delim


class TestCompaction:
    def test_compact_reduces_files_preserves_content(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from polars_view_spark.sources.writers import compact_dataset, write_dataset

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        frag = str(tmp_path / "frag")
        dense = str(tmp_path / "dense")
        write_dataset(docs.repartition(32), frag)
        stats = compact_dataset(spark, frag, dense, target_file_bytes=64 * 1024 * 1024)
        assert stats["files_before"] == 32
        assert stats["files_after"] < stats["files_before"]
        assert stats["files_after"] >= 1
        a = docs.orderBy("doc_id").collect()
        b = spark.read.parquet(dense).orderBy("doc_id").collect()
        assert a == b

    def test_compact_respects_partition_layout(self, spark, tmp_path):
        import os

        from polars_view_spark.sources.writers import compact_dataset, write_dataset

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        frag = str(tmp_path / "fragp")
        dense = str(tmp_path / "densep")
        write_dataset(docs.repartition(16), frag, partition_by=["lang"])
        compact_dataset(
            spark, frag, dense, target_file_bytes=64 * 1024 * 1024,
            partition_by=["lang"],
        )
        # hive layout survives compaction -> pruning still works downstream
        lang_dirs = [d for d in os.listdir(dense) if d.startswith("lang=")]
        assert lang_dirs
        # per-DIRECTORY sizing: at this scale every directory is far under
        # the target, so each must compact to exactly ONE file — a global
        # coalesce+partitionBy would leave a file per (task, lang) here
        for d in lang_dirs:
            n_files = len(
                [f for f in os.listdir(os.path.join(dense, d)) if f.endswith(".parquet")]
            )
            assert n_files == 1, f"{d} has {n_files} files"
        # and content survives the salted repartition (column order
        # normalized — hive reads surface the partition column last)
        cols = sorted(docs.columns)
        a = docs.select(*cols).orderBy("doc_id").collect()
        b = spark.read.parquet(dense).select(*cols).orderBy("doc_id").collect()
        assert a == b


class TestQuarantine:
    def test_corrupt_lines_split_not_nulled(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from polars_view_spark.sources.readers import read_ndjson_quarantine

        path = str(tmp_path / "landing")
        lines = ['{"id": 1, "v": "a"}', "garbage !!", '{"id": 2, "v": "b"}',
                 '{"id": 3 "v": missing-comma}']
        spark.createDataFrame([(l,) for l in lines], "value STRING").coalesce(
            1
        ).write.mode("overwrite").text(path)
        clean, quarantine, parsed = read_ndjson_quarantine(
            spark, path, "id BIGINT, v STRING"
        )
        assert {r["id"] for r in clean.collect()} == {1, 2}
        bad = [r["raw_line"] for r in quarantine.collect()]
        assert len(bad) == 2 and "garbage !!" in bad  # raw line preserved verbatim
        assert parsed.is_cached
        parsed.unpersist()
        assert not parsed.is_cached  # the handle that actually frees the cache


def test_sniffer_degrades_on_mislabeled_gz(tmp_path):
    """A plain-text file named .gz (or a truncated archive) must fall back
    to the configured delimiter instead of crashing the probe."""
    from polars_view_spark.sources.sniff import probe_head_lines, sniff_delimiter

    p = tmp_path / "fake.csv.gz"
    p.write_text("a;b;c\n1;2;3\n")  # NOT gzip — mislabeled
    assert probe_head_lines(str(p)) == []
    assert sniff_delimiter(str(p), configured=";") == ";"


def test_fixed_width_reader_semantics(spark, tmp_path):
    """read_fixed_width contract: 1-based SQL substring positions, rtrim-
    only on strings (leading text is significant pad-side data), malformed
    numeric cells degrade to NULL under ANSI mode (try_cast), and a short
    line yields NULL/empty tails instead of an error."""
    from polars_view_spark.sources.readers import read_fixed_width

    lines = [
        "        42  spaced name         -317",  # negative number parses
        "bad_number  x                   1000",  # id malformed -> NULL
        "         7",                            # short line: tails NULL
    ]
    p = str(tmp_path / "fw")
    spark.createDataFrame([(l,) for l in lines], "value STRING").coalesce(
        1
    ).write.mode("overwrite").text(p)
    df = read_fixed_width(
        spark, p,
        [("id", 1, 10, "bigint"), ("name", 11, 14, "string"),
         ("amount", 25, 12, "bigint")],
    )
    rows = {r["id"]: (r["name"], r["amount"]) for r in df.collect()}
    assert rows[42] == ("  spaced name", -317)  # leading spaces kept, rtrimmed
    # every string-family spelling takes the rtrim-only path — a
    # case/alias fallthrough to trim() would eat the leading spaces
    for dtype in ("STRING", "varchar(14)", "Char(14)"):
        alt = read_fixed_width(spark, p, [("id", 1, 10, "bigint"), ("name", 11, 14, dtype)])
        assert {r["name"] for r in alt.collect() if r["id"] == 42} == {"  spaced name"}, dtype
    assert rows[None] == ("  x", 1000)          # malformed id -> NULL row kept
    assert rows[7] == ("", None)                # short line degrades cleanly


def test_python_datasource_partition_invariance(spark):
    """The synthetic Python data source is a deterministic generator:
    the row SET must not depend on how the id range is split across
    partitions (round-robin 1 vs 7), and re-reading with the same seed
    reproduces it exactly — the property the catalog oracle relies on."""
    from polars_view_spark.sources.synthetic import read_synth_events

    a = {tuple(r) for r in read_synth_events(spark, 300, seed=3, partitions=1).collect()}
    b = {tuple(r) for r in read_synth_events(spark, 300, seed=3, partitions=7).collect()}
    assert a == b and len(a) == 300
    # seed changes the content
    c = {tuple(r) for r in read_synth_events(spark, 300, seed=4, partitions=7).collect()}
    assert c != a


def test_python_datasource_empty_partition(spark):
    """n < partitions leaves some partitions EMPTY; their RecordBatches
    must carry the declared types (explicit Arrow schema), not the
    null-typed columns from_pydict would infer from empty lists — the
    inferred form fails the scan with a schema conflict (ADVICE r05)."""
    from polars_view_spark.sources.synthetic import read_synth_events

    df = read_synth_events(spark, 2, seed=1, partitions=8)
    rows = df.collect()
    assert sorted(r["event_id"] for r in rows) == [0, 1]
    assert df.schema["event_id"].dataType.simpleString() == "bigint"
    # the degenerate all-empty read also returns cleanly
    assert read_synth_events(spark, 0, seed=1, partitions=4).count() == 0
