"""Multimodal decode: the real decoder (header + png-stdlib tiers always
on, Pillow tier import-guarded) and its mapInPandas contract.

The stubbed ``decode_features`` stays oracle-checked through the catalog
(x_multimodal_decode); this file covers ``decode_real``, which r02's
verdict flagged as the one remaining NotImplementedError.
"""

import struct

import pytest

from polars_view_spark.operators.multimodal import decode_real, sniff_media_header


def png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
    )


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def bmp_bytes(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, h)


def wav_bytes(rate: int) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVEfmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 2)
        + struct.pack("<I", rate)
        + b"\x00" * 8
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w)
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 12


def wav_full_bytes(rate: int, byte_rate: int, data_len: int) -> bytes:
    fmt = (
        b"fmt " + struct.pack("<I", 16) + struct.pack("<HH", 1, 2)
        + struct.pack("<I", rate) + struct.pack("<I", byte_rate)
        + struct.pack("<HH", 4, 16)
    )
    data = b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def mp4_bytes(w: int, h: int, timescale: int, duration: int) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIII", 0, 0, 1, 0)  # times, track_ID, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 52  # reserved/layer/group/volume/reserved + matrix
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov


def webp_vp8x_bytes(w: int, h: int) -> bytes:
    vp8x = (
        b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )
    body = b"WEBP" + vp8x
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestHeaderSniffer:
    def test_all_formats(self):
        assert sniff_media_header(png_bytes(640, 480)) == ("png", 640, 480, None, None)
        assert sniff_media_header(gif_bytes(320, 200)) == ("gif", 320, 200, None, None)
        assert sniff_media_header(bmp_bytes(100, 50)) == ("bmp", 100, 50, None, None)
        assert sniff_media_header(wav_bytes(44100)) == ("wav", None, None, 44100, None)
        assert sniff_media_header(jpeg_bytes(640, 480)) == ("jpeg", 640, 480, None, None)

    def test_wav_duration_from_data_and_byte_rate(self):
        # 2 s of audio: data_len 800 at byte_rate 400
        assert sniff_media_header(wav_full_bytes(8000, 400, 800)) == (
            "wav", None, None, 8000, 2000,
        )

    def test_mp4_box_walk(self):
        # duration 90000 at timescale 600 → 150 000 ms; 1280×720 tkhd
        assert sniff_media_header(mp4_bytes(1280, 720, 600, 90000)) == (
            "mp4", 1280, 720, None, 150000,
        )

    def test_mp4_truncated_moov_degrades(self):
        full = mp4_bytes(1280, 720, 600, 90000)
        cut = full[:40]  # ftyp + the first bytes of moov
        fmt, w, h, rate, dur = sniff_media_header(cut)
        assert fmt == "mp4" and dur is None

    def test_webp_vp8x_canvas(self):
        assert sniff_media_header(webp_vp8x_bytes(512, 384)) == (
            "webp", 512, 384, None, None,
        )

    def test_bmp_topdown_height_is_positive(self):
        # negative BMP height means top-down row order, not a negative size
        assert sniff_media_header(bmp_bytes(100, -50)) == ("bmp", 100, 50, None, None)

    def test_truncated_headers_degrade_to_format_only(self):
        assert sniff_media_header(b"\x89PNG") == ("png", None, None, None, None)
        assert sniff_media_header(b"GIF89a") == ("gif", None, None, None, None)
        assert sniff_media_header(b"RIFF1234WAVE") == ("wav", None, None, None, None)
        assert sniff_media_header(b"\xff\xd8\xff") == ("jpeg", None, None, None, None)

    def test_unknown_and_empty(self):
        assert sniff_media_header(b"plain text content")[0] == "unknown"
        assert sniff_media_header(b"")[0] == "unknown"


def test_decode_real_end_to_end(spark):
    """decode_real runs on the default path (no NotImplementedError), the
    header tier fills format/dims/rate, and unknowns come back NULL — one
    Arrow-batched pass."""
    rows = [
        (1, png_bytes(640, 480)),
        (2, wav_bytes(16000)),
        (3, b"just some text payload"),
        (4, jpeg_bytes(32, 16)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_real(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[2]["format"] == "wav" and got[2]["sample_rate"] == 16000
    assert got[3]["format"] == "unknown" and got[3]["width"] is None
    assert got[4]["format"] == "jpeg" and got[4]["width"] == 32
    try:
        import PIL  # noqa: F401

        # header-only blobs aren't full images, so even with Pillow present
        # these rows fall back to the header tier
        assert all(v["decoder"] == "header" for v in got.values())
    except ImportError:
        assert all(v["decoder"] == "header" for v in got.values())
    assert all(v["n_bytes"] > 0 for v in got.values())


def test_binaryfile_ingest_feeds_decode_real(spark, tmp_path):
    """The multimodal front door: a directory of raw media files ingested
    through the built-in binaryFile source (sources/readers.py:
    read_binary_dir) flows straight into decode_real — path-derived ids,
    content as payload, one Arrow-batched decode pass."""
    from pyspark.sql import functions as F

    from polars_view_spark.sources.readers import read_binary_dir

    (tmp_path / "img_640x480.png").write_bytes(png_bytes(640, 480))
    (tmp_path / "clip_16k.wav").write_bytes(wav_bytes(16000))
    (tmp_path / "notes.txt").write_text("not media")

    ingested = read_binary_dir(spark, str(tmp_path), glob="*.{png,wav}")
    assert set(ingested.columns) == {"path", "length", "content"}
    media = ingested.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
    )
    names = {r["name"] for r in media.select("name").collect()}
    assert names == {"img_640x480.png", "clip_16k.wav"}  # glob excluded .txt
    got = {r["format"]: r.asDict() for r in decode_real(media).collect()}
    assert (got["png"]["width"], got["png"]["height"]) == (640, 480)
    assert got["wav"]["sample_rate"] == 16000


def test_decode_real_is_arrow_batched(spark):
    from polars_view_spark.plans.audit import audit_plan

    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    a = audit_plan(decode_real(df))
    assert a.has_arrow_python_eval and not a.has_python_row_eval


def full_png_bytes(
    pixels: list[list[tuple[int, ...]]],
    color: int = 2,
    filters: list[int] | None = None,
) -> bytes:
    """Encode a real PNG with the stdlib: pack scanlines with the given
    per-row filter types (RFC 2083 §6 forward transform), deflate, wrap in
    CRC'd chunks — so the decoder is exercised against spec-built input,
    no imaging library involved."""
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    h, w = len(pixels), len(pixels[0])
    filters = filters if filters is not None else [0] * h
    stride = w * channels
    raw = bytearray()
    prev = bytearray(stride)
    for row, ftype in zip(pixels, filters):
        line = bytearray(v & 0xFF for px in row for v in px)
        assert len(line) == stride
        enc = bytearray(line)
        for x in range(stride - 1, -1, -1):
            a = line[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if ftype == 1:
                enc[x] = (line[x] - a) & 0xFF
            elif ftype == 2:
                enc[x] = (line[x] - b) & 0xFF
            elif ftype == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as z

        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


class TestPngStdlibTier:
    """The always-on full-decode tier: pixel grids are reconstructed with
    the stdlib, so a REAL decode executes on every fleet (VERDICT r04
    asked for the import-guarded Pillow path to stop being the only full
    tier).  Inputs are spec-built by ``full_png_bytes`` above."""

    def test_every_filter_type_reconstructs(self):
        """One PNG per filter type; the decoder must invert each forward
        transform to the identical pixel grid (digest equality against
        the filter-0 encoding of the same grid)."""
        from polars_view_spark.operators.multimodal import png_decode_stdlib

        pixels = [
            [((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 3) % 256) for x in range(9)]
            for y in range(6)
        ]
        ref = png_decode_stdlib(full_png_bytes(pixels, filters=[0] * 6))
        assert ref is not None and (ref[0], ref[1]) == (9, 6)
        for ftype in (1, 2, 3, 4):
            got = png_decode_stdlib(full_png_bytes(pixels, filters=[ftype] * 6))
            assert got == ref, f"filter {ftype} did not invert"
        mixed = png_decode_stdlib(full_png_bytes(pixels, filters=[0, 1, 2, 3, 4, 2]))
        assert mixed == ref

    def test_color_types(self):
        from polars_view_spark.operators.multimodal import png_decode_stdlib

        for color, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
            pixels = [[tuple((x + y + c) % 256 for c in range(ch)) for x in range(4)] for y in range(3)]
            got = png_decode_stdlib(full_png_bytes(pixels, color=color))
            assert got is not None and (got[0], got[1]) == (4, 3), f"color {color}"

    def test_declines_rather_than_misdecodes(self):
        """Truncated IDAT, bad zlib, 16-bit depth, interlaced: all None
        (header-tier fallback), never a wrong grid."""
        import zlib

        from polars_view_spark.operators.multimodal import png_decode_stdlib

        pixels = [[(1, 2, 3)]]
        good = full_png_bytes(pixels)
        assert png_decode_stdlib(good) is not None
        assert png_decode_stdlib(good[:40]) is None
        corrupt = good.replace(zlib.compress(b"\x00\x01\x02\x03"), b"garbage!")
        assert png_decode_stdlib(corrupt) is None
        deep = bytearray(good)
        deep[24] = 16  # bit depth byte inside IHDR
        assert png_decode_stdlib(bytes(deep)) is None
        laced = bytearray(good)
        laced[28] = 1  # interlace byte inside IHDR
        assert png_decode_stdlib(bytes(laced)) is None

    def test_roundtrip_property(self):
        """Property: for ANY pixel grid, filter choice, and color type,
        encode (spec forward transform) → decode reconstructs the same
        grid — digest equal to the filter-0 encoding's digest."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from polars_view_spark.operators.multimodal import png_decode_stdlib

        @settings(max_examples=40, deadline=None)
        @given(
            w=st.integers(1, 8),
            h=st.integers(1, 6),
            color=st.sampled_from([0, 2, 4, 6]),
            data=st.data(),
        )
        def check(w, h, color, data):
            ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
            pixels = [
                [
                    tuple(
                        data.draw(st.integers(0, 255)) for _ in range(ch)
                    )
                    for _ in range(w)
                ]
                for _ in range(h)
            ]
            filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
            got = png_decode_stdlib(full_png_bytes(pixels, color=color, filters=filters))
            ref = png_decode_stdlib(full_png_bytes(pixels, color=color, filters=[0] * h))
            assert got == ref and got is not None and (got[0], got[1]) == (w, h)

        check()

    def test_decompression_bomb_declines_bounded(self):
        """An IDAT stream inflating far past the IHDR-declared grid (a
        PNG bomb) must decline via the bounded decompressobj — never
        allocate the full blow-up.  Same for an IHDR whose declared grid
        alone exceeds the guard tier's 64 MB cap."""
        import struct
        import zlib

        from polars_view_spark.operators.multimodal import png_decode_stdlib

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        ihdr_1x1 = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
        bomb = (
            sig
            + chunk(b"IHDR", ihdr_1x1)
            + chunk(b"IDAT", zlib.compress(b"\x00" * (32 * 1024 * 1024)))
            + chunk(b"IEND", b"")
        )
        assert len(bomb) < 100_000  # the compressed bomb is tiny
        assert png_decode_stdlib(bomb) is None
        huge_hdr = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 50_000, 50_000, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00"))
            + chunk(b"IEND", b"")
        )
        assert png_decode_stdlib(huge_hdr) is None

    def test_truncated_idat_stream_declines(self):
        """Review r05 second pass: a stream cut off after the pixel
        bytes (adler32 trailer missing) yields exactly `want` bytes from
        the bounded inflate without reaching eof — must decline like
        plain zlib.decompress did, not accept unverified data."""
        import struct
        import zlib

        from polars_view_spark.operators.multimodal import png_decode_stdlib

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        raw = b"\x00" + bytes(6) + b"\x00" + bytes(6)
        full = zlib.compress(raw)
        good = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", full) + chunk(b"IEND", b"")
        assert png_decode_stdlib(good) is not None
        cut = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", full[:-4]) + chunk(b"IEND", b"")
        assert png_decode_stdlib(cut) is None


def test_decode_real_full_decode_tier(spark):
    """A genuine (spec-built) PNG decodes through a full pixel-grid tier —
    png-stdlib everywhere, pillow where installed — with dimensions from
    the reconstructed grid, not the header."""
    pixels = [[(x % 256, y % 256, 0) for x in range(12)] for y in range(7)]
    payload = full_png_bytes(pixels, filters=[4] * 7)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    (row,) = decode_real(df).collect()
    assert row["decoder"] in ("png-stdlib", "pillow")
    assert (row["width"], row["height"]) == (12, 7)
    assert row["format"] == "png"


class TestHeaderSnifferEdgeLayouts:
    """Regressions from review: real-world layouts the fixed-offset /
    naive-walker versions misparsed."""

    def test_wav_with_list_chunk_before_fmt(self):
        """Tagging tools commonly emit a LIST/INFO chunk before fmt —
        the parser must walk chunks, not read offset 24 blind."""
        import struct

        info = b"INFOISFT" + struct.pack("<I", 4) + b"lame"
        list_chunk = b"LIST" + struct.pack("<I", len(info)) + info
        fmt = (
            b"fmt "
            + struct.pack("<I", 16)
            + struct.pack("<HH", 1, 2)
            + struct.pack("<I", 22050)
            + b"\x00" * 8
        )
        payload = b"RIFF" + struct.pack("<I", 4 + len(list_chunk) + len(fmt)) + b"WAVE" + list_chunk + fmt
        assert sniff_media_header(payload) == ("wav", None, None, 22050, None)

    def test_wav_odd_sized_chunk_is_word_aligned(self):
        """RIFF chunks pad odd sizes to word boundaries; the walker must
        account for the pad byte or every later offset is off by one."""
        import struct

        odd = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 + pad
        fmt = (
            b"fmt "
            + struct.pack("<I", 16)
            + struct.pack("<HH", 1, 1)
            + struct.pack("<I", 8000)
            + b"\x00" * 8
        )
        payload = b"RIFF" + struct.pack("<I", 40) + b"WAVE" + odd + fmt
        assert sniff_media_header(payload) == ("wav", None, None, 8000, None)

    def test_wav_without_fmt_degrades_to_bare_format(self):
        import struct

        payload = b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"LIST" + struct.pack("<I", 0)
        assert sniff_media_header(payload) == ("wav", None, None, None, None)

    def test_jpeg_with_fill_bytes_before_marker(self):
        """0xFF fill bytes before a marker are spec-legal padding; the
        walker must skip them instead of misreading segment lengths."""
        import struct

        sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
        payload = b"\xff\xd8" + b"\xff\xff\xff" + sof0 + b"\x00" * 12
        assert sniff_media_header(payload) == ("jpeg", 640, 480, None, None)


def test_decode_real_null_payload_degrades(spark):
    """A NULL payload row must yield format='unknown'/'null' decoder, not a
    task-killing TypeError inside mapInPandas."""
    from polars_view_spark.operators.multimodal import decode_real

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_real(df).collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["decoder"] == "null" and rows[2]["n_bytes"] == 0


def test_decode_real_null_id_decodes_with_null_doc_id(spark):
    """A NULL id is metadata damage, not payload damage (ADVICE r03): the
    payload still decodes, doc_id stays NULL (no -1 sentinel that would
    collide with a legitimate id of -1 or merge distinct null-id rows),
    and a real id of -1 remains distinguishable."""
    from polars_view_spark.operators.multimodal import decode_real

    png = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"IHDR"
                    + (16).to_bytes(4, "big") + (9).to_bytes(4, "big")
                    + b"\x00" * 16)
    df = spark.createDataFrame(
        [(None, png), (None, None), (-1, png)],
        "doc_id long, payload binary",
    )
    rows = decode_real(df).collect()
    by_decoder = {}
    for r in rows:
        by_decoder.setdefault(r["decoder"], []).append(r)
    # null id + real payload: decoded, NULL doc_id preserved
    decoded_null_id = [r for r in rows if r["doc_id"] is None and r["decoder"] != "null"]
    assert len(decoded_null_id) == 1 and decoded_null_id[0]["format"] == "png"
    # null id + null payload: degrade path, still NULL doc_id
    degraded = [r for r in rows if r["decoder"] == "null"]
    assert len(degraded) == 1 and degraded[0]["doc_id"] is None
    # legitimate -1 id survives un-merged
    minus_one = [r for r in rows if r["doc_id"] == -1]
    assert len(minus_one) == 1 and minus_one[0]["format"] == "png"


def test_decode_real_preserves_large_ids_in_null_bearing_batches(spark):
    """r04 review finding: a nullable long id column reaches pandas as
    float64, which rounds ids above 2^53.  The id is now shipped as a
    string through Arrow, so 2^53+1 must survive exactly even when the
    same batch carries a NULL id."""
    from polars_view_spark.operators.multimodal import decode_real

    big = (1 << 53) + 1  # not representable as a float64
    png = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)
    df = spark.createDataFrame(
        [(None, png), (big, png)], "doc_id long, payload binary"
    ).coalesce(1)  # one partition -> one Arrow batch containing the null
    ids = {r["doc_id"] for r in decode_real(df).collect()}
    assert big in ids and None in ids


class TestWavTruncatedFmt:
    def test_rate_survives_byte_rate_truncation(self):
        """r04 review finding (graded degrade): a WAV header cut after the
        sample-rate field but before byte_rate must still report the
        sample rate, with byte_rate-derived duration degrading to None."""
        import struct

        from polars_view_spark.operators.multimodal import sniff_media_header

        hdr = (
            b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HH", 1, 1)          # format tag, channels
            + struct.pack("<I", 44100)           # sample rate (ends at fmt+16)
        )  # truncated: byte_rate never present
        fmt, w, h, rate, dur = sniff_media_header(hdr)
        assert fmt == "wav" and rate == 44100 and dur is None


class TestAudioVideoSniffTiers:
    """r04: FLAC / Ogg / MP3 / Matroska header-tier coverage — pure-stdlib
    parses over synthetic headers, including the graded truncation
    degrades."""

    def test_flac_streaminfo_rate_and_duration(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        rate, total = 44100, 44100 * 3  # 3 s
        streaminfo = bytearray(34)
        streaminfo[10] = (rate >> 12) & 0xFF
        streaminfo[11] = (rate >> 4) & 0xFF
        streaminfo[12] = (rate & 0xF) << 4
        streaminfo[13] = (total >> 32) & 0x0F
        streaminfo[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
        hdr = b"fLaC" + b"\x00\x00\x00\x22" + bytes(streaminfo)
        fmt, w, h, r, dur = sniff_media_header(hdr)
        assert (fmt, r, dur) == ("flac", 44100, 3000)

    def test_flac_truncated_degrades(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        assert sniff_media_header(b"fLaC\x00\x00") == ("flac", None, None, None, None)

    def test_ogg_vorbis_rate(self):
        import struct

        from polars_view_spark.operators.multimodal import sniff_media_header

        page = b"OggS" + b"\x00" * 23 + b"\x01\x1e"  # header + 1-seg table
        packet = b"\x01vorbis" + b"\x00" * 4 + b"\x02" + struct.pack("<I", 48000)
        fmt, _, _, r, _ = sniff_media_header(page + packet)
        assert (fmt, r) == ("ogg-vorbis", 48000)

    def test_ogg_opus_rate(self):
        import struct

        from polars_view_spark.operators.multimodal import sniff_media_header

        page = b"OggS" + b"\x00" * 23 + b"\x01\x13"
        packet = b"OpusHead" + b"\x01\x02" + b"\x00\x00" + struct.pack("<I", 24000)
        fmt, _, _, r, _ = sniff_media_header(page + packet)
        assert (fmt, r) == ("ogg-opus", 24000)

    def test_ogg_unknown_codec_degrades(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        assert sniff_media_header(b"OggS" + b"\x00" * 40)[0] == "ogg"

    def test_mp3_id3_then_frame(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        # ID3v2 tag, syncsafe size 0x0A (10 bytes of tag body)
        id3 = b"ID3\x04\x00\x00" + b"\x00\x00\x00\x0a" + b"\x00" * 10
        # MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0)
        frame = bytes([0xFF, 0xFB, 0x90, 0x00])
        payload = id3 + frame + b"\x00" * (16000 - len(id3) - 4)
        fmt, _, _, r, dur = sniff_media_header(payload)
        assert (fmt, r) == ("mp3", 44100)
        # CBR estimate over the AUDIO bytes only (tag excluded)
        assert dur == (len(payload) - len(id3)) * 8 // 128

    def test_mp3_bare_framesync(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 100
        assert sniff_media_header(frame)[0] == "mp3"

    def test_jpeg_not_misread_as_mp3(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        assert sniff_media_header(b"\xff\xd8\xff\xe0" + b"\x00" * 20)[0] == "jpeg"

    def test_matroska_and_webm(self):
        from polars_view_spark.operators.multimodal import sniff_media_header

        ebml = b"\x1a\x45\xdf\xa3" + b"\x00" * 20
        assert sniff_media_header(ebml)[0] == "mkv"
        assert sniff_media_header(ebml + b"webm")[0] == "webm"

    def test_id3_tagged_adts_not_misread_as_mp3_frame(self):
        """r04 review finding: an ID3-tagged ADTS/AAC payload (frame sync
        0xFFF1 — LAYER bits 00) must not yield a fabricated MP3 sample
        rate/duration; it degrades to the bare tag format."""
        from polars_view_spark.operators.multimodal import sniff_media_header

        id3 = b"ID3\x04\x00\x00" + b"\x00\x00\x00\x00"
        adts = bytes([0xFF, 0xF1, 0x50, 0x80]) + b"\x00" * 64
        fmt, w, h, rate, dur = sniff_media_header(id3 + adts)
        assert (fmt, rate, dur) == ("mp3", None, None)

    def test_corrupt_id3_resync_is_bounded(self):
        """A large ID3-prefixed payload with no frame sync must degrade
        quickly (64 KiB bounded C-speed resync), not scan megabytes in a
        Python loop."""
        import time

        from polars_view_spark.operators.multimodal import sniff_media_header

        junk = b"ID3\x04\x00\x00" + b"\x00\x00\x00\x00" + b"\x01" * (8 << 20)
        t0 = time.perf_counter()
        fmt, w, h, rate, dur = sniff_media_header(junk)
        assert (fmt, rate, dur) == ("mp3", None, None)
        assert time.perf_counter() - t0 < 0.5

    def test_aiff_comm_rate_and_duration(self):
        import struct

        from polars_view_spark.operators.multimodal import sniff_media_header

        # 44100 Hz as an 80-bit extended float: exp 16397, mantissa
        # 0xAC44 << 48 (44100 = 0b1010110001000100, 16 bits → exponent
        # 16383 + 15)
        rate_ext = struct.pack(">H", 16383 + 15) + struct.pack(">Q", 44100 << 48)
        comm = (b"COMM" + struct.pack(">I", 18)
                + struct.pack(">h", 1)            # channels
                + struct.pack(">I", 44100 * 2)    # 2 s of frames
                + struct.pack(">h", 16)           # bits
                + rate_ext)
        hdr = b"FORM" + struct.pack(">I", 100) + b"AIFF" + comm
        fmt, w, h, r, dur = sniff_media_header(hdr)
        assert (fmt, r, dur) == ("aiff", 44100, 2000)

    def test_avif_heic_brands_not_reported_as_mp4(self):
        import struct

        from polars_view_spark.operators.multimodal import sniff_media_header

        for brand, want in ((b"avif", "avif"), (b"heic", "heic"),
                            (b"mif1", "heif"), (b"isom", "mp4")):
            hdr = struct.pack(">I", 16) + b"ftyp" + brand + b"\x00\x00\x00\x00"
            assert sniff_media_header(hdr)[0] == want


class TestAudioChunks:
    def test_overlap_and_tail(self, spark):
        """Consecutive chunks share width-hop bytes; the tail chunk is
        partial; empty payloads emit nothing."""
        from pyspark.sql import functions as F

        from polars_view_spark.operators.multimodal import audio_chunks

        df = spark.createDataFrame(
            [(1, bytearray(b"abcdefghij")), (2, bytearray(b"")), (3, bytearray(b"xyz"))],
            "doc_id long, payload binary",
        )
        rows = audio_chunks(df, width=6, hop=4).orderBy("doc_id", "chunk_idx").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 1 (10 bytes, hop 4): chunks at 0,4,8 -> lengths 6,6,2
        assert [r["n_chunk_bytes"] for r in by_doc[1]] == [6, 6, 2]
        # doc 2 empty: absent
        assert 2 not in by_doc
        # doc 3 (3 bytes): one partial chunk
        assert [r["n_chunk_bytes"] for r in by_doc[3]] == [3]
        # overlap: chunk0 = abcdef, chunk1 = efghij share 'ef'
        import hashlib

        assert by_doc[1][0]["chunk_md5"] == hashlib.md5(b"abcdef").hexdigest()
        assert by_doc[1][1]["chunk_md5"] == hashlib.md5(b"efghij").hexdigest()

    def test_pure_codegen_plan(self, spark):
        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.multimodal import audio_chunks, pack_binary

        d = load_tables(spark, "/root/testdata/sf0.001", "documents")["documents"]
        plan = (
            audio_chunks(pack_binary(d, "text", "source"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "Exchange hashpartitioning" not in plan
