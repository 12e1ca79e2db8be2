"""Multimodal column support: opaque ``binary`` payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload travels as a
BinaryType column next to a StructType metadata column; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes whole record
batches without JVM↔Python per-row costs.

Decode comes in two flavors: ``decode_features`` is the deterministic
byte-derived stub the DuckDB oracle value-checks, and ``decode_real`` is
the real decoder — a pure-stdlib magic-byte header parser (PNG/JPEG/GIF/
BMP/WebP images; WAV/FLAC/Ogg/MP3/AIFF audio; MP4/ISO-BMFF-brand/
Matroska video — dimensions, sample rate, duration where the header
carries them) that upgrades per-payload to a full Pillow decode when the
library is importable.  The schema, batch
iteration, and partitioning behavior are shared and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every payload column
META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def pack_binary(
    df: DataFrame, content_col: str, source_col: str, mime: str = "text/plain"
) -> DataFrame:
    """Wrap a content column into (payload: binary, meta: struct).

    For real media, ``sources/readers.py:read_binary_dir`` (batch) or
    ``streaming/events.py:read_binary_stream`` (continuous landing dir)
    reads the bytes — both yield exactly this shape (path/length/content)
    — so downstream operators are source-agnostic.
    """
    return df.withColumn("payload", F.encode(F.col(content_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.col(source_col).alias("source"),
            F.length(F.col(content_col)).cast("long").alias("n_chars"),
        ),
    )


FEATURE_DIM = 4

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched 'decode' over mapInPandas — REAL plumbing, FAKE decode.

    The fake feature is deterministic (byte-length-derived), so the operator
    is oracle-checkable; swap ``_fake_decode_batch`` for a real
    PIL/torchaudio call and nothing else changes — the batch shape,
    partitioning, and schema contract are production-real.
    """

    def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            first = payloads.map(lambda b: int(b[0]) if len(b) else -1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    # deterministic stand-in for a real embedding
                    "feature": [
                        [float(n), float(f), float(n % 7), float((n + f) % 13)]
                        for n, f in zip(n_bytes, first)
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(_fake_decode_batch, _DECODE_SCHEMA)


_REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield ``(box_type, payload_start, payload_end)`` for ISO-BMFF boxes
    in ``b[start:end]`` — 32-bit sizes, the 64-bit ``largesize`` escape,
    and the size-0 to-end-of-file form, all bounded by ``end``."""
    import struct

    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        btype = b[i + 4 : i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            payload = i + 16
        elif size == 0:
            size = end - i  # box extends to end of enclosing scope
        if size < 8 or i + size > end:
            return  # corrupt size: stop walking, keep what we have
        yield btype, payload, i + size
        i += size


def sniff_media_header(
    b: bytes,
) -> tuple[str, int | None, int | None, int | None, int | None]:
    """Parse ``(format, width, height, sample_rate, duration_ms)`` from a
    payload's magic bytes — pure stdlib ``struct``, no media library.
    Covers PNG / JPEG / GIF / BMP / WebP (images); WAV (sample rate +
    duration from the data-chunk length ÷ byte rate), FLAC (STREAMINFO
    20-bit rate + 36-bit total samples), Ogg Vorbis/Opus (id-header rate),
    MP3 (frame-header rate; duration as the standard CBR estimate from
    audio length ÷ bitrate), and AIFF (COMM 80-bit extended-float rate +
    frame count) for audio; MP4 / ISO-BMFF (major brand reported, duration
    from ``moov/mvhd``, display size from the first ``trak/tkhd``) and
    Matroska/WebM (format only) for video; anything else is
    ``("unknown", None, None, None, None)``.  Truncated or corrupt headers degrade to the bare format name
    rather than raising — a 100 TB crawl always contains damaged files,
    and one bad payload must not kill the stage."""
    import struct

    try:
        if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h, None, None
        if b.startswith(b"\x89PNG"):
            return "png", None, None, None, None
        if b.startswith((b"GIF87a", b"GIF89a")):
            if len(b) >= 10:
                w, h = struct.unpack("<HH", b[6:10])
                return "gif", w, h, None, None
            return "gif", None, None, None, None
        if b.startswith(b"BM"):
            if len(b) >= 26:
                w, h = struct.unpack("<ii", b[18:26])
                # negative height = top-down rows
                return "bmp", w, abs(h), None, None
            return "bmp", None, None, None, None
        if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
            # VP8X extended header carries the canvas size as 24-bit
            # minus-one fields; simple VP8/VP8L payloads degrade to dims
            # None rather than decoding the bitstream
            if b[12:16] == b"VP8X" and len(b) >= 30:
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return "webp", w, h, None, None
            return "webp", None, None, None, None
        if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            # walk RIFF chunks: tagging tools commonly emit LIST/INFO (or
            # other) chunks first, so fixed offsets would read garbage.
            # 'fmt ' gives sample rate + byte rate; 'data' gives payload
            # length, and duration = data_len / byte_rate.
            i = 12
            rate = byte_rate = data_len = None
            while i + 8 <= len(b):
                chunk_id = b[i : i + 4]
                chunk_len = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if chunk_id == b"fmt ":
                    # graded degrade on truncation: keep the sample rate
                    # even when the buffer ends before byte_rate
                    if i + 16 <= len(b):
                        rate = struct.unpack("<I", b[i + 12 : i + 16])[0]
                    if i + 20 <= len(b):
                        byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
                elif chunk_id == b"data":
                    data_len = chunk_len
                i += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
            dur = (
                data_len * 1000 // byte_rate
                if data_len is not None and byte_rate
                else None
            )
            return "wav", None, None, rate, dur
        if b.startswith(b"FORM") and b[8:12] in (b"AIFF", b"AIFC"):
            # AIFF: RIFF's big-endian sibling.  COMM carries the frame
            # count and the sample rate as an 80-bit IEEE extended float
            # (15-bit exponent, 64-bit explicit-leading-one mantissa).
            i = 12
            rate = frames = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = struct.unpack(">I", b[i + 4 : i + 8])[0]
                if cid == b"COMM" and i + 26 <= len(b):
                    frames = struct.unpack(">I", b[i + 10 : i + 14])[0]
                    exp = struct.unpack(">H", b[i + 16 : i + 18])[0] & 0x7FFF
                    mant = struct.unpack(">Q", b[i + 18 : i + 26])[0]
                    if exp and mant:
                        rate = int(mant * 2.0 ** (exp - 16383 - 63))
                i += 8 + clen + (clen & 1)
            dur = frames * 1000 // rate if frames and rate else None
            return "aiff", None, None, rate, dur
        if b.startswith(b"fLaC"):
            # FLAC: the mandatory first metadata block is STREAMINFO —
            # sample rate is a 20-bit field at payload offset 10, total
            # samples a 36-bit field at offset 13
            p = 8  # 4-byte magic + 4-byte block header
            if len(b) >= p + 18:
                rate = (b[p + 10] << 12) | (b[p + 11] << 4) | (b[p + 12] >> 4)
                total = ((b[p + 13] & 0x0F) << 32) | int.from_bytes(
                    b[p + 14 : p + 18], "big"
                )
                dur = total * 1000 // rate if rate and total else None
                return "flac", None, None, rate or None, dur
            return "flac", None, None, None, None
        if b.startswith(b"OggS"):
            # Ogg container: the first packet identifies the codec.
            # Vorbis id header = \x01vorbis with rate u32-LE at +12;
            # OpusHead carries the INPUT rate u32-LE at +12 (decode is
            # always 48 kHz, but the header field is what tools report).
            head = b[:256]
            for magic, fmt in ((b"\x01vorbis", "ogg-vorbis"), (b"OpusHead", "ogg-opus")):
                j = head.find(magic)
                if j >= 0 and j + 16 <= len(b):
                    rate = struct.unpack("<I", b[j + 12 : j + 16])[0]
                    return fmt, None, None, rate or None, None
            return "ogg", None, None, None, None
        if b.startswith(b"\x1a\x45\xdf\xa3"):
            # EBML (Matroska/WebM): DocType string sits in the first few
            # dozen bytes; duration needs full EBML varint walking — bare
            # format name is the graded degrade here
            fmt = "webm" if b"webm" in b[:64] else "mkv"
            return fmt, None, None, None, None
        if b.startswith(b"ID3") or (
            len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0 and (b[1] & 0x06)
        ):
            # MP3: skip an ID3v2 tag (syncsafe 28-bit size at bytes 6-9),
            # then read the first frame header — version + sample-rate
            # index + bitrate index; duration estimated as CBR from the
            # payload length (the standard header-only estimate)
            i = 0
            if b.startswith(b"ID3") and len(b) >= 10:
                i = 10 + (
                    ((b[6] & 0x7F) << 21)
                    | ((b[7] & 0x7F) << 14)
                    | ((b[8] & 0x7F) << 7)
                    | (b[9] & 0x7F)
                )
            # resync: tag padding/junk may precede the frame.  C-speed
            # find() per candidate (not a per-byte Python loop), bounded
            # to a 64 KiB window past the tag (standard tagger practice —
            # a corrupt multi-MB payload must not cost millions of
            # interpreter iterations in the hot decode path), and the
            # sync must carry nonzero LAYER bits — the same validity the
            # entry condition enforces, so an ID3-tagged ADTS/AAC frame
            # (layer bits 00) is not misread as MP3
            limit = min(len(b), i + 65536)
            while True:
                i = b.find(b"\xff", i)
                if i < 0 or i + 4 > limit:
                    i = len(b)  # no valid sync in window
                    break
                if (b[i + 1] & 0xE0) == 0xE0 and (b[i + 1] & 0x06):
                    break
                i += 1
            if i + 4 <= len(b):
                ver_bits = (b[i + 1] >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
                rate_idx = (b[i + 2] >> 2) & 0x3
                br_idx = (b[i + 2] >> 4) & 0xF
                rates = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
                kbps_v1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
                kbps_v2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
                if ver_bits in rates and rate_idx < 3:
                    rate = rates[ver_bits][rate_idx]
                    kbps = (kbps_v1 if ver_bits == 3 else kbps_v2)[br_idx]
                    # CBR estimate over the AUDIO bytes only — the ID3 tag
                    # (often megabytes of album art) is not audio time
                    dur = (len(b) - i) * 8 // kbps if kbps else None
                    return "mp3", None, None, rate, dur
            # ID3 tag with no valid MP3 frame in the resync window: keep
            # the bare format name, fabricate nothing (the payload may be
            # ID3-tagged AAC or truncated)
            return "mp3", None, None, None, None
        if len(b) >= 12 and b[4:8] == b"ftyp":
            # MP4 / ISO-BMFF: duration is moov/mvhd duration ÷ timescale;
            # display size is the first video trak's tkhd 16.16
            # fixed-point width/height.  The MAJOR BRAND distinguishes
            # the image codecs carried in the same container (AVIF/HEIC
            # as "mp4" would route stills to the video path downstream).
            brand = b[8:12]
            fmt = {b"avif": "avif", b"avis": "avif", b"heic": "heic",
                   b"heix": "heic", b"mif1": "heif"}.get(brand, "mp4")
            dur_ms = w = h = None
            for btype, p0, p1 in _mp4_boxes(b, 0, len(b)):
                if btype != b"moov":
                    continue
                for ctype, c0, c1 in _mp4_boxes(b, p0, p1):
                    if ctype == b"mvhd" and dur_ms is None and c0 + 4 <= c1:
                        ver = b[c0]
                        if ver == 1 and c0 + 36 <= c1:
                            ts = struct.unpack(">I", b[c0 + 20 : c0 + 24])[0]
                            d = struct.unpack(">Q", b[c0 + 24 : c0 + 32])[0]
                        elif c0 + 24 <= c1:
                            ts = struct.unpack(">I", b[c0 + 12 : c0 + 16])[0]
                            d = struct.unpack(">I", b[c0 + 16 : c0 + 20])[0]
                        else:
                            continue
                        if ts:
                            dur_ms = d * 1000 // ts
                    elif ctype == b"trak" and w is None:
                        for ttype, t0, t1 in _mp4_boxes(b, c0, c1):
                            if ttype != b"tkhd":
                                continue
                            ver = b[t0] if t0 < t1 else 0
                            # offsets from the fullbox start: version/flags
                            # (4) + times/track_ID/reserved/duration
                            # (20 v0 / 32 v1) + reserved/layer/group/
                            # volume/reserved (16) + matrix (36)
                            off = t0 + (88 if ver == 1 else 76)
                            if off + 8 <= t1:
                                fw, fh = struct.unpack(">II", b[off : off + 8])
                                if fw and fh:  # audio traks carry 0×0
                                    w, h = fw >> 16, fh >> 16
                break
            return fmt, w, h, None, dur_ms
        if b.startswith(b"\xff\xd8"):
            # JPEG: walk the marker stream to the first SOFn frame header
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xFF:
                    i += 1  # spec-legal 0xFF fill byte before a marker
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return "jpeg", w, h, None, None
                i += 2 + seg_len
            return "jpeg", None, None, None, None
    except struct.error:
        pass
    return "unknown", None, None, None, None


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_decode_stdlib(b: bytes) -> tuple[int, int, str] | None:
    """Full PNG decode with nothing but the stdlib: inflate the IDAT
    stream (zlib) and reverse the per-scanline filters (None/Sub/Up/
    Average/Paeth, RFC 2083 §6) to reconstruct the raw pixel grid.

    Returns ``(width, height, md5-of-reconstructed-pixels)`` — the digest
    proves the pixels were actually rebuilt, not just the header read —
    or ``None`` for anything that is not a well-formed 8-bit-depth,
    non-interlaced PNG (the caller falls back to the header sniff tier).
    Supports all five 8-bit color types; 1/2/4/16-bit depths and Adam7
    interlacing are declined, not misdecoded.
    """
    import hashlib
    import struct
    import zlib

    if len(b) < 8 or not b.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    try:
        i, ihdr, idat = 8, None, []
        while i + 8 <= len(b):
            (clen,) = struct.unpack(">I", b[i : i + 4])
            ctype = b[i + 4 : i + 8]
            data = b[i + 8 : i + 8 + clen]
            if len(data) < clen:
                return None
            if ctype == b"IHDR":
                ihdr = data
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            i += 12 + clen  # len + type + data + crc
        if ihdr is None or len(ihdr) < 13 or not idat:
            return None
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr[:13]
        )
        if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
            return None
        channels = _PNG_CHANNELS.get(color)
        if channels is None or not w or not h:
            return None
        stride = w * channels
        want = h * (stride + 1)
        # bounded inflate: the expected size is known from IHDR, so cap
        # the decompression there — an IDAT bomb (kilobytes inflating to
        # gigabytes) must decline, not OOM the executor.  The +1 probe
        # detects streams longer than the pixel grid; 64 MB caps this
        # guard tier outright (grids that large belong to the Pillow
        # tier, which decodes incrementally in C).
        if want > 64 * 1024 * 1024:
            return None
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), want + 1)
        # eof check: a truncated stream can still yield exactly `want`
        # bytes without ever reaching the adler32 trailer — the plain
        # zlib.decompress declined those, and so must the bounded form
        if len(raw) != want or not d.eof:
            return None
        prev = bytearray(stride)
        out = hashlib.md5()
        for row in range(h):
            base = row * (stride + 1)
            ftype = raw[base]
            line = bytearray(raw[base + 1 : base + 1 + stride])
            if ftype == 1:  # Sub
                for x in range(channels, stride):
                    line[x] = (line[x] + line[x - channels]) & 0xFF
            elif ftype == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = line[x - channels] if x >= channels else 0
                    c = prev[x - channels] if x >= channels else 0
                    bb = prev[x]
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = bb
                    else:
                        pred = c
                    line[x] = (line[x] + pred) & 0xFF
            elif ftype != 0:
                return None
            out.update(line)
            prev = line
        return int(w), int(h), out.hexdigest()
    except (struct.error, zlib.error, MemoryError):
        return None


def decode_real(
    df: DataFrame, id_col: str = "doc_id", prefer_pillow: bool = True
) -> DataFrame:
    """REAL media decode over the same Arrow-batched ``mapInPandas``
    contract as :func:`decode_features`.

    Three tiers, chosen per payload (pillow per executor at import time):

    - **header** (always on, pure stdlib): :func:`sniff_media_header`
      struct-parses format + dimensions / sample rate from magic bytes —
      enough for format routing, size filtering, and corpus stats without
      decompressing a single pixel (at 100 TB that IS the common decode
      question).
    - **png-stdlib** (always on, pure stdlib): :func:`png_decode_stdlib`
      fully decodes 8-bit non-interlaced PNGs — zlib inflate plus
      scanline-filter reconstruction — so one real pixel-grid decode path
      runs on every fleet, no optional dependency required.
    - **pillow** (import-guarded): when Pillow is installed and the
      payload actually decodes, full ``Image.open`` decode — dimensions
      from the pixel grid, format from the codec.  Per-payload failures
      fall back to the stdlib tiers instead of failing the task.

    The ``decoder`` column records which tier produced each row, so a
    mixed fleet (some executors with Pillow, some without) stays
    auditable.  :func:`decode_features` remains the deterministic stub the
    DuckDB oracle checks.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # guarded: media libs are optional everywhere
            from PIL import Image  # type: ignore

            pil = Image if prefer_pillow else None
        except ImportError:
            pil = None
        import io

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in _REAL_DECODE_SCHEMA}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                # a NULL id is metadata damage, not payload damage: the
                # row decodes normally and keeps a NULL doc_id (ADVICE
                # r03 — the old -1 sentinel collided with a real id of -1
                # and merged every null-id row).  Only a NULL payload —
                # nothing to decode — takes the degrade path, the same
                # one-bad-payload contract sniff_media_header keeps for
                # corrupt bytes (nullable binary columns are routine).
                # the id arrives as a STRING (cast JVM-side below): a
                # nullable long column would reach pandas as float64 and
                # silently round ids above 2^53; strings are lossless and
                # nulls stay None
                out_id = None if did is None or pd.isna(did) else int(did)
                if payload is None:
                    rows["doc_id"].append(out_id)
                    rows["n_bytes"].append(0)
                    rows["format"].append("unknown")
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["sample_rate"].append(None)
                    rows["duration_ms"].append(None)
                    rows["decoder"].append("null")
                    continue
                b = bytes(payload)
                fmt, w, h, rate, dur_ms = sniff_media_header(b)
                decoder = "header"
                if pil is not None:
                    try:
                        with pil.open(io.BytesIO(b)) as img:
                            fmt = (img.format or fmt).lower()
                            w, h = img.size
                            decoder = "pillow"
                    except Exception:
                        pass  # not an image Pillow knows; try stdlib tier
                # the pure-Python scanline loop only runs when Pillow is
                # absent or declined — on a Pillow fleet PNGs never pay it
                if decoder == "header" and fmt == "png":
                    png = png_decode_stdlib(b)
                    if png is not None:
                        w, h, _digest = png
                        decoder = "png-stdlib"
                rows["doc_id"].append(out_id)
                rows["n_bytes"].append(len(b))
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(rate)
                rows["duration_ms"].append(dur_ms)
                rows["decoder"].append(decoder)
            # nullable Int64 keeps missing values as NULLs (a float column
            # with NaN would not round-trip to LongType through Arrow)
            for col in ("doc_id", "width", "height", "sample_rate", "duration_ms"):
                rows[col] = pd.array(rows[col], dtype="Int64")
            yield pd.DataFrame(rows)

    # cast the id to string so a null anywhere in the batch cannot demote
    # the whole Arrow column to float64 (which rounds ids above 2^53)
    return df.select(
        F.col(id_col).cast("string").alias(id_col), "payload"
    ).mapInPandas(_decode, _REAL_DECODE_SCHEMA)


FRAME_BYTES = 64

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    df: DataFrame,
    stride: int = 2,
    frame_bytes: int = FRAME_BYTES,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-style frame sampling over a binary payload: the payload is a
    sequence of fixed-size ``frame_bytes`` frames; keep every
    ``stride``-th one.  Real plumbing, fake frames — swap the fixed-width
    slicing for a container demuxer (PyAV) and the mapInPandas contract,
    schema, and fan-out shape are unchanged.  Emits the frame's md5, not
    the bytes, so the DuckDB oracle (ASCII payloads: byte == char offsets)
    states identical values without shipping payloads through the gate.

    Scale shape: one Arrow-batched pass, output rows ≈ n_bytes /
    (frame_bytes × stride) per doc — a skewed 1 GB payload fans out into
    rows, never into one hot task downstream.
    """
    import hashlib

    if stride <= 0 or frame_bytes <= 0:
        raise ValueError(f"stride/frame_bytes must be positive: {stride}, {frame_bytes}")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_md5": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n_frames = -(-len(b) // frame_bytes) if b else 0
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(fr))
                    out["frame_md5"].append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_sample, _FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_payload(df: DataFrame, factor: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Image-style downsample: keep every ``factor``-th byte of the
    payload (the grid-subsample a real resize generalizes).  Same honest
    split as decode_features: the byte arithmetic is a stand-in, the
    Arrow-batched contract and the deterministic oracle are real."""
    import hashlib

    if factor <= 0:
        raise ValueError(f"factor must be positive, got {factor}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "n_bytes_in": [], "n_bytes_out": [], "thumb_md5": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                thumb = b[::factor]
                rows["doc_id"].append(int(did))
                rows["n_bytes_in"].append(len(b))
                rows["n_bytes_out"].append(len(thumb))
                rows["thumb_md5"].append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(_resize, _RESIZE_SCHEMA)


def audio_chunks(
    df: DataFrame,
    width: int = 100,
    hop: int = 60,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-width chunking over binary payloads — the audio
    framing shape (STFT windows, ASR segmenting: chunk i covers bytes
    [i·hop, i·hop + width), consecutive chunks sharing ``width − hop``
    bytes of context), which :func:`frame_sample`'s non-overlapping
    stride cannot express.  The chunk tail is kept partial (the last
    window of a clip is still a window).

    Unlike the decode-shaped multimodal ops (Arrow mapInPandas because a
    real codec needs Python), chunk arithmetic is expressible directly:
    ``explode(sequence(...))`` + ``substring`` on the binary column —
    whole-stage codegen end to end, no Python, no shuffle; 100 TB of
    audio chunks at scan throughput.  Emits ``(id, chunk_idx,
    n_chunk_bytes, chunk_md5)`` — the md5 stands in for the per-chunk
    feature extraction a real pipeline plugs in downstream.
    """
    assert width >= 1 and hop >= 1
    n_last = f"CAST((length({payload_col}) - 1) DIV {hop} AS INT)"
    return (
        df.filter(F.expr(f"length({payload_col}) > 0"))
        .select(
            F.col(id_col),
            F.expr(f"explode(sequence(0, {n_last}))").alias("chunk_idx"),
            F.col(payload_col),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"CAST(length(substring({payload_col}, "
                f"chunk_idx * {hop} + 1, {width})) AS BIGINT)"
            ).alias("n_chunk_bytes"),
            F.expr(
                f"md5(substring({payload_col}, chunk_idx * {hop} + 1, {width}))"
            ).alias("chunk_md5"),
        )
    )
