"""Multimodal column support: opaque ``binary`` payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload travels as a
BinaryType column next to a StructType metadata column; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes whole record
batches without JVM↔Python per-row costs.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_features`` computes a deterministic fake feature
vector from the raw bytes, and ``decode_real`` raises NotImplementedError
with the integration point documented.  Everything around the stub — the
schema, the batch iteration, the partitioning behavior — is real and
tested.
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

    For real media you'd read the bytes with ``spark.read.format("binaryFile")``
    — which yields exactly this shape (path/length/content) — so downstream
    operators are source-agnostic.
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


def decode_real(df: DataFrame) -> DataFrame:
    """Integration point for a real decoder (PIL / torchaudio / PyAV).

    Not available in this container — the function documents the contract:
    same mapInPandas shape as :func:`decode_features`, with the batch body
    calling the media library per payload.
    """
    raise NotImplementedError(
        "media decode libraries are not installed in this environment; "
        "use decode_features() for the deterministic stub with identical "
        "Spark-side plumbing"
    )


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
