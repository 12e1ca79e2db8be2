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
