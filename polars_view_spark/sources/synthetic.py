"""Deterministic synthetic-events source via Spark 4's Python Data Source
API — the load-test / replay fixture generator every pipeline team ends up
needing, and the repo's coverage of the new-in-Spark-4 surface for custom
Python connectors (external systems with no JVM connector).

Every field derives from the md5 bridge of ``i + seed`` (the same 60-bit
hash used everywhere else in this repo, functions/texthash.py), so an
independent engine can regenerate EXACTLY the same rows from a plain
``generate_series`` — which is how the catalog entry holds a full
value-hash oracle over a custom Python source.

Scale notes: the reader yields ONE Arrow RecordBatch per partition
(vectorized transfer — the API's fast path; per-row tuple yields are the
slow path), and partitions split the id range round-robin so generation
parallelizes across executors.  A Python data source is still Python per
element — use it for fixtures, replay, and connector gaps, not for hot
analytical scans (those belong to the JVM sources in readers.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: event_type alphabet; index = hash % 5 (mirrored in the oracle CASE)
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

#: 2024-01-01T00:00:00 UTC — ts_epoch = base + i seconds
TS_EPOCH_BASE = 1_704_067_200

SYNTH_SCHEMA = (
    "event_id BIGINT, ts_epoch BIGINT, user_id BIGINT, "
    "event_type STRING, value_cents BIGINT, props STRING"
)


def _arrow_schema():
    """Arrow spelling of SYNTH_SCHEMA, passed explicitly when building
    RecordBatches: an EMPTY partition (n < partitions, both user-settable)
    would otherwise infer null-typed columns from the empty lists and
    fail the scan with a type conflict against the declared schema."""
    import pyarrow as pa

    return pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts_epoch", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
            ("props", pa.string()),
        ]
    )


def _h60(i: int, seed: int) -> int:
    """Python spelling of the repo's md5 bridge: hex64_sql(CAST(x AS
    STRING)) ≡ int(md5(str(x))[:15], 16) — 60 bits, non-negative."""
    return int(hashlib.md5(str(i + seed).encode()).hexdigest()[:15], 16)


def _event_row(i: int, seed: int) -> tuple:
    """THE field derivation, shared by the batch and stream readers (and
    regenerated verbatim by the DuckDB oracle) — one definition so the
    two faces can never drift apart and break batch/stream parity or
    checkpoint-replay determinism."""
    h = _h60(i, seed)
    return (
        i,
        TS_EPOCH_BASE + i,
        h % 1000,
        EVENT_TYPES[h % 5],
        h % 100_000,
        '{"k": %d}' % (h % 100),
    )


class SynthEventsDataSource(DataSource):
    """``spark.read.format("pvs_synth_events").option("n", ...)``.

    Options: ``n`` rows (default 1000), ``seed`` (default 0),
    ``partitions`` (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "pvs_synth_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(self.options)


class SynthEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(k) for k in range(self.n_parts)]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        rows = [
            _event_row(i, self.seed)
            for i in range(partition.value, self.n, self.n_parts)
        ]
        schema = _arrow_schema()
        yield pa.RecordBatch.from_pydict(
            {name: [r[j] for r in rows] for j, name in enumerate(schema.names)},
            schema=schema,
        )


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source — the Spark 4 Python STREAM
    connector surface: offset = ``{"pos": next_id}``, each micro-batch
    advances by ``step`` ids, and :meth:`readBetweenOffsets` replays any
    offset range deterministically (exactly the contract checkpoint
    recovery relies on — a replayed batch must reproduce the committed
    rows bit-for-bit, which the md5-derived fields guarantee).  A
    bounded ``n`` makes the stream drainable for tests/oracles; a live
    deployment would leave ``n`` unbounded and let the offset grow."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.step = max(1, int(options.get("step", 100)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: Spark's prefetch cache
        # shallow-copies the returned iterator (copy.copy) to serve the
        # planner and the replay path from one read() — generators are
        # unpicklable/uncopyable and fail there; a step is bounded, so
        # materializing it is the intended shape
        return iter([_event_row(i, self.seed) for i in range(lo, hi)])

    def read(self, start: dict):
        pos = start["pos"]
        end = min(self.n, pos + self.step)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])


def read_synth_events(spark, n: int, seed: int = 0, partitions: int = 4):
    """Register (idempotent) and read the synthetic events source."""
    spark.dataSource.register(SynthEventsDataSource)
    return (
        spark.read.format("pvs_synth_events")
        .option("n", str(n))
        .option("seed", str(seed))
        .option("partitions", str(partitions))
        .load()
    )


def drain_synth_stream(
    spark, query_name: str, n: int, seed: int = 0, step: int = 100
):
    """Drain the bounded synthetic STREAM into an in-memory table.

    ``processAllAvailable`` + stop, not ``availableNow``: an availableNow
    trigger asks a simple stream reader for one planned batch and ends
    (observed: only the first ``step`` rows land), while
    processAllAvailable keeps firing micro-batches until the offset
    stops advancing — the drain semantics a bounded replay wants."""
    spark.dataSource.register(SynthEventsDataSource)
    stream = (
        spark.readStream.format("pvs_synth_events")
        .option("n", str(n))
        .option("seed", str(seed))
        .option("step", str(step))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
