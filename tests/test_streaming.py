"""Structured Streaming: batch/stream parity + stateful operator."""

import pytest

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    """availableNow drain of the streaming tumbling agg == batch operator."""
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.operators.events import tumbling_agg
    from polars_view_spark.streaming.events import (
        read_event_stream,
        run_stream_to_memory,
        streaming_tumbling_agg,
    )

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    run_stream_to_memory(streaming_tumbling_agg(stream), "stream_tumbling")
    got = {
        tuple(r)
        for r in spark.table("stream_tumbling")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect()
    }

    batch = tumbling_agg(load_tables(spark, SF, "events")["events"])
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_streaming_running_counts(spark):
    """applyInPandasWithState accumulates per-user counts across batches."""
    from polars_view_spark.catalog import load_tables
    from polars_view_spark.streaming.events import (
        read_event_stream,
        run_stream_to_memory,
        streaming_running_counts,
    )

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    run_stream_to_memory(
        streaming_running_counts(stream), "stream_counts", output_mode="update"
    )
    got = {
        r["user_id"]: r["n_events"] for r in spark.table("stream_counts").collect()
    }

    batch = (
        load_tables(spark, SF, "events")["events"].groupBy("user_id").count().collect()
    )
    want = {r["user_id"]: r["count"] for r in batch}
    # update-mode memory sink may contain one row per micro-batch per user;
    # the FINAL count per user must match the batch count
    assert {u: got[u] for u in want} == want


def test_watermark_bounds_state(spark):
    """The watermarked plan carries an EventTimeWatermark node (state is
    bounded — the property that matters at firehose scale)."""
    from polars_view_spark.streaming.events import (
        read_event_stream,
        streaming_tumbling_agg,
    )

    stream = read_event_stream(spark, f"{SF}/events.parquet")
    agg = streaming_tumbling_agg(stream)
    assert agg.isStreaming
    plan = agg._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
