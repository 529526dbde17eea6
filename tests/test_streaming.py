"""Structured Streaming: tumbling window with watermark through the
dual foreachBatch sink, checked against the batch twin."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.sources import catalog
from orders_currency_conversion_etl_spark.streaming.events_stream import (
    run_stream_once,
    tumbling_hourly,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch_twin(spark):
    """Replaying the whole table through the stream (availableNow) must
    reproduce the batch aggregation exactly — same Catalyst plan, run
    incrementally with state."""
    with tempfile.TemporaryDirectory() as work:
        streamed = run_stream_once(spark, SF, work)
        batch = tumbling_hourly(catalog.load_table(spark, SF, "events"))
        s = {tuple(r) for r in streamed.collect()}
        b = {tuple(r) for r in batch.collect()}
        # time-ordered staging => nothing is late => every emitted
        # window matches batch exactly; only the tail windows still
        # inside the watermark at end-of-stream stay unflushed (append
        # mode semantics).
        assert s <= b
        assert len(s) > 0
        assert len(b) - len(s) <= 3


def test_stream_checkpoint_idempotency(spark):
    """Re-running against the same checkpoint adds nothing (the
    exactly-once contract that replaces FOR UPDATE, SURVEY §7.4)."""
    with tempfile.TemporaryDirectory() as work:
        first = run_stream_once(spark, SF, work).count()
        second = run_stream_once(spark, SF, work).count()
        assert first == second


def test_watermark_present_in_plan(spark):
    ev = catalog.load_table(spark, SF, "events")
    agg = tumbling_hourly(ev)
    # batch mode ignores the watermark operator but it must be in the plan
    assert "n_events" in agg.columns and "total_value" in agg.columns
    assert agg.filter(F.col("n_events") <= 0).count() == 0
