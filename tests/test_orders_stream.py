"""Streaming flagship: the conversion stream must produce exactly the
batch flagship's rows, and checkpoint replay must add nothing."""

from __future__ import annotations

import os
import tempfile

from orders_currency_conversion_etl_spark.plans.registry import (
    CONVERSION_TIME,
    QUERIES,
    boundary_cast,
)
from orders_currency_conversion_etl_spark.streaming.orders_stream import (
    run_conversion_stream,
)

SF = "/root/testdata/sf0.001"


def test_conversion_stream_matches_batch(spark):
    with tempfile.TemporaryDirectory() as work:
        # streamed output keeps exact DECIMAL; the registered batch twin
        # is boundary-cast to DOUBLE — apply the same cast for compare
        streamed = boundary_cast(run_conversion_stream(spark, SF, work, CONVERSION_TIME))
        batch = QUERIES["flagship_conversion"](spark, SF)
        s = sorted(tuple(r) for r in streamed.collect())
        b = sorted(tuple(r) for r in batch.collect())
        assert len(s) == len(b) > 0
        assert s == b  # stream-static join == batch join, row for row


def test_conversion_stream_checkpoint_idempotent(spark):
    with tempfile.TemporaryDirectory() as work:
        first = run_conversion_stream(spark, SF, work, CONVERSION_TIME).count()
        again = run_conversion_stream(spark, SF, work, CONVERSION_TIME).count()
        assert first == again

        # dual sink wrote a processed-marker per batch with the same rows
        out = os.path.join(work, "out")
        processed = spark.read.parquet(os.path.join(out, "processed", "batch=*"))
        assert processed.count() == first
        assert set(processed.columns) == {"order_id", "processed_at"}
