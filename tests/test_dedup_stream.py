"""Streaming exactly-once dedup: an at-least-once feed (every row
delivered twice) must come out exactly once, with bounded state."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.sources import catalog
from orders_currency_conversion_etl_spark.streaming.dedup_stream import (
    run_dedup_stream_once,
)

SF = "/root/testdata/sf0.001"


def test_duplicated_feed_comes_out_exactly_once(spark):
    ev = catalog.load_table(spark, SF, "events")
    n_unique = ev.count()
    with tempfile.TemporaryDirectory() as work:
        out = run_dedup_stream_once(spark, SF, work)
        assert out.count() == n_unique
        assert out.select(F.countDistinct("event_id")).first()[0] == n_unique


def test_dedup_state_is_watermark_bounded(spark):
    """The physical streaming plan must use the within-watermark dedup
    operator (state expires), not plain unbounded dropDuplicates."""
    from orders_currency_conversion_etl_spark.streaming.dedup_stream import (
        dedup_within_watermark,
        stage_duplicated_events,
    )
    from orders_currency_conversion_etl_spark.streaming.events_stream import (
        read_events_stream,
    )

    with tempfile.TemporaryDirectory() as work:
        stage_duplicated_events(spark, SF, work + "/stage")
        deduped = dedup_within_watermark(read_events_stream(spark, work + "/stage"))
        q = (
            deduped.writeStream.format("noop")
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert "dedupeWithinWatermark" in q.lastProgress["stateOperators"][0]["operatorName"]
