"""Stream-stream interval join must converge to its batch twin."""

from __future__ import annotations

import os
import tempfile

from orders_currency_conversion_etl_spark.sources import catalog
from orders_currency_conversion_etl_spark.streaming.attribution import (
    attribute_purchases,
    join_interval_attribution,
    split_streams,
)
from orders_currency_conversion_etl_spark.streaming.events_stream import (
    read_events_stream,
    stage_events_as_stream_source,
)

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_matches_batch(spark):
    with tempfile.TemporaryDirectory() as work:
        stage = stage_events_as_stream_source(spark, SF, os.path.join(work, "stage"))
        clicks, purchases = split_streams(read_events_stream(spark, stage))
        out = os.path.join(work, "out")
        q = (
            attribute_purchases(clicks, purchases)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
        batch = {tuple(r) for r in join_interval_attribution(spark, SF).collect()}
        # time-ordered staging => no pair is dropped as late; inner
        # interval join emits only watermark-closed matches, so the
        # stream's output is a subset that must cover all but the pairs
        # still open at end-of-stream
        assert streamed <= batch
        assert len(batch) > 0
        missing = len(batch) - len(streamed)
        assert missing <= max(3, len(batch) // 4), (len(streamed), len(batch))
