"""The queue as a REAL Spark data source (late r13,
streaming/queue_source.py): engine-visible {partition: next_seq}
offsets, startingOffsets/endingOffsets slicing, maxSegmentsPerTrigger
throttling, exactly-once resume across drains, and consumer-group
progress written by the engine's own commit callback."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from orders_currency_conversion_etl_spark.streaming.file_queue import (
    queue_append,
    queue_retain,
    read_queue_batch,
)
from orders_currency_conversion_etl_spark.streaming.queue_source import (
    read_group_progress,
    register_queue_source,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("partition", T.IntegerType()),
    ]
)


def _segment_df(spark, partition_id: int, seq: int, n: int = 10):
    base = (partition_id * 1000 + seq) * 100
    return spark.range(base, base + n).select(
        F.col("id"),
        F.concat(F.lit(f"p{partition_id}s{seq}r"), F.col("id")).alias("payload"),
    )


def _stage(spark, q: str, layout: "dict[int, int]") -> None:
    for part, n_segs in layout.items():
        for seq in range(n_segs):
            queue_append(_segment_df(spark, part, seq), q, part)


def _rows(df) -> set:
    return {(r["id"], r["payload"], r["partition"]) for r in df.collect()}


def test_batch_read_matches_file_source_path(spark):
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q:
        _stage(spark, q, {0: 2, 1: 3})
        got = spark.read.format("orders_queue").option("path", q).load()
        # inferred schema = segment footer schema + partition column
        assert got.columns == ["id", "payload", "partition"]
        ref = read_queue_batch(spark, q, SCHEMA)
        assert _rows(got) == _rows(ref)
        assert got.count() == 50


def test_batch_offset_slicing(spark):
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q:
        _stage(spark, q, {0: 3, 1: 2})
        got = (
            spark.read.format("orders_queue")
            .option("path", q)
            .option("startingOffsets", '{"0": 1, "1": 2}')
            .option("endingOffsets", '{"0": 2}')
            .load()
        )
        # partition 0: [1, 2) -> seq 1 only; partition 1: [2, inf) -> none
        assert _rows(got) == _rows(
            read_queue_batch(spark, q, SCHEMA, partitions=[0], from_offsets={0: 1})
        ) - _rows(
            read_queue_batch(spark, q, SCHEMA, partitions=[0], from_offsets={0: 2})
        )
        assert got.count() == 10

        # an empty slice is zero rows, not a planning error
        empty = (
            spark.read.format("orders_queue")
            .option("path", q)
            .option("startingOffsets", '{"0": 99, "1": 99}')
            .load()
        )
        assert empty.count() == 0


def _poll(predicate, timeout_s: float = 120.0) -> None:
    """Python streaming sources don't support Trigger.AvailableNow
    (the engine logs the fallback), so the tests run a short
    processingTime trigger and poll for the expected durable state —
    including the post-batch `commit` callback, which fires on the
    NEXT trigger cycle after a batch completes."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if predicate():
                return
        except Exception:
            pass
        time.sleep(0.3)
    raise AssertionError("streaming drain did not reach the expected state")


def test_stream_resume_exactly_once_and_group_commit(spark):
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt, \
         tempfile.TemporaryDirectory() as out:
        _stage(spark, q, {0: 2, 1: 1})

        def start():
            return (
                spark.readStream.format("orders_queue")
                .option("path", q)
                .option("group", "g1")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="300 milliseconds")
                .start()
            )

        def sink_count():
            try:
                return spark.read.schema(SCHEMA).parquet(out).count()
            except Exception:
                return 0

        sq = start()
        try:
            _poll(lambda: sink_count() == 30)
            first = spark.read.schema(SCHEMA).parquet(out)
            assert _rows(first) == _rows(read_queue_batch(spark, q, SCHEMA))

            # late appends + a brand-new partition while the stream is
            # live: ONLY the new segments are read (offset resume) and
            # the next batch's construction commits the PREVIOUS end
            # (the trailing-commit contract, see commit's docstring)
            queue_append(_segment_df(spark, 0, 2), q, 0)
            queue_append(_segment_df(spark, 2, 0), q, 2)
            _poll(lambda: sink_count() == 50)
            # the committed watermark covers at least the pre-append log
            # (batch boundaries are trigger-timing dependent, so the
            # exact committed batch varies; coverage is the contract)
            _poll(
                lambda: read_group_progress(q, "g1").get(0, 0) >= 2
                and read_group_progress(q, "g1").get(1, 0) >= 1
            )
        finally:
            sq.stop()
            sq.awaitTermination(30)

        # restart from the checkpoint: a fresh append is consumed from
        # the stored offsets — each row lands exactly once
        queue_append(_segment_df(spark, 1, 1), q, 1)
        sq = start()
        try:
            _poll(lambda: sink_count() == 60)
        finally:
            sq.stop()
            sq.awaitTermination(30)
        both = spark.read.schema(SCHEMA).parquet(out)
        assert both.count() == 60
        assert _rows(both) == _rows(read_queue_batch(spark, q, SCHEMA))

        # the committed progress IS the retention watermark (trailing:
        # after the restart's first batch it covers the pre-restart log)
        wm = read_group_progress(q, "g1")
        deleted = queue_retain(q, wm)
        assert deleted == {p: list(range(o)) for p, o in wm.items() if o}


def test_max_segments_per_trigger_throttles(spark):
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt:
        _stage(spark, q, {0: 4})
        batches: list[int] = []

        def sink(df, batch_id):
            batches.append(df.count())

        sq = (
            spark.readStream.format("orders_queue")
            .option("path", q)
            .option("maxSegmentsPerTrigger", "1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            _poll(lambda: sum(batches) == 40)
        finally:
            sq.stop()
            sq.awaitTermination(30)
        assert sum(batches) == 40
        # one segment (10 rows) per micro-batch, never more
        assert all(b <= 10 for b in batches)
        assert len([b for b in batches if b]) == 4


def test_empty_queue_needs_schema(spark):
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q:
        with pytest.raises(Exception, match="no committed segments"):
            spark.read.format("orders_queue").option("path", q).load().count()
        # explicit schema makes an empty queue readable
        got = (
            spark.read.format("orders_queue")
            .option("path", q)
            .schema(SCHEMA)
            .load()
        )
        assert got.count() == 0
