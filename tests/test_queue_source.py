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
    """Throttling applies once the base is seeded from engine-visible
    offsets — i.e. from the second planned batch of a run. (The FIRST
    batch of a groupless run is deliberately uncapped since the r14
    restart-duplicate fix: with no durable base, capping against
    startingOffsets could regress below a restarted checkpoint's end.
    test_throttled_restart_* pin that contract.) Starting on an empty
    queue, every appended segment therefore drains one per trigger."""
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt:
        batches: list[int] = []

        def sink(df, batch_id):
            batches.append(df.count())

        sq = (
            spark.readStream.format("orders_queue")
            .option("path", q)
            .option("maxSegmentsPerTrigger", "1")
            .schema(SCHEMA)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            _poll(lambda: len(batches) >= 1)  # base seeded on empty log
            _stage(spark, q, {0: 4})
            _poll(lambda: sum(batches) == 40)
        finally:
            sq.stop()
            sq.awaitTermination(30)
        assert sum(batches) == 40
        # one segment (10 rows) per micro-batch, never more
        assert all(b <= 10 for b in batches)
        assert len([b for b in batches if b]) == 4


def test_throttled_restart_never_duplicates(spark):
    """The r14 ADVICE high fix: restarting a maxSegmentsPerTrigger
    stream used to re-seed the throttle base from startingOffsets
    (0), return an end offset BELOW the checkpointed end, and re-read
    still-on-disk segments — duplicating every row in the sink. With a
    consumer group the base now seeds from the group's committed
    marker; the restarted stream consumes only the backlog, exactly
    once, and the durable marker never moves backwards."""
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt, \
         tempfile.TemporaryDirectory() as out:
        _stage(spark, q, {0: 4})

        def start():
            return (
                spark.readStream.format("orders_queue")
                .option("path", q)
                .option("group", "thr")
                .option("maxSegmentsPerTrigger", "1")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="200 milliseconds")
                .start()
            )

        def sink_count():
            try:
                return spark.read.schema(SCHEMA).parquet(out).count()
            except Exception:
                return 0

        sq = start()
        try:
            _poll(lambda: sink_count() == 40)
            # commits trail by one constructed batch (the trailing-
            # commit contract), so push one more segment through to
            # land a rich group marker before stopping
            queue_append(_segment_df(spark, 0, 4), q, 0)
            _poll(lambda: sink_count() == 50)
            _poll(lambda: read_group_progress(q, "thr").get(0, 0) >= 4)
        finally:
            sq.stop()
            sq.awaitTermination(30)
        marker_before = read_group_progress(q, "thr")

        # restart against the SAME on-disk log (nothing GC'd — the
        # r13 bug's trigger condition) plus a small backlog
        queue_append(_segment_df(spark, 0, 5), q, 0)
        sq = start()
        try:
            _poll(lambda: sink_count() == 60)
            import time

            time.sleep(1.5)  # extra triggers: would surface re-reads
            assert sink_count() == 60
            # durable marker is monotonic across the restart
            assert all(
                read_group_progress(q, "thr").get(p, 0) >= o
                for p, o in marker_before.items()
            )
        finally:
            sq.stop()
            sq.awaitTermination(30)
        final = spark.read.schema(SCHEMA).parquet(out)
        assert final.count() == 60
        assert _rows(final) == _rows(read_queue_batch(spark, q, SCHEMA))


def test_throttled_restart_without_group_uncapped_first_batch(spark):
    """Without a group there is no durable throttle base, so the FIRST
    batch of a (re)started run is uncapped rather than risking an
    offset regression — correctness over throttling. The whole backlog
    lands exactly once; throttling resumes afterwards."""
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt, \
         tempfile.TemporaryDirectory() as out:
        _stage(spark, q, {0: 3})

        def start():
            return (
                spark.readStream.format("orders_queue")
                .option("path", q)
                .option("maxSegmentsPerTrigger", "1")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="200 milliseconds")
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
        finally:
            sq.stop()
            sq.awaitTermination(30)
        queue_append(_segment_df(spark, 0, 3), q, 0)
        sq = start()
        try:
            _poll(lambda: sink_count() == 40)
            import time

            time.sleep(1.5)
            assert sink_count() == 40  # no duplicates, ever
        finally:
            sq.stop()
            sq.awaitTermination(30)
        final = spark.read.schema(SCHEMA).parquet(out)
        assert _rows(final) == _rows(read_queue_batch(spark, q, SCHEMA))


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


def test_batch_writer_roundtrip_and_offset_continuation(spark):
    """The write half: df.write.format('orders_queue') appends one
    segment per (task, queue partition) with offsets assigned in the
    driver's commit — write(read(q)) roundtrips, later writes continue
    the offset sequence, and overwrite mode is rejected."""
    register_queue_source(spark)
    from orders_currency_conversion_etl_spark.streaming.file_queue import (
        queue_offsets,
    )

    with tempfile.TemporaryDirectory() as q:
        df = spark.range(0, 40).select(
            F.col("id"),
            F.concat(F.lit("r"), F.col("id")).alias("payload"),
            (F.col("id") % 2).cast("int").alias("partition"),
        )
        df.repartition(4).write.format("orders_queue").mode("append").option(
            "path", q
        ).save()
        back = spark.read.format("orders_queue").option("path", q).load()
        assert _rows(back) == {
            (i, f"r{i}", i % 2) for i in range(40)
        }
        first_offsets = queue_offsets(q)
        assert set(first_offsets) == {0, 1}

        # a second append continues each partition's offset sequence
        df2 = spark.range(40, 50).select(
            F.col("id"),
            F.concat(F.lit("r"), F.col("id")).alias("payload"),
            (F.col("id") % 2).cast("int").alias("partition"),
        )
        df2.write.format("orders_queue").mode("append").option("path", q).save()
        assert spark.read.format("orders_queue").option("path", q).load().count() == 50
        later = queue_offsets(q)
        assert all(later[p] > first_offsets[p] for p in first_offsets)

        # no stray staging files after commit
        staging = os.path.join(q, "_staging")
        assert not os.path.isdir(staging) or os.listdir(staging) == []

        with pytest.raises(Exception, match="append-only|overwrite"):
            df2.write.format("orders_queue").mode("overwrite").option(
                "path", q
            ).save()

        # a missing partition column is loud, not a silent misroute
        with pytest.raises(Exception, match="partition"):
            spark.range(3).write.format("orders_queue").mode("append").option(
                "path", q
            ).save()


def test_stream_writer_exactly_once_replay(spark):
    """The streaming write half: a replayed micro-batch commit is a
    no-op (marker) and a PARTIALLY crashed commit resumes through the
    intent log without duplicating offsets — the two-phase contract."""
    register_queue_source(spark)
    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamWriter,
        _stage_rows,
    )
    from orders_currency_conversion_etl_spark.streaming.file_queue import (
        queue_offsets,
        read_queue_batch,
    )

    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as src, \
         tempfile.TemporaryDirectory() as ckpt:
        # engine path first: queue -> stream -> queue sink
        _stage(spark, src, {0: 2, 1: 1})
        sq = (
            spark.readStream.format("orders_queue")
            .option("path", src)
            .load()
            .writeStream.format("orders_queue")
            .option("path", q)
            .option("publishId", "conv")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            _poll(
                lambda: spark.read.format("orders_queue")
                .option("path", q)
                .load()
                .count()
                == 30
            )
        finally:
            sq.stop()
            sq.awaitTermination(30)
        sunk = spark.read.format("orders_queue").option("path", q).load()
        # payload roundtrips; the sink queue's OWN partition key equals
        # the carried partition column (stripped on write, re-derived
        # from the directory on read)
        assert {(r["id"], r["payload"]) for r in sunk.collect()} == {
            (r["id"], r["payload"])
            for r in read_queue_batch(spark, src, SCHEMA).collect()
        }

        # direct replay simulation: same batchId committed twice
        w = QueueStreamWriter({"path": q, "publishid": "manual"}, SCHEMA)
        rows = spark.range(100, 110).select(
            F.col("id"),
            F.lit("m").alias("payload"),
            F.lit(0).cast("int").alias("partition"),
        ).collect()
        before = dict(queue_offsets(q))
        msg = _stage_rows(q, SCHEMA, iter(rows))
        w.commit([msg], batchId=7)
        mid = dict(queue_offsets(q))
        assert mid[0] == before[0] + 1
        # replay: fresh staging, same batch id -> marker no-op
        msg2 = _stage_rows(q, SCHEMA, iter(rows))
        w.commit([msg2], batchId=7)
        assert dict(queue_offsets(q)) == mid

        # partial-crash resume: intent written, one link done, marker
        # missing -> the re-commit finishes idempotently (intent now
        # records [offset, content_fingerprint] pairs — r14)
        msg3 = _stage_rows(q, SCHEMA, iter(rows))
        import json as _json

        intent = os.path.join(q, "_publishes", "manual=8.intent")
        fp3 = msg3.files[0][3]
        plan = {"0": [[mid[0], fp3]]}
        with open(intent, "w") as f:
            _json.dump(plan, f)
        # simulate the crashed attempt's completed link
        pdir = os.path.join(q, "partition=0")
        os.link(msg3.files[0][1], os.path.join(pdir, f"seq={mid[0]:08d}.parquet"))
        w.commit([msg3], batchId=8)
        after = dict(queue_offsets(q))
        assert after[0] == mid[0] + 1
        assert os.path.exists(os.path.join(q, "_publishes", "manual=8.done"))
        assert not os.path.exists(intent)


def test_stream_writer_replay_pairing_is_content_deterministic(spark):
    """The r14 ADVICE fix: with MULTIPLE staged temps per queue
    partition, a replay's fresh random temp names must not reorder the
    content-to-offset assignment. The intent pins (offset,
    fingerprint); pairing is by fingerprint, so whichever uuid names
    the replay draws, each offset gets the same rows."""
    register_queue_source(spark)
    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamWriter,
        _stage_rows,
    )

    def rows_for(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.lit(tag).alias("payload"),
            F.lit(0).cast("int").alias("partition"),
        ).collect()

    with tempfile.TemporaryDirectory() as q:
        os.makedirs(os.path.join(q, "partition=0"))
        w = QueueStreamWriter({"path": q, "publishid": "pair"}, SCHEMA)
        # two tasks -> two temps for the same queue partition
        rows_a, rows_b = rows_for(0, 5, "a"), rows_for(5, 9, "b")
        msg_a = _stage_rows(q, SCHEMA, iter(rows_a))
        msg_b = _stage_rows(q, SCHEMA, iter(rows_b))
        # crashed attempt: intent written + the FIRST planned link done
        w_probe = [msg_a, msg_b]
        from orders_currency_conversion_etl_spark.streaming.queue_source import (
            _collect_staged,
        )
        staged = _collect_staged(w_probe)[0]
        import json as _json

        intent = os.path.join(q, "_publishes", "pair=3.intent")
        os.makedirs(os.path.dirname(intent), exist_ok=True)
        with open(intent, "w") as f:
            _json.dump({"0": [[0, staged[0][0]], [1, staged[1][0]]]}, f)
        first_fp, first_tmp = staged[0]
        os.link(first_tmp, os.path.join(q, "partition=0", "seq=00000000.parquet"))

        # replay stages the SAME content under fresh random names —
        # possibly sorting into the opposite path order
        msg_a2 = _stage_rows(q, SCHEMA, iter(rows_a))
        msg_b2 = _stage_rows(q, SCHEMA, iter(rows_b))
        w.commit([msg_b2, msg_a2], batchId=3)

        got = spark.read.format("orders_queue").option("path", q).load()
        assert got.count() == 9
        # offset 0 holds exactly the crashed attempt's linked content
        # which tag landed at offset 0 is fingerprint-order dependent;
        # the contract: offsets 0 and 1 hold the two DISTINCT row-sets
        # with no duplication or loss, replay names notwithstanding
        seg0 = spark.read.parquet(os.path.join(q, "partition=0", "seq=00000000.parquet"))
        tags0 = {r["payload"] for r in seg0.collect()}
        seg1 = spark.read.parquet(os.path.join(q, "partition=0", "seq=00000001.parquet"))
        tags1 = {r["payload"] for r in seg1.collect()}
        assert tags0 != tags1 and tags0 | tags1 == {"a", "b"}
        assert seg0.count() + seg1.count() == 9
        assert len({r["id"] for r in got.collect()}) == 9


def test_stream_writer_replay_regroup_replans_when_nothing_linked(spark):
    """A replay whose task layout GROUPS the rows differently (e.g. 2
    temps -> 1 temp) used to wedge on a shape-mismatch RuntimeError.
    With no planned segment linked yet, the stale intent is discarded
    and the batch re-planned; with a link already visible it still
    fails loudly (reader-visible segments cannot be rewritten)."""
    register_queue_source(spark)
    import json as _json

    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamWriter,
        _stage_rows,
    )

    rows = spark.range(0, 6).select(
        F.col("id"),
        F.lit("x").alias("payload"),
        F.lit(0).cast("int").alias("partition"),
    ).collect()

    with tempfile.TemporaryDirectory() as q:
        os.makedirs(os.path.join(q, "partition=0"))
        w = QueueStreamWriter({"path": q, "publishid": "re"}, SCHEMA)
        # crashed attempt's intent planned TWO segments; replay stages ONE
        intent = os.path.join(q, "_publishes", "re=5.intent")
        os.makedirs(os.path.dirname(intent), exist_ok=True)
        with open(intent, "w") as f:
            _json.dump({"0": [[0, "deadbeefdeadbeef"], [1, "feedfacefeedface"]]}, f)
        msg = _stage_rows(q, SCHEMA, iter(rows))
        w.commit([msg], batchId=5)  # nothing linked -> re-plan, publish
        got = spark.read.format("orders_queue").option("path", q).load()
        assert got.count() == 6
        assert os.path.exists(os.path.join(q, "_publishes", "re=5.done"))

    with tempfile.TemporaryDirectory() as q:
        os.makedirs(os.path.join(q, "partition=0"))
        w = QueueStreamWriter({"path": q, "publishid": "re"}, SCHEMA)
        msg = _stage_rows(q, SCHEMA, iter(rows))
        # intent whose fingerprints don't match AND one link already
        # published -> ambiguous, must fail loudly
        intent = os.path.join(q, "_publishes", "re=6.intent")
        os.makedirs(os.path.dirname(intent), exist_ok=True)
        with open(intent, "w") as f:
            _json.dump({"0": [[0, "deadbeefdeadbeef"], [1, "feedfacefeedface"]]}, f)
        os.link(
            msg.files[0][1], os.path.join(q, "partition=0", "seq=00000000.parquet")
        )
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="already published"):
            w.commit([msg], batchId=6)


def test_stream_writer_link_collision_detected(spark):
    """FileExistsError on a planned offset is only idempotent when the
    existing segment IS this batch's content — a foreign writer's
    segment at the same offset raises instead of being adopted."""
    register_queue_source(spark)
    import json as _json

    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamWriter,
        _stage_rows,
    )

    with tempfile.TemporaryDirectory() as q:
        w = QueueStreamWriter({"path": q, "publishid": "col"}, SCHEMA)
        mine = spark.range(0, 4).select(
            F.col("id"), F.lit("mine").alias("payload"),
            F.lit(0).cast("int").alias("partition"),
        ).collect()
        theirs = spark.range(100, 104).select(
            F.col("id"), F.lit("theirs").alias("payload"),
            F.lit(0).cast("int").alias("partition"),
        )
        # a foreign writer already published seq=0
        from orders_currency_conversion_etl_spark.streaming.file_queue import (
            queue_append,
        )
        queue_append(theirs.drop("partition"), q, 0)
        msg = _stage_rows(q, SCHEMA, iter(mine))
        intent = os.path.join(q, "_publishes", "col=1.intent")
        os.makedirs(os.path.dirname(intent), exist_ok=True)
        with open(intent, "w") as f:
            _json.dump({"0": [[0, msg.files[0][3]]]}, f)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="collision"):
            w.commit([msg], batchId=1)


def test_source_reads_retained_and_compacted_queues(spark):
    """Interplay with the broker maintenance ops: after retention GC
    (leading segments deleted) and compaction (mid-log segments
    deleted, offsets preserved), the orders_queue source plans only
    the surviving segments — offsets stay monotonic, gaps are fine,
    and latestOffset never regresses below a fully GC'd partition's
    floor."""
    register_queue_source(spark)
    from orders_currency_conversion_etl_spark.streaming.file_queue import (
        queue_compact,
    )
    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamReader,
    )

    with tempfile.TemporaryDirectory() as q:
        _stage(spark, q, {0: 4, 1: 2})
        # retention: drop partition 0's first two segments
        deleted = queue_retain(q, {0: 2})
        assert deleted == {0: [0, 1]}
        got = spark.read.format("orders_queue").option("path", q).load()
        assert _rows(got) == _rows(read_queue_batch(spark, q, SCHEMA))
        assert got.count() == 40  # 2 surviving + 2 from partition 1

        # offset slicing still keyed on the ORIGINAL seq numbers
        sliced = (
            spark.read.format("orders_queue")
            .option("path", q)
            .option("startingOffsets", '{"0": 3, "1": 2}')
            .load()
        )
        assert sliced.count() == 10  # partition 0 seq 3 only

        # stream planning sees the floor: latest >= retained floor even
        # for a FULLY GC'd partition (log-start persisted)
        queue_retain(q, {1: 2})
        r = QueueStreamReader({"path": q})
        r.initialOffset()
        latest = r.latestOffset()
        assert latest["0"] == 4
        # partition 1 fully GC'd: no segments, but the source must not
        # report a regressed end once it has seen offsets
        assert latest.get("1", 0) in (0, 2)

    with tempfile.TemporaryDirectory() as q:
        # compaction: duplicate ids across segments; keep latest
        df_a = _segment_df(spark, 0, 0)
        queue_append(df_a, q, 0)
        queue_append(df_a.withColumn("payload", F.lit("new")), q, 0)
        stats = queue_compact(spark, q, ["id"])
        got = spark.read.format("orders_queue").option("path", q).load()
        assert got.count() == 10
        assert {r["payload"] for r in got.collect()} == {"new"}


def test_starting_offsets_latest(spark):
    """Kafka's default start position: a fresh query beginning at
    'latest' skips everything already committed and consumes only
    segments appended after it started."""
    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q, \
         tempfile.TemporaryDirectory() as ckpt, \
         tempfile.TemporaryDirectory() as out:
        _stage(spark, q, {0: 3, 1: 2})  # 50 pre-existing rows

        sq = (
            spark.readStream.format("orders_queue")
            .option("path", q)
            .option("startingOffsets", "latest")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

        def sink_count():
            try:
                return spark.read.schema(SCHEMA).parquet(out).count()
            except Exception:
                return 0

        try:
            # give the stream a moment to plan its first (empty) batch,
            # then append: only the new segment must arrive
            _poll(lambda: sq.lastProgress is not None, timeout_s=60)
            queue_append(_segment_df(spark, 0, 3), q, 0)
            _poll(lambda: sink_count() == 10)
        finally:
            sq.stop()
            sq.awaitTermination(30)
        got = spark.read.schema(SCHEMA).parquet(out)
        assert {r["payload"][:6] for r in got.collect()} == {"p0s3r3"}


def test_queue_gc_groups(spark):
    """Retention over commit-marker progress: the elementwise-min
    across groups governs, and a registered-but-never-committed group
    pins everything."""
    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamReader,
        queue_gc_groups,
    )

    register_queue_source(spark)
    with tempfile.TemporaryDirectory() as q:
        _stage(spark, q, {0: 3, 1: 2})
        # simulate two groups' engine commits directly
        ra = QueueStreamReader({"path": q, "group": "ga"})
        ra.commit({"0": 3, "1": 2})
        rb = QueueStreamReader({"path": q, "group": "gb"})
        rb.commit({"0": 1, "1": 2})

        # a group with no marker yet pins the queue
        assert queue_gc_groups(q, "ga", "gb", "never-started") == {}

        deleted = queue_gc_groups(q, "ga", "gb")
        assert deleted == {0: [0], 1: [0, 1]}
        # survivors: partition 0 seq 1,2 (gb only committed to 1)
        left = spark.read.format("orders_queue").option("path", q).load()
        assert left.count() == 20


def test_prune_publish_markers(spark):
    """Marker retention for the exactly-once sink: only markers below
    the keep-last horizon go, orphaned intents below it go with them,
    and other publishIds are untouched."""
    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        prune_publish_markers,
    )

    with tempfile.TemporaryDirectory() as q:
        d = os.path.join(q, "_publishes")
        os.makedirs(d)
        for b in range(10):
            open(os.path.join(d, f"conv={b}.done"), "w").write("published\n")
        open(os.path.join(d, "conv=3.intent"), "w").write("{}")
        open(os.path.join(d, "conv=9.intent"), "w").write("{}")
        open(os.path.join(d, "other=1.done"), "w").write("published\n")

        deleted = prune_publish_markers(q, "conv", keep_last=4)
        # horizon = batch 6: done 0-5 and the orphaned intent 3 go;
        # intent 9 (>= horizon, possibly in flight) and other= stay
        assert deleted == sorted(
            [f"conv={b}.done" for b in range(6)] + ["conv=3.intent"]
        )
        left = sorted(os.listdir(d))
        assert left == [
            "conv=6.done", "conv=7.done", "conv=8.done",
            "conv=9.done", "conv=9.intent", "other=1.done",
        ]
        # idempotent; and keep_last larger than history is a no-op
        assert prune_publish_markers(q, "conv", keep_last=4) == []
        assert prune_publish_markers(q, "other", keep_last=5) == []


def test_groupless_throttle_warns_loudly():
    """r15 (VERDICT r14 ask #5): maxSegmentsPerTrigger without a
    consumer group means the first micro-batch after every restart is
    UNCAPPED (no durable throttle base) — that trade must be an
    explicit choice, so the reader warns at construction. With a group
    (or without throttling) it stays silent."""
    import warnings

    from orders_currency_conversion_etl_spark.streaming.queue_source import (
        QueueStreamReader,
    )

    with pytest.warns(UserWarning, match="uncapped"):
        QueueStreamReader({"path": "/q", "maxsegmentspertrigger": "1"})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        QueueStreamReader(
            {"path": "/q", "maxsegmentspertrigger": "1", "group": "g"}
        )
        QueueStreamReader({"path": "/q"})
