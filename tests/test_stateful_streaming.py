"""applyInPandasWithState: per-user running totals across micro-batches
must converge to the batch-mode snapshot."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.sources import catalog
from orders_currency_conversion_etl_spark.streaming.events_stream import (
    read_events_stream,
    stage_events_as_stream_source,
)
from orders_currency_conversion_etl_spark.streaming.stateful import (
    snapshot_sink,
    user_running_totals_batch,
    user_running_totals_stream,
)

SF = "/root/testdata/sf0.001"


def _run_stateful(spark, work: str) -> str:
    stage = stage_events_as_stream_source(spark, SF, os.path.join(work, "stage"))
    out_dir = os.path.join(work, "out")
    q = (
        user_running_totals_stream(read_events_stream(spark, stage))
        .writeStream.outputMode("update")
        .foreachBatch(snapshot_sink(out_dir))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return os.path.join(out_dir, "batch=*")


def test_stateful_stream_converges_to_batch(spark):
    with tempfile.TemporaryDirectory() as work:
        snapshots = spark.read.parquet(_run_stateful(spark, work))
        # multiple micro-batches => several snapshots per user; the one
        # with max n_events is the final state (counts only grow).
        final = snapshots.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        batch = user_running_totals_batch(catalog.load_table(spark, SF, "events"))

        f = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()}
        b = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in batch.collect()}
        assert set(f) == set(b)
        mismatched = {u for u in f if f[u][0] != b[u][0]}
        assert not mismatched
        # totals can differ in float ULPs by accumulation order; counts
        # already match exactly, check totals within tolerance
        assert all(abs(f[u][1] - b[u][1]) < 1e-6 * max(1.0, abs(b[u][1])) for u in f)


def test_stateful_stream_processes_multiple_batches(spark):
    """State must actually carry across micro-batches: with 8 staged
    files at 2/trigger there are >=3 batches, so some user appears in
    more than one snapshot with growing counts."""
    with tempfile.TemporaryDirectory() as work:
        snapshots = spark.read.parquet(_run_stateful(spark, work))
        growth = (
            snapshots.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_snapshots"), F.max("n_events").alias("final_n"))
            .filter((F.col("n_snapshots") > 1))
        )
        assert growth.count() > 0


def _protobuf_works() -> bool:
    # transformWithStateInPandas talks to the state store over a
    # protobuf protocol; this container ships a broken google.protobuf
    # (namespace package without descriptor), which crashes the
    # streaming driver worker. Real clusters have the real dependency.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_works(),
    reason="google.protobuf broken in container; transformWithState needs it",
)
def test_transform_with_state_converges_to_batch(spark):
    """The Spark 4 transformWithStateInPandas twin must produce the
    same final per-user state as the applyInPandasWithState path and
    the batch snapshot."""
    import tempfile as _tf

    from orders_currency_conversion_etl_spark.streaming.stateful import (
        user_running_totals_tws,
    )

    with _tf.TemporaryDirectory() as work:
        stage = stage_events_as_stream_source(spark, SF, os.path.join(work, "stage"))
        out_dir = os.path.join(work, "out")
        q = (
            user_running_totals_tws(read_events_stream(spark, stage))
            .writeStream.outputMode("update")
            .foreachBatch(snapshot_sink(out_dir))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        snapshots = spark.read.parquet(os.path.join(out_dir, "batch=*"))
        final = snapshots.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        batch = user_running_totals_batch(catalog.load_table(spark, SF, "events"))
        f = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in final.collect()}
        b = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in batch.collect()}
        assert set(f) == set(b)
        assert all(f[u][0] == b[u][0] for u in f)
        assert all(abs(f[u][1] - b[u][1]) < 1e-6 * max(1.0, abs(b[u][1])) for u in f)
