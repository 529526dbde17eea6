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


class _FakeValueState:
    """Minimal ValueState double: exists/get/update, like
    pyspark.sql.streaming.stateful_processor.ValueState."""

    def __init__(self):
        self._v = None
        self._set = False

    def exists(self) -> bool:
        return self._set

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)
        self._set = True


class _FakeHandle:
    """StatefulProcessorHandle double that validates the DDL schema
    string the same way Spark does (StructType.fromDDL)."""

    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        from pyspark.sql.types import StructType

        parsed = StructType.fromDDL(schema)  # raises on a bad DDL string
        st = _FakeValueState()
        self.states[name] = (parsed, st)
        return st


def test_tws_processor_logic_matches_batch(spark):
    """Drive RunningTotalsProcessor's init/handleInputRows directly
    (fake handle, multi-micro-batch feed) and assert it converges to
    the batch snapshot. This covers everything of OURS in the
    transformWithState twin — the DDL state schema string, the
    exists/get/update protocol, the handleInputRows signature and
    snapshot output — without the streaming transport, which needs
    google.protobuf in the Python worker (absent in this container;
    the gated e2e test below covers it on real clusters)."""
    import pandas as pd

    from pyspark.sql.types import StructType

    from orders_currency_conversion_etl_spark.streaming.stateful import (
        TWS_STATE_DDL,
        RunningTotalsProcessor,
    )

    proc = RunningTotalsProcessor()
    handle = _FakeHandle()
    proc.init(handle)
    assert "totals" in handle.states
    parsed, _ = handle.states["totals"]
    assert parsed == StructType.fromDDL("n_events BIGINT, total_value DOUBLE")
    assert TWS_STATE_DDL == "n_events BIGINT, total_value DOUBLE"

    events = catalog.load_table(spark, SF, "events").select("user_id", "value").toPandas()
    # Simulate 3 micro-batches per user, rows arriving in event order.
    finals = {}
    for user_id, pdf in events.groupby("user_id"):
        user_proc = RunningTotalsProcessor()
        user_proc.init(_FakeHandle())
        chunks = [pdf.iloc[i::3] for i in range(3)]  # 3 "micro-batches"
        for chunk in chunks:
            if chunk.empty:
                continue
            # Spark may hand each batch as an iterator of several Arrow
            # slices — feed two per batch to exercise the inner loop.
            half = len(chunk) // 2
            out = list(
                user_proc.handleInputRows(
                    (user_id,), iter([chunk.iloc[:half], chunk.iloc[half:]]), None
                )
            )
            assert len(out) == 1 and isinstance(out[0], pd.DataFrame)
        finals[user_id] = (
            int(out[0]["n_events"].iloc[0]),
            float(out[0]["total_value"].iloc[0]),
        )

    batch = user_running_totals_batch(catalog.load_table(spark, SF, "events"))
    b = {r.user_id: (r.n_events, r.total_value) for r in batch.collect()}
    assert set(finals) == set(b)
    assert all(finals[u][0] == b[u][0] for u in finals)
    assert all(
        abs(finals[u][1] - b[u][1]) < 1e-6 * max(1.0, abs(b[u][1])) for u in finals
    )


def _protobuf_works() -> bool:
    # transformWithStateInPandas talks to the state store over a
    # protobuf protocol; this container has no importable
    # google.protobuf at all, which crashes the streaming worker.
    # Real clusters have the real dependency.
    #
    # Lift attempt (round 4), documented dead end:
    #   - pip download protobuf: the index host does not resolve
    #     (network-isolated container) -> "No matching distribution".
    #   - no protobuf wheel/sdist anywhere on disk (find / confirmed),
    #     pip cache empty.
    #   - the only protobuf source on disk is the google-cloud-sdk
    #     vendored pure-python copy at
    #     /usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/
    #     protobuf (__version__ 4.23.2, imports rewritten to
    #     cloudsdk.google.*). pyspark 4.1.2's generated
    #     sql/streaming/proto/StateMessage_pb2.py requires runtime
    #     >= 6.33.0 (ValidateProtobufRuntimeVersion PUBLIC 6,33,0) and
    #     imports google.protobuf.runtime_version, which does not
    #     exist before protobuf 5.27 — shimming the 4.23 copy under
    #     the google.protobuf name fails at import, two majors short.
    # The container genuinely cannot run this path; the processor
    # protocol itself is covered transport-free by
    # test_tws_processor_logic_matches_batch above.
    try:
        from google.protobuf import descriptor  # noqa: F401
        from google.protobuf import runtime_version  # noqa: F401

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
