"""Custom stateful streaming operator (SURVEY T1 extension): per-user
running totals via ``applyInPandasWithState``.

This is the Spark-native shape for operators the built-in windowed
aggregations can't express — arbitrary per-key state carried across
micro-batches, Arrow-batched into pandas on the executor. State lives
in the state store (RocksDB/HDFS-backed on a cluster), partitioned by
the grouping key: at 100 TB the state shuffles once per batch on
user_id and each executor holds only its key range.

The same function body runs in batch mode through ``applyInPandas``
(state starts empty, one "batch" covers everything), which is what the
deterministic test twin uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (count, total) carried across micro-batches per user.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the running state and
    emit the updated snapshot. Pure and deterministic: same rows in =>
    same state out, so checkpoint replay is safe."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming: per-user state across micro-batches, update mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def snapshot_sink(out_dir: str):
    """foreachBatch sink for update-mode snapshots: each micro-batch's
    updated rows land in their own batch=N subdirectory (idempotent on
    replay — same reasoning as events_stream.foreach_batch_dual_sink).
    Needed because file sinks only support append mode."""
    import os

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    return _write


def user_running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the whole input is one 'micro-batch' with empty
    initial state — the end-state snapshot per user."""

    def _one_shot(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [float(pdf["value"].sum())],
            }
        )

    return events.groupBy("user_id").applyInPandas(_one_shot, schema=OUTPUT_SCHEMA)


# --------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin of the same operator
# --------------------------------------------------------------------------


#: DDL string for the named ValueState — parsed by Spark into the state
#: store schema; tests assert it parses to {n_events BIGINT,
#: total_value DOUBLE} via StructType.fromDDL.
TWS_STATE_DDL = "n_events BIGINT, total_value DOUBLE"


def _stateful_processor_base() -> type:
    """The Spark 4 StatefulProcessor ABC, or ``object`` when the API
    surface is absent — importing this module must never hard-depend
    on it (the class's own methods are the whole contract we use)."""
    try:
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        return StatefulProcessor
    except ImportError:  # pragma: no cover - Spark 4 always has it
        return object


class RunningTotalsProcessor(_stateful_processor_base()):
    """transformWithStateInPandas processor: per-user (count, total)
    as a named, typed ValueState.

    Module-level (not closure-local) so its logic is unit-testable
    against a fake handle without the streaming transport: the
    end-to-end stream needs google.protobuf in the Python worker,
    which this container lacks, so
    tests/test_stateful_streaming.py::test_tws_processor_logic_matches_batch
    drives init/handleInputRows directly (DDL schema string,
    exists/get/update protocol, snapshot output) and the protobuf-gated
    e2e test covers the transport on real clusters."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", TWS_STATE_DDL)

    def handleInputRows(self, key, rows, timerValues):
        state = self._totals.get() if self._totals.exists() else None
        n, total = (int(state[0]), float(state[1])) if state else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on Spark 4's arbitrary-state
    API (`transformWithStateInPandas`): state is a named, typed
    ValueState in the state store instead of a single opaque tuple —
    the successor API to applyInPandasWithState, with composable state
    variables, TTL, and timers. Kept semantically identical to
    `_update_user_totals` so both twins converge to the same batch
    snapshot (asserted in tests/test_stateful_streaming.py)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
