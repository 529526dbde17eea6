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
