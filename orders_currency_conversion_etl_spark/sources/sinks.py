"""File sinks designed for the 100 TB read path.

- ``write_partitioned``: hive-style directory partitioning; queries
  filtering on the partition column read only matching directories
  (partition pruning — zero I/O for pruned data, visible in
  ``df.inputFiles()``).
- ``write_bucketed``: pre-shuffled, co-located layout. Two tables
  bucketed by the same key into the same bucket count join WITHOUT a
  shuffle — the exchange that dominates large-join cost disappears
  from the plan. This is the Spark-native equivalent of the reference
  keeping both Postgres tables keyed by order_id
  (reference: init/postgres-1/init.sql:2, init/postgres-2/init.sql:2).
- ``append_idempotent``: the anti-join append used by the incremental
  pipeline — re-running never duplicates rows (SURVEY §7.4's
  replacement for FOR UPDATE + write-back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Directory-partitioned parquet. Choose LOW-cardinality columns
    (status, date-bucket): each distinct tuple is a directory, and
    small-file explosion at high cardinality hurts more than pruning
    helps."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed external table (saveAsTable is required for bucketing —
    bucket metadata lives in the catalog). Joins/aggregations on
    ``bucket_col`` between tables with identical bucketing skip their
    shuffle entirely."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def append_idempotent(src: DataFrame, sink_df: DataFrame | None, key: str) -> DataFrame:
    """Rows of ``src`` not already present in the sink (by key) — the
    exactly-once append primitive. Caller writes the result with
    mode('append'); a crash before the write simply reprocesses the
    same delta on retry."""
    if sink_df is None:
        return src
    return src.join(sink_df.select(key), on=key, how="left_anti")
