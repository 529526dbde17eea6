"""JDBC source/sink helpers (ops S1, S4, S5).

The reference reads/writes Postgres through psycopg2 with hand-batched
inserts (reference: dags/order_currency_conversion_dag.py:87-95,126-135;
dags/order_generator_dag.py:81-91). The Spark-native equivalents below
push the same knobs through the JDBC data source:

- incremental predicate + projection pushdown: the WHERE/SELECT of the
  reference's locked scan become ``predicates``/``.select`` that Spark
  pushes into the remote query;
- ``partitionColumn/numPartitions``: the scan parallelizes across
  executors — the piece psycopg2 fundamentally can't do;
- ``batchsize=1000``: the reference's commit_every/chunksize.

No database exists in this container, so these helpers are exercised
only for plan construction in tests; the option plumbing is the
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_BATCH_SIZE = 1000  # reference: commit_every/chunksize=1000


def jdbc_scan_options(
    url: str,
    table: str,
    columns: tuple[str, ...],
    unprocessed_predicate: str = "processed_at IS NULL",
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Option map for the reference's incremental scan (S1), as a pure
    function so tests can assert the pushdown contract without a DB.

    The LIMIT/FOR UPDATE of the original cannot and should not be
    reproduced — idempotency comes from the anti-join redesign
    (operators/incremental.py, SURVEY §7.4) instead of row locks."""
    dbtable = f"(SELECT {', '.join(columns)} FROM {table} WHERE {unprocessed_predicate}) AS src"
    opts: dict[str, str] = {
        "url": url,
        "dbtable": dbtable,
        "fetchsize": str(DEFAULT_BATCH_SIZE),
    }
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound or 0),
            upperBound=str(upper_bound or 1 << 31),
        )
    opts.update(properties or {})
    return opts


def jdbc_incremental_reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Reader configured by :func:`jdbc_scan_options`."""
    return spark.read.format("jdbc").options(**jdbc_scan_options(**kwargs))


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched append sink (S4/S5): orders_eur / orders insert path."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .options(**(properties or {}))
        .mode("append")
        .save()
    )
