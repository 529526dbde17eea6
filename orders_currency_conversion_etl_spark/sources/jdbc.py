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

These paths run LIVE against embedded Derby (shipped in Spark's jars)
in tests/test_jdbc_live.py — real driver, real pushdown subquery, real
batched inserts; only Postgres-dialect specifics stay unexercised in
this container.
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


def jdbc_idempotent_sink(
    url: str,
    table: str,
    key: str = "order_id",
    create_col_types: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
):
    """``foreachBatch`` sink with exactly-once EFFECT on an append-only
    JDBC target (the streaming version of the S6 anti-join redesign).

    Structured Streaming guarantees at-least-once delivery to
    ``foreachBatch``: after a crash the failed batch replays with the
    same id, and a plain append would duplicate whatever rows the torn
    attempt already committed. Instead each batch anti-joins against
    the sink's LIVE key set before appending, so replays insert only
    the missing rows — the same declarative idempotency that replaces
    the reference's FOR UPDATE + write-back UPDATE
    (dags/order_currency_conversion_dag.py:87-95,143-150).

    At scale the key-probe read should not scan the whole sink: the
    projection (key only) pushes into the database here; beyond that,
    prune with a predicate on a sink partition/time column (cf.
    incremental.unprocessed's watermark) or keep a tiny committed
    batch-id side table and skip whole batches. The table is created
    on first touch with reference-shaped column types.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        probe = f'(SELECT "{key}" FROM {table}) AS s'
        try:
            existing = (
                spark.read.format("jdbc").option("url", url).option("dbtable", probe).load()
            )
        except Exception:
            # first batch: target table does not exist yet
            writer = (
                batch_df.limit(0)
                .write.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
            )
            if create_col_types:
                writer = writer.option("createTableColumnTypes", create_col_types)
            writer.mode("overwrite").save()
            existing = None
        fresh = (
            batch_df
            if existing is None
            else batch_df.join(existing, on=key, how="left_anti")
        )
        jdbc_append(fresh, url, table, batch_size=batch_size)

    return _write
