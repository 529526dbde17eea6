"""LIVE JDBC round-trip over embedded Derby.

Spark's distribution ships the Derby embedded engine (pyspark/jars/
derby-10.16*.jar, present for Hive-metastore support), which means the
JDBC source/sink paths (SURVEY S1, S4/S5) and the anti-join
idempotency redesign (S6/J3) can be exercised against a REAL JDBC
driver + SQL engine — real pushdown subquery, real batched inserts,
real type round-trip — not just option-map assertions. This is the
closest in-sandbox approximation of the reference's two-Postgres
dataflow (reference: dags/order_currency_conversion_dag.py:87-95,
126-135; docker-compose.yaml's postgres pair).

Embedded Derby folds unquoted identifiers to UPPER CASE while Spark's
JDBC writer creates quoted lower-case columns, so the pushdown
subquery must quote identifiers — a genuine cross-dialect lesson the
option-map unit tests could never surface.
"""

from __future__ import annotations

import datetime as dt
import decimal

import pytest
from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.operators import incremental
from orders_currency_conversion_etl_spark.operators.convert import (
    convert_orders,
    orders_src_from_tpch,
)
from orders_currency_conversion_etl_spark.sources import catalog, jdbc
from orders_currency_conversion_etl_spark.sources.rates import (
    normalize_usd_rates_to_eur,
    rates_df,
)

SF = "/root/testdata/sf0.001"

#: Spark's Derby dialect maps StringType to CLOB, which Derby refuses in
#: equality predicates; the reference DDL uses bounded VARCHARs anyway
#: (init/postgres-1/init.sql:2-6).
_ORDERS_COL_TYPES = (
    "order_id VARCHAR(64), customer_email VARCHAR(255), currency VARCHAR(3)"
)
_EUR_COL_TYPES = (
    "order_id VARCHAR(64), customer_email VARCHAR(255), original_currency VARCHAR(3)"
)

#: Quoted-identifier projection for the incremental scan (S1): Spark's
#: writer quotes lower-case names, so the remote subquery must too.
_SRC_COLS = (
    '"order_id"',
    '"customer_email"',
    '"order_date"',
    '"amount"',
    '"currency"',
    '"created_at"',
    '"processed_at"',
)

_RATES = {"USD": 1.08, "GBP": 0.86, "JPY": 160.2, "EUR": 1.0}
_CONVERSION_TIME = dt.datetime(2024, 3, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def derby_urls(tmp_path_factory):
    base = tmp_path_factory.mktemp("derby")
    return (
        f"jdbc:derby:{base}/db1;create=true",
        f"jdbc:derby:{base}/db2;create=true",
    )


def _create_table(df, url: str, table: str, col_types: str) -> None:
    """CREATE TABLE with reference-shaped bounded VARCHARs, then load
    rows through the batched append sink (S4/S5)."""
    (
        df.limit(0)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("createTableColumnTypes", col_types)
        .mode("overwrite")
        .save()
    )
    jdbc.jdbc_append(df, url, table)


def _read_unprocessed(spark, url: str):
    """S1: incremental scan whose WHERE/SELECT run inside Derby."""
    return jdbc.jdbc_incremental_reader(
        spark,
        url=url,
        table="orders",
        columns=_SRC_COLS,
        unprocessed_predicate='"processed_at" IS NULL',
    ).load()


@pytest.fixture(scope="module")
def loaded_db1(spark, derby_urls):
    url1, _ = derby_urls
    src = orders_src_from_tpch(catalog.load_table(spark, SF, "orders"))
    _create_table(src, url1, "orders", _ORDERS_COL_TYPES)
    return url1, src


def test_live_incremental_scan_matches_parquet_predicate(spark, loaded_db1):
    url1, src = loaded_db1
    live = _read_unprocessed(spark, url1)
    expected = src.filter("processed_at IS NULL").count()
    assert live.count() == expected
    assert expected > 0
    # the pushdown really happened remotely: every fetched row is unprocessed
    assert live.filter("processed_at IS NOT NULL").count() == 0


def test_live_flagship_conversion_matches_parquet_path(spark, loaded_db1):
    """The full reference dataflow over live JDBC: scan db1, convert,
    append into db2.orders_eur, and the result rows are IDENTICAL to
    the parquet-source flagship path."""
    url1, src = loaded_db1
    url2 = url1.replace("db1", "db2")
    rates = rates_df(spark, normalize_usd_rates_to_eur(_RATES), _CONVERSION_TIME)

    converted = convert_orders(_read_unprocessed(spark, url1), rates, _CONVERSION_TIME)
    _create_table(converted, url2, "orders_eur", _EUR_COL_TYPES)

    sink = (
        spark.read.format("jdbc")
        .option("url", url2)
        .option("dbtable", '(SELECT * FROM orders_eur) AS s')
        .load()
    )
    expected = convert_orders(src, rates, _CONVERSION_TIME)
    got = {tuple(r) for r in sink.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want
    # money survived the DECIMAL(12,2) round-trip exactly
    assert all(isinstance(r[5], decimal.Decimal) for r in got)


def test_live_rerun_is_idempotent_via_anti_join(spark, loaded_db1):
    """S6/J3 against live tables: a re-run sees every id already in the
    sink and produces zero rows — the redesign that replaces the
    reference's FOR UPDATE + write-back UPDATE."""
    url1, _ = loaded_db1
    url2 = url1.replace("db1", "db2")
    source = _read_unprocessed(spark, url1)
    sink = (
        spark.read.format("jdbc")
        .option("url", url2)
        .option("dbtable", '(SELECT "order_id" FROM orders_eur) AS s')
        .load()
    )
    assert incremental.unprocessed(source, sink, key="order_id").count() == 0

    # and after new rows land in db1, ONLY those come back
    extra = source.limit(7).withColumn(
        "order_id", F.concat(F.lit("new-"), F.col("order_id"))
    )
    jdbc.jdbc_append(extra, url1, "orders")
    fresh = incremental.unprocessed(_read_unprocessed(spark, url1), sink, key="order_id")
    assert fresh.count() == 7


def test_streaming_conversion_into_live_jdbc_exactly_once(spark, derby_urls, tmp_path):
    """The reference's whole dataflow as a stream into a REAL database:
    orders arrive as a file stream, convert, land in Derby via the
    idempotent foreachBatch sink. A crash is injected AFTER a partial
    append of batch 1 (the torn non-transactional state a plain append
    sink cannot heal); on restart the batch replays and the anti-join
    inserts only the missing rows — final table equals the batch
    flagship exactly, no duplicates, no losses."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from orders_currency_conversion_etl_spark.streaming.orders_stream import (
        convert_stream,
        read_orders_stream,
        stage_orders_as_stream_source,
    )

    url = f"jdbc:derby:{tmp_path}/streamdb;create=true"
    stage = stage_orders_as_stream_source(spark, SF, str(tmp_path / "stage"))
    ckpt = str(tmp_path / "ckpt")
    inner = jdbc.jdbc_idempotent_sink(url, "orders_eur", create_col_types=_EUR_COL_TYPES)

    crashed = {"done": False}

    def crashing_sink(batch_df, batch_id):
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            # torn write: half the batch lands, checkpoint never commits
            inner(batch_df.limit(batch_df.count() // 2), batch_id)
            raise RuntimeError("injected crash mid-append")
        inner(batch_df, batch_id)

    def start(sink):
        return (
            convert_stream(read_orders_stream(spark, stage), spark, _CONVERSION_TIME)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crashing_sink)
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not surface")
    except StreamingQueryException:
        pass

    q2 = start(inner)
    q2.awaitTermination()

    sink_rows = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "(SELECT * FROM orders_eur) AS s")
        .load()
    )
    src = orders_src_from_tpch(catalog.load_table(spark, SF, "orders"))
    # convert_stream uses the default fixture rates — mirror it exactly
    want = {tuple(r) for r in convert_orders(src, rates_df(spark), _CONVERSION_TIME).collect()}
    got = [tuple(r) for r in sink_rows.collect()]
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_reference_ddl_types_roundtrip_exact(spark, tmp_path):
    """VERDICT r5 ask #8: round-trip the reference's exact DDL types
    (init/postgres-1/init.sql:1-9 / postgres-2/init.sql:1-11) through
    Derby's STRICTEST equivalents — bounded VARCHAR, DECIMAL(12,2) /
    DECIMAL(16,6), TIMESTAMP, UUID-as-VARCHAR(36) — and assert that
    every value, every Decimal scale, and the µs timestamp wall clock
    survive bit-for-bit. The dialect deltas this pins are documented
    at sources/jdbc.py::POSTGRES_DIALECT_NOTES."""
    import uuid

    url = f"jdbc:derby:{tmp_path}/ddldb;create=true"

    rows = [
        (
            str(uuid.UUID(int=7)),                       # order_id UUID
            "a@example.com",                             # customer_email VARCHAR(255)
            dt.datetime(2024, 3, 1, 12, 34, 56, 789123), # order_date TIMESTAMP (µs)
            decimal.Decimal("12345678.91"),              # original_amount DECIMAL(12,2)
            "JPY",                                       # original_currency VARCHAR(3)
            decimal.Decimal("0.01"),                     # amount_eur DECIMAL(12,2): min unit
            decimal.Decimal("160.200001"),               # exchange_rate DECIMAL(16,6)
            dt.datetime(2024, 2, 29, 23, 59, 59, 999999),# exchange_rate_date TIMESTAMP
            None,                                        # processed_at TIMESTAMP NULL
        ),
        (
            str(uuid.UUID(int=2**127)),
            "b@example.com",
            dt.datetime(1999, 12, 31, 0, 0, 0, 1),       # 1 µs after midnight
            decimal.Decimal("-0.99"),                    # negative money
            "USD",
            decimal.Decimal("9999999999.99"),            # DECIMAL(12,2) max
            decimal.Decimal("-1.000000"),
            dt.datetime(2024, 3, 1, 0, 0, 0),
            dt.datetime(2024, 3, 1, 12, 0, 0, 500000),
        ),
    ]
    schema = (
        "order_id string, customer_email string, order_date timestamp, "
        "original_amount decimal(12,2), original_currency string, "
        "amount_eur decimal(12,2), exchange_rate decimal(16,6), "
        "exchange_rate_date timestamp, processed_at timestamp"
    )
    src = spark.createDataFrame(rows, schema)

    col_types = (
        "order_id VARCHAR(36), customer_email VARCHAR(255), "
        "order_date TIMESTAMP, original_amount DECIMAL(12,2), "
        "original_currency VARCHAR(3), amount_eur DECIMAL(12,2), "
        "exchange_rate DECIMAL(16,6), exchange_rate_date TIMESTAMP, "
        "processed_at TIMESTAMP"
    )
    _create_table(src, url, "orders_eur_ddl", col_types)

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", '(SELECT * FROM orders_eur_ddl) AS s')
        .load()
    )
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want
    # scales declared in the DDL are the scales read back (no float transit)
    by_name = dict(back.dtypes)
    assert by_name["original_amount"] == "decimal(12,2)"
    assert by_name["exchange_rate"] == "decimal(16,6)"
    g = got[0]
    assert isinstance(g[3], decimal.Decimal) and g[3].as_tuple().exponent == -2
    assert isinstance(g[6], decimal.Decimal) and g[6].as_tuple().exponent == -6


def test_postgres_dialect_ddl_matches_reference_types(spark):
    """Strengthen the closed-by-proxy Postgres gap (r11): without a
    live Postgres, pin the DDL column types Spark's OWN PostgresDialect
    (the code path a real cluster would execute) emits for the
    reference's orders_eur schema, next to the reference DDL they must
    interoperate with (init/postgres-2/init.sql:1-11).

    - DECIMAL(12,2)/(16,6) map verbatim — exact decimal transit both
      directions, the property test_reference_ddl_types_roundtrip_exact
      proves against Derby.
    - TIMESTAMP maps verbatim.
    - StringType maps to TEXT unless createTableColumnTypes overrides —
      which is exactly why jdbc_idempotent_sink writes explicit values
      and why the UUID column is declared VARCHAR(36) in our sink DDL
      (a string UUID round-trips bit-identically; Postgres would also
      accept it into a native UUID column on insert)."""
    jvm = spark._jvm
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://host/db")
    assert dialect.getClass().getName().endswith("PostgresDialect")
    DT = jvm.org.apache.spark.sql.types.DataType

    def pg_type(simple: str) -> str:
        dt = DT.fromJson(f'"{simple}"')
        opt = dialect.getJDBCType(dt)
        if opt.isDefined():
            return opt.get().databaseTypeDefinition()
        common = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(dt)
        assert common.isDefined(), f"no JDBC mapping for {simple}"
        return common.get().databaseTypeDefinition()

    # reference orders_eur columns -> what Spark would CREATE on Postgres.
    # NUMERIC is Postgres's exact alias for DECIMAL (same type OID), so
    # the reference's DECIMAL(12,2) columns and Spark's emitted DDL are
    # the identical exact type.
    assert pg_type("decimal(12,2)") == "NUMERIC(12,2)"   # original_amount / amount_eur
    assert pg_type("decimal(16,6)") == "NUMERIC(16,6)"   # exchange_rate
    # Spark's TimestampType carries instant semantics, so the dialect
    # maps it to TIMESTAMP WITH TIME ZONE; the reference's plain
    # TIMESTAMP (without time zone) is what Spark's timestamp_ntz maps
    # to. Appends into the reference's EXISTING plain-TIMESTAMP columns
    # transit java.sql.Timestamp wall clocks, and this repo pins every
    # session to UTC (session.py), so the instant/wall-clock
    # distinction cannot produce a value difference on either type.
    assert pg_type("timestamp") == "TIMESTAMP WITH TIME ZONE"
    assert pg_type("timestamp_ntz") == "TIMESTAMP"       # the reference DDL's type
    assert pg_type("string") == "TEXT"                   # customer_email / currency (VARCHAR in ref DDL:
    # interoperable — TEXT and VARCHAR(n) compare equal in Postgres; writes
    # into a pre-created VARCHAR(255) column are unaffected because the
    # sink appends to the reference's existing tables, never re-creates)
