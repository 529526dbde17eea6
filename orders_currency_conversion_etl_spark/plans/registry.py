"""Named query registry — the engine's public query surface.

Every operator from SURVEY.md §2 that is "done" has an entry here:
``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame`` and
``ORACLES[name]`` is the equivalent ANSI SQL that DuckDB runs over the
same parquet (None for ops SQL genuinely can't express — the driver
then records a weaker rows-only check).

Numeric-parity ground rules (verified empirically, see SURVEY §4.3):
- compared outputs never round() a DOUBLE — always CAST to DECIMAL
  (bit-identical between Spark and DuckDB);
- aggregates over money cast to DECIMAL *before* SUM/AVG so results are
  exact and independent of partition/accumulation order;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.convert import convert_orders, orders_src_from_tpch
from ..sources import catalog
from ..sources.rates import (
    currency_alphabet_sql_list,
    rates_df,
    rates_sql_values,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: One batch timestamp for every deterministic run (SURVEY §4.4: one
#: conversion_time per batch; wall-clock is banned).
CONVERSION_TIME = dt.datetime(2026, 1, 1, 0, 0, 0)


def query(name: str, oracle: str | None):
    """Register a named query together with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship dataflow (SURVEY §2.1-§2.4: S1, P1-P6, J1, F1-F5)
# --------------------------------------------------------------------------

# The oracle mirrors orders_src_from_tpch + convert_orders exactly:
# derived currency, incremental IS NULL filter (keys with % 10 < 8 are
# unprocessed), broadcast left join, EUR/missing-rate passthrough,
# DOUBLE-division-then-DECIMAL-cast arithmetic.
_FLAGSHIP_ORACLE = f"""
WITH src AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
           'c' || CAST(o_custkey AS VARCHAR) || '@example.com' AS customer_email,
           o_orderdate AS order_date,
           CAST(o_totalprice AS DECIMAL(12,2)) AS amount,
           ({currency_alphabet_sql_list()})[CAST(o_orderkey % 25 AS INT) + 1] AS currency
    FROM orders
    WHERE (o_orderkey % 10) < 8
)
SELECT src.order_id,
       src.customer_email,
       src.order_date,
       src.amount AS original_amount,
       src.currency AS original_currency,
       CASE WHEN src.currency = 'EUR' THEN src.amount
            ELSE CAST(CAST(src.amount AS DOUBLE) / COALESCE(rates.rate, 1.0) AS DECIMAL(12,2))
       END AS amount_eur,
       CAST(COALESCE(rates.rate, 1.0) AS DECIMAL(16,6)) AS exchange_rate,
       TIMESTAMP '2026-01-01 00:00:00' AS exchange_rate_date
FROM src LEFT JOIN {rates_sql_values()} ON src.currency = rates.currency
"""


@query("flagship_conversion", _FLAGSHIP_ORACLE)
def flagship_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire hourly DAG as one shuffle-free Spark job."""
    src = orders_src_from_tpch(_t(spark, sf_dir, "orders"))
    return convert_orders(src, rates_df(spark), CONVERSION_TIME)


_INCREMENTAL_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders src
WHERE NOT EXISTS (
    SELECT 1 FROM orders snk
    WHERE snk.o_orderkey = src.o_orderkey AND (snk.o_orderkey % 10) >= 8
)
"""


@query("incremental_unprocessed", _INCREMENTAL_ORACLE)
def incremental_unprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op J3: anti-join unprocessed-detection — the Spark-native
    replacement for FOR UPDATE + write-back (SURVEY §7.4). The "sink"
    here is the processed slice of the same table (keys % 10 >= 8)."""
    from pyspark.sql import functions as F

    from ..operators.incremental import unprocessed

    orders = _t(spark, sf_dir, "orders")
    sink = orders.filter(F.col("o_orderkey") % 10 >= 8).select(
        F.col("o_orderkey").alias("order_id")
    )
    src = orders.withColumn("order_id", F.col("o_orderkey"))
    return unprocessed(src, sink, key="order_id").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
