"""Flagship operator: order currency conversion to EUR.

Re-expresses the reference's row-at-a-time conversion loop (reference:
dags/order_currency_conversion_dag.py:105-124) as a shuffle-free Spark
plan:

    orders ──filter/limit──▶ BROADCAST HASH JOIN (currency) ──▶ select
                                      ▲
                    rates (~170 rows, broadcast, never shuffled)

Semantics preserved exactly (SURVEY §4.4):
- missing rate => 1.0 passthrough (reference: ...conversion_dag.py:108)
  — hence a LEFT join + coalesce, not an inner join;
- EUR short-circuit: amount_eur = amount unrounded, rate 1.0
  (reference: ...conversion_dag.py:106-107);
- one conversion_time per batch stamps exchange_rate_date
  (reference: ...conversion_dag.py:74,116) — passed as a parameter for
  determinism, never wall-clock;
- money stays DecimalType; the quotient is computed in DOUBLE and cast
  to DECIMAL(12,2), which (verified empirically) is bit-identical
  between Spark and DuckDB, unlike round() on doubles (SURVEY §4.3).

At 100 TB: the only wide operation here would be the join, and it is a
broadcast — the plan stays narrow end-to-end, scaling linearly with
input splits. No Python executes per row.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.rates import currency_from_orderkey

#: Select list of the source scan (reference: ...conversion_dag.py:88).
SRC_COLUMNS = ("order_id", "customer_email", "order_date", "amount", "currency")


def orders_src_from_tpch(orders: DataFrame) -> DataFrame:
    """Adapt the synthetic TPC-H-ish ``orders`` table to the reference's
    source-orders shape (FIXTURES.md A1) with a deterministic currency.

    order_id       <- o_orderkey as string (reference PK is a UUID; any
                      unique string key has the same join/dedup behavior)
    customer_email <- synthesized from o_custkey (reference generator
                      pattern at dags/order_generator_dag.py:67)
    amount         <- o_totalprice cast DECIMAL(12,2)
    currency       <- alphabet[o_orderkey % 25] — deterministic, hits the
                      EUR, listed, and unlisted-rate code paths
    processed_at   <- NULL for o_orderkey % 10 < 8, else o_orderdate
                      (so incremental queries see both states)
    """
    return orders.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string"), F.lit("@example.com")).alias(
            "customer_email"
        ),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("amount"),
        currency_from_orderkey(F.col("o_orderkey")).alias("currency"),
        F.col("o_orderdate").alias("created_at"),
        F.when(F.col("o_orderkey") % 10 < 8, F.lit(None).cast("timestamp"))
        .otherwise(F.col("o_orderdate"))
        .alias("processed_at"),
    )


def _amount_eur(amount: Column, currency: Column, rate: Column) -> Column:
    """amount / rate in DOUBLE, cast back to DECIMAL(12,2).

    The EUR branch returns the amount unrounded (identical to dividing
    by the normalized EUR rate of exactly 1.0) — reference:
    dags/order_currency_conversion_dag.py:106-109.

    Cross-engine boundary note (cf. join_asof_rates, which needed the
    scaled-integer convention): a double-quotient -> DECIMAL(12,2)
    cast diverges between engines only when the quotient's shortest
    repr lands exactly on a half-cent. That needs cents/rate to sit
    within ~1 ulp of the 0.005 grid, which "clean" rates like 26/25
    reach systematically but the 6-decimal fixture rates here
    (1.094571, ...) cannot — their reduced fractions have no matching
    2/5 factors, so hits are ~1e-9/row random, and the missing-rate
    (exactly 1.0) and EUR paths divide exactly. Verified by the full
    sf0.1/sf1 sweeps (ORACLE_SWEEP_*.json).
    """
    eff_rate = F.coalesce(rate, F.lit(1.0))
    converted = (amount.cast("double") / eff_rate).cast("decimal(12,2)")
    return F.when(currency == "EUR", amount).otherwise(converted)


def convert_orders(
    orders_src: DataFrame,
    rates: DataFrame,
    conversion_time: dt.datetime,
    batch_limit: int | None = None,
) -> DataFrame:
    """The flagship dataflow: unprocessed orders -> EUR-enriched rows.

    Mirrors reference: dags/order_currency_conversion_dag.py:87-124 —
    incremental IS NULL filter + optional LIMIT, broadcast lookup join,
    conversion arithmetic, final 8-column projection into the
    ``orders_eur`` shape (init/postgres-2/init.sql:1-11).
    """
    src = orders_src.filter(F.col("processed_at").isNull()).select(*SRC_COLUMNS)
    if batch_limit is not None:
        src = src.limit(batch_limit)

    rate_lookup = rates.select("currency", "rate")
    joined = src.join(F.broadcast(rate_lookup), on="currency", how="left")

    eff_rate = F.coalesce(F.col("rate"), F.lit(1.0))
    return joined.select(
        F.col("order_id"),
        F.col("customer_email"),
        F.col("order_date"),
        F.col("amount").alias("original_amount"),
        F.col("currency").alias("original_currency"),
        _amount_eur(F.col("amount"), F.col("currency"), F.col("rate")).alias("amount_eur"),
        F.when(F.col("currency") == "EUR", F.lit(1.0))
        .otherwise(eff_rate)
        .cast("decimal(16,6)")
        .alias("exchange_rate"),
        F.lit(conversion_time).cast("timestamp").alias("exchange_rate_date"),
    )


def convert_orders_observed(
    orders_src: DataFrame,
    rates: DataFrame,
    conversion_time: dt.datetime,
    batch_limit: int | None = None,
):
    """convert_orders + pipeline metrics via ``df.observe`` — the
    Spark-native replacement for the reference's driver-side result
    message and row-count logging (reference:
    dags/order_currency_conversion_dag.py:159 returns "Processed N
    orders", :97-99 logs the empty-batch case).

    ``observe`` accumulates the metrics ON THE EXECUTORS during the
    action that consumes the DataFrame — no second scan, no collect,
    correct at any scale (a separate ``df.count()`` for logging would
    re-run the whole plan). Returns ``(df, observation)``; read
    ``observation.get`` after an action has run.
    """
    from pyspark.sql import Observation

    df = convert_orders(orders_src, rates, conversion_time, batch_limit)
    obs = Observation("conversion_metrics")
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("processed_orders"),
        F.count_if(F.col("original_currency") == "EUR").alias("eur_passthrough"),
        F.sum(F.col("amount_eur")).alias("total_amount_eur"),
    )
    return df, obs
