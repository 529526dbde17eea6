"""Pipeline observability: df.observe metrics on the flagship path —
the engine's replacement for the reference DAG's "Processed N orders"
result message (dags/order_currency_conversion_dag.py:159), computed
executor-side during the consuming action instead of by a second
count() scan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.operators.convert import (
    convert_orders_observed,
    orders_src_from_tpch,
)
from orders_currency_conversion_etl_spark.sources import catalog
from orders_currency_conversion_etl_spark.sources.rates import DEFAULT_EUR_RATES, rates_df
from tests.conftest import SF_SMOKE


def test_observed_metrics_match_recomputation(spark):
    src = orders_src_from_tpch(catalog.load_table(spark, SF_SMOKE, "orders"))
    rates = rates_df(spark, DEFAULT_EUR_RATES)
    t = dt.datetime(2026, 1, 2, 3, 4, 5)
    df, obs = convert_orders_observed(src, rates, t, batch_limit=None)

    rows = df.collect()  # the action that populates the observation
    got = obs.get
    assert got["processed_orders"] == len(rows)
    assert got["eur_passthrough"] == sum(1 for r in rows if r.original_currency == "EUR")
    assert got["total_amount_eur"] == sum(
        (r.amount_eur for r in rows), start=rows[0].amount_eur * 0
    )
    assert got["processed_orders"] > 0
