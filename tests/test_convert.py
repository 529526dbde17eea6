"""Golden + property tests for the flagship conversion (SURVEY §5.2-5.3)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark import schemas
from orders_currency_conversion_etl_spark.operators.convert import convert_orders
from orders_currency_conversion_etl_spark.operators.generate import generate_orders
from orders_currency_conversion_etl_spark.operators.incremental import unprocessed
from orders_currency_conversion_etl_spark.sources.rates import (
    normalize_usd_rates_to_eur,
    rates_df,
)

TS = dt.datetime(2026, 1, 1)


def _src(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.ORDERS_SRC)


def _row(order_id, amount, currency, processed_at=None):
    return (
        order_id,
        f"{order_id}@example.com",
        dt.datetime(2025, 12, 25),
        Decimal(amount),
        currency,
        dt.datetime(2025, 12, 25),
        processed_at,
    )


def test_golden_edge_rows(spark):
    """EUR passthrough, missing-rate passthrough, USD conversion —
    reference semantics at dags/order_currency_conversion_dag.py:105-110."""
    rates = rates_df(spark, {"EUR": 1.0, "USD": 2.0, "GBP": 0.8})
    src = _src(
        spark,
        [
            _row("eur1", "100.33", "EUR"),
            _row("unknown1", "55.55", "ZZZ"),
            _row("usd1", "100.01", "USD"),
            _row("gbp1", "100.00", "GBP"),
            _row("done1", "10.00", "USD", dt.datetime(2025, 12, 26)),
        ],
    )
    out = {r["order_id"]: r for r in convert_orders(src, rates, TS).collect()}

    assert "done1" not in out  # processed rows are filtered (incremental contract)
    assert out["eur1"]["amount_eur"] == Decimal("100.33")  # EUR identity, unrounded
    assert out["eur1"]["exchange_rate"] == Decimal("1.000000")
    assert out["unknown1"]["amount_eur"] == Decimal("55.55")  # missing rate -> 1.0
    assert out["unknown1"]["exchange_rate"] == Decimal("1.000000")
    assert out["usd1"]["amount_eur"] == Decimal("50.01")  # 100.01/2.0 = 50.005 -> HALF_UP cast
    assert out["gbp1"]["amount_eur"] == Decimal("125.00")
    assert out["gbp1"]["original_amount"] == Decimal("100.00")
    assert out["gbp1"]["original_currency"] == "GBP"
    assert out["gbp1"]["exchange_rate_date"] == TS


def test_output_schema(spark):
    out = convert_orders(_src(spark, [_row("a", "1.00", "EUR")]), rates_df(spark), TS)
    assert [f.name for f in out.schema.fields] == [f.name for f in schemas.ORDERS_EUR.fields]
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in schemas.ORDERS_EUR.fields
    ]


def test_normalize_usd_rates():
    """F4: rebase USD rates to EUR; EUR becomes exactly 1.0
    (reference: ...conversion_dag.py:58-60)."""
    out = normalize_usd_rates_to_eur({"USD": 1.0, "EUR": 0.5, "JPY": 150.0})
    assert out["EUR"] == 1.0
    assert out["USD"] == 2.0
    assert out["JPY"] == 300.0


def test_conservation_and_idempotency(spark):
    """Every unprocessed source row appears exactly once in the target;
    re-running over (source, sink) adds nothing (SURVEY §5.3)."""
    src = generate_orders(spark, n=500, seed=7)
    out = convert_orders(src, rates_df(spark), TS)
    assert out.count() == 500
    assert out.select("order_id").distinct().count() == 500

    remaining = unprocessed(src, out.select("order_id"))
    assert remaining.count() == 0  # second run would process nothing


def test_inverse_within_rounding(spark):
    """amount_eur * rate reconstructs amount within 1 cent * rate."""
    src = generate_orders(spark, n=300, seed=11)
    out = convert_orders(src, rates_df(spark), TS)
    bad = out.filter(
        F.abs(
            F.col("amount_eur").cast("double") * F.col("exchange_rate").cast("double")
            - F.col("original_amount").cast("double")
        )
        > 0.011 * F.col("exchange_rate").cast("double")
    )
    assert bad.count() == 0
