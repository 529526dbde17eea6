"""Sources: HTTP rates with daily memo, JDBC plumbing, incremental
write-back surrogate, generator determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.operators.generate import generate_orders
from orders_currency_conversion_etl_spark.operators.incremental import mark_processed
from orders_currency_conversion_etl_spark.sources.http_rates import (
    DailyMemo,
    get_currencies,
    get_exchange_rates,
)
from orders_currency_conversion_etl_spark.sources.jdbc import jdbc_scan_options

TODAY = dt.date(2026, 1, 1)


def test_rates_fetch_normalizes_and_memoizes(tmp_path):
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return {"rates": {"USD": 1.0, "EUR": 0.5, "JPY": 150.0}}

    memo = DailyMemo(str(tmp_path / "memo.json"))
    r1 = get_exchange_rates("http://x/latest.json", TODAY, memo, fake_fetch)
    r2 = get_exchange_rates("http://x/latest.json", TODAY, memo, fake_fetch)
    assert r1 == {"USD": 2.0, "EUR": 1.0, "JPY": 300.0}
    assert r2 == r1
    assert len(calls) == 1  # second hit served from the daily memo

    # next day: cache stale, refetches
    get_exchange_rates("http://x/latest.json", TODAY + dt.timedelta(days=1), memo, fake_fetch)
    assert len(calls) == 2


def test_rates_fetch_requires_eur():
    with pytest.raises(ValueError):
        get_exchange_rates("u", TODAY, None, lambda u: {"rates": {"USD": 1.0}})
    with pytest.raises(ValueError):
        get_exchange_rates("u", TODAY, None, lambda u: {})


def test_currencies_memoized(tmp_path):
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return {"USD": "US Dollar", "EUR": "Euro"}

    memo = DailyMemo(str(tmp_path / "memo.json"))
    assert get_currencies("u", TODAY, memo, fake_fetch) == ["EUR", "USD"]
    assert get_currencies("u", TODAY, memo, fake_fetch) == ["EUR", "USD"]
    assert len(calls) == 1


def test_jdbc_reader_composes_pushdown():
    """No DB here — assert the scan is configured with the pushed-down
    projection + incremental predicate + partitioned-scan options."""
    opts = jdbc_scan_options(
        url="jdbc:postgresql://db:5432/orders",
        table="orders",
        columns=("order_id", "amount", "currency"),
        partition_column="created_epoch",
        num_partitions=16,
    )
    assert "processed_at IS NULL" in opts["dbtable"]
    assert "order_id, amount, currency" in opts["dbtable"]
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "1000"


def test_mark_processed_stamps_only_batch(spark):
    src = generate_orders(spark, n=100, seed=3)
    batch = src.limit(40).select("order_id")
    ts = F.lit(dt.datetime(2026, 1, 2)).cast("timestamp")
    marked = mark_processed(src, batch, key="order_id", ts_col=ts)
    assert marked.filter(F.col("processed_at").isNotNull()).count() == 40
    assert marked.count() == 100


def test_generator_is_deterministic(spark):
    a = generate_orders(spark, n=200, seed=9).collect()
    b = generate_orders(spark, n=200, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ids = {r.order_id for r in a}
    assert len(ids) == 200  # unique uuid-format ids
    assert all("@example.com" in r.customer_email for r in a)
