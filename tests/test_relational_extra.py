"""Extra relational coverage: approx count-distinct accuracy, empty
short-circuit, lead/first windows, seeded generator query registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.plans.relational import (
    agg_approx_distinct,
    filter_empty_shortcircuit,
    generate_orders_seeded,
    window_lead_first,
)
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_tolerance(spark):
    """The query now self-reports the sketch-vs-exact bound (r6 exact
    oracle conversion): exact_customers must equal the true distinct
    count and every group's within_bound must hold."""
    got = {
        r.o_orderstatus: (r.exact_customers, r.within_bound)
        for r in agg_approx_distinct(spark, SF_SMOKE).collect()
    }
    exact = {
        r.o_orderstatus: r.exact
        for r in spark.read.parquet(SF_SMOKE + "/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for status, ex in exact.items():
        assert got[status][0] == ex, status
        assert got[status][1] is True, status


def test_empty_shortcircuit_is_empty_with_schema(spark):
    df = filter_empty_shortcircuit(spark, SF_SMOKE)
    assert df.count() == 0
    assert df.columns == ["o_orderkey", "o_orderstatus"]


def test_window_lead_first_semantics(spark):
    rows = window_lead_first(spark, SF_SMOKE).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    # within every customer, first_price is constant and equals the
    # first row's totalprice; last row's next_price is NULL
    for cust, rs in by_cust.items():
        firsts = {r.first_price for r in rs}
        assert len(firsts) == 1, cust
        assert sum(1 for r in rs if r.next_price is None) == 1, cust


def test_approx_percentile_within_tolerance(spark):
    from orders_currency_conversion_etl_spark.plans.relational_ext import (
        agg_approx_percentile,
    )

    got = {
        r.o_orderstatus: (float(r.exact_median), float(r.exact_p95), r.within_bound)
        for r in agg_approx_percentile(spark, SF_SMOKE).collect()
    }
    exact = {
        r.o_orderstatus: (r.m, r.p95)
        for r in spark.read.parquet(SF_SMOKE + "/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("m"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for status, (m, p95) in exact.items():
        em, ep, ok = got[status]
        assert abs(em - m) <= 1e-4 * max(1.0, abs(m)), status
        assert abs(ep - p95) <= 1e-4 * max(1.0, abs(p95)), status
        assert ok is True, status  # sketch within ±1% of exact


def test_sample_seeded_fraction_and_determinism(spark):
    from orders_currency_conversion_etl_spark.plans.relational_ext import sample_seeded

    total = spark.read.parquet(SF_SMOKE + "/orders.parquet").count()
    # same seed + same input partitioning => identical ROWS, not just
    # identical counts (two runs of the full query, value-compared)
    rows1 = {tuple(r) for r in sample_seeded(spark, SF_SMOKE).collect()}
    rows2 = {tuple(r) for r in sample_seeded(spark, SF_SMOKE).collect()}
    assert rows1 == rows2
    n1 = len(rows1)
    assert 0.05 * total <= n1 <= 0.2 * total  # Bernoulli(0.1) within tolerance


def test_generator_query_shape(spark):
    df = generate_orders_seeded(spark, SF_SMOKE)
    assert df.count() == 5000
    assert set(df.columns) >= {"order_id", "customer_email", "order_date", "amount", "currency"}
