"""Vectorized pandas UDF surface: scalar UDF correctness vs the JVM
expression, UDAF vs numpy ground truth."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.functions.pandas_fn import (
    log1p_price,
    pandas_udf_geomean,
)
from orders_currency_conversion_etl_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def test_scalar_pandas_udf_matches_jvm_expression(spark):
    o = catalog.load_table(spark, SF, "orders").limit(500)
    both = o.select(
        log1p_price("o_totalprice").alias("udf"),
        F.log1p("o_totalprice").alias("jvm"),
    ).collect()
    assert all(math.isclose(r.udf, r.jvm, rel_tol=1e-12) for r in both)


def test_geomean_udaf_matches_numpy(spark):
    rows = pandas_udf_geomean(spark, SF).collect()
    orders = catalog.load_table(spark, SF, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).collect()
    by_status: dict[str, list[float]] = {}
    for r in orders:
        by_status.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for r in rows:
        expect = float(np.exp(np.log(np.array(by_status[r.o_orderstatus])).mean()))
        assert math.isclose(float(r.geo_mean_price), expect, rel_tol=1e-4)
