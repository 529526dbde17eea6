"""Skew-mitigation bench: measured evidence, not plan assertions.

Runs the orders-by-lineitem fact-to-fact join + aggregation four ways
and prints one JSON line (recorded in SCALE.md §Skew):

  uniform        — unskewed sf1 lineitem, plain shuffle join (the
                   reference time everything is judged against)
  skew_plain     — skewed lineitem (30% of rows on one l_orderkey),
                   AQE skew-join OFF, no salting: the straggler
  skew_aqe       — same data, AQE skew-join ON (Spark's runtime fix)
  skew_salted    — same data, AQE OFF, explicit two-sided salted join
                   (operators/skew.py:salted_fact_join)

Pass criterion (VERDICT r3 ask #5): skew_salted <= ~1.2x uniform while
skew_plain demonstrably degrades.

Sort-merge joins are forced (autoBroadcastJoinThreshold=-1): orders at
sf1 is ~20 MB and would otherwise broadcast, which dodges the skewed
shuffle this bench exists to measure — at 100 TB neither side
broadcasts.

Usage: python scripts/make_sf1.py && python scripts/make_skew.py &&
       python scripts/bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.operators.skew import (  # noqa: E402
    detect_hot_keys,
    salted_fact_join,
)
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(REPO, ".localdata", "sf1")
SKEW = os.path.join(REPO, ".localdata", "skew")
RUNS = 3


def _agg(joined):
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("decimal(38,4)")
        .alias("revenue"),
    )


def _tables(spark, data_dir):
    li = spark.read.parquet(os.path.join(data_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    orders = (
        spark.read.parquet(os.path.join(data_dir, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    return li, orders


def plain(spark, data_dir):
    li, orders = _tables(spark, data_dir)
    return _agg(li.join(orders, on="l_orderkey"))


def salted(spark, data_dir, hot):
    # hot keys are an INPUT here: at 100 TB they come from table
    # statistics or a once-per-pipeline pre-pass, amortized across
    # every query over the table — detect_hot_keys' one agg job is
    # timed separately (detect_sec), not inside every join.
    li, orders = _tables(spark, data_dir)
    return _agg(
        salted_fact_join(
            li,
            orders,
            "l_orderkey",
            hot,
            salt_source=["l_linenumber", "l_extendedprice", "l_discount"],
        )
    )


def timed(spark, build, aqe_skew: bool) -> float:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    build().write.mode("overwrite").format("noop").save()  # warmup
    best = float("inf")
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    for d in (SF1, SKEW):
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d}; run make_sf1.py / make_skew.py first")
    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's skew split never fires with cluster-scale defaults on a
    # laptop-scale fixture: the hot partition is ~50 MB, far below the
    # 256 MB skewedPartitionThresholdInBytes. Scale the thresholds to
    # the rig the same way a 100 TB deployment scales them to its
    # shuffle sizes (factor 5 stays default; median partition ~4 MB).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    t0 = time.perf_counter()
    hot = detect_hot_keys(_tables(spark, SKEW)[0], "l_orderkey")
    detect_sec = round(time.perf_counter() - t0, 3)

    result = {
        "uniform": timed(spark, lambda: plain(spark, SF1), aqe_skew=False),
        "skew_plain": timed(spark, lambda: plain(spark, SKEW), aqe_skew=False),
        "skew_aqe": timed(spark, lambda: plain(spark, SKEW), aqe_skew=True),
        "skew_salted": timed(spark, lambda: salted(spark, SKEW, hot), aqe_skew=False),
        "detect_sec": detect_sec,
        "hot_keys": hot,
    }
    result["salted_vs_uniform"] = round(result["skew_salted"] / result["uniform"], 2)
    result["plain_degradation"] = round(result["skew_plain"] / result["uniform"], 2)
    # sanity: all four variants must agree on the aggregate (the skewed
    # pair differs from uniform DATA, but plain/aqe/salted on the SAME
    # skewed data must be identical)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    assert rows(plain(spark, SKEW)) == rows(salted(spark, SKEW, hot)), "salting changed semantics"
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
