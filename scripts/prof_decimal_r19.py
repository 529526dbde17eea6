"""r19 measurement (guide §1): quantify the wide-decimal SUM penalty and
A/B the long-cents rewrite for agg_pricing_summary (VERDICT r18 ask #6).

Spark's SUM over decimal(18,2) allocates a decimal(28,2) buffer; any
precision > 18 leaves the compact-long representation and every row's
add goes through java BigDecimal. The candidate rewrite sums
ROUND(value * 100) as BIGINT (exact while the data is cents-valued and
the total fits a long) and rescales once at the end.

Variants (sf0.1 lineitem, noop sink, interleaved):
  p0   registry agg_pricing_summary (decimal sums)
  p1   long-cents sums, rescaled to the same decimal output types
  peq  value-equality check: p0 EXCEPT p1 must be empty both ways
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = "/root/repo"
sys.path.insert(0, repo)

import __spark_entry__  # noqa: F401, E402

from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402
from orders_currency_conversion_etl_spark.sources import catalog  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _cents(col, scale: int) -> F.Column:
    return F.round(F.col(col) * (10**scale)).cast("bigint")


def pricing_long(spark):
    li = catalog.load_table_parallel(spark, SF, "lineitem")
    disc_cents = F.round(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) * 10000
    ).cast("bigint")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_cents("l_quantity", 2)).alias("q_c"),
        F.sum(_cents("l_extendedprice", 2)).alias("b_c"),
        F.sum(disc_cents).alias("d_c"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("q_c").cast("decimal(38,2)") / 100).cast("decimal(38,2)").alias("sum_qty"),
        (F.col("b_c").cast("decimal(38,2)") / 100)
        .cast("decimal(38,2)")
        .alias("sum_base_price"),
        (F.col("d_c").cast("decimal(38,4)") / 10000)
        .cast("decimal(38,4)")
        .alias("sum_disc_price"),
        ((F.col("q_c").cast("decimal(38,2)") / 100).cast("double") / F.col("count_order")).alias(
            "avg_qty"
        ),
        "count_order",
    )


def main() -> None:
    spark = get_spark("prof-decimal-r19")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    q0 = lambda: registry.QUERIES["agg_pricing_summary"](spark, SF)  # noqa: E731
    noop(q0())
    noop(pricing_long(spark))
    spark.catalog.clearCache()

    # value equality both directions (exact, not hash)
    a, b = q0(), pricing_long(spark)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(json.dumps({"exceptAll_a_minus_b": d1, "exceptAll_b_minus_a": d2}), flush=True)

    results = {"p0": [], "p1": []}
    for rep in range(REPS):
        for name, fn in (("p0", q0), ("p1", lambda: pricing_long(spark))):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(fn())
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(json.dumps({"rep": rep, "variant": name, "total": dt}), flush=True)
    print(
        json.dumps(
            {
                "summary": {k: min(v) for k, v in results.items()},
                "load": round(os.getloadavg()[0], 2),
                "sf_dir": SF,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
