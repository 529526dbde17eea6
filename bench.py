"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end through the noop sink (full computation,
no driver collect, no disk write)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# __spark_entry__ is the single registration point — importing it pulls
# in every @query module, so bench can never drift from the registry.
import __spark_entry__  # noqa: F401

from orders_currency_conversion_etl_spark.plans import registry
from orders_currency_conversion_etl_spark.session import get_spark

#: The queries whose wall-clock defines the headline metric — one per
#: operator family (scan+join, agg, window, as-of, dedup exact/LSH,
#: knn, text, json, sessionize, multimodal UDF, behavioral windows,
#: iterative graph).
HEADLINE = (
    "flagship_conversion",
    "agg_pricing_summary",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customers",
    "agg_revenue_by_nation",
    "join_fact_to_fact_revenue",
    "window_running_total",
    "topk_expensive_orders",
    "join_asof_rates",
    "json_extract_props",
    "events_hourly_stats",
    "events_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "text_token_stats",
    "multimodal_features",
    "curation_pipeline_lsh",
    "sessionize_gap_summary",
    "cohort_retention_weekly",
    "tfidf_top_terms_per_source",
    "pagerank_parts",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup pass: run every headline query once so JVM JIT +
    # whole-stage-codegen compilation + python-worker spin-up (one-time
    # session costs, ~3 s for the most complex plans) don't land in the
    # timed pass; the baseline envelope is steady-state throughput.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        registry.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()  # warmup must not donate cached data

    # best-of-3: run-to-run variance at sf0.1 is ~2x on the lightest
    # queries (GC pauses, page cache); the minimum is the steady-state
    # cost, making round-over-round BENCH comparisons signal.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
