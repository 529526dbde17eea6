"""Timings for queries added after the headline bench window froze.

The headline bench (bench.py) keeps a stable query set so
round-over-round totals stay comparable; this records the newest
operators separately so their cost at bench scale is committed
evidence too. Writes BENCH_EXTRAS_r{ROUND}.json.

Run from the repo root:  python scripts/bench_extras.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: F401  (registers every query)

from orders_currency_conversion_etl_spark.plans import registry
from orders_currency_conversion_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROUND = "06"

#: r5 additions kept for round-over-round comparison + r6 additions.
EXTRAS = [
    "knn_pq_adc",
    "text_vocab_encode",
    "knn_ivf_pq",
    "dedup_semantic_clustered",
    "split_leakage_safe",
    "layout_zorder_stats",
    "layout_hilbert_stats",
    # agg_hll_rolling_distinct was de-registered in r9 (its oracled
    # gate agg_hll_rolling_accuracy, below, runs the same read path)
    # r6:
    "heavy_hitters_mg",
    "pagerank_parts_materialized",
    "sample_seeded",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "triangles_parts_materialized",
    "knn_lsh_multiprobe",
    "agg_hll_rolling_accuracy",
    "hll_segment_overlap",
    "knn_ivf_materialized",
    "dedup_incremental_lsh",
]


def main() -> None:
    spark = get_spark("bench-extras")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in EXTRAS:
        fn = registry.QUERIES[name]
        fn(spark, SF_DIR).count()  # warm (plan + IO cache)
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    try:
        load = os.getloadavg()[0]
    except OSError:
        load = None
    out = {
        "metric": f"r{ROUND}_extras_runtime",
        "unit": "sec",
        "sf_dir": SF_DIR,
        "load_avg_1m": load,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    with open(os.path.join(REPO, f"BENCH_EXTRAS_r{ROUND}.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
