"""BLOOM_AB_r15: measured evidence for Bloom semi-join pruning.

The quantity that matters at 100 TB is SHUFFLE VOLUME — rows of the
fact that enter the sort-merge join's exchange. On local[32] the
network is a memcpy, so wall-clock parity is expected and NOT the
claim; the claim is the row reduction, which converts 1:1 into network
bytes on a real cluster. Protocol: orders (fact) semi-joined to
selective customer slices at sf0.1; for each selectivity record (a)
fact rows entering the plain semi join's shuffle (= all of them),
(b) fact rows surviving the Bloom prune (= what the pruned join
shuffles), (c) the exact match count (no-false-negatives floor),
(d) warm min-of-2 wall for both plans.

Run from the repo root: python scripts/bloom_ab_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.operators import bloom  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn) -> "tuple[float, int]":
    best, out = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3), out


def main() -> None:
    spark = get_spark("bloom-ab")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n_fact = orders.count()

    results = []
    for label, bal_floor in (("sel~20pct", 7000), ("sel~5pct", 9400), ("sel~1pct", 9890)):
        dim = customer.where(F.col("c_acctbal") > bal_floor).select(
            F.col("c_custkey").alias("o_custkey")
        )
        n_keys = dim.distinct().count()
        num_bits, k = bloom.bloom_params(max(n_keys, 1), 0.01)
        bitmap = bloom.build_bloom(dim, "o_custkey", num_bits, k)
        pruned = bloom.prune_with_bloom(orders, "o_custkey", bitmap, num_bits, k)

        n_pruned = pruned.count()
        plain_sec, n_match = _timed(
            lambda: orders.join(dim.distinct(), "o_custkey", "left_semi").count()
        )
        bloom_sec, n_bloom = _timed(
            lambda: bloom.bloom_semi_join(
                orders, dim, "o_custkey", fpp=0.01, n_keys=n_keys
            ).count()
        )
        assert n_bloom == n_match  # exactness, re-asserted per slice
        results.append(
            {
                "slice": label,
                "dim_keys": n_keys,
                "bitmap_bytes": num_bits // 8,
                "fact_rows": n_fact,
                "rows_into_join_plain": n_fact,
                "rows_into_join_bloom": n_pruned,
                "true_matches": n_match,
                "shuffle_row_reduction": round(1 - n_pruned / n_fact, 4),
                "fp_overhead_rows": n_pruned - n_match,
                "wall_plain_sec": plain_sec,
                "wall_bloom_sec": bloom_sec,
            }
        )
        print(json.dumps(results[-1]))

    out = {
        "sf_dir": SF_DIR,
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "protocol": __doc__.strip().split("\n\n")[1],
        "note": (
            "single-node wall parity is expected (shuffle is memcpy on "
            "local[32]); the cluster-scale claim is rows_into_join_bloom "
            "vs rows_into_join_plain, which is network volume 1:1"
        ),
        "results": results,
    }
    with open(os.path.join(REPO, "BLOOM_AB_r15.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print("wrote BLOOM_AB_r15.json")
    spark.stop()


if __name__ == "__main__":
    main()
