"""SKEW_SKETCH_AB_r16: measured evidence for the r16 count-min/
Misra-Gries hot-key detector under ACTUALLY-HOT data (the bloom-A/B
discipline applied to the other r16 wiring).

Fixture: the skewed sf1 lineitem (scripts/make_skew.py — 6M rows, 30%
on one l_orderkey, ~1.5M distinct keys). Per arm (exact groupBy
detector vs the single-pass sketch):

- detection wall (warm min-of-2) and the returned hot-key set;
- decision equivalence: the sketch must return a SUPERSET of the exact
  hot set containing the planted key (no false negatives — the salting
  guarantee), with bounded extras;
- end-to-end: the salted join + aggregation result is identical under
  either detector (semantics preservation re-asserted on hot data).

The 100 TB claim is MEMORY/SHUFFLE SHAPE, not local wall: the exact
detector shuffles a 1.5M-key aggregate (map-side combined — cheap
here, fact-sized when keys are billions); the sketch holds a ~5 KB
grid + a 20-entry candidate summary per partition and shuffles only
#partitions rows. Local wall is recorded honestly either way.

Run: python scripts/make_sf1.py && python scripts/make_skew.py &&
     python scripts/skew_sketch_ab_r16.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.operators.countmin import (  # noqa: E402
    detect_hot_keys_sketched,
)
from orders_currency_conversion_etl_spark.operators.skew import (  # noqa: E402
    detect_hot_keys,
    salted_fact_join,
)
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

SKEW = os.path.join(REPO, ".localdata", "skew")


def _timed(fn):
    best, out = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3), out


def main() -> None:
    if not os.path.isdir(SKEW):
        raise SystemExit("run scripts/make_skew.py first")
    spark = get_spark("skew-sketch-ab")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SKEW, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SKEW, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    )
    n_rows = li.count()
    n_keys = li.select("l_orderkey").distinct().count()

    exact_sec, exact_hot = _timed(lambda: detect_hot_keys(li, "l_orderkey"))
    sk_sec, sk_hot = _timed(lambda: detect_hot_keys_sketched(li, "l_orderkey"))

    exact_set, sk_set = set(exact_hot), set(sk_hot)
    assert exact_set, "fixture must plant a hot key"
    assert exact_set <= sk_set, (exact_set, sk_set)  # no false negatives

    def _run(hot):
        joined = salted_fact_join(
            li.select("l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"),
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            key="l_orderkey",
            hot_keys=hot,
            salt_source=["l_linenumber", "l_extendedprice", "l_discount"],
        )
        rows = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("decimal(38,4)").alias("rev"),
            )
            .collect()
        )
        return sorted((r["o_orderpriority"], r["n"], str(r["rev"])) for r in rows)

    exact_join_sec, res_exact = _timed(lambda: _run(exact_hot))
    sk_join_sec, res_sk = _timed(lambda: _run(sk_hot))
    assert res_exact == res_sk  # identical results under either detector

    out = {
        "fixture": {
            "rows": n_rows,
            "distinct_keys": n_keys,
            "hot_key_rows": 1800117,
        },
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "exact": {
            "detect_sec": exact_sec,
            "hot_keys": sorted(map(int, exact_set)),
            "salted_join_sec": exact_join_sec,
        },
        "sketched": {
            "detect_sec": sk_sec,
            "hot_keys": sorted(map(int, sk_set)),
            "extras_vs_exact": sorted(map(int, sk_set - exact_set)),
            "salted_join_sec": sk_join_sec,
        },
        "protocol": (
            "Skewed sf1 lineitem (6M rows, 30% on one key, ~1.5M distinct "
            "keys). Decision equivalence asserted (sketch superset of exact, "
            "planted key found) and the salted join + agg result identical "
            "under either detector. The scale claim is the SHAPE: exact "
            "shuffles a |distinct keys| aggregate; the sketch holds a ~5KB "
            "grid + bounded candidates per partition and shuffles one row "
            "per partition. Local wall recorded honestly — map-side combine "
            "makes the exact aggregate cheap at 1.5M keys on one node."
        ),
    }
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SKEW_SKETCH_AB_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("exact", "sketched")}))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
