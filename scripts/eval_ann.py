"""ANN strategy evaluation: recall@k vs exact AND wall-clock, side by
side, for every registered similarity-search variant.

The registry proves each variant CORRECT against its own oracle;
this records the engineering trade the variants exist to make:
approximation quality (recall@10 against the exact brute-force top-k)
vs scan cost (noop-sink wall time, best of N). Writes ANN_EVAL.json.

Recall is measured at $SPARK_GRAFT_EVAL_DIR (default sf0.1, where
brute force is cheap); timing additionally runs at the local sf1 when
present for the scale trend (brute force excluded there — its guard
refuses sf1 inputs by design).

    python scripts/eval_ann.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402

from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

VARIANTS = ("knn_lsh_bucketed", "knn_lsh_multiprobe", "knn_ivf", "knn_ivf_materialized", "knn_pq_adc", "knn_ivf_pq")
EXACT = "knn_brute_force"
SF1_DIR = os.path.join(REPO, ".localdata", "sf1")


def _time(fn, spark, sf_dir, runs=2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_EVAL_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "ANN_EVAL.json")
    q = entry_mod.queries()
    spark = get_spark("ann-eval")
    spark.sparkContext.setLogLevel("ERROR")

    exact_rows = q[EXACT](spark, sf_dir).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_exact = sum(len(v) for v in exact.values())

    results = {
        EXACT: {
            "recall_at_10": 1.0,
            "sec_sf0.1": _time(q[EXACT], spark, sf_dir),
            "note": "exact baseline; size-guarded at sf1 by design",
        }
    }
    for name in VARIANTS:
        rows = q[name](spark, sf_dir).collect()
        hits = sum(
            1 for r in rows if r["neighbor_id"] in exact.get(r["query_id"], set())
        )
        rec = {
            "recall_at_10": round(hits / n_exact, 3),
            "sec_sf0.1": _time(q[name], spark, sf_dir),
        }
        if os.path.isdir(SF1_DIR):
            rec["sec_sf1"] = _time(q[name], spark, SF1_DIR)
        results[name] = rec

    out = {
        "sf_dir": sf_dir,
        "k": 10,
        "n_queries": len(exact),
        "results": results,
        "corpus_note": (
            "synthetic embeddings are near-random, so true neighbors sit "
            "barely above the cosine noise floor and ANY bucketing scheme "
            "loses most of them — absolute recall here is a property of "
            "the corpus, the RELATIVE numbers are the signal: multiprobe "
            "(7/64 of the corpus scanned) would score ~0.11 recall if its "
            "candidates were random; beating that shows the hash carries "
            "signal, and its gain over single-bucket (1/64 scanned) is the "
            "probes-for-recall trade the variant exists to make"
        ),
    }
    text = json.dumps(out, indent=1)
    with open(out_path, "w") as fh:
        fh.write(text + "\n")
    print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
