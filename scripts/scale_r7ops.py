"""Scale screen for the r7/r8-new operators (the per-round discipline
that caught the r5 IVF/SemDeDup quadratics): warm min-of-2 per
(query, scale) at the local sf1 and sf3 fixtures (3x data), one
session, noop sink. A healthy operator lands at-or-below ~linear
(<= ~3x time at 3x data; the sketch queries should be far below —
their state is O(|days| x |bins|), not O(facts)).

Covers: quantile_sketch_rolling / quantile_sketch_accuracy (r7-new;
r7 VERDICT ask #4) and knn_ivf_nprobe (r8-new). For the accuracy
gate the persisted-state build cost is recorded separately (it's the
once-per-generation cost the shared-state redesign moved out of the
query).

    python scripts/scale_r7ops.py [out.json]
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

QUERIES = ("quantile_sketch_rolling", "quantile_sketch_accuracy", "knn_ivf_nprobe")
SCALES = {"sf1": os.path.join(REPO, ".localdata", "sf1"),
          "sf3": os.path.join(REPO, ".localdata", "sf3")}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_R7OPS.json")
    q = entry_mod.queries()
    spark = get_spark("scale-r7ops")
    spark.sparkContext.setLogLevel("ERROR")

    from orders_currency_conversion_etl_spark.operators import sketches

    timings: dict[str, float] = {}
    state_build: dict[str, float] = {}
    for tag, sf_dir in SCALES.items():
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing")
            continue
        # pay the quantile state build up front and record it: the warm
        # numbers below then measure the read path (the operating mode)
        t0 = time.perf_counter()
        sketches.build_quantile_state(spark, sf_dir)
        state_build[f"quantile_state@{tag}"] = round(time.perf_counter() - t0, 2)
        for name in QUERIES:
            q[name](spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                q[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            timings[f"{name}@{tag}"] = round(best, 2)
            print(f"{name}@{tag}: {best:.2f}s")

    ratios = {}
    for name in QUERIES:
        a, b = timings.get(f"{name}@sf1"), timings.get(f"{name}@sf3")
        if a and b:
            ratios[name] = round(b / a, 2)

    out = {
        "protocol": "warm min-of-2 per (query, scale), one session, local[32]; "
                    "fixtures .localdata/{sf1,sf3} (3x data); quantile state "
                    "prebuilt per scale (cost in state_build_sec)",
        "purpose": "r7 VERDICT ask #4: sf1->sf3 screen for the r7-new quantile "
                   "pair (+ the r8-new knn_ivf_nprobe)",
        "timings_sec": timings,
        "state_build_sec": state_build,
        "sf3_over_sf1": ratios,
        "healthy_bound": "<= ~3x at 3x data; sketch reads should be far below",
    }
    text = json.dumps(out, indent=1)
    with open(out_path, "w") as fh:
        fh.write(text + "\n")
    print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
