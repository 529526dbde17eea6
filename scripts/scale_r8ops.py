"""Scale screen for the r8-new operators (per-round discipline):
warm min-of-2 per (query, scale) at sf1 and sf3 (3x data), one
session, noop sink. knn_ivf_nprobe was screened in SCALE_R7OPS.json;
this covers the two registered later in the round. For the
materialized LSH query the index build cost is recorded separately
(the once-per-generation cost, like SCALE_R7OPS' quantile state).

    python scripts/scale_r8ops.py [out.json]
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

QUERIES = ("knn_lsh_materialized", "dedup_minhash_lsh_hr", "dedup_minhash_lsh")
SCALES = {"sf1": os.path.join(REPO, ".localdata", "sf1"),
          "sf3": os.path.join(REPO, ".localdata", "sf3")}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_R8OPS.json")
    q = entry_mod.queries()
    spark = get_spark("scale-r8ops")
    spark.sparkContext.setLogLevel("ERROR")

    from orders_currency_conversion_etl_spark.operators import similarity as sim

    timings: dict[str, float] = {}
    state_build: dict[str, float] = {}
    for tag, sf_dir in SCALES.items():
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing")
            continue
        t0 = time.perf_counter()
        sim.build_lsh_index(spark, sf_dir)
        state_build[f"lsh_index@{tag}"] = round(time.perf_counter() - t0, 2)
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
                    "fixtures .localdata/{sf1,sf3} (3x data); LSH index prebuilt "
                    "per scale (cost in state_build_sec). dedup_minhash_lsh "
                    "included as the same-round 4x4 reference for the hr ratio.",
        "timings_sec": timings,
        "state_build_sec": state_build,
        "sf3_over_sf1": ratios,
        "healthy_bound": "<= ~3x at 3x data",
    }
    text = json.dumps(out, indent=1)
    with open(out_path, "w") as fh:
        fh.write(text + "\n")
    print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
