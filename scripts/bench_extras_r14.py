"""BENCH_EXTRAS_r14: series continuation on a QUIET rig.

Same protocol as BENCH_EXTRAS_r10..r13 (warm min-of-2 per (query,
sf)). r14 registers nothing (the rotation window is exactly the r9
staleness cohort), so there are no introduction baselines — this run
exists to (a) extend every tracked series on the same quiet rig that
recorded BENCH_LOCAL_r14 (the r13 records were taken on a ~30-40%
inflated VM, see DRIFT_AB_r13_rig2.json), and (b) re-time the r13
introductions on a clean rig so their series starts from an honest
floor. Run from the repo root: python scripts/bench_extras_r14.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401  (registers every query)

from bench_extras_r12 import EXTRA_PATHS, _drain, _time  # noqa: E402
from bench_extras_r13 import QUERIES, SFS  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("bench-extras-r14")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11-r13 records
    sec, _rows, _nb = _drain(spark, "/root/testdata/sf0.1", 4, 8, 4)
    timings["queue_convert_drain@sf0.1"] = sec

    for sf_label, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_label}: {sf_dir} missing", file=sys.stderr)
            continue
        for name in QUERIES:
            timings[f"{name}@{sf_label}"] = _time(registry.QUERIES[name], spark, sf_dir)
        for name, fn in EXTRA_PATHS.items():
            timings[f"{name}@{sf_label}"] = _time(fn, spark, sf_dir)

    scaling = {}
    for key in sorted({k.rsplit("@", 1)[0] for k in timings}):
        a, b = timings.get(f"{key}@sf0.1"), timings.get(f"{key}@sf1")
        if a and b:
            scaling[key] = round(b / a, 2)
    out = {
        "round": 14,
        "note": (
            "r14 extras: quiet-rig series continuation, no new "
            "registrations this round (window = the r9 staleness "
            "cohort); re-times the r13 introductions off the inflated "
            "late-r13 VM"
        ),
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r14.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
