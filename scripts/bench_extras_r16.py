"""BENCH_EXTRAS_r16: introduction baselines for the two r16
registrations + series continuation.

Same protocol as BENCH_EXTRAS_r10..r15 (warm min-of-2 per (query,
sf)). r16 registers multimodal_gif_decode and
multimodal_png_palette_decode (staged_r16.py) — this run records their
first series points at sf0.1 and sf1, and extends the r11-r15 tracked
series on the same rig.

RIG NOTE: the r16 rig is QUIET (BENCH_LOCAL_r16.json: 17.95 s sf0.1 =
0.97x baseline, load 0.6); cross-round deltas for the series read
cleanly against the r14 quiet records, and the r15 points carry that
session's documented ~25% co-tenant inflation.

Run from the repo root: python scripts/bench_extras_r16.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401  (registers every query incl. r16's)

from bench_extras_r12 import EXTRA_PATHS, _drain, _time  # noqa: E402
from bench_extras_r13 import SFS  # noqa: E402
from bench_extras_r15 import QUERIES as QUERIES_R15  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

#: the r16 introductions, first series points this round
INTRODUCTIONS = [
    "multimodal_gif_decode",
    "multimodal_png_palette_decode",
]

QUERIES = QUERIES_R15 + INTRODUCTIONS


def main() -> None:
    spark = get_spark("bench-extras-r16")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11-r15 records
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
        "round": 16,
        "note": (
            "r16 extras: introduction baselines for the two staged_r16 "
            "registrations + series continuation on a quiet rig "
            "(BENCH_LOCAL_r16.json provenance)"
        ),
        "introductions": INTRODUCTIONS,
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r16.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
