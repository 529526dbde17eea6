"""BENCH_EXTRAS_r18: introduction baselines for the two r18
registrations + series continuation.

Same protocol as BENCH_EXTRAS_r10..r17 (warm min-of-2 per (query,
sf)). r18 registers multimodal_audio_info and multimodal_image_dims
(staged_r18.py — the LAST registration pair; the registry is frozen at
210 after this round) — this run records their first series points at
sf0.1 and sf1, and extends the r11-r17 tracked series on the same rig.

RIG NOTE: see BENCH_LOCAL_r18.json for the round's first-thing quiet
record on the unchanged r17-final tree; cross-round deltas for the
series read against the r17 quiet records.

Run from the repo root: python scripts/bench_extras_r18.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401  (registers every query incl. r18's)

from bench_extras_r12 import EXTRA_PATHS, _drain, _time  # noqa: E402
from bench_extras_r13 import SFS  # noqa: E402
from bench_extras_r17 import QUERIES as QUERIES_R17  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

#: the r18 introductions, first series points this round
INTRODUCTIONS = [
    "multimodal_audio_info",
    "multimodal_image_dims",
]

QUERIES = QUERIES_R17 + INTRODUCTIONS


def main() -> None:
    spark = get_spark("bench-extras-r18")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11-r17 records
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
        "round": 18,
        "note": (
            "r18 extras: introduction baselines for the two staged_r18 "
            "registrations (the last slots — registry frozen at 210) + "
            "series continuation (BENCH_LOCAL_r18.json provenance)"
        ),
        "introductions": INTRODUCTIONS,
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r18.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
