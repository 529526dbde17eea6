"""BENCH_EXTRAS_r13: series continuation + introduction baselines for
the four r13 registrations.

Same protocol as BENCH_EXTRAS_r10/r11/r12 (warm min-of-2 per
(query, sf)):

- the tracked decode-tier / incremental / queue series (unchanged
  queries, series continuity for the extras perf gate — the gate is
  latest vs the min over all prior rounds, history consolidated in
  BENCH_EXTRAS_HISTORY.json);
- `queue_convert_drain` in the r11 topology (4 partitions x 8
  segments, maxFilesPerTrigger=4) so the series key stays comparable;
- introduction baselines for the r13 registrations
  (`multimodal_mp4_dims`, `archive_zip_members`,
  `queue_compacted_drain`, `queue_lag_report`).

Run from the repo root on a QUIET rig: python scripts/bench_extras_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401  (registers every query)

from bench_extras_r12 import EXTRA_PATHS, _drain, _time  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "multimodal_audio_decode",
    "incremental_unprocessed_at_scale",
    "queue_backfill_slice",
    "queue_roundtrip_convert",
    # r13 introductions
    "multimodal_mp4_dims",
    "archive_zip_members",
    "queue_compacted_drain",
    "queue_lag_report",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".localdata", "sf1")),
]


def main() -> None:
    spark = get_spark("bench-extras-r13")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11/r12 records
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
        "round": 13,
        "note": (
            "r13 extras: decode-tier/queue series continuation plus "
            "introduction baselines for the four r13 registrations "
            "(multimodal_mp4_dims, archive_zip_members, "
            "queue_compacted_drain, queue_lag_report)"
        ),
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r13.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
