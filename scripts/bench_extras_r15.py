"""BENCH_EXTRAS_r15: introduction baselines for the four r15
registrations + series continuation.

Same protocol as BENCH_EXTRAS_r10..r14 (warm min-of-2 per (query,
sf)). r15 registers archive_gzip_members, archive_warc_gz_index,
lake_rowgroup_stats and queue_source_roundtrip (staged_r15.py) — this
run records their first series points at sf0.1 and sf1, and extends
the r11-r14 tracked series on the same rig.

RIG NOTE: the r15 session's rig carries a noisy co-tenant (~25%
inflation proven by re-running the unchanged r14 tree — see
BENCH_LOCAL_r15.json provenance). Every record embeds load_avg_1m;
read cross-round deltas against quiet-rig records only.

Run from the repo root: python scripts/bench_extras_r15.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401  (registers every query incl. r15's)

from bench_extras_r12 import EXTRA_PATHS, _drain, _time  # noqa: E402
from bench_extras_r13 import QUERIES as QUERIES_R13  # noqa: E402
from bench_extras_r13 import SFS  # noqa: E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

#: the r15 introductions, first series points this round
INTRODUCTIONS = [
    "archive_gzip_members",
    "archive_warc_gz_index",
    "lake_rowgroup_stats",
    "queue_source_roundtrip",
]

QUERIES = QUERIES_R13 + INTRODUCTIONS


def main() -> None:
    spark = get_spark("bench-extras-r15")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11-r14 records
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
        "round": 15,
        "note": (
            "r15 extras: introduction baselines for the four staged_r15 "
            "registrations + series continuation; rig carries a noisy "
            "co-tenant this session (~25% inflation vs quiet, proven on "
            "the unchanged r14 tree — BENCH_LOCAL_r15.json provenance)"
        ),
        "introductions": INTRODUCTIONS,
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r15.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
