"""Capture .explain("formatted") for the r19 optimization round.

Writes plans/r19/<query>_<tag>.txt for every query named on the
command line (default: the headline bench set), at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Usage:
    python scripts/dump_plans_r19.py before [query ...]
    python scripts/dump_plans_r19.py after  [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: F401  (registers every query)

from orders_currency_conversion_etl_spark.plans import registry
from orders_currency_conversion_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join(REPO, "plans", "r19")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans_r19")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
