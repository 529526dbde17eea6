"""Paired-repetition drift harness (the r6 adjudication protocol,
DRIFT_AB_r06.json).

Round-over-round timing claims on a shared/noisy box need either a
quiet machine or a paired interleaved design — r5's PageRank
"broadcast hint loses" conclusion came from single-shot loaded-machine
timings and was wrong (SCALE.md, "a measured correction"). This
harness is the paired design: run it alternately against two repo
checkouts (e.g. a git worktree of the previous round's last commit vs
the working tree), N reps each, interleaved A B A B so ambient load
cancels; compare per-query MEDIANS across reps.

    for rep in 1 2 3 4 5; do
      for side in /path/to/old_checkout /root/repo; do
        python scripts/ab_drift.py "$side" >> results.jsonl
      done
    done

Each invocation is a fresh process (fresh JVM, fresh page-cache state
for both sides equally): warmup pass + min-of-2 timed per query, one
JSON line out. Queries under test are $SPARK_GRAFT_AB_QUERIES
(comma-separated; default = the r6 drift-watch set) at
$SPARK_GRAFT_AB_SF_DIR (default the local sf1 fixtures).
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, repo)
os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")

import __spark_entry__  # noqa: F401, E402

from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

# Default set = the r6 drift-watch four + the standing repeat-offender
# set (VERDICT r9 ask #8: queries twice-adjudicated "tail variance" or
# once gate-tripping stay in EVERY future paired run so cumulative
# creep is measured against r1 code, not the previous round):
# dedup_minhash_lsh / knn_lsh_bucketed (~1.11x r8, 1.03-1.08x r10),
# multimodal_features (2.32x driver record adjudicated noise at 1.06x,
# DRIFT_AB_r10), text_token_stats (1.13x "real" in r10, deep-paired to
# noise in r11 — only deep pairings are evidentiary for it).
# r12 additions (VERDICT r11 ask #2): the two r10->r11 sub-second
# record movers without a paired verdict —
# tpch_q18_large_volume_customers (+30%) and cohort_retention_weekly
# (+36%, 1.16x vs r1).
# r18 addition (VERDICT r17 ask #4): queue_lag_report — tripped the
# extras 2x gate once at sf1 (r17: 6.78 s in-run vs 2.93 s r13 best;
# adjudicated transient, DRIFT_AB_r17_queue_lag.json). ESCALATION
# RULE: a SECOND trip is no longer adjudicable as noise — it triggers
# a plan read of the lagging-suffix backfill (streaming/file_queue.py)
# before any bench number is accepted.
QUERIES = os.environ.get(
    "SPARK_GRAFT_AB_QUERIES",
    "agg_pricing_summary,pagerank_parts,flagship_conversion,curation_pipeline_lsh,"
    "dedup_minhash_lsh,knn_lsh_bucketed,multimodal_features,text_token_stats,"
    "tpch_q18_large_volume_customers,cohort_retention_weekly,queue_lag_report",
).split(",")
SF_DIR = os.environ.get(
    "SPARK_GRAFT_AB_SF_DIR", os.path.join("/root/repo", ".localdata", "sf1")
)


def main() -> None:
    spark = get_spark("ab-drift")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in QUERIES:  # warmup: JIT + codegen + python workers
        registry.QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    timings = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {"repo": repo, "queries": timings, "load": round(os.getloadavg()[0], 2)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
