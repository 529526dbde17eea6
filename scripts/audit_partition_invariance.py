"""Partitioning-invariance audit: query RESULTS must not depend on the
physical partitioning.

Why this is a 100 TB gate and not a formality: every correctness
artifact in this repo is produced on local[32] with one fixed
partitioning, but the target deployment is a 1000-executor cluster
where scan splits, shuffle partition counts, and AQE decisions are all
different. Any query whose output depends on partition layout —
``F.rand`` seeding (per-partition), ``monotonically_increasing_id``,
float aggregation-order sensitivity leaking into compared digits,
first/any_value without a deterministic tiebreak — would pass every
local oracle and silently produce different answers on the cluster.
The repo's conventions are designed to make that impossible
(md5-derived randomness, exact-decimal folds, explicit tiebreaks:
SURVEY §7.3, SCALE.md); this audit MEASURES the property instead of
asserting it.

Protocol: two fresh processes over the same sf_dir —

  rig A: the normal shape (SPARK_GRAFT_CPUS as configured, 16 MB
         splits) — i.e. exactly what every other artifact runs on;
  rig B: a deliberately alien shape — local[7], 7 shuffle partitions,
         7 defaultParallelism (changes every load_table_parallel /
         repartition target), 1 MB scan splits (different file split
         boundaries), and FRESH state-cache roots so the materialized
         indexes (graph edges, IVF cells, LSH buckets, quantile state)
         are REBUILT under the alien partitioning too — the strong
         form: build invariance, not just read invariance.

Each process hashes every registered query's result as the driver
does (column-name-sorted, row-sorted canonical strings —
tests/oracle_harness.rows_to_multiset); the comparer writes
PARTITION_INVARIANCE.json. Usage:

    python scripts/audit_partition_invariance.py run A.json          # rig A
    SPARK_GRAFT_CPUS=7 SPARK_GRAFT_MAX_PARTITION_BYTES=1m \
    SPARK_GRAFT_GRAPH_CACHE=/tmp/pi_b/graph ... \
    python scripts/audit_partition_invariance.py run B.json          # rig B
    python scripts/audit_partition_invariance.py compare A.json B.json

(The ``all`` subcommand does the three steps with the right env.)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SF = "/root/testdata/sf0.001"

#: every state-cache env override (state is rebuilt under rig B's
#: partitioning — build invariance is part of the claim).
CACHE_ENVS = (
    "SPARK_GRAFT_GRAPH_CACHE",
    "SPARK_GRAFT_ANN_CACHE",
    "SPARK_GRAFT_QS_CACHE",
)


def run(out_path: str, sf_dir: str) -> None:
    from orders_currency_conversion_etl_spark.session import get_spark
    from tests.oracle_harness import rows_to_multiset

    import __spark_entry__ as entry

    spark = get_spark("partition-invariance-audit")
    spark.sparkContext.setLogLevel("WARN")
    shape = {
        "master": spark.sparkContext.master,
        "defaultParallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "maxPartitionBytes": spark.conf.get("spark.sql.files.maxPartitionBytes"),
        "cache_roots": {e: os.environ.get(e) for e in CACHE_ENVS},
    }
    hashes = {}
    only = os.environ.get("SPARK_GRAFT_PI_ONLY")
    wanted = set(only.split(",")) if only else None
    for name, fn in entry.queries().items():
        if wanted is not None and name not in wanted:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            ms = rows_to_multiset(rows, df.columns)
            hashes[name] = {
                "n_rows": len(rows),
                "cols": sorted(df.columns),
                "sha256": hashlib.sha256("\n".join(ms).encode()).hexdigest(),
                "sec": round(time.monotonic() - t0, 3),
            }
        except Exception as e:
            hashes[name] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "shape": shape, "hashes": hashes}, fh)
    print(f"wrote {out_path}: {len(hashes)} queries")


#: Negative control, run under BOTH shapes by validate(): seeded
#: F.rand is only per-(partition, seed) deterministic — its values
#: (and this sum's exact double bits) change when the row→partition
#: mapping changes, which is exactly the failure mode the audit
#: exists to catch (and why the package derives all randomness from
#: md5, never F.rand — operators/generate.py's docstring).
_CONTROL_SNIPPET = """
import os, sys, hashlib
sys.path.insert(0, {repo!r})
from orders_currency_conversion_etl_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("pi-negative-control")
spark.sparkContext.setLogLevel("ERROR")
rows = (
    spark.range(0, 100000, 1, spark.sparkContext.defaultParallelism)
    .withColumn("r", F.rand(42))
    .select(F.sum("r").alias("s"))
    .collect()
)
print(hashlib.sha256(repr(rows[0][0]).encode()).hexdigest())
"""


def validate() -> dict:
    """Prove the detector can fail: the F.rand control must hash
    DIFFERENTLY across the two rig shapes (same seed, same rows)."""
    outs = []
    for cpus in ("32", "7"):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = cpus
        r = subprocess.run(
            [sys.executable, "-c", _CONTROL_SNIPPET.format(repo=REPO)],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        )
        outs.append(r.stdout.strip().splitlines()[-1])
    return {
        "control": "sum(F.rand(seed=42)) over 100k rows, defaultParallelism partitions",
        "hash_local32": outs[0],
        "hash_local7": outs[1],
        "detector_fires": outs[0] != outs[1],
    }


def compare(a_path: str, b_path: str) -> int:
    a, b = json.load(open(a_path)), json.load(open(b_path))
    ah, bh = a["hashes"], b["hashes"]
    diffs, errors = {}, {}
    for name in sorted(set(ah) | set(bh)):
        ra, rb = ah.get(name), bh.get(name)
        if ra is None or rb is None or "error" in ra or "error" in rb:
            errors[name] = {"A": ra, "B": rb}
        elif (ra["sha256"], ra["n_rows"], ra["cols"]) != (rb["sha256"], rb["n_rows"], rb["cols"]):
            diffs[name] = {
                "A": {k: ra[k] for k in ("n_rows", "sha256")},
                "B": {k: rb[k] for k in ("n_rows", "sha256")},
            }
    out = {
        "protocol": (
            "same sf_dir, two fresh processes: rig A = the normal local shape every "
            "other artifact runs on; rig B = local[7], 7 shuffle partitions, 1 MB scan "
            "splits, fresh state-cache roots (materialized graph/ANN/quantile state "
            "REBUILT under the alien partitioning). Per query: column-name-sorted, "
            "row-sorted canonical multiset (the driver's order-insensitive compare), "
            "sha256-compared. A diff = that query's RESULT depends on physical "
            "partitioning and its local[32] verification would not transfer to a "
            "cluster."
        ),
        "rig_a": a["shape"],
        "rig_b": b["shape"],
        "sf_dir": a["sf_dir"],
        "n_queries": len(set(ah) | set(bh)),
        "n_invariant": len(set(ah) & set(bh)) - len(diffs) - len(errors),
        "diffs": diffs,
        "errors": errors,
        "invariant": not diffs and not errors,
        "harness_validated": validate(),
    }
    path = os.path.join(REPO, "PARTITION_INVARIANCE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}: {len(diffs)} diffs, {len(errors)} errors, invariant={out['invariant']}")
    return 1 if diffs or errors else 0


def run_all(sf_dir: str) -> int:
    a_path, b_path = "/tmp/pi_A.json", "/tmp/pi_B.json"
    env_a = dict(os.environ)
    subprocess.run(
        [sys.executable, __file__, "run", a_path, sf_dir], check=True, env=env_a, cwd=REPO
    )
    env_b = dict(os.environ)
    env_b.update(
        {
            "SPARK_GRAFT_CPUS": "7",
            "SPARK_GRAFT_MAX_PARTITION_BYTES": "1m",
        }
    )
    for e in CACHE_ENVS:
        env_b[e] = f"/tmp/pi_b_caches/{e.lower()}"
    subprocess.run(
        [sys.executable, __file__, "run", b_path, sf_dir], check=True, env=env_b, cwd=REPO
    )
    return compare(a_path, b_path)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "run":
        run(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else DEFAULT_SF)
    elif cmd == "compare":
        raise SystemExit(compare(sys.argv[2], sys.argv[3]))
    else:
        raise SystemExit(run_all(sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SF))
