"""Audit every registered query's physical plan for fact-table
broadcasts — the footgun r5 measured on agg_revenue_by_nation: after
column pruning, Spark's file-size-scaled estimate can drop a
million-row fact table under the 10 MB autoBroadcast threshold, and a
fact-side BroadcastExchange that is merely survivable once degrades
the shared JVM when built repeatedly (2.2 s -> 20 s measured) and is
categorically wrong at 100 TB.

For each query, EXPLAIN (no execution) at $SPARK_GRAFT_AUDIT_DIR
(default the local sf1 fixtures — the scale where estimates actually
cross the threshold) and flag any BroadcastExchange whose subtree
scans a FACT table (lineitem/orders/events/documents/embeddings)
without an intervening aggregate/limit that would shrink it to
O(dims)/O(groups). Flags are REVIEW items, not failures: a broadcast
below a highly selective filter can be legitimate — the point is that
every one must be a stated decision, not an estimate artifact.

    python scripts/audit_broadcasts.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402

from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

FACT_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

#: operators under a BroadcastExchange that bound its size regardless
#: of the scanned table's size
SHRINKERS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|CollectLimit"
    r"|GlobalLimit|LocalLimit|TakeOrderedAndProject|Deduplicate"
)


def _indent(line: str) -> int:
    body = line.lstrip()
    return len(line) - len(body)


def audit_plan(plan: str) -> list[dict]:
    """Flag BroadcastExchange subtrees that scan a fact table without a
    shrinking operator in between (tree-format `explain` string)."""
    lines = [l for l in plan.splitlines() if l.strip()]
    flags = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _indent(line)
        subtree = []
        for nxt in lines[i + 1 :]:
            if _indent(nxt) <= d and (":-" in nxt or "+-" in nxt):
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        facts = sorted(
            {
                t
                for t in FACT_TABLES
                for m in re.finditer(r"FileScan parquet[^\n]*", sub)
                if f"/{t}.parquet" in m.group(0) or f"{t}.parquet]" in m.group(0)
            }
        )
        if facts and not SHRINKERS.search(sub):
            flags.append({"tables": facts, "exchange_line": line.strip()[:120]})
    return flags


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_AUDIT_DIR", os.path.join(REPO, ".localdata", "sf1")
    )
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            flags = audit_plan(plan)
            if flags:
                results[name] = flags
        except Exception as exc:  # guarded baselines refuse sf1 inputs
            errors[name] = str(exc).split("\n")[0][:160]
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(entry_mod.queries()),
        "n_flagged": len(results),
        "flagged": results,
        "skipped": errors,
    }
    text = json.dumps(summary, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
    print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
