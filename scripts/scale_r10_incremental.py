"""sf1 -> sf3 -> sf10 screen for the J3 anti-join scale form (r10,
VERDICT r9 ask #4): `incremental_unprocessed_at_scale` was
plan-asserted (never broadcasts the sink keyset) and driver-green at
sf0.01, but absent from the r9 sf10 screen. This measures the
shuffle-hash anti-join across three decades AND re-asserts the
no-sink-broadcast property on the physical plan at EVERY scale — the
100 TB claim is "both sides partition on the key, per-task hash build",
which must hold when the keyset is 15M rows just like at 150k.

Fixtures: orders-only replication of sf0.1 via make_sf1's
stride-shifted machinery (referential semantics preserved; key shifts
are multiples of the key stride so `o_orderkey % 10` — the
processed-slice predicate — keeps its 20% selectivity only if the
stride is a multiple of 10; we round the stride up to one, documented
below). Existing sf1/sf3 dirs are reused if present.

    python scripts/scale_r10_incremental.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entry_mod  # noqa: E402

from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

QUERY = "incremental_unprocessed_at_scale"

SCALES = {
    "sf1": (os.path.join(REPO, ".localdata", "sf1"), 10),
    "sf3": (os.path.join(REPO, ".localdata", "sf3"), 30),
    "sf10": (os.path.join(REPO, ".localdata", "sf10_lsh"), 100),
}


def _ensure_orders(dst_dir: str, replicas: int) -> None:
    """Orders-only fixture: stride-shifted replicas of sf0.1 orders.

    The key stride is rounded UP to a multiple of 10 so every replica
    preserves `o_orderkey % 10` — the registered query's
    processed-slice predicate — keeping the sink at exactly 20% of the
    source at every scale (otherwise the anti-join's selectivity would
    drift with the decade and the ratios would compare different
    workloads)."""
    out = os.path.join(dst_dir, "orders.parquet")
    if os.path.exists(out):
        return
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import make_sf1 as m

    os.makedirs(dst_dir, exist_ok=True)
    src = pq.read_table(os.path.join(m.SRC, "orders.parquet"))
    stride = m._stride(src, "o_orderkey")
    stride = ((stride + 9) // 10) * 10  # preserve key % 10 per replica
    parts = [src]
    for r in range(1, replicas):
        shifted = src.set_column(
            src.schema.get_field_index("o_orderkey"),
            "o_orderkey",
            pc.add(src["o_orderkey"], r * stride),
        )
        parts.append(shifted)
    import pyarrow as pa

    big = pa.concat_tables(parts)
    tmp = out + ".tmp"
    pq.write_table(big, tmp, row_group_size=max(1, big.num_rows // 64))
    os.replace(tmp, out)
    print(f"built {out}: {src.num_rows} -> {big.num_rows} rows", flush=True)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_SF10_r10.json")
    q = entry_mod.queries()[QUERY]

    for tag, (sf_dir, replicas) in SCALES.items():
        _ensure_orders(sf_dir, replicas)

    spark = get_spark("scale-r10-incremental")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    plan_checks: dict[str, bool] = {}
    rows: dict[str, int] = {}
    for tag, (sf_dir, _r) in SCALES.items():
        df = q(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        no_broadcast = "Broadcast" not in plan
        plan_checks[f"no_sink_broadcast@{tag}"] = no_broadcast
        if not no_broadcast:
            print(f"PLAN VIOLATION at {tag}:\n{plan[:2000]}", flush=True)
        rows[f"unprocessed_rows@{tag}"] = df.count()
        df.write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[f"{QUERY}@{tag}"] = round(best, 2)
        print(f"{QUERY}@{tag}: {best:.2f}s (no_broadcast={no_broadcast})", flush=True)

    a, b, c = (timings.get(f"{QUERY}@{t}") for t in ("sf1", "sf3", "sf10"))
    ratios = {}
    if a and b:
        ratios["sf3_over_sf1_(3x)"] = round(b / a, 2)
    if b and c:
        ratios["sf10_over_sf3_(3.33x)"] = round(c / b, 2)
    if a and c:
        ratios["sf10_over_sf1_(10x)"] = round(c / a, 2)

    out = {
        "protocol": (
            "orders-only stride-replicated fixtures (key%10 preserved so the "
            "processed slice stays 20% at every scale); warm min-of-2 per "
            "scale, one session, local[32]; physical plan re-asserted "
            "broadcast-free per scale (the property tests/test_plan_quality.py "
            "pins at fixture scale)"
        ),
        "timings_sec": timings,
        "rows": rows,
        "plan_checks": plan_checks,
        "ratios": ratios,
        "healthy_bound": (
            "shuffle-hash anti-join: both sides exchange on the key once, "
            "per-task hash build — expect ~linear in data per decade with "
            "no broadcast at any scale"
        ),
    }
    text = json.dumps(out, indent=1)
    with open(out_path, "w") as fh:
        fh.write(text + "\n")
    print(text)
    spark.stop()
    return 0 if all(plan_checks.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
