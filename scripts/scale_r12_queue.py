"""sf1 -> sf3 -> sf10 screen for the queue drain (r12): the queue
source's 100 TB claim is "per-drain cost = per-micro-batch fixed
overhead + the flagship conversion's data-proportional work", measured
at fixed topology (4 partitions x 4 segments, maxFilesPerTrigger=4 =
exactly 4 micro-batches at every scale) so segment size grows with the
decade exactly as it would on a cluster. If the claim holds, seconds
grow sublinearly in rows at the small end (fixed cost dominates) and
approach data-proportional as the conversion work dominates; rows/sec
RISES with scale. Exactness is re-asserted per scale: the drained
total must equal the batch twin over the same staged segments.

Fixtures: orders-only stride-replicated decades reused from the r10
incremental screen (scale_r10_incremental._ensure_orders).

    python scripts/scale_r12_queue.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__  # noqa: F401, E402

from scale_r10_incremental import _ensure_orders  # noqa: E402

from orders_currency_conversion_etl_spark.plans.registry import CONVERSION_TIME  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

SCALES = {
    "sf1": (os.path.join(REPO, ".localdata", "sf1"), 10),
    "sf3": (os.path.join(REPO, ".localdata", "sf3"), 30),
    "sf10": (os.path.join(REPO, ".localdata", "sf10_lsh"), 100),
}

N_PARTS, SEGS_PER_PART, MFT = 4, 4, 4


def _stage_queue(spark, orders_path: str, q_dir: str) -> None:
    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.streaming.file_queue import queue_append

    orders = spark.read.parquet(orders_path)
    chunk = (
        (F.col("o_orderkey") - F.col("o_orderkey") % N_PARTS) / N_PARTS % SEGS_PER_PART
    ).cast("int")
    for part in range(N_PARTS):
        sub = orders.filter(F.col("o_orderkey") % N_PARTS == part)
        for seq in range(SEGS_PER_PART):
            queue_append(sub.filter(chunk == seq), q_dir, part)


def _drain_once(spark, q_dir: str, ckpt: str) -> tuple[float, int, int]:
    from orders_currency_conversion_etl_spark.streaming.orders_stream import convert_stream

    schema = spark.read.parquet(os.path.join(q_dir, "partition=0")).schema
    counts = []
    t0 = time.perf_counter()
    q = (
        convert_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", MFT)
            .parquet(os.path.join(q_dir, "partition=*")),
            spark,
            CONVERSION_TIME,
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: counts.append(df.count()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0, sum(counts), len(counts)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_QUEUE_r12.json")
    spark = get_spark("scale-r12-queue")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    rates: dict[str, float] = {}
    checks: dict[str, bool] = {}

    for label, (sf_dir, replicas) in SCALES.items():
        _ensure_orders(sf_dir, replicas)
        with tempfile.TemporaryDirectory() as work:
            q_dir = os.path.join(work, "queue")
            _stage_queue(spark, os.path.join(sf_dir, "orders.parquet"), q_dir)

            best, drained, n_batches = float("inf"), None, None
            for rep in range(2):  # min-of-2, fresh checkpoint each
                sec, total, nb = _drain_once(spark, q_dir, os.path.join(work, f"ckpt{rep}"))
                if sec < best:
                    best, drained, n_batches = sec, total, nb
            assert n_batches == N_PARTS * SEGS_PER_PART // MFT, n_batches

            # exactness per scale: drained == batch twin on the staged segments
            from orders_currency_conversion_etl_spark.operators.convert import (
                convert_orders,
                orders_src_from_tpch,
            )
            from orders_currency_conversion_etl_spark.sources.rates import rates_df

            schema = spark.read.parquet(os.path.join(q_dir, "partition=0")).schema
            staged = spark.read.schema(schema).parquet(os.path.join(q_dir, "partition=*"))
            batch_n = convert_orders(
                orders_src_from_tpch(staged), rates_df(spark), CONVERSION_TIME
            ).count()
            checks[f"drain_equals_batch@{label}"] = drained == batch_n
            timings[f"queue_drain@{label}"] = round(best, 3)
            rows[f"converted_rows@{label}"] = drained
            rates[f"rows_per_sec@{label}"] = round(drained / best, 1)
            print(label, timings[f"queue_drain@{label}"], drained, rates[f"rows_per_sec@{label}"], flush=True)

    base_t = timings["queue_drain@sf1"]
    base_r = rows["converted_rows@sf1"]
    ratios = {
        f"time_ratio@{lbl}": round(timings[f"queue_drain@{lbl}"] / base_t, 2)
        for lbl in SCALES
    }
    data_ratios = {
        f"data_ratio@{lbl}": round(rows[f"converted_rows@{lbl}"] / base_r, 2)
        for lbl in SCALES
    }
    out = {
        "protocol": (
            "fixed topology (4 partitions x 4 segments, maxFilesPerTrigger=4 "
            "= 4 micro-batches at every scale) so segment size grows with "
            "the decade; warm min-of-2 per scale with a fresh checkpoint per "
            "rep, one local[32] session; exactness re-asserted per scale "
            "against the batch twin over the same staged segments"
        ),
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings_sec": timings,
        "rows": rows,
        "rows_per_sec": rates,
        "time_ratios_vs_sf1": ratios,
        "data_ratios_vs_sf1": data_ratios,
        "exactness_checks": checks,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
