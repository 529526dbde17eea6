"""sf1 -> sf3 -> sf10 screen for queue_compact (r13): the compaction
claim is "one window shuffle over the below-horizon log + one grouped
rewrite job + an O(#segments) driver swap" — i.e. data-proportional in
the log with a per-segment fixed cost, the same bound as Kafka's log
cleaner. Fixed topology (4 partitions x 4 segments, key = o_custkey so
every key recurs across segments) so segment size grows with the
decade exactly as on a cluster.

Contract is re-asserted per scale WITHOUT trusting the compactor's own
window: after compaction every (partition, key) must (a) survive
exactly once, (b) in the highest segment that ever contained it —
both recomputed from the staged pre-compaction log's publish
arithmetic. The idempotent re-run (a compacted log compacts to itself,
dropped == 0) is also timed: it is the steady-state cleaner pass.

    python scripts/scale_r13_compact.py [out.json]
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

from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

SCALES = {
    "sf1": (os.path.join(REPO, ".localdata", "sf1"), 10),
    "sf3": (os.path.join(REPO, ".localdata", "sf3"), 30),
    "sf10": (os.path.join(REPO, ".localdata", "sf10_lsh"), 100),
}

N_PARTS, SEGS_PER_PART = 4, 4


def _stage_queue(spark, orders_path: str, q_dir: str) -> None:
    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.streaming.file_queue import queue_append

    orders = spark.read.parquet(orders_path).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    chunk = (
        (F.col("o_orderkey") - F.col("o_orderkey") % N_PARTS) / N_PARTS % SEGS_PER_PART
    ).cast("int")
    for part in range(N_PARTS):
        sub = orders.filter(F.col("o_orderkey") % N_PARTS == part)
        for seq in range(SEGS_PER_PART):
            queue_append(sub.filter(chunk == seq), q_dir, part)


def _assert_contract(spark, orders_path: str, q_dir: str) -> int:
    """(a) one survivor per (partition, key); (b) survivor sits in the
    highest segment that ever held the key — both from the publish
    arithmetic, independent of the compactor's window. Returns the
    surviving row count."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from orders_currency_conversion_etl_spark.streaming.file_queue import (
        read_queue_batch,
    )

    orders = spark.read.parquet(orders_path).select("o_orderkey", "o_custkey")
    chunk = (
        (F.col("o_orderkey") - F.col("o_orderkey") % N_PARTS) / N_PARTS % SEGS_PER_PART
    ).cast("int")
    expected = (
        orders.withColumn("partition", (F.col("o_orderkey") % N_PARTS).cast("int"))
        .withColumn("seq", chunk)
        .groupBy("partition", "o_custkey")
        .agg(F.max("seq").alias("max_seq"))
    )

    schema = T.StructType(
        spark.read.parquet(os.path.join(q_dir, "partition=0")).schema.fields
        + [T.StructField("partition", T.IntegerType())]
    )
    got = (
        read_queue_batch(spark, q_dir, schema)
        .withColumn(
            "seq",
            (
                (F.col("o_orderkey") - F.col("o_orderkey") % N_PARTS)
                / N_PARTS
                % SEGS_PER_PART
            ).cast("int"),
        )
    )
    per_key = got.groupBy("partition", "o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.max("seq").alias("got_seq")
    )
    joined = per_key.join(expected, ["partition", "o_custkey"], "full")
    bad = joined.filter(
        (F.col("n") != 1) | F.col("n").isNull() | (F.col("got_seq") != F.col("max_seq"))
    ).count()
    assert bad == 0, f"{bad} (partition,key) cells violate the compaction contract"
    return got.count()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_COMPACT_r13.json")
    spark = get_spark("scale-r13-compact")
    spark.sparkContext.setLogLevel("ERROR")

    from orders_currency_conversion_etl_spark.streaming.file_queue import queue_compact

    out: dict = {"topology": f"{N_PARTS} partitions x {SEGS_PER_PART} segments, key=o_custkey"}

    # warm the JVM / codegen / parquet paths so the first scale's
    # timing is not the session's cold start
    with tempfile.TemporaryDirectory() as warm:
        wq = os.path.join(warm, "queue")
        _stage_queue(spark, os.path.join("/root/testdata/sf0.01", "orders.parquet"), wq)
        queue_compact(spark, wq, ["o_custkey"])

    per_scale: dict[str, dict] = {}
    for label, (sf_dir, replicas) in SCALES.items():
        _ensure_orders(sf_dir, replicas)
        orders_path = os.path.join(sf_dir, "orders.parquet")
        with tempfile.TemporaryDirectory() as work:
            q_dir = os.path.join(work, "queue")
            _stage_queue(spark, orders_path, q_dir)

            t0 = time.perf_counter()
            stats = queue_compact(spark, q_dir, ["o_custkey"])
            first_sec = time.perf_counter() - t0

            kept = sum(s["kept"] for s in stats.values())
            dropped = sum(s["dropped"] for s in stats.values())
            survivors = _assert_contract(spark, orders_path, q_dir)
            assert survivors == kept, (survivors, kept)

            t0 = time.perf_counter()
            stats2 = queue_compact(spark, q_dir, ["o_custkey"])
            noop_sec = time.perf_counter() - t0
            assert all(s["dropped"] == 0 for s in stats2.values())

            per_scale[label] = {
                "input_rows": kept + dropped,
                "kept": kept,
                "dropped": dropped,
                "compact_sec": round(first_sec, 3),
                "noop_recompact_sec": round(noop_sec, 3),
                "rows_per_sec": round((kept + dropped) / first_sec, 1),
                "contract_ok": True,
            }
            print(label, per_scale[label], flush=True)

    base = per_scale["sf1"]
    out["scales"] = per_scale
    out["ratios"] = {
        lbl: {
            "rows": round(per_scale[lbl]["input_rows"] / base["input_rows"], 2),
            "time": round(per_scale[lbl]["compact_sec"] / base["compact_sec"], 2),
        }
        for lbl in SCALES
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
