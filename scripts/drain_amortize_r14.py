"""Measure the drain's fixed-cost amortization (r14, VERDICT r13 ask
#5): N successive publish->drain rounds of the flagship conversion
topology, two consumer shapes head-to-head —

- ``startstop``: a fresh ``trigger(availableNow)`` stream per round
  (the r13 one-shot drain shape), paying the ~0.69 s plan/start floor
  (`DRAIN_PROFILE_r13.json`) every round;
- ``session``: ONE long-lived :class:`streaming.drain.QueueDrainSession`
  with a 100 ms processingTime trigger — the floor is paid once at
  construction, each round costs batch execution + commit wait.

Emits DRAIN_AMORTIZED_r14.json with per-round wall times and the
marginal (rounds 2..N mean) cost per shape. Run on a quiet rig:

    python scripts/drain_amortize_r14.py DRAIN_AMORTIZED_r14.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.plans.registry import (  # noqa: E402
    CONVERSION_TIME,
)
from orders_currency_conversion_etl_spark.sources import catalog  # noqa: E402
from orders_currency_conversion_etl_spark.streaming.drain import (  # noqa: E402
    QueueDrainSession,
)
from orders_currency_conversion_etl_spark.streaming.file_queue import (  # noqa: E402
    queue_append,
)
from orders_currency_conversion_etl_spark.streaming.orders_stream import (  # noqa: E402
    convert_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("DRAIN_ROUNDS", "6"))


def _publish_round(orders, q_dir: str, rnd: int, n_rounds: int) -> None:
    """Round r publishes slice r of the orders table into 2 queue
    partitions — one segment per (round, partition)."""
    sl = orders.filter(F.col("o_orderkey") % n_rounds == rnd)
    for part in (0, 1):
        queue_append(sl.filter(F.col("o_orderkey") % 2 == part), q_dir, part)


def run_startstop(spark, orders, schema, work: str) -> "list[float]":
    q_dir = os.path.join(work, "queue")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    times = []
    for rnd in range(ROUNDS):
        _publish_round(orders, q_dir, rnd, ROUNDS)
        t0 = time.perf_counter()
        # no basePath: the flagship drain topology (payload columns
        # only) — keeps the source schema identical across the
        # per-round stream restarts sharing one checkpoint
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(os.path.join(q_dir, "partition=*"))
        )
        q = (
            convert_stream(stream, spark, CONVERSION_TIME)
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda df, bid: df.write.mode("overwrite").parquet(
                    os.path.join(out, f"batch={bid}")
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        times.append(time.perf_counter() - t0)
    n = spark.read.parquet(os.path.join(out, "batch=*")).count()
    return times, n


def run_session(spark, orders, schema, work: str) -> "list[float]":
    q_dir = os.path.join(work, "queue")
    # round 0 publishes BEFORE the stream starts (partition directory
    # discovery fixes the source schema at definition time — the same
    # reason flagship_queue_drain publishes first); its wall time
    # therefore includes the one-time startup, reported separately
    _publish_round(orders, q_dir, 0, ROUNDS)
    times = []
    t0 = time.perf_counter()
    sess = QueueDrainSession(
        spark,
        q_dir,
        schema,
        work_dir=work,
        transform=lambda s: convert_stream(s, spark, CONVERSION_TIME),
        max_segments_per_trigger=8,
        trigger_ms=100,
    )
    with sess:
        sess.wait_caught_up()
        startup = time.perf_counter() - t0
        times.append(startup)
        for rnd in range(1, ROUNDS):
            _publish_round(orders, q_dir, rnd, ROUNDS)
            t0 = time.perf_counter()
            sess.wait_caught_up()
            times.append(time.perf_counter() - t0)
        n = sess.result_df().count()
    return times, n, startup


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "DRAIN_AMORTIZED_r14.json"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("drain-amortize-r14")
        .getOrCreate()
    )
    orders = catalog.load_table(spark, SF_DIR, "orders")
    schema = orders.schema

    work1 = tempfile.mkdtemp(prefix="drain_ab_startstop_")
    work2 = tempfile.mkdtemp(prefix="drain_ab_session_")
    try:
        ss_times, ss_rows = run_startstop(spark, orders, schema, work1)
        se_times, se_rows, se_startup = run_session(spark, orders, schema, work2)
        assert ss_rows == se_rows, (ss_rows, se_rows)
        marginal = lambda ts: sum(ts[1:]) / max(len(ts) - 1, 1)  # noqa: E731
        rec = {
            "sf_dir": SF_DIR,
            "rounds": ROUNDS,
            "rows_converted": ss_rows,
            "topology": "2 partitions x 1 segment per round, flagship "
            "stream-static broadcast conversion, idempotent batch=N sink",
            "startstop": {
                "per_round": [round(t, 3) for t in ss_times],
                "marginal_per_round": round(marginal(ss_times), 3),
            },
            "session": {
                "startup": round(se_startup, 3),
                "per_round": [round(t, 3) for t in se_times],
                "marginal_per_round": round(marginal(se_times), 3),
            },
            "r13_profile_floor_plan_to_batch": 0.689,
        }
        rec["speedup_marginal"] = round(
            rec["startstop"]["marginal_per_round"]
            / max(rec["session"]["marginal_per_round"], 1e-9),
            2,
        )
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(json.dumps(rec))
    finally:
        shutil.rmtree(work1, ignore_errors=True)
        shutil.rmtree(work2, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
