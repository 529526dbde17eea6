"""BENCH_EXTRAS_r12: decode-tier series continuation + the queue
segment-size scaling curve (VERDICT r11 ask #5).

Same protocol as BENCH_EXTRAS_r10/r11 (warm min-of-2 per (query, sf)):

- the tracked decode-tier and incremental series (unchanged queries,
  series continuity for the extras perf gate);
- `queue_convert_drain` in the r11 topology (4 partitions x 8 segments,
  maxFilesPerTrigger=4) so the series key stays comparable;
- NEW `queue_drain_curve`: the same sf0.1 orders drained through the
  same flagship conversion at FOUR segment granularities (32 / 16 / 8 /
  4 segments = 8 / 4 / 2 / 1 micro-batches) plus the batch twin as the
  asymptote — the r11 VERDICT claim "the 8 s drain is micro-batch fixed
  cost at tiny segments, amortized with segment size" pinned with data:
  rows/sec must rise toward the batch rate as segments grow;
- introduction baselines for the two r12-registered queue queries
  (`queue_backfill_slice`, `queue_roundtrip_convert`).

Run from the repo root on a QUIET rig: python scripts/bench_extras_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: F401  (registers every query)

from orders_currency_conversion_etl_spark.operators import multimodal as mm
from orders_currency_conversion_etl_spark.plans import registry
from orders_currency_conversion_etl_spark.session import get_spark
from orders_currency_conversion_etl_spark.sources import catalog

QUERIES = [
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "multimodal_audio_decode",
    "incremental_unprocessed_at_scale",
    "queue_backfill_slice",
    "queue_roundtrip_convert",
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".localdata", "sf1")),
]


def _dims_only(spark, sf_dir: str, payload_builder):
    docs = catalog.load_table(spark, sf_dir, "documents")
    return mm.decode_images(payload_builder(docs))


def _full_decode(spark, sf_dir: str, payload_builder):
    import pandas as pd

    docs = catalog.load_table(spark, sf_dir, "documents")

    def _batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, mode, _pixels = mm.decode_image_pixels(bytes(payload))
                rows.append((doc_id, w, h, mode))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mode"])

    return payload_builder(docs).mapInPandas(_batches, schema=mm.IMAGE_SCHEMA)


EXTRA_PATHS = {
    "decode_images_dims_png": lambda s, d: _dims_only(s, d, mm.with_png_payload),
    "decode_images_full_png": lambda s, d: _full_decode(s, d, mm.with_png_payload),
    "decode_images_dims_jpeg": lambda s, d: _dims_only(s, d, mm.with_jpeg_payload),
    "decode_images_full_jpeg": lambda s, d: _full_decode(s, d, mm.with_jpeg_payload),
}


def _time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _drain(spark, sf_dir: str, n_parts: int, segs_per_part: int, mft: int):
    """Stage sf orders into (n_parts x segs_per_part) queue segments and
    time an availableNow drain through the flagship conversion join.
    Returns (seconds, converted_rows, n_batches)."""
    import tempfile

    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.plans.registry import CONVERSION_TIME
    from orders_currency_conversion_etl_spark.streaming.file_queue import queue_append
    from orders_currency_conversion_etl_spark.streaming.orders_stream import convert_stream

    with tempfile.TemporaryDirectory() as work:
        q_dir = os.path.join(work, "queue")
        orders = catalog.load_table(spark, sf_dir, "orders")
        chunk = ((F.col("o_orderkey") - F.col("o_orderkey") % n_parts) / n_parts % segs_per_part).cast("int")
        for part in range(n_parts):
            sub = orders.filter(F.col("o_orderkey") % n_parts == part)
            for seq in range(segs_per_part):
                queue_append(sub.filter(chunk == seq), q_dir, part)
        schema = spark.read.parquet(os.path.join(q_dir, "partition=0")).schema
        counts = []
        t0 = time.perf_counter()
        q = (
            convert_stream(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", mft)
                .parquet(os.path.join(q_dir, "partition=*")),
                spark,
                CONVERSION_TIME,
            )
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: counts.append(df.count()))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sec = time.perf_counter() - t0
        # exactness vs the batch twin over the same staged segments
        from orders_currency_conversion_etl_spark.operators.convert import (
            convert_orders,
            orders_src_from_tpch,
        )
        from orders_currency_conversion_etl_spark.sources.rates import rates_df

        staged = spark.read.schema(schema).parquet(os.path.join(q_dir, "partition=*"))
        batch_n = convert_orders(
            orders_src_from_tpch(staged), rates_df(spark), CONVERSION_TIME
        ).count()
        assert sum(counts) == batch_n, (sum(counts), batch_n)
        return round(sec, 3), batch_n, len(counts)


def _batch_twin_seconds(spark, sf_dir: str) -> tuple[float, int]:
    """The non-streaming flagship over the same table — the asymptote
    the drain curve should approach as segments grow."""
    from orders_currency_conversion_etl_spark.operators.convert import (
        convert_orders,
        orders_src_from_tpch,
    )
    from orders_currency_conversion_etl_spark.plans.registry import CONVERSION_TIME
    from orders_currency_conversion_etl_spark.sources.rates import rates_df

    def run():
        orders = catalog.load_table(spark, sf_dir, "orders")
        df = convert_orders(orders_src_from_tpch(orders), rates_df(spark), CONVERSION_TIME)
        t0 = time.perf_counter()
        n = df.count()
        return time.perf_counter() - t0, n

    run()  # warm
    best, n = min((run() for _ in range(2)), key=lambda x: x[0])
    return round(best, 3), n


def main() -> None:
    spark = get_spark("bench-extras-r12")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # series-continuity key: identical topology to the r11 record
    sec, _rows, _nb = _drain(spark, "/root/testdata/sf0.1", 4, 8, 4)
    timings["queue_convert_drain@sf0.1"] = sec

    # segment-size scaling curve (VERDICT r11 ask #5): same rows, same
    # flagship plan, 8 -> 1 micro-batches; rows/sec should rise toward
    # the batch twin's rate as the fixed per-batch cost amortizes
    curve = []
    for n_parts, segs, mft in [(4, 8, 4), (4, 4, 4), (4, 2, 4), (4, 1, 4)]:
        sec, rows, n_batches = _drain(spark, "/root/testdata/sf0.1", n_parts, segs, mft)
        curve.append(
            {
                "segments": n_parts * segs,
                "micro_batches": n_batches,
                "sec": sec,
                "rows": rows,
                "rows_per_sec": round(rows / sec, 1),
            }
        )
    bsec, brows = _batch_twin_seconds(spark, "/root/testdata/sf0.1")
    batch_twin = {"sec": bsec, "rows": brows, "rows_per_sec": round(brows / bsec, 1)}

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
        "round": 12,
        "note": (
            "r12 extras: decode-tier series continuation, introduction "
            "baselines for the two queue queries, and the queue drain "
            "segment-size curve (same sf0.1 rows at 32/16/8/4 segments; "
            "rows_per_sec should rise toward batch_twin as per-batch "
            "fixed cost amortizes)"
        ),
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "queue_drain_curve": curve,
        "queue_drain_batch_twin": batch_twin,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r12.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
