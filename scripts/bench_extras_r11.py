"""BENCH_EXTRAS_r11: bench-scale timings for the r11 decode-tier work.

Same protocol as BENCH_EXTRAS_r10 (warm min-of-2 per (query, sf)):

- the three registered decode-tier queries (png/jpeg are the r10 pure
  codec verifiers — the jpeg number also carries the r11 bit-accumulator
  fix; audio is r11-new, so this records its introduction baseline);
- the dims-only vs full-decode A/B that VERDICT r10 ask #1 requests:
  `decode_images` (header-only as of r11) against `decode_image_pixels`
  (full pixel decode through the pure codecs on this PIL-less rig) over
  the SAME synthesized payloads — the delta is exactly the entropy
  decode the dims path no longer pays;
- `incremental_unprocessed_at_scale` to keep the r10 series going;
- `queue_convert_drain` — the r11 queue source's end-to-end number:
  stage sf0.1 orders into 4 partitions x 8 segments, drain through the
  flagship conversion join under availableNow, exactness asserted
  against the batch twin over the same staged segments.

Run from the repo root on a QUIET rig: python scripts/bench_extras_r11.py
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
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".localdata", "sf1")),
]


def _dims_only(spark, sf_dir: str, payload_builder):
    docs = catalog.load_table(spark, sf_dir, "documents")
    return mm.decode_images(payload_builder(docs))


def _full_decode(spark, sf_dir: str, payload_builder):
    """decode_image_pixels over the same payloads, dims projected out —
    identical output shape to the dims path, full entropy cost."""
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


def _queue_drain_seconds(spark, sf_dir: str) -> float:
    """Stage orders into the file queue (4 partitions x 8 segments) and
    time an availableNow drain through the flagship conversion join —
    the queue source's end-to-end throughput number."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.plans.registry import CONVERSION_TIME
    from orders_currency_conversion_etl_spark.streaming.file_queue import queue_append
    from orders_currency_conversion_etl_spark.streaming.orders_stream import convert_stream

    with tempfile.TemporaryDirectory() as work:
        q_dir = os.path.join(work, "queue")
        orders = catalog.load_table(spark, sf_dir, "orders")
        for part in range(4):
            sub = orders.filter(F.col("o_orderkey") % 4 == part)
            for seq in range(8):
                eighth = ((F.col("o_orderkey") - F.col("o_orderkey") % 4) / 4 % 8).cast("int")
                queue_append(sub.filter(eighth == seq), q_dir, part)
        schema = spark.read.parquet(os.path.join(q_dir, "partition=0")).schema
        counts = []
        t0 = _time.perf_counter()
        q = (
            convert_stream(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 4)
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
        sec = _time.perf_counter() - t0
        # exactness: the drained total must equal the batch twin over
        # the same staged segments (the conversion projection filters
        # rows, so orders.count() is not the right target)
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
        return round(sec, 3)


def main() -> None:
    spark = get_spark("bench-extras-r11")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    timings["queue_convert_drain@sf0.1"] = _queue_drain_seconds(spark, "/root/testdata/sf0.1")
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
        "round": 11,
        "note": (
            "r11 decode-tier evidence, warm min-of-2 per (query, sf); "
            "dims vs full pairs measure the SAME payloads through the "
            "header-only and full-pixel paths — the delta is the entropy "
            "decode the r11 dims path no longer pays"
        ),
        "load_avg_1m": round(os.getloadavg()[0], 1),
        "timings": timings,
        "sf1_scaling": scaling,
    }
    with open(os.path.join(REPO, "BENCH_EXTRAS_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
